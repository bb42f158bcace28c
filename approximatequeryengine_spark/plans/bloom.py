"""Portable Bloom-filter join pruning.

The canonical 100 TB pattern: a selective dimension predicate should
prune the fact-table scan *before* the join shuffle. Spark's own
runtime row-level filtering does this opportunistically; this module
gives the pipeline author an explicit, engine-portable version built on
the repo's deterministic-hash contract (``functions/hashing.py``), so
the DuckDB oracle reproduces the filter — bits, false positives and
all — and the driver's value-hash gate certifies it.

Construction (classic Bloom [Bloom 1970, CACM 13(7)]):

- ``m_bits`` bit positions, ``k`` hash functions; position ``i`` of key
  ``x`` is ``portable_hash(x, salt=i) % m_bits``.
- The bitmap is built as a tiny ``(word_idx, word)`` table: positions
  grouped into 32-bit words (stored in BIGINT so ``1 << 31`` stays
  positive in both engines), OR-merged by a single map-side-combined
  ``bit_or`` aggregate over the dim keys — one scan, mergeable, no
  driver involvement until the final ≤ ``m_bits/32``-row collect.
- The probe is a pure per-row integer expression (whole-stage codegen):
  the collected words become an array literal indexed by ``word_idx``;
  a key passes iff all ``k`` probed bits are set. No join, no shuffle,
  no Python — exactly how engines ship broadcast bloom filters to
  scan tasks. Membership testing is free of false *negatives* by
  construction; false positives are bounded by the standard
  ``(1 - e^{-kn/m})^k`` rate and are harmless when (as in
  ``bloom_prune_semi_join``) an exact join runs after the prune.

Sizing: the array-literal probe embeds ``m_bits/32`` longs in the plan,
fine through ~1 M bits (32 K longs ≈ 256 KB). Beyond that, ship the
words through a broadcast join on ``word_idx`` or an Arrow-batched
probe kernel; the build side is unchanged (it never materializes more
than ``m_bits/32`` rows anywhere).

No reference counterpart (the reference has no joins at all,
SURVEY.md §2.3); this extends the join layer the way a warehouse
semi-join pushdown would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    portable_hash_col,
    portable_hash_sql,
)

M_BITS = 4096
K_HASHES = 4
WORD_BITS = 32


def bloom_build_words(
    df: DataFrame, key: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> DataFrame:
    """Bitmap words for the Bloom filter over ``key``: one row per
    non-empty 32-bit word, ``(word_idx, word)``. One aggregate job; the
    explode is a fixed k-way fan-out of the (small) build side."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    key_col = F.expr(key).cast("long")
    positions = F.array(
        *[(portable_hash_col(key_col, salt=i) % m_bits) for i in range(k)]
    )
    # 2^bit via pow: Spark's shiftleft takes a literal shift amount, not
    # a per-row Column; doubles are exact up to 2^53 so pow(2, bit<32)
    # round-trips losslessly through the long cast.
    return (
        df.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
            F.pow(F.lit(2.0), (F.col("pos") % WORD_BITS)).cast("long").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe_column(
    words: list[tuple[int, int]],
    key: Column,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> Column:
    """Boolean probe expression from collected ``(word_idx, word)``
    rows: true iff every one of the ``k`` probed bits is set. Pure
    integer arithmetic in whole-stage codegen — the filter rides the
    scan like any pushed predicate.

    ``m_bits`` must match the build side exactly and be a multiple of
    ``WORD_BITS`` (same guard as ``bloom_build_words``): with a
    mismatched or ragged sizing, probe positions in the final partial
    word would index past the dense array, ``element_at`` would return
    NULL, and member rows would be SILENTLY dropped — false negatives,
    violating the filter's core invariant."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    n_words = m_bits // WORD_BITS
    dense = [0] * n_words
    for idx, word in words:
        if not 0 <= int(idx) < n_words:
            raise ValueError(
                f"word_idx {idx} out of range for m_bits={m_bits} "
                f"({n_words} words) — probe sizing must match the build side"
            )
        dense[int(idx)] = int(word)
    arr = F.array(*[F.lit(w).cast("long") for w in dense])
    key = key.cast("long")
    cond = F.lit(True)
    for i in range(k):
        pos = portable_hash_col(key, salt=i) % m_bits
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + F.lit(1))
        # word >> bit, spelled floor(word / 2^bit): exact in doubles
        # (word < 2^32 < 2^53), and per-row shift amounts don't fit
        # Spark's literal-only shiftright.
        bit_set = F.floor(word / F.pow(F.lit(2.0), (pos % WORD_BITS))).cast("long") % 2 == 1
        cond = cond & bit_set
    return cond


def bloom_prune_semi_join(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    measure: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
    words: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Prune ``fact`` by a Bloom filter over ``dim``'s keys, then run
    the exact semi join on the survivors. One row of accounting:

    - ``n_fact``            — fact rows scanned,
    - ``n_bloom_pass``      — rows surviving the Bloom probe,
    - ``n_exact``           — rows truly matching ``dim`` (after join),
    - ``n_false_pos``       — pass − exact (what the exact join removed),
    - ``fp_rate``           — false positives / true negatives,
    - ``sum_measure``       — Σ ``measure`` over the exact matches —
      identical to the un-pruned semi join, proving the prune is
      lossless (no false negatives).

    At scale the probe prunes the fact scan before any exchange, so the
    join shuffles only ``n_bloom_pass`` rows instead of ``n_fact``.

    ``words`` overrides the filter bitmap (e.g. one maintained
    incrementally by a stream — ``streaming/pipeline.py::bloom_stream``);
    by default it is built from ``dim`` here."""
    if words is None:
        words = [
            (r["word_idx"], r["word"])
            for r in bloom_build_words(dim, dim_key, m_bits, k).collect()
        ]
    passed = fact.withColumn(
        "__bloom", bloom_probe_column(words, F.expr(fact_key), m_bits, k)
    )
    # ONE fact scan: the broadcast left join attaches a match flag to
    # every row, and a single conditional aggregate produces the whole
    # accounting (aggregating the probe and the exact join separately
    # would scan the fact twice — the cost this operator exists to cut).
    dim_keys = dim.select(F.expr(dim_key).cast("long").alias("__dk")).distinct()
    flagged = passed.join(
        F.broadcast(dim_keys),
        F.expr(fact_key).cast("long") == F.col("__dk"),
        "left",
    )
    matched = F.col("__bloom") & F.col("__dk").isNotNull()
    zero = F.lit(0).cast("long")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        # coalesce: sum over an empty/fully-filtered fact is NULL, but
        # these are counts — and the oracle's count(*)-based n_exact
        # would diverge.
        F.coalesce(F.sum(F.col("__bloom").cast("long")), zero).alias("n_bloom_pass"),
        F.coalesce(F.sum(matched.cast("long")), zero).alias("n_exact"),
        F.round(F.sum(F.when(matched, F.col(measure).cast("double"))), 2).alias(
            "sum_measure"
        ),
    ).select(
        "n_fact",
        "n_bloom_pass",
        "n_exact",
        (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_pos"),
        F.round(
            (F.col("n_bloom_pass") - F.col("n_exact"))
            / F.greatest(F.col("n_fact") - F.col("n_exact"), F.lit(1)),
            6,
        ).alias("fp_rate"),
        "sum_measure",
    )


def _probe_sql(key: str, m_bits: int, k: int) -> str:
    """Membership test as DuckDB SQL over the ``words`` CTE — the bit
    test is spelled shift-and-mod (no ``&``) to stay in plain integer
    arithmetic; ``//`` is DuckDB's integer division (the Spark side
    probes via :func:`bloom_probe_column`, not this text)."""
    conds = []
    for i in range(k):
        pos = f"({portable_hash_sql(key, i)} % {m_bits})"
        word = (
            f"coalesce((SELECT word FROM words w WHERE w.word_idx = {pos} // {WORD_BITS}), 0)"
        )
        conds.append(f"(({word} >> CAST({pos} % {WORD_BITS} AS INTEGER)) % 2 = 1)")
    return " AND ".join(conds)


def bloom_prune_semi_join_sql(
    fact: str,
    dim: str,
    fact_key: str,
    dim_key: str,
    measure: str,
    dim_where: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> str:
    """DuckDB oracle: rebuild the same words with ``bit_or`` over the
    same positions, probe with the same arithmetic, then the same exact
    semi join — bit-for-bit the filter Spark shipped."""
    pos_selects = " UNION ALL ".join(
        f"SELECT ({portable_hash_sql(dim_key, i)} % {m_bits}) AS pos FROM build"
        for i in range(k)
    )
    return f"""
WITH build AS (SELECT {dim_key} FROM {dim} WHERE {dim_where}),
pos AS ({pos_selects}),
words AS (
  SELECT pos // {WORD_BITS} AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER)) AS word
  FROM pos GROUP BY 1
),
probe AS (
  SELECT {fact_key} AS fk, {measure} AS m,
         {_probe_sql(fact_key, m_bits, k)} AS pass
  FROM {fact}
),
exact AS (
  SELECT count(*) AS n_exact, round(sum(CAST(m AS DOUBLE)), 2) AS sum_measure
  FROM probe WHERE pass AND fk IN (SELECT {dim_key} FROM build)
)
SELECT count(*) AS n_fact,
       CAST(coalesce(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_bloom_pass,
       (SELECT n_exact FROM exact) AS n_exact,
       CAST(coalesce(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS BIGINT)
           - (SELECT n_exact FROM exact) AS n_false_pos,
       round(CAST(CAST(coalesce(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS BIGINT)
                  - (SELECT n_exact FROM exact) AS DOUBLE)
             / greatest(count(*) - (SELECT n_exact FROM exact), 1), 6) AS fp_rate,
       (SELECT sum_measure FROM exact) AS sum_measure
FROM probe
"""
