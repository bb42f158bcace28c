"""Block bloom-filter data-skipping index — the EQUALITY-predicate
complement of the zone map (`sources/zonemap.py`).

A zone map prunes blocks for range predicates on the CLUSTERING key;
it is useless for point lookups on an unclustered column (every block's
[min, max] spans the whole domain). The standard answer — parquet
row-group bloom filters, ClickHouse ``bloom_filter`` skip indexes,
Impala/Kudu block blooms — is a small per-block bloom filter over the
lookup column:

- **write**: rows are blocked by fixed-width ranges of the ingest key,
  with the block COUNT capped (default 1024): width =
  max(block_width, ceil(span / max_blocks)). An uncapped fixed width
  MEASURED the failure it causes — 5 865 block directories at the sf1
  replica scale made file listing dominate the query (10.2 s) — while
  a fixed block COUNT saturates the filters instead; the cap + the
  width-scaled filter below give constant per-key filter load at any
  scale. Each block gets an ``m``-bit bloom over the lookup column
  with ``m = 16·width`` (constant bits/key), stored SPARSELY as
  (block, word, bits) rows of 32-bit words in BIGINTs — absent words
  are all-zero, so storage is O(set bits / 32), never O(m) — built by
  one ``bit_or`` shuffle. The (min, width, m) layout parameters are
  persisted as ``path/meta``.
- **hashing**: probes use the avalanche family
  (`functions/hashing.py::with_avalanche_h`) with salts 0..k-1; the
  bit index is the RANGE-SCALED high word ``(h · m) // 2³²`` in exact
  integer arithmetic (h < 2³², m < 2²⁵ → products < 2⁵⁷, no float
  rounding in any engine). Both choices are measured, not stylistic:
  the portable threshold-sampling hash's low bits gave a 7.5%
  false-positive block rate where independent probes predict 0.5%,
  and 2 Kibit/k=2 gave 15%; the avalanche high bits at 16 bits/key,
  k=3 measure ~1.4% at sf0.1.
- **query**: a point lookup reads the 1-row meta, computes its k
  probe (word, mask) pairs driver-side, aggregates the bloom table to
  the surviving block ids (every probed word must cover its mask;
  a missing (block, word) row means those bits are 0 → pruned), and
  scans only those block directories with the exact equality
  predicate. No false negatives — every ingested key OR-ed its probes
  into its block — so the answer is EXACT; false positives only add
  scanned blocks.

At 100 TB: ≤ max_blocks directories regardless of data size, the
bloom side table is O(distinct keys · k / 32) words, and the consult
is one bounded aggregate + a |survivors| collect (at extreme scale the
id list becomes a join against the partition column). The certified
readout row carries (n_rows, sum, blocks_scanned, blocks_total) so the
DRIVER certifies the layout, the bloom arithmetic, the pruning AND the
answer — the oracle re-derives all four, including the data-dependent
(min, width, m), in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.sources.swap import read_synopsis
from approximatequeryengine_spark.functions.hashing import (
    AVALANCHE_MULT,
    HASH_SPACE,
    SALT_STRIDE,
    avalanche_hash_sql_steps,
    with_avalanche_h,
)

BITS_PER_KEY = 16  # m = BITS_PER_KEY · block_width
K_PROBES = 3
MAX_BLOCKS = 1024


def _avalanche_int(k: int, salt: int) -> int:
    """The avalanche hash in plain Python — mirrors
    ``functions/hashing.py::with_avalanche_h`` bit for bit (pinned by
    a test against the Spark column)."""
    h = (abs(k) + salt * SALT_STRIDE) % HASH_SPACE
    for _ in range(2):
        h = h ^ (h // 65536)
        h = (h * AVALANCHE_MULT) % HASH_SPACE
    return h ^ (h // 65536)


def probe_masks(key: int, m_bits: int, k: int = K_PROBES) -> dict[int, int]:
    """word → OR-ed mask for the k probes of ``key`` into an
    ``m_bits``-bit filter (probes landing in the same word merge, so
    the survival check is per-WORD)."""
    out: dict[int, int] = {}
    for salt in range(k):
        bit = (_avalanche_int(key, salt) * m_bits) // HASH_SPACE
        w, m = bit // 32, 1 << (bit % 32)
        out[w] = out.get(w, 0) | m
    return out


M_BITS_MAX = 1 << 25  # keeps h·m < 2^57: exact in BIGINT on every engine


def _layout(mn: int, mx: int, block_width: int, max_blocks: int) -> tuple[int, int]:
    width = max(block_width, (mx - mn + max_blocks) // max_blocks)
    m_bits = BITS_PER_KEY * width
    if m_bits >= M_BITS_MAX:
        # h (< 2^32) · m must stay below 2^63 EXACTLY in both engines
        # AND below the 2^57 the oracle's integer arithmetic assumes;
        # past it, Spark wraps silently and write-side bits diverge
        # from driver-side probes — silent false negatives. Refuse.
        raise ValueError(
            f"blockbloom: ingest-key span {mx - mn + 1} needs filter width "
            f"{width} (m = {m_bits} bits ≥ 2^25). Quantize the ingest key "
            f"(e.g. days instead of millis) or raise max_blocks."
        )
    return width, m_bits


def _probe_rows(base: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(block, word, mask) probe rows for every non-null lookup key in
    ``base`` — THE probe arithmetic, shared by write and append so the
    append == rebuild bitwise invariant cannot drift.

    ONE pass: the k salts explode as a column and the avalanche hash
    runs once with the per-row salt (``with_avalanche_h`` takes a
    Column salt) — the earlier k-way union of per-salt selects
    re-scanned ``base`` k times for the identical row multiset
    (guide §2.4: don't recompute a shared input per consumer)."""
    src = base.filter(F.col("__lk").isNotNull()).select(
        "__block",
        "__lk",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__salt"),
    )
    hdf = with_avalanche_h(src, F.col("__lk"), F.col("__salt"), h_col="__h")
    # exact integer range-scaling: (h · m) div 2^32 < m, no floats
    bit = F.expr(f"CAST((__h * {m_bits}) div {HASH_SPACE} AS BIGINT)")
    return hdf.select(F.col("__block"), bit.alias("__bit")).select(
        F.col("__block"),
        (F.col("__bit") / F.lit(32)).cast("long").alias("word"),
        # shiftleft needs a literal shift in the Python API; the SQL
        # form takes a column. Bit positions are < 32 so the mask
        # stays < 2^32 — exact in BIGINT on both engines.
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 32 AS INT))").alias(
            "mask"
        ),
    )


def blockbloom_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    ingest_key: Column,
    lookup_key: Column,
    block_width: int = 256,
    max_blocks: int = MAX_BLOCKS,
    k: int = K_PROBES,
) -> None:
    """Persist ``path/data`` partitioned by ``__block``, the sparse
    ``path/bloom`` = (block, word, bits) side table, and ``path/meta``
    = the 1-row (mn, width, m) layout parameters."""
    base = df.withColumn("__lk", lookup_key.cast("long")).withColumn(
        "__ik", ingest_key.cast("long")
    )
    mn, mx, n_null = base.agg(
        F.min("__ik"),
        F.max("__ik"),
        F.sum(F.when(F.col("__ik").isNull(), 1).otherwise(0)),
    ).collect()[0]
    if mn is None:
        raise ValueError("blockbloom_write: no non-null ingest keys")
    if n_null:
        # A NULL ingest key has no block: its rows would land in the
        # Hive default partition OUTSIDE the pruning arithmetic and
        # either crash the consult (int(None)) or silently vanish from
        # 'exact' answers. The layout key must be total.
        raise ValueError(
            f"blockbloom_write: {n_null} NULL ingest keys; the blocking "
            "key must be non-null (NULL lookup keys are fine — they are "
            "stored but never probed)"
        )
    width, m_bits = _layout(int(mn), int(mx), block_width, max_blocks)
    base = base.withColumn(
        "__block", F.floor((F.col("__ik") - F.lit(int(mn))) / F.lit(width)).cast("long")
    ).drop("__ik")
    # Commit-light block write + driver-side meta (sources/arrow_write):
    # same directory layout, ~6× less wall for the many-small-files
    # write at fixture scale (per-file writer/commit overhead, guide §6).
    from approximatequeryengine_spark.sources.arrow_write import (
        write_partitioned_parquet,
        write_single_parquet,
    )

    write_partitioned_parquet(
        base.repartition("__block"), f"{path}/data", "__block"
    )
    (
        _probe_rows(base, m_bits, k)
        .groupBy("__block", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .write.mode("overwrite")
        .parquet(f"{path}/bloom")
    )
    write_single_parquet(
        spark,
        [(int(mn), width, m_bits)],
        "mn long, width long, m_bits long",
        f"{path}/meta",
    )


def blockbloom_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    ingest_key: Column,
    lookup_key: Column,
    k: int = K_PROBES,
) -> None:
    """Append a batch to an existing index WITHOUT rebuilding: the new
    rows' probe words bit_or-merge into the bloom side table (OR is
    exactly the bloom merge law), and the batch's data appends to its
    block directories. Layout parameters come from the persisted meta,
    so append == rebuild-under-the-same-meta bit for bit (pinned in
    tests). Batch keys beyond the original ingest span simply land in
    new block ids (the block arithmetic extends past the cap; a
    compaction would re-derive the layout — the documented trade).

    The bloom-side refresh stages the merged table then swaps it in,
    because the merge READS ``{path}/bloom`` and Spark cannot overwrite
    its own input in place. The swap goes through the Hadoop
    FileSystem API resolved from the path's own scheme, so ``path``
    may be any Hadoop-compatible URI (file://, hdfs://, s3a://) — the
    same writer surface as the rest of the module. The swap retires the
    live table to ``bloom_old`` before renaming the staged one in, so a
    crash at ANY step leaves a complete copy on disk: if ``bloom`` is
    missing, rename ``bloom_old`` (pre-append state) or ``bloom_staged``
    (post-append state) back into place. (On object stores the "rename"
    is the FS connector's copy+delete; the brief window where readers
    see a missing ``bloom`` table is the documented non-transactional
    trade of this plain-parquet index.)"""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    mn, width, m_bits = int(meta["mn"]), int(meta["width"]), int(meta["m_bits"])
    base = df.withColumn("__lk", lookup_key.cast("long")).withColumn(
        "__block",
        F.floor((ingest_key.cast("long") - F.lit(mn)) / F.lit(width)).cast("long"),
    )
    n_null = base.filter(F.col("__block").isNull()).count()
    if n_null:
        raise ValueError(
            f"blockbloom_append: {n_null} NULL ingest keys in the batch; "
            "the blocking key must be non-null"
        )
    from approximatequeryengine_spark.sources.arrow_write import (
        write_partitioned_parquet,
    )

    write_partitioned_parquet(
        base.repartition("__block"), f"{path}/data", "__block", mode="append"
    )
    old = read_synopsis(spark, f"{path}/bloom").select(
        "__block", "word", F.col("bits").alias("mask")
    )
    merged = (
        old.unionAll(_probe_rows(base, m_bits, k))
        .groupBy("__block", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    # stage-then-swap: 'merged' READS {path}/bloom, so writing over it
    # in place would consume its own input. The crash-safe ritual
    # (retire aside, never delete before the swap lands) is the shared
    # sources/swap.py helper — recover_synopsis() restores the table
    # from whichever complete copy a crash left behind.
    from approximatequeryengine_spark.sources.swap import staged_swap

    staged_swap(
        spark,
        f"{path}/bloom",
        lambda p: merged.write.mode("overwrite").parquet(p),
        name="blockbloom_append",
    )


def blockbloom_point_sum(
    spark: SparkSession,
    path: str,
    key: int,
    value_cents: Column,
    k: int = K_PROBES,
) -> DataFrame:
    """Point-lookup aggregate through the bloom index: one row
    (n_rows, sum_value, blocks_scanned, blocks_total). The consult is
    one bounded aggregate over the sparse bloom table; the data scan
    prunes to the surviving block directories."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    need = probe_masks(key, int(meta["m_bits"]), k)
    bloom = read_synopsis(spark, f"{path}/bloom")
    cond = None
    for w, m in need.items():
        c = (F.col("word") == F.lit(w)) & (
            F.col("bits").bitwiseAND(F.lit(m)) == F.lit(m)
        )
        cond = c if cond is None else cond | c
    # ONE job over the bloom table: per-block hit counts for every
    # block (blocks_total = row count of the result, ≤ max_blocks+ε —
    # a bounded collect thanks to the block-count cap).
    per_block = (
        bloom.groupBy("__block")
        .agg(F.sum(F.when(cond, 1).otherwise(0)).alias("n_hit"))
        .collect()
    )
    blocks_total = len(per_block)
    cells = sorted(int(r["__block"]) for r in per_block if r["n_hit"] == len(need))
    # List ONLY the surviving block directories (basePath keeps the
    # partition column): the plain read lists every block dir up front
    # — O(blocks_total) driver listing/footer work — before partition
    # pruning even runs, which dominated the consult at 586 blocks
    # (guide §6: file listing). Every cell in `cells` has a directory:
    # a block appears in the bloom table only via its ingested rows.
    from approximatequeryengine_spark.sources.arrow_write import _local_path

    if cells and _local_path(f"{path}/data") is not None:
        reader = spark.read.option("basePath", f"{path}/data")
        data = reader.parquet(
            *[f"{path}/data/__block={c}" for c in cells]
        )
    else:
        data = spark.read.parquet(f"{path}/data").filter(
            F.col("__block").isin(cells)
        )
    data = data.filter(F.col("__lk") == F.lit(key))
    return data.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(value_cents.cast("long")) / F.lit(100.0), 2).alias("sum_value"),
        F.lit(len(cells)).cast("long").alias("blocks_scanned"),
        F.lit(blocks_total).cast("long").alias("blocks_total"),
    )


def blockbloom_point_sum_sql(
    table: str,
    ingest_key_sql: str,
    lookup_key_sql: str,
    value_cents_sql: str,
    key: int,
    block_width: int = 256,
    max_blocks: int = MAX_BLOCKS,
    k: int = K_PROBES,
) -> str:
    """DuckDB oracle: re-derives the data-dependent layout (min, width,
    m), the per-block bloom words, the probe positions for the literal
    key, the survival test, and the in-block exact aggregate — layout +
    bloom arithmetic + pruning + answer in one query."""
    salt_rows = " UNION ALL ".join(f"SELECT {s} AS salt" for s in range(k))
    steps, final = avalanche_hash_sql_steps("lk", f"(salt * {SALT_STRIDE})")
    qsteps, qfinal = avalanche_hash_sql_steps(str(key), f"(salt * {SALT_STRIDE})")
    return f"""
WITH raw AS (
  SELECT CAST({ingest_key_sql} AS BIGINT) AS ik,
         CAST({lookup_key_sql} AS BIGINT) AS lk,
         CAST({value_cents_sql} AS BIGINT) AS cents
  FROM {table}
),
meta AS (
  SELECT min(ik) AS mn,
         greatest({block_width},
                  (max(ik) - min(ik) + {max_blocks}) // {max_blocks}) AS width
  FROM raw
),
meta2 AS (SELECT mn, width, {BITS_PER_KEY} * width AS m FROM meta),
base AS (
  SELECT (ik - mn) // width AS b, lk, cents FROM raw, meta2
),
salts AS ({salt_rows}),
hashed AS (
  -- NULL lookup keys carry no bloom bits on the Spark side
  -- (_probe_rows filters them), so a block whose lookup keys are ALL
  -- NULL must not appear in blocks_total here either — both engines
  -- derive the bloom table from the same row set.
  SELECT b, {steps}, m FROM base, salts, meta2 WHERE lk IS NOT NULL
),
bloom AS (
  SELECT b, (({final} * m) // {HASH_SPACE}) // 32 AS word,
         bit_or(CAST(1 AS BIGINT)
                << CAST((({final} * m) // {HASH_SPACE}) % 32 AS INTEGER)) AS bits
  FROM hashed
  GROUP BY 1, 2
),
need AS (
  SELECT word, bit_or(mask) AS req FROM (
    SELECT (({qfinal} * m) // {HASH_SPACE}) // 32 AS word,
           CAST(1 AS BIGINT)
             << CAST((({qfinal} * m) // {HASH_SPACE}) % 32 AS INTEGER) AS mask
    FROM (SELECT {qsteps}, m FROM salts, meta2)
  ) GROUP BY 1
),
sel AS (
  SELECT b FROM bloom JOIN need USING (word)
  WHERE (bits & req) = req
  GROUP BY b
  HAVING count(*) = (SELECT count(*) FROM need)
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS sum_value,
       (SELECT CAST(count(*) AS BIGINT) FROM sel) AS blocks_scanned,
       (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM bloom) AS blocks_total
FROM base
WHERE b IN (SELECT b FROM sel) AND lk = {key}
"""
