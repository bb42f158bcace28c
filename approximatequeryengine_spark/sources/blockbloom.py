"""Block bloom-filter data-skipping index — the EQUALITY-predicate
complement of the zone map (`sources/zonemap.py`).

A zone map prunes blocks for range predicates on the CLUSTERING key;
it is useless for point lookups on an unclustered column (every block's
[min, max] spans the whole domain). The standard answer — parquet
row-group bloom filters, ClickHouse ``bloom_filter`` skip indexes,
Impala/Kudu block blooms — is a small per-block bloom filter over the
lookup column:

- **write**: rows are blocked by fixed-WIDTH ranges of the ingest key
  (``block = key // block_width`` — the row-group analogue; block
  COUNT grows with data, per-block bloom load stays constant, so the
  design is scale-invariant where a fixed block COUNT would saturate
  the filters at 10× data). Each block gets an ``m``-bit bloom over
  the lookup column, stored as ``m/32`` 32-bit words in BIGINTs
  (bit positions ≤ 2³¹ keep every shift/OR exact in both engines):
  ``k`` probes per key via the portable hash (`functions/hashing.py`)
  with salts 0..k-1, OR-merged per (block, word) by a ``bit_or``
  aggregate — one shuffle of (block, word, mask) triples at ingest.
- **query**: a point lookup computes its k probe (word, mask) pairs
  driver-side (pure integer arithmetic, no data touched), reads the
  bloom side table, and keeps blocks where EVERY probed word covers
  its mask (``bits & mask = mask``; a missing (block, word) row means
  those bits are 0 → pruned). No false negatives — every ingested
  key OR-ed its probes into its block — so the answer over surviving
  blocks is EXACT; false positives only add scanned blocks.
- The data scan carries a partition-column IN-list over the surviving
  block ids (directory pruning) plus the exact equality predicate.

At 100 TB: the bloom table is O(blocks · words) ≈ 0.03% of the data
at the default (256-key blocks, 2 Kibit filters); the consult
aggregates it down to |surviving blocks| ids (bounded collect, same
contract as the zonemap consult — at extreme block counts the id list
becomes a join against the partition column instead). The certified
readout row carries (n_rows, sum, blocks_scanned, blocks_total) so the
DRIVER certifies the layout, the bloom arithmetic, the pruning AND the
answer — the oracle re-derives all four in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    AVALANCHE_MULT,
    HASH_SPACE,
    SALT_STRIDE,
    avalanche_hash_sql_steps,
    with_avalanche_h,
)

# 16 bits/key at the 256-key default block width; k=3 probes measures
# a ~1% false-positive block rate at sf0.1 (theory 0.5%). Earlier cuts
# are instructive: 2 Kibit/k=2 measured 15%, and indexing by the
# PORTABLE (two-round multiplicative) hash's low bits measured 7.5% at
# 4 Kibit/k=3 — bit-INDEXED structures need the avalanche family
# (`functions/hashing.py::with_avalanche_h`), exactly like the HLL
# registers; the threshold-sampling hash is not enough.
M_BITS = 4096
WORDS = M_BITS // 32  # 32-bit words: every mask < 2^31, exact in BIGINT
K_PROBES = 3
BIT_SHIFT = HASH_SPACE // M_BITS  # top log2(m) bits index the filter


def _avalanche_int(k: int, salt: int) -> int:
    """The avalanche hash in plain Python — mirrors
    ``functions/hashing.py::with_avalanche_h`` bit for bit (pinned by
    a test against the Spark column)."""
    h = (abs(k) + salt * SALT_STRIDE) % HASH_SPACE
    for _ in range(2):
        h = h ^ (h // 65536)
        h = (h * AVALANCHE_MULT) % HASH_SPACE
    return h ^ (h // 65536)


def probe_masks(key: int, k: int = K_PROBES) -> dict[int, int]:
    """word → OR-ed mask for the k probes of ``key`` (probes landing in
    the same word merge, so the survival check is per-WORD)."""
    out: dict[int, int] = {}
    for salt in range(k):
        bit = _avalanche_int(key, salt) // BIT_SHIFT
        w, m = bit // 32, 1 << (bit % 32)
        out[w] = out.get(w, 0) | m
    return out


def blockbloom_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    ingest_key: Column,
    lookup_key: Column,
    block_width: int = 256,
    k: int = K_PROBES,
) -> None:
    """Persist ``path/data`` partitioned by ``__block`` (fixed-width
    ranges of ``ingest_key``) and ``path/bloom`` = (block, word, bits)
    with an m-bit bloom over ``lookup_key`` per block."""
    base = df.withColumn("__lk", lookup_key.cast("long")).withColumn(
        "__block", F.floor(ingest_key.cast("long") / F.lit(block_width)).cast("long")
    )
    (
        base.repartition("__block")
        .write.partitionBy("__block")
        .mode("overwrite")
        .parquet(f"{path}/data")
    )
    probes = None
    for salt in range(k):
        hdf = with_avalanche_h(base, F.col("__lk"), F.lit(salt), h_col="__h")
        bit = (F.col("__h") / F.lit(BIT_SHIFT)).cast("long")
        p = hdf.select(F.col("__block"), bit.alias("__bit")).select(
            F.col("__block"),
            (F.col("__bit") / F.lit(32)).cast("long").alias("word"),
            # shiftleft needs a literal shift in the Python API; the SQL
            # form takes a column. Bit positions are < 32 so the mask
            # stays < 2^32 — exact in BIGINT on both engines.
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 32 AS INT))").alias(
                "mask"
            ),
        )
        probes = p if probes is None else probes.unionAll(p)
    (
        probes.groupBy("__block", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .write.mode("overwrite")
        .parquet(f"{path}/bloom")
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
    one bounded aggregate over the O(blocks·words) bloom table; the
    data scan prunes to the surviving block directories."""
    need = probe_masks(key, k)
    bloom = spark.read.parquet(f"{path}/bloom")
    blocks_total = bloom.select("__block").distinct().count()
    cond = None
    for w, m in need.items():
        c = (F.col("word") == F.lit(w)) & (
            F.col("bits").bitwiseAND(F.lit(m)) == F.lit(m)
        )
        cond = c if cond is None else cond | c
    survivors = (
        bloom.filter(cond)
        .groupBy("__block")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == F.lit(len(need)))
        .select("__block")
        .collect()
    )
    cells = sorted(int(r["__block"]) for r in survivors)
    data = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("__block").isin(cells))
        .filter(F.col("__lk") == F.lit(key))
    )
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
    k: int = K_PROBES,
) -> str:
    """DuckDB oracle: re-derives the blocking, the per-block bloom
    words, the probe survival test, and the in-block exact aggregate —
    layout + bloom arithmetic + pruning + answer in one query."""
    salt_rows = " UNION ALL ".join(f"SELECT {s} AS salt" for s in range(k))
    need = probe_masks(key, k)
    need_rows = " UNION ALL ".join(
        f"SELECT {w} AS word, CAST({m} AS BIGINT) AS req" for w, m in need.items()
    )
    steps, final = avalanche_hash_sql_steps("lk", f"(salt * {SALT_STRIDE})")
    return f"""
WITH base AS (
  SELECT CAST(floor(CAST({ingest_key_sql} AS BIGINT) / {block_width}.0) AS BIGINT) AS b,
         CAST({lookup_key_sql} AS BIGINT) AS lk,
         CAST({value_cents_sql} AS BIGINT) AS cents
  FROM {table}
),
salts AS ({salt_rows}),
hashed AS (
  SELECT b, {steps},
         CAST(floor({final} / {BIT_SHIFT}.0) AS BIGINT) AS bitpos
  FROM base, salts
),
bloom AS (
  SELECT b, bitpos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(bitpos % 32 AS INTEGER)) AS bits
  FROM hashed
  GROUP BY 1, 2
),
need AS ({need_rows}),
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
