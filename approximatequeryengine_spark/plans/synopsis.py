"""Persisted stratified sample synopsis — the BlinkDB design (Agarwal
et al., EuroSys'13).

BlinkDB's core move: pay for sampling ONCE at ingest, answer many later
approximate queries from the stored sample without touching the base
table. The stratification is cap-based — stratum g keeps

    f_g = min(1, cap / N_g)

of its rows — so RARE strata are retained in full (their answers are
EXACT, margin 0) while huge strata are capped; that is the property
that makes per-group answers usable on skewed group-size
distributions, where a uniform sample starves small groups
(BlinkDB §3's motivation).

Engineering the determinism: membership is `portable_hash(key) < t_g`
with the integer threshold

    t_g = (cap · 2³²) div N_g      (or 2³² when N_g ≤ cap)

— pure BIGINT arithmetic (`div`, not float division: a float quotient
of magnitude cap·2³² ≈ 2⁴³ has ulp ≈ 2e-3, LARGER than the 1/N_g
spacing of non-integer quotients, so floor-of-double would be
engine-dependent; integer division is exact everywhere). The DuckDB
oracle re-derives counts → thresholds → membership → estimates from
the base table and must agree bit-for-bit with the readout computed
from the PERSISTED synopsis.

Estimation follows the repo's integer-moments convention (A10/A11):
per-stratum expansion est_g = round_half_up(sum·N_g / n_g) via the
(2a+b) div (2b) identity (no floats), and the SRS-without-replacement
variance N_g(N_g−n)s²/n with s² from EXACT integer second moments
about the integer per-stratum center c_g = (2·Σx+n) div (2n):
Σ(x−c)² stays in BIGINT (each square < 2⁵³ and the sum < 2⁶³ through
sf1-scale cents), then the only floats are the d²-recentering term and
the final z·√v margin, integer-rounded.

Scale shape: build = one exact count aggregate + one filtered write
(the count join is a broadcast of |strata| rows); query = one scan of
the SYNOPSIS (cap·|strata| rows regardless of base size) + a
|strata|-row broadcast of the meta table. At 100 TB the synopsis is
what makes interactive AQP possible at all — the base table is read
once per ingest, never per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    HASH_SPACE,
    portable_hash_col,
    portable_hash_sql,
)

Z_95 = 1.959963984540054


def _threshold(n_total: int, cap: int) -> int:
    """The exact integer membership threshold — Python's ``//`` on
    non-negative ints is the same ``div`` the Spark/DuckDB texts use."""
    return HASH_SPACE if n_total <= cap else cap * HASH_SPACE // n_total


def _literal_meta(spark: SparkSession, df: DataFrame, stratum: str, rows):
    """A |strata|-row meta frame built from DRIVER data (the counts
    were collected anyway): joining this literal frame lets the sample
    write run WITHOUT re-evaluating the counts aggregate inside the
    write job — the lazy meta subtree used to re-run per consumer."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            df.schema[stratum],
            StructField("n_total", LongType(), False),
            StructField("threshold", LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _write_meta(spark: SparkSession, meta: DataFrame, path: str) -> None:
    """Persist the tiny meta table — driver-side parquet when the
    stratum type allows (no Spark job), else the plain writer."""
    from approximatequeryengine_spark.sources.arrow_write import (
        write_single_parquet,
    )

    ddl_types = {"string": "string", "bigint": "long", "int": "int",
                 "double": "double"}
    dtypes = meta.dtypes
    if all(t in ddl_types for _, t in dtypes):
        write_single_parquet(
            spark,
            [tuple(r) for r in meta.collect()],
            ", ".join(f"{c} {ddl_types[t]}" for c, t in dtypes),
            path,
        )
    else:
        meta.write.mode("overwrite").parquet(path)


def synopsis_build(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stratum: str,
    key: str,
    cap: int = 2048,
) -> None:
    """Persist ``path/sample`` (stratum-partitioned parquet) and
    ``path/meta`` (stratum, n_total, threshold).

    The counts aggregate is COLLECTED once (|strata| rows) and the
    thresholds derived driver-side in exact integer arithmetic — the
    earlier lazy meta frame re-ran the counts aggregate inside every
    consumer job (existence probe, sample write, meta write: 3
    evaluations), pure per-entry overhead at any scale (guide §5)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    counts_rows = (
        df.groupBy(stratum)
        .agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        .collect()
    )
    if not counts_rows:
        # An empty partitioned parquet has no inferable schema, so a
        # later read would fail obscurely — fail loudly at build time.
        raise ValueError("synopsis_build: input has no rows")
    meta = _literal_meta(
        spark,
        df,
        stratum,
        [
            (r[stratum], int(r["n_total"]), _threshold(int(r["n_total"]), cap))
            for r in counts_rows
        ],
    )
    sample = (
        df.join(F.broadcast(meta), on=stratum)
        .filter(portable_hash_col(F.col(key)) < F.col("threshold"))
        .drop("n_total", "threshold")
    )
    sample.write.partitionBy(stratum).mode("overwrite").parquet(f"{path}/sample")
    _write_meta(spark, meta, f"{path}/meta")


def synopsis_stratified_sum(
    spark: SparkSession,
    path: str,
    stratum: str,
    value_cents_sql: str,
    z: float = Z_95,
) -> DataFrame:
    """Per-stratum SUM readout from the persisted synopsis ONLY:
    (stratum, n_total, n_sample, est_sum, ci_lower, ci_upper), dollars
    on the 2-decimal grid. Fully-kept strata (N_g ≤ cap) report margin
    exactly 0 — the BlinkDB rare-stratum guarantee."""
    meta = spark.read.parquet(f"{path}/meta")
    smp = spark.read.parquet(f"{path}/sample").select(
        F.col(stratum).alias("g"), F.expr(value_cents_sql).cast("long").alias("x")
    )
    agg1 = smp.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    ).withColumn("c", F.expr("(2 * sx + n) div (2 * n)"))
    centered = smp.join(F.broadcast(agg1), on="g").select(
        "g", "n", "sx", "c",
        ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast("long").alias("d2"),
    )
    per = centered.groupBy("g", "n", "sx", "c").agg(
        F.sum("d2").cast("long").alias("m2c")
    )
    j = per.join(
        F.broadcast(meta.select(F.col(stratum).alias("g"), "n_total")), on="g"
    )
    # d = x̄ − c (|d| ≤ 0.5, exact: sx − n·c is a small integer);
    # s² = (m2c − n·d²)/(n−1); Var(est) = N(N−n)·s²/n.
    d = (F.col("sx") - F.col("n") * F.col("c")).cast("double") / F.col("n")
    s2 = F.when(
        F.col("n") >= 2,
        (F.col("m2c").cast("double") - F.col("n") * d * d) / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    var = (
        F.col("n_total").cast("double")
        * (F.col("n_total") - F.col("n")).cast("double")
        * s2
        / F.col("n")
    )
    margin = F.round(F.lit(z) * F.sqrt(F.greatest(var, F.lit(0.0))), 0).cast("long")
    est = F.expr("(2 * sx * n_total + n) div (2 * n)")
    return j.select(
        F.col("g").alias(stratum),
        "n_total",
        F.col("n").alias("n_sample"),
        F.round(est / F.lit(100.0), 2).alias("est_sum"),
        F.round((est - margin) / F.lit(100.0), 2).alias("ci_lower"),
        F.round((est + margin) / F.lit(100.0), 2).alias("ci_upper"),
    ).orderBy(stratum)


def synopsis_stratified_sum_sql(
    table: str,
    stratum: str,
    key: str,
    value_cents_sql: str,
    cap: int = 2048,
    z: float = Z_95,
) -> str:
    """DuckDB oracle: re-derives counts → integer thresholds →
    membership → the identical integer-moments estimate from the BASE
    table — certifying that the persisted synopsis is exactly the
    sample this derivation defines."""
    h = portable_hash_sql(key)
    return f"""
WITH counts AS (
  SELECT {stratum} AS g, CAST(count(*) AS BIGINT) AS n_total
  FROM {table} GROUP BY 1
),
thr AS (
  SELECT g, n_total,
         CASE WHEN n_total <= {cap} THEN CAST({HASH_SPACE} AS BIGINT)
              ELSE (CAST({cap} AS BIGINT) * CAST({HASH_SPACE} AS BIGINT)) // n_total
         END AS t
  FROM counts
),
smp AS (
  SELECT b.{stratum} AS g, CAST({value_cents_sql} AS BIGINT) AS x
  FROM {table} b JOIN thr ON b.{stratum} = thr.g
  WHERE {h} < thr.t
),
a1 AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
  FROM smp GROUP BY g
),
a1c AS (SELECT g, n, sx, (2 * sx + n) // (2 * n) AS c FROM a1),
per AS (
  SELECT s.g, max(a.n) AS n, max(a.sx) AS sx, max(a.c) AS c,
         CAST(sum((s.x - a.c) * (s.x - a.c)) AS BIGINT) AS m2c
  FROM smp s JOIN a1c a ON s.g = a.g
  GROUP BY s.g
),
j AS (SELECT per.*, thr.n_total FROM per JOIN thr ON per.g = thr.g),
fin AS (
  SELECT g, n_total, n,
         (2 * sx * n_total + n) // (2 * n) AS est,
         CAST(round({z!r} * sqrt(greatest(
           CAST(n_total AS DOUBLE) * CAST(n_total - n AS DOUBLE)
           * (CASE WHEN n >= 2
                   THEN (CAST(m2c AS DOUBLE)
                         - n * (CAST(sx - n * c AS DOUBLE) / n)
                             * (CAST(sx - n * c AS DOUBLE) / n)) / (n - 1)
                   ELSE 0.0 END) / n,
           0.0)), 0) AS BIGINT) AS margin
  FROM j
)
SELECT g AS {stratum}, n_total, n AS n_sample,
       round(est / 100.0, 2) AS est_sum,
       round((est - margin) / 100.0, 2) AS ci_lower,
       round((est + margin) / 100.0, 2) AS ci_upper
FROM fin
ORDER BY {stratum}
"""


def synopsis_append(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    stratum: str,
    key: str,
    cap: int = 2048,
) -> None:
    """Fold an append batch into a persisted synopsis WITHOUT
    rescanning the base table — and end up with EXACTLY the synopsis a
    full rebuild over base ∪ batch would produce.

    Why that identity holds: membership is ``hash(key) < t_g`` and
    growing N_g only SHRINKS t_g, so the new sample is a strict subset
    of (old sample ∪ sampled batch rows) — maintenance is an EVICTION
    filter over the stored sample (cap·|strata| rows) plus a threshold
    filter over the batch. The nested-sample property that drives the
    adaptive executor and the one-pass ELP curve is what makes
    synopsis maintenance O(sample + batch) here; a seeded-random
    sample has no such subset structure and would force a rebuild.

    Cost: one count aggregate over the BATCH, one read of the
    cap-bounded sample, one write. The base table is never touched.
    ``tests`` pin append == rebuild bit-for-bit, and the workload
    oracle re-derives from base ∪ batch — certifying the incremental
    path against the ground-truth derivation.
    """
    # Collect the two tiny count tables (|strata| rows each) and merge
    # driver-side — the earlier lazy full-outer-join meta re-ran the
    # batch counts aggregate inside both write jobs (guide §5).
    totals: dict = {}
    for r in spark.read.parquet(f"{path}/meta").collect():
        totals[r[stratum]] = int(r["n_total"])
    for r in (
        new_df.groupBy(stratum)
        .agg(F.count(F.lit(1)).cast("long").alias("__n_new"))
        .collect()
    ):
        totals[r[stratum]] = totals.get(r[stratum], 0) + int(r["__n_new"])
    meta = _literal_meta(
        spark,
        new_df,
        stratum,
        [(g, n, _threshold(n, cap)) for g, n in totals.items()],
    )
    old_sample = spark.read.parquet(f"{path}/sample")
    # Evict + admit under the NEW thresholds. Columns must align for
    # the union; the stored sample carries exactly new_df's columns.
    merged = old_sample.select(*new_df.columns).unionByName(
        new_df.select(*new_df.columns)
    )
    sample = (
        merged.join(F.broadcast(meta), on=stratum)
        .filter(portable_hash_col(F.col(key)) < F.col("threshold"))
        .drop("n_total", "threshold")
    )
    # Rewrite via a temp dir: the new sample reads from the old files.
    sample.write.partitionBy(stratum).mode("overwrite").parquet(f"{path}/sample_new")
    _write_meta(spark, meta, f"{path}/meta_new")
    import shutil

    shutil.rmtree(f"{path}/sample")
    shutil.rmtree(f"{path}/meta")
    shutil.move(f"{path}/sample_new", f"{path}/sample")
    shutil.move(f"{path}/meta_new", f"{path}/meta")
