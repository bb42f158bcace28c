"""Outlier-indexed SUM estimation — the classic skew weapon of AQP
systems (Chaudhuri, Das, Datar, Motwani, Narasayya, "Overcoming
Limitations of Sampling for Aggregation Queries", ICDE 2001): keep the
``B`` largest values EXACTLY (the "outlier index"), sample only the
well-behaved remainder.

Why it wins: a plain uniform sample's SUM variance is dominated by
whether the handful of giant rows landed in the sample; removing them
from the sampled population removes that variance term entirely, so
the same sampling budget buys a far narrower interval on skewed data
(pinned by ``test_narrower_than_uniform_on_skew``). PPS attacks the
same problem probabilistically; the outlier index is the deterministic
complement — the estimator stays unbiased because the outlier stratum
is enumerated, not sampled.

Determinism/oracle contract: the threshold ``t`` is the ``B``-th
largest VALUE (an element of the data, not derived arithmetic), the
outlier stratum is ``x > t`` strictly (ties at ``t`` fall to the
sampled side, so membership never depends on tie order), and the
remainder uses the portable-hash sample with the standard HT moments
and the ``_ci_columns`` integer-margin convention — the DuckDB oracle
re-derives all three pieces.

Plan shape at scale: TakeOrdered(B) for the threshold (distributed
heap, B rows to the driver), then ONE conditional aggregate computes
the exact outlier stratum AND the sampled remainder's HT moments in
the same pass — two scans total and O(B) driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    fraction_threshold,
    portable_hash_col,
)
from approximatequeryengine_spark.plans.estimators import Z_95, _ci_columns
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    sampling_where_sql,
)

N_OUTLIERS = 100


def outlier_sum_ci(
    df: DataFrame,
    column: str,
    key: str,
    fraction: float,
    n_outliers: int = N_OUTLIERS,
    z: float = Z_95,
    salt: int = 0,
) -> DataFrame:
    """1-row DataFrame: (estimate, ci_lower, ci_upper, n_samples,
    n_outliers, outlier_sum) for SUM(column) = exact outlier stratum +
    HT-estimated remainder; the CI reflects only the sampled part's
    uncertainty (the outlier stratum is exact)."""
    x = F.col(column).cast("double")
    base = df.filter(x.isNotNull())
    trow = (
        base.select(x.alias("x"))
        .orderBy(F.desc("x"))
        .limit(n_outliers)
        .agg(F.min("x").alias("t"))
        .collect()[0]
    )
    if trow["t"] is None:
        raise ValueError("empty input; nothing to estimate")
    t = float(trow["t"])
    is_out = x > F.lit(t)
    in_sample = portable_hash_col(F.expr(key).cast("long"), salt=salt) < F.lit(
        fraction_threshold(fraction)
    )
    is_rest = ~is_out & in_sample
    p = float(fraction)
    m = base.agg(
        F.coalesce(F.sum(F.when(is_out, x)), F.lit(0.0)).alias("outlier_sum"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.sum(is_rest.cast("long")).alias("n"),
        F.sum(F.when(is_rest, x / F.lit(p))).alias("ht_sum"),
        F.sum(
            F.when(is_rest, x * x * F.lit((1.0 - p) / (p * p)))
        ).alias("vht"),
    )
    rest_est = F.coalesce(F.col("ht_sum"), F.lit(0.0))
    margin = F.lit(z) * F.sqrt(F.greatest(F.col("vht"), F.lit(0.0)))
    rest_cols = _ci_columns(rest_est, margin, F.col("n"), "rest_sum")
    staged = m.select(
        F.col("outlier_sum"),
        F.col("n_outliers"),
        F.col("n"),
        *rest_cols,
    )
    return staged.select(
        F.round(F.col("outlier_sum") + F.col("rest_sum"), 2).alias("estimate"),
        F.round(F.col("outlier_sum") + F.col("ci_lower"), 2).alias("ci_lower"),
        F.round(F.col("outlier_sum") + F.col("ci_upper"), 2).alias("ci_upper"),
        F.col("n").cast("long").alias("n_samples"),
        F.col("n_outliers"),
        F.round(F.col("outlier_sum"), 2).alias("outlier_sum"),
    )


def outlier_sum_ci_sql(
    table: str,
    column: str,
    key: str,
    fraction: float,
    n_outliers: int = N_OUTLIERS,
    z: float = Z_95,
) -> str:
    """DuckDB oracle: re-derives the threshold, then the same single
    conditional aggregate — outlier stratum + HT moments + the
    integer-margin convention of ``moments_sql``/``_ci_columns``."""
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key=key)
    x = f"CAST({column} AS DOUBLE)"
    p = float(fraction)
    rest = f"(NOT ({x} > (SELECT t FROM thr))) AND ({sampling_where_sql(spec)})"
    margin = f"{z!r} * sqrt(greatest(vht, 0.0))"
    margin = f"CASE WHEN n >= 2 THEN {margin} ELSE 0.0 END"
    margin = (
        f"CASE WHEN ({margin}) > 0 THEN greatest(round({margin}, 0), 1.0) "
        f"ELSE 0.0 END"
    )
    return f"""
WITH thr AS (
  SELECT min(x) AS t
  FROM (SELECT {x} AS x FROM {table} WHERE {x} IS NOT NULL
        ORDER BY x DESC LIMIT {n_outliers})
),
m AS (
  SELECT coalesce(sum(CASE WHEN {x} > (SELECT t FROM thr) THEN {x} END), 0.0)
             AS outlier_sum,
         CAST(sum(CASE WHEN {x} > (SELECT t FROM thr) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers,
         CAST(sum(CASE WHEN {rest} THEN 1 ELSE 0 END) AS BIGINT) AS n,
         coalesce(sum(CASE WHEN {rest} THEN {x} / {p!r} END), 0.0) AS rest_sum,
         sum(CASE WHEN {rest} THEN {x} * {x} * {(1.0 - p) / (p * p)!r} END)
             AS vht
  FROM {table} WHERE {x} IS NOT NULL
)
SELECT round(outlier_sum + rest_sum, 2) AS estimate,
       round(outlier_sum + (rest_sum - ({margin})), 2) AS ci_lower,
       round(outlier_sum + (rest_sum + ({margin})), 2) AS ci_upper,
       n AS n_samples,
       n_outliers,
       round(outlier_sum, 2) AS outlier_sum
FROM m
"""

def outlier_grouped_sum_ci(
    df: DataFrame,
    column: str,
    group_col: str,
    key: str,
    fraction: float,
    n_outliers: int = N_OUTLIERS,
    z: float = Z_95,
    salt: int = 0,
) -> DataFrame:
    """Per-group outlier-indexed SUM — the skew-robust grouped shape a
    revenue-by-customer query on heavy-tailed data actually needs: each
    group keeps its own top-``n_outliers`` values exactly and samples
    its remainder. One row per group: (group, estimate, ci_lower,
    ci_upper, n_samples, n_outliers, outlier_sum).

    The per-group threshold is the group's ``B``-th largest VALUE via a
    ``row_number`` window over (group, value desc); ties at the
    threshold fall to the sampled side (strict ``>``), so membership
    never depends on tie order — same determinism contract as the
    global estimator, now per group.

    Plan shape at scale: the window shuffles only the slim
    (group, value) projection on the group key; the resulting
    |groups|-row threshold frame broadcast-joins back onto the base
    scan, and ONE grouped conditional aggregate computes every group's
    exact outlier stratum AND sampled-remainder HT moments in the same
    pass. Two scans, one slim shuffle, O(|groups|) driver-free state —
    no per-group TakeOrdered fan-out."""
    x = F.col(column).cast("double")
    g = F.col(group_col)
    base = df.filter(x.isNotNull())
    from pyspark.sql.window import Window

    thr = (
        base.select(g.alias("__og"), x.alias("__ox"))
        .withColumn("__orn", F.row_number().over(
            Window.partitionBy("__og").orderBy(F.desc("__ox"))
        ))
        .filter(F.col("__orn") <= F.lit(n_outliers))
        .groupBy("__og")
        .agg(F.min("__ox").alias("__ot"))
    )
    joined = base.join(
        F.broadcast(thr), base[group_col] == thr["__og"], "inner"
    )
    is_out = x > F.col("__ot")
    in_sample = portable_hash_col(F.expr(key).cast("long"), salt=salt) < F.lit(
        fraction_threshold(fraction)
    )
    is_rest = ~is_out & in_sample
    p = float(fraction)
    m = joined.groupBy(F.col("__og").alias("g")).agg(
        F.coalesce(F.sum(F.when(is_out, x)), F.lit(0.0)).alias("outlier_sum"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.sum(is_rest.cast("long")).alias("n"),
        F.sum(F.when(is_rest, x / F.lit(p))).alias("ht_sum"),
        F.sum(
            F.when(is_rest, x * x * F.lit((1.0 - p) / (p * p)))
        ).alias("vht"),
    )
    rest_est = F.coalesce(F.col("ht_sum"), F.lit(0.0))
    margin = F.lit(z) * F.sqrt(F.greatest(F.col("vht"), F.lit(0.0)))
    rest_cols = _ci_columns(rest_est, margin, F.col("n"), "rest_sum")
    staged = m.select(
        F.col("g"),
        F.col("outlier_sum"),
        F.col("n_outliers"),
        F.col("n"),
        *rest_cols,
    )
    return staged.select(
        F.col("g").alias(group_col),
        F.round(F.col("outlier_sum") + F.col("rest_sum"), 2).alias("estimate"),
        F.round(F.col("outlier_sum") + F.col("ci_lower"), 2).alias("ci_lower"),
        F.round(F.col("outlier_sum") + F.col("ci_upper"), 2).alias("ci_upper"),
        F.col("n").cast("long").alias("n_samples"),
        F.col("n_outliers"),
        F.round(F.col("outlier_sum"), 2).alias("outlier_sum"),
    ).orderBy(group_col)


def outlier_grouped_sum_ci_sql(
    table: str,
    column: str,
    group_col: str,
    key: str,
    fraction: float,
    n_outliers: int = N_OUTLIERS,
    z: float = Z_95,
) -> str:
    """DuckDB oracle for :func:`outlier_grouped_sum_ci` — the same
    per-group row_number threshold, strict-> stratum split, HT moments,
    and integer-margin convention."""
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key=key)
    x = f"CAST({column} AS DOUBLE)"
    p = float(fraction)
    rest = f"(NOT (s.x > thr.t)) AND s.ins"
    margin = f"{z!r} * sqrt(greatest(vht, 0.0))"
    margin = f"CASE WHEN n >= 2 THEN {margin} ELSE 0.0 END"
    margin = (
        f"CASE WHEN ({margin}) > 0 THEN greatest(round({margin}, 0), 1.0) "
        f"ELSE 0.0 END"
    )
    return f"""
WITH s AS (
  SELECT {group_col} AS g, {x} AS x,
         ({sampling_where_sql(spec)}) AS ins
  FROM {table} WHERE {x} IS NOT NULL
),
thr AS (
  SELECT g, min(x) AS t FROM (
    SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x DESC) AS rn
    FROM s
  ) WHERE rn <= {n_outliers} GROUP BY g
),
m AS (
  SELECT s.g AS g,
         coalesce(sum(CASE WHEN s.x > thr.t THEN s.x END), 0.0) AS outlier_sum,
         CAST(sum(CASE WHEN s.x > thr.t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
         CAST(sum(CASE WHEN {rest} THEN 1 ELSE 0 END) AS BIGINT) AS n,
         coalesce(sum(CASE WHEN {rest} THEN s.x / {p!r} END), 0.0) AS rest_sum,
         sum(CASE WHEN {rest} THEN s.x * s.x * {(1.0 - p) / (p * p)!r} END)
             AS vht
  FROM s JOIN thr ON s.g = thr.g GROUP BY s.g
)
SELECT g AS {group_col},
       round(outlier_sum + rest_sum, 2) AS estimate,
       round(outlier_sum + (rest_sum - ({margin})), 2) AS ci_lower,
       round(outlier_sum + (rest_sum + ({margin})), 2) AS ci_upper,
       n AS n_samples,
       n_outliers,
       round(outlier_sum, 2) AS outlier_sum
FROM m ORDER BY g
"""
