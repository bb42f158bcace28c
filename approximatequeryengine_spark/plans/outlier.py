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
