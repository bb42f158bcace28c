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
remainder uses the portable-hash sample with the standard HT moments —
the DuckDB oracle re-derives all three pieces.

Plan shape at scale: TakeOrdered(B) for the threshold (distributed
heap, B rows to the driver), one exact aggregate over the ≤B outliers,
one sampled HT aggregate over the remainder — two scans (or one, if
the engine shares it) and O(B) driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import (
    AggSpec,
    Z_95,
    approx_aggregate,
    moments_sql,
)
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
    sampling_p_sql,
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
    outliers = base.filter(x > F.lit(t)).agg(
        F.coalesce(F.sum(x), F.lit(0.0)).alias("outlier_sum"),
        F.count(F.lit(1)).alias("n_outliers"),
    )
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key=key, salt=salt)
    sampled = apply_sampling(base.filter(x <= F.lit(t)), spec)
    rest = approx_aggregate(sampled, AggSpec("sum", column), z=z)
    rest_sum = F.col(f"sum_{column}")
    return outliers.crossJoin(rest).select(
        F.round(F.col("outlier_sum") + F.coalesce(rest_sum, F.lit(0.0)), 2).alias(
            "estimate"
        ),
        F.round(F.col("outlier_sum") + F.coalesce(F.col("ci_lower"), F.lit(0.0)), 2).alias(
            "ci_lower"
        ),
        F.round(F.col("outlier_sum") + F.coalesce(F.col("ci_upper"), F.lit(0.0)), 2).alias(
            "ci_upper"
        ),
        F.col("n_samples"),
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
    """DuckDB oracle: re-derives the threshold, the exact stratum, and
    the HT moments over the identical remainder sample."""
    spec = SamplingSpec(design="uniform_hash", fraction=fraction, key=key)
    x = f"CAST({column} AS DOUBLE)"
    rest_table = (
        f"(SELECT * FROM {table} "
        f"WHERE {x} IS NOT NULL AND {x} <= (SELECT t FROM thr))"
    )
    moments = moments_sql(
        rest_table,
        column,
        sampling_where_sql(spec),
        "sum",
        sampling_p_sql(spec),
        "rest_sum",
        z=z,
    )
    return f"""
WITH thr AS (
  SELECT min(x) AS t
  FROM (SELECT {x} AS x FROM {table} WHERE {x} IS NOT NULL
        ORDER BY x DESC LIMIT {n_outliers})
),
o AS (
  SELECT coalesce(sum({x}), 0.0) AS outlier_sum, count(*) AS n_outliers
  FROM {table} WHERE {x} IS NOT NULL AND {x} > (SELECT t FROM thr)
),
m AS ({moments})
SELECT round(o.outlier_sum + coalesce(m.rest_sum, 0.0), 2) AS estimate,
       round(o.outlier_sum + coalesce(m.ci_lower, 0.0), 2) AS ci_lower,
       round(o.outlier_sum + coalesce(m.ci_upper, 0.0), 2) AS ci_upper,
       m.n_samples,
       CAST(o.n_outliers AS BIGINT) AS n_outliers,
       round(o.outlier_sum, 2) AS outlier_sum
FROM o, m
"""
