"""Sampled standard-deviation estimation with a CLT confidence interval
— extends the estimator family (A5–A11) beyond the reference's
SUM/AVG/COUNT/MIN/MAX surface with a second-moment target.

Statistics: for a (Bernoulli/uniform-hash) sample of size ``n``, the
sample variance ``s²`` estimates the population variance, and its own
sampling variance is the classic fourth-moment form

    Var(s²) ≈ ( m₄ − s⁴·(n−3)/(n−1) ) / n      [Kendall & Stuart §10.9]

with ``m₄`` the fourth central moment. The reported estimate is the
standard deviation ``s`` with a delta-method interval:
``se(s) = se(s²) / (2s)``.

Numerics (the part that makes the DuckDB oracle land on the same
values): moments are computed about an *integer* center ``c =
floor(mean + 0.5)`` fixed by a first pass — centering kills the
catastrophic cancellation of raw-moment algebra (x⁴ sums need ~2×
the mantissa the data magnitude leaves), while the integer quantization
makes ``c`` itself reproducible across engines (the float mean's last
bit is summation-order-dependent; its rounding to the integer grid is
not, noise ~1e-12 vs a unit grid). ``s²`` then uses the exact algebra
``(Σd² − n·d̄²)/(n−1)`` with ``d = x − c``; ``m₄`` is taken about ``c``
directly (the ``d̄ ≤ 0.5`` offset perturbs it by O(d̄/s) ≲ 1e-5
relative — far below the CI's own sampling noise — and both engines
compute the identical formula). Final values are rounded to 4 decimals
on both sides, the quotient-family convention of
``estimators._ci_columns``.

Plan shape: two jobs — a 1-row mean collect, then ONE
map-side-combined aggregate producing every moment; nothing but two
scalar rows ever reaches the driver, so it scales like any global
aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import Z_95
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
    sampling_where_sql,
)


def approx_stddev_ci(
    df: DataFrame,
    column: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """1-row DataFrame: (n_samples, stddev, ci_lower, ci_upper)."""
    x = F.col(column).cast("double")
    sampled = apply_sampling(df, spec).select(x.alias("x"))
    mu = sampled.agg(F.avg("x").alias("mu")).collect()[0]["mu"]
    if mu is None:
        raise ValueError("empty sample; increase the fraction")
    c = float(math.floor(mu + 0.5))
    d = F.col("x") - F.lit(c)
    m = sampled.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(d).alias("d1"),
        F.sum(d * d).alias("sd2"),
        F.avg(d * d * d * d).alias("m4"),
    )
    n = F.col("n")
    s2 = (F.col("sd2") - n * F.col("d1") * F.col("d1")) / (n - 1)
    var_s2 = (
        F.greatest(
            F.col("m4") - s2 * s2 * (n - 3) / (n - 1),
            F.lit(0.0),
        )
        / n
    )
    sd = F.sqrt(s2)
    half = F.lit(z) * F.sqrt(var_s2) / (F.lit(2.0) * sd)
    return m.select(
        n.cast("long").alias("n_samples"),
        F.round(sd, 4).alias("stddev"),
        F.round(F.greatest(sd - half, F.lit(0.0)), 4).alias("ci_lower"),
        F.round(sd + half, 4).alias("ci_upper"),
    )


def approx_stddev_ci_sql(
    table: str,
    column: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle computing the identical two-pass moment algebra."""
    where = sampling_where_sql(spec)
    return f"""
WITH s AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table} WHERE {where}),
c AS (SELECT floor(avg(x) + 0.5) AS c FROM s),
m AS (
  SELECT count(*) AS n,
         avg(x - (SELECT c FROM c)) AS d1,
         sum((x - (SELECT c FROM c)) * (x - (SELECT c FROM c))) AS sd2,
         avg((x - (SELECT c FROM c)) * (x - (SELECT c FROM c))
             * (x - (SELECT c FROM c)) * (x - (SELECT c FROM c))) AS m4
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_samples,
       round(sqrt((sd2 - n * d1 * d1) / (n - 1)), 4) AS stddev,
       round(greatest(
         sqrt((sd2 - n * d1 * d1) / (n - 1))
         - {z!r} * sqrt(greatest(m4 - ((sd2 - n * d1 * d1) / (n - 1))
                                      * ((sd2 - n * d1 * d1) / (n - 1))
                                      * (n - 3) / (n - 1), 0) / n)
           / (2.0 * sqrt((sd2 - n * d1 * d1) / (n - 1))), 0.0), 4) AS ci_lower,
       round(sqrt((sd2 - n * d1 * d1) / (n - 1))
         + {z!r} * sqrt(greatest(m4 - ((sd2 - n * d1 * d1) / (n - 1))
                                      * ((sd2 - n * d1 * d1) / (n - 1))
                                      * (n - 3) / (n - 1), 0) / n)
           / (2.0 * sqrt((sd2 - n * d1 * d1) / (n - 1))), 4) AS ci_upper
FROM m
"""
