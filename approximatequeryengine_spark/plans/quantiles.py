"""Sampled quantile estimation with distribution-free confidence
intervals — an AQP capability beyond the reference's SUM/AVG/COUNT.

Point estimate: the q-th order statistic of a deterministic sample.
CI: the classic binomial (distribution-free) interval — the true
quantile lies between sample order statistics at ranks

    lo = ⌊n·q − z·√(n·q(1−q))⌋ ,  hi = ⌈n·q + z·√(n·q(1−q))⌉

with ≈95% coverage for z=1.96, no assumptions on the value
distribution. Implementation is an explicit ``row_number`` rank
selection (deterministic ``(value, key)`` tie-break) so Spark and the
DuckDB oracle pick byte-identical elements; ``percentile_disc``
boundary conventions differ across engines, ranks don't.

Scale note: ranking sorts the *sample* (fraction·N rows) — the honest
cost of an exact order statistic; for sketch-accuracy-is-enough cases
use ``approx_percentile`` (exposed in the workload as
``sketch_approx_distinct``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import Z_95
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
    sampling_where_sql,
)


def _ranks(n: int, q: float, z: float) -> tuple[int, int, int]:
    point = min(max(int(math.ceil(q * n)), 1), n)
    half = z * math.sqrt(n * q * (1.0 - q))
    lo = min(max(int(math.floor(q * n - half)), 1), n)
    hi = min(max(int(math.ceil(q * n + half)), 1), n)
    return lo, point, hi


def approx_quantile_ci(
    df: DataFrame,
    column: str,
    q: float,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """1-row DataFrame: (q, n_samples, <column>_q, ci_lower, ci_upper)."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    x = F.col(column).cast("double")
    key = F.expr(spec.key).cast("long")
    sampled = apply_sampling(df, spec).select(x.alias("x"), key.alias("k"))
    n = sampled.count()
    if n == 0:
        raise ValueError("empty sample; increase the fraction")
    lo, point, hi = _ranks(n, q, z)
    w = Window.orderBy("x", "k")
    ranked = sampled.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn").isin(lo, point, hi)
    )
    return ranked.agg(
        F.lit(q).alias("q"),
        F.lit(n).cast("long").alias("n_samples"),
        F.min(F.when(F.col("rn") == point, F.col("x"))).alias(f"{column}_q"),
        F.min(F.when(F.col("rn") == lo, F.col("x"))).alias("ci_lower"),
        F.min(F.when(F.col("rn") == hi, F.col("x"))).alias("ci_upper"),
    )


def grouped_quantile_ci_sql(
    table: str,
    column: str,
    group_col: str,
    q: float,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """Per-group sampled quantile + binomial order-statistic CI as ONE
    engine-portable SQL text (Spark SQL ∩ DuckDB — identical
    least/greatest/ceil/floor/sqrt/window semantics), so the same string
    is both the Spark plan and the oracle.

    Unlike the global version there is no driver-side ``count()``: the
    per-group n is a window count computed in-plan, so the whole thing
    is one shuffle on the group key + per-group sort of the *sample*.
    At scale: |group| sample rows sort within their partition; no
    global sort, no driver round-trip."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    where = sampling_where_sql(spec)
    x = f"CAST({column} AS DOUBLE)"
    key = f"CAST({spec.key} AS BIGINT)"
    half = f"{z!r} * sqrt(n * {q!r} * (1.0 - {q!r}))"
    point = f"least(greatest(CAST(ceil({q!r} * n) AS BIGINT), 1), n)"
    lo = f"least(greatest(CAST(floor({q!r} * n - {half}) AS BIGINT), 1), n)"
    hi = f"least(greatest(CAST(ceil({q!r} * n + {half}) AS BIGINT), 1), n)"
    return f"""
WITH s AS (SELECT {group_col} AS g, {x} AS x, {key} AS k FROM {table} WHERE {where}),
r AS (SELECT g, x,
             row_number() OVER (PARTITION BY g ORDER BY x, k) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM s)
SELECT g AS {group_col}, max(n) AS n_samples,
       min(CASE WHEN rn = {point} THEN x END) AS {column}_q,
       min(CASE WHEN rn = {lo} THEN x END) AS ci_lower,
       min(CASE WHEN rn = {hi} THEN x END) AS ci_upper
FROM r GROUP BY g ORDER BY g
"""


def approx_quantile_ci_sql(
    table: str,
    column: str,
    q: float,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle computing the same ranks with the same float
    arithmetic (⌊⌋/⌈⌉ over double products — bit-equal to the Python
    side given equal n)."""
    where = sampling_where_sql(spec)
    x = f"CAST({column} AS DOUBLE)"
    key = f"CAST({spec.key} AS BIGINT)"
    half = f"{z!r} * sqrt(n * {q!r} * (1.0 - {q!r}))"
    point = f"least(greatest(CAST(ceil({q!r} * n) AS BIGINT), 1), n)"
    lo = f"least(greatest(CAST(floor({q!r} * n - {half}) AS BIGINT), 1), n)"
    hi = f"least(greatest(CAST(ceil({q!r} * n + {half}) AS BIGINT), 1), n)"
    return f"""
WITH s AS (SELECT {x} AS x, {key} AS k FROM {table} WHERE {where}),
nn AS (SELECT count(*) AS n FROM s),
r AS (SELECT x, row_number() OVER (ORDER BY x, k) AS rn FROM s)
SELECT CAST({q!r} AS DOUBLE) AS q, (SELECT n FROM nn) AS n_samples,
       min(CASE WHEN rn = (SELECT {point} FROM nn) THEN x END) AS {column}_q,
       min(CASE WHEN rn = (SELECT {lo} FROM nn) THEN x END) AS ci_lower,
       min(CASE WHEN rn = (SELECT {hi} FROM nn) THEN x END) AS ci_upper
FROM r
"""
