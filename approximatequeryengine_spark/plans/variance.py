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

from approximatequeryengine_spark.plans.estimators import Z_95, finite_col, finite_sql
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
    sampling_where_sql,
)


def _int_center(v: float) -> float:
    """The engine-portable integer quantization of a float mean — the
    same floor(v + 0.5) both oracles spell (Python round() is banker's
    rounding, which DuckDB's floor(x + 0.5) is not)."""
    return float(math.floor(v + 0.5))


def approx_stddev_ci(
    df: DataFrame,
    column: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """1-row DataFrame: (n_samples, stddev, ci_lower, ci_upper)."""
    x = F.col(column).cast("double")
    # NULLs are excluded up front: a count(*)/null-skipping-sum mismatch
    # would silently deflate every moment on a nullable column.
    sampled = (
        apply_sampling(df, spec).select(x.alias("x")).filter(F.col("x").isNotNull())
    )
    first = sampled.agg(
        F.avg("x").alias("mu"), F.count("x").alias("n")
    ).collect()[0]
    if first["mu"] is None or first["n"] < 2:
        raise ValueError(
            "stddev needs at least 2 sampled non-null rows; increase the fraction"
        )
    c = _int_center(first["mu"])
    d = F.col("x") - F.lit(c)
    m = sampled.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(d).alias("d1"),
        F.sum(d * d).alias("sd2"),
        F.avg(d * d * d * d).alias("m4"),
    )
    n = F.col("n")
    # greatest(…, 0): mathematically non-negative, but float rounding of
    # sd2 − n·d̄² can dip a hair below zero on constant columns — and
    # DuckDB's sqrt RAISES on negatives where Spark returns NaN.
    s2 = F.greatest(F.col("sd2") - n * F.col("d1") * F.col("d1"), F.lit(0.0)) / (n - 1)
    var_s2 = (
        F.greatest(
            F.col("m4") - s2 * s2 * (n - 3) / (n - 1),
            F.lit(0.0),
        )
        / n
    )
    sd = F.sqrt(s2)
    # Constant column: sd = 0 with zero spread — a degenerate [sd, sd]
    # interval, not a 0/0 NaN.
    half = F.when(sd > 0, F.lit(z) * F.sqrt(var_s2) / (F.lit(2.0) * sd)).otherwise(
        F.lit(0.0)
    )
    return m.select(
        n.cast("long").alias("n_samples"),
        F.round(sd, 4).alias("stddev"),
        F.round(F.greatest(sd - half, F.lit(0.0)), 4).alias("ci_lower"),
        F.round(sd + half, 4).alias("ci_upper"),
    )


def approx_grouped_stddev_ci(
    df: DataFrame,
    column: str,
    group_col: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """Per-group sampled standard deviation with the fourth-moment CI —
    one row per group: (group, n_samples, stddev, ci_lower, ci_upper).

    Unlike s² (whose centered algebra is exact for any constant
    center), the fourth moment is NOT center-invariant: a group whose
    mean sits d̄ away from a shared global center sees its raw m₄
    inflated by ~6d̄²s² + d̄⁴ — unbounded, since per-group offsets from
    a global center can be arbitrarily large, and even the exact
    binomial recentering identity cancels catastrophically in doubles
    once d̄⁴ dwarfs the true central moment. So the first pass computes
    a PER-GROUP integer center (one grouped aggregate, broadcast-joined
    back onto the sample — group-cardinality-sized, the same bound as
    the result itself), which caps |d̄| ≤ 0.5 exactly like the global
    estimator's rounding bound. The moment aggregate then recenters m₄
    exactly with

        m₄ᶜ = m₄ − 4·d̄·m₃ + 6·d̄²·m₂ − 3·d̄⁴

    which, with |d̄| ≤ 0.5, is both algebraically exact and numerically
    stable — the Kendall–Stuart Var(s²) formula holds per group no
    matter how far apart the group means sit. Groups with n < 2 fall
    back to a degenerate [sd, sd] interval via the n-guard, mirroring
    ``_ci_columns``. An empty sample yields an empty result (no
    driver-side collect anywhere — two jobs total, both group-bounded)."""
    x = F.col(column).cast("double")
    sampled = (
        apply_sampling(df, spec)
        .select(F.col(group_col), x.alias("x"))
        .filter(F.col("x").isNotNull())
    )
    centers = sampled.groupBy(group_col).agg(
        F.floor(F.avg("x") + F.lit(0.5)).cast("double").alias("c")
    )
    joined = sampled.join(F.broadcast(centers), group_col)
    d = F.col("x") - F.col("c")
    m = joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(d).alias("d1"),
        F.sum(d * d).alias("sd2"),
        F.avg(d * d * d).alias("m3"),
        F.avg(d * d * d * d).alias("m4"),
    )
    n = F.col("n")
    s2 = F.when(
        n >= 2,
        F.greatest(F.col("sd2") - n * F.col("d1") * F.col("d1"), F.lit(0.0)) / (n - 1),
    ).otherwise(F.lit(0.0))
    d1 = F.col("d1")
    m2 = F.col("sd2") / n
    m4c = (
        F.col("m4")
        - F.lit(4.0) * d1 * F.col("m3")
        + F.lit(6.0) * d1 * d1 * m2
        - F.lit(3.0) * d1 * d1 * d1 * d1
    )
    var_s2 = F.greatest(m4c - s2 * s2 * (n - 3) / (n - 1), F.lit(0.0)) / n
    sd = F.sqrt(s2)
    half = F.when(
        (sd > 0) & (n > 3), F.lit(z) * F.sqrt(var_s2) / (F.lit(2.0) * sd)
    ).otherwise(F.lit(0.0))
    return m.select(
        F.col(group_col),
        n.cast("long").alias("n_samples"),
        F.round(sd, 4).alias("stddev"),
        F.round(F.greatest(sd - half, F.lit(0.0)), 4).alias("ci_lower"),
        F.round(sd + half, 4).alias("ci_upper"),
    ).orderBy(group_col)


def approx_grouped_stddev_ci_sql(
    table: str,
    column: str,
    group_col: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle for :func:`approx_grouped_stddev_ci` — the same
    per-group integer centers and the exact m₄ recentering identity
    m₄ᶜ = m₄ − 4d̄m₃ + 6d̄²m₂ − 3d̄⁴."""
    where = sampling_where_sql(spec)
    return f"""
WITH s AS (SELECT {group_col} AS g, CAST({column} AS DOUBLE) AS x
           FROM {table}
           WHERE ({where}) AND {column} IS NOT NULL),
c AS (SELECT g, floor(avg(x) + 0.5) AS c FROM s GROUP BY g),
m AS (
  SELECT s.g AS g, count(*) AS n,
         avg(x - c.c) AS d1,
         sum((x - c.c) * (x - c.c)) AS sd2,
         avg((x - c.c) * (x - c.c) * (x - c.c)) AS m3,
         avg((x - c.c) * (x - c.c) * (x - c.c) * (x - c.c)) AS m4
  FROM s JOIN c ON s.g = c.g GROUP BY s.g
),
v AS (
  SELECT g, n,
         CASE WHEN n >= 2
              THEN greatest(sd2 - n * d1 * d1, 0.0) / (n - 1)
              ELSE 0.0 END AS s2,
         m4 - 4.0 * d1 * m3 + 6.0 * d1 * d1 * (sd2 / n)
            - 3.0 * d1 * d1 * d1 * d1 AS m4c
  FROM m
),
h AS (
  SELECT g, n, sqrt(s2) AS sd,
         CASE WHEN sqrt(s2) > 0 AND n > 3
              THEN {z!r} * sqrt(greatest(m4c - s2 * s2 * (n - 3) / (n - 1), 0.0) / n)
                   / (2.0 * sqrt(s2))
              ELSE 0.0 END AS half
  FROM v
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_samples,
       round(sd, 4) AS stddev,
       round(greatest(sd - half, 0.0), 4) AS ci_lower,
       round(sd + half, 4) AS ci_upper
FROM h ORDER BY g
"""


def approx_corr_ci(
    df: DataFrame,
    col_x: str,
    col_y: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """Sampled Pearson correlation with the Fisher-z interval:
    ``atanh(r) ± z/√(n−3)``, mapped back through tanh — the standard
    normalizing transform (Fisher 1921), far better calibrated than a
    naive CLT on ``r`` near ±1.

    Same numeric discipline as :func:`approx_stddev_ci`: both columns
    center on integer-quantized means from a first pass, cross/self
    second moments come from ONE aggregate, and atanh/tanh are spelled
    as log/exp identities because DuckDB lacks the hyperbolic inverses
    — identical formula text on both engines. 1-row DataFrame:
    (n_samples, corr, ci_lower, ci_upper)."""
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    sampled = (
        apply_sampling(df, spec)
        .select(x.alias("x"), y.alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    mrow = sampled.agg(
        F.avg("x").alias("mx"), F.avg("y").alias("my"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if mrow["mx"] is None or mrow["my"] is None or mrow["n"] <= 3:
        raise ValueError(
            "corr needs more than 3 sampled rows for the Fisher-z "
            "interval; increase the fraction"
        )
    cx = _int_center(mrow["mx"])
    cy = _int_center(mrow["my"])
    dx = F.col("x") - F.lit(cx)
    dy = F.col("y") - F.lit(cy)
    m = sampled.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(dx).alias("dx1"),
        F.avg(dy).alias("dy1"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - n * F.col("dx1") * F.col("dy1")) / (n - 1)
    vx = (F.col("sxx") - n * F.col("dx1") * F.col("dx1")) / (n - 1)
    vy = (F.col("syy") - n * F.col("dy1") * F.col("dy1")) / (n - 1)
    # Degenerate inputs (a constant column → vx/vy ≤ 0, or |r| = 1 where
    # atanh diverges) yield NULL, not NaN/crash — the identical CASE
    # conditions in the oracle produce the same NULLs.
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    # atanh/tanh via log/exp so the oracle's text is identical
    zr = F.when(F.abs(r) < 1, F.lit(0.5) * F.log((1 + r) / (1 - r)))
    half = F.lit(z) / F.sqrt(n - 3)
    lo_e = F.exp(F.lit(2.0) * (zr - half))
    hi_e = F.exp(F.lit(2.0) * (zr + half))
    return m.select(
        n.cast("long").alias("n_samples"),
        F.round(r, 6).alias("corr"),
        F.round((lo_e - 1) / (lo_e + 1), 6).alias("ci_lower"),
        F.round((hi_e - 1) / (hi_e + 1), 6).alias("ci_upper"),
    )


def approx_grouped_corr_ci(
    df: DataFrame,
    col_x: str,
    col_y: str,
    group_col: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """Per-group sampled Pearson correlation with Fisher-z intervals —
    the grouped twin of :func:`approx_corr_ci`, using the same
    shared-global-center trick as :func:`approx_grouped_stddev_ci`
    (cross/self moment algebra is exact for any constant centers):
    one 1-row first pass, then ONE grouped aggregate. Groups with n ≤ 3
    or a degenerate arm report NULL interval columns."""
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    sampled = (
        apply_sampling(df, spec)
        .select(F.col(group_col), x.alias("x"), y.alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    mrow = sampled.agg(F.avg("x").alias("mx"), F.avg("y").alias("my")).collect()[0]
    if mrow["mx"] is None or mrow["my"] is None:
        raise ValueError("empty sample; increase the fraction")
    cx, cy = _int_center(mrow["mx"]), _int_center(mrow["my"])
    dx = F.col("x") - F.lit(cx)
    dy = F.col("y") - F.lit(cy)
    m = sampled.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(dx).alias("dx1"),
        F.avg(dy).alias("dy1"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - n * F.col("dx1") * F.col("dy1")) / (n - 1)
    vx = (F.col("sxx") - n * F.col("dx1") * F.col("dx1")) / (n - 1)
    vy = (F.col("syy") - n * F.col("dy1") * F.col("dy1")) / (n - 1)
    r = F.when((n > 1) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    zr = F.when((n > 3) & (F.abs(r) < 1), F.lit(0.5) * F.log((1 + r) / (1 - r)))
    # n ≤ 3 groups: NULL half (DuckDB's sqrt raises on negatives where
    # Spark silently yields NaN — same cross-engine trap as the global
    # estimator's guards).
    half = F.when(n > 3, F.lit(z) / F.sqrt(n - 3))
    lo_e = F.exp(F.lit(2.0) * (zr - half))
    hi_e = F.exp(F.lit(2.0) * (zr + half))
    return m.select(
        F.col(group_col),
        n.cast("long").alias("n_samples"),
        F.round(r, 6).alias("corr"),
        F.round((lo_e - 1) / (lo_e + 1), 6).alias("ci_lower"),
        F.round((hi_e - 1) / (hi_e + 1), 6).alias("ci_upper"),
    ).orderBy(group_col)


def approx_grouped_corr_ci_sql(
    table: str,
    col_x: str,
    col_y: str,
    group_col: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle for :func:`approx_grouped_corr_ci`."""
    where = sampling_where_sql(spec)
    return f"""
WITH s AS (SELECT {group_col} AS g, CAST({col_x} AS DOUBLE) AS x,
                  CAST({col_y} AS DOUBLE) AS y
           FROM {table}
           WHERE ({where}) AND {col_x} IS NOT NULL AND {col_y} IS NOT NULL),
c AS (SELECT floor(avg(x) + 0.5) AS cx, floor(avg(y) + 0.5) AS cy FROM s),
m AS (
  SELECT g, count(*) AS n,
         avg(x - (SELECT cx FROM c)) AS dx1,
         avg(y - (SELECT cy FROM c)) AS dy1,
         sum((x - (SELECT cx FROM c)) * (x - (SELECT cx FROM c))) AS sxx,
         sum((y - (SELECT cy FROM c)) * (y - (SELECT cy FROM c))) AS syy,
         sum((x - (SELECT cx FROM c)) * (y - (SELECT cy FROM c))) AS sxy
  FROM s GROUP BY g
),
v AS (
  SELECT g, n,
         (sxy - n * dx1 * dy1) / (n - 1) AS cov,
         (sxx - n * dx1 * dx1) / (n - 1) AS vx,
         (syy - n * dy1 * dy1) / (n - 1) AS vy
  FROM m
),
f AS (
  SELECT g, n,
         CASE WHEN n > 1 AND vx > 0 AND vy > 0 THEN cov / sqrt(vx * vy) END AS r,
         CASE WHEN n > 3 THEN {z!r} / sqrt(n - 3) END AS half
  FROM v
),
gg AS (
  SELECT g, n, r, half,
         CASE WHEN n > 3 AND abs(r) < 1
              THEN 0.5 * ln((1 + r) / (1 - r)) END AS zr
  FROM f
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_samples,
       round(r, 6) AS corr,
       round((exp(2.0 * (zr - half)) - 1) / (exp(2.0 * (zr - half)) + 1), 6)
           AS ci_lower,
       round((exp(2.0 * (zr + half)) - 1) / (exp(2.0 * (zr + half)) + 1), 6)
           AS ci_upper
FROM gg ORDER BY g
"""


def approx_corr_ci_sql(
    table: str,
    col_x: str,
    col_y: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle for :func:`approx_corr_ci` — identical two-pass
    centered-moment algebra and log/exp hyperbolic identities."""
    where = sampling_where_sql(spec)
    return f"""
WITH s AS (SELECT CAST({col_x} AS DOUBLE) AS x, CAST({col_y} AS DOUBLE) AS y
           FROM {table}
           WHERE ({where}) AND {col_x} IS NOT NULL AND {col_y} IS NOT NULL),
c AS (SELECT floor(avg(x) + 0.5) AS cx, floor(avg(y) + 0.5) AS cy FROM s),
m AS (
  SELECT count(*) AS n,
         avg(x - (SELECT cx FROM c)) AS dx1,
         avg(y - (SELECT cy FROM c)) AS dy1,
         sum((x - (SELECT cx FROM c)) * (x - (SELECT cx FROM c))) AS sxx,
         sum((y - (SELECT cy FROM c)) * (y - (SELECT cy FROM c))) AS syy,
         sum((x - (SELECT cx FROM c)) * (y - (SELECT cy FROM c))) AS sxy
  FROM s
),
v AS (
  SELECT n,
         (sxy - n * dx1 * dy1) / (n - 1) AS cov,
         (sxx - n * dx1 * dx1) / (n - 1) AS vx,
         (syy - n * dy1 * dy1) / (n - 1) AS vy
  FROM m
),
f AS (
  SELECT n,
         CASE WHEN vx > 0 AND vy > 0 THEN cov / sqrt(vx * vy) END AS r,
         {z!r} / sqrt(n - 3) AS half
  FROM v
),
g AS (
  SELECT n, r, half,
         CASE WHEN abs(r) < 1 THEN 0.5 * ln((1 + r) / (1 - r)) END AS zr
  FROM f
)
SELECT CAST(n AS BIGINT) AS n_samples,
       round(r, 6) AS corr,
       round((exp(2.0 * (zr - half)) - 1) / (exp(2.0 * (zr - half)) + 1), 6)
           AS ci_lower,
       round((exp(2.0 * (zr + half)) - 1) / (exp(2.0 * (zr + half)) + 1), 6)
           AS ci_upper
FROM g
"""


def approx_ab_diff_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> DataFrame:
    """Sampled A/B mean difference with the Welch (unequal-variance)
    interval — the experiment-readout shape: ``mean(A) − mean(B) ±
    z·√(s²_A/n_A + s²_B/n_B)``.

    One shared integer center (from a ≤2-row first pass over both arms,
    which doubles as the arm-existence validation) keeps the per-arm
    moment algebra cancellation-free and engine-reproducible; the
    second pass is ONE grouped aggregate over the sample. Three jobs
    total per readout — the first-pass collect, the moments pass, and
    the final 1-row assembly the caller triggers — every driver sync
    ≤ 2 rows, so the shape holds at any scale. 1-row DataFrame:
    (n_a, n_b, mean_a, mean_b, diff, ci_lower, ci_upper)."""
    x = F.col(value_col).cast("double")
    g = F.col(group_col)
    sampled = (
        apply_sampling(df, spec)
        .filter(g.isin(group_a, group_b))
        # finite_col: a NaN measurement would otherwise poison avg()
        # into NaN and crash the integer shared-center derivation
        .select(g.alias("g"), finite_col(x).alias("x"))
        .filter(F.col("x").isNotNull())
    )
    arms = {
        r["g"]: r
        for r in sampled.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("x").alias("m"))
        .collect()
    }
    for arm in (group_a, group_b):
        if arm not in arms or arms[arm]["n"] < 2:
            raise ValueError(
                f"arm {arm!r} has fewer than 2 sampled rows; increase the fraction"
            )
    # Combined mean from the per-arm stats (mathematically the pooled
    # mean; the integer quantization below absorbs the float-association
    # difference vs the oracle's direct avg).
    n_tot = sum(arms[a]["n"] for a in (group_a, group_b))
    mu = sum(arms[a]["n"] * arms[a]["m"] for a in (group_a, group_b)) / n_tot
    c = _int_center(mu)
    d = F.col("x") - F.lit(c)
    per = sampled.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(d).alias("d1"),
        F.sum(d * d).alias("sd2"),
    )
    a = per.filter(F.col("g") == group_a).select(
        F.col("n").alias("na"), F.col("d1").alias("da"), F.col("sd2").alias("sa")
    )
    b = per.filter(F.col("g") == group_b).select(
        F.col("n").alias("nb"), F.col("d1").alias("db"), F.col("sd2").alias("sb")
    )
    j = a.crossJoin(b)
    var_a = (F.col("sa") - F.col("na") * F.col("da") * F.col("da")) / (F.col("na") - 1)
    var_b = (F.col("sb") - F.col("nb") * F.col("db") * F.col("db")) / (F.col("nb") - 1)
    diff = F.col("da") - F.col("db")
    se = F.sqrt(var_a / F.col("na") + var_b / F.col("nb"))
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.lit(c) + F.col("da"), 6).alias("mean_a"),
        F.round(F.lit(c) + F.col("db"), 6).alias("mean_b"),
        F.round(diff, 6).alias("diff"),
        F.round(diff - F.lit(z) * se, 6).alias("ci_lower"),
        F.round(diff + F.lit(z) * se, 6).alias("ci_upper"),
    )


def approx_ab_diff_ci_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle for :func:`approx_ab_diff_ci` — identical shared
    center and Welch algebra."""
    where = sampling_where_sql(spec)
    va = "((sa - na * da * da) / (na - 1))"
    vb = "((sb - nb * db * db) / (nb - 1))"
    return f"""
WITH s AS (
  SELECT {group_col} AS g,
         {finite_sql(f"CAST({value_col} AS DOUBLE)")} AS x
  FROM {table}
  WHERE ({where}) AND {group_col} IN ('{group_a}', '{group_b}')
    AND {finite_sql(f"CAST({value_col} AS DOUBLE)")} IS NOT NULL
),
c AS (SELECT floor(avg(x) + 0.5) AS c FROM s),
per AS (
  SELECT g, count(*) AS n,
         avg(x - (SELECT c FROM c)) AS d1,
         sum((x - (SELECT c FROM c)) * (x - (SELECT c FROM c))) AS sd2
  FROM s GROUP BY g
),
j AS (
  SELECT a.n AS na, a.d1 AS da, a.sd2 AS sa,
         b.n AS nb, b.d1 AS db, b.sd2 AS sb
  FROM (SELECT * FROM per WHERE g = '{group_a}') a,
       (SELECT * FROM per WHERE g = '{group_b}') b
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round((SELECT c FROM c) + da, 6) AS mean_a,
       round((SELECT c FROM c) + db, 6) AS mean_b,
       round(da - db, 6) AS diff,
       round((da - db) - {z!r} * sqrt({va} / na + {vb} / nb), 6) AS ci_lower,
       round((da - db) + {z!r} * sqrt({va} / na + {vb} / nb), 6) AS ci_upper
FROM j
"""


def approx_stddev_ci_sql(
    table: str,
    column: str,
    spec: SamplingSpec,
    z: float = Z_95,
) -> str:
    """DuckDB oracle computing the identical two-pass moment algebra."""
    where = sampling_where_sql(spec)
    return f"""
WITH s AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
           WHERE ({where}) AND {column} IS NOT NULL),
c AS (SELECT floor(avg(x) + 0.5) AS c FROM s),
m AS (
  SELECT count(*) AS n,
         avg(x - (SELECT c FROM c)) AS d1,
         sum((x - (SELECT c FROM c)) * (x - (SELECT c FROM c))) AS sd2,
         avg((x - (SELECT c FROM c)) * (x - (SELECT c FROM c))
             * (x - (SELECT c FROM c)) * (x - (SELECT c FROM c))) AS m4
  FROM s
),
v AS (
  SELECT n,
         sqrt(greatest(sd2 - n * d1 * d1, 0.0) / (n - 1)) AS sd,
         greatest(m4 - (greatest(sd2 - n * d1 * d1, 0.0) / (n - 1))
                       * (greatest(sd2 - n * d1 * d1, 0.0) / (n - 1))
                       * (n - 3) / (n - 1), 0) / n AS var_s2
  FROM m
),
h AS (
  SELECT n, sd,
         CASE WHEN sd > 0 THEN {z!r} * sqrt(var_s2) / (2.0 * sd)
              ELSE 0.0 END AS half
  FROM v
)
SELECT CAST(n AS BIGINT) AS n_samples,
       round(sd, 4) AS stddev,
       round(greatest(sd - half, 0.0), 4) AS ci_lower,
       round(sd + half, 4) AS ci_upper
FROM h
"""
