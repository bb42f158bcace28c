"""Error-latency profile (ELP) in ONE pass over the data.

BlinkDB picks a sample size by consulting an error-latency profile:
what error would a 1%/5%/10%/… sample give on this query? Computing
that profile naively costs one job per candidate fraction. This
engine's samples are NESTED — a row is in every fraction whose hash
threshold exceeds h — so the ENTIRE ladder's sample moments come from
one grouped pass:

1. each row gets its MINIMAL RUNG: the first ladder fraction whose
   threshold admits its hash (a CASE chain over ≤ |ladder| integer
   comparisons, pure codegen; the last rung is 1.0, so every row has
   one);
2. one groupBy(rung) computes per-rung (n, Σx, Σ(x−c)²) — integer
   cents moments about the global integer center c (one cheap exact
   pre-pass, the A10 convention);
3. a cumulative window over the ≤ |ladder| rung rows turns per-rung
   moments into per-FRACTION sample moments (rung r's cumulative =
   exactly the fraction-r sample, by nesting) — BIGINT additions in
   pinned rung order, no float folds;
4. each fraction's row reads out the expansion estimate
   round(Σx·N/n) — evaluated in DOUBLE with identical operand order in
   both engines, because the exact integer identity's cs·N product
   leaves int64 from sf1 up — and the SRS-without-replacement margin
   z·√(N(N−n)s²/n) with s² = (m2c − n·d²)/(n−1), d = x̄_f − c.

Output: one row per ladder fraction —
(fraction, n_sample, est_sum, ci_lower, ci_upper) — the realized
error-latency curve the fraction picker needs, for the cost of ~1
query instead of |ladder|.

The DuckDB oracle replays rung assignment, cumulative moments, and
readout; the estimates' CI columns follow the integer-margin
convention, so the whole curve certifies bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    fraction_threshold,
    portable_hash_col,
    portable_hash_sql,
)

Z_95 = 1.959963984540054
ELP_LADDER = (0.01, 0.02, 0.05, 0.1, 0.2, 0.5, 1.0)


def elp_fraction_sweep(
    df: DataFrame,
    key: str,
    value_cents: Column,
    ladder: tuple[float, ...] = ELP_LADDER,
    z: float = Z_95,
) -> DataFrame:
    """Per-fraction estimate curve from one grouped pass (plus the
    cheap global-center pre-pass)."""
    if not ladder or ladder[-1] != 1.0:
        raise ValueError("ladder must end at 1.0 so every row has a rung")
    thrs = [fraction_threshold(f) for f in ladder]
    if thrs != sorted(thrs):
        raise ValueError("ladder must be increasing")
    base = df.select(
        portable_hash_col(F.expr(key)).alias("__h"),
        value_cents.cast("long").alias("__x"),
    ).filter(F.col("__x").isNotNull())
    n_total, sx = base.agg(
        F.count(F.lit(1)).cast("long"), F.sum("__x").cast("long")
    ).collect()[0]
    if not n_total:
        raise ValueError("elp_fraction_sweep: empty input")
    c = (2 * sx + n_total) // (2 * n_total)
    rung: Column = F.lit(len(ladder) - 1)
    for i in range(len(ladder) - 2, -1, -1):
        rung = F.when(F.col("__h") < thrs[i], F.lit(i)).otherwise(rung)
    per_rung = (
        base.withColumn("__r", rung)
        .groupBy("__r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__x").cast("long").alias("s"),
            # Row squares fit in int64 ((10^7 cents)^2 < 2^63) but their
            # SUM does not from sf1 up — accumulate in decimal(38,0)
            # (exact, like DuckDB's HUGEINT), go double only in the
            # variance formula.
            F.sum(
                (
                    (F.col("__x") - F.lit(c)) * (F.col("__x") - F.lit(c))
                ).cast("decimal(38,0)")
            ).alias("m2"),
        )
    )
    # A rung can be empty (no hash landed in its band) — outer-join the
    # full ladder so every fraction still gets a row.
    spark = df.sparkSession
    ladder_df = spark.createDataFrame(
        [(i, float(f)) for i, f in enumerate(ladder)], "__r int, fraction double"
    )
    w_cum = Window.orderBy("__r").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        ladder_df.join(per_rung, on="__r", how="left")
        .select(
            "__r",
            "fraction",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("s", F.lit(0)).alias("s"),
            F.coalesce(F.col("m2"), F.lit(0).cast("decimal(38,0)")).alias("m2"),
        )
        .withColumn("cn", F.sum("n").over(w_cum))
        .withColumn("cs", F.sum("s").over(w_cum))
        .withColumn("cm2", F.sum("m2").over(w_cum))
    )
    d = (F.col("cs") - F.col("cn") * F.lit(c)).cast("double") / F.col("cn")
    s2 = F.when(
        F.col("cn") >= 2,
        (F.col("cm2").cast("double") - F.col("cn") * d * d) / (F.col("cn") - 1),
    ).otherwise(F.lit(0.0))
    var = (
        F.lit(float(n_total))
        * (F.lit(n_total) - F.col("cn")).cast("double")
        * s2
        / F.col("cn")
    )
    margin = F.round(F.lit(z) * F.sqrt(F.greatest(var, F.lit(0.0))), 0).cast("long")
    # Expansion in DOUBLE, not the (2a·N+n) div (2n) integer identity:
    # cs·N overflows int64 once Σcents·N > 2⁶² (true from sf1 up).
    # Both engines evaluate fl(fl(cs·N)/cn) with identical operands and
    # op order, so cross-engine parity is preserved; only exact
    # rationality is traded, and the output grid is cents anyway.
    est = F.round(
        F.col("cs").cast("double") * F.lit(float(n_total)) / F.col("cn"), 0
    ).cast("long")
    return (
        cum.filter(F.col("cn") > 0)
        .select(
            "fraction",
            F.col("cn").alias("n_sample"),
            F.round(est / F.lit(100.0), 2).alias("est_sum"),
            F.round((est - margin) / F.lit(100.0), 2).alias("ci_lower"),
            F.round((est + margin) / F.lit(100.0), 2).alias("ci_upper"),
        )
        .orderBy("fraction")
    )


def elp_fraction_sweep_sql(
    table: str,
    key: str,
    value_cents_sql: str,
    ladder: tuple[float, ...] = ELP_LADDER,
    z: float = Z_95,
) -> str:
    """DuckDB oracle — identical rung assignment, integer cumulative
    moments, and readout arithmetic."""
    thrs = [fraction_threshold(f) for f in ladder]
    h = portable_hash_sql(key)
    rung_case = "CASE " + " ".join(
        f"WHEN {h} < {thrs[i]} THEN {i}" for i in range(len(ladder) - 1)
    ) + f" ELSE {len(ladder) - 1} END"
    ladder_rows = ", ".join(
        f"({i}, CAST({float(f)!r} AS DOUBLE))" for i, f in enumerate(ladder)
    )
    return f"""
WITH base AS (
  SELECT {rung_case} AS r, CAST({value_cents_sql} AS BIGINT) AS x
  FROM {table}
  WHERE {value_cents_sql} IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total, CAST(sum(x) AS BIGINT) AS sx FROM base),
ctr AS (SELECT n_total, (2 * sx + n_total) // (2 * n_total) AS c FROM tot),
per AS (
  SELECT b.r, CAST(count(*) AS BIGINT) AS n, CAST(sum(b.x) AS BIGINT) AS s,
         sum((b.x - ctr.c) * (b.x - ctr.c)) AS m2
  FROM base b, ctr GROUP BY b.r
),
lad AS (SELECT * FROM (VALUES {ladder_rows}) AS t(r, fraction)),
cum AS (
  SELECT lad.r, lad.fraction,
         CAST(sum(coalesce(per.n, 0)) OVER (ORDER BY lad.r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
         CAST(sum(coalesce(per.s, 0)) OVER (ORDER BY lad.r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
         sum(coalesce(per.m2, 0)) OVER (ORDER BY lad.r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm2
  FROM lad LEFT JOIN per ON lad.r = per.r
),
fin AS (
  SELECT cum.fraction, cum.cn,
         CAST(round(CAST(cum.cs AS DOUBLE) * CAST(ctr.n_total AS DOUBLE)
                    / cum.cn, 0) AS BIGINT) AS est,
         CAST(round({z!r} * sqrt(greatest(
           CAST(ctr.n_total AS DOUBLE) * CAST(ctr.n_total - cum.cn AS DOUBLE)
           * (CASE WHEN cum.cn >= 2
                   THEN (CAST(cum.cm2 AS DOUBLE)
                         - cum.cn * (CAST(cum.cs - cum.cn * ctr.c AS DOUBLE) / cum.cn)
                                  * (CAST(cum.cs - cum.cn * ctr.c AS DOUBLE) / cum.cn))
                        / (cum.cn - 1)
                   ELSE 0.0 END) / cum.cn,
           0.0)), 0) AS BIGINT) AS margin
  FROM cum, ctr
  WHERE cum.cn > 0
)
SELECT fraction, cn AS n_sample,
       round(est / 100.0, 2) AS est_sum,
       round((est - margin) / 100.0, 2) AS ci_lower,
       round((est + margin) / 100.0, 2) AS ci_upper
FROM fin ORDER BY fraction
"""
