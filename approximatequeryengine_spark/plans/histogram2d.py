"""2-D (joint) histogram for correlated-predicate selectivity.

The independence assumption — est(P_x ∧ P_y) = sel(P_x)·sel(P_y)·N —
is the classic optimizer failure mode on correlated columns (Ioannidis,
"The History of Histograms"; every modern engine ships some form of
multi-column statistics for exactly this reason). This module builds a
B×B joint grid in one aggregate pass and answers rectangle predicates
(x ≤ A ∧ y ≥ C) from the joint distribution, with the
independence-assumption estimate computed FROM THE SAME histogram's
marginals so the certified row contrasts the two on equal footing.

The workload entry uses documents.n_chars vs the text token count
(corr 0.998 — a near-functional dependency, the worst case for
independence): the true count for "short docs with many tokens" is 0,
the joint histogram estimates ~0, independence estimates ~10% of the
corpus.

Determinism: bin indices use the shared grid convention
(double subtract/divide/floor on identical values,
`plans/histogram.py`). Partial-cell coverage fractions are snapped to
an integer 2⁻²⁰ grid per cell, so every accumulated term is BIGINT —
c·cov_x·cov_y ≤ N·2⁴⁰ < 2⁶³ — and the only float operations on the
readout path are one final division and the output rounding (no
float-fold summation, the repo-wide discipline).

Scale shape: ONE pass computing min/max/exact-count (tiny agg), one
pass of cell counts (map-side combined to ≤ B² rows), then arithmetic
on the ≤ B² cell table. The histogram is mergeable by cell-count
addition, like every other synopsis here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HIST2D_BINS = 32
_COV_SCALE = 1 << 20


def hist2d_rect_selectivity(
    df: DataFrame,
    x: Column,
    y: Column,
    x_hi: float,
    y_lo: float,
    bins: int = HIST2D_BINS,
) -> DataFrame:
    """One-row readout (n_total, exact_rows, est_2d, est_indep) for the
    rectangle predicate x ≤ x_hi AND y ≥ y_lo.

    ``exact_rows`` rides the same first-pass aggregate that computes
    the grid bounds — the comparison costs no extra scan.
    """
    spark = df.sparkSession
    base = df.select(x.cast("double").alias("x"), y.cast("double").alias("y"))
    mnx, mxx, mny, mxy, n, exact = base.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y"),
        F.count(F.lit(1)).cast("long"),
        F.sum(
            ((F.col("x") <= x_hi) & (F.col("y") >= y_lo)).cast("long")
        ).cast("long"),
    ).collect()[0]
    if n == 0 or mnx is None or mxx == mnx or mxy == mny:
        raise ValueError("hist2d needs non-degenerate ranges on both columns")
    wx = (mxx - mnx) / bins
    wy = (mxy - mny) / bins
    cells = (
        base.select(
            F.least(F.lit(bins - 1), F.floor((F.col("x") - F.lit(float(mnx))) / F.lit(float(wx))))
            .cast("long").alias("bx"),
            F.least(F.lit(bins - 1), F.floor((F.col("y") - F.lit(float(mny))) / F.lit(float(wy))))
            .cast("long").alias("by"),
        )
        .groupBy("bx", "by")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # Per-cell coverage of the rectangle, snapped to the 2^-20 integer
    # grid: cov_x = clamp((x_hi - left_edge)/w, 0, 1) for x <= x_hi,
    # cov_y = clamp((right_edge - y_lo)/w, 0, 1) for y >= y_lo.
    cov_x = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                (F.lit(float(x_hi)) - (F.lit(float(mnx)) + F.col("bx") * F.lit(float(wx))))
                / F.lit(float(wx)),
            ),
        )
        * _COV_SCALE,
        0,
    ).cast("long")
    cov_y = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                ((F.lit(float(mny)) + (F.col("by") + 1) * F.lit(float(wy))) - F.lit(float(y_lo)))
                / F.lit(float(wy)),
            ),
        )
        * _COV_SCALE,
        0,
    ).cast("long")
    agg = cells.select(
        (F.col("c") * cov_x * cov_y).alias("t2d"),
        (F.col("c") * cov_x).alias("tx"),
        (F.col("c") * cov_y).alias("ty"),
    ).agg(
        F.sum("t2d").cast("long").alias("s2d"),
        F.sum("tx").cast("long").alias("sx"),
        F.sum("ty").cast("long").alias("sy"),
    )
    est_2d = F.round(F.col("s2d") / F.lit(float(_COV_SCALE * _COV_SCALE)), 3)
    est_indep = F.round(
        (F.col("sx") / F.lit(float(_COV_SCALE)))
        * (F.col("sy") / F.lit(float(_COV_SCALE)))
        / F.lit(float(n)),
        3,
    )
    return agg.select(
        F.lit(int(n)).cast("long").alias("n_total"),
        F.lit(int(exact)).cast("long").alias("exact_rows"),
        est_2d.alias("est_2d"),
        est_indep.alias("est_indep"),
    )


def hist2d_rect_selectivity_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    x_hi: float,
    y_lo: float,
    bins: int = HIST2D_BINS,
) -> str:
    """DuckDB oracle — the identical two-pass derivation (shared grid
    convention, same 2^-20 coverage snapping, BIGINT accumulation)."""
    s = _COV_SCALE
    return f"""
WITH base AS (
  SELECT CAST({x_sql} AS DOUBLE) AS x, CAST({y_sql} AS DOUBLE) AS y FROM {table}
),
m AS (
  SELECT min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN x <= {float(x_hi)!r} AND y >= {float(y_lo)!r}
                       THEN 1 ELSE 0 END) AS BIGINT) AS exact
  FROM base
),
g AS (SELECT *, (mxx - mnx) / {bins} AS wx, (mxy - mny) / {bins} AS wy FROM m),
cells AS (
  SELECT CAST(least({bins - 1}, floor((b.x - g.mnx) / g.wx)) AS BIGINT) AS bx,
         CAST(least({bins - 1}, floor((b.y - g.mny) / g.wy)) AS BIGINT) AS by,
         CAST(count(*) AS BIGINT) AS c
  FROM base b, g GROUP BY 1, 2
),
cov AS (
  SELECT c,
         CAST(round(least(1.0, greatest(0.0,
           ({float(x_hi)!r} - (g.mnx + bx * g.wx)) / g.wx)) * {s}, 0) AS BIGINT) AS cx,
         CAST(round(least(1.0, greatest(0.0,
           ((g.mny + (by + 1) * g.wy) - {float(y_lo)!r}) / g.wy)) * {s}, 0) AS BIGINT) AS cy
  FROM cells, g
),
a AS (
  SELECT CAST(sum(c * cx * cy) AS BIGINT) AS s2d,
         CAST(sum(c * cx) AS BIGINT) AS sx,
         CAST(sum(c * cy) AS BIGINT) AS sy
  FROM cov
)
SELECT (SELECT n FROM m) AS n_total,
       (SELECT exact FROM m) AS exact_rows,
       round(s2d / CAST({s}.0 * {s}.0 AS DOUBLE), 3) AS est_2d,
       round((sx / CAST({s} AS DOUBLE)) * (sy / CAST({s} AS DOUBLE))
             / CAST((SELECT n FROM m) AS DOUBLE), 3) AS est_indep
FROM a
"""
