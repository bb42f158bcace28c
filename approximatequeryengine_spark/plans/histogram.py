"""Fixed-grid histogram quantiles — the mergeable, scalable quantile
path.

``approx_percentile`` (DataSketches KLL) is engine-specific, so its
workload entry is rows-only. This module gives the deterministic
alternative: two passes — an exact (min, max) aggregate, then bin
counts on a fixed grid — and interpolated quantiles from the cumulative
histogram. The histogram is a plain ``groupBy(bin)``: map-side
combined, mergeable across partitions/shards/days by addition (the
same property as the Count-Min and HLL rollups). The estimate is
within one bin width ``(max−min)/bins`` of the ⌈q·n⌉-th order
statistic (on dense data that coincides with interpolated quantiles;
a sparse column can place the interpolated quantile between distant
points — the histogram answers the empirical-CDF inverse).

Every step is arithmetic both engines share bit-for-bit (double
subtraction/division/floor on the same values), so the DuckDB oracle
reproduces the estimates exactly. At 100 TB: two scans, one tiny
shuffle (≤ bins rows), no driver materialization beyond the bin table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIST_BINS = 1024


def hist_quantiles(
    df: DataFrame,
    column: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = HIST_BINS,
    round_to: int = 4,
) -> DataFrame:
    """One row per requested quantile: (q, estimate, n_rows).

    Estimate = left bin edge + linear interpolation within the first
    bin whose cumulative count reaches ``q·n`` (uniform-within-bin
    assumption; error ≤ one bin width)."""
    x = F.col(column).cast("double")
    spark = df.sparkSession
    mn, mx, n = df.agg(
        F.min(x).alias("mn"), F.max(x).alias("mx"), F.count(x).alias("n")
    ).collect()[0]
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    if n == 0 or mn is None:
        return qdf.select(
            "q",
            F.lit(None).cast("double").alias("estimate"),
            F.lit(0).cast("long").alias("n_rows"),
        ).orderBy("q")
    if mx == mn:
        return qdf.select(
            "q",
            F.round(F.lit(float(mn)), round_to).alias("estimate"),
            F.lit(int(n)).cast("long").alias("n_rows"),
        ).orderBy("q")
    width = (mx - mn) / bins
    bin_col = F.least(
        F.lit(bins - 1), F.floor((x - F.lit(float(mn))) / F.lit(float(width)))
    ).cast("long")
    # NULLs must not reach the binning expression: floor(NULL/width) is
    # NULL and F.least skips NULLs, which would land every NULL row in
    # the top bin while n = count(x) excludes them — cumulative counts
    # would overshoot the q·n targets on any nullable column.
    hist = df.filter(x.isNotNull()).select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return quantiles_from_hist(hist, float(mn), float(width), int(n), qs, round_to)


def quantiles_from_hist(
    hist: DataFrame,
    mn: float,
    width: float,
    n: int,
    qs: tuple[float, ...],
    round_to: int = 4,
) -> DataFrame:
    """Interpolated-quantile stage over a ``(bin, cnt)`` table — shared
    by the batch path and the streaming maintenance path (bin counts
    add, so a drained complete-mode stream's histogram is identical)."""
    spark = hist.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    # ≤ bins rows — broadcast against the (tiny) quantile list and pick
    # the first bin reaching each target.
    joined = qdf.crossJoin(F.broadcast(cum)).filter(
        F.col("cum") >= F.col("q") * F.lit(float(n))
    )
    first = joined.groupBy("q").agg(F.min("bin").alias("bin"))
    picked = first.join(cum, on="bin")
    est = F.lit(float(mn)) + (
        F.col("bin")
        + (F.col("q") * F.lit(float(n)) - F.col("cum_prev")) / F.col("cnt")
    ) * F.lit(float(width))
    return picked.select(
        "q",
        F.round(est, round_to).alias("estimate"),
        F.lit(int(n)).cast("long").alias("n_rows"),
    ).orderBy("q")


def hist_quantiles_sql(
    table: str,
    column: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = HIST_BINS,
    round_to: int = 4,
) -> str:
    """DuckDB oracle — identical grid, bin, cumulative, and
    interpolation arithmetic (the stats CTE replaces the collected
    mn/mx/n scalars)."""
    x = f"CAST({column} AS DOUBLE)"
    # CAST: DuckDB types a bare 0.5 literal as DECIMAL, which its
    # arrow fetch keeps distinct from Spark's double.
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({float(q)!r} AS DOUBLE) AS q" for q in qs
    )
    return f"""
WITH stats AS (SELECT min({x}) AS mn, max({x}) AS mx,
                      count({x}) AS n FROM {table}),
qs AS ({q_rows}),
hist AS (
  SELECT least({bins - 1},
               CAST(floor(({x} - (SELECT mn FROM stats))
                    / ((SELECT (mx - mn) / {bins} FROM stats))) AS BIGINT)) AS bin,
         count(*) AS cnt
  FROM {table} WHERE {x} IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS BIGINT)
             AS cum_prev
  FROM hist
),
first AS (
  SELECT q, min(bin) AS bin FROM qs, cum
  WHERE cum >= q * (SELECT n FROM stats) GROUP BY q
)
SELECT f.q,
       round((SELECT mn FROM stats)
             + (f.bin + (f.q * (SELECT n FROM stats) - c.cum_prev) / c.cnt)
               * ((SELECT (mx - mn) / {bins} FROM stats)), {round_to}) AS estimate,
       (SELECT CAST(n AS BIGINT) FROM stats) AS n_rows
FROM first f JOIN cum c ON f.bin = c.bin
ORDER BY f.q
"""
