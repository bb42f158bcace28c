"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
VLDB'19).

The sketch is a geometric histogram: value x > 0 lands in bucket

    b(x) = ⌈ ln(x) / ln(γ) ⌉ ,   γ = (1+α)/(1−α)

and the q-quantile is read back as the γ-midpoint of the bucket holding
the rank-⌊q·(n−1)⌋+1 item,

    x̂ = 2·γᵇ / (γ+1) ,

which is within relative error α of that item's true value — a
GUARANTEED bound, not a probabilistic one, for any data distribution
(the paper's Theorem 1). That makes DDSketch the right quantile synopsis
for heavy-tailed columns where the grid histogram
(`plans/histogram.py`) would need unbounded range knowledge: bucket
widths scale with the values, so p50 and p99.9 of a price column get the
same RELATIVE accuracy.

Unlike every sampling estimator in this package the sketch is fully
deterministic (no hash, no seed) and exactly mergeable: the bucket table
of a union is the bucket-wise count sum, which `tests` pin as the merge
law. That composes with the incremental-state machinery
(`plans/incremental.py`) — per-partition sketches roll up losslessly.

Cross-engine determinism: the only transcendental in the bucket index is
the engine's ln(x); both engines' ln are faithful to ≲2 ulp, so the
ceiling can only disagree when ln(x)/ln γ sits within ~1e-13 of an exact
integer — i.e. x within ~1e-13 relative of a bucket boundary γⁱ, which
the cents-grid inputs never are (γ powers are irrational w.r.t. the
grid). Deliberately NO intermediate rounding: round(·, 9) would
introduce 1e-9-spaced decision boundaries, a ~10⁴× larger disagreement
window than the bare integer ceiling. The readout γᵇ goes through
pow(), so the OUTPUT is rounded to 6 decimals (repo convention for
boundary-safe float emission).

Scale shape: ONE scan with a pure-codegen bucket expression →
map-side-combined count by bucket (|buckets| = ln(max/min)/ln γ ≈ 575
for α=0.01 over [1, 10⁵] — constant in N) → a single-partition window
over the tiny bucket table → one conditional-aggregate readout row. No
joins, no driver-side data.

Reference scope note: the reference engine (C++ B+-tree AQE) has no
quantile capability at all; this is a beyond-reference operator in the
SURVEY §2.6 family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import finite_col, finite_sql


def _params(alpha: float) -> tuple[float, float]:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return gamma, math.log(gamma)


def ddsketch_buckets(df: DataFrame, column: str, alpha: float = 0.01) -> DataFrame:
    """Bucket table (b, c) for positive values of ``column``.

    This IS the sketch: mergeable by bucket-wise count sum. ln γ is
    computed once in Python and embedded as a literal so both the Spark
    plan and any oracle divide by bit-identical constants.
    """
    _, lg = _params(alpha)
    return (
        df.filter(finite_col(F.col(column)) > 0)
        .select(
            F.ceil(F.log(F.col(column).cast("double")) / F.lit(lg))
            .cast("long")
            .alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def ddsketch_readout(
    buckets: DataFrame,
    alpha: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group: str | None = None,
) -> DataFrame:
    """THE readout stage, over a ``(b, c)`` — or, with ``group``, a
    ``(g, b, c)`` — bucket table. Shared by every DDSketch path: the
    batch estimator, the grouped estimator, the collapsed variant, the
    streaming maintenance path (bucket counts add, so a drained
    complete-mode stream state is the same table) and the rollup
    store's range merge. One definition so the cum-window/rank/stack
    arithmetic cannot drift between paths (it did once, on the
    empty-input row). Unlike the grid histogram's streaming twin, NO
    batch pre-pass is needed: DDSketch buckets are fixed by α alone,
    not by data-range statistics.

    Output: ``(group?, q, bucket, est_q, n)`` ordered by (group?, q).
    """
    gamma, _ = _params(alpha)
    part = ["g"] if group else []
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = buckets.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy(*part))
    )
    aggs = []
    for i, q in enumerate(qs):
        target = F.floor(F.lit(float(q)) * (F.col("n") - 1)).cast("long") + 1
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("b"))).alias(f"__b{i}")
        )
    one = cum.groupBy(*part).agg(*aggs, F.max("n").cast("long").alias("n"))
    stack_args = ", ".join(
        f"CAST({float(q)!r} AS DOUBLE), __b{i}" for i, q in enumerate(qs)
    )
    head = [F.col("g").alias(group)] if group else []
    rows = one.select(
        *head, F.expr(f"stack({len(qs)}, {stack_args}) AS (q, bucket)"), F.col("n")
    )
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(gamma), F.col("bucket")) / F.lit(gamma + 1.0), 6
    )
    # Empty input → the global agg yields one all-NULL row → q rows of
    # NULLs; drop them so empty-in means empty-out (grouped parity —
    # a grouped agg simply has no row for an absent group, so the
    # filter is a no-op there).
    out = [group] if group else []
    return (
        rows.filter(F.col("n").isNotNull())
        .select(
            *out,
            "q",
            F.col("bucket").cast("long").alias("bucket"),
            est.alias("est_q"),
            "n",
        )
        .orderBy(*out, "q")
    )


def ddsketch_quantiles(
    df: DataFrame,
    column: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile readout rows (q, bucket, est_q, n) from one pass.

    Rank convention: the bucket of the 1-based rank ⌊q·(n−1)⌋+1 item
    (the paper's low-interpolation convention); selection is a
    conditional MIN over the cumulative bucket table — no join, the
    whole readout is two tiny single-partition operators downstream of
    the one data scan.
    """
    return ddsketch_readout(ddsketch_buckets(df, column, alpha), alpha, qs)


def ddsketch_grouped_quantiles(
    df: DataFrame,
    column: str,
    group: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-group quantiles (group, q, bucket, est_q, n) from ONE
    grouped bucket pass — the grouped quantile shape WITHOUT a
    per-group sort: one shuffle on (group, bucket), then per-group
    windows over |group|·|buckets| tiny rows. The α-guarantee holds
    per group (bucketing is group-independent)."""
    _, lg = _params(alpha)
    buckets = (
        df.filter(finite_col(F.col(column)) > 0)
        .select(
            F.col(group).alias("g"),
            F.ceil(F.log(F.col(column).cast("double")) / F.lit(lg))
            .cast("long")
            .alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return ddsketch_readout(buckets, alpha, qs, group=group)


def _readout_sql(
    bk_ctes: str,
    alpha: float,
    qs: tuple[float, ...],
    group: str | None = None,
) -> str:
    """THE readout as DuckDB SQL, mirroring ``ddsketch_readout`` over a
    CTE chain ending in ``bk`` with columns ``(g?, b, c)`` — shared by
    every oracle generator so the cum/rank/stack arithmetic is written
    exactly once per engine. Same embedded ln γ literal, same bare
    integer ceiling, same rank convention, same 6-decimal output
    rounding as the Spark side."""
    gamma, _ = _params(alpha)
    g_sel = "g, " if group else ""
    part = "PARTITION BY g " if group else ""
    part_n = "PARTITION BY g" if group else ""
    group_by = " GROUP BY g" if group else ""
    head = f"g AS {group}, " if group else ""
    order = f"{group}, q" if group else "q"
    sel = ", ".join(
        f"min(CASE WHEN cum >= CAST(floor({float(q)!r} * (n - 1)) AS BIGINT) + 1 "
        f"THEN b END) AS __b{i}"
        for i, q in enumerate(qs)
    )
    unions = " UNION ALL ".join(
        f"SELECT {g_sel}CAST({float(q)!r} AS DOUBLE) AS q, __b{i} AS bucket, n FROM one"
        for i, q in enumerate(qs)
    )
    return f"""
WITH {bk_ctes},
cum AS (
  SELECT {g_sel}b, c,
         sum(c) OVER ({part}ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER ({part_n}) AS n
  FROM bk
),
one AS (SELECT {g_sel}{sel}, CAST(max(n) AS BIGINT) AS n FROM cum{group_by})
SELECT {head}q, CAST(bucket AS BIGINT) AS bucket,
       round(2.0 * power({gamma!r}, bucket) / ({gamma!r} + 1.0), 6) AS est_q, n
FROM ({unions})
WHERE n IS NOT NULL
ORDER BY {order}
"""


def ddsketch_grouped_quantiles_sql(
    table: str,
    column: str,
    group: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> str:
    """DuckDB oracle for the grouped readout — same arithmetic with
    PARTITION BY windows."""
    _, lg = _params(alpha)
    bk = f"""pts AS (
  SELECT {group} AS g, CAST({column} AS DOUBLE) AS x FROM {table} WHERE {finite_sql(column)} > 0
),
bk AS (
  SELECT g, CAST(ceil(ln(x) / {lg!r}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2
)"""
    return _readout_sql(bk, alpha, qs, group=group)


def ddsketch_quantiles_sql(
    table: str,
    column: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB oracle for the global readout."""
    _, lg = _params(alpha)
    bk = f"""pts AS (
  SELECT CAST({column} AS DOUBLE) AS x FROM {table} WHERE {finite_sql(column)} > 0
),
bk AS (
  SELECT CAST(ceil(ln(x) / {lg!r}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM pts GROUP BY 1
)"""
    return _readout_sql(bk, alpha, qs)


def ddsketch_collapse(buckets: DataFrame, max_buckets: int) -> DataFrame:
    """The paper's bounded-memory contract (§2.2): when the bucket
    table exceeds ``max_buckets``, the LOWEST buckets collapse into
    the m-th-largest index b_cut — i.e. b' = greatest(b, b_cut) —
    keeping the table at ≤ m rows forever. The α-guarantee is
    preserved for every quantile whose rank lies ABOVE the collapsed
    mass (the high quantiles a monitoring system reads); quantiles
    inside the collapsed region degrade to "≤ the collapse boundary",
    which the readout reports honestly via the collapsed bucket.

    Pure arithmetic over the tiny bucket table (a rank + a clamp), so
    it is collapse-order-free — collapse(merge(A, B)) ==
    merge-then-collapse — and replays exactly in SQL.
    """
    if max_buckets < 1:
        raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")
    w = Window.orderBy(F.desc("b"))
    # agg(max) over the 0-or-1-row rank selection always yields ONE row
    # (NULL when fewer than max_buckets exist), so the crossJoin never
    # empties the bucket table; coalesce(b_cut, b) is then a no-op.
    cut = (
        buckets.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == max_buckets)
        .agg(F.max("b").alias("__cut"))
    )
    with_cut = buckets.crossJoin(F.broadcast(cut))
    return (
        with_cut.select(
            F.greatest(
                F.col("b"), F.coalesce(F.col("__cut"), F.col("b"))
            ).alias("b"),
            F.col("c"),
        )
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def ddsketch_collapsed_quantiles_sql(
    table: str,
    column: str,
    alpha: float = 0.01,
    max_buckets: int = 64,
    qs: tuple[float, ...] = (0.9, 0.99),
) -> str:
    """DuckDB oracle for collapse → readout: the same clamp via a
    scalar subquery for the m-th-largest bucket index."""
    _, lg = _params(alpha)
    bk = f"""pts AS (
  SELECT CAST({column} AS DOUBLE) AS x FROM {table} WHERE {finite_sql(column)} > 0
),
raw AS (
  SELECT CAST(ceil(ln(x) / {lg!r}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM pts GROUP BY 1
),
cut AS (
  SELECT b AS bc FROM raw ORDER BY b DESC LIMIT 1 OFFSET {max_buckets - 1}
),
bk AS (
  SELECT greatest(raw.b, coalesce((SELECT bc FROM cut), raw.b)) AS b,
         CAST(sum(raw.c) AS BIGINT) AS c
  FROM raw GROUP BY 1
)"""
    return _readout_sql(bk, alpha, qs)


def ddsketch_store_write(
    spark,
    df: DataFrame,
    path: str,
    ts_col: str,
    group: str,
    column: str,
    alpha: float = 0.01,
) -> None:
    """Pre-aggregated sketch cube (the Druid/Pinot rollup pattern):
    per-(day, group) DDSketch bucket tables, day-partitioned on disk.
    Because the sketch is exactly mergeable, ANY later date-range
    percentile query is a bucket-sum over the store — the raw events
    are scanned once at ingest, never at query time, and a day's
    partition is O(groups · buckets) regardless of event volume."""
    _, lg = _params(alpha)
    (
        df.filter(finite_col(F.col(column)) > 0)
        .select(
            F.col(ts_col).cast("date").cast("string").alias("day"),
            F.col(group).alias("g"),
            F.ceil(F.log(F.col(column).cast("double")) / F.lit(lg))
            .cast("long")
            .alias("b"),
        )
        .groupBy("day", "g", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(f"{path}/buckets")
    )


def ddsketch_store_range_quantiles(
    spark,
    path: str,
    day_lo: str,
    day_hi: str,
    group: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-group quantiles over an arbitrary day range, served from the
    STORE alone: day-partition pruning on the scan, one bucket-sum
    merge, then the shared grouped readout. Rows
    (group, q, bucket, est_q, n)."""
    merged = (
        spark.read.parquet(f"{path}/buckets")
        # Partition-type inference may surface `day` as DATE; the cast
        # normalizes either way and the BETWEEN still prunes partitions.
        .filter(F.col("day").cast("string").between(day_lo, day_hi))
        .groupBy("g", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return ddsketch_readout(merged, alpha, qs, group=group)


def ddsketch_store_range_quantiles_sql(
    table: str,
    ts_col: str,
    group: str,
    column: str,
    day_lo: str,
    day_hi: str,
    alpha: float = 0.01,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> str:
    """DuckDB oracle: derives the SAME answers from the raw events in
    the range — certifying that the store's ingest-time rollup plus
    query-time merge loses nothing."""
    _, lg = _params(alpha)
    bk = f"""pts AS (
  SELECT {group} AS g, CAST({column} AS DOUBLE) AS x
  FROM {table}
  WHERE {finite_sql(column)} > 0
    AND CAST(CAST({ts_col} AS DATE) AS VARCHAR) BETWEEN '{day_lo}' AND '{day_hi}'
),
bk AS (
  SELECT g, CAST(ceil(ln(x) / {lg!r}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2
)"""
    return _readout_sql(bk, alpha, qs, group=group)
