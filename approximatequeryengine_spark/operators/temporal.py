"""Temporal joins Spark lacks as built-ins: as-of join and
time-range join, expressed as compositions of existing DataFrame ops
(SURVEY.md custom-operator rule (a): composition before UDFs).

**As-of join** (each left row ↔ most recent right row at or before its
timestamp) is implemented with the union + partitioned-window
last-non-null pattern: tag both inputs, union them, and propagate the
right side's fields with ``last(..., ignorenulls=True)`` over
``(user, ts, side)`` ordering. Cost: ONE shuffle on the partition key —
no range explosion, no per-row lookup, state bounded by the window
frame. This is the standard scalable formulation (a sort-merge as-of);
a broadcast variant would apply when one side is tiny.

**Time-range join** (left row ↔ right rows within a trailing interval)
buckets time into interval-width buckets and equi-joins on
``(user, bucket)`` for the two candidate buckets, then applies the
exact range filter. This turns an inequality join (which Spark would
execute as BroadcastNestedLoop at any size) into an equi-join whose
fan-out is bounded by per-bucket density — the classic scale rewrite.

Both have exact DuckDB oracles (``ASOF JOIN`` is native there; the
range join is a plain inequality join at oracle scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import finite_col, finite_sql


def asof_purchase_click(spark: SparkSession, events: DataFrame) -> DataFrame:
    """For every purchase event: the most recent click by the same user
    at or before the purchase time (NULLs when none). Output:
    (purchase_id, user_id, purchase_ts, click_id, click_ts, gap_s).

    Clicks are first deduplicated to one per (user, ts) — max event_id —
    so the at-or-before tie is deterministic in both engines."""
    # a time join needs a time: NULL-ts rows on EITHER side are out
    # (Spark's NULLS-FIRST window order would otherwise hand a NULL-ts
    # click to every purchase, while the oracle's ASOF >= never
    # matches NULL — the null sweep caught exactly that divergence)
    events = events.filter(F.col("ts").isNotNull())
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            F.col("ts"),
            F.lit(0).alias("side"),
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    # click (side=0) sorts before a same-ts purchase (side=1) → "at or
    # before" includes equal timestamps, as ASOF's >= does.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_last = u.select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("asof_click_ts"),
    )
    return (
        with_last.filter(F.col("side") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("asof_click_id").alias("click_id"),
            F.col("asof_click_ts").alias("click_ts"),
            (F.col("ts").cast("long") - F.col("asof_click_ts").cast("long")).alias("gap_s"),
        )
    )


def asof_purchase_click_sql() -> str:
    return """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
       c.click_id, c.ts AS click_ts,
       (epoch_us(p.ts) // 1000000) - (epoch_us(c.ts) // 1000000) AS gap_s
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


RANGE_MINUTES = 60


def range_join_purchase_clicks(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Per purchase: how many clicks the same user made in the trailing
    60 minutes (inclusive bounds). Bucketed equi-join — see module
    docstring. Output: (purchase_id, user_id, n_clicks_1h)."""
    bucket_s = RANGE_MINUTES * 60
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        (F.col("ts").cast("long") / bucket_s).cast("long").alias("bucket"),
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("pts"),
            (F.col("ts").cast("long") / bucket_s).cast("long").alias("pbucket"),
        )
        # each purchase probes its own bucket and the previous one —
        # together they cover the whole trailing interval.
        .withColumn("bucket", F.explode(F.array(F.col("pbucket") - 1, F.col("pbucket"))))
    )
    clicks = clicks.withColumnRenamed("user_id", "c_user_id").withColumnRenamed(
        "bucket", "c_bucket"
    )
    # The range predicate must live IN the join condition: as a
    # post-filter it would drop a purchase whose probe rows all matched
    # only out-of-range clicks (left-join rows exist but none survive).
    cond = (
        (purchases["user_id"] == clicks["c_user_id"])
        & (purchases["bucket"] == clicks["c_bucket"])
        & (clicks["cts"] <= purchases["pts"])
        & (clicks["cts"] >= purchases["pts"] - F.expr(f"INTERVAL {RANGE_MINUTES} MINUTES"))
    )
    joined = purchases.join(clicks, cond, "left")
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(F.count("cts").alias("n_clicks_1h"))
    )


def range_join_purchase_clicks_sql() -> str:
    return f"""
WITH clicks AS (
  SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, count(c.cts) AS n_clicks_1h
FROM purchases p LEFT JOIN clicks c
  ON p.user_id = c.user_id
 AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL {RANGE_MINUTES} MINUTE
GROUP BY p.purchase_id, p.user_id
"""


FUNNEL_WINDOW = "1 DAY"  # max gap between consecutive funnel steps


def funnel_conversion(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Strictly-ordered funnel with conversion windows: per user, the
    earliest ``view``, then the earliest ``click`` within
    ``FUNNEL_WINDOW`` AFTER that view, then the earliest ``purchase``
    within ``FUNNEL_WINDOW`` after that click — the sequential funnel
    every product-analytics engine ships (out-of-order or too-late
    events don't count, matching real conversion semantics).

    Plan shape: ONE shuffle on ``user_id``; the three stage timestamps
    are windowed conditional minima over the same partition spec, so
    Catalyst reuses the exchange across all three selects, and the
    final rollup reduces per-user flags to a single accounting row:
    users entering each stage plus step-to-step and overall conversion
    rates."""
    w = Window.partitionBy("user_id")
    et, ts = F.col("event_type"), F.col("ts")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn("tv", F.min(F.when(et == "view", ts)).over(w))
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (et == "click")
                    & (ts > F.col("tv"))
                    & (ts <= F.col("tv") + F.expr(f"INTERVAL {FUNNEL_WINDOW}")),
                    ts,
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (et == "purchase")
                    & (ts > F.col("tc"))
                    & (ts <= F.col("tc") + F.expr(f"INTERVAL {FUNNEL_WINDOW}")),
                    ts,
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("tv").isNotNull().cast("long")).alias("s1"),
        F.max(F.col("tc").isNotNull().cast("long")).alias("s2"),
        F.max(F.col("tp").isNotNull().cast("long")).alias("s3"),
    )
    z = F.lit(0).cast("long")
    s1, s2, s3 = (F.coalesce(F.sum(c), z) for c in ("s1", "s2", "s3"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        s1.alias("n_view"),
        s2.alias("n_view_click"),
        s3.alias("n_full_funnel"),
        F.round(s2 / F.greatest(s1, F.lit(1)), 6).alias("rate_click_given_view"),
        F.round(s3 / F.greatest(s2, F.lit(1)), 6).alias("rate_purchase_given_click"),
        F.round(s3 / F.greatest(s1, F.lit(1)), 6).alias("rate_full_funnel"),
    )


def funnel_conversion_sql() -> str:
    """DuckDB oracle: identical windowed conditional minima."""
    return f"""
WITH staged AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS tv
  FROM events
),
staged2 AS (
  SELECT e.user_id, s.tv,
         min(CASE WHEN e.event_type = 'click' AND e.ts > s.tv
                       AND e.ts <= s.tv + INTERVAL {FUNNEL_WINDOW}
                  THEN e.ts END)
             OVER (PARTITION BY e.user_id) AS tc
  FROM events e
  JOIN (SELECT DISTINCT user_id, tv FROM staged) s USING (user_id)
),
staged3 AS (
  SELECT e.user_id, s.tv, s.tc,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > s.tc
                       AND e.ts <= s.tc + INTERVAL {FUNNEL_WINDOW}
                  THEN e.ts END)
             OVER (PARTITION BY e.user_id) AS tp
  FROM events e
  JOIN (SELECT DISTINCT user_id, tv, tc FROM staged2) s USING (user_id)
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS s1,
         max(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END) AS s2,
         max(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) AS s3
  FROM staged3 GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(coalesce(sum(s1), 0) AS BIGINT) AS n_view,
       CAST(coalesce(sum(s2), 0) AS BIGINT) AS n_view_click,
       CAST(coalesce(sum(s3), 0) AS BIGINT) AS n_full_funnel,
       round(CAST(coalesce(sum(s2), 0) AS DOUBLE) / greatest(coalesce(sum(s1), 0), 1), 6)
           AS rate_click_given_view,
       round(CAST(coalesce(sum(s3), 0) AS DOUBLE) / greatest(coalesce(sum(s2), 0), 1), 6)
           AS rate_purchase_given_click,
       round(CAST(coalesce(sum(s3), 0) AS DOUBLE) / greatest(coalesce(sum(s1), 0), 1), 6)
           AS rate_full_funnel
FROM per_user
"""


COHORT_EPOCH = "2024-01-01"  # fixture stream start; any fixed origin works


def cohort_retention(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event (week = floor(days-since-epoch / 7) — floor, not
    truncation, so pre-epoch days bucket into uniform 7-day weeks too;
    identical arithmetic in both engines, no locale-dependent
    date_trunc), and each (cohort_week, week_offset) cell counts the
    cohort's users active that week, as a retention rate against the
    cohort size.

    Plan shape: one distinct-reduce to (user, week) pairs, the cohort
    min as a window over the SAME user partitioning (exchange reused),
    then a cells×1 aggregate — the whole matrix costs two exchanges
    regardless of stream length, and the output is |cohorts|·|weeks|
    rows, driver-tiny at any scale."""
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit(COHORT_EPOCH).cast("date"))
        / 7
    ).cast("long")
    uw = events.select(F.col("user_id"), week.alias("week")).distinct()
    w = Window.partitionBy("user_id")
    cohorted = uw.withColumn("cohort_week", F.min("week").over(w))
    cells = (
        cohorted.groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        cells.join(sizes, on="cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql() -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '{COHORT_EPOCH}', CAST(ts AS DATE))
                    / 7.0) AS BIGINT) AS week
  FROM events
),
cohorted AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM uw
),
cells AS (
  SELECT cohort_week, week - cohort_week AS week_offset,
         count(*) AS n_active
  FROM cohorted GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, n_active AS cohort_size FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM cells c JOIN sizes s USING (cohort_week)
ORDER BY c.cohort_week, c.week_offset
"""


DECAY_SCALE = 1 << 20


def decayed_sum_by_type(
    spark: SparkSession,
    events: DataFrame,
    anchor: str = "2024-01-31",
    half_life_days: int = 7,
) -> DataFrame:
    """Exponentially time-decayed value totals per event type — the
    recency-weighted aggregate every freshness-sensitive metric wants
    (trending scores, decayed revenue, EWMA-style rollups):

        S = Σ value_i · λ^age_i ,   λ = 2^(−1/half_life)

    Output rows (event_type, n_events, decayed_sum), decayed_sum on
    the 2-decimal grid.

    Determinism: λ^age goes through the engine's pow(), which is not
    correctly rounded — so the per-row weight is snapped to the
    integer 2⁻²⁰ grid (ages take only |days| distinct values, so the
    rounding-boundary exposure is a few dozen draws, not N), and the
    accumulated Σ w·cents is pure BIGINT: no float-fold summation, one
    final division. Ages clamp at 0 for events past the anchor.

    Scale shape: one scan, one map-side-combined groupBy — the same
    cost as a plain grouped SUM. The decayed total is also mergeable
    across shards at a FIXED anchor (BIGINT addition); re-anchoring by
    d days is a global λ^d rescale, no rescan (the classic
    backward-decay property).
    """
    lam = 2.0 ** (-1.0 / half_life_days)
    age = F.greatest(
        F.lit(0), F.datediff(F.lit(anchor).cast("date"), F.col("ts").cast("date"))
    )
    w = F.round(F.pow(F.lit(lam), age) * F.lit(DECAY_SCALE), 0).cast("long")
    cents = F.floor(finite_col(F.col("value")) * 100.0 + 0.5).cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(w * cents) / F.lit(float(DECAY_SCALE)) / F.lit(100.0), 2
            ).alias("decayed_sum"),
        )
        .orderBy("event_type")
    )


def decayed_sum_by_type_sql(
    anchor: str = "2024-01-31", half_life_days: int = 7
) -> str:
    """DuckDB oracle — identical λ literal, integer-grid weights,
    BIGINT accumulation."""
    lam = 2.0 ** (-1.0 / half_life_days)
    return f"""
WITH w AS (
  SELECT event_type,
         CAST(round(power({lam!r},
             greatest(0, date_diff('day', CAST(ts AS DATE), DATE '{anchor}')))
           * {DECAY_SCALE}, 0) AS BIGINT) AS wt,
         CAST(floor({finite_sql("value")} * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(wt * cents) AS BIGINT) / CAST({DECAY_SCALE} AS DOUBLE)
             / 100.0, 2) AS decayed_sum
FROM w
GROUP BY event_type
ORDER BY event_type
"""


def time_bucket_gapfill(
    spark: SparkSession,
    events: DataFrame,
    bucket: str = "hour",
) -> DataFrame:
    """Dense time-bucketed rollup with gap filling + LOCF — the
    hypertable ``time_bucket_gapfill`` shape (TimescaleDB; also
    InfluxDB ``fill(previous)``): per (event_type, bucket) totals on a
    COMPLETE bucket grid, so downstream charting/forecasting sees an
    equally-spaced series, with empty buckets carrying n_events = 0, a
    NULL raw sum (honest: no data ≠ zero value) and the last observed
    sum carried forward.

    Output: (event_type, bucket_ts, n_events, sum_value, locf_sum),
    sums on the 2-decimal integer-cents grid.

    Construction, all DataFrame ops:
    1. one grouped scan → per-cell (type, bucket) aggregates;
    2. the dense grid = distinct types × ``sequence(min, max,
       1 bucket)`` exploded — generated from a 2-scalar aggregate, not
       a driver loop, and broadcast into the left join (the grid is
       O(types × buckets), KBs even for years of hourly buckets);
    3. LOCF via the gaps-and-islands trick: ``grp = count(non-null)
       OVER (type ORDER BY bucket)`` then ``max() OVER (type, grp)``
       — portable to the DuckDB oracle verbatim, no IGNORE NULLS
       dialect divergence.

    Scale shape: the only O(N) work is step 1's map-side-combined
    groupBy; everything after runs on O(cells) rows. The LOCF window
    partitions by event_type — parallel across types, and within a
    type the series is bounded by the bucket count, not the event
    count.
    """
    cell = (
        events.select(
            F.col("event_type"),
            F.date_trunc(bucket, F.col("ts")).alias("bucket_ts"),
            F.floor(finite_col(F.col("value")) * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    span = events.agg(
        F.date_trunc(bucket, F.min("ts")).alias("lo"),
        F.date_trunc(bucket, F.max("ts")).alias("hi"),
    )
    grid = (
        span.select(
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.expr(f"INTERVAL 1 {bucket}")
                )
            ).alias("bucket_ts")
        )
        .crossJoin(events.select("event_type").distinct())
    )
    dense = grid.join(cell, ["event_type", "bucket_ts"], "left")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = dense.withColumn("__grp", F.count("sum_cents").over(w_cum))
    w_grp = Window.partitionBy("event_type", "__grp")
    return dense.select(
        "event_type",
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.col("sum_cents") / 100.0, 2).alias("sum_value"),
        F.round(F.max("sum_cents").over(w_grp) / 100.0, 2).alias("locf_sum"),
    )


def time_bucket_gapfill_sql(bucket: str = "hour") -> str:
    """DuckDB oracle — generate_series grid, identical cents grid and
    gaps-and-islands LOCF."""
    return f"""
WITH cell AS (
  SELECT event_type, date_trunc('{bucket}', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor({finite_sql("value")} * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('{bucket}', min(ts)) AS lo,
         date_trunc('{bucket}', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.bucket_ts
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 {bucket})) AS bucket_ts
        FROM span) g
),
dense AS (
  SELECT grid.event_type, grid.bucket_ts, cell.n_events, cell.sum_cents,
         count(cell.sum_cents) OVER (
           PARTITION BY grid.event_type ORDER BY grid.bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM grid LEFT JOIN cell
    ON grid.event_type = cell.event_type AND grid.bucket_ts = cell.bucket_ts
)
SELECT event_type, bucket_ts,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       round(sum_cents / 100.0, 2) AS sum_value,
       round(max(sum_cents) OVER (PARTITION BY event_type, grp) / 100.0, 2)
         AS locf_sum
FROM dense
"""


def anomaly_days_by_type(spark: SparkSession, events: DataFrame, top: int = 3) -> DataFrame:
    """Pipeline-monitoring anomaly scan: the ``top`` most anomalous
    DAYS per event type by daily-volume z-score. Output:
    (event_type, day, n_events, z).

    The z-score derives from exact integer sums (n days, Σc, Σc² are
    BIGINTs; daily counts are integers), so mean and sample variance
    are single IEEE expressions identical in any engine — no
    order-dependent float aggregation anywhere, which is what makes
    the ranking (|z| DESC, day ASC) engine-portable. Two grouped
    passes — daily counts, then per-type moments — plus a window over
    |days| rows per type; at 100 TB both shuffles key on event_type
    (+day) and the window input is O(days·types), not O(events)."""
    daily = (
        # an event without an event time belongs to no day: a NULL-day
        # group would otherwise enter the per-type volume moments
        events.filter(F.col("ts").isNotNull())
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return anomaly_readout(daily, top)


def anomaly_readout(daily: DataFrame, top: int = 3) -> DataFrame:
    """The moments/z-score/rank readout over a (event_type, day,
    n_events) table — shared by the batch scan above and the streaming
    twin (`streaming/pipeline.py::anomaly_days_stream`), which drains
    the same daily counts from complete-mode state."""
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("s2"),
    )
    j = daily.join(F.broadcast(m), on="event_type").filter(F.col("nd") >= 2)
    mean = F.col("s").cast("double") / F.col("nd")
    var = F.greatest(
        (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("nd"))
        / (F.col("nd") - 1),
        F.lit(0.0),
    )
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    # var == 0 (all days identical) would divide by zero — engines
    # disagree on 0/0 vs x/0 semantics, so exclude the case outright.
    scored = j.filter(var > 0).select("event_type", "day", "n_events", z.alias("z"))
    w = Window.partitionBy("event_type").orderBy(F.abs(F.col("z")).desc(), F.col("day"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .select("event_type", "day", "n_events", F.round("z", 6).alias("z"))
        .orderBy("event_type", F.abs(F.col("z")).desc(), "day")
    )


def anomaly_days_by_type_sql(top: int = 3) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(n_events) AS BIGINT) AS s,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM daily GROUP BY 1
),
scored AS (
  SELECT daily.event_type, day, n_events,
         (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / nd)
           / sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / nd)
                           / (nd - 1), 0.0)) AS z
  FROM daily JOIN m USING (event_type)
  WHERE nd >= 2
    AND (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / nd) / (nd - 1) > 0
),
ranked AS (
  SELECT event_type, day, n_events, z,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(z) DESC, day ASC) AS rk
  FROM scored
)
SELECT event_type, day, n_events, round(z, 6) AS z
FROM ranked WHERE rk <= {top}
ORDER BY event_type, abs(z) DESC, day
"""
