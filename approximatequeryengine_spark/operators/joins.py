"""Skew-robust join utilities.

AQE's skew-join splitting (enabled in the session factory) handles most
hot-key cases at runtime, but only for sort-merge joins it can observe.
Two explicit fallbacks cover the remaining shapes, in preference order:

- ``skew_split_join`` — hot keys via broadcast, cold keys via the
  plain shuffle join; no replication. Measured 2.3× over plain/salted/
  AQE under a 50% hot key (SCALING.md round-6 table). Use it whenever
  the other side's rows for the hot keys fit a broadcast.
- ``salted_join`` — fans each hot key over ``salt_buckets`` reducers
  at the cost of replicating the smaller side ``salt_buckets``×. The
  remaining niche: hot keys whose other-side rows are themselves too
  large to broadcast.

Semantics are identical to the plain equi-join (tested); only the
physical key distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import finite_col, finite_sql

SALT_COL = "__aqe_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s join-key distribution has hot keys.

    The skewed side gets a per-row salt in ``[0, salt_buckets)`` (from a
    hash of the whole row's partition-position — cheap, no extra
    shuffle); ``other`` is replicated once per salt value. The join key
    becomes ``(on…, salt)``, so one hot key spreads across
    ``salt_buckets`` tasks instead of one straggler.
    """
    if isinstance(on, str):
        on = [on]
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.spark_partition_id() * 2654435761 + F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted.join(replicated, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def skew_split_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    hot_top: int = 16,
) -> DataFrame:
    """Equi-join that routes the ``hot_top`` most frequent join keys of
    ``skewed`` through a BROADCAST join and everything else through the
    normal shuffle join — the split AQE performs for sort-merge joins,
    made explicit for the shapes AQE cannot see.

    Compared to :func:`salted_join` this replicates NOTHING: the other
    side's rows for the hot keys are (by definition of "a handful of
    hot keys") a bounded relation, so they broadcast; the cold
    remainder shuffles without stragglers because its per-key counts
    are bounded by the hot cutoff. Costs one extra aggregate over the
    skewed side's keys (TakeOrdered(hot_top), no global sort) and a
    second scan of ``skewed`` for the split — both linear, no
    replication, identical result set (union of a disjoint key
    partition; tested against the plain join).

    ``how`` supports ``inner`` only: outer variants would need
    unmatched-row bookkeeping across the two legs."""
    if how != "inner":
        raise ValueError(f"skew_split_join supports how='inner' only, got {how!r}")
    if isinstance(on, str):
        on = [on]
    if hot_top < 1:
        raise ValueError(f"hot_top must be >= 1, got {hot_top}")
    hot = (
        skewed.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__aqe_freq"))
        .orderBy(F.desc("__aqe_freq"), *[F.asc(c) for c in on])
        .limit(hot_top)
        .select(*on)
        .withColumn("__aqe_hot", F.lit(True))
    )
    tagged = skewed.join(F.broadcast(hot), on=on, how="left")
    hot_rows = tagged.filter(F.col("__aqe_hot").isNotNull()).drop("__aqe_hot")
    cold_rows = tagged.filter(F.col("__aqe_hot").isNull()).drop("__aqe_hot")
    other_hot = other.join(F.broadcast(hot.drop("__aqe_hot")), on=on, how="inner")
    joined_hot = hot_rows.join(F.broadcast(other_hot), on=on, how="inner")
    joined_cold = cold_rows.join(other, on=on, how="inner")
    return joined_hot.unionByName(joined_cold)


def profile_key_skew(df: DataFrame, key: str, top: int = 5) -> DataFrame:
    """The diagnostic that decides between a plain, salted, or broadcast
    join: the join-key frequency profile.

    One row: total rows, distinct keys, the heaviest key's share of all
    rows, the top-``top`` keys' combined share, the mean rows-per-key,
    and the max/mean frequency ratio (``skew_ratio`` — 1.0 is perfectly
    uniform; a shuffle partition stuck with the max key runs
    ``skew_ratio``× the average task, which is exactly the straggler
    multiple AQE's skew split or :func:`salted_join` must absorb).

    Plan shape: one groupBy on the key (the same exchange the join
    itself would pay), then a ``top``-row TakeOrdered — no global sort,
    nothing wide on the driver. Run it on a sample for a free estimate;
    frequencies scale linearly under uniform sampling.
    """
    freq = df.groupBy(F.expr(key).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    topk = freq.orderBy(F.desc("c"), F.asc("k")).limit(top)
    stats = freq.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_freq"),
    )
    top_sum = topk.agg(F.sum("c").alias("top_freq"))
    return (
        stats.crossJoin(top_sum)
        .select(
            "n_rows",
            "n_keys",
            F.col("max_freq"),
            F.round(F.col("max_freq") / F.col("n_rows"), 6).alias("max_share"),
            F.round(F.col("top_freq") / F.col("n_rows"), 6).alias(f"top{top}_share"),
            F.round(F.col("n_rows") / F.col("n_keys"), 6).alias("mean_freq"),
            F.round(
                F.col("max_freq") / (F.col("n_rows") / F.col("n_keys")), 6
            ).alias("skew_ratio"),
        )
    )


def profile_key_skew_sql(table: str, key: str, top: int = 5) -> str:
    """DuckDB oracle: identical frequency algebra (integer counts, so
    the only floats are final rounded quotients)."""
    return f"""
WITH freq AS (SELECT {key} AS k, count(*) AS c FROM {table} GROUP BY 1),
topk AS (SELECT c FROM freq ORDER BY c DESC, k ASC LIMIT {top}),
stats AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_freq
  FROM freq
),
ts AS (SELECT CAST(sum(c) AS BIGINT) AS top_freq FROM topk)
SELECT n_rows, n_keys, max_freq,
       round(CAST(max_freq AS DOUBLE) / n_rows, 6) AS max_share,
       round(CAST(top_freq AS DOUBLE) / n_rows, 6) AS top{top}_share,
       round(CAST(n_rows AS DOUBLE) / n_keys, 6) AS mean_freq,
       round(CAST(max_freq AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys), 6)
           AS skew_ratio
FROM stats, ts
"""


# ---------------------------------------------------------------------------
# Universe (coordinated) sampling over a many-to-many join — the Quickr
# / "join synopses" estimator (Kandula et al. SIGMOD'16): sampling each
# side INDEPENDENTLY at rate p keeps only p² of the join's pairs and
# blows up variance quadratically; sampling the JOIN-KEY UNIVERSE with
# one shared hash keeps every pair whose key survives, so the estimate
# scales by 1/p (not 1/p²) and the variance is driven by per-key pair
# totals. Beyond the reference (it has no joins).
# ---------------------------------------------------------------------------

UNIVERSE_SALT = 11
_Z975 = 1.959963984540054


def universe_join_pairs(
    spark,
    events: DataFrame,
    fraction: float = 0.2,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """Estimate the size (and total right-side value) of the
    ``left_type`` × ``right_type`` per-user pair join from a
    coordinated ``fraction`` sample of the ``user_id`` universe.

    The plan never materializes the many-to-many join: both sides
    aggregate per key first (count, and value-cents sum on the right),
    the per-key summaries join 1:1, and pairs-per-key is the product
    ``n_left · n_right`` — O(rows) work and one co-partitioned shuffle
    instead of O(pairs). The universe predicate is a pure arithmetic
    filter on the key evaluated at scan time (an expression over
    ``user_id`` — not a parquet-pushable literal predicate, but it runs
    before any shuffle and cuts both shuffles ~1/p), and the SAME keys
    survive on both sides — the property per-side Bernoulli sampling
    lacks: independent p-sampling of each side keeps only p² of the
    pairs and inflates variance quadratically.

    Estimator: per-key totals t_u are observed exactly for sampled
    keys; T̂ = Σt_u/p is Horvitz-Thompson-unbiased over the key
    universe; Var(T̂) = (1−p)/p² · Σt_u². All outputs are integers
    (value on a cents grid, integer CI margins), so the DuckDB oracle
    (:func:`universe_join_pairs_sql`) matches bit-for-bit."""
    from approximatequeryengine_spark.functions.hashing import (
        fraction_threshold,
        portable_hash_col,
    )

    thr = fraction_threshold(fraction)
    p = float(fraction)
    keyed = events.filter(
        portable_hash_col(F.col("user_id"), UNIVERSE_SALT) < F.lit(thr)
    ).filter(F.col("event_type").isin(left_type, right_type))
    # ONE conditional grouped aggregate instead of two per-side
    # aggregates + a self-join (round 10, guide §2.4): a key survives
    # the inner join iff it has rows on BOTH sides, i.e. n_l > 0 AND
    # n_r > 0 over the conditional counts — same n_l/n_r/cents_r
    # values for every surviving key, so every downstream integer is
    # unchanged (cents_r stays NULL when all right-side values are
    # non-finite, exactly as the join path's sum). One shuffle per
    # rung instead of three exchanges feeding a join.
    is_l = F.col("event_type") == left_type
    is_r = F.col("event_type") == right_type
    per_key = (
        keyed.groupBy("user_id")
        .agg(
            F.count(F.when(is_l, 1)).cast("long").alias("n_l"),
            F.count(F.when(is_r, 1)).cast("long").alias("n_r"),
            F.sum(
                F.when(
                    is_r,
                    F.floor(
                        finite_col(F.col("value")) * F.lit(100.0) + F.lit(0.5)
                    ).cast("long"),
                )
            ).alias("cents_r"),
        )
        .filter((F.col("n_l") > 0) & (F.col("n_r") > 0))
        .select(
            (F.col("n_l") * F.col("n_r")).alias("t"),
            (F.col("n_l") * F.col("cents_r")).alias("v"),
        )
    )
    est = F.round(F.sum("t") / F.lit(p), 0).cast("long")
    margin = F.round(
        F.lit(_Z975)
        * F.sqrt(F.sum(F.col("t") * F.col("t")) * F.lit((1.0 - p) / (p * p))),
        0,
    ).cast("long")
    return per_key.agg(
        est.alias("est_pairs"),
        (est - margin).alias("ci_lower"),
        (est + margin).alias("ci_upper"),
        F.round(F.sum("v") / F.lit(p), 0).cast("long").alias("est_value_cents"),
        F.count(F.lit(1)).cast("long").alias("n_keys_sampled"),
    )


def universe_join_pairs_sql(
    fraction: float = 0.2,
    left_type: str = "click",
    right_type: str = "purchase",
) -> str:
    from approximatequeryengine_spark.functions.hashing import (
        fraction_threshold,
        portable_hash_sql,
    )

    thr = fraction_threshold(fraction)
    p = repr(float(fraction))
    pred = f"{portable_hash_sql('user_id', UNIVERSE_SALT)} < {thr}"
    return f"""
WITH l AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_l FROM events
  WHERE event_type = '{left_type}' AND {pred} GROUP BY user_id
),
r AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_r,
         CAST(sum(CAST(floor({finite_sql("value")} * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents_r
  FROM events
  WHERE event_type = '{right_type}' AND {pred} GROUP BY user_id
),
per AS (
  SELECT l.n_l * r.n_r AS t, l.n_l * r.cents_r AS v
  FROM l JOIN r ON l.user_id = r.user_id
)
SELECT CAST(round(CAST(sum(t) AS BIGINT) / {p}, 0) AS BIGINT) AS est_pairs,
       CAST(round(CAST(sum(t) AS BIGINT) / {p}, 0)
            - round({_Z975} * sqrt(CAST(sum(t * t) AS BIGINT)
                                   * ((1.0 - {p}) / ({p} * {p}))), 0) AS BIGINT) AS ci_lower,
       CAST(round(CAST(sum(t) AS BIGINT) / {p}, 0)
            + round({_Z975} * sqrt(CAST(sum(t * t) AS BIGINT)
                                   * ((1.0 - {p}) / ({p} * {p}))), 0) AS BIGINT) AS ci_upper,
       CAST(round(CAST(sum(v) AS BIGINT) / {p}, 0) AS BIGINT) AS est_value_cents,
       CAST(count(*) AS BIGINT) AS n_keys_sampled
FROM per
"""


ADAPTIVE_JOIN_LADDER = (0.05, 0.1, 0.2, 0.4, 0.8, 1.0)


def adaptive_universe_join(
    events: DataFrame,
    error_bp: int = 500,
    ladder: tuple[float, ...] = ADAPTIVE_JOIN_LADDER,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """Online-aggregation-style ADAPTIVE join estimation: walk the
    universe-sampling fraction ladder until the pair-count CI
    half-width is within ``error_bp`` basis points of the estimate
    (the reference's R8–R10 escalation loop, lifted from single-table
    aggregates to the many-to-many join via coordinated sampling).

    Universe samples are NESTED in the fraction (the hash threshold
    only grows), so each escalation reuses every previously sampled
    key — the same no-wasted-work property the CLT executor exploits.
    The stopping rule is the INTEGER comparison
    margin·10⁴ ≤ est·error_bp (both BIGINT — no float ratio), guarded
    by n_keys_sampled ≥ 2 and est > 0 so an empty early rung cannot
    vacuously stop the walk; the p=1.0 rung has margin 0 and always
    terminates. One row:
    (fraction_used, rungs, est_pairs, ci_lower, ci_upper,
    est_value_cents, n_keys_sampled).

    Each rung is one bounded 1-row collect; at 100 TB the walk costs
    at most ~2× the final rung's work (geometric ladder), the same
    bound as the single-table adaptive executor.
    """
    final = None
    rungs = 0
    for p in ladder:
        rungs += 1
        row = universe_join_pairs(
            events.sparkSession, events, fraction=p,
            left_type=left_type, right_type=right_type,
        ).collect()[0]
        final = (p, row)
        if row["est_pairs"] is None:
            # Empty rung (no sampled key joined) — aggregates are NULL;
            # keep walking. The oracle's est_pairs > 0 filter skips the
            # same rungs.
            continue
        margin = row["est_pairs"] - row["ci_lower"]
        if (
            row["n_keys_sampled"] >= 2
            and row["est_pairs"] > 0
            and margin * 10_000 <= row["est_pairs"] * error_bp
        ):
            break
    p, row = final
    spark = events.sparkSession
    if row["est_pairs"] is None:
        # No joinable pairs even at fraction 1.0 (degenerate inputs):
        # report the exact zero rather than crash. (The DuckDB oracle
        # returns an empty result here — degenerate-input parity is
        # pytest-covered, not driver-certified.)
        return spark.createDataFrame(
            [(float(p), int(rungs), 0, 0, 0, 0, 0)],
            "fraction_used double, rungs long, est_pairs long, ci_lower long, "
            "ci_upper long, est_value_cents long, n_keys_sampled long",
        )
    return spark.createDataFrame(
        [
            (
                float(p),
                int(rungs),
                int(row["est_pairs"]),
                int(row["ci_lower"]),
                int(row["ci_upper"]),
                int(row["est_value_cents"]),
                int(row["n_keys_sampled"]),
            )
        ],
        "fraction_used double, rungs long, est_pairs long, ci_lower long, "
        "ci_upper long, est_value_cents long, n_keys_sampled long",
    )


def adaptive_universe_join_sql(
    error_bp: int = 500,
    ladder: tuple[float, ...] = ADAPTIVE_JOIN_LADDER,
    left_type: str = "click",
    right_type: str = "purchase",
) -> str:
    """DuckDB oracle: every rung's statistics are re-derived and the
    SAME integer stopping rule picks the first qualifying rung — the
    whole escalation, not just the final numbers, is certified."""
    rung_ctes = []
    rung_rows = []
    for i, p in enumerate(ladder):
        sub = universe_join_pairs_sql(
            fraction=p, left_type=left_type, right_type=right_type
        ).strip()
        rung_ctes.append(f"r{i} AS ({sub})")
        rung_rows.append(
            f"SELECT {i + 1} AS rung, CAST({float(p)!r} AS DOUBLE) AS fraction_used, * FROM r{i}"
        )
    ctes = ",\n".join(rung_ctes)
    rows = " UNION ALL ".join(rung_rows)
    # Selection mirrors the Spark walk EXACTLY: the first qualifying
    # rung, and if none qualifies (e.g. only one joined key exists, so
    # n_keys_sampled never reaches 2) the LAST rung — ordered by
    # (miss, rung) for hits and (miss, -rung) for the fallback. A CASE
    # over a NULL condition lands in ELSE, so NULL-aggregate rungs are
    # misses too.
    return f"""
WITH {ctes},
allr AS ({rows}),
flagged AS (
  SELECT *, CASE WHEN n_keys_sampled >= 2 AND est_pairs > 0
                  AND (est_pairs - ci_lower) * 10000 <= est_pairs * {error_bp}
                 THEN 0 ELSE 1 END AS miss
  FROM allr
),
ok AS (
  SELECT * FROM flagged
  ORDER BY miss, CASE WHEN miss = 0 THEN rung ELSE -rung END
  LIMIT 1
)
SELECT fraction_used, CAST(rung AS BIGINT) AS rungs, est_pairs, ci_lower,
       ci_upper, est_value_cents, n_keys_sampled
FROM ok
"""
