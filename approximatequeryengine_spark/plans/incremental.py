"""Incremental maintenance of grouped aggregate state — the
materialized-view pattern every warehouse needs at 100 TB: never
recompute an aggregate over the full history when a batch arrives;
keep a per-group MERGEABLE state table and fold each delta in with
one O(batch + |groups|) job.

State columns are chosen to be closed under merge (the classic
algebraic-aggregate decomposition: COUNT/SUM add, MIN/MAX combine) and
*integer-valued* (value on a cents grid), so merging is exact — no
float drift accumulates across thousands of batches, and
``merge(state(base), delta) == state(base ∪ delta)`` holds
bit-for-bit, which is both the correctness invariant the tests pin and
what makes the DuckDB oracle trivial (a full-history aggregate).

Higher moments (variance) would need SUM(x²), which on a cents grid
overflows BIGINT around 10¹² rows × $1 000 values — at that scale
promote to DECIMAL(38,0); deliberately left out of the default state.

Beyond the reference (`/root/reference` recomputes over its B+-tree on
every query; it has no materialization layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import finite_col, finite_sql


def agg_state(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group mergeable state: (group, n, sum_cents, min_cents,
    max_cents). One map-side-combined groupBy."""
    cents = F.floor(finite_col(F.col(value_col)) * F.lit(100.0) + F.lit(0.5)).cast("long")
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )


def agg_state_write(
    spark: SparkSession, df: DataFrame, group_col: str, value_col: str, path: str
) -> None:
    """Materialize the state table. Partitioned by group is pointless at
    |groups| ≪ |rows|; a plain parquet of |groups| rows suffices — the
    state table is always the broadcast side of any downstream use."""
    agg_state(df, group_col, value_col).write.mode("overwrite").parquet(path)


def agg_state_merge(
    spark: SparkSession, path: str, delta: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Fold a delta batch into the persisted state WITHOUT touching the
    base data: aggregate the delta (O(batch)), union with the stored
    |groups|-row state, and merge per group. New groups appear
    automatically; existing groups combine exactly (integer sums)."""
    stored = spark.read.parquet(path)
    delta_state = agg_state(delta, group_col, value_col)
    return (
        stored.unionByName(delta_state)
        .groupBy("grp")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def agg_state_readout(state: DataFrame) -> DataFrame:
    """User-facing view of a state frame: dollars at 2dp (exact — the
    cents grid divides evenly), plus row count and extrema."""
    return state.select(
        F.col("grp"),
        F.col("n"),
        F.round(F.col("sum_cents") / F.lit(100.0), 2).alias("sum_value"),
        F.round(F.col("min_cents") / F.lit(100.0), 2).alias("min_value"),
        F.round(F.col("max_cents") / F.lit(100.0), 2).alias("max_value"),
    )


def incremental_readout_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle: because merge(state(base), delta) must equal
    state(base ∪ delta), the oracle is simply the full-history
    aggregate — any drift in the incremental path breaks the match."""
    cents = f"CAST(floor({finite_sql(value_col)} * 100.0 + 0.5) AS BIGINT)"
    return (
        f"SELECT {group_col} AS grp, CAST(count(*) AS BIGINT) AS n, "
        f"round(CAST(sum({cents}) AS BIGINT) / 100.0, 2) AS sum_value, "
        f"round(min({cents}) / 100.0, 2) AS min_value, "
        f"round(max({cents}) / 100.0, 2) AS max_value "
        f"FROM {table} GROUP BY {group_col}"
    )
