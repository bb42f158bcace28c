"""Custom stateful streaming operator: continuously-refining estimates.

The reference's continuous-validation thread re-samples in a loop and
keeps a sliding window of estimates until told to stop
(``core/scheduler.cpp:291-367``); its CLI classifies the result STABLE /
DRIFTING / INSUFFICIENT_DATA (V1-V5). The Structured Streaming analogue
of "the estimate keeps refining as more data is seen" is a stateful
per-key operator: ``applyInPandasWithState`` holds cumulative moments
``(n, Σx, Σx²)`` per event type across micro-batches and emits, on every
batch, the current running mean with a 95% CI and a drift status
(|Δmean|/|mean| vs. the V3 threshold, insufficient-data below the V5
minimum).

Scale notes: state is three doubles per key — bounded regardless of
stream length; each micro-batch shuffles once on the key; the pandas
function sees Arrow batches, never per-row Python. Against Kafka the
same code runs unmodified; the test/driver path feeds a directory of
parquet part-files with ``maxFilesPerTrigger=1`` + ``availableNow`` so
multiple micro-batches replay deterministically.
"""

from __future__ import annotations

import math
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from approximatequeryengine_spark.plans.estimators import Z_95

OUTPUT_SCHEMA = (
    "event_type STRING, n_seen BIGINT, running_avg DOUBLE, "
    "ci_lower DOUBLE, ci_upper DOUBLE, status STRING"
)
STATE_SCHEMA = "n BIGINT, s1 DOUBLE, s2 DOUBLE"

DRIFT_THRESHOLD = 0.02  # V3: |fast − slow|/|fast| ≤ e
MIN_SAMPLES = 50  # V5 floor


def _r(v: float, decimals: int) -> float:
    """Engine-portable half-up rounding, spelled as the identical
    ``floor(v·10^d + 0.5)/10^d`` the DuckDB oracle uses (Python's
    ``round`` is banker's rounding, which SQL ``round`` is not)."""
    s = 10.0 ** decimals
    return math.floor(v * s + 0.5) / s


def _refine(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n0, s10, s20 = state.get if state.exists else (0, 0.0, 0.0)
    bn, bs1, bs2 = 0, 0.0, 0.0
    for pdf in pdfs:
        v = pdf["value"].astype("float64")
        # finite gate: one NaN/Inf measurement would poison the running
        # moments permanently (state is cumulative — it never recovers)
        v = v[np.isfinite(v)]
        bn += int(len(v))
        bs1 += float(v.sum())
        bs2 += float((v * v).sum())
    n, s1, s2 = n0 + bn, s10 + bs1, s20 + bs2
    state.update((n, s1, s2))
    if n == 0:
        return
    mean = s1 / n
    var = max((s2 - s1 * s1 / n) / (n - 1), 0.0) if n > 1 else 0.0
    margin = Z_95 * math.sqrt(var / n)
    if n < MIN_SAMPLES:
        status = "INSUFFICIENT_DATA"
    elif n0 == 0:
        status = "STABLE"
    else:
        # Drift compares 9-decimal-rounded means: both sides carry
        # fold-order float noise (pandas pairwise sum vs SQL sequential
        # sum), and an emission sitting exactly at the 2% threshold
        # must classify identically in the batch-replay oracle.
        prev = _r(s10 / n0, 9)
        mean_r = _r(mean, 9)
        drift = abs(mean_r - prev) / abs(mean_r) if mean_r else float("inf")
        status = "STABLE" if drift <= DRIFT_THRESHOLD else "DRIFTING"
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            # 8-decimal outputs: the grid absorbs ~1e-13 cross-engine
            # summation noise while staying far inside the tests'
            # rel=1e-9 tolerance on O(100) means.
            "running_avg": [_r(mean, 8)],
            "ci_lower": [_r(mean - margin, 8)],
            "ci_upper": [_r(mean + margin, 8)],
            "status": [status],
        }
    )


def running_estimates_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    ts_is_long: bool = False,
) -> DataFrame:
    """Run the stateful refinement over a directory of parquet files,
    one file per micro-batch; returns every per-batch emission."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    if ts_is_long and "ts" in schema.fieldNames():
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    refined = (
        stream.select("event_type", F.col("value").cast("double").alias("value"))
        .groupBy("event_type")
        .applyInPandasWithState(
            _refine,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"stateful_out_{uuid.uuid4().hex[:8]}"
    # Bounded-key state layout (see windowed.STREAM_STATE_PARTITIONS):
    # the state is keyed on event_type — a handful of values — and
    # per-key rows must reach one task regardless, so parallelism is
    # key-bound by the algorithm; the conf default ran one state-store
    # task per core per micro-batch, nearly all of them empty.
    from approximatequeryengine_spark.streaming.windowed import (
        STREAM_STATE_PARTITIONS,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(min(int(prev), STREAM_STATE_PARTITIONS)),
    )
    try:
        q = (
            refined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)


def split_events_for_replay(
    events: DataFrame, directory: str, n_batches: int = 4
) -> None:
    """Write the events table as ``n_batches`` parquet files, each a
    contiguous time slice, so the file stream replays them as successive
    micro-batches (FileStreamSource processes oldest-mtime first; the
    sequential writes guarantee strictly increasing mtimes).

    Batch assignment is FULLY DETERMINISTIC — ``floor((rn−1)·B/N)`` over
    ``row_number() ORDER BY ts, event_id`` — replacing the earlier
    ``repartitionByRange`` whose reservoir-sampled boundaries no SQL
    oracle could replay. The DuckDB oracle for
    ``streaming_running_estimate`` re-derives exactly this split. This
    is a test/replay harness (the production path is a real stream
    source), so the single-partition window sort is deliberate
    simplicity, not the scale path. The batch files are written by
    SPARK (per-batch filter + coalesce(1) write, then a metadata-only
    rename) — no data-plane table ever rides the driver as pandas."""
    import glob
    import shutil

    from pyspark.sql.window import Window

    os.makedirs(directory, exist_ok=True)
    # a TIME-ordered replay excludes rows without a time: the engines
    # order NULL ts on opposite ends (Spark NULLS FIRST, DuckDB NULLS
    # LAST), so batch membership would silently diverge from the oracle
    events = events.filter(F.col("ts").isNotNull())
    n = events.count()
    rn = F.row_number().over(Window.orderBy("ts", "event_id"))
    tagged = events.withColumn(
        "__b",
        F.floor((rn - F.lit(1)) * F.lit(n_batches) / F.lit(n)).cast("int"),
    )
    # ONE partitioned write instead of persist + n_batches filtered
    # coalesce(1) writes (round 10): the row_number window has already
    # gathered everything into a single sorted partition, so the
    # dynamic-partition writer emits exactly one file per __b value in
    # the SAME deterministic (ts, event_id) order the per-batch
    # coalesce(1) writes produced — n_batches+1 jobs become 2.
    stage = os.path.join(directory, "__stage")
    tagged.write.partitionBy("__b").mode("overwrite").parquet(stage)
    base_mtime = None
    for i in range(n_batches):
        parts = glob.glob(os.path.join(stage, f"__b={i}", "part-*.parquet"))
        path = os.path.join(directory, f"batch_{i:03d}.parquet")
        if parts:
            shutil.move(parts[0], path)
        else:
            # Empty micro-batch (n < n_batches): the replay still needs
            # a file at this slot — write a schema-only parquet.
            import pyarrow.parquet as pq

            pq.write_table(tagged.drop("__b").limit(0).toArrow(), path)
        # FileStreamSource orders by mtime with UNSPECIFIED tie
        # order at its (ms) resolution — sub-ms consecutive writes
        # could replay batches out of order. Pin strictly increasing
        # mtimes (1 s apart) explicitly instead of trusting write
        # latency.
        if base_mtime is None:
            base_mtime = os.stat(path).st_mtime
        os.utime(path, (base_mtime + i, base_mtime + i))
    shutil.rmtree(stage)
