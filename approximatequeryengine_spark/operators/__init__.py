"""Operator helpers shared across the pipeline operators."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _num_partitions(df: DataFrame) -> int:
    """Physical partition count WITHOUT building a Python-side RDD:
    ``df.rdd`` wraps the JVM RDD in a Python lineage (serializer setup,
    javaToPython conversion) on every call — the JVM probe below reads
    the same count from the executed plan directly. Falls back to the
    Python probe on any JVM-API drift."""
    try:
        return int(
            df._jdf.queryExecution().executedPlan().execute().getNumPartitions()
        )
    except Exception:
        return df.rdd.getNumPartitions()


# Bytes of (estimated) input worth one task of per-row operator work.
# Sizing rationale: the operators that guard their parallelism run
# ~0.5-5 ms of CPU per KB (tokenization, hashing, regex), so a 256 KB
# slice is ~0.1-1 s of task compute — comfortably above the per-task
# scheduling + Python-boundary overhead (~10-50 ms) that dominated when
# every small input was fanned to the full core count regardless of
# size (measured: a 5000-doc corpus kernel ran FASTER on 4 tasks than
# on 32). Overridable per deployment; ``weight`` scales it per
# operator (heavier per-byte kernels pass weight > 1).
_TASK_QUANTUM_BYTES = int(os.environ.get("AQE_TASK_QUANTUM_BYTES", str(256 * 1024)))


def ensure_parallelism(df: DataFrame, weight: float = 1.0) -> DataFrame:
    """Repartition a too-few-partitions input so per-row CPU-heavy
    operators (tokenization, hashing, regex) are not single-task just
    because the input is a single parquet file. The fan-out is
    SIZE-PROPORTIONAL — ``ceil(size·weight / quantum)`` tasks, capped
    at the cluster's default parallelism — not a constant: fanning a
    tiny input to every core buys nothing and pays per-task scheduling
    and Python-worker round trips instead (guide §2: partitioning must
    be scale-adaptive, not tuned to either local mode or the cluster).
    At 100 TB the input already has thousands of splits and this is a
    no-op.

    The probe reads the optimizer's size estimate instead of
    ``df.rdd.getNumPartitions()`` — the RDD conversion forced full
    physical planning plus RDD lineage creation per call (~10× the
    cost of a stats lookup, paid at DataFrame-build time by every
    operator that guards its parallelism)."""
    target = parallelism_target(df, weight=weight)
    if target is None:
        cap = df.sparkSession.sparkContext.defaultParallelism
        if _num_partitions(df) < cap:
            return df.repartition(cap)
        return df
    if target <= 1:
        return df
    # A small ESTIMATE does not mean few PARTITIONS — a filtered
    # intermediate may already carry >= target partitions from its
    # upstream shuffle; repartitioning it again is a gratuitous
    # shuffle.
    if _num_partitions(df) >= target:
        return df
    return df.repartition(target)


def parallelism_target(df: DataFrame, weight: float = 1.0) -> int | None:
    """Size-proportional task count for a small input (see
    ``ensure_parallelism``): ``ceil(size·weight / quantum)`` clamped to
    [1, defaultParallelism]; 0 when the input is big enough that the
    scanner's own splitting should rule; None when the size estimate is
    unusable (Long.MaxValue regime) and the caller should fall back to
    a physical-partition probe."""
    spark = df.sparkSession
    cap = spark.sparkContext.defaultParallelism
    try:  # config accepts byte-suffix forms ("4mb"); fall back to default
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
    except ValueError:
        open_cost = 4194304
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # Plans with no real estimate (e.g. RDD-backed LogicalRDD leaves)
    # report spark.sql.defaultSizeInBytes = Long.MaxValue, and sums of
    # such leaves saturate near it — treat anything in that regime as
    # UNKNOWN.
    _UNKNOWN = (1 << 62)
    if size >= _UNKNOWN:
        return None
    if size >= cap * open_cost:
        # Big enough that the scanner's own file splitting provides the
        # parallelism; leave it alone.
        return 0
    return max(1, min(cap, -(-int(size * weight) // _TASK_QUANTUM_BYTES)))
