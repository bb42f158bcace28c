"""Operator helpers shared across the pipeline operators."""

from __future__ import annotations

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


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input is too small to fan out on its own — a single parquet file
    must not mean a single task for per-row CPU-heavy operators
    (tokenization, hashing, regex). At 100 TB the input already has
    thousands of splits and this is a no-op.

    The probe reads the optimizer's size estimate instead of
    ``df.rdd.getNumPartitions()`` — the RDD conversion forced full
    physical planning plus RDD lineage creation per call (~10× the
    cost of a stats lookup, paid at DataFrame-build time by every
    operator that guards its parallelism). A scan smaller than
    ``target × openCostInBytes`` cannot split into ``target``
    partitions under Spark's file-packing rule, so that is the
    repartition threshold; anything larger is left to the scanner's
    own splitting."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:  # config accepts byte-suffix forms ("4mb"); fall back to default
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
    except ValueError:
        open_cost = 4194304
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # Plans with no real estimate (e.g. RDD-backed LogicalRDD leaves)
    # report spark.sql.defaultSizeInBytes = Long.MaxValue, and sums of
    # such leaves saturate near it — treat anything in that regime as
    # UNKNOWN and fall back to the physical partition-count probe the
    # stats path was meant to replace (rare path; the RDD conversion
    # cost is acceptable there).
    _UNKNOWN = (1 << 62)
    if size >= _UNKNOWN:
        if _num_partitions(df) < target:
            return df.repartition(target)
        return df
    if size < target * open_cost:
        # A small ESTIMATE does not mean few PARTITIONS — a filtered
        # intermediate may already carry >= target partitions from its
        # upstream shuffle; repartitioning it again is a gratuitous
        # shuffle.
        if _num_partitions(df) >= target:
            return df
        return df.repartition(target)
    return df
