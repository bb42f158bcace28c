"""Operator helpers shared across the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input has fewer partitions — a single parquet file must not mean a
    single task for per-row CPU-heavy operators (tokenization, hashing,
    regex). At 100 TB the input already has thousands of splits and
    this is a no-op; the check costs one plan analysis, no job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
