"""Sources & sinks.

The reference's storage layer (SQLite scans, a binary Record file, a
raw page reader — SURVEY.md §2.1 S1-S9) collapses to Spark's built-in
connectors; what remains useful is a thin uniform facade plus the
reference's demo-data generators (``src/aqe_frontend/utils.py:15-49``)
re-expressed as seeded distributed ``spark.range`` pipelines (no driver
materialization — generating 10M or 10B rows is the same code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READERS = ("parquet", "csv", "json", "orc")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READERS}")
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt == "csv":
        # Symmetric with read_table's header=true default — a headerless
        # CSV round-trip silently renames every column to _c0, _c1, …
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        # Partitioned layout → partition pruning on read; the 100 TB
        # default for time- or key-organized outputs.
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def create_sales_df(spark: SparkSession, n: int = 100_000, seed: int = 42) -> DataFrame:
    """The reference's benchmark table (``utils.py:30-49``): id 1..n,
    amount ~ U(1, 1000), category in {A,B,C,D} — generated distributed
    and deterministically."""
    return (
        spark.range(1, n + 1)
        .withColumnRenamed("id", "id")
        .withColumn("amount", F.round(F.rand(seed) * 999.0 + 1.0, 2))
        .withColumn(
            "category",
            F.element_at(
                F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("D")),
                (F.pmod(F.col("id") * 2654435761 % 2**31, F.lit(4)) + 1).cast("int"),
            ),
        )
    )


def create_mytable_df(spark: SparkSession) -> DataFrame:
    """``create_example_db`` (``utils.py:15-28``): 10 rows, value = id·1.5
    — closed-form answers for estimator unit tests (SUM=82.5, AVG=8.25)."""
    return spark.range(1, 11).withColumn("value", F.col("id") * 1.5)


def create_records_df(spark: SparkSession, n: int = 100_000, seed: int = 42) -> DataFrame:
    """The custom-backend ``Record`` schema
    (``core/custom_bplus_db.hpp:17-27``): id, amount, region, product_id,
    timestamp."""
    return (
        spark.range(1, n + 1)
        .withColumn("amount", F.round(F.rand(seed) * 999.0 + 1.0, 2))
        .withColumn("region", (F.pmod(F.col("id"), F.lit(10))).cast("int"))
        .withColumn("product_id", (F.pmod(F.col("id") * 7, F.lit(1000))).cast("int"))
        .withColumn("timestamp", (F.lit(1_600_000_000) + F.col("id") % 86_400).cast("long"))
    )
