"""Storage-layout operators: bucketed tables (shuffle-free co-located
joins) and partitioned writes (partition-pruned scans).

The reference's only layout lever is its B+-tree clustering by key
(``core/custom_bplus_db.cpp:198-200`` — SURVEY.md §2.5 "sorts"); the
Spark-native equivalents are bucketing and directory partitioning:

- **Bucketing**: ``bucketBy(k, key).sortBy(key)`` writes each table
  pre-hash-partitioned on the join key. A join of two tables bucketed
  the same way needs NO exchange on either side — at 100 TB this
  removes the two largest shuffles of a fact-fact join (the single
  most expensive plan node there is). The price is paid once at write
  time and amortized over every subsequent join/aggregate on that key.
- **Partitioned write**: ``partitionBy(col)`` creates one directory
  per value; a filter on that column prunes entire directories at
  planning time (the scan's ``PartitionFilters``), so a one-partition
  query reads 1/N of the data no matter how large the table is.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog

BUCKETS = 8


def _bucket_suffix(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem + orders as bucketed, bucket-sorted managed tables
    (once per sf_dir; idempotent). Returns the two table names."""
    cat = Catalog(spark, sf_dir, register_views=False)
    suffix = _bucket_suffix(sf_dir)
    names = (f"lineitem_bkt_{suffix}", f"orders_bkt_{suffix}")
    for src, name, key in (
        ("lineitem", names[0], "l_orderkey"),
        ("orders", names[1], "o_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            # The metastore is per-session but the warehouse directory
            # persists — clear a stale location before re-creating, or
            # saveAsTable fails with LOCATION_ALREADY_EXISTS. (Bucket
            # metadata lives in the metastore, so the files alone can't
            # be re-registered as a bucketed table.)
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            leftover = os.path.join(warehouse, name.lower())
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
            (
                # Pre-shuffling on the bucket key gives each write task
                # rows of exactly one bucket → ONE file per bucket, which
                # lets the scan expose the sortBy order and the join skip
                # its per-partition Sort entirely.
                cat.table(src)
                .repartition(BUCKETS, F.col(key))
                .write.bucketBy(BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
    return names


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem revenue per order priority over the bucketed
    tables: both sides arrive pre-partitioned on the join key, so the
    plan has no Exchange below the join (asserted in
    ``test_bucketed_join_has_no_shuffle``) — only the small post-join
    aggregation shuffles."""
    li, od = ensure_bucketed_tables(spark, sf_dir)
    # Our writes guarantee ONE file per bucket (repartition above), so
    # the bucket-sort order is usable; since 3.0 Spark only propagates
    # it behind this flag (SPARK-28169 — multi-file buckets would need
    # a merge-sort read). With it, the join needs no Sort either.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    l = spark.table(li)
    o = spark.table(od)
    # hint("merge"): fact-fact joins are sort-merge at 100 TB; the hint
    # pins that shape at fixture scale too (vs AQE broadcasting the
    # small side) so the no-exchange property is the one under test.
    return (
        l.hint("merge")
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("o_orderpriority")
    )


def bucketed_join_revenue_sql() -> str:
    return """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet write: repartitionByRange + in-partition
    sort on ``cluster_col`` before writing, with small row groups.

    Clustering makes every row group's min/max stats TIGHT on the
    cluster column, so a pushed range predicate skips whole row groups
    at read time (parquet filter pushdown) — the third data-skipping
    lever after partition pruning and bucketing, and the one that works
    for high-cardinality numeric columns where directory partitioning
    would explode. On an unclustered write the same stats span the full
    value range and nothing is skipped (asserted via scan metrics in
    ``test_clustered_write_skips_row_groups``)."""
    (
        df.repartitionByRange(8, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        # Small row groups so even fixture-sized files have several —
        # at scale the default 128 MiB groups serve the same role.
        .write.option("parquet.block.size", 64 * 1024)
        .mode(mode)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet write (one dir per value)."""
    df.write.partitionBy(partition_col).mode(mode).parquet(path)


def read_pruned(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Read back one partition; the filter binds to the directory
    structure so all other partitions are skipped at planning time."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)
