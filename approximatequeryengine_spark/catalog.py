"""Table registry over a directory of parquet files.

The reference hardcodes one table per database file with a compiled-in
schema (SURVEY.md §1.3, ``core/direct_reader.cpp:77-86``); here the
schema is read from Parquet (self-describing) and any number of tables
can be registered as temp views for ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-provided fixture tables (TESTDATA.md). `unique_key` is an
# integer expression that uniquely identifies a row — the deterministic
# samplers hash it (the Spark-native replacement for the reference's
# `rowid % k` predicates, `executor.cpp:21-26`).
TABLES: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    # l_linenumber is 1..7 in TPC-H-style data; *8 keeps the composite unique.
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


# Columns stored as TIMESTAMP(NANOS) in the fixture parquet; with
# `spark.sql.legacy.parquet.nanosAsLong` they arrive as epoch-ns longs and
# are cast back to proper TimestampType here (µs precision — verified
# lossless on the fixtures).
NANO_TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


class Catalog:
    """Registers parquet tables from ``sf_dir`` and hands out DataFrames."""

    def __init__(self, spark: SparkSession, sf_dir: str, register_views: bool = True):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        if register_views:
            self.refresh_views()

    def refresh_views(self) -> None:
        """(Re-)register this catalog's tables as session temp views.

        Temp-view names are session-global, so two Catalogs over
        different sf_dirs on one SparkSession clobber each other; any
        holder about to run view-based SQL must refresh first (a cheap
        metadata-only operation)."""
        for name in self.table_names():
            self.table(name).createOrReplaceTempView(name)

    def table_names(self) -> list[str]:
        names = []
        for name in TABLES:
            if os.path.exists(os.path.join(self.sf_dir, f"{name}.parquet")):
                names.append(name)
        return names

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                raise KeyError(f"table {name!r} not found under {self.sf_dir}")
            df = self.spark.read.parquet(path)
            for col in NANO_TS_COLUMNS.get(name, []):
                if col in df.columns and dict(df.dtypes)[col] == "bigint":
                    # Integer division: epoch-ns exceeds double's exact
                    # integer range (2^53), so `/ 1000` via double can be
                    # off by ±1 µs; `div` truncates exactly, matching how
                    # DuckDB narrows TIMESTAMP(NANOS) to µs.
                    df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
            self._cache[name] = df
        return self._cache[name]

    def unique_key(self, name: str) -> str:
        """SQL expression uniquely identifying a row of ``name`` (for
        deterministic sampling)."""
        if name not in TABLES:
            raise KeyError(f"no unique key registered for table {name!r}")
        return TABLES[name]
