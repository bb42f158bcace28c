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


# Timestamp columns in the fixture parquet. The driver has shipped two
# encodings across rounds — TIMESTAMP(NANOS) (reads as epoch-ns bigint
# under the legacy flag) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (reads as TIMESTAMP_NTZ) — so normalization handles both, landing on
# session-zone TimestampType (sessions run UTC, so NTZ → TZ preserves
# the wall clock). Streaming watermarks require TimestampType, and
# DuckDB's TIMESTAMP comparisons match it value-for-value.
TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

# Backwards-compat alias (pre-round-2 name).
NANO_TS_COLUMNS = TS_COLUMNS


def normalize_ts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize fixture timestamp columns to TimestampType regardless
    of the parquet encoding the driver generated them with."""
    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            # Epoch-ns longs. Integer division: epoch-ns exceeds
            # double's exact range (2^53), so `/ 1000` via double can
            # be off by ±1 µs; `div` truncates exactly, matching how
            # DuckDB narrows TIMESTAMP(NANOS) to µs.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


class Catalog:
    """Registers parquet tables from ``sf_dir`` and hands out DataFrames.

    Beyond the fixture tables, arbitrary external sources can be
    registered (reference S1 parity — ``core/db.cpp:33-46`` opens any
    SQLite file): ``register_path`` mounts any parquet/csv/json/orc
    path, ``register_jdbc`` any JDBC-reachable table. Registered
    sources join the same temp-view namespace and (when given a
    ``key``) work with every sampling design and the APPROX dialect."""

    # Which Catalog instance's views are currently registered on each
    # session: {(applicationId, id(spark)): (id(catalog), sf_dir)}.
    # Lets ``ensure_views`` skip the ~10 createOrReplaceTempView py4j
    # round trips (measured ~0.1 s) that every per-query defensive
    # refresh was paying even when the views were already ours.
    _views_owner: dict[tuple[str, int], tuple[int, str]] = {}

    def __init__(self, spark: SparkSession, sf_dir: str, register_views: bool = True):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        self._extra_keys: dict[str, str] = {}
        if register_views:
            self.refresh_views()

    def _session_key(self) -> tuple[str, int]:
        return (self.spark.sparkContext.applicationId, id(self.spark))

    def refresh_views(self) -> None:
        """(Re-)register this catalog's tables as session temp views.

        Temp-view names are session-global, so two Catalogs over
        different sf_dirs on one SparkSession clobber each other; any
        holder about to run view-based SQL must refresh first (a cheap
        metadata-only operation)."""
        for name in self.table_names():
            self.table(name).createOrReplaceTempView(name)
        Catalog._views_owner[self._session_key()] = (id(self), self.sf_dir)

    def ensure_views(self) -> None:
        """Refresh views only when another Catalog registered since.

        The ownership record tracks refreshes through this class; code
        that re-points a fixture view DIRECTLY via
        ``createOrReplaceTempView`` must call ``refresh_views()`` (not
        this) to re-assert — which is what such call sites already do."""
        if Catalog._views_owner.get(self._session_key()) != (id(self), self.sf_dir):
            self.refresh_views()

    def table_names(self) -> list[str]:
        names = []
        for name in TABLES:
            if os.path.exists(os.path.join(self.sf_dir, f"{name}.parquet")):
                names.append(name)
        names.extend(n for n in self._cache if n not in names)
        return names

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                raise KeyError(f"table {name!r} not found under {self.sf_dir}")
            df = self.spark.read.parquet(path)
            df = normalize_ts(df, TS_COLUMNS.get(name, []))
            self._cache[name] = df
        return self._cache[name]

    def register_df(self, name: str, df: DataFrame, key: str | None = None) -> DataFrame:
        """Register an arbitrary DataFrame as a catalog table (+view)."""
        self._cache[name] = df
        if key:
            self._extra_keys[name] = key
        df.createOrReplaceTempView(name)
        return df

    def register_path(
        self,
        name: str,
        path: str,
        fmt: str = "parquet",
        key: str | None = None,
        **options: str,
    ) -> DataFrame:
        """Mount any readable path (parquet/csv/json/orc/...) as a
        table. ``options`` pass through to the reader (e.g.
        ``header='true', inferSchema='true'`` for csv)."""
        df = self.spark.read.format(fmt).options(**options).load(path)
        return self.register_df(name, df, key=key)

    def register_jdbc(
        self,
        name: str,
        url: str,
        table: str,
        key: str | None = None,
        **properties: str,
    ) -> DataFrame:
        """Mount a JDBC-reachable table (requires the driver jar on the
        Spark classpath). The Spark-native analogue of the reference
        opening an external SQLite database file."""
        df = self.spark.read.jdbc(url, table, properties=dict(properties))
        return self.register_df(name, df, key=key)

    def unique_key(self, name: str) -> str:
        """SQL expression uniquely identifying a row of ``name`` (for
        deterministic sampling)."""
        if name in self._extra_keys:
            return self._extra_keys[name]
        if name not in TABLES:
            raise KeyError(f"no unique key registered for table {name!r}")
        return TABLES[name]
