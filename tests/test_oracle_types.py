"""Regression guard for the round-1 hash-mismatch class: DuckDB types
``sum(<any integer>)`` as HUGEINT (int128), which its Arrow/pandas fetch
surfaces as float64 while Spark's side is LongType — the driver's
value hash distinguishes ``1.0`` from ``1`` even when the values are
equal. Sweep EVERY oracle query and fail on any decimal/int128 output
column, so an uncast integer ``sum()`` can never ship again."""

import os

import duckdb

import __spark_entry__ as entrymod
from approximatequeryengine_spark.catalog import TABLES

SF_DIR = os.environ.get("AQE_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_no_oracle_emits_hugeint_or_decimal():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        tbl = con.execute(sql).fetch_arrow_table()
        for field in tbl.schema:
            ts = str(field.type)
            if "decimal" in ts or "int128" in ts:
                offenders.append((name, field.name, ts))
    # approx_median_ci's literal-q decimal(2,1) is value-exact in
    # float64 and hash-matched in round 1 — the only tolerated case.
    offenders = [o for o in offenders if o[:2] != ("approx_median_ci", "q")]
    assert not offenders, f"CAST these oracle columns: {offenders}"
