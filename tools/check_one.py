"""Run ONE (or a few) named queries() entries through the same
spark-vs-DuckDB comparison check_entry.py applies to the full registry —
the fast inner loop while iterating on a single operator.

Usage: python tools/check_one.py NAME [NAME ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AQE_CHECK_SF_DIR", "/root/testdata/sf0.01")


def main(names: list[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.appName("check-one")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"FAIL {name}: not registered")
            rc = 1
            continue
        sdf = qs[name](spark, SF_DIR)
        cols = sorted(sdf.columns)

        def _key(row):
            return tuple((v is None, str(type(v)), str(v)) for v in row)

        srows = sorted(
            (tuple(row[c] for c in cols) for row in sdf.collect()), key=_key
        )
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        atbl = con.execute(oracles[name]).fetch_arrow_table()
        dcols = atbl.column_names
        if sorted(dcols) != cols:
            print(f"FAIL {name}: columns {sorted(dcols)} != {cols}")
            rc = 1
            continue
        drows = sorted(
            (tuple(r.values()) for r in atbl.select(cols).to_pylist()), key=_key
        )
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            rc = 1
            continue
        bad = None
        for sr, dr in zip(srows, drows):
            for c, sv, dv in zip(cols, sr, dr):
                if isinstance(sv, float) and isinstance(dv, float):
                    if not (sv == dv or (math.isnan(sv) and math.isnan(dv))):
                        bad = f"{c}: {sv!r} != {dv!r} (delta={sv - dv})"
                        break
                elif sv != dv:
                    bad = f"{c}: {sv!r} != {dv!r}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            rc = 1
        else:
            print(f"  {name}: MATCH ({len(srows)} rows)")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
