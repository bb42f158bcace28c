"""Mimic the driver's correctness gate: run every queries() entry at
sf0.01 on a VANILLA SparkSession and compare against oracle_sql() via
DuckDB (row count + sorted-column value comparison). Exit non-zero on
any mismatch."""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AQE_CHECK_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.appName("check-entry")
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

    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, schema={edf.columns}")
    assert n >= 0

    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            cols = sorted(sdf.columns)

            def _key(row):
                return tuple((v is None, str(type(v)), str(v)) for v in row)

            srows = sorted(
                (tuple(row[c] for c in cols) for row in sdf.collect()), key=_key
            )
            if name not in oracles:
                print(f"  {name}: rows-only check, {len(srows)} rows OK")
                continue
            res = con.execute(oracles[name])
            # Fetch via Arrow: DuckDB's Python fetchall() coerces HUGEINT
            # (sum over any integer type) to int, hiding a type mismatch
            # the driver's hasher DOES see (its pandas fetch turns
            # HUGEINT into float64 — 1.0 vs 1). Compare type classes.
            atbl = res.fetch_arrow_table()
            dcols = atbl.column_names
            idx = [dcols.index(c) for c in cols] if sorted(dcols) == cols else None
            if idx is None:
                failures.append((name, f"columns {sorted(dcols)} != {cols}"))
                continue
            stypes = dict(sdf.dtypes)
            tbad = None
            for c in cols:
                dt = str(atbl.schema.field(c).type)
                st = stypes[c]
                d_int = dt.startswith(("int", "uint"))
                d_float = dt in ("float", "double", "halffloat") or dt.startswith("decimal")
                s_int = st in ("tinyint", "smallint", "int", "bigint")
                s_float = st in ("float", "double")
                if "decimal" in dt and s_int:
                    tbad = f"{c}: oracle {dt} (HUGEINT?) vs spark {st} — CAST the oracle"
                    break
                if (d_int and s_float) or (d_float and s_int):
                    tbad = f"{c}: oracle {dt} vs spark {st}"
                    break
            if tbad:
                failures.append((name, f"dtype mismatch {tbad}"))
                continue
            draw = [tuple(r.values()) for r in atbl.select(cols).to_pylist()]
            drows = sorted(draw, key=_key)
            if len(srows) != len(drows):
                failures.append((name, f"rowcount spark={len(srows)} duck={len(drows)}"))
                continue
            bad = None
            for sr, dr in zip(srows, drows):
                for c, sv, dv in zip(cols, sr, dr):
                    if isinstance(sv, float) and isinstance(dv, float):
                        if not (
                            sv == dv
                            or (math.isnan(sv) and math.isnan(dv))
                        ):
                            bad = f"{c}: {sv!r} != {dv!r} (delta={sv - dv})"
                            break
                    elif sv != dv:
                        bad = f"{c}: {sv!r} != {dv!r}"
                        break
                if bad:
                    break
            if bad:
                failures.append((name, bad))
            else:
                print(f"  {name}: MATCH ({len(srows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))

    print()
    if failures:
        for name, why in failures:
            print(f"FAIL {name}: {why}")
        return 1
    print(f"all {len(qs)} queries pass ({len(oracles)} oracle-matched)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
