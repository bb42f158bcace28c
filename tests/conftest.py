import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from approximatequeryengine_spark import AQEngine, get_spark  # noqa: E402
from approximatequeryengine_spark.catalog import TABLES  # noqa: E402

SF_DIR = os.environ.get("AQE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("AQE_TEST_SF_DIR_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aqe-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    return AQEngine(spark, SF_DIR)


@pytest.fixture(scope="session")
def engine_med(spark):
    return AQEngine(spark, SF_DIR_MED)


def _duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


@pytest.fixture(scope="session")
def duck():
    return _duck(SF_DIR)


@pytest.fixture(scope="session")
def duck_med():
    return _duck(SF_DIR_MED)


def assert_df_matches_sql(sdf, con, sql, rel=1e-9, abs_tol=1e-6):
    """Order-insensitive comparison of a Spark DataFrame against a DuckDB
    query — the same contract as the driver's correctness gate (columns
    sorted by name, rows sorted, values compared)."""
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(row[c] for c in cols) for row in sdf.collect()
    )
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == cols, f"columns differ: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = sorted(tuple(r[i] for i in idx) for r in res.fetchall())
    assert len(spark_rows) == len(duck_rows), (
        f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    for sr, dr in zip(spark_rows, duck_rows):
        for c, sv, dv in zip(cols, sr, dr):
            if isinstance(sv, float) and isinstance(dv, float):
                assert sv == pytest.approx(dv, rel=rel, abs=abs_tol), (
                    f"column {c}: spark={sv} duck={dv}"
                )
            else:
                assert sv == dv, f"column {c}: spark={sv!r} duck={dv!r}"
