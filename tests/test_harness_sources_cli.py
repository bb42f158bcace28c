"""Harness protocol, source generators, and CLI routing."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark import harness
from approximatequeryengine_spark.cli import build_parser, format_result, print_methods
from approximatequeryengine_spark.plans.estimators import AggSpec
from approximatequeryengine_spark.result import ApproximationStatus, ApproxResult
from approximatequeryengine_spark.sources.registry import (
    create_mytable_df,
    create_records_df,
    create_sales_df,
    read_table,
    write_table,
)

KEY = "l_orderkey * 8 + l_linenumber"


def test_mytable_closed_form(spark):
    # FIXTURES.md §1.2: SUM=82.5, AVG=8.25, COUNT=10
    row = create_mytable_df(spark).agg(
        F.sum("value").alias("s"), F.avg("value").alias("a"), F.count("*").alias("c")
    ).collect()[0]
    assert row["s"] == 82.5 and row["a"] == 8.25 and row["c"] == 10


def test_sales_schema_and_determinism(spark):
    df = create_sales_df(spark, n=1000)
    assert df.columns == ["id", "amount", "category"]
    stats = df.agg(
        F.min("amount"), F.max("amount"), F.countDistinct("category")
    ).collect()[0]
    assert 1.0 <= stats[0] and stats[1] <= 1000.0 and stats[2] == 4
    assert df.count() == 1000
    # same seed → same sum
    s1 = create_sales_df(spark, 1000).agg(F.sum("amount")).collect()[0][0]
    s2 = create_sales_df(spark, 1000).agg(F.sum("amount")).collect()[0][0]
    assert s1 == s2


def test_records_schema(spark):
    df = create_records_df(spark, n=100)
    assert df.columns == ["id", "amount", "region", "product_id", "timestamp"]
    assert df.count() == 100


def test_write_read_roundtrip(spark, tmp_path):
    df = create_mytable_df(spark)
    path = str(tmp_path / "t")
    write_table(df, path, fmt="parquet")
    back = read_table(spark, path)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["value"] for r in df.collect()
    )
    with pytest.raises(ValueError):
        read_table(spark, path, fmt="avro")


def test_record_file_roundtrip(spark, tmp_path):
    # S5 parity: packed-binary record file, distributed write + read.
    from approximatequeryengine_spark.sources.recordfile import (
        read_record_files,
        write_record_files,
    )

    df = create_records_df(spark, n=5000).repartition(4)
    directory = str(tmp_path / "records")
    manifest = write_record_files(df, directory)
    mrows = manifest.collect()
    assert sum(r["record_count"] for r in mrows) == 5000
    assert len(mrows) == 4  # one part file per partition

    back = read_record_files(spark, directory)
    assert back.schema.fieldNames() == ["id", "amount", "region", "product_id", "timestamp"]
    orig = df.agg(F.sum("amount"), F.sum("id"), F.count("*")).collect()[0]
    rt = back.agg(F.sum("amount"), F.sum("id"), F.count("*")).collect()[0]
    assert rt[2] == 5000 and rt[1] == orig[1]
    assert rt[0] == pytest.approx(orig[0], rel=1e-12)


def test_record_file_rejects_garbage(tmp_path):
    from approximatequeryengine_spark.sources.recordfile import decode_records

    with pytest.raises(ValueError, match="not an AQE record file"):
        decode_records(b"NOPE" + b"\x00" * 32)


def test_sample_rate_sweep(engine):
    df = engine.catalog.table("lineitem")
    rows = harness.sample_rate_sweep(
        df, AggSpec("sum", "l_extendedprice"), KEY, rates=[0, 10, 50], runs=1
    )
    assert [r["sample_rate_pct"] for r in rows] == [0, 10, 50]
    assert rows[0]["relative_error_pct"] == 0.0  # rate 0 = exact
    assert rows[1]["relative_error_pct"] < 15.0
    assert rows[2]["relative_error_pct"] < rows[1]["relative_error_pct"] + 10


def test_error_threshold_sweep(engine_med):
    df = engine_med.catalog.table("lineitem")
    rows = harness.error_threshold_sweep(
        df, AggSpec("avg", "l_extendedprice"), KEY, thresholds=[2.0, 5.0]
    )
    for r in rows:
        assert r["within_budget"], r
    # tighter budget needs at least as large a final fraction
    assert rows[0]["final_fraction"] >= rows[1]["final_fraction"]


def test_benchmark_query(engine):
    res = harness.benchmark_query(
        engine.catalog.table("lineitem"), AggSpec("sum", "l_extendedprice"), KEY
    )
    assert res["error_pct"] < 20
    assert res["samples_used"] > 0


def test_to_csv(tmp_path):
    p = str(tmp_path / "out.csv")
    harness.to_csv([{"a": 1, "b": 2}, {"a": 3, "b": 4}], p)
    text = open(p).read().strip().splitlines()
    assert text[0] == "a,b" and len(text) == 3


def test_cli_parser_routing():
    p = build_parser()
    args = p.parse_args(["SELECT SUM(x) FROM t", "-s", "10", "--ci"])
    assert args.sample == 10.0 and args.ci and args.error is None
    args = p.parse_args(["q", "-e", "2.5", "--method", "clt"])
    assert args.error == 2.5 and args.method == "clt"
    with pytest.raises(SystemExit):
        p.parse_args(["q", "--method", "nope"])


def test_cli_format_result():
    res = ApproxResult(
        df=None, value=123.4567, ci_lower=120.0, ci_upper=126.9,
        status=ApproximationStatus.STABLE, error_margin=3.45,
        samples_used=500, fraction=0.1, computation_time=0.5, method="random",
    )

    class A:
        ci = True

    out = format_result(res, A())
    assert "123.4567" in out and "STABLE" in out and "95% CI" in out


def test_cli_format_result_renders_both_advisor_families():
    """format_result must render the SUM-family (cv2 keys) AND the
    quantile-family (sample_rel_ci keys) advisor evidence — the
    quantile shape crashed it with KeyError 'cv2' before round 6's
    review pass."""

    class A:
        ci = False

    base = dict(
        df=None, value=1.0, status=ApproximationStatus.STABLE,
        samples_used=10, fraction=0.1, computation_time=0.1,
    )
    s = ApproxResult(method="pps", **base)
    s.groups["__advisor__"] = {
        "recommended_method": "pps", "n": 100, "cv2": 5.1,
        "top_share": 0.1, "pred_rel_ci_uniform10": 0.2,
    }
    out = format_result(s, A())
    assert "cv2=5.1" in out

    q = ApproxResult(method="quantile", **base)
    q.groups["__advisor__"] = {
        "recommended_method": "quantile", "n": 100, "q": 0.5,
        "fraction": 0.1, "sample_rel_ci": 0.003, "positive_only": True,
        "dd_alpha": 0.01, "tolerance": 0.01,
    }
    out = format_result(q, A())
    assert "sample_rel_ci=0.003" in out and "quantile" in out


def test_cli_explain_prints(capsys):
    print_methods()
    out = capsys.readouterr().out
    assert "revolutionary" in out and "clt" in out


def test_format_roundtrip_all_readers(spark, tmp_path):
    """read_table/write_table round-trip through every supported format
    (values preserved; csv via header+inferSchema)."""
    from approximatequeryengine_spark.sources.registry import (
        READERS,
        read_table,
        write_table,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    want = {(r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in src.collect()}
    for fmt in READERS:
        path = str(tmp_path / f"t_{fmt}")
        write_table(src, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt)
        got = {
            (r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in back.collect()
        }
        assert got == want, fmt


def test_register_external_source_runs_through_engine(spark, tmp_path):
    """Reference S1 parity: an arbitrary non-fixture database/path can
    be mounted into the catalog and queried — exact SQL through the
    temp view AND the APPROX dialect with deterministic sampling on the
    registered key (``core/db.cpp:33-46`` opens any SQLite file; here
    any readable path)."""
    from approximatequeryengine_spark import AQEngine

    ext = str(tmp_path / "external_sales")
    spark.range(0, 1000).selectExpr(
        "id AS sale_id", "CAST(id % 7 AS DOUBLE) * 10.0 AS amount"
    ).write.parquet(ext)

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    eng.catalog.register_path("ext_sales", ext, fmt="parquet", key="sale_id")
    assert "ext_sales" in eng.catalog.table_names()

    exact = eng.run("SELECT sum(amount) AS s FROM ext_sales")
    truth = sum((i % 7) * 10.0 for i in range(1000))
    assert exact.df.collect()[0]["s"] == truth

    approx = eng.run("SELECT APPROX(SUM(amount)) FROM ext_sales", sample_pct=20)
    assert approx.value == pytest.approx(truth, rel=0.25)
    assert approx.ci_lower <= approx.value <= approx.ci_upper

    # csv path with reader options works through the same entry point
    csv = str(tmp_path / "external_csv")
    spark.range(0, 50).selectExpr("id", "id * 2 AS v").write.option(
        "header", "true"
    ).csv(csv)
    eng.catalog.register_path(
        "ext_csv", csv, fmt="csv", key="id", header="true", inferSchema="true"
    )
    assert eng.run("SELECT count(*) AS n FROM ext_csv").df.collect()[0]["n"] == 50


def test_cli_explain_lists_new_methods(capsys):
    from approximatequeryengine_spark.cli import print_methods

    print_methods()
    out = capsys.readouterr().out
    for m in ("bootstrap", "pps", "random", "clt"):
        assert m in out


def test_register_jdbc_end_to_end_via_derby(spark, tmp_path):
    """Reference S1 parity, JDBC edition (``core/db.cpp:33-46`` opens an
    external SQLite file; Spark's analogue is any JDBC database). Runs
    END TO END against Apache Derby embedded — whose driver ships in
    Spark's own jars directory, so no external download: write a table
    through Spark's JDBC sink, mount it with ``register_jdbc``, and run
    exact SQL + the APPROX dialect over it."""
    import py4j

    # Keep Derby's log out of the repo root.
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log")
    )
    url = f"jdbc:derby:{tmp_path}/aqedb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    try:
        spark.range(0, 500).selectExpr(
            "id AS sale_id", "CAST(id % 5 AS DOUBLE) * 3.0 AS amount"
        ).write.jdbc(url, "sales", mode="overwrite", properties=props)
    except py4j.protocol.Py4JJavaError as e:  # pragma: no cover - env-dependent
        pytest.skip(f"Derby embedded unavailable in this Spark build: {e}")

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    eng.catalog.register_jdbc("jdbc_sales", url, "sales", key="sale_id", **props)
    assert "jdbc_sales" in eng.catalog.table_names()

    truth = sum((i % 5) * 3.0 for i in range(500))
    exact = eng.run("SELECT sum(amount) AS s FROM jdbc_sales")
    assert exact.df.collect()[0]["s"] == truth

    approx = eng.run("SELECT APPROX(SUM(amount)) FROM jdbc_sales", sample_pct=25)
    assert approx.value == pytest.approx(truth, rel=0.25)
    assert approx.ci_lower <= approx.value <= approx.ci_upper


def test_cli_validate_gate(spark, monkeypatch):
    """--validate runs the constraint suite and exits 0 when green.
    The CLI stops its session on exit; under pytest that session IS the
    shared fixture (getOrCreate), so stop is patched to a no-op."""
    from pyspark.sql import SparkSession

    from approximatequeryengine_spark.cli import main

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    assert main(["--validate", "--data", "/root/testdata/sf0.001"]) == 0
