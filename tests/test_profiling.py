"""Dataset profiling operators (operators/profiling.py)."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.operators.profiling import (
    RFM_BUCKETS,
    profile_columns,
    profile_columns_sql,
    rfm_segments,
    rfm_segments_sql,
)
from tests.conftest import assert_df_matches_sql


def test_profile_detects_nulls_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 7.5, None), (4, 7.5, "b")],
        "k long, v double, s string",
    )
    got = {r["column"]: r for r in profile_columns(spark, df).collect()}
    assert set(got) == {"k", "v", "s"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_val"] == 2.5 and got["v"]["max_val"] == 7.5
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_val"] is None  # non-numeric: no min/max
    assert got["k"]["min_val"] == 1.0 and got["k"]["max_val"] == 4.0


def test_profile_single_scan(spark, engine):
    """All columns' measures must come from one pass over the data —
    no per-column re-scan."""
    import re

    df = profile_columns(spark, engine.catalog.table("lineitem"))
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "+- == Initial Plan =="
    )[0]
    assert len(re.findall(r"Scan parquet", final)) == 1


def test_profile_oracle_parity(spark, engine, duck):
    from approximatequeryengine_spark.workload import _LINEITEM_PROFILE_COLS

    assert_df_matches_sql(
        profile_columns(spark, engine.catalog.table("lineitem")),
        duck,
        profile_columns_sql("lineitem", _LINEITEM_PROFILE_COLS),
    )


def test_rfm_invariants_and_parity(spark, engine, duck):
    orders = engine.catalog.table("orders")
    rows = rfm_segments(spark, orders).collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_bucket"] <= RFM_BUCKETS
        assert 1 <= r["f_bucket"] <= RFM_BUCKETS
        assert r["avg_monetary"] > 0
    # high-frequency customers should spend more on average than
    # low-frequency ones (frequency and monetary are correlated)
    f1 = [r for r in rows if r["f_bucket"] == 1]
    f5 = [r for r in rows if r["f_bucket"] == RFM_BUCKETS]
    avg1 = sum(r["n_customers"] * r["avg_monetary"] for r in f1) / sum(
        r["n_customers"] for r in f1
    )
    avg5 = sum(r["n_customers"] * r["avg_monetary"] for r in f5) / sum(
        r["n_customers"] for r in f5
    )
    assert avg1 > avg5
    assert_df_matches_sql(rfm_segments(spark, orders), duck, rfm_segments_sql())


def test_key_frequency_spectrum(spark):
    from approximatequeryengine_spark.catalog import Catalog
    from approximatequeryengine_spark.operators.profiling import (
        key_frequency_spectrum,
    )

    li = Catalog(spark, "/root/testdata/sf0.01").table("lineitem")
    rows = key_frequency_spectrum(spark, li, "l_orderkey", top=100).collect()
    # conservation: Σ n_rows == |lineitem|, Σ n_keys == |distinct keys|
    assert sum(r["n_rows"] for r in rows) == li.count()
    assert sum(r["n_keys"] for r in rows) == li.select("l_orderkey").distinct().count()
    assert all(r["n_rows"] == r["freq"] * r["n_keys"] for r in rows)
    # Σ f²·n_keys is the exact self-join size the AMS sketch estimates
    f2_exact = sum(r["freq"] ** 2 * r["n_keys"] for r in rows)
    from pyspark.sql import functions as F

    from approximatequeryengine_spark.plans.ams import ams_f2_estimate

    est = ams_f2_estimate(li, F.col("l_orderkey")).collect()[0]["f2_estimate"]
    assert abs(est - f2_exact) / f2_exact < 0.35


def test_constraint_checks_all_pass_on_fixture_and_catch_breaks(spark, engine):
    """The fixture satisfies the whole suite; a corrupted frame (NULL
    keys, orphan FK, negative price) flips exactly the right checks."""
    from approximatequeryengine_spark.operators.profiling import (
        constraint_checks_orders,
    )

    orders = engine.catalog.table("orders")
    customer = engine.catalog.table("customer")
    rows = {r["check_name"]: r for r in
            constraint_checks_orders(spark, orders, customer).collect()}
    assert len(rows) == 6 and all(r["passed"] for r in rows.values())
    assert rows["completeness_o_custkey"]["metric"] == 1.0
    assert rows["referential_o_custkey"]["metric"] == 0.0

    bad = orders.limit(50).unionByName(
        orders.limit(3).select(
            (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
            F.lit(None).cast("long").alias("o_custkey"),
            "o_orderstatus",
            (F.col("o_totalprice") * -1).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
    )
    got = {r["check_name"]: r for r in
           constraint_checks_orders(spark, bad, customer).collect()}
    assert not got["completeness_o_custkey"]["passed"]
    assert not got["min_o_totalprice"]["passed"]
    assert got["uniqueness_o_orderkey"]["passed"]  # keys still unique


def test_psi_drift_flags_shifted_source(spark):
    """A source whose length distribution is shifted far from the
    corpus must exceed the 0.2 PSI alarm; sources matching the corpus
    stay well under it."""
    from approximatequeryengine_spark.operators.profiling import psi_drift_by_source

    rows = []
    did = 0
    # c is a SMALL shifted source so the corpus mixture stays close to
    # the a/b distribution (a large shifted source drags every source's
    # PSI up — correct behavior, but not what this test isolates)
    for s, n_docs in (("a", 300), ("b", 300), ("c", 30)):
        for i in range(n_docs):
            n = 100 + (i % 5) * 30 if s != "c" else 560 + (i % 3) * 10
            rows.append((did, "t", "en", s, n))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in psi_drift_by_source(spark, docs).collect()}
    assert got["c"]["drifted"] and got["c"]["psi"] > 1.0
    assert not got["a"]["drifted"] and got["a"]["psi"] < 0.2
    assert got["a"]["n_docs"] == 300 and got["c"]["n_docs"] == 30
