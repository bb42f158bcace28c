"""Exact-path correctness vs the DuckDB oracle (SURVEY.md §5: every §2.4
operator with sampling off must match)."""

import pytest

from tests.conftest import assert_df_matches_sql


@pytest.mark.parametrize(
    "query,oracle",
    [
        (
            "SELECT SUM(l_extendedprice) FROM lineitem",
            "SELECT SUM(l_extendedprice) AS sum_l_extendedprice, COUNT(*) AS n_samples FROM lineitem",
        ),
        (
            "SELECT AVG(l_quantity) FROM lineitem",
            "SELECT AVG(l_quantity) AS avg_l_quantity, COUNT(*) AS n_samples FROM lineitem",
        ),
        (
            "SELECT COUNT(*) FROM lineitem",
            "SELECT CAST(COUNT(*) AS DOUBLE) AS count_star, COUNT(*) AS n_samples FROM lineitem",
        ),
        (
            "SELECT SUM(l_extendedprice) FROM lineitem WHERE l_discount > 0.05",
            "SELECT SUM(l_extendedprice) AS sum_l_extendedprice, COUNT(*) AS n_samples "
            "FROM lineitem WHERE l_discount > 0.05",
        ),
        (
            "SELECT MIN(l_extendedprice) FROM lineitem",
            "SELECT MIN(l_extendedprice) AS min_l_extendedprice, COUNT(*) AS n_samples FROM lineitem",
        ),
        (
            "SELECT MAX(o_totalprice) FROM orders",
            "SELECT MAX(o_totalprice) AS max_o_totalprice, COUNT(*) AS n_samples FROM orders",
        ),
    ],
)
def test_global_exact(engine, duck, query, oracle):
    res = engine.run(query)
    assert_df_matches_sql(res.df, duck, oracle)


def test_groupby_exact(engine, duck):
    res = engine.run("SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag")
    assert_df_matches_sql(
        res.df,
        duck,
        "SELECT l_returnflag, SUM(l_extendedprice) AS sum_l_extendedprice, "
        "COUNT(*) AS n_samples FROM lineitem GROUP BY l_returnflag",
    )


def test_where_groupby_exact(engine, duck):
    res = engine.run(
        "SELECT AVG(value) FROM events WHERE event_type = 'click' GROUP BY user_id"
    )
    assert_df_matches_sql(
        res.df,
        duck,
        "SELECT user_id, AVG(value) AS avg_value, COUNT(*) AS n_samples "
        "FROM events WHERE event_type = 'click' GROUP BY user_id",
        abs_tol=1e-9,
    )


def test_sql_passthrough(engine, duck):
    # Beyond the reference grammar → full Spark SQL (joins etc.), exact.
    res = engine.run(
        "SELECT n_name, count(*) AS cnt FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )
    assert res.method == "spark_sql"
    assert_df_matches_sql(
        res.df,
        duck,
        "SELECT n_name, count(*) AS cnt FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    )


def test_resample_locf_fills_gaps(spark):
    """At sf0.001 (~1.4 events/hour) the hourly spine has empty hours;
    each must appear with n_events=0 and carry the previous hour's
    filled value forward."""
    from approximatequeryengine_spark.workload import QUERIES

    rows = QUERIES["resample_hourly_locf"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 720  # 30 days of hourly spine, gaps included
    gaps = [i for i, r in enumerate(rows) if r["n_events"] == 0]
    assert gaps, "fixture should contain empty hours at this SF"
    for i in gaps:
        if i > 0:
            assert rows[i]["v_filled"] == rows[i - 1]["v_filled"]
