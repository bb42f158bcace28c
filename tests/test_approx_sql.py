"""APPROX-over-arbitrary-SQL rewrite (frontend/approx_sql.py): routing,
cross-engine value parity, multi-aggregate shapes, and fallbacks."""

import pytest

from approximatequeryengine_spark.catalog import TABLES
from approximatequeryengine_spark.frontend.approx_sql import rewrite_approx_sql
from tests.conftest import assert_df_matches_sql

JOIN_Q = (
    "SELECT n_name, APPROX(SUM(l_extendedprice * (1 - l_discount))) AS revenue "
    "FROM lineitem TABLESAMPLE (10 PERCENT) "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n_name"
)


def test_rewrite_requires_both_markers():
    # No APPROX marker → None (plain TABLESAMPLE keeps native semantics)
    assert rewrite_approx_sql(
        "SELECT count(*) FROM lineitem TABLESAMPLE (10 PERCENT)", TABLES
    ) is None
    # No TABLESAMPLE marker → None (which table to sample is explicit)
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q FROM lineitem", TABLES
    ) is None
    # Unknown table → None (no unique key to hash)
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(x)) AS s FROM mystery TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None
    # HAVING is outside the v1 shape
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q FROM lineitem "
        "TABLESAMPLE (10 PERCENT) GROUP BY l_returnflag HAVING count(*) > 1",
        TABLES,
    ) is None


def test_rewrite_accepts_multiline_query():
    # The normal triple-quoted form carries leading whitespace/newlines;
    # the rewrite must not require SELECT at byte 0.
    out = rewrite_approx_sql("\n  " + JOIN_Q + "\n", TABLES, round_to=3)
    assert out is not None and "n_samples" in out


def test_rewrite_rejects_embedded_approx_expression():
    # APPROX inside a larger expression can't be rewritten — must return
    # None (clean guidance error) rather than emit literal APPROX( SQL.
    q = (
        "SELECT APPROX(SUM(l_quantity)) AS q, "
        "APPROX(SUM(l_extendedprice)) + 0 AS r "
        "FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    assert rewrite_approx_sql(q, TABLES) is None


def test_n_samples_is_null_insensitive():
    # n_samples must count sampled ROWS (COUNT(1)), not the first
    # aggregate's non-NULL expression count.
    q = (
        "SELECT APPROX(SUM(nullif(l_quantity, 1))) AS a, "
        "APPROX(SUM(l_extendedprice)) AS b "
        "FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    out = rewrite_approx_sql(q, TABLES)
    assert "COUNT(1) AS n_rows" in out
    assert "CAST(n_rows AS BIGINT) AS n_samples" in out


def test_rewrite_strips_markers():
    out = rewrite_approx_sql(JOIN_Q, TABLES, round_to=3)
    assert out is not None
    assert "APPROX" not in out.upper().replace("TABLESAMPLE", "")
    assert "TABLESAMPLE" not in out.upper()
    # CI columns for the single aggregate use the canonical names
    assert "ci_lower" in out and "ci_upper" in out and "n_samples" in out


def test_join_rewrite_matches_duckdb(spark, engine_med, duck_med):
    out = rewrite_approx_sql(JOIN_Q, TABLES, round_to=3)
    engine_med.catalog.refresh_views()
    sdf = spark.sql(out)
    assert_df_matches_sql(sdf, duck_med, out)


def test_engine_routes_join_approx(engine_med):
    res = engine_med.run(JOIN_Q)
    assert res.method == "sql_rewrite"
    rows = res.df.collect()
    assert len(rows) == 25
    r = rows[0]
    assert r["ci_lower"] <= r["revenue"] <= r["ci_upper"]
    assert r["n_samples"] > 0


def test_engine_still_rejects_unrewritable_approx(engine_med):
    with pytest.raises(ValueError, match="TABLESAMPLE"):
        # APPROX marker but no TABLESAMPLE and not the simple grammar
        engine_med.run(
            "SELECT n_name, APPROX(SUM(l_extendedprice * (1 - l_discount))) "
            "AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        )


def test_multiple_aggregates_and_count_star(spark, engine_med, duck_med):
    q = (
        "SELECT o_orderpriority, APPROX(SUM(o_totalprice)) AS total, "
        "APPROX(COUNT(*)) AS n_est, APPROX(AVG(o_totalprice)) AS avg_price "
        "FROM orders TABLESAMPLE (20 PERCENT) "
        "WHERE o_orderstatus = 'F' "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=4)
    assert out is not None
    # multi-aggregate → per-alias CI suffixes
    assert "total_lo" in out and "n_est_hi" in out and "avg_price_lo" in out
    engine_med.catalog.refresh_views()
    sdf = spark.sql(out)
    assert_df_matches_sql(sdf, duck_med, out)


POSTSTRAT_Q = (
    "SELECT l_linestatus, APPROX(SUM(l_extendedprice)) AS est "
    "FROM lineitem TABLESAMPLE (10 PERCENT) "
    "GROUP BY l_linestatus STRATIFY BY l_returnflag ORDER BY l_linestatus"
)


def test_stratify_marker_rewrites_and_matches(spark, engine_med, duck_med):
    out = rewrite_approx_sql(POSTSTRAT_Q, TABLES, round_to=3)
    assert out is not None
    assert "STRATIFY" not in out.upper() and "TABLESAMPLE" not in out.upper()
    assert "missing_strata" in out and "n_strata" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)


def test_aux_marker_rewrites_and_matches(spark, engine_med, duck_med):
    q = (
        "SELECT APPROX(SUM(l_extendedprice * (1 - l_discount))) AS revenue "
        "FROM lineitem TABLESAMPLE (10 PERCENT) USING AUX(l_extendedprice)"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    assert out is not None and "slope" in out and "method" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    # the strong auxiliary actually answers (not the expansion fallback)
    row = spark.sql(out).collect()[0]
    assert row["method"] == "regression"


def test_stratify_marker_over_star_join(spark, engine_med, duck_med):
    # Round 9: STRATIFY BY over a key-preserving star join — the exact
    # per-(group, stratum) counts come from the UNSAMPLED join, the
    # sample moments from the same join with the sampled fact scan.
    q = (
        "SELECT n_name, APPROX(SUM(l_extendedprice * (1 - l_discount))) "
        "AS revenue "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name STRATIFY BY o_orderstatus ORDER BY n_name"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    assert out is not None and "missing_strata" in out
    # the sampled side carries the predicate INSIDE the derived fact
    assert "(SELECT * FROM lineitem WHERE" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)


def test_aux_marker_over_join(spark, engine_med, duck_med):
    q = (
        "SELECT APPROX(SUM(l_extendedprice * (1 - l_discount))) AS revenue "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' USING AUX(l_extendedprice)"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    assert out is not None and "slope" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    row = spark.sql(out).collect()[0]
    assert row["method"] == "regression"


def test_ratio_of_sums_rewrites_and_matches(spark, engine_med, duck_med):
    q = (
        "SELECT l_returnflag, "
        "APPROX(SUM(l_extendedprice * (1 - l_discount)) / SUM(l_quantity)) "
        "AS rev_per_unit "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=6)
    assert out is not None and "ha_0" in out  # delta-method moments
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)


def test_estimator_marker_shape_gates(engine_med):
    # STRATIFY over an INNER join is accepted since round 9 — the
    # sample predicate must land inside a derived fact table so it
    # applies before the join on the sampled side only.
    out = rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q FROM lineitem "
        "TABLESAMPLE (10 PERCENT) JOIN orders ON l_orderkey = o_orderkey "
        "STRATIFY BY l_returnflag",
        TABLES,
    )
    assert out is not None and "(SELECT * FROM lineitem WHERE" in out
    # ...but outer joins null-extend / fan out → rejected
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q FROM lineitem "
        "TABLESAMPLE (10 PERCENT) LEFT JOIN orders ON l_orderkey = o_orderkey "
        "STRATIFY BY l_returnflag",
        TABLES,
    ) is None
    # ...and a join to an uncataloged table → rejected
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q FROM lineitem "
        "TABLESAMPLE (10 PERCENT) JOIN mystery ON l_orderkey = m_key "
        "STRATIFY BY l_returnflag",
        TABLES,
    ) is None
    # stratum == group is a semantic error, not a shape miss
    with pytest.raises(ValueError, match="STRATIFY BY column"):
        rewrite_approx_sql(
            "SELECT l_returnflag, APPROX(SUM(l_quantity)) AS q "
            "FROM lineitem TABLESAMPLE (10 PERCENT) "
            "GROUP BY l_returnflag STRATIFY BY l_returnflag",
            TABLES,
        )
    # poststrat/regaux estimate a TOTAL — AVG is rejected
    assert rewrite_approx_sql(
        "SELECT APPROX(AVG(l_quantity)) AS q FROM lineitem "
        "TABLESAMPLE (10 PERCENT) STRATIFY BY l_returnflag",
        TABLES,
    ) is None
    # join USING (k) is join syntax, not the AUX marker — main path OK
    out = rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS q "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "JOIN orders ON l_orderkey = o_orderkey",
        TABLES,
    )
    assert out is not None


def test_quantile_rewrites_and_matches(spark, engine_med, duck_med):
    # MEDIAN, global + WHERE
    q = (
        "SELECT APPROX(MEDIAN(o_totalprice)) AS med FROM orders "
        "TABLESAMPLE (20 PERCENT) WHERE o_orderstatus = 'F'"
    )
    out = rewrite_approx_sql(q, TABLES)
    assert out is not None and "row_number()" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    # PERCENTILE, grouped
    g = (
        "SELECT l_returnflag, "
        "APPROX(PERCENTILE(l_extendedprice, 0.9)) AS p90 "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    out = rewrite_approx_sql(g, TABLES)
    assert out is not None
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    # CI brackets the point estimate (order statistics: lo <= point <= hi)
    rows = spark.sql(out).collect()
    assert len(rows) == 3
    assert all(r["ci_lower"] <= r["p90"] <= r["ci_upper"] for r in rows)


def test_quantile_shape_gates(engine_med):
    # q outside (0, 1) → not a quantile item → guidance rejection
    assert rewrite_approx_sql(
        "SELECT APPROX(PERCENTILE(l_quantity, 1.5)) AS p FROM lineitem "
        "TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None
    # joins are outside the order-statistic template
    assert rewrite_approx_sql(
        "SELECT APPROX(MEDIAN(l_quantity)) AS m FROM lineitem "
        "TABLESAMPLE (10 PERCENT) JOIN orders ON l_orderkey = o_orderkey",
        TABLES,
    ) is None
    # engine routing end-to-end
    res = engine_med.run(
        "SELECT APPROX(MEDIAN(l_extendedprice)) AS med_price "
        "FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    assert res.method == "sql_rewrite"
    r = res.df.collect()[0]
    assert r["ci_lower"] <= r["med_price"] <= r["ci_upper"]


def test_count_distinct_routes_to_chao1(spark, engine_med, duck_med):
    """APPROX(COUNT(DISTINCT col)): Chao1 species estimator, not the
    HT moment path (which used to emit invalid SQL for this shape).
    Cross-engine match + the estimate must beat the naive observed
    count against the true distinct cardinality."""
    q = (
        "SELECT APPROX(COUNT(DISTINCT l_partkey)) AS d_parts "
        "FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    out = rewrite_approx_sql(q, TABLES)
    assert out is not None and "f1" in out and "d_obs" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    row = spark.sql(out).collect()[0]
    true_d = duck_med.execute(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert abs(row["d_parts"] - true_d) < abs(row["d_obs"] - true_d)
    # SUM(DISTINCT) is not an estimand the markers cover → guidance
    import pytest as _pytest

    with _pytest.raises(ValueError, match="TABLESAMPLE"):
        engine_med.run(
            "SELECT APPROX(SUM(DISTINCT l_quantity)) AS s "
            "FROM lineitem TABLESAMPLE (10 PERCENT)"
        )


def test_reserved_alias_rejected():
    # an estimate alias shadowing a template output column would
    # duplicate a column name — clean rejection
    assert rewrite_approx_sql(
        "SELECT APPROX(SUM(l_quantity)) AS n_samples "
        "FROM lineitem TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None
    assert rewrite_approx_sql(
        "SELECT APPROX(MEDIAN(l_quantity)) AS ci_lower "
        "FROM lineitem TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None


def test_compare_runs_exact_twin(engine_med, duck_med):
    """compare=True on the rewrite path: the exact twin (markers
    unwrapped) runs and the actual error + speedup are reported — the
    F6 comparison extended to the SQL-marker surface."""
    from approximatequeryengine_spark.frontend.approx_sql import exact_twin_sql

    q = (
        "SELECT APPROX(SUM(l_extendedprice)) AS total "
        "FROM lineitem TABLESAMPLE (10 PERCENT) STRATIFY BY l_returnflag"
    )
    twin = exact_twin_sql(q)
    assert twin is not None
    assert "TABLESAMPLE" not in twin.upper() and "STRATIFY" not in twin.upper()
    assert "SUM(l_extendedprice) AS total" in twin
    res = engine_med.run(q, compare=True)
    assert res.method == "sql_rewrite"
    exact = duck_med.execute(
        "SELECT sum(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert abs(res.groups["__exact__"] - exact) < 0.01
    assert res.groups["__actual_error_pct__"] < 5.0  # 10% sample, n≈6e4
    # ratio + quantile twins unwrap correctly
    t2 = exact_twin_sql(
        "SELECT APPROX(SUM(a) / SUM(b)) AS r FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert "SUM(a) / SUM(b) AS r" in t2
    t3 = exact_twin_sql(
        "SELECT APPROX(PERCENTILE(x, 0.9)) AS p FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert "percentile(x, 0.9) AS p" in t3


def test_engine_routes_estimator_markers(engine_med):
    res = engine_med.run(POSTSTRAT_Q)
    assert res.method == "sql_rewrite"
    rows = res.df.collect()
    assert len(rows) == 2
    assert all(r["ci_lower"] <= r["est"] <= r["ci_upper"] for r in rows)
    assert all(r["missing_strata"] == 0 for r in rows)


def test_global_aggregate_no_group_by(spark, engine_med, duck_med):
    q = (
        "SELECT APPROX(SUM(l_quantity)) AS qty "
        "FROM lineitem TABLESAMPLE (10 PERCENT) WHERE l_discount > 0.05"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=2)
    assert out is not None
    engine_med.catalog.refresh_views()
    sdf = spark.sql(out)
    assert_df_matches_sql(sdf, duck_med, out)


def test_within_marker_parses_and_gates():
    """WITHIN e PERCENT grammar: optional TABLESAMPLE, one SUM estimate,
    INNER star joins accepted (round 9), no tails/non-SUM shapes."""
    from approximatequeryengine_spark.frontend.approx_sql import (
        parse_within_marker,
    )

    got = parse_within_marker(
        "SELECT APPROX(SUM(l_extendedprice)) AS t FROM lineitem "
        "WITHIN 2 PERCENT",
        TABLES,
    )
    assert got == (
        "lineitem", "SUM", "l_extendedprice", "t", None, [], None, 2.0,
        "", False, None,
    )
    got = parse_within_marker(
        "SELECT l_returnflag, APPROX(SUM(l_quantity)) AS s FROM lineitem "
        "TABLESAMPLE (5 PERCENT) WHERE l_discount > 0 "
        "GROUP BY l_returnflag WITHIN 1.5 PERCENT",
        TABLES,
    )
    assert got == (
        "lineitem", "SUM", "l_quantity", "s", "l_discount > 0",
        ["l_returnflag"], 5.0, 1.5, "", False, None,
    )
    # no marker → None
    assert parse_within_marker(
        "SELECT APPROX(SUM(l_quantity)) AS s FROM lineitem", TABLES
    ) is None
    # AVG/COUNT accepted since the second round-9 batch; MEDIAN is not
    got = parse_within_marker(
        "SELECT APPROX(AVG(l_quantity)) AS a FROM lineitem WITHIN 2 PERCENT",
        TABLES,
    )
    assert got is not None and got[1] == "AVG"
    assert parse_within_marker(
        "SELECT APPROX(MEDIAN(l_quantity)) AS m FROM lineitem "
        "WITHIN 2 PERCENT",
        TABLES,
    ) is None
    # ORDER BY over the estimate is outside the shape; a bare group
    # prefix is accepted (round-9 second batch)
    assert parse_within_marker(
        "SELECT APPROX(SUM(l_quantity)) AS s FROM lineitem "
        "WITHIN 2 PERCENT ORDER BY s",
        TABLES,
    ) is None
    got = parse_within_marker(
        "SELECT l_returnflag, APPROX(SUM(l_quantity)) AS s FROM lineitem "
        "GROUP BY l_returnflag WITHIN 2 PERCENT ORDER BY l_returnflag",
        TABLES,
    )
    assert got is not None and got[9] is True
    # INNER star joins accepted; outer joins rejected
    got = parse_within_marker(
        "SELECT APPROX(SUM(l_quantity)) AS s FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey WITHIN 2 PERCENT",
        TABLES,
    )
    assert got is not None and got[8] == "JOIN orders ON l_orderkey = o_orderkey"
    assert parse_within_marker(
        "SELECT APPROX(SUM(l_quantity)) AS s FROM lineitem "
        "LEFT JOIN orders ON l_orderkey = o_orderkey WITHIN 2 PERCENT",
        TABLES,
    ) is None


def test_within_marker_runs_adaptive(engine_med, duck_med):
    """The WITHIN route escalates until the realized CI half-width meets
    the budget, reports method='adaptive_sql', honors the alias, and the
    exact twin comparison works."""
    res = engine_med.run(
        "SELECT APPROX(SUM(l_extendedprice)) AS total_price "
        "FROM lineitem WITHIN 2 PERCENT",
        compare=True,
    )
    assert res.method == "adaptive_sql"
    row = res.df.collect()[0]
    assert set(res.df.columns) == {
        "total_price", "ci_lower", "ci_upper", "n_samples"
    }
    half = (row["ci_upper"] - row["ci_lower"]) / 2.0
    assert 100.0 * half / abs(row["total_price"]) <= 2.0
    exact = duck_med.execute(
        "SELECT sum(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert res.ci_lower <= float(exact) <= res.ci_upper
    assert res.groups["__actual_error_pct__"] < 2.0
    # grouped: worst group meets the budget
    gres = engine_med.run(
        "SELECT l_returnflag, APPROX(SUM(l_extendedprice)) AS s "
        "FROM lineitem GROUP BY l_returnflag WITHIN 2 PERCENT"
    )
    assert gres.method == "adaptive_sql"
    for r in gres.df.collect():
        h = (r["ci_upper"] - r["ci_lower"]) / 2.0
        assert 100.0 * h / abs(r["s"]) <= 2.0


def test_within_marker_over_join(engine_med, duck_med):
    """Round 9: WITHIN over a key-preserving star join — the budget is
    met, the exact joined total is covered, and each rung's hash filter
    lands on the fact scan (pushed through the broadcast join)."""
    res = engine_med.run(
        "SELECT APPROX(SUM(l_extendedprice * (1 - l_discount))) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' WITHIN 2 PERCENT",
        compare=True,
    )
    assert res.method == "adaptive_sql"
    row = res.df.collect()[0]
    half = (row["ci_upper"] - row["ci_lower"]) / 2.0
    assert 100.0 * half / abs(row["revenue"]) <= 2.0
    exact = duck_med.execute(
        "SELECT sum(l_extendedprice * (1 - l_discount)) "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert res.ci_lower <= float(exact) <= res.ci_upper
    assert res.groups["__actual_error_pct__"] < 2.0


def test_within_explain_auto(engine_med):
    info = engine_med.explain_auto(
        "SELECT APPROX(SUM(l_extendedprice)) AS t FROM lineitem "
        "WITHIN 2 PERCENT"
    )
    assert info["method"] == "adaptive_sql"
    assert info["evidence"]["error_pct"] == 2.0
    assert info["evidence"]["start_fraction"] == 0.15


def test_having_over_approx_estimate(spark, engine_med, duck_med):
    """HAVING f(APPROX(...)) — predicate moves to a WHERE over the
    outer (alias-projected) select; marker re-statement and bare-alias
    forms both work; same text on both engines."""
    q = (
        "SELECT l_returnflag, APPROX(SUM(l_extendedprice)) AS rev "
        "FROM lineitem TABLESAMPLE (10 PERCENT) GROUP BY l_returnflag "
        "HAVING APPROX(SUM(l_extendedprice)) > 1000000000 "
        "ORDER BY l_returnflag"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=2)
    assert out is not None and "HAVING" not in out.upper()
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    res = engine_med.run(q)
    assert res.method == "sql_rewrite"
    assert all(r["rev"] > 1000000000 for r in res.df.collect())
    # bare-alias reference works too (the outer select projects it)
    q2 = q.replace("HAVING APPROX(SUM(l_extendedprice))", "HAVING rev")
    out2 = rewrite_approx_sql(q2, TABLES, round_to=2)
    assert out2 == out.replace(" AS rev", " AS rev") and out2 is not None
    # a non-APPROX aggregate has no outer column — guidance rejection
    q3 = q.replace(
        "HAVING APPROX(SUM(l_extendedprice)) > 1000000000",
        "HAVING count(*) > 1",
    )
    assert rewrite_approx_sql(q3, TABLES) is None
    # an APPROX in HAVING that is NOT in the select list — rejection
    q4 = q.replace(
        "HAVING APPROX(SUM(l_extendedprice))",
        "HAVING APPROX(SUM(l_quantity))",
    )
    assert rewrite_approx_sql(q4, TABLES) is None


def test_having_exact_twin_unwraps(engine_med):
    from approximatequeryengine_spark.frontend.approx_sql import (
        exact_twin_sql,
    )

    q = (
        "SELECT l_returnflag, APPROX(SUM(l_extendedprice)) AS rev "
        "FROM lineitem TABLESAMPLE (10 PERCENT) GROUP BY l_returnflag "
        "HAVING APPROX(SUM(l_extendedprice)) > 1000000000"
    )
    twin = exact_twin_sql(q)
    assert twin is not None and "APPROX" not in twin.upper()
    assert "HAVING SUM(l_extendedprice) > 1000000000" in twin
    res = engine_med.run(q, compare=True)
    assert "__exact_df__" in res.groups


CTE_Q = (
    "WITH big_orders AS (SELECT o_orderkey, o_orderpriority FROM orders "
    "WHERE o_totalprice > 100000) "
    "SELECT o_orderpriority, APPROX(SUM(l_extendedprice)) AS rev "
    "FROM lineitem TABLESAMPLE (10 PERCENT) "
    "JOIN big_orders ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority"
)


def test_cte_rewrite_matches_duckdb(spark, engine_med, duck_med):
    # Round 9: a leading WITH prefix is split off, the main query
    # rewritten, and the prefix re-attached — one portable text.
    out = rewrite_approx_sql(CTE_Q, TABLES, round_to=3)
    assert out is not None and out.upper().startswith("WITH BIG_ORDERS")
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)


def test_cte_with_estimator_marker_splices_with(spark, engine_med, duck_med):
    q = (
        "WITH f_orders AS (SELECT o_orderkey FROM orders "
        "WHERE o_orderstatus = 'F') "
        "SELECT APPROX(SUM(l_quantity)) AS tq "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "JOIN f_orders ON l_orderkey = o_orderkey "
        "STRATIFY BY l_returnflag"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    # user CTE spliced FIRST into the template's own WITH list
    assert out is not None and out.upper().startswith("WITH F_ORDERS")
    assert "aqe_exact" in out
    engine_med.catalog.refresh_views()
    assert_df_matches_sql(spark.sql(out), duck_med, out)


def test_cte_shape_gates(engine_med):
    # a sampled or APPROX'd CTE body is outside the v1 shape
    assert rewrite_approx_sql(
        "WITH s AS (SELECT * FROM lineitem TABLESAMPLE (10 PERCENT)) "
        "SELECT APPROX(SUM(l_quantity)) AS q2 FROM s",
        TABLES,
    ) is None
    # RECURSIVE is not portable
    assert rewrite_approx_sql(
        "WITH RECURSIVE r AS (SELECT 1) SELECT APPROX(SUM(l_quantity)) "
        "AS s FROM lineitem TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None
    # template-reserved CTE names collide after splicing
    assert rewrite_approx_sql(
        "WITH aqe_exact AS (SELECT 1 AS one) SELECT APPROX(SUM(l_quantity)) "
        "AS s FROM lineitem TABLESAMPLE (10 PERCENT)",
        TABLES,
    ) is None
    # engine routing + compare twin for the CTE shape (grouped compare
    # reports the twin + speedup; per-column error is the 1-row path)
    res = engine_med.run(CTE_Q, compare=True)
    assert res.method == "sql_rewrite"
    assert "__speedup__" in res.groups
    assert res.groups["__exact_sql__"].upper().startswith("WITH BIG_ORDERS")


def test_multi_column_group_by_markers(spark, engine_med, duck_med):
    """Round 9 (second batch): the estimator/quantile/distinct marker
    templates accept multi-column GROUP BY (plain columns). The main
    moment path always did; now the whole marker surface does."""
    engine_med.catalog.refresh_views()
    # poststrat over two group columns
    q = (
        "SELECT l_returnflag, l_linestatus, "
        "APPROX(SUM(l_extendedprice)) AS est "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag, l_linestatus STRATIFY BY l_tax "
        "ORDER BY l_returnflag, l_linestatus"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    assert out is not None and "aqe_q1" in out
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    # regaux over two group columns
    q2 = (
        "SELECT l_returnflag, l_linestatus, "
        "APPROX(SUM(l_extendedprice * (1 - l_discount))) AS rev "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag, l_linestatus USING AUX(l_extendedprice) "
        "ORDER BY l_returnflag, l_linestatus"
    )
    out2 = rewrite_approx_sql(q2, TABLES, round_to=3)
    assert out2 is not None and "slope" in out2
    assert_df_matches_sql(spark.sql(out2), duck_med, out2)
    # grouped quantile over two columns keeps the window text (many
    # cells = the scale-safe window regime) and still matches
    q3 = (
        "SELECT l_returnflag, l_linestatus, "
        "APPROX(PERCENTILE(l_extendedprice, 0.9)) AS p90 "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    )
    out3 = rewrite_approx_sql(q3, TABLES)
    assert out3 is not None and "aqe_g1" in out3
    assert_df_matches_sql(spark.sql(out3), duck_med, out3)
    # distinct (Chao1) over two columns
    q4 = (
        "SELECT l_returnflag, l_linestatus, "
        "APPROX(COUNT(DISTINCT l_partkey)) AS d_parts "
        "FROM lineitem TABLESAMPLE (20 PERCENT) "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    )
    out4 = rewrite_approx_sql(q4, TABLES)
    assert out4 is not None and "f2" in out4
    assert_df_matches_sql(spark.sql(out4), duck_med, out4)
    # stratum colliding with ANY group column is the semantic error
    with pytest.raises(ValueError, match="STRATIFY BY column"):
        rewrite_approx_sql(
            "SELECT l_returnflag, l_linestatus, "
            "APPROX(SUM(l_quantity)) AS s "
            "FROM lineitem TABLESAMPLE (10 PERCENT) "
            "GROUP BY l_returnflag, l_linestatus STRATIFY BY l_linestatus",
            TABLES,
        )


def test_multi_column_group_by_within(engine_med):
    """WITHIN over two group columns: worst-cell stop rule."""
    res = engine_med.run(
        "SELECT l_returnflag, l_linestatus, APPROX(SUM(l_extendedprice)) "
        "AS s FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "WITHIN 5 PERCENT"
    )
    assert res.method == "adaptive_sql"
    rows = res.df.collect()
    assert len(rows) == 6  # the (flag, status) cells of the fixture
    for r in rows:
        h = (r["ci_upper"] - r["ci_lower"]) / 2.0
        assert 100.0 * h / abs(r["s"]) <= 5.0


def test_within_marker_avg_and_count(engine_med, duck_med):
    """Round 9 (second batch): WITHIN accepts AVG and COUNT — same CLT
    escalation, margin conventions from estimators._ci_columns (raw
    for AVG, integer-rounded for COUNT)."""
    res = engine_med.run(
        "SELECT APPROX(AVG(o_totalprice)) AS avg_price FROM orders "
        "WITHIN 2 PERCENT",
        compare=True,
    )
    assert res.method == "adaptive_sql"
    row = res.df.collect()[0]
    half = (row["ci_upper"] - row["ci_lower"]) / 2.0
    assert 100.0 * half / abs(row["avg_price"]) <= 2.0
    exact = duck_med.execute(
        "SELECT avg(o_totalprice) FROM orders"
    ).fetchone()[0]
    assert res.groups["__actual_error_pct__"] < 2.0
    assert row["ci_lower"] <= float(exact) <= row["ci_upper"]
    cres = engine_med.run(
        "SELECT APPROX(COUNT(*)) AS n_open FROM orders "
        "WHERE o_orderstatus = 'O' WITHIN 3 PERCENT"
    )
    assert cres.method == "adaptive_sql"
    crow = cres.df.collect()[0]
    chalf = (crow["ci_upper"] - crow["ci_lower"]) / 2.0
    assert 100.0 * chalf / abs(crow["n_open"]) <= 3.0
    cexact = duck_med.execute(
        "SELECT count(*) FROM orders WHERE o_orderstatus = 'O'"
    ).fetchone()[0]
    assert crow["ci_lower"] <= float(cexact) <= crow["ci_upper"]


def test_explain_auto_reports_quantile_routing(engine_med):
    info = engine_med.explain_auto(
        "SELECT l_returnflag, "
        "APPROX(PERCENTILE(l_extendedprice, 0.9)) AS p90 "
        "FROM lineitem TABLESAMPLE (10 PERCENT) GROUP BY l_returnflag"
    )
    assert info["method"] == "sql_rewrite"
    assert "grouped_order_stat_ci" in info["evidence"]["executes_via"]
    ginfo = engine_med.explain_auto(
        "SELECT APPROX(MEDIAN(l_extendedprice)) AS med "
        "FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    assert "order_stat_marker_ci" in ginfo["evidence"]["executes_via"]


def test_within_marker_with_leading_cte(engine_med, duck_med):
    """CTE + WITHIN: the prefix is split off, its names serve as join
    targets, and the adaptive base frame is built under the prefix. A
    CTE + WITHIN shape the parser rejects must fall to the guidance
    error, never to invalid rewritten SQL."""
    res = engine_med.run(
        "WITH f_orders AS (SELECT o_orderkey FROM orders "
        "WHERE o_orderstatus = 'F') "
        "SELECT APPROX(SUM(l_extendedprice)) AS rev FROM lineitem "
        "JOIN f_orders ON l_orderkey = o_orderkey WITHIN 2 PERCENT",
        compare=True,
    )
    assert res.method == "adaptive_sql"
    row = res.df.collect()[0]
    half = (row["ci_upper"] - row["ci_lower"]) / 2.0
    assert 100.0 * half / abs(row["rev"]) <= 2.0
    exact = duck_med.execute(
        "SELECT sum(l_extendedprice) FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert row["ci_lower"] <= float(exact) <= row["ci_upper"]
    # an unparseable WITHIN shape raises the guidance error (the
    # rewriter must never copy WITHIN into the moment aggregate)
    with pytest.raises(ValueError, match="TABLESAMPLE"):
        engine_med.run(
            "WITH x AS (SELECT 1 AS one) "
            "SELECT APPROX(MEDIAN(l_extendedprice)) AS m FROM lineitem "
            "WITHIN 2 PERCENT"
        )


def test_having_over_estimator_templates(spark, engine_med, duck_med):
    """Round 9 (second batch): HAVING over the poststrat/regaux/
    quantile/distinct templates — predicate moves to a WHERE over the
    template's output columns; marker re-statement, bare alias and
    readout-column forms all work; same text on both engines."""
    engine_med.catalog.refresh_views()
    q = (
        "SELECT l_linestatus, APPROX(SUM(l_extendedprice)) AS est "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_linestatus STRATIFY BY l_returnflag "
        "HAVING APPROX(SUM(l_extendedprice)) > 0 AND missing_strata = 0 "
        "ORDER BY l_linestatus"
    )
    out = rewrite_approx_sql(q, TABLES, round_to=3)
    assert out is not None and "aqe_h WHERE est > 0" in out
    assert_df_matches_sql(spark.sql(out), duck_med, out)
    # quantile + HAVING by bare alias
    q2 = (
        "SELECT l_returnflag, "
        "APPROX(PERCENTILE(l_extendedprice, 0.9)) AS p90 "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_returnflag HAVING p90 > 0 ORDER BY l_returnflag"
    )
    out2 = rewrite_approx_sql(q2, TABLES)
    assert out2 is not None and "WHERE p90 > 0" in out2
    assert_df_matches_sql(spark.sql(out2), duck_med, out2)
    # distinct + HAVING re-stating the marker
    q3 = (
        "SELECT l_returnflag, APPROX(COUNT(DISTINCT l_partkey)) AS d "
        "FROM lineitem TABLESAMPLE (20 PERCENT) "
        "GROUP BY l_returnflag "
        "HAVING APPROX(COUNT(DISTINCT l_partkey)) > 100 "
        "ORDER BY l_returnflag"
    )
    out3 = rewrite_approx_sql(q3, TABLES)
    assert out3 is not None and "WHERE d > 100" in out3
    assert_df_matches_sql(spark.sql(out3), duck_med, out3)
    # a plain aggregate in the predicate has no output column → guidance
    assert rewrite_approx_sql(
        "SELECT l_linestatus, APPROX(SUM(l_quantity)) AS s "
        "FROM lineitem TABLESAMPLE (10 PERCENT) "
        "GROUP BY l_linestatus STRATIFY BY l_returnflag "
        "HAVING count(*) > 1",
        TABLES,
    ) is None
