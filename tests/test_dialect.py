"""Dialect frontend: APPROX rewrites, grammar parse, method routing."""

from approximatequeryengine_spark.frontend.dialect import (
    METHODS,
    parse_query,
    rewrite_approx,
    select_method,
)


def test_rewrite_embedded_approx():
    q, approx, pct = rewrite_approx("SELECT APPROX(SUM(amount)) FROM sales")
    assert q == "SELECT SUM(amount) FROM sales"
    assert approx and pct is None


def test_rewrite_approx_func_with_pct():
    q, approx, pct = rewrite_approx("SELECT APPROX_SUM(amount, 15) FROM sales")
    assert q == "SELECT SUM(amount) FROM sales"
    assert approx and pct == 15.0


def test_rewrite_plain_query_untouched():
    q, approx, pct = rewrite_approx("SELECT SUM(amount) FROM sales")
    assert q == "SELECT SUM(amount) FROM sales"
    assert not approx


def test_parse_full_grammar():
    spec = parse_query(
        "SELECT SUM(l_extendedprice) FROM lineitem WHERE l_discount > 0.05 "
        "GROUP BY l_returnflag"
    )
    assert spec.agg == "SUM"
    assert spec.column == "l_extendedprice"
    assert spec.table == "lineitem"
    assert spec.where == "l_discount > 0.05"
    assert spec.group_by == "l_returnflag"


def test_parse_count_star():
    spec = parse_query("SELECT COUNT(*) FROM orders")
    assert spec.agg == "COUNT" and spec.column is None


def test_parse_rejects_complex_sql():
    assert parse_query("SELECT a, b FROM t JOIN u ON a = b") is None


def test_parse_median():
    spec = parse_query("SELECT APPROX(MEDIAN(l_extendedprice)) FROM lineitem")
    assert spec.agg == "MEDIAN" and spec.approx
    spec = parse_query("SELECT MEDIAN(value) FROM events")
    assert spec.agg == "MEDIAN" and not spec.approx


def test_engine_median(engine):
    import duckdb  # noqa: F401

    import pytest

    res = engine.run("SELECT APPROX(MEDIAN(l_extendedprice)) FROM lineitem", sample_pct=20)
    assert res.ci_lower <= res.value <= res.ci_upper
    assert res.method == "quantile" and res.samples_used > 0
    exact = engine.run("SELECT MEDIAN(l_extendedprice) FROM lineitem")
    assert exact.status.name == "EXACT"
    # the approximate CI should cover the exact median
    assert res.ci_lower <= exact.value <= res.ci_upper
    # grouped median routes to the per-group order-statistic CI
    grouped = engine.run(
        "SELECT APPROX(MEDIAN(value)) FROM events GROUP BY event_type",
        sample_pct=50,
    )
    rows = grouped.df.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lower"] <= r["value_q"] <= r["ci_upper"]


def test_parse_percentile():
    spec = parse_query("SELECT APPROX(PERCENTILE(l_extendedprice, 0.9)) FROM lineitem")
    assert spec.agg == "PERCENTILE" and spec.approx and spec.q == 0.9
    spec = parse_query("SELECT PERCENTILE(value, 0.25) FROM events")
    assert spec.agg == "PERCENTILE" and not spec.approx and spec.q == 0.25
    # APPROX_PERCENTILE(col, q, pct): q stays with the aggregate, pct routes
    spec = parse_query("SELECT APPROX_PERCENTILE(l_extendedprice, 0.75, 20) FROM lineitem")
    assert spec.agg == "PERCENTILE" and spec.approx
    assert spec.q == 0.75 and spec.sample_pct == 20.0
    # a second argument on any other aggregate is outside the grammar
    assert parse_query("SELECT SUM(l_extendedprice, 0.9) FROM lineitem") is None
    # q outside (0, 1): NOT an error — falls through to spark.sql where
    # native percentile handles (or natively rejects) it
    assert parse_query("SELECT PERCENTILE(value, 1.5) FROM events") is None
    # lowercase percentile is Spark's native interpolating builtin —
    # never intercepted by the plain (non-APPROX) dialect path
    assert parse_query("SELECT percentile(value, 0.25) FROM events") is None
    # ... but inside APPROX(...) the user opted into the dialect
    spec = parse_query("SELECT APPROX(percentile(value, 0.25)) FROM events")
    assert spec is not None and spec.agg == "PERCENTILE" and spec.approx


def test_engine_percentile(engine):
    import pytest

    res = engine.run(
        "SELECT APPROX(PERCENTILE(l_extendedprice, 0.9)) FROM lineitem",
        sample_pct=20,
    )
    assert res.ci_lower <= res.value <= res.ci_upper
    assert res.method == "quantile" and res.samples_used > 0
    exact = engine.run("SELECT PERCENTILE(l_extendedprice, 0.9) FROM lineitem")
    assert exact.status.name == "EXACT"
    # the approximate CI should cover the exact p90, and p90 > median
    assert res.ci_lower <= exact.value <= res.ci_upper
    med = engine.run("SELECT PERCENTILE(l_extendedprice, 0.5) FROM lineitem")
    assert med.value < exact.value
    # grouped percentile: exact per-group p90 via the same machinery
    grouped = engine.run(
        "SELECT PERCENTILE(value, 0.9) FROM events GROUP BY event_type"
    )
    assert grouped.status.name == "EXACT"
    rows = {r["event_type"]: r["value_q"] for r in grouped.df.collect()}
    assert len(rows) == 5 and all(v is not None for v in rows.values())


def test_native_percentile_passthrough(engine):
    """Regression (round-4 advisory): valid native Spark SQL that the
    dialect grammar happens to shadow must still run exact via
    passthrough — q = 1.0 (outside the dialect's (0,1)) and lowercase
    percentile (Spark's interpolating builtin)."""
    res = engine.run("SELECT percentile(value, 1.0) AS p FROM events")
    assert res.method == "spark_sql"
    assert res.df.collect()[0]["p"] is not None
    res2 = engine.run("SELECT PERCENTILE(value, 1.0) AS p FROM events")
    assert res2.method == "spark_sql"
    # lowercase percentile interpolates (native), the dialect's
    # order-statistic does not — passthrough must preserve native values
    import pyspark.sql.functions as F  # noqa: N812

    native = (
        engine.catalog.table("events")
        .agg(F.expr("percentile(value, 0.25)").alias("p"))
        .collect()[0]["p"]
    )
    res3 = engine.run("SELECT percentile(value, 0.25) AS p FROM events")
    assert res3.method == "spark_sql"
    assert res3.df.collect()[0]["p"] == native


def test_method_selection():
    # F3 heuristics (enhanced_aqe_cli.py:116-131)
    assert select_method("SUM", 200_000, False) == "revolutionary"
    assert select_method("SUM", 50_000, False) == "clt"
    assert select_method("AVG", 200_000, False) == "random"
    assert select_method("COUNT", 1_000, True) == "parallel"
    assert set(METHODS) == {"random", "clt", "block", "adaptive", "parallel", "revolutionary", "bootstrap", "pps", "blb", "hll", "chao1", "kmv", "outlier", "priority", "ddsketch", "twostage", "poststrat", "regaux"}


def test_tablesample_routes_to_sampled_estimation():
    from approximatequeryengine_spark.frontend.dialect import parse_query

    spec = parse_query(
        "SELECT SUM(l_extendedprice) FROM lineitem TABLESAMPLE (10 PERCENT)"
    )
    assert spec is not None and spec.approx and spec.sample_pct == 10.0
    assert spec.table == "lineitem"
    # WHERE and GROUP BY survive the rewrite.
    spec2 = parse_query(
        "SELECT AVG(value) FROM events TABLESAMPLE (20 PERCENT) "
        "WHERE value > 5 GROUP BY event_type"
    )
    assert spec2 is not None and spec2.sample_pct == 20.0
    assert spec2.where == "value > 5" and spec2.group_by == "event_type"
    # Explicit APPROX_SUM pct wins over TABLESAMPLE pct.
    spec3 = parse_query(
        "SELECT APPROX_SUM(l_quantity, 5) FROM lineitem TABLESAMPLE (50 PERCENT)"
    )
    assert spec3 is not None and spec3.sample_pct == 5.0


def test_tablesample_complex_query_falls_through():
    from approximatequeryengine_spark.frontend.dialect import parse_query

    assert (
        parse_query(
            "SELECT a, b FROM t TABLESAMPLE (10 PERCENT) JOIN u ON t.x = u.x"
        )
        is None
    )


def test_tablesample_end_to_end(spark):
    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run("SELECT SUM(l_extendedprice) FROM lineitem TABLESAMPLE (10 PERCENT)")
    assert r.method != "spark_sql" and r.fraction == 0.10
    exact = eng.run("SELECT SUM(l_extendedprice) FROM lineitem")
    assert abs(r.value - exact.value) / exact.value < 0.15
    assert r.ci_lower <= r.value <= r.ci_upper


def test_bootstrap_method_end_to_end(spark):
    import pytest

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
        method="bootstrap",
        compare=True,
    )
    assert r.method == "bootstrap"
    assert r.ci_lower <= r.groups["__exact__"] <= r.ci_upper
    # Same deterministic sample as the closed-form path → same estimate.
    ht = eng.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem", sample_pct=10
    )
    assert r.value == pytest.approx(ht.value, rel=1e-6)
    with pytest.raises(ValueError):
        eng.run("SELECT APPROX(AVG(l_quantity)) FROM lineitem", method="bootstrap")


def test_pps_method_end_to_end(spark):
    import pytest

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
        method="pps",
        sample_pct=10,
        compare=True,
    )
    assert r.method == "pps"
    assert r.ci_lower <= r.groups["__exact__"] <= r.ci_upper
    with pytest.raises(ValueError):
        eng.run("SELECT APPROX(AVG(l_quantity)) FROM lineitem", method="pps")


def test_confidence_level_widens_ci(spark):
    """Higher confidence → wider CI; the z quantile must track the
    requested level (reference's --confidence flag)."""
    import pytest

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    q = "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem"
    r90 = eng.run(q, sample_pct=10, confidence=0.90)
    r99 = eng.run(q, sample_pct=10, confidence=0.99)
    assert r90.value == r99.value  # same deterministic sample
    w90 = r90.ci_upper - r90.ci_lower
    w99 = r99.ci_upper - r99.ci_lower
    # z(0.99)/z(0.90) = 2.576/1.645 ≈ 1.566 (integer-margin rounding
    # perturbs the ratio by <1 part in 1e5 at these magnitudes)
    assert w99 / w90 == pytest.approx(2.5758293035489004 / 1.6448536269514722, rel=1e-3)
    # Reported level is CAPPED by the V5 small-sample heuristic, never
    # raised to the requested level (a 587-row sample reports ≤0.90
    # regardless of the z used for the bounds).
    from approximatequeryengine_spark.result import heuristic_confidence

    assert r99.confidence_level == min(0.99, heuristic_confidence(r99.samples_used))
    assert r90.confidence_level <= 0.90
    with pytest.raises(ValueError, match="confidence"):
        eng.run(q, confidence=1.5)


def test_grouped_bootstrap_via_engine(spark):
    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run(
        "SELECT APPROX(SUM(value)) FROM events GROUP BY event_type",
        method="bootstrap",
        sample_pct=20,
    )
    rows = {x["event_type"]: x for x in r.df.collect()}
    assert len(rows) == 5
    for x in rows.values():
        assert x["ci_lower"] <= x["sum_value"] <= x["ci_upper"]


def test_blb_method_via_engine(spark):
    import pytest

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run("SELECT APPROX(SUM(l_extendedprice)) FROM lineitem", method="blb")
    assert r.value is not None and r.ci_lower < r.value < r.ci_upper
    with pytest.raises(ValueError, match="blb"):
        eng.run(
            "SELECT APPROX(SUM(value)) FROM events GROUP BY event_type",
            method="blb",
        )


def test_count_distinct_parse_and_fallback():
    from approximatequeryengine_spark.frontend.dialect import parse_query

    s = parse_query("SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem")
    assert s and s.distinct and s.agg == "COUNT" and s.approx
    s2 = parse_query("SELECT COUNT(DISTINCT x) FROM t WHERE a > 1")
    assert s2 and s2.distinct and not s2.approx and s2.where == "a > 1"
    # DISTINCT with any other aggregate is outside the dialect
    assert parse_query("SELECT SUM(DISTINCT x) FROM t") is None


def test_count_distinct_via_engine(spark):
    """Round 3: APPROX(COUNT(DISTINCT col)) routes — portable HLL by
    default (sketch-SE interval), Chao1 when a sample_pct is given,
    exact countDistinct without the APPROX marker."""
    import pytest

    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    exact = eng.run("SELECT COUNT(DISTINCT l_partkey) FROM lineitem")
    assert exact.method == "exact" and exact.value == exact.samples_used

    hll = eng.run("SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem")
    assert hll.method == "hll"
    assert hll.ci_lower < hll.value < hll.ci_upper
    assert abs(hll.value / exact.value - 1.0) < 0.45  # m=64 → ~13% SE

    ch = eng.run(
        "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem", sample_pct=30
    )
    assert ch.method == "chao1"
    assert ch.samples_used <= exact.value  # observed distinct in sample
    assert ch.value >= ch.samples_used  # Chao1 only corrects UP

    with pytest.raises(ValueError, match="hll.*chao1|chao1.*hll"):
        eng.run(
            "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem",
            method="random",
        )
    grouped = eng.run(
        "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem GROUP BY l_returnflag",
        sample_pct=30,
    )
    assert grouped.method == "chao1"
    grows = grouped.df.collect()
    assert len(grows) == 3
    exact_rows = {
        r["l_returnflag"]: r["count_distinct"]
        for r in eng.run(
            "SELECT COUNT(DISTINCT l_partkey) FROM lineitem GROUP BY l_returnflag"
        ).df.collect()
    }
    for r in grows:
        assert r["d_chao1"] >= r["d_obs"]  # Chao1 only corrects UP
        assert r["d_obs"] <= exact_rows[r["l_returnflag"]]
    with pytest.raises(ValueError, match="chao1"):
        eng.run(
            "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem GROUP BY l_returnflag",
            method="hll",
        )


def test_grouped_adaptive_via_engine(spark):
    """Round 3: method='clt' with GROUP BY escalates until the worst
    group's relative CI half-width meets the error budget (previously
    grouped queries silently ran at a fixed fraction)."""
    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.01")
    r = eng.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem GROUP BY l_returnflag",
        method="clt",
        error_pct=2.0,
    )
    assert r.method == "clt" and r.iterations >= 1
    rows = r.df.collect()
    assert len(rows) == 3
    for row in rows:
        est = row["sum_l_extendedprice"]
        half = (row["ci_upper"] - row["ci_lower"]) / 2.0
        # converged (or hit fraction 1.0, where the CI is still honest)
        assert half <= 0.021 * est or r.fraction == 1.0, (row, r.fraction)


def test_tablesample_works_with_new_aggregates(spark):
    """TABLESAMPLE (p PERCENT) must route the round-3 aggregates
    (PERCENTILE / STDDEV / CORR) through their sampled estimators."""
    from approximatequeryengine_spark import AQEngine

    eng = AQEngine(spark, "/root/testdata/sf0.001")
    r = eng.run(
        "SELECT STDDEV(l_extendedprice) FROM lineitem TABLESAMPLE (20 PERCENT)"
    )
    assert r.method == "moment" and r.ci_lower <= r.value <= r.ci_upper
    r2 = eng.run(
        "SELECT PERCENTILE(l_extendedprice, 0.9) FROM lineitem TABLESAMPLE (20 PERCENT)"
    )
    assert r2.method == "quantile" and r2.ci_lower <= r2.value <= r2.ci_upper
    r3 = eng.run(
        "SELECT CORR(l_quantity, l_extendedprice) FROM lineitem TABLESAMPLE (20 PERCENT)"
    )
    assert r3.method == "fisher_z" and r3.ci_lower <= r3.value <= r3.ci_upper


def test_count_distinct_kmv_route(engine_med):
    """APPROX(COUNT(DISTINCT col)) with method='kmv' runs the bottom-k
    sketch: estimate near truth (2000), covering CI, k samples used."""
    r = engine_med.run(
        "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem", method="kmv"
    )
    assert r.method == "kmv"
    assert r.ci_lower <= 2000 <= r.ci_upper
    assert abs(r.value - 2000) / 2000 < 0.15
    assert r.samples_used == 256
    # the requested confidence must reach the sketch's z (a 99% interval
    # is strictly wider than the default 95% one)
    r99 = engine_med.run(
        "SELECT APPROX(COUNT(DISTINCT l_partkey)) FROM lineitem",
        method="kmv",
        confidence=0.99,
    )
    assert (r99.ci_upper - r99.ci_lower) > (r.ci_upper - r.ci_lower)


def test_method_priority_sum(engine, duck):
    """APPROX(SUM(x)) method='priority': DLT top-k estimate of the
    (possibly WHERE-filtered) sum; exact when k >= N (1500 orders at
    sf0.001 < k=2048 → τ=0 degenerate case)."""
    res = engine.run(
        "SELECT APPROX(SUM(o_totalprice)) FROM orders", method="priority"
    )
    exact = duck.execute("SELECT round(sum(o_totalprice), 2) FROM orders").fetchone()[0]
    assert res.method == "priority"
    assert abs(res.value - exact) < 0.01  # k covers the universe -> exact


def test_method_twostage_sum(engine, duck):
    """APPROX(SUM(x)) method='twostage': two-stage cluster sampling
    (blocks, then rows) — CI present, covers the exact total on the
    fixture's deterministic sample, n_samples ≈ f1·f2·N, and the
    non-SUM shapes are rejected."""
    import pytest as _pytest

    res = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem", method="twostage"
    )
    exact = duck.execute(
        "SELECT sum(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert res.method == "twostage"
    assert res.ci_lower <= exact <= res.ci_upper
    assert 0.04 * 6000 < res.samples_used < 0.25 * 6000  # ~12.5% of rows
    with _pytest.raises(ValueError, match="SUM only"):
        engine.run(
            "SELECT APPROX(AVG(l_extendedprice)) FROM lineitem",
            method="twostage",
        )
    # Round-8: one GROUP BY column routes to the grouped estimator;
    # per-group estimates sum exactly to the global one (both are
    # 8·Σ block partials over the same deterministic sample).
    gres = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem "
        "GROUP BY l_returnflag",
        method="twostage",
    )
    rows = gres.df.collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    assert all(r["ci_lower"] <= r["sum_l_extendedprice"] <= r["ci_upper"] for r in rows)
    total = sum(r["sum_l_extendedprice"] for r in rows)
    assert abs(total - res.value) < 0.05  # 2-cent rounding per group


def test_method_ddsketch_percentile(engine, duck):
    """APPROX(PERCENTILE(x, 0.9)) method='ddsketch': guaranteed
    α=0.01 relative error vs the rank item; confidence 1.0."""
    res = engine.run(
        "SELECT APPROX(PERCENTILE(o_totalprice, 0.9)) FROM orders",
        method="ddsketch",
    )
    n = duck.execute(
        "SELECT count(*) FROM orders WHERE o_totalprice > 0"
    ).fetchone()[0]
    rank = int(0.9 * (n - 1)) + 1
    exact = duck.execute(
        "SELECT o_totalprice FROM orders WHERE o_totalprice > 0 "
        "ORDER BY o_totalprice LIMIT 1 OFFSET ?", [rank - 1]
    ).fetchone()[0]
    assert res.method == "ddsketch"
    assert res.confidence_level == 1.0
    assert abs(res.value - exact) / exact <= 0.01 + 1e-9
    assert res.ci_lower <= exact <= res.ci_upper


def test_method_ddsketch_rejects_group_by(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ddsketch"):
        engine.run(
            "SELECT APPROX(MEDIAN(o_totalprice)) "
            "FROM orders GROUP BY o_orderpriority",
            method="ddsketch",
        )


def test_engine_advise_surface(engine):
    """engine.advise → one-row profile whose recommendation is a valid
    registered method usable directly in run(method=...)."""
    row = engine.advise("lineitem", "l_extendedprice").collect()[0]
    assert row["recommended_method"] in METHODS
    res = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
        method=row["recommended_method"],
        sample_pct=10,
    )
    assert res.value is not None


def test_method_auto_uses_advisor_for_global_sum(engine):
    """method='auto' (round 5): a global SUM routes through the
    measured-moment advisor — the executed method equals the advisor's
    recommendation and the evidence row rides the result for --explain
    surfaces."""
    want = engine.advise("lineitem", "l_extendedprice").collect()[0]
    res = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
        method="auto",
        sample_pct=10,
    )
    assert res.method == want["recommended_method"]
    a = res.groups["__advisor__"]
    assert a["n"] == want["n"] and a["cv2"] == want["cv2"]
    assert res.value is not None


def test_method_auto_falls_back_to_static_ladder(engine):
    """Shapes the advisor doesn't profile (AVG, GROUP BY) fall back to
    the reference's static F3 ladder — same selection as method=None,
    no advisor evidence attached."""
    res = engine.run(
        "SELECT APPROX(AVG(l_extendedprice)) FROM lineitem",
        method="auto",
        sample_pct=10,
    )
    assert res.method == "random"  # F3: AVG → random
    assert "__advisor__" not in res.groups
    grouped = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem GROUP BY l_returnflag",
        method="auto",
        sample_pct=10,
    )
    assert grouped.method == "parallel"  # F3: GROUP BY → parallel
    assert "__advisor__" not in grouped.groups


def test_explain_auto_surface(engine):
    """engine.explain_auto: advisor source + evidence for global SUM,
    static source for other shapes, ValueError on non-dialect SQL."""
    import pytest as _pytest

    info = engine.explain_auto("SELECT APPROX(SUM(l_extendedprice)) FROM lineitem")
    assert info["source"] == "advisor" and info["method"] in METHODS
    assert info["evidence"]["recommended_method"] == info["method"]
    static = engine.explain_auto("SELECT APPROX(AVG(l_extendedprice)) FROM lineitem")
    assert static == {"method": "random", "source": "static", "evidence": None}
    # round-8: marker queries report the rewrite route + portable text
    rw = engine.explain_auto(
        "SELECT APPROX(SUM(l_extendedprice)) AS est FROM lineitem "
        "TABLESAMPLE (10 PERCENT) STRATIFY BY l_returnflag"
    )
    assert rw["method"] == "sql_rewrite" and rw["source"] == "rewriter"
    assert "aqe_exact" in rw["evidence"]["rewritten_sql"]
    with _pytest.raises(ValueError, match="could not parse"):
        engine.explain_auto("SELECT 1")


def test_method_priority_expression_key(engine, duck):
    """lineitem's unique key is an EXPRESSION (l_orderkey*8+l_linenumber);
    the priority route must accept it (F.expr, not F.col)."""
    res = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem", method="priority"
    )
    exact = duck.execute("SELECT sum(l_extendedprice) FROM lineitem").fetchone()[0]
    assert res.method == "priority"
    assert abs(res.value - exact) / exact < 0.15


def test_method_ddsketch_rejects_sum(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MEDIAN/PERCENTILE"):
        engine.run("SELECT APPROX(SUM(o_totalprice)) FROM orders", method="ddsketch")


def test_method_ddsketch_no_positive_values(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        engine.run(
            "SELECT APPROX(MEDIAN(o_totalprice)) FROM orders WHERE o_totalprice < 0",
            method="ddsketch",
        )


def test_method_poststrat_sum(engine, duck):
    """APPROX(SUM(x)) method='poststrat' with stratum_col=: CI covers
    exact; stratum_col is mandatory; non-global shapes rejected."""
    import pytest as _pytest

    res = engine.run(
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
        method="poststrat",
        stratum_col="l_returnflag",
        sample_pct=20,
    )
    exact = duck.execute("SELECT sum(l_extendedprice) FROM lineitem").fetchone()[0]
    assert res.method == "poststrat"
    assert res.ci_lower <= exact <= res.ci_upper
    with _pytest.raises(ValueError, match="stratum_col"):
        engine.run(
            "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem",
            method="poststrat",
        )
    # GROUP BY is supported since round 7 — but stratifying on the
    # output group itself is a no-op and must be rejected.
    with _pytest.raises(ValueError, match="must differ"):
        engine.run(
            "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem "
            "GROUP BY l_returnflag",
            method="poststrat",
            stratum_col="l_returnflag",
        )
    with _pytest.raises(ValueError, match="SUM only"):
        engine.run(
            "SELECT APPROX(AVG(l_extendedprice)) FROM lineitem",
            method="poststrat",
            stratum_col="l_returnflag",
        )


def test_method_regaux_sum(engine, duck):
    """APPROX(SUM(x)) method='regaux' with aux_column=: CI covers and
    is narrower than plain 'random' at the same fraction when the
    auxiliary is strongly correlated; aux_column is mandatory."""
    import pytest as _pytest

    q = "SELECT APPROX(SUM(o_totalprice)) FROM orders"
    res = engine.run(q, method="regaux", aux_column="o_totalprice", sample_pct=20)
    exact = duck.execute("SELECT sum(o_totalprice) FROM orders").fetchone()[0]
    assert res.method == "regaux"
    # the self-auxiliary collapses the CI to zero width on the cents
    # grid; the float exact sum can sit 1e-7 off it — one-cent slack
    assert res.ci_lower - 0.01 <= exact <= res.ci_upper + 0.01
    assert (res.ci_upper - res.ci_lower) < 1.0
    with _pytest.raises(ValueError, match="aux_column"):
        engine.run(q, method="regaux")


def test_stray_estimator_args_are_rejected(engine):
    """stratum_col/aux_column with a method that ignores them must
    raise, not silently run a different estimator than requested."""
    import pytest as _pytest

    q = "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem"
    with _pytest.raises(ValueError, match="poststrat"):
        engine.run(q, method="clt", stratum_col="l_returnflag")
    with _pytest.raises(ValueError, match="regaux"):
        engine.run(q, method="random", aux_column="l_quantity")
