"""Sampled stddev estimator (plans/variance.py) + its dialect route."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog
from approximatequeryengine_spark.plans.sampling import SamplingSpec
from approximatequeryengine_spark.plans.variance import (
    approx_stddev_ci,
    approx_stddev_ci_sql,
)
from tests.conftest import SF_DIR, assert_df_matches_sql

SPEC = SamplingSpec(design="uniform_hash", fraction=0.2, key="l_orderkey * 8 + l_linenumber")


@pytest.fixture(scope="module")
def lineitem(spark):
    return Catalog(spark, SF_DIR).table("lineitem")


def test_ci_covers_exact_stddev(spark, lineitem):
    exact = lineitem.agg(
        F.stddev_samp(F.col("l_extendedprice").cast("double")).alias("s")
    ).collect()[0]["s"]
    row = approx_stddev_ci(lineitem, "l_extendedprice", SPEC).collect()[0]
    assert row["ci_lower"] <= exact <= row["ci_upper"]
    # the point estimate itself lands within a few percent at 20%
    assert row["stddev"] == pytest.approx(exact, rel=0.10)
    assert 0 < row["ci_lower"] < row["ci_upper"]


def test_coverage_over_salts(spark, lineitem):
    """~95% nominal: across 12 independent sample draws (salts), at
    most 2 intervals may miss the true stddev."""
    exact = lineitem.agg(
        F.stddev_samp(F.col("l_extendedprice").cast("double")).alias("s")
    ).collect()[0]["s"]
    misses = 0
    for salt in range(12):
        spec = SamplingSpec(
            design="uniform_hash", fraction=0.15,
            key=SPEC.key, salt=salt,
        )
        row = approx_stddev_ci(lineitem, "l_extendedprice", spec).collect()[0]
        if not row["ci_lower"] <= exact <= row["ci_upper"]:
            misses += 1
    assert misses <= 2


def test_oracle_parity(spark, lineitem, duck):
    assert_df_matches_sql(
        approx_stddev_ci(lineitem, "l_extendedprice", SPEC),
        duck,
        approx_stddev_ci_sql("lineitem", "l_extendedprice", SPEC),
    )


def test_empty_sample_raises(spark):
    df = spark.range(0).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="empty sample"):
        approx_stddev_ci(df, "x", SamplingSpec(design="uniform_hash", fraction=0.5, key="x"))


def test_dialect_route(engine):
    res = engine.run("SELECT APPROX(STDDEV(l_extendedprice)) FROM lineitem", sample_pct=20)
    assert res.method == "moment"
    assert res.ci_lower <= res.value <= res.ci_upper
    exact = engine.run("SELECT STDDEV(l_extendedprice) FROM lineitem")
    assert exact.status.name == "EXACT"
    assert res.ci_lower <= exact.value <= res.ci_upper
    with pytest.raises(ValueError, match="GROUP BY"):
        engine.run("SELECT APPROX(STDDEV(value)) FROM events GROUP BY event_type")
    # still-unsupported aggregates keep raising the dialect error
    with pytest.raises(ValueError, match="APPROX dialect supports"):
        engine.run("SELECT APPROX(SKEWNESS(l_extendedprice)) FROM lineitem")


def test_corr_ci_covers_exact(spark, lineitem, duck):
    from approximatequeryengine_spark.plans.variance import (
        approx_corr_ci,
        approx_corr_ci_sql,
    )

    exact = lineitem.agg(
        F.corr(
            F.col("l_quantity").cast("double"),
            F.col("l_extendedprice").cast("double"),
        ).alias("r")
    ).collect()[0]["r"]
    row = approx_corr_ci(lineitem, "l_quantity", "l_extendedprice", SPEC).collect()[0]
    assert -1.0 <= row["ci_lower"] < row["ci_upper"] <= 1.0
    assert row["ci_lower"] <= exact <= row["ci_upper"]
    assert row["corr"] == pytest.approx(exact, abs=0.1)
    assert_df_matches_sql(
        approx_corr_ci(lineitem, "l_quantity", "l_extendedprice", SPEC),
        duck,
        approx_corr_ci_sql("lineitem", "l_quantity", "l_extendedprice", SPEC),
    )


def test_corr_dialect_route(engine):
    res = engine.run(
        "SELECT APPROX(CORR(l_quantity, l_extendedprice)) FROM lineitem",
        sample_pct=20,
    )
    assert res.method == "fisher_z"
    assert res.ci_lower <= res.value <= res.ci_upper
    exact = engine.run("SELECT CORR(l_quantity, l_extendedprice) FROM lineitem")
    assert exact.status.name == "EXACT"
    assert res.ci_lower <= exact.value <= res.ci_upper
    with pytest.raises(ValueError, match="CORR requires two columns"):
        engine.run("SELECT APPROX(CORR(l_quantity)) FROM lineitem")


def test_ab_diff_ci_covers_exact(spark, engine, duck):
    from approximatequeryengine_spark.plans.variance import (
        approx_ab_diff_ci,
        approx_ab_diff_ci_sql,
    )

    events = engine.catalog.table("events")
    spec = SamplingSpec(design="uniform_hash", fraction=0.5, key="event_id")
    exact = {
        r["event_type"]: r["m"]
        for r in events.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.avg(F.col("value").cast("double")).alias("m"))
        .collect()
    }
    true_diff = exact["purchase"] - exact["click"]
    row = approx_ab_diff_ci(
        events, "value", "event_type", "purchase", "click", spec
    ).collect()[0]
    assert row["ci_lower"] <= true_diff <= row["ci_upper"]
    assert row["ci_lower"] < row["diff"] < row["ci_upper"]
    assert row["n_a"] > 0 and row["n_b"] > 0
    # the arm means reconstruct from the shared center exactly
    assert row["diff"] == pytest.approx(row["mean_a"] - row["mean_b"], abs=1e-5)
    assert_df_matches_sql(
        approx_ab_diff_ci(events, "value", "event_type", "purchase", "click", spec),
        duck,
        approx_ab_diff_ci_sql(
            "events", "value", "event_type", "purchase", "click", spec
        ),
    )
