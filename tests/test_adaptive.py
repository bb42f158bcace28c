"""Adaptive CLT executor: termination, realized error, status fields."""

from approximatequeryengine_spark.plans.adaptive import adaptive_aggregate, error_ladder
from approximatequeryengine_spark.plans.estimators import AggSpec
from approximatequeryengine_spark.plans.sampling import SamplingSpec
from approximatequeryengine_spark.result import ApproximationStatus

KEY = "l_orderkey * 8 + l_linenumber"


def test_error_ladder():
    # enhanced_aqe_cli.py:243-250
    assert error_ladder(0.5) == 0.20
    assert error_ladder(1.0) == 0.20
    assert error_ladder(2.0) == 0.15
    assert error_ladder(5.0) == 0.10
    assert error_ladder(10.0) == 0.05


def test_adaptive_converges_within_budget(engine_med, duck_med):
    df = engine_med.catalog.table("lineitem")
    res = adaptive_aggregate(
        df,
        AggSpec("avg", "l_extendedprice"),
        SamplingSpec(fraction=0.0, key=KEY),
        error_pct=2.0,
    )
    assert res.status == ApproximationStatus.STABLE
    assert res.relative_error_pct() <= 2.0
    exact = duck_med.execute("SELECT AVG(l_extendedprice) FROM lineitem").fetchone()[0]
    # Realized error should respect the CI (which the loop enforced).
    assert abs(res.value - exact) / exact * 100 <= 3 * 2.0
    assert res.iterations >= 1
    assert res.samples_used >= 50


def test_adaptive_escalates_on_tight_budget(engine):
    # sf0.001 (~6k rows) with a very tight budget → must escalate or hit
    # fraction=1.0.
    df = engine.catalog.table("lineitem")
    res = adaptive_aggregate(
        df,
        AggSpec("sum", "l_extendedprice"),
        SamplingSpec(fraction=0.0, key=KEY),
        error_pct=0.1,
    )
    assert res.iterations > 1 or res.fraction >= 1.0
    assert res.relative_error_pct() <= 0.1 or res.fraction == 1.0


def test_validators_and_status(engine_med):
    df = engine_med.catalog.table("lineitem")
    res = adaptive_aggregate(
        df,
        AggSpec("sum", "l_extendedprice"),
        SamplingSpec(fraction=0.0, key=KEY),
        error_pct=5.0,
        validators=3,
    )
    assert res.status in (ApproximationStatus.STABLE, ApproximationStatus.DRIFTING)
    assert 0.0 <= res.confidence_level <= 1.0


def test_insufficient_data(engine):
    df = engine.catalog.table("lineitem").filter("l_quantity < 0")  # empty
    res = adaptive_aggregate(
        df,
        AggSpec("avg", "l_extendedprice"),
        SamplingSpec(fraction=0.5, key=KEY),
        error_pct=5.0,
        max_iterations=2,
    )
    assert res.status == ApproximationStatus.INSUFFICIENT_DATA
