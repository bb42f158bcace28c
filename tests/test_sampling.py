"""Sampling designs: determinism, cross-engine (DuckDB) reproducibility,
nestedness, and approximate fraction realization."""

import pytest

from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
    sampling_where_sql,
)

KEY = "l_orderkey * 8 + l_linenumber"


def _sample_keys(engine, spec):
    df = apply_sampling(engine.catalog.table("lineitem"), spec)
    return sorted(r[0] for r in df.selectExpr(f"{KEY} AS k").collect())


@pytest.mark.parametrize("design", ["uniform_hash", "systematic", "block", "stratified"])
def test_deterministic_and_oracle_match(engine, duck, design):
    spec = SamplingSpec(
        design=design,
        fraction=0.2,
        key=KEY,
        block_size=64,
        stratum_col="l_returnflag" if design == "stratified" else None,
        strata_fractions={"N": 0.3, "A": 0.1} if design == "stratified" else {},
    )
    keys1 = _sample_keys(engine, spec)
    keys2 = _sample_keys(engine, spec)
    assert keys1 == keys2, "same spec must produce identical samples"
    assert len(keys1) > 0

    where = sampling_where_sql(spec)
    duck_keys = sorted(
        r[0] for r in duck.execute(f"SELECT {KEY} FROM lineitem WHERE {where}").fetchall()
    )
    assert keys1 == duck_keys, f"{design}: Spark and DuckDB samples differ"


def test_nested_fractions(engine):
    small = set(_sample_keys(engine, SamplingSpec(fraction=0.05, key=KEY)))
    big = set(_sample_keys(engine, SamplingSpec(fraction=0.2, key=KEY)))
    assert small <= big, "uniform_hash samples must be nested in the fraction"


def test_realized_fraction(engine):
    total = engine.catalog.table("lineitem").count()
    n = len(_sample_keys(engine, SamplingSpec(fraction=0.1, key=KEY)))
    assert n / total == pytest.approx(0.1, rel=0.25)


def test_systematic_realized_probability():
    # Quirk Q2 fix: p=15% → step=7 → realized 1/7, not 0.15.
    spec = SamplingSpec(design="systematic", fraction=0.15, key=KEY)
    assert spec.realized_fraction() == pytest.approx(1.0 / 7.0)


def test_neyman_allocation(engine):
    # R14: fractions proportional to per-stratum stddev, clamped, and the
    # high-variance stratum gets the larger fraction.
    from approximatequeryengine_spark.plans.sampling import neyman_allocation

    df = engine.catalog.table("lineitem")
    fracs = neyman_allocation(df, "l_returnflag", "l_extendedprice", 0.05)
    assert set(fracs) == {"A", "N", "R"}
    for f in fracs.values():
        assert 0.005 <= f <= 1.0
    # Expected sample size ≈ total_fraction · N (within clamping slack).
    import pyspark.sql.functions as F

    counts = {r["l_returnflag"]: r["n"] for r in
              df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    expected = sum(counts[k] * fracs[k] for k in fracs)
    total = sum(counts.values())
    assert expected / total == pytest.approx(0.05, rel=0.15)


def test_bernoulli_reproducible_in_spark(engine):
    spec = SamplingSpec(design="bernoulli", fraction=0.1, seed=7, key=KEY)
    assert _sample_keys(engine, spec) == _sample_keys(engine, spec)


def test_congressional_allocation_protects_small_groups(engine):
    """Congress = max(house, senate): a band holding ~3.5% of the rows
    must get a much larger fraction than its proportional share, the
    big bands stay near-proportional, and the expected sample size
    stays ≈ the budget (normalization), within clamping slack."""
    import pyspark.sql.functions as F

    from approximatequeryengine_spark.plans.sampling import congressional_allocation

    df = engine.catalog.table("lineitem").withColumn(
        "band",
        F.expr(
            "CASE WHEN l_extendedprice >= 100000 THEN 'high' "
            "WHEN l_extendedprice >= 50000 THEN 'mid' ELSE 'low' END"
        ),
    )
    fracs = congressional_allocation(df, "band", 0.06)
    counts = {r["band"]: r["n"] for r in
              df.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    # the small band is boosted well beyond proportional
    assert counts["high"] / n < 0.10
    assert fracs["high"] > 3 * 0.06
    # large bands stay within [proportional, senate] bounds
    for k in ("low", "mid"):
        assert 0.005 <= fracs[k] <= 1.0
    # budget: Σ N_g·f_g ≈ f·N (allocation normalizes to the budget;
    # clamping can only shrink it)
    expected = sum(counts[k] * fracs[k] for k in fracs)
    assert expected / n == pytest.approx(0.06, rel=0.10)


def test_congressional_groupby_ci_covers_exact(engine_med, duck_med):
    """Every band's congressional-sample CI must cover the exact
    per-band sum at sf0.01 — including the small 'high' band that a
    proportional sample would starve."""
    from approximatequeryengine_spark.workload import QUERIES

    rows = {
        r["band"]: r
        for r in QUERIES["approx_groupby_sum_congress"](
            engine_med.spark, "/root/testdata/sf0.01"
        ).collect()
    }
    exact = dict(
        duck_med.execute(
            "SELECT CASE WHEN l_extendedprice >= 100000 THEN 'high' "
            "WHEN l_extendedprice >= 50000 THEN 'mid' ELSE 'low' END AS band, "
            "sum(l_extendedprice) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert set(rows) == set(exact) == {"high", "mid", "low"}
    for band, want in exact.items():
        assert rows[band]["ci_lower"] <= want <= rows[band]["ci_upper"], band
