"""Wander-join pins.

What must hold:
- the walk estimate lands near the exact pair-sum and the CI covers
  it (deterministic walks → fixed, pinned accuracy);
- each walk touches exactly ONE partner row: walk count equals the
  sampled left count restricted to keys with partners (no pair
  fan-out), and the physical plan joins on (key, rank) — not key
  alone;
- the estimator is unbiased across hash families: the mean over
  several partner-pick salts tightens toward exact;
- the DuckDB oracle replays the walks exactly (driver parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog
from approximatequeryengine_spark.functions.hashing import (
    fraction_threshold,
    portable_hash_col,
)
from approximatequeryengine_spark.plans.wander import (
    wander_join_abs_gap,
    wander_join_abs_gap_sql,
)

from tests.conftest import SF_DIR_MED, _duck


@pytest.fixture(scope="module")
def events(spark):
    return Catalog(spark, SF_DIR_MED).table("events")


def _exact(con):
    return con.execute(
        "SELECT round(sum(abs(floor(c.value*100.0+0.5)"
        " - floor(p.value*100.0+0.5)))/100.0, 2) "
        "FROM events c JOIN events p ON c.user_id = p.user_id "
        "WHERE c.event_type='click' AND p.event_type='purchase'"
    ).fetchall()[0][0]


def test_estimate_covers_exact_and_matches_oracle(spark, events):
    con = _duck(SF_DIR_MED)
    row = wander_join_abs_gap(events).collect()[0]
    exact = _exact(con)
    assert abs(row["join_sum_value"] - exact) / exact < 0.15
    assert row["ci_lower"] <= exact <= row["ci_upper"]
    res = con.execute(wander_join_abs_gap_sql())
    names = [d[0] for d in res.description]
    oracle = dict(zip(names, res.fetchall()[0]))
    for c in row.asDict():
        assert oracle[c] == row[c], c


def test_one_partner_per_walk_no_fanout(spark, events):
    row = wander_join_abs_gap(events).collect()[0]
    # a walk exists for every SAMPLED click whose user has >=1 purchase
    thr = fraction_threshold(0.2)
    sampled_clicks = events.filter(
        (F.col("event_type") == "click")
        & (portable_hash_col(F.col("event_id")) < F.lit(thr))
    )
    users_with_purchase = events.filter(
        F.col("event_type") == "purchase"
    ).select("user_id").distinct()
    expected = sampled_clicks.join(users_with_purchase, "user_id").count()
    assert row["n_walks"] == expected
    # plan gate: the partner join keys on rank too, not user alone
    plan = wander_join_abs_gap(events)._jdf.queryExecution().executedPlan().toString()
    assert "rk" in plan and "pick" in plan


def test_mean_over_pick_salts_tightens(spark, events):
    import approximatequeryengine_spark.plans.wander as wj

    con = _duck(SF_DIR_MED)
    exact = float(_exact(con))
    single_errs, ests = [], []
    orig = wj.WALK_SALT
    try:
        for salt in (17, 29, 41):
            wj.WALK_SALT = salt
            v = wander_join_abs_gap(events).collect()[0]["join_sum_value"]
            ests.append(v)
            single_errs.append(abs(v - exact))
    finally:
        wj.WALK_SALT = orig
    mean_err = abs(sum(ests) / len(ests) - exact)
    assert mean_err <= max(single_errs)


def test_empty_left_side(spark, events):
    none = events.filter(F.col("event_type") == "no_such_type")
    row = wander_join_abs_gap(
        none.unionByName(events.filter(F.col("event_type") == "purchase"))
    ).collect()[0]
    assert row["n_walks"] == 0
    assert row["join_sum_value"] == 0.0


def test_hot_key_variance_does_not_overflow(spark):
    """A hot partner key makes x² exceed int64; the double-summed s2
    must stay finite and positive (a wrapped BIGINT sum would zero or
    negate the CI width)."""
    import pandas as pd

    n_r = 30_000
    purchases = pd.DataFrame(
        {
            "event_id": range(n_r),
            "user_id": [1] * n_r,
            "event_type": ["purchase"] * n_r,
            "value": [30_000.0] * n_r,
        }
    )
    clicks = pd.DataFrame(
        {
            "event_id": range(n_r, n_r + 40),
            "user_id": [1] * 40,
            "event_type": ["click"] * 40,
            "value": [0.01] * 40,
        }
    )
    events = spark.createDataFrame(pd.concat([purchases, clicks]))
    row = wander_join_abs_gap(events, fraction=0.5).collect()[0]
    assert row["n_walks"] > 0
    width = row["ci_upper"] - row["ci_lower"]
    assert width > 0  # overflow would collapse or negate it
    # per-walk x = |diff| * n_r ~ 9e10, x^2 ~ 8e21 > 2^63: the sum is
    # only representable in double
    assert row["join_sum_value"] > 0
