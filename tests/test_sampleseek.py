"""Sample+Seek router pins.

What must hold:
- the route follows the zone-stat selectivity estimate against the
  threshold: narrow range → seek, wide range → sample;
- the seek path's answer is EXACT (equals a direct aggregate) with a
  zero-width CI;
- the sample path's CI covers the exact answer;
- the selectivity estimate is honest: within the zone-granularity
  over-count of true selectivity (it counts whole overlapping zones);
- both paths share one output schema (router transparency).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog
from approximatequeryengine_spark.plans.sampleseek import sample_seek_range_sum
from approximatequeryengine_spark.sources.zonemap import zonemap_write

from tests.conftest import SF_DIR_MED, _duck


@pytest.fixture(scope="module")
def layout(spark):
    orders = Catalog(spark, SF_DIR_MED).table("orders").select(
        F.col("o_orderkey").alias("__rk"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("__cents"),
        F.col("o_orderdate"),
    )
    path = tempfile.mkdtemp(prefix="sseek_test_")
    zonemap_write(
        spark,
        orders,
        path,
        key=F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")),
        n_zones=64,
    )
    return path


def _exact(lo, hi):
    con = _duck(SF_DIR_MED)
    return con.execute(
        "SELECT round(coalesce(sum(floor(o_totalprice * 100.0 + 0.5)), 0)"
        "/100.0, 2), count(*) FROM orders "
        f"WHERE date_diff('day', DATE '1970-01-01', o_orderdate) "
        f"BETWEEN {lo} AND {hi}"
    ).fetchall()[0]


def test_narrow_range_routes_to_seek_and_is_exact(spark, layout):
    lo, hi = 9862, 9882
    row = sample_seek_range_sum(spark, layout, lo, hi, fraction=0.1).collect()[0]
    exact, n = _exact(lo, hi)
    assert row["path"] == "seek"
    assert row["sum_value"] == exact
    assert row["ci_lower"] == row["ci_upper"] == exact
    assert row["n_samples"] == n
    assert row["sel_est"] <= 0.05


def test_wide_range_routes_to_sample_and_ci_covers(spark, layout):
    lo, hi = 9131, 10443
    row = sample_seek_range_sum(spark, layout, lo, hi, fraction=0.1).collect()[0]
    exact, n = _exact(lo, hi)
    assert row["path"] == "sample"
    assert row["sel_est"] > 0.05
    assert row["ci_lower"] <= exact <= row["ci_upper"]
    assert 0 < row["n_samples"] < n  # it really sampled


def test_threshold_is_a_parameter(spark, layout):
    # force the wide range down the seek path: the router must obey
    # the caller's threshold, and the seek answer is exact regardless
    lo, hi = 9131, 10443
    row = sample_seek_range_sum(
        spark, layout, lo, hi, fraction=0.1, seek_threshold=1.0
    ).collect()[0]
    exact, n = _exact(lo, hi)
    assert row["path"] == "seek"
    assert row["sum_value"] == exact and row["n_samples"] == n


def test_selectivity_estimate_bounds_true_selectivity(spark, layout):
    # zone-granular overlap can only OVER-estimate: est >= true
    con = _duck(SF_DIR_MED)
    total = con.execute("SELECT count(*) FROM orders").fetchall()[0][0]
    for lo, hi in [(9862, 9882), (9131, 10443)]:
        row = sample_seek_range_sum(spark, layout, lo, hi).collect()[0]
        _, n = _exact(lo, hi)
        assert row["sel_est"] >= round(n / total, 4) - 1e-9, (lo, hi)
