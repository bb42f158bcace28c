"""Public-API surface for the persisted range indexes
(engine.build_range_index / engine.range_sum).

What must hold:
- 'aqpplus' indexes answer range sums with a CI covering the exact
  value and exact answers on block-aligned ranges;
- 'sampleseek' indexes route by selectivity (seek on narrow ranges,
  sample on wide) through the same one-call API;
- querying without an index raises a pointed error.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_MED, _duck

KEY_SQL = "datediff(o_orderdate, DATE '1970-01-01')"


def _exact(lo, hi):
    con = _duck(SF_DIR_MED)
    return con.execute(
        "SELECT round(coalesce(sum(floor(o_totalprice*100.0+0.5)),0)/100.0, 2) "
        "FROM orders WHERE date_diff('day', DATE '1970-01-01', o_orderdate) "
        f"BETWEEN {lo} AND {hi}"
    ).fetchall()[0][0]


def test_aqpplus_index_end_to_end(engine_med):
    engine_med.build_range_index("orders", KEY_SQL, "o_totalprice")
    row = engine_med.range_sum("orders", 8500, 10226).collect()[0]
    exact = _exact(8500, 10226)
    assert row["ci_lower"] <= exact <= row["ci_upper"]
    assert row["interior_rows"] > 0


def test_sampleseek_index_routes(engine_med):
    engine_med.build_range_index(
        "orders", KEY_SQL, "o_totalprice", kind="sampleseek"
    )
    narrow = engine_med.range_sum("orders", 9862, 9882).collect()[0]
    assert narrow["path"] == "seek"
    assert narrow["sum_value"] == _exact(9862, 9882)
    wide = engine_med.range_sum("orders", 9131, 10443).collect()[0]
    assert wide["path"] == "sample"
    assert wide["ci_lower"] <= _exact(9131, 10443) <= wide["ci_upper"]


def test_range_sum_without_index_raises(engine_med):
    with pytest.raises(ValueError, match="no range index registered"):
        engine_med.range_sum("lineitem", 0, 1)


def test_unknown_kind_raises(engine_med):
    with pytest.raises(ValueError, match="unknown range-index kind"):
        engine_med.build_range_index(
            "orders", KEY_SQL, "o_totalprice", kind="btree"
        )


def test_point_index_end_to_end(engine_med):
    """build_point_index + point_sum: exact equality aggregate through
    the bloom skip index, matching the plain filter."""
    engine_med.build_point_index("orders", "o_custkey", "o_totalprice")
    row = engine_med.point_sum("orders", 42).collect()[0]
    con = _duck(SF_DIR_MED)
    n, s = con.execute(
        "SELECT count(*), round(sum(floor(o_totalprice*100.0+0.5))/100.0, 2) "
        "FROM orders WHERE o_custkey = 42"
    ).fetchall()[0]
    assert row["n_rows"] == n > 0
    assert row["sum_value"] == s
    assert row["blocks_scanned"] <= row["blocks_total"]


def test_zorder_index_end_to_end(engine_med):
    """build_zorder_index + rect_sum: exact 2-D rectangle aggregate
    through the Morton layout, matching the plain filter."""
    engine_med.build_zorder_index(
        "lineitem",
        x_sql="datediff(l_shipdate, DATE '1970-01-01')",
        y_sql="l_partkey",
        value_sql="l_extendedprice",
    )
    row = engine_med.rect_sum("lineitem", 10013, 10104, 0, 99).collect()[0]
    con = _duck(SF_DIR_MED)
    n, s = con.execute(
        "SELECT count(*), round(sum(floor(l_extendedprice*100.0+0.5))/100.0, 2) "
        "FROM lineitem WHERE date_diff('day', DATE '1970-01-01', l_shipdate) "
        "BETWEEN 10013 AND 10104 AND l_partkey BETWEEN 0 AND 99"
    ).fetchall()[0]
    assert row["n_rows"] == n > 0
    assert row["sum_value"] == s
    assert row["blocks_scanned"] < row["blocks_total"]


def test_point_and_rect_without_index_raise(engine_med):
    with pytest.raises(ValueError, match="no point index"):
        engine_med.point_sum("customer", 1)
    with pytest.raises(ValueError, match="no zorder index"):
        engine_med.rect_sum("customer", 0, 1, 0, 1)
