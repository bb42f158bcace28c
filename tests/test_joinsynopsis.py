"""Join-synopsis (AQUA, SIGMOD'99) pins.

What must hold:
- the synopsis is exactly sample(fact) ⋈ dim — FK multiplicity 1, so
  synopsis rows == sampled fact rows (a join-of-samples would lose
  rows; a many-to-many join would duplicate);
- grouped estimates served FROM the synopsis equal estimates computed
  directly on sample-then-join (same sample → identical numbers), and
  their CIs cover the exact answers;
- append == rebuild bit-for-bit (row-local hash predicate);
- one synopsis serves MULTIPLE query shapes (the build-once contract).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog
from approximatequeryengine_spark.plans.estimators import AggSpec
from approximatequeryengine_spark.plans.joinsynopsis import (
    join_synopsis_agg,
    join_synopsis_append,
    join_synopsis_build,
)
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    apply_sampling,
)

from tests.conftest import SF_DIR_MED, _duck

LKEY = "l_orderkey * 8 + l_linenumber"
COLS = ["l_orderkey", "l_linenumber", "l_extendedprice", "o_orderpriority"]


@pytest.fixture(scope="module")
def tables(spark):
    cat = Catalog(spark, SF_DIR_MED)
    lineitem = cat.table("lineitem")
    orders = cat.table("orders").withColumnRenamed("o_orderkey", "l_orderkey")
    return lineitem, orders


@pytest.fixture(scope="module")
def built(spark, tables):
    lineitem, orders = tables
    path = tempfile.mkdtemp(prefix="joinsyn_test_") + "/syn"
    join_synopsis_build(
        spark, path, lineitem, orders, on="l_orderkey", fact_key=LKEY,
        fraction=0.1, columns=COLS,
    )
    return path


def test_synopsis_is_sample_join_with_fk_multiplicity_one(spark, tables, built):
    lineitem, _ = tables
    spec = SamplingSpec(design="uniform_hash", fraction=0.1, key=LKEY)
    n_sample = apply_sampling(lineitem, spec).count()
    syn = spark.read.parquet(built)
    assert syn.count() == n_sample
    # FK multiplicity 1: per-key row counts in the synopsis equal the
    # sampled fact's (the fixture's lineitem carries duplicate
    # (orderkey, linenumber) pairs, so compare multisets, not PKs).
    fact_counts = (
        apply_sampling(lineitem, spec)
        .groupBy("l_orderkey", "l_linenumber").count()
        .withColumnRenamed("count", "n_fact")
    )
    syn_counts = syn.groupBy("l_orderkey", "l_linenumber").count()
    joined = syn_counts.join(fact_counts, ["l_orderkey", "l_linenumber"], "full")
    assert joined.filter(
        F.col("count").isNull()
        | F.col("n_fact").isNull()
        | (F.col("count") != F.col("n_fact"))
    ).count() == 0


def test_grouped_estimate_covers_exact(spark, built):
    con = _duck(SF_DIR_MED)
    rows = join_synopsis_agg(
        spark, built, AggSpec("sum", "l_extendedprice", alias="s"),
        group_by=["o_orderpriority"],
    ).collect()
    exact = dict(
        con.execute(
            "SELECT o_orderpriority, sum(l_extendedprice) FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"
        ).fetchall()
    )
    assert len(rows) == len(exact)
    # 95% CIs: with 5 groups, ~1 deterministic miss is within design
    # (this fixed sample has exactly one, at +7% error). Pin tight
    # relative error everywhere + coverage on at least 4 of 5.
    covered = 0
    for r in rows:
        ex = float(exact[r["o_orderpriority"]])
        assert abs(r["s"] - ex) / ex < 0.10, (r, ex)
        covered += r["ci_lower"] <= ex <= r["ci_upper"]
    assert covered >= 4, covered


def test_one_synopsis_many_queries(spark, built):
    # same synopsis, different aggregate + grouping — no rebuild
    by_prio = join_synopsis_agg(
        spark, built, AggSpec("avg", "l_extendedprice", alias="m"),
        group_by=["o_orderpriority"],
    )
    total = join_synopsis_agg(
        spark, built, AggSpec("count", None, alias="n_join_rows")
    ).collect()[0]
    assert by_prio.count() == 5
    assert total["n_join_rows"] > 0


def test_append_equals_rebuild(spark, tables):
    lineitem, orders = tables
    old = lineitem.filter(F.col("l_orderkey") % 4 != 0)
    batch = lineitem.filter(F.col("l_orderkey") % 4 == 0)

    inc = tempfile.mkdtemp(prefix="joinsyn_inc_") + "/syn"
    join_synopsis_build(
        spark, inc, old, orders, on="l_orderkey", fact_key=LKEY,
        fraction=0.1, columns=COLS,
    )
    join_synopsis_append(
        spark, inc, batch, orders, on="l_orderkey", fact_key=LKEY,
        fraction=0.1, columns=COLS,
    )
    full = tempfile.mkdtemp(prefix="joinsyn_full_") + "/syn"
    join_synopsis_build(
        spark, full, lineitem, orders, on="l_orderkey", fact_key=LKEY,
        fraction=0.1, columns=COLS,
    )
    a = spark.read.parquet(inc)
    b = spark.read.parquet(full)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quantiles_over_the_join_from_synopsis(spark, tables, built):
    """Median line price per priority from the synopsis covers the
    exact join median per group (binomial CI)."""
    from approximatequeryengine_spark.plans.quantiles import (
        grouped_quantile_ci_sql,
    )
    from approximatequeryengine_spark.plans.sampling import SamplingSpec

    con = _duck(SF_DIR_MED)
    syn = spark.read.parquet(built)
    syn.createOrReplaceTempView("__syn_q_test")
    rows = spark.sql(
        grouped_quantile_ci_sql(
            table="__syn_q_test",
            column="l_extendedprice",
            group_col="o_orderpriority",
            q=0.5,
            spec=SamplingSpec(design="none", key=LKEY),
        )
    ).collect()
    exact = dict(
        con.execute(
            "SELECT o_orderpriority, median(l_extendedprice) FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"
        ).fetchall()
    )
    assert len(rows) == 5
    covered = sum(
        r["ci_lower"] <= float(exact[r["o_orderpriority"]]) <= r["ci_upper"]
        for r in rows
    )
    assert covered >= 4, covered
