"""Portable Bloom-filter join pruning (plans/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.catalog import Catalog
from approximatequeryengine_spark.plans.bloom import (
    M_BITS,
    WORD_BITS,
    bloom_build_words,
    bloom_probe_column,
    bloom_prune_semi_join,
)
from tests.conftest import SF_DIR, assert_df_matches_sql


@pytest.fixture(scope="module")
def cat(spark):
    return Catalog(spark, SF_DIR)


def test_no_false_negatives(spark, cat):
    """Every true dim key must pass the probe — Bloom filters never
    have false negatives."""
    dim = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    words = [
        (r["word_idx"], r["word"])
        for r in bloom_build_words(dim, "c_custkey").collect()
    ]
    missed = dim.filter(
        ~bloom_probe_column(words, F.col("c_custkey"))
    ).count()
    assert missed == 0


def test_words_bounded_and_fp_rate(spark, cat):
    dim = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    words_df = bloom_build_words(dim, "c_custkey")
    assert words_df.count() <= M_BITS // WORD_BITS

    row = bloom_prune_semi_join(
        spark, cat.table("orders"), dim, "o_custkey", "c_custkey", "o_totalprice"
    ).collect()[0]
    # lossless: every true match survives the prune
    exact = (
        cat.table("orders")
        .join(
            dim.select(F.col("c_custkey").alias("o_custkey")),
            on="o_custkey",
            how="left_semi",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()[0]
    )
    assert row["n_exact"] == exact["n"]
    assert row["sum_measure"] == exact["s"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_exact"]
    # 4096 bits / 4 hashes over a few hundred keys: fp well under 20%
    assert 0.0 <= row["fp_rate"] < 0.2


def test_oracle_parity(spark, cat, duck):
    from approximatequeryengine_spark.plans.bloom import bloom_prune_semi_join_sql

    dim = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    sdf = bloom_prune_semi_join(
        spark, cat.table("orders"), dim, "o_custkey", "c_custkey", "o_totalprice"
    )
    assert_df_matches_sql(
        sdf,
        duck,
        bloom_prune_semi_join_sql(
            "orders", "customer", "o_custkey", "c_custkey", "o_totalprice",
            "c_mktsegment = 'BUILDING'",
        ),
    )


def test_probe_is_codegen_no_join(spark, cat):
    """The probe must stay a scan-level predicate: no extra join or
    exchange, no Python evaluation."""
    dim = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    words = [
        (r["word_idx"], r["word"])
        for r in bloom_build_words(dim, "c_custkey").collect()
    ]
    pruned = cat.table("orders").filter(
        bloom_probe_column(words, F.col("o_custkey"))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan
