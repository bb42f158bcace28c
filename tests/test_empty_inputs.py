"""Empty-input robustness: operators must return empty/zero results,
never crash, when the table (or the sample) has no rows."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import AggSpec, approx_aggregate
from approximatequeryengine_spark.plans.sampling import SamplingSpec, apply_sampling

SF = "/root/testdata/sf0.001"


def _empty_lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").filter(F.lit(False))


def test_estimator_on_empty_table_global(spark):
    spec = SamplingSpec(design="uniform_hash", fraction=0.10,
                        key="l_orderkey * 8 + l_linenumber")
    sampled = apply_sampling(_empty_lineitem(spark), spec)
    row = approx_aggregate(sampled, AggSpec("sum", "l_extendedprice")).collect()[0]
    assert row["n_samples"] == 0
    assert row["sum_l_extendedprice"] is None  # SUM over nothing is NULL


def test_estimator_on_empty_table_grouped(spark):
    spec = SamplingSpec(design="uniform_hash", fraction=0.10,
                        key="l_orderkey * 8 + l_linenumber")
    sampled = apply_sampling(_empty_lineitem(spark), spec)
    rows = approx_aggregate(
        sampled, AggSpec("sum", "l_extendedprice"), group_by=["l_returnflag"]
    ).collect()
    assert rows == []  # no groups, no rows, no crash


def test_minhash_on_empty_docs(spark):
    from approximatequeryengine_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))
    assert minhash_lsh_pairs(spark, docs).collect() == []


def test_corpus_clean_on_empty_docs(spark):
    from approximatequeryengine_spark.operators.text import corpus_clean_pipeline

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))
    row = corpus_clean_pipeline(spark, docs).collect()[0]
    assert row["n_docs_kept"] == 0


def test_bootstrap_on_empty_table(spark):
    from approximatequeryengine_spark.plans.bootstrap import bootstrap_sum_ci

    spec = SamplingSpec(design="uniform_hash", fraction=0.10,
                        key="l_orderkey * 8 + l_linenumber")
    row = bootstrap_sum_ci(_empty_lineitem(spark), "l_extendedprice", spec).collect()[0]
    assert row["n_samples"] is None or row["n_samples"] == 0


def test_quantile_on_empty_sample_raises(spark):
    from approximatequeryengine_spark.plans.quantiles import approx_quantile_ci

    spec = SamplingSpec(design="uniform_hash", fraction=0.10,
                        key="l_orderkey * 8 + l_linenumber")
    with pytest.raises(ValueError, match="empty sample"):
        approx_quantile_ci(_empty_lineitem(spark), "l_extendedprice", 0.5, spec)


def test_round3_ops_on_empty_inputs(spark):
    """Round-3 operators: empty corpus → empty/zero results, no crash."""
    from approximatequeryengine_spark.operators.multimodal import (
        png_decode_stats,
        y4m_frame_extract_stats,
    )
    from approximatequeryengine_spark.operators.text import bm25_search_top10
    from approximatequeryengine_spark.plans.hll import (
        portable_hll_overlap,
        portable_hll_rollup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))
    assert bm25_search_top10(spark, docs).collect() == []
    assert png_decode_stats(spark, docs).collect() == []
    assert y4m_frame_extract_stats(spark, docs).collect() == []

    li = _empty_lineitem(spark)
    rows = portable_hll_rollup(li, "l_partkey", "l_returnflag").collect()
    # no groups survive, but the merged-global row exists and says 0
    assert [(r["level"], r["est_distinct"]) for r in rows] == [("merged_global", 0.0)]

    sides = spark.range(0).select(F.lit("a").alias("side"), F.col("id").alias("k"))
    ov = {r["level"]: r["est_distinct"] for r in portable_hll_overlap(sides).collect()}
    assert ov == {"side_a": 0.0, "side_b": 0.0, "union": 0.0, "intersection_est": 0.0}
