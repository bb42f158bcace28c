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
