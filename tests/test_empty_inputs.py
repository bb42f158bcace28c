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


def test_funnel_and_cohort_on_empty_events(spark):
    from approximatequeryengine_spark.operators.temporal import (
        cohort_retention,
        funnel_conversion,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").filter(F.lit(False))
    row = funnel_conversion(spark, events).collect()[0]
    assert row["n_users"] == 0 and row["n_full_funnel"] == 0
    assert cohort_retention(spark, events).collect() == []


def test_curation_new_ops_on_empty_docs(spark):
    from approximatequeryengine_spark.operators.curation import (
        dataset_split,
        mixture_plan,
        sample_per_source,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))
    assert dataset_split(spark, docs).collect() == []
    assert sample_per_source(spark, docs).collect() == []
    assert mixture_plan(spark, docs).collect() == []


def test_skew_profile_on_empty_table(spark):
    from approximatequeryengine_spark.operators.joins import profile_key_skew

    li = _empty_lineitem(spark)
    row = profile_key_skew(li, "l_suppkey").collect()[0]
    assert row["n_rows"] is None or row["n_rows"] == 0


def test_bloom_on_empty_dim_passes_nothing(spark):
    from approximatequeryengine_spark.plans.bloom import (
        bloom_build_words,
        bloom_probe_column,
    )

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    empty_dim = cust.filter(F.lit(False))
    words = [
        (r["word_idx"], r["word"])
        for r in bloom_build_words(empty_dim, "c_custkey").collect()
    ]
    assert words == []
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    passed = orders.filter(bloom_probe_column(words, F.col("o_custkey"))).count()
    assert passed == 0  # an empty filter admits nothing


def test_unigram_logprob_on_empty_docs(spark):
    from approximatequeryengine_spark.operators.text import unigram_logprob_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))
    assert unigram_logprob_stats(spark, docs).collect() == []


def test_ddsketch_on_empty_table(spark):
    """No positive values → no buckets → no quantile rows (and the
    grouped form likewise)."""
    from approximatequeryengine_spark.plans.ddsketch import (
        ddsketch_grouped_quantiles,
        ddsketch_quantiles,
    )

    li = _empty_lineitem(spark)
    assert ddsketch_quantiles(li, "l_extendedprice").collect() == []
    assert ddsketch_grouped_quantiles(li, "l_extendedprice", "l_returnflag").collect() == []


def test_priority_on_empty_table(spark):
    from approximatequeryengine_spark.plans.priority import (
        priority_grouped_sum,
        priority_sample_subset_sum,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(F.lit(False))
    row = priority_sample_subset_sum(
        orders, "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"),
        F.lit(True),
    ).collect()[0]
    assert row["n_sample"] == 0
    assert priority_grouped_sum(
        orders, "o_orderkey", "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"),
    ).collect() == []


def test_kmv_set_ops_on_empty_sides(spark):
    """Empty ∪ empty: zero counts, zero estimates, Jaccard 0 — no
    crash, no NULL poisoning."""
    from approximatequeryengine_spark.plans.distinct import kmv_set_ops

    li = _empty_lineitem(spark)
    row = kmv_set_ops(li, li, "l_partkey").collect()[0]
    assert row["c_union"] == 0
    assert row["jaccard"] == 0.0


def test_advisor_rejects_empty(spark):
    from approximatequeryengine_spark.plans.advisor import advise_method

    with pytest.raises(ValueError, match="no non-null"):
        advise_method(_empty_lineitem(spark), F.col("l_extendedprice"))


def test_elp_rejects_empty(spark):
    from approximatequeryengine_spark.plans.elp import elp_fraction_sweep

    with pytest.raises(ValueError, match="empty"):
        elp_fraction_sweep(
            _empty_lineitem(spark), "l_orderkey", F.col("l_extendedprice")
        )


def test_synopsis_build_rejects_empty_table(spark, tmp_path):
    """Empty base: an empty partitioned parquet would have no
    inferable schema, so the build fails loudly instead."""
    from approximatequeryengine_spark.plans.synopsis import synopsis_build

    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(F.lit(False))
    with pytest.raises(ValueError, match="no rows"):
        synopsis_build(
            spark, orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
            str(tmp_path / "syn"), "o_orderpriority", "o_orderkey",
        )


def test_kmv_distinct_where_on_empty_fact(spark):
    """Empty fact side: zero counts and ZERO (not NULL) estimates."""
    from approximatequeryengine_spark.plans.distinct import kmv_distinct_where

    li = _empty_lineitem(spark)
    part = spark.read.parquet(f"{SF}/part.parquet")
    row = kmv_distinct_where(
        li, "l_partkey", part, "p_partkey", F.col("p_retailprice") > 970.0
    ).collect()[0]
    assert row["est_distinct"] == 0
    assert row["n_match"] == 0
    assert row["est_distinct_where"] == 0


def test_pagerank_empty_and_single_token_corpora(spark):
    """No co-occurrence edges (empty corpus, or every doc a single
    token) must yield an empty result, never a ZeroDivisionError."""
    from approximatequeryengine_spark.operators.graph import token_pagerank_topk

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    empty = spark.createDataFrame([], schema)
    assert token_pagerank_topk(spark, empty).count() == 0
    singles = spark.createDataFrame(
        [(1, "alpha", "en", "s", 5), (2, "beta", "en", "s", 4)], schema
    )
    assert token_pagerank_topk(spark, singles).count() == 0
