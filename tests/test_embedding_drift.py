"""Embedding-space drift monitor (operators/profiling.py)."""

import pytest

from approximatequeryengine_spark.operators.profiling import (
    embedding_drift_by_label,
)

from .conftest import SF_DIR


def test_single_label_is_perfectly_aligned(spark):
    rows = [(i, [0.1 * (d + 1) for d in range(4)], 0) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = embedding_drift_by_label(spark, df).collect()
    assert len(out) == 1
    # one label IS the corpus — cosine exactly 1
    assert out[0]["cosine_to_corpus"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["n_vecs"] == 20


def test_planted_drift_is_flagged(spark):
    base = [0.2, 0.1, -0.1, 0.3]
    rows = [(i, base, 0) for i in range(50)]
    # label 1 points the opposite way — the drifted shard
    rows += [(100 + i, [-v for v in base], 1) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r["cosine_to_corpus"] for r in
           embedding_drift_by_label(spark, df).collect()}
    assert out[0] > 0.99  # the majority direction dominates the corpus
    assert out[1] < -0.99  # the drifted label is anti-aligned


def test_fixture_labels_are_mutually_decorrelated(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = embedding_drift_by_label(spark, emb).collect()
    assert sum(r["n_vecs"] for r in out) == emb.count()
    # every label contributes to the corpus sum, so cosines are
    # positive-ish but well below 1 on the clustered fixture
    for r in out:
        assert -1.0 <= r["cosine_to_corpus"] <= 1.0
    assert any(r["cosine_to_corpus"] < 0.95 for r in out)


def test_null_and_empty_embeddings_invisible_to_both_engines(spark):
    """n_vecs counts vectors that CONTRIBUTE dimensions: a NULL or
    empty embedding yields no posexplode rows on the Spark side, so
    the oracle must not count it either (it filters them the same
    way). Cross-engine parity pinned on a micro-fixture that has both
    degenerate shapes."""
    import duckdb as _duckdb

    from approximatequeryengine_spark.operators.profiling import (
        embedding_drift_by_label_sql,
    )

    rows = [(i, [0.1, 0.2, 0.3, 0.4], 0) for i in range(10)]
    rows += [(100, None, 0), (101, [], 0), (102, None, 1)]
    rows += [(200 + i, [0.4, 0.3, 0.2, 0.1], 1) for i in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in embedding_drift_by_label(spark, df).collect()}
    assert got[0]["n_vecs"] == 10  # not 12: NULL + empty don't count
    assert got[1]["n_vecs"] == 5

    con = _duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    want = con.execute(embedding_drift_by_label_sql()).fetchall()
    assert [(r["label"], r["n_vecs"]) for r in
            sorted(got.values(), key=lambda r: r["label"])] == [
        (w[0], w[1]) for w in want
    ]
    for g, w in zip(sorted(got.values(), key=lambda r: r["label"]), want):
        assert g["cosine_to_corpus"] == pytest.approx(w[2], abs=1e-9)


def test_zero_vector_label_yields_null_not_crash(spark):
    rows = [(i, [0.1, 0.2, 0.3, 0.4], 0) for i in range(10)]
    rows += [(100 + i, [0.0, 0.0, 0.0, 0.0], 1) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in embedding_drift_by_label(spark, df).collect()}
    assert out[0]["cosine_to_corpus"] == pytest.approx(1.0, abs=1e-6)
    # a directionless (all-zero) shard has no cosine — NULL, not a
    # divide-by-zero and not a fake 0.0
    assert out[1]["cosine_to_corpus"] is None
    assert out[1]["n_vecs"] == 3
