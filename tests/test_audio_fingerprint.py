"""Audio energy-contour fingerprint clustering (operators/multimodal.py)."""

import numpy as np

from approximatequeryengine_spark.functions.media import decode_wav, encode_wav
from approximatequeryengine_spark.operators.multimodal import (
    WAV_N,
    _ahash_groups,
    audio_fingerprint_clusters,
)

from .conftest import SF_DIR


def _samples(doc_id: int, n_groups: int) -> np.ndarray:
    idx = np.arange(WAV_N, dtype=np.int64)
    g = doc_id % n_groups
    amp = 1 + (doc_id // n_groups) % 2
    return (amp * (((g * 2654435761 + idx * 40503) % 65536) % 199 - 99)).astype(
        np.int16
    )


def _fingerprint(samples: np.ndarray) -> int:
    v = samples.reshape(-1).astype(np.int64)
    e = (v * v).reshape(-1, 2).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    return int((bits << np.arange(31)).sum())


def test_volume_scaling_is_fingerprint_invariant():
    n_groups = 16
    for g in (0, 5, 13):
        a = _samples(g, n_groups)  # amp = 1
        b = _samples(g + n_groups, n_groups)  # same group, amp = 2
        assert not np.array_equal(a, b)
        da, _ = decode_wav(encode_wav(a, 8000))
        db, _ = decode_wav(encode_wav(b, 16000))
        assert _fingerprint(da) == _fingerprint(db)
    # Arbitrary positive gain, not just the planted 2x: energy ratios
    # survive any k, so k=3 collapses to the same signature too.
    base = _samples(7, n_groups).astype(np.int64)
    assert _fingerprint((3 * base).astype(np.int16)) == _fingerprint(
        base.astype(np.int16)
    )


def test_distinct_groups_rarely_collide():
    n_groups = 128
    fps = {_fingerprint(_samples(g, n_groups)) for g in range(n_groups)}
    assert len(fps) > n_groups * 0.85


def test_histogram_accounts_for_every_clip(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hist = audio_fingerprint_clusters(spark, docs).collect()
    assert sum(r["n_clips"] for r in hist) == docs.count()
    # Planted structure: every cluster holds at least one whole group.
    assert min(r["cluster_size"] for r in hist) >= 2
    # Collisions merge at most a few groups (group size ~8 at any SF
    # because n_groups scales with the corpus).
    assert max(r["cluster_size"] for r in hist) <= 4 * (
        docs.count() // _ahash_groups(docs.count()) + 1
    )
