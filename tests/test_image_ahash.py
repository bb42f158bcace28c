"""Image aHash near-dup clustering (operators/multimodal.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.media import decode_png, encode_png
from approximatequeryengine_spark.operators.multimodal import (
    _ahash_groups,
    image_ahash_clusters,
)

from .conftest import SF_DIR


def _ahash(pix: np.ndarray) -> int:
    flat = pix.reshape(-1).astype(np.int64)
    bits = (flat * 64 > flat.sum()).astype(np.int64)
    return int((bits << np.arange(64)).sum())


def _synthetic_pix(doc_id: int, n_groups: int) -> np.ndarray:
    idx = np.arange(64, dtype=np.int64)
    g = doc_id % n_groups
    c = (doc_id // n_groups) % 2
    return ((g * 31 + idx * 7) % 255 + c).astype(np.uint8).reshape(8, 8)


def test_brightness_shift_is_hash_invariant_but_not_byte_identical():
    n_groups = 16
    for g in (0, 3, 11):
        a = _synthetic_pix(g, n_groups)  # c = 0
        b = _synthetic_pix(g + n_groups, n_groups)  # same group, c = 1
        assert not np.array_equal(a, b)  # genuinely different pixels
        pa, pb = encode_png(a, filter_type=0), encode_png(b, filter_type=2)
        assert pa != pb  # different bytes on disk
        da, db = decode_png(pa), decode_png(pb)
        assert _ahash(da) == _ahash(db)  # same perceptual signature


def test_distinct_groups_rarely_collide():
    n_groups = 64
    hashes = {_ahash(_synthetic_pix(g, n_groups)) for g in range(n_groups)}
    # Collisions are possible (the oracle counts them identically) but
    # the signature must separate most groups or clustering is vacuous.
    assert len(hashes) > n_groups * 0.8


def test_histogram_accounts_for_every_image(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hist = image_ahash_clusters(spark, docs).collect()
    assert sum(r["n_images"] for r in hist) == docs.count()
    assert all(r["n_images"] == r["cluster_size"] * r["n_clusters"] for r in hist)
    # The planted structure: every cluster holds at least one full
    # group (~8 docs at any SF, since n_groups scales with the corpus).
    assert min(r["cluster_size"] for r in hist) >= 2


def test_group_scaling_keeps_clusters_bounded():
    assert _ahash_groups(500) == 62
    assert _ahash_groups(50_000) == 6_250
    assert _ahash_groups(40) == 16  # floor for tiny corpora
