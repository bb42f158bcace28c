"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed per-batch with ``mapInPandas`` (Arrow transfer).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``NotImplementedError`` unless
``allow_fake=True``); everything around it — schema, Arrow batching,
partition-parallel UDF execution, metadata extraction — is real and
tested. The fake feature extractor is deterministic (byte length +
md5-derived checksum via Python hashlib == Spark/DuckDB ``md5``), so
even the pandas-UDF path has an exact DuckDB oracle.

At scale: binary payloads ride in their own parquet column (columnar
pruning keeps metadata-only queries from touching bytes); the UDF is
per-partition with bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``), so memory is
O(batch), not O(partition).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_len", LongType()),
        StructField("checksum32", LongType()),
    ]
)


def make_blob_table(docs: DataFrame) -> DataFrame:
    """Documents → multimodal-shaped table: payload = utf-8 bytes of the
    text (stand-in for image/audio bytes), media_type metadata."""
    return docs.select(
        F.col("doc_id"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Real decode (PIL / soundfile / av) — unavailable in this
    container by design."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "environment; pass allow_fake=True for the deterministic stand-in"
    )


def extract_blob_features(
    spark: SparkSession, blobs: DataFrame, allow_fake: bool = True
) -> DataFrame:
    """Per-blob features via mapInPandas. ``allow_fake=False`` exercises
    the real-decoder path (raises NotImplementedError)."""
    if not allow_fake:
        # Surface the stub contract eagerly rather than inside executors.
        decode_media(b"", "image/png")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": payload.map(len).astype("int64"),
                    "checksum32": payload.map(
                        lambda b: int(hashlib.md5(b).hexdigest()[:8], 16)
                    ).astype("int64"),
                }
            )

    return blobs.mapInPandas(batches, schema=BLOB_SCHEMA)


def blob_feature_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """media_type → payload stats; the end-to-end mapInPandas query."""
    feats = extract_blob_features(spark, make_blob_table(docs))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("payload_len").alias("total_bytes"),
        F.max("payload_len").alias("max_bytes"),
        F.sum("checksum32").alias("checksum_sum"),
    )


def blob_feature_stats_sql() -> str:
    return """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       count(*) AS n_blobs,
       sum(octet_length(encode(text))) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       sum(('0x' || substring(md5(text), 1, 8))::BIGINT) AS checksum_sum
FROM documents GROUP BY 1
"""
