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

from approximatequeryengine_spark.operators import ensure_parallelism
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
    docs = ensure_parallelism(docs)
    feats = extract_blob_features(spark, make_blob_table(docs))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("payload_len").alias("total_bytes"),
        F.max("payload_len").alias("max_bytes"),
        F.sum("checksum32").alias("checksum_sum"),
    )


def resize_media(payload: bytes, media_type: str, width: int, height: int):  # pragma: no cover - stub
    """Real resize (PIL.Image.resize / ffmpeg scale) — unavailable in
    this container by design; the Spark-side plumbing to call it is
    ``extract_blob_features``-shaped (mapInPandas over bounded Arrow
    batches)."""
    raise NotImplementedError(
        "media resizing requires image codecs not present in this environment"
    )


def video_frame_sample(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: each blob expands into its sampled
    frames via ``explode(sequence(...))`` — pure JVM row generation, no
    Python in the expansion. The per-frame "decoded feature" is a
    deterministic stand-in (md5 of payload + frame index, as the real
    frame decode needs codecs); the per-media-type rollup keeps the
    result driver-small. At scale the explode multiplies rows
    partition-locally (no shuffle until the final rollup)."""
    docs = ensure_parallelism(docs)
    blobs = make_blob_table(docs)
    # Fake "duration": payload_len % 5 + 1 frames per blob.
    n_frames = F.octet_length("payload") % 5 + 1
    frames = blobs.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1))
    )
    sig_hex = F.substring(
        F.md5(F.concat(F.col("payload"), F.encode(F.col("frame_idx").cast("string"), "utf-8"))),
        1, 8,
    )
    frames = frames.withColumn("frame_sig", F.conv(sig_hex, 16, 10).cast("long"))
    return frames.groupBy("media_type").agg(
        F.countDistinct("doc_id").alias("n_videos"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_sig").alias("sig_sum"),
    )


def video_frame_sample_sql() -> str:
    return """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       count(DISTINCT doc_id) AS n_videos,
       count(*) AS n_frames,
       sum(('0x' || substring(md5(text || CAST(g AS VARCHAR)), 1, 8))::BIGINT) AS sig_sum
FROM (SELECT doc_id, text,
             unnest(generate_series(0, octet_length(encode(text)) % 5)) AS g
      FROM documents) frames
GROUP BY 1
"""


def blob_feature_stats_sql() -> str:
    return """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       count(*) AS n_blobs,
       sum(octet_length(encode(text))) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       sum(('0x' || substring(md5(text), 1, 8))::BIGINT) AS checksum_sum
FROM documents GROUP BY 1
"""
