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
       CAST(sum(('0x' || substring(md5(text || CAST(g AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS sig_sum
FROM (SELECT doc_id, text,
             unnest(generate_series(0, octet_length(encode(text)) % 5)) AS g
      FROM documents) frames
GROUP BY 1
"""


def blob_feature_stats_sql() -> str:
    return """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       count(*) AS n_blobs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       CAST(sum(('0x' || substring(md5(text), 1, 8))::BIGINT) AS BIGINT) AS checksum_sum
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Real byte-level header parsing (no codecs needed): PNG IHDR and WAV
# RIFF/fmt are fixed-layout structs. The blob GENERATOR embeds metadata
# as pure functions of doc_id; the PARSER recovers them from the bytes
# alone — so a DuckDB oracle computed arithmetically from doc_id
# certifies that generation and parsing are exact inverses end-to-end
# through the Arrow batch boundary.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_width(doc_id: int) -> int:
    return 16 + doc_id % 1024


def _png_height(doc_id: int) -> int:
    return 16 + (doc_id * 7) % 768


def _wav_rate(doc_id: int) -> int:
    return 8000 + (doc_id % 8) * 4000


def _wav_samples(doc_id: int) -> int:
    return 1000 + doc_id % 9000


def make_media_blob_table(docs: DataFrame) -> DataFrame:
    """Documents → blobs with REAL file headers: even doc_ids get a PNG
    signature + IHDR chunk, odd get a WAV RIFF/fmt/data header; the
    text bytes ride behind the header as filler 'pixel/sample' data."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                if doc_id % 2 == 0:
                    ihdr = struct.pack(
                        ">IIBBBBB", _png_width(doc_id), _png_height(doc_id),
                        8, 6, 0, 0, 0,
                    )
                    chunk = (
                        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
                        + b"\x00\x00\x00\x00"  # CRC placeholder
                    )
                    payloads.append(_PNG_SIG + chunk + body)
                else:
                    rate = _wav_rate(doc_id)
                    n = _wav_samples(doc_id)
                    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                    data_len = n * 2
                    payloads.append(
                        b"RIFF"
                        + struct.pack("<I", 36 + data_len)
                        + b"WAVE"
                        + b"fmt " + struct.pack("<I", 16) + fmt
                        + b"data" + struct.pack("<I", data_len)
                        + body
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def parse_media_metadata(blobs: DataFrame) -> DataFrame:
    """Recover (kind, width, height, sample_rate, duration_ms) by
    parsing the payload BYTES — signature sniffing + struct unpacking,
    no metadata column consulted."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds, widths, heights, rates, durs = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if b.startswith(_PNG_SIG) and b[12:16] == b"IHDR":
                    w, h = struct.unpack(">II", b[16:24])
                    kinds.append("png")
                    widths.append(w)
                    heights.append(h)
                    rates.append(None)
                    durs.append(None)
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    rate = struct.unpack("<I", b[24:28])[0]
                    bits = struct.unpack("<H", b[34:36])[0]
                    data_len = struct.unpack("<I", b[40:44])[0]
                    n = data_len // (bits // 8)
                    kinds.append("wav")
                    widths.append(None)
                    heights.append(None)
                    rates.append(rate)
                    durs.append(n * 1000.0 / rate)
                else:
                    kinds.append("unknown")
                    widths.append(None)
                    heights.append(None)
                    rates.append(None)
                    durs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kinds,
                    "width": pd.array(widths, dtype="Int64"),
                    "height": pd.array(heights, dtype="Int64"),
                    "sample_rate": pd.array(rates, dtype="Int64"),
                    "duration_ms": pd.array(durs, dtype="Float64"),
                }
            )

    return blobs.mapInPandas(
        batches,
        schema="doc_id long, kind string, width long, height long, "
        "sample_rate long, duration_ms double",
    )


def media_metadata_summary(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Generate headers → parse them back → aggregate per kind."""
    docs = ensure_parallelism(docs)
    meta = parse_media_metadata(make_media_blob_table(docs))
    return (
        meta.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
            F.round(F.avg("sample_rate"), 4).alias("avg_rate"),
            F.round(F.avg("duration_ms"), 4).alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


def media_metadata_summary_sql() -> str:
    """DuckDB oracle: the same aggregates from doc_id arithmetic alone
    (never sees the bytes) — matches iff the parser exactly inverts the
    generator."""
    return """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
       count(*) AS n,
       round(avg(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 1024 END), 4) AS avg_width,
       round(avg(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 768 END), 4) AS avg_height,
       round(avg(CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 8) * 4000 END), 4) AS avg_rate,
       round(avg(CASE WHEN doc_id % 2 = 1
                 THEN (1000 + doc_id % 9000) * 1000.0 / (8000 + (doc_id % 8) * 4000)
            END), 4) AS avg_duration_ms
FROM documents GROUP BY 1 ORDER BY 1
"""
