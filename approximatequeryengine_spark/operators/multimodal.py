"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed per-batch with ``mapInPandas`` (Arrow transfer).

Decode is REAL for PNG, WAV, and Y4M video as of round 3 —
dependency-free codecs in ``functions/media.py`` (full PNG unfilter
incl. Paeth; 16-bit PCM WAV; uncompressed YUV4MPEG2 C420), used by
``png_decode_stats``/``wav_decode_stats``/``y4m_frame_extract_stats``
which round-trip genuine bytes through the distributed kernel under
arithmetic DuckDB oracles. Pillow/soundfile are picked up instead when
importable; JPEG/MP3/compressed video still raise
``NotImplementedError`` (a faithful codec for those is out of scope).
The older synthetic-blob operators keep their deterministic stand-in
features (byte length + md5 checksum, exact DuckDB oracle).

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
    text (stand-in for image/audio bytes), media_type metadata. A NULL
    text row has no payload and is not a blob — excluded here (the
    downstream Arrow feature kernels consume bytes, and the oracle
    filters the same rows)."""
    docs = docs.filter(F.col("text").isNotNull())
    return docs.select(
        F.col("doc_id"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real decode for the formats with dependency-free codecs
    (round 3): PNG → uint8 array, WAV → (int16 samples, rate) via
    ``functions/media.py``. Pillow/soundfile are tried first when
    importable (not baked into this container); formats needing real
    codec libraries (JPEG, MP3, video) still raise."""
    if media_type == "image/png":
        try:  # pragma: no cover - Pillow absent in this container
            import io as _io

            import numpy as _np
            from PIL import Image

            return _np.asarray(Image.open(_io.BytesIO(payload)))
        except ImportError:
            from approximatequeryengine_spark.functions.media import decode_png

            return decode_png(payload)
    if media_type == "audio/wav":
        try:  # pragma: no cover - soundfile absent in this container
            import io as _io

            import soundfile

            return soundfile.read(_io.BytesIO(payload))
        except ImportError:
            from approximatequeryengine_spark.functions.media import decode_wav

            return decode_wav(payload)
    if media_type == "video/y4m":
        from approximatequeryengine_spark.functions.media import decode_y4m

        return decode_y4m(payload)
    raise NotImplementedError(
        f"no codec available for {media_type!r}; supported without "
        "optional dependencies: image/png, audio/wav, video/y4m (stdlib "
        "codecs); JPEG/MP3/compressed video need Pillow/soundfile/av"
    )


def extract_blob_features(
    spark: SparkSession, blobs: DataFrame, allow_fake: bool = True
) -> DataFrame:
    """Per-blob features via mapInPandas over the SYNTHETIC blob table
    (payload = utf-8 text bytes, not real media). ``allow_fake=False``
    refuses up front: these payloads cannot be decoded as media — the
    real decode path is ``png_decode_stats`` / ``wav_decode_stats``,
    which round-trip genuine PNG/WAV bytes through the codecs."""
    if not allow_fake:
        raise NotImplementedError(
            "blob payloads here are synthetic text bytes, not decodable "
            "media; use png_decode_stats/wav_decode_stats for the real "
            "codec path"
        )

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


def resize_media(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Real resize (round 3): decode → nearest-neighbor resample →
    re-encode, all via the stdlib codecs. PNG only; audio/video
    resampling still needs real codec libraries."""
    if media_type == "image/png":
        from approximatequeryengine_spark.functions.media import (
            decode_png,
            encode_png,
            resize_nearest,
        )

        return encode_png(resize_nearest(decode_png(payload), width, height))
    raise NotImplementedError(
        f"resize for {media_type!r} needs codecs not present in this "
        "environment (supported: image/png)"
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
FROM documents WHERE text IS NOT NULL GROUP BY 1
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
                # header metadata is doc_id-derived; the text is only
                # body filler, so a NULL text is an empty body (the
                # oracle counts every doc — excluding NULLs here would
                # diverge, unlike the content-keyed blob operators)
                body = (text or "").encode("utf-8")
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


# ---------------------------------------------------------------------------
# Real codec round trips (round 3). The synthetic pixel/sample data is
# a pure function of doc_id, so the oracle can recompute every decoded
# feature ARITHMETICALLY (generate_series) while the Spark side must
# come by them the hard way: encode a genuine PNG/WAV, ship the bytes
# through the Arrow batch boundary, decode with the real codec, and
# compute features from the decoded arrays only. A hash-match therefore
# certifies encoder ∘ decoder = identity inside the distributed kernel.
# PNG filter type cycles doc_id % 5 → all five unfilter branches
# (None/Sub/Up/Average/Paeth) are exercised in the certified row.
# ---------------------------------------------------------------------------

PNG_SIDE = 8  # synthetic images are 8×8 greyscale
WAV_N = 64  # samples per synthetic clip


def png_decode_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-bucket stats of decoded (and nearest-resized 8→4) synthetic
    PNGs; see the section comment for the oracle contract."""
    import numpy as np

    from approximatequeryengine_spark.functions.media import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    docs = ensure_parallelism(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "mean_px": [], "sum_px": [], "mean_resized": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pix = ((d * 31 + np.arange(PNG_SIDE * PNG_SIDE)) % 256).astype(
                    np.uint8
                ).reshape(PNG_SIDE, PNG_SIDE)
                payload = encode_png(pix, filter_type=d % 5)
                arr = decode_png(payload).astype(np.int64)
                small = resize_nearest(arr, PNG_SIDE // 2, PNG_SIDE // 2)
                out["doc_id"].append(d)
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["channels"].append(arr.shape[2])
                out["mean_px"].append(float(arr.mean()))
                out["sum_px"].append(int(arr.sum()))
                out["mean_resized"].append(float(small.mean()))
            yield pd.DataFrame(out)

    feats = docs.select("doc_id").mapInPandas(
        batches,
        schema="doc_id long, width long, height long, channels long, "
        "mean_px double, sum_px long, mean_resized double",
    )
    return (
        feats.groupBy((F.col("doc_id") % 4).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("width").alias("width"),
            F.min("height").alias("height"),
            F.min("channels").alias("channels"),
            F.round(F.avg("mean_px"), 6).alias("avg_mean_px"),
            F.sum("sum_px").alias("sum_px"),
            F.round(F.avg("mean_resized"), 6).alias("avg_mean_resized"),
        )
        .orderBy("bucket")
    )


def png_decode_stats_sql() -> str:
    """Oracle: decoded-pixel stats from doc_id arithmetic alone — the
    SQL never builds or parses a PNG."""
    return f"""
WITH px AS (
  SELECT d.doc_id, g.i, (d.doc_id * 31 + g.i) % 256 AS p
  FROM documents d CROSS JOIN generate_series(0, {PNG_SIDE * PNG_SIDE - 1}) g(i)
),
per_doc AS (
  SELECT doc_id,
         avg(p) AS mean_px,
         sum(p) AS sum_px,
         avg(CASE WHEN (g_row % 2 = 0) AND (g_col % 2 = 0) THEN p END) AS mean_resized
  FROM (SELECT doc_id, p, i // {PNG_SIDE} AS g_row, i % {PNG_SIDE} AS g_col FROM px) q
  GROUP BY doc_id
)
SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST({PNG_SIDE} AS BIGINT) AS width,
       CAST({PNG_SIDE} AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       round(avg(mean_px), 6) AS avg_mean_px,
       CAST(sum(sum_px) AS BIGINT) AS sum_px,
       round(avg(mean_resized), 6) AS avg_mean_resized
FROM per_doc GROUP BY 1 ORDER BY 1
"""


def wav_decode_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-bucket stats of decoded synthetic WAV clips (16-bit PCM,
    rate varies by doc_id % 4); same oracle contract as the PNG row."""
    import numpy as np

    from approximatequeryengine_spark.functions.media import (
        decode_wav,
        encode_wav,
    )

    docs = ensure_parallelism(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "n_samples": [], "sample_rate": [],
                "mean_amp": [], "peak": [], "energy": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                s = ((d * 7 + np.arange(WAV_N)) % 201 - 100).astype(np.int16)
                rate = 8000 + (d % 4) * 2000
                payload = encode_wav(s, rate)
                dec, got_rate = decode_wav(payload)
                v = dec.reshape(-1).astype(np.int64)
                out["doc_id"].append(d)
                out["n_samples"].append(len(v))
                out["sample_rate"].append(got_rate)
                out["mean_amp"].append(float(v.mean()))
                out["peak"].append(int(np.abs(v).max()))
                out["energy"].append(int((v * v).sum()))
            yield pd.DataFrame(out)

    feats = docs.select("doc_id").mapInPandas(
        batches,
        schema="doc_id long, n_samples long, sample_rate long, "
        "mean_amp double, peak long, energy long",
    )
    return (
        feats.groupBy((F.col("doc_id") % 4).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.min("n_samples").alias("n_samples"),
            F.min("sample_rate").alias("sample_rate"),
            F.round(F.avg("mean_amp"), 6).alias("avg_mean_amp"),
            F.max("peak").alias("peak"),
            F.sum("energy").alias("energy"),
        )
        .orderBy("bucket")
    )


def wav_decode_stats_sql() -> str:
    return f"""
WITH s AS (
  SELECT d.doc_id, ((d.doc_id * 7 + g.i) % 201) - 100 AS v
  FROM documents d CROSS JOIN generate_series(0, {WAV_N - 1}) g(i)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_samples, avg(v) AS mean_amp,
         max(abs(v)) AS peak, sum(v * v) AS energy
  FROM s GROUP BY doc_id
)
SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(min(n_samples) AS BIGINT) AS n_samples,
       CAST(min(8000 + (doc_id % 4) * 2000) AS BIGINT) AS sample_rate,
       round(avg(mean_amp), 6) AS avg_mean_amp,
       CAST(max(peak) AS BIGINT) AS peak,
       CAST(sum(energy) AS BIGINT) AS energy
FROM per_doc GROUP BY 1 ORDER BY 1
"""


def y4m_frame_extract_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """REAL video frame extraction (round 3): per doc, synthesize a
    genuine YUV4MPEG2 C420 stream ((doc_id % 3) + 2 frames of 8×8 luma,
    Y[f][i] = (doc_id·13 + f·7 + i) mod 256), encode it, decode it back
    with the stdlib Y4M codec inside the Arrow kernel, and SAMPLE every
    2nd frame (frame_idx % 2 == 0 — the frame-sampling step a training
    pipeline runs on video). Features come from the DECODED luma only;
    the oracle recomputes them arithmetically from doc_id, so a hash
    match certifies encoder ∘ decoder = identity plus the sampling
    logic. Per-doc outputs are pure INTEGERS (sums/counts); the group
    mean is one division after integer aggregation, so no float depends
    on row order in either engine."""
    import numpy as np

    from approximatequeryengine_spark.functions.media import (
        decode_y4m,
        encode_y4m,
    )

    docs = ensure_parallelism(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "n_frames": [], "n_sampled": [],
                "width": [], "height": [], "fps": [],
                "luma_sum": [], "luma_px": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 3 + 2
                idx = np.arange(64)
                frames = np.stack(
                    [((d * 13 + f * 7 + idx) % 256).reshape(8, 8) for f in range(n)]
                ).astype(np.uint8)
                payload = encode_y4m(frames, fps=24)
                dec, fps = decode_y4m(payload)
                sampled = dec[::2].astype(np.int64)
                out["doc_id"].append(d)
                out["n_frames"].append(dec.shape[0])
                out["n_sampled"].append(sampled.shape[0])
                out["height"].append(dec.shape[1])
                out["width"].append(dec.shape[2])
                out["fps"].append(fps)
                out["luma_sum"].append(int(sampled.sum()))
                out["luma_px"].append(int(sampled.size))
            yield pd.DataFrame(out)

    feats = docs.select("doc_id").mapInPandas(
        batches,
        schema="doc_id long, n_frames long, n_sampled long, width long, "
        "height long, fps long, luma_sum long, luma_px long",
    )
    return (
        feats.groupBy((F.col("doc_id") % 4).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("n_sampled").alias("sampled_frames"),
            F.min("width").alias("width"),
            F.min("height").alias("height"),
            F.min("fps").alias("fps"),
            F.sum("luma_sum").alias("luma_sum"),
            F.round(
                F.sum("luma_sum").cast("double") / F.sum("luma_px"), 6
            ).alias("avg_luma"),
        )
        .orderBy("bucket")
    )


def y4m_frame_extract_stats_sql() -> str:
    """Oracle: frame/pixel stats from doc_id arithmetic alone — the SQL
    never touches Y4M bytes. Frames f ∈ [0, doc_id%3+2); sampled iff
    f % 2 = 0; pixel value (doc_id·13 + f·7 + i) mod 256."""
    return """
WITH px AS (
  SELECT d.doc_id, f.f, (d.doc_id * 13 + f.f * 7 + g.i) % 256 AS y
  FROM documents d
  CROSS JOIN generate_series(0, 3) f(f)
  CROSS JOIN generate_series(0, 63) g(i)
  WHERE f.f < d.doc_id % 3 + 2 AND f.f % 2 = 0
),
per_doc AS (
  SELECT doc_id, count(DISTINCT f) AS n_sampled,
         sum(y) AS luma_sum, count(*) AS luma_px
  FROM px GROUP BY doc_id
)
SELECT CAST(p.doc_id % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_videos,
       CAST(sum(p.doc_id % 3 + 2) AS BIGINT) AS total_frames,
       CAST(sum(p.n_sampled) AS BIGINT) AS sampled_frames,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(24 AS BIGINT) AS fps,
       CAST(sum(p.luma_sum) AS BIGINT) AS luma_sum,
       round(CAST(sum(p.luma_sum) AS DOUBLE) / sum(p.luma_px), 6) AS avg_luma
FROM per_doc p GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Image near-duplicate detection via average-hash (aHash) clustering.
# The perceptual-hash counterpart of the text dedup family: decode the
# image, reduce it to a 64-bit signature (bit_i = pixel_i > mean), and
# cluster on the exact signature — one groupBy shuffle over 8 bytes per
# image, never a pairwise comparison. Near-duplicate variants (the
# synthetic corpus plants a uniform +1 brightness shift on half of each
# group) produce DIFFERENT bytes and DIFFERENT pixels but the SAME
# aHash, because the mean shifts with the pixels: 64·(p+c) > Σp + 64·c
# ⟺ 64·p > Σp. The Hamming-radius extension (signatures within k bits)
# rides the SimHash pigeonhole block machinery in operators/dedup.py —
# exact-signature clustering is the radius-0 case and the common
# production shape (EXACT match after a brightness/format-invariant
# reduction).
#
# Scale: group count grows with the corpus (n_groups = max(16, n/8)),
# so cluster sizes stay O(1) and the signature table is 16 bytes/row —
# a 100 TB image corpus reduces to a GB-scale groupBy. The strict
# integer comparison 64·p > Σp avoids the float mean entirely (a
# p > avg(p) formulation would hand each engine a different rounding
# boundary).
#
# Oracle: pixels are a pure function of doc_id (like png_decode_stats),
# so DuckDB re-derives signature, clusters, and histogram from
# arithmetic while the Spark side must earn them through the real
# encode → Arrow → decode → hash kernel.
# ---------------------------------------------------------------------------


def _ahash_groups(n_docs: int) -> int:
    return max(16, n_docs // 8)


def image_ahash_clusters(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Cluster-size histogram of exact-aHash image clusters:
    (cluster_size, n_clusters, n_images) ordered by cluster_size."""
    import numpy as np

    from approximatequeryengine_spark.functions.media import (
        decode_png,
        encode_png,
    )

    docs = ensure_parallelism(docs)
    n_groups = _ahash_groups(docs.count())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(64, dtype=np.int64)
        for pdf in it:
            ids, his, los = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % n_groups
                c = (d // n_groups) % 2
                pix = ((g * 31 + idx * 7) % 255 + c).astype(np.uint8).reshape(8, 8)
                # The honest path: real PNG bytes in, real decode out.
                arr = decode_png(encode_png(pix, filter_type=d % 5))
                flat = arr.reshape(-1).astype(np.int64)
                bits = (flat * 64 > flat.sum()).astype(np.int64)
                lo = int((bits[:32] << idx[:32]).sum())
                hi = int((bits[32:] << idx[:32]).sum())
                ids.append(d)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame({"doc_id": ids, "hash_hi": his, "hash_lo": los})

    sigs = docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, hash_hi long, hash_lo long"
    )
    clusters = sigs.groupBy("hash_hi", "hash_lo").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_images"),
        )
        .orderBy("cluster_size")
    )


def image_ahash_clusters_sql() -> str:
    """Oracle: signature → cluster → histogram from doc_id arithmetic
    alone (the SQL never builds a PNG). Mirrors _ahash_groups and the
    strict-integer bit rule exactly."""
    return """
WITH n AS (SELECT greatest(16, count(*) // 8) AS n_groups FROM documents),
px AS (
  SELECT d.doc_id, g.i,
         ((d.doc_id % (SELECT n_groups FROM n)) * 31 + g.i * 7) % 255
           + ((d.doc_id // (SELECT n_groups FROM n)) % 2) AS p
  FROM documents d CROSS JOIN generate_series(0, 63) g(i)
),
tot AS (SELECT doc_id, sum(p) AS sp FROM px GROUP BY doc_id),
sigs AS (
  SELECT px.doc_id,
         CAST(sum(CASE WHEN px.i >= 32 AND px.p * 64 > t.sp
                       THEN (CAST(1 AS BIGINT) << (px.i - 32)) ELSE 0 END)
              AS BIGINT) AS hash_hi,
         CAST(sum(CASE WHEN px.i < 32 AND px.p * 64 > t.sp
                       THEN (CAST(1 AS BIGINT) << px.i) ELSE 0 END)
              AS BIGINT) AS hash_lo
  FROM px JOIN tot t ON px.doc_id = t.doc_id
  GROUP BY px.doc_id
),
clusters AS (
  SELECT hash_hi, hash_lo, count(*) AS cluster_size
  FROM sigs GROUP BY 1, 2
)
SELECT cluster_size,
       count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_images
FROM clusters GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Audio near-duplicate detection via a volume-invariant energy-contour
# fingerprint — the WAV sibling of image_ahash_clusters, completing the
# multimodal dedup pair. 64 decoded PCM samples → 32 two-sample energy
# windows e_w = s²_{2w} + s²_{2w+1} → 31 sign-of-difference bits
# (bit_w = e_{w+1} > e_w, the Haitsma-Kalker/Shazam contour idea in
# miniature; the per-group base pattern is a multiplicative-mix
# pseudorandom sequence so distinct groups get decorrelated contours —
# collisions stay birthday-rare in the 31-bit space and cluster sizes
# stay O(1) as the corpus grows). A re-mastered copy at a
# different volume scales every
# window energy by the SAME k², so every strict integer comparison —
# and hence the fingerprint — is unchanged while the bytes and samples
# all differ. Clustering is an exact-signature groupBy over an 8-byte
# key, identical scale shape to the image entry (n_groups = max(16,
# n/8) keeps clusters O(1) as the corpus grows; 31 bits keep
# cross-group collisions rare).
#
# Oracle: samples are a pure function of doc_id, so DuckDB re-derives
# window energies → bits → fingerprints → histogram arithmetically
# while the Spark side must pass through the real 16-bit PCM encode →
# Arrow → decode kernel.
# ---------------------------------------------------------------------------


def audio_fingerprint_clusters(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Cluster-size histogram of exact audio-fingerprint clusters:
    (cluster_size, n_clusters, n_clips) ordered by cluster_size."""
    import numpy as np

    from approximatequeryengine_spark.functions.media import (
        decode_wav,
        encode_wav,
    )

    docs = ensure_parallelism(docs)
    n_groups = _ahash_groups(docs.count())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(WAV_N, dtype=np.int64)
        for pdf in it:
            ids, fps = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % n_groups
                amp = 1 + (d // n_groups) % 2  # planted volume variant
                s = (amp * (((g * 2654435761 + idx * 40503) % 65536) % 199 - 99)).astype(np.int16)
                rate = 8000 + (d % 4) * 2000
                dec, _ = decode_wav(encode_wav(s, rate))
                v = dec.reshape(-1).astype(np.int64)
                e = (v * v).reshape(-1, 2).sum(axis=1)  # 32 window energies
                bits = (e[1:] > e[:-1]).astype(np.int64)  # 31 contour bits
                fps.append(int((bits << np.arange(31)).sum()))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    sigs = docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, fingerprint long"
    )
    clusters = sigs.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_clips"),
        )
        .orderBy("cluster_size")
    )


def audio_fingerprint_clusters_sql() -> str:
    """Oracle: window energies → contour bits → fingerprint → histogram
    from doc_id arithmetic alone (the SQL never touches WAV bytes).
    The amplitude factor is carried through explicitly so the SQL
    proves the same invariance the kernel relies on."""
    return f"""
WITH n AS (SELECT greatest(16, count(*) // 8) AS n_groups FROM documents),
samp AS (
  SELECT d.doc_id, g.i,
         (1 + (d.doc_id // (SELECT n_groups FROM n)) % 2)
           * ((((d.doc_id % (SELECT n_groups FROM n)) * 2654435761 + g.i * 40503) % 65536) % 199 - 99)
           AS s
  FROM documents d CROSS JOIN generate_series(0, {WAV_N - 1}) g(i)
),
win AS (
  SELECT doc_id, i // 2 AS w, sum(s * s) AS e
  FROM samp GROUP BY doc_id, i // 2
),
bits AS (
  SELECT a.doc_id, a.w - 1 AS b,
         CASE WHEN a.e > p.e THEN 1 ELSE 0 END AS bit
  FROM win a JOIN win p ON a.doc_id = p.doc_id AND p.w = a.w - 1
  WHERE a.w >= 1
),
sigs AS (
  SELECT doc_id,
         CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS fingerprint
  FROM bits GROUP BY doc_id
),
clusters AS (
  SELECT fingerprint, count(*) AS cluster_size FROM sigs GROUP BY 1
)
SELECT cluster_size,
       count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_clips
FROM clusters GROUP BY 1 ORDER BY 1
"""
