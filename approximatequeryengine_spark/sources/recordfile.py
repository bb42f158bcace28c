"""Packed-binary record file source/sink — reference S5 parity.

The reference persists its table as a tiny header plus a flat array of
fixed-width C ``Record`` structs (``custom_bplus_db.cpp:665-711``:
``save_to_file`` writes ``total_records``, ``tree_height``,
``record_count`` then raw ``sizeof(Record)`` blobs; ``load_from_file``
reads them back). This module re-expresses that capability Spark-first:

- the on-disk format is ours (magic + version + count header,
  little-endian packed records matching the reference's 5-column
  ``Record {id:i64, amount:f64, region:i32, product_id:i32, ts:i64}``,
  ``custom_bplus_db.hpp:17-27``);
- **reading is distributed**: ``spark.read.format("binaryFile")`` lists
  and assigns whole files to tasks, and a ``mapInPandas`` decoder turns
  each file into Arrow record batches with ``numpy.frombuffer`` — no
  per-row Python, no driver materialization. One file = one split
  (files are the parallelism unit, like the reference's
  one-file-per-database); write many part files for scale.
- **writing is distributed**: each input partition writes one part file
  from its executor and yields a manifest row. On a multi-node cluster
  the target directory must be on shared storage (as with any
  non-Hadoop sink); Parquet remains the primary format — this sink
  exists for interchange with reference-style tooling.
"""

from __future__ import annotations

import os
import struct
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"AQER"
VERSION = 1
_HEADER = struct.Struct("<4sIQ")  # magic, version, record_count

RECORD_DTYPE = np.dtype(
    [
        ("id", "<i8"),
        ("amount", "<f8"),
        ("region", "<i4"),
        ("product_id", "<i4"),
        ("timestamp", "<i8"),
    ]
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("region", T.IntegerType(), False),
        T.StructField("product_id", T.IntegerType(), False),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("record_count", T.LongType(), False),
    ]
)


def encode_records(pdf: pd.DataFrame) -> bytes:
    """Serialize a pandas frame (RECORD_SCHEMA columns) to one file blob."""
    arr = np.empty(len(pdf), dtype=RECORD_DTYPE)
    for name in RECORD_DTYPE.names:
        arr[name] = pdf[name].to_numpy()
    return _HEADER.pack(MAGIC, VERSION, len(arr)) + arr.tobytes()


def decode_records(blob: bytes) -> pd.DataFrame:
    """Parse one file blob back into a pandas frame."""
    magic, version, count = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC or version != VERSION:
        raise ValueError(f"not an AQE record file (magic={magic!r} v={version})")
    arr = np.frombuffer(blob, dtype=RECORD_DTYPE, count=count, offset=_HEADER.size)
    return pd.DataFrame({name: arr[name] for name in RECORD_DTYPE.names})


def write_record_files(df: DataFrame, directory: str) -> DataFrame:
    """Write ``df`` (RECORD_SCHEMA-compatible) as one packed part file per
    partition; returns the collected manifest as a small DataFrame."""
    os.makedirs(directory, exist_ok=True)
    cols = list(RECORD_DTYPE.names)
    narrow = df.select(
        *[df[c].cast(RECORD_SCHEMA[c].dataType).alias(c) for c in cols]
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True) if batches else None
        if pdf is None or len(pdf) == 0:
            return
        path = os.path.join(directory, f"part-{uuid.uuid4().hex}.aqer")
        with open(path, "wb") as f:
            f.write(encode_records(pdf))
        yield pd.DataFrame({"path": [path], "record_count": [len(pdf)]})

    manifest = narrow.mapInPandas(write_partition, schema=_MANIFEST_SCHEMA)
    rows = manifest.collect()  # small: one row per partition
    return df.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)


def read_record_files(spark: SparkSession, directory: str) -> DataFrame:
    """Distributed read: one task per file, vectorized decode."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.aqer")
        .load(directory)
        .select("content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                yield decode_records(bytes(blob))

    return binary.mapInPandas(decode, schema=RECORD_SCHEMA)
