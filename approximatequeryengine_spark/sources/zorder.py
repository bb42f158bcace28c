"""Z-order (Morton-curve) 2-D clustering — multi-dimensional data
skipping, the third member of the skip-index family (zone map = range
predicates on the clustering key, block bloom = equality on an
unclustered column, Z-order = RECTANGLE predicates on two columns).

A layout sorted by one key gives tight per-block [min, max] bounds on
that key and USELESS bounds on every other (each block spans the whole
second domain). Sorting by the interleaved-bit Morton code of two
quantized keys — Delta Lake's ``ZORDER BY``, Iceberg's z-ordered sort,
Amazon Redshift's interleaved sort keys — gives each block LOCALITY in
both dimensions, so ordinary per-block min/max stats prune 2-D
rectangle queries on either or both columns.

- **quantize**: each key maps to a 16-bit cell index by the zonemap's
  fixed-width integer arithmetic (``(k - min) // width``), replayable
  in any engine;
- **interleave**: ``z = Σᵢ bitᵢ(x)·4ⁱ + 2·bitᵢ(y)·4ⁱ`` — spelled with
  only ``%``, ``-``, ``*`` (no engine-specific integer division or
  shifts), one shared SQL text for Spark and DuckDB;
- **layout**: blocks of equal row count via ``ntile`` over
  ``ORDER BY z, rowid`` (deterministic total order; the production
  ingest would use ``repartitionByRange`` — same trade as the
  zonemap's balanced mode, documented not hidden);
- **blockmap**: per-block ACTUAL (xmin, xmax, ymin, ymax, n_rows);
- **query**: a rectangle aggregate consults the blockmap (bounded
  O(blocks) collect), scans only blocks overlapping BOTH ranges via a
  partition IN-list, and applies the exact predicate on survivors.

The certified readout carries ``blocks_scanned`` for the Z-order
layout AND ``blocks_scanned_linear`` for the same stats computed over
an x-sorted layout of the same data — certifying not just the answer
but the CLAIM: a linear sort prunes on x only, the Morton layout
prunes on both. At 100 TB the blockmap is O(blocks) metadata and the
scan is |selected|/|blocks| of the corpus; the one-time layout cost is
a range shuffle at ingest, identical to any clustered table write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Q_BITS = 16  # 16-bit cells per dimension → z < 2^32, exact in BIGINT
Q_CELLS = 1 << Q_BITS


def morton_sql(xq: str, yq: str, bits: int = Q_BITS) -> str:
    """The interleave as portable SQL over two quantized non-negative
    integer expressions: bit i of x lands at position 2i, bit i of y at
    2i+1. ``(v % 2^(i+1)) - (v % 2^i)`` isolates bit i ALREADY scaled
    by 2^i, so one extra factor of 2^i (resp. 2^(i+1)/2^i = 2^i then
    ×2) places it — no shifts, no integer division."""
    terms = []
    for i in range(bits):
        lo, hi = 1 << i, 1 << (i + 1)
        terms.append(f"((({xq}) % {hi}) - (({xq}) % {lo})) * {lo}")
        terms.append(f"((({yq}) % {hi}) - (({yq}) % {lo})) * {hi}")
    return "(" + " + ".join(terms) + ")"


def _quant_sql(expr: str, mn: int, width: int) -> str:
    # Matches zonemap arithmetic: floor((k - mn) / width); non-negative
    # operands make floor = truncation in both engines.
    return f"CAST(floor((({expr}) - {mn}) / {width}.0) AS BIGINT)"


def _span(df: DataFrame, col: str) -> tuple[int, int]:
    mn, mx, n_null = df.agg(
        F.min(col), F.max(col), F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    ).collect()[0]
    if mn is None:
        raise ValueError(f"zorder_write: no non-null values in {col}")
    if n_null:
        # NULL quantizes to NULL z; those rows would cluster into a
        # block whose min/max stats are NULL and crash the rect-sum
        # consult's comparisons. The clustering keys must be total.
        raise ValueError(
            f"zorder_write: {n_null} NULL values in {col}; both "
            "clustering keys must be non-null"
        )
    width = max(1, (int(mx) - int(mn) + Q_CELLS) // Q_CELLS)
    return int(mn), width


def zorder_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    rowid: Column,
    n_blocks: int = 64,
    layout: str = "ntile",
) -> None:
    """Persist ``path/data`` partitioned by Morton block and
    ``path/blockmap`` = (block, xmin, xmax, ymin, ymax, n_rows); also
    writes ``path/meta`` (the two quantization (min, width) pairs) so
    queries never re-derive the layout.

    Two block-assignment strategies:

    - ``layout='ntile'`` (default): deterministic equal-count blocks
      from a total order over (z, rowid) — a SINGLE-PARTITION window
      at build time (measured 27 s for 6M rows), chosen because the
      DuckDB oracle can replay the layout exactly (the certified
      ``index_zorder_rect_sum`` path);
    - ``layout='range'``: ``repartitionByRange`` on (z, rowid) —
      sampled boundaries, fully distributed build, the layout you'd
      run at 100 TB. Block ids are partition ids; sizes are
      approximately equal and the blockmap describes the ACTUAL
      layout, so the query path (and its exactness) is identical —
      only layout replayability is lost. Same trade as the zonemap's
      balanced mode; pinned in tests (answers equal, pruning holds)."""
    base = (
        df.withColumn("__x", x.cast("long"))
        .withColumn("__y", y.cast("long"))
        .withColumn("__rid", rowid.cast("long"))
    )
    xmn, xw = _span(base, "__x")
    ymn, yw = _span(base, "__y")
    z = morton_sql(_quant_sql("__x", xmn, xw), _quant_sql("__y", ymn, yw))
    if layout == "range":
        from pyspark.sql.functions import spark_partition_id

        zoned = (
            base.withColumn("__z", F.expr(z))
            .repartitionByRange(n_blocks, "__z", "__rid")
            .withColumn("__block", spark_partition_id().cast("long"))
        )
    elif layout == "ntile":
        zoned = base.withColumn("__z", F.expr(z)).withColumn(
            "__block",
            (F.ntile(n_blocks).over(Window.orderBy("__z", "__rid")) - 1).cast("long"),
        )
    else:
        raise ValueError(f"unknown layout {layout!r}; use 'ntile' or 'range'")
    writer = zoned.drop("__z")
    if layout == "ntile":
        writer = writer.repartition("__block")
    # 'range': already partitioned by block — a repartition would both
    # waste a shuffle AND re-sample the range boundaries.
    writer.write.partitionBy("__block").mode("overwrite").parquet(f"{path}/data")
    # Blockmap from the WRITTEN files, not the lineage: under 'range'
    # the block ids come from spark_partition_id over sampled
    # boundaries, which a re-execution may re-draw — stats derived
    # from the lineage could describe a layout that was never written.
    (
        spark.read.parquet(f"{path}/data")
        .groupBy("__block")
        .agg(
            F.min("__x").alias("xmin"),
            F.max("__x").alias("xmax"),
            F.min("__y").alias("ymin"),
            F.max("__y").alias("ymax"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/blockmap")
    )
    spark.createDataFrame(
        [(xmn, xw, ymn, yw)], "xmn long, xw long, ymn long, yw long"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def zorder_rect_sum(
    spark: SparkSession,
    path: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    value_cents: Column,
) -> DataFrame:
    """Rectangle aggregate through the Morton layout: one row
    (n_rows, sum_value, blocks_scanned, blocks_total)."""
    bm = spark.read.parquet(f"{path}/blockmap").collect()
    cells = sorted(
        int(r["__block"])
        for r in bm
        if r["xmax"] >= x_lo
        and r["xmin"] <= x_hi
        and r["ymax"] >= y_lo
        and r["ymin"] <= y_hi
    )
    data = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("__block").isin(cells))
        .filter(F.col("__x").between(F.lit(x_lo), F.lit(x_hi)))
        .filter(F.col("__y").between(F.lit(y_lo), F.lit(y_hi)))
    )
    return data.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(value_cents.cast("long")) / F.lit(100.0), 2).alias("sum_value"),
        F.lit(len(cells)).cast("long").alias("blocks_scanned"),
        F.lit(len(bm)).cast("long").alias("blocks_total"),
    )


def linear_blocks_scanned(
    spark: SparkSession,
    df: DataFrame,
    x: Column,
    y: Column,
    rowid: Column,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    n_blocks: int = 64,
) -> DataFrame:
    """How many blocks the SAME rectangle query would scan under a
    plain x-sorted layout with identical per-block (x, y) min/max
    stats — the comparison column certified next to the Morton count.
    One window pass + one O(blocks) aggregate; no data is written."""
    base = (
        df.withColumn("__x", x.cast("long"))
        .withColumn("__y", y.cast("long"))
        .withColumn("__rid", rowid.cast("long"))
        .withColumn(
            "__block",
            (F.ntile(n_blocks).over(Window.orderBy("__x", "__rid")) - 1).cast("long"),
        )
    )
    stats = base.groupBy("__block").agg(
        F.min("__x").alias("xmin"),
        F.max("__x").alias("xmax"),
        F.min("__y").alias("ymin"),
        F.max("__y").alias("ymax"),
    )
    return stats.agg(
        F.sum(
            F.when(
                (F.col("xmax") >= x_lo)
                & (F.col("xmin") <= x_hi)
                & (F.col("ymax") >= y_lo)
                & (F.col("ymin") <= y_hi),
                1,
            )
            .otherwise(0)
            .cast("long")
        ).alias("blocks_scanned_linear")
    )


def zorder_rect_sum_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    rowid_sql: str,
    value_cents_sql: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    n_blocks: int = 64,
) -> str:
    """DuckDB oracle: re-derives quantization, Morton code, ntile
    blocking, per-block bounds, the 2-D overlap count, the exact
    rectangle aggregate, AND the linear-layout comparison count."""
    return f"""
WITH base AS (
  SELECT CAST({x_sql} AS BIGINT) AS x,
         CAST({y_sql} AS BIGINT) AS y,
         CAST({rowid_sql} AS BIGINT) AS rid,
         CAST({value_cents_sql} AS BIGINT) AS cents
  FROM {table}
),
meta AS (
  SELECT min(x) AS xmn,
         greatest(1, CAST(floor((max(x) - min(x) + {Q_CELLS}) / {Q_CELLS}.0) AS BIGINT)) AS xw,
         min(y) AS ymn,
         greatest(1, CAST(floor((max(y) - min(y) + {Q_CELLS}) / {Q_CELLS}.0) AS BIGINT)) AS yw
  FROM base
),
quant AS (
  SELECT x, y, rid, cents,
         CAST(floor((x - xmn) / (xw * 1.0)) AS BIGINT) AS xq,
         CAST(floor((y - ymn) / (yw * 1.0)) AS BIGINT) AS yq
  FROM base, meta
),
zed AS (
  SELECT x, y, rid, cents, {morton_sql("xq", "yq")} AS z FROM quant
),
blocked AS (
  SELECT x, y, cents,
         ntile({n_blocks}) OVER (ORDER BY z, rid) - 1 AS b
  FROM zed
),
bm AS (
  SELECT b, min(x) AS xmin, max(x) AS xmax,
         min(y) AS ymin, max(y) AS ymax
  FROM blocked GROUP BY 1
),
sel AS (
  SELECT b FROM bm
  WHERE xmax >= {x_lo} AND xmin <= {x_hi}
    AND ymax >= {y_lo} AND ymin <= {y_hi}
),
lin AS (
  SELECT x, y, ntile({n_blocks}) OVER (ORDER BY x, rid) - 1 AS b FROM base
),
linbm AS (
  SELECT b, min(x) AS xmin, max(x) AS xmax,
         min(y) AS ymin, max(y) AS ymax
  FROM lin GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS sum_value,
       (SELECT CAST(count(*) AS BIGINT) FROM sel) AS blocks_scanned,
       (SELECT CAST(count(*) AS BIGINT) FROM bm) AS blocks_total,
       (SELECT CAST(count(*) AS BIGINT) FROM linbm
        WHERE xmax >= {x_lo} AND xmin <= {x_hi}
          AND ymax >= {y_lo} AND ymin <= {y_hi}) AS blocks_scanned_linear
FROM blocked
WHERE b IN (SELECT b FROM sel)
  AND x BETWEEN {x_lo} AND {x_hi} AND y BETWEEN {y_lo} AND {y_hi}
"""
