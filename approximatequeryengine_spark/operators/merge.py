"""MERGE / upsert (CDC apply) — the lakehouse write primitive, Spark-first.

Delta Lake's ``MERGE INTO``, Iceberg's ``MERGE``, and Hudi's upsert all
compile to the same relational core: a keyed FULL OUTER join of target
and source where the source version wins on match, target-only rows
carry over, and source-only rows insert. This module implements that
core on plain DataFrames:

- :func:`merge_upsert` — the merged relation (what a lakehouse engine
  would rewrite into data files);
- :func:`merge_upsert_stats` — the change-audit readout
  (n_target, n_source, n_inserted, n_updated, n_unchanged, n_result,
  sum_after): counts classified in ONE aggregate over the SAME outer
  join, which is how a MERGE reports its metrics without a second scan.

Values compare on an integer cents grid (``floor(·*100+0.5)``) so
"changed vs unchanged" is never a float-equality judgement, on either
engine.

At 100 TB: one co-partitioned shuffle per side (or a broadcast when the
change batch is small — AQE's call), one aggregate; no collect, no
per-row logic. The reference has no write-path machinery at all
(SURVEY §2 S9 is a CSV result sink); this is beyond-reference lakehouse
surface, included because a training-data pipeline's ingest loop is an
upsert loop.

Keys must be unique per side (the lakehouse MERGE precondition); the
stats identity n_result = n_target + n_inserted is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    value_cents: Column,
) -> DataFrame:
    """The merged relation: (key, value_cents) with source-wins-on-match
    semantics. Callers carrying more columns wrap their payload the
    same way (coalesce source-side first)."""
    t = target.select(F.col(key).alias("k"), value_cents.cast("long").alias("tc"))
    s = source.select(F.col(key).alias("k"), value_cents.cast("long").alias("sc"))
    j = t.join(s, on="k", how="full_outer")
    return j.select(
        F.col("k").alias(key),
        F.coalesce(F.col("sc"), F.col("tc")).alias("value_cents"),
    )


def merge_audit(joined: DataFrame) -> DataFrame:
    """One-row change audit over any frame carrying per-key ``tc``
    (target cents, NULL when absent) and ``sc`` (source cents, NULL
    when absent) — shared by the batch outer-join path and the
    streaming compaction path (`streaming/pipeline.py::
    merge_upsert_stream`), so both certify against the same oracle."""
    tc, sc = F.col("tc"), F.col("sc")
    return joined.agg(
        F.sum(F.when(tc.isNotNull(), 1).otherwise(0)).cast("long").alias("n_target"),
        F.sum(F.when(sc.isNotNull(), 1).otherwise(0)).cast("long").alias("n_source"),
        F.sum(F.when(tc.isNull() & sc.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.sum(F.when(tc.isNotNull() & sc.isNotNull() & (tc != sc), 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.sum(F.when(tc.isNotNull() & sc.isNotNull() & (tc == sc), 1).otherwise(0))
        .cast("long")
        .alias("n_unchanged"),
        F.count(F.lit(1)).cast("long").alias("n_result"),
        F.round(F.sum(F.coalesce(sc, tc)) / F.lit(100.0), 2).alias("sum_after"),
    )


def merge_upsert_stats(
    target: DataFrame,
    source: DataFrame,
    key: str,
    value_cents: Column,
) -> DataFrame:
    """One-row change audit of the batch merge (see module docstring)."""
    t = target.select(F.col(key).alias("k"), value_cents.cast("long").alias("tc"))
    s = source.select(F.col(key).alias("k"), value_cents.cast("long").alias("sc"))
    return merge_audit(t.join(s, on="k", how="full_outer"))


def merge_upsert_stats_sql(
    target_sql: str,
    source_sql: str,
    key: str,
    value_cents_sql: str,
) -> str:
    """DuckDB oracle: the same outer join + one-aggregate audit.
    ``target_sql``/``source_sql`` are full relation expressions
    (subqueries allowed); ``value_cents_sql`` is evaluated inside
    each."""
    return f"""
WITH t AS (SELECT {key} AS k, CAST({value_cents_sql} AS BIGINT) AS tc
           FROM {target_sql}),
s AS (SELECT {key} AS k, CAST({value_cents_sql} AS BIGINT) AS sc
      FROM {source_sql}),
j AS (SELECT coalesce(t.k, s.k) AS k, tc, sc
      FROM t FULL OUTER JOIN s ON t.k = s.k)
SELECT CAST(sum(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
       CAST(sum(CASE WHEN sc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_source,
       CAST(sum(CASE WHEN tc IS NULL AND sc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inserted,
       CAST(sum(CASE WHEN tc IS NOT NULL AND sc IS NOT NULL AND tc != sc
                THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(sum(CASE WHEN tc IS NOT NULL AND sc IS NOT NULL AND tc = sc
                THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(count(*) AS BIGINT) AS n_result,
       round(CAST(sum(coalesce(sc, tc)) AS DOUBLE) / 100.0, 2) AS sum_after
FROM j
"""
