"""Iterative graph analytics — PageRank over the token co-occurrence
graph, Spark-first.

The repo's other iterative operator (`operators/dedup.py::
dedup_connected_clusters`) is BSP hash-min label propagation; this adds
the NUMERIC iteration class: a fixed number of synchronous PageRank
steps, each one join + one grouped sum, driven by a plain Python loop
that only grows the lazy plan (no collect between steps).

Determinism contract (what makes the DuckDB oracle exact): ranks are
INTEGER fixed-point (scale 10¹²) and every step is pure integer
arithmetic —

    r'(v) = (15·S) // (100·n)  +  (85 · Σ_{u→v} (r(u) // deg(u))) // 100

Integer sums are order-free, so the result is bit-identical in any
engine and any partitioning; a float formulation would re-associate
the neighbor sums differently per engine and drift across iterations.
The flooring loses a bounded trickle of probability mass per step
(≤ deg(u)⁻¹-scale per contribution) — documented, not hidden; ranking
quality is unaffected at scale 10¹².

The oracle UNROLLS the iterations as chained CTEs (r0 → r1 → …):
recursive CTEs forbid aggregation over the recursive term, and an
unrolled fixed-depth chain is the honest SQL rendering of a
fixed-iteration synchronous algorithm.

At 100 TB: edges are (token, token) co-occurrence pairs deduplicated
corpus-wide — the explode is bounded by per-doc distinct-token counts;
each iteration shuffles on the destination token (same key every step,
so a production run would hash-partition ranks+edges once and reuse the
layout); state is O(vocabulary). The reference has no graph machinery
at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.text import ws_tokens_col, ws_tokens_sql

PR_SCALE = 10**12
PR_ITERS = 5
PR_TOPK = 20


def _token_edges(docs: DataFrame) -> DataFrame:
    """Distinct directed co-occurrence edges (a ≠ b within a doc)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(ws_tokens_col(F.col("text")), lambda t: F.lower(t))
            )
        ).alias("tok"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") != F.col("b.tok")))
        .select(F.col("a.tok").alias("src"), F.col("b.tok").alias("dst"))
        .distinct()
    )


def token_pagerank_topk(
    spark: SparkSession,
    docs: DataFrame,
    iters: int = PR_ITERS,
    k: int = PR_TOPK,
) -> DataFrame:
    """Top-k tokens by fixed-point PageRank after ``iters`` synchronous
    steps. Output: (rank, tok, pr) with pr the exact integer
    fixed-point score."""
    # The quadratic-per-doc co-occurrence join is the dominant cost and
    # the 5-iteration lazy plan references it ~2 per step — persist it
    # once (materialized by the node count below).
    edges = _token_edges(docs).persist()
    # distinct column names per role — deg/edges share lineage and
    # Spark rejects the ambiguous self-join otherwise
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).select(F.col("src").alias("dtok"), "deg")
    out_edges = edges.select(F.col("src").alias("etok"), F.col("dst"))
    nodes = edges.select(F.col("src").alias("tok")).distinct()
    n = nodes.count()  # bounded: |vocabulary|; materializes the cache
    if n == 0:
        # no co-occurrence edges (empty corpus or single-token docs):
        # empty result, never a ZeroDivisionError (the repo's
        # empty-input contract, tests/test_empty_inputs.py)
        return docs.sparkSession.createDataFrame(
            [], "rank int, tok string, pr long"
        )
    base = (15 * PR_SCALE) // (100 * n)
    ranks = nodes.withColumn("pr", F.lit(PR_SCALE // n).cast("long"))
    for _ in range(iters):
        contrib = (
            ranks.join(deg, F.col("tok") == F.col("dtok"), "inner")
            .join(out_edges, F.col("etok") == F.col("tok"), "inner")
            .select(
                F.col("dst").alias("tok"),
                F.floor(F.col("pr") / F.col("deg")).cast("long").alias("c"),
            )
            .groupBy("tok")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes.join(contrib, on="tok", how="left")
            .select(
                "tok",
                (
                    F.lit(base)
                    + F.floor(F.lit(85) * F.coalesce(F.col("s"), F.lit(0)) / F.lit(100))
                )
                .cast("long")
                .alias("pr"),
            )
        )
    from pyspark.sql.window import Window

    topk = ranks.orderBy(F.desc("pr"), F.asc("tok")).limit(k)
    w = Window.orderBy(F.desc("pr"), F.asc("tok"))
    return topk.withColumn("rank", F.row_number().over(w)).select("rank", "tok", "pr")


def token_pagerank_topk_sql(iters: int = PR_ITERS, k: int = PR_TOPK) -> str:
    """DuckDB oracle: identical edges/degrees, iterations unrolled as
    chained CTEs, identical integer arithmetic."""
    toks = f"list_distinct(list_transform({ws_tokens_sql('text')}, t -> lower(t)))"
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(f"""
c{i} AS (
  SELECT e.dst AS tok, CAST(sum({prev}.pr // deg.deg) AS BIGINT) AS s
  FROM {prev} JOIN deg ON deg.src = {prev}.tok
  JOIN edges e ON e.src = {prev}.tok
  GROUP BY 1
),
r{i} AS (
  SELECT nodes.tok,
         CAST((SELECT base FROM consts)
              + (85 * coalesce(c{i}.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes LEFT JOIN c{i} ON c{i}.tok = nodes.tok
)""")
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents
),
edges AS (
  SELECT DISTINCT a.tok AS src, b.tok AS dst
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok != b.tok
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS tok FROM edges),
consts AS (
  SELECT (15 * {PR_SCALE}::BIGINT) // (100 * count(*)) AS base,
         {PR_SCALE}::BIGINT // count(*) AS r_init
  FROM nodes
),
r0 AS (SELECT tok, (SELECT r_init FROM consts) AS pr FROM nodes),{chain}
SELECT rank, tok, pr FROM (
  SELECT row_number() OVER (ORDER BY pr DESC, tok ASC) AS rank, tok, pr
  FROM {prev}
) WHERE rank <= {k}
"""
