"""Similarity search over embedding columns (``array<float>``).

- **Brute-force top-k**: broadcast the (small) query set against the
  corpus; cosine computed with ``zip_with``/``aggregate`` (JVM-side,
  codegen) → Window top-k per query. Exact; cost O(|queries|·n) — the
  correctness baseline, and still the right plan whenever the query set
  broadcasts.
- **LSH-bucketed ANN**: 8-bit random-hyperplane signature (hyperplane
  weights ±1 derived from the portable hash, so both engines and any
  cluster layout compute identical signatures), equi-join on bucket,
  cosine verify inside the bucket. The scale path: candidate set is
  |bucket| instead of n.
- **Embedding near-dup pairs**: cosine ≥ τ within a blocking key
  (label), the vector analogue of n-gram Jaccard verification.

All operators have DuckDB oracle renderings; dot products are written
with the same left-to-right summation order in both engines so the
doubles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximatequeryengine_spark.functions.hashing import HASH_SPACE, portable_hash_col
from approximatequeryengine_spark.functions.vector import cosine_sim

DIM = 64  # fixture embedding dimensionality
SIG_BITS = 8


def _cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine with explicit sequential sums (matches zip_with +
    aggregate fold order on the Spark side)."""
    dot = f"list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * {b}[i]))"
    na = f"sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * v)))"
    nb = f"sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * v)))"
    return f"({dot} / ({na} * {nb}))"


def _vec_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def ann_bruteforce_topk(
    spark: SparkSession,
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (vec_id < n_queries), excluding self. Returns
    (query_id, neighbor_id, rank, cos_sim)."""
    base = emb.select(F.col("vec_id"), _vec_double(F.col("embedding")).alias("v"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def ann_bruteforce_topk_sql(n_queries: int = 5, k: int = 3) -> str:
    cos = _cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


# -- LSH (random hyperplane) ------------------------------------------------


def _hyperplane_sign(bit: int, dim: int) -> int:
    """Deterministic ±1 weight for (bit, dim), derived from the portable
    hash so Spark/DuckDB/any-layout agree. Uses hash bit 16 (the
    low bits of a multiplicative hash are weak)."""
    # evaluated in Python: same arithmetic as portable_hash for key = bit*DIM+dim
    from approximatequeryengine_spark.functions.hashing import M31, MULT, MULT2, OFFSET

    k = bit * DIM + dim
    t1 = k % M31
    t2 = (t1 * MULT + OFFSET) % HASH_SPACE
    h = ((t2 % M31) * MULT2 + 144) % HASH_SPACE
    return 1 if (h >> 16) & 1 else -1


def lsh_signature_col(vec: Column) -> Column:
    """8-bit signature: bit b = [Σ_d sign(b,d)·vec[d] > 0]."""
    total = F.lit(0).cast("long")
    for b in range(SIG_BITS):
        signs = [_hyperplane_sign(b, d) for d in range(DIM)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s).cast("double") for s in signs]),
                lambda v, s: v.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        total = total + F.when(proj > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def lsh_signature_sql(vec: str) -> str:
    terms = []
    for b in range(SIG_BITS):
        signs = ", ".join(
            f"{_hyperplane_sign(b, d)}.0" for d in range(DIM)
        )
        proj = (
            f"list_sum(list_transform(range(1, len({vec}) + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ([{signs}])[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2**b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk(
    spark: SparkSession,
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; cosine
    verify + rank within the bucket. At 100 TB the bucket join replaces
    the full scan; recall is tunable via SIG_BITS / multi-probe."""
    base = emb.select(
        F.col("vec_id"),
        _vec_double(F.col("embedding")).alias("v"),
        lsh_signature_col(F.col("embedding")).alias("sig"),
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("sig").alias("qsig")
    )
    cand = (
        base.join(F.broadcast(queries), F.col("sig") == F.col("qsig"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def ann_lsh_topk_sql(n_queries: int = 5, k: int = 3) -> str:
    sig = lsh_signature_sql("embedding")
    cos = _cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH sigs AS (SELECT vec_id, embedding, {sig} AS sig FROM embeddings),
cand AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM sigs q JOIN sigs e ON q.sig = e.sig AND e.vec_id != q.vec_id
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


def ann_ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer → per-cluster
    inverted lists → probe the ``n_probe`` nearest centroids per query
    and brute-force only inside them. The 100 TB scale path: the corpus
    scan per query drops from N to ~N·n_probe/n_centroids, the index is
    one extra integer column (cluster id, partition-friendly), and the
    centroid table is tiny and driver/broadcast-sized by construction.
    Training uses Spark MLlib k-means (distributed, seeded); being an
    iterative algorithm it has no single-SQL oracle → rows-only driver
    check, invariants pinned in tests (results ⊆ probed clusters,
    cosines equal brute-force, high recall on clustered data)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    import numpy as np

    base = emb.select(F.col("vec_id"), _vec_double(F.col("embedding")).alias("v"))
    vecs = base.withColumn("fv", array_to_vector("v"))
    model = KMeans(
        k=n_centroids, seed=42, featuresCol="fv", predictionCol="cluster"
    ).fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "v", "cluster")

    # Queries are a bounded small set: collect their vectors and pick
    # each one's n_probe nearest centroids driver-side (n_centroids
    # rows of dim floats — trivially driver-sized at any corpus scale).
    centroids = np.array(model.clusterCenters())
    cnorm = np.linalg.norm(centroids, axis=1)
    qrows = base.filter(F.col("vec_id") < n_queries).collect()
    probes = []
    for r in qrows:
        q = np.array(r["v"])
        sims = (centroids @ q) / (cnorm * np.linalg.norm(q) + 1e-12)
        for c in np.argsort(-sims)[:n_probe]:
            probes.append((int(r["vec_id"]), list(map(float, q)), int(c)))
    probe_df = spark.createDataFrame(
        probes, "query_id long, qv array<double>, cluster int"
    )

    scored = (
        assigned.join(F.broadcast(probe_df), on="cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cluster"),
            cosine_sim(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cluster", "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def embedding_neardup_pairs(
    spark: SparkSession, emb: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ τ) within a ``label``
    block."""
    base = emb.select("label", "vec_id", _vec_double(F.col("embedding")).alias("v"))
    pairs = (
        base.alias("a")
        .join(base.alias("b"), on="label")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
    )
    return pairs.filter(F.col("cos_sim") >= threshold).select(
        "label", "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
    )


def embedding_neardup_pairs_sql(threshold: float = 0.95) -> str:
    cos = _cosine_sql("a.embedding", "b.embedding")
    return f"""
SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cos}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


# -- int8 quantization (4x memory vs float32 at 100 TB) ---------------------


def quantize_embeddings_int8(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization: q = round(x·127/s) with
    s = max|x| (stored alongside for dequantization). A numpy
    mapInPandas kernel — quantizing a billion-vector corpus is
    embarrassingly parallel, and int8+scale is 4× smaller than float32
    (the difference between an in-memory and a spilled ANN index)."""
    import numpy as np

    def batches(it):
        for pdf in it:
            ids, qs, scales = [], [], []
            for vec_id, v in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(v, dtype=np.float64)
                s = float(np.max(np.abs(x))) or 1.0
                q = np.clip(np.rint(x * 127.0 / s), -127, 127).astype(np.int8)
                ids.append(vec_id)
                qs.append(q.tolist())
                scales.append(s)
            yield pd.DataFrame({"vec_id": ids, "q": qs, "scale": scales})

    import pandas as pd  # noqa: F811 (local for executor pickling)

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, schema="vec_id long, q array<tinyint>, scale double"
    )


def ann_bruteforce_topk_int8(
    spark: SparkSession,
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
) -> DataFrame:
    """Brute-force top-k over the int8-quantized corpus: integer dot
    products (numpy, SIMD-friendly) rescaled by the stored per-vector
    scales — the memory-bound scale path. Recall vs the float path is
    pinned in ``test_int8_topk_overlap``."""
    import numpy as np

    q8 = quantize_embeddings_int8(emb)
    queries = q8.filter(F.col("vec_id") < n_queries)

    def score(it, qrows):
        qids = np.array([r["vec_id"] for r in qrows])
        qmat = np.stack([np.asarray(r["q"], dtype=np.int32) for r in qrows])
        qscale = np.array([r["scale"] for r in qrows]) / 127.0
        qnorm = np.linalg.norm(qmat * qscale[:, None], axis=1)
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.int32) for v in pdf["q"]]
            )
            scale = pdf["scale"].to_numpy() / 127.0
            dots = (mat @ qmat.T) * scale[:, None] * qscale[None, :]
            norms = np.linalg.norm(mat * scale[:, None], axis=1)
            denom = norms[:, None] * qnorm[None, :]
            cos = np.where(denom > 0, dots / denom, 0.0)
            n, m = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), m),
                    "cos_sim": cos.T.ravel(),
                }
            )

    import pandas as pd  # noqa: F811

    qrows = queries.collect()  # n_queries rows — tiny, broadcast by closure
    scored = q8.mapInPandas(
        lambda it: score(it, qrows),
        schema="query_id long, neighbor_id long, cos_sim double",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )
