"""Deduplication operators for training-data pipelines.

Five families, all shuffle-disciplined for 100 TB corpora:

- **exact**       — md5 fingerprint groupBy (one shuffle on a 16-byte key).
- **MinHash+LSH** — shingle → 16 salted min-hashes → 4 bands of 4 →
  equi-join on (band, key). The LSH band join is the scale path: only
  colliding candidates are ever paired, so cost is O(candidates), not
  O(n²). Candidates are verified with exact shingle-set Jaccard.
- **SimHash**     — 32-bit bit-vote signature per doc; hamming-close
  docs share signatures (or signature halves for 1-2 bit tolerance).
- **n-gram Jaccard** — exact char-4-gram Jaccard within a blocking key
  (``source``) — the quadratic verifier, bounded by block size.
- **embedding near-dup** — cosine over ``array<float>`` within a
  blocking key (``label``); the LSH-bucketed variant lives in
  ``operators/similarity.py``.

Every operator has an equivalent DuckDB SQL rendering for the
correctness oracle. Hash functions are the portable md5-prefix →
salted multiplicative family (``functions/text.py``), identical in both
engines. Operators are JVM-side array/lambda expressions, with one
deliberate exception: the MinHash *signature stage* defaults to an
Arrow-batched numpy kernel (``_minhash_sig_pandas``) because Catalyst
evaluates higher-order array lambdas interpreted, per element — the
vectorized kernel computes bit-identical signatures ~10-20× faster
(equivalence is tested; a pure-expression path remains available).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.operators import ensure_parallelism

from approximatequeryengine_spark.functions.hashing import portable_hash_col
from approximatequeryengine_spark.functions.text import (
    minhash_sql,
    str_hash32_col,
    str_hash32_sql,
    word_shingles_col,
    word_shingles_sql,
    ws_tokens_col,
    ws_tokens_sql,
)
from approximatequeryengine_spark.operators.text import fingerprint_cols, fingerprint_sql_parts

# -- exact dedup ------------------------------------------------------------


def exact_dup_groups(spark: SparkSession, docs: DataFrame, by: str = "fp_tokenset") -> DataFrame:
    """Duplicate groups under a fingerprint: one row per fingerprint with
    >1 member — representative = min doc_id (the canonical survivor)."""
    fps = fingerprint_cols(F.col("text"))
    per_doc = docs.select(F.col("doc_id"), fps[by].alias("fp"))
    return (
        per_doc.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_dup_groups_sql(by: str = "fp_tokenset") -> str:
    fp = fingerprint_sql_parts()[by]
    return (
        f"SELECT fp, count(*) AS group_size, min(doc_id) AS keep_doc_id "
        f"FROM (SELECT doc_id, {fp} AS fp FROM documents) __f "
        f"GROUP BY fp HAVING count(*) > 1"
    )


# verify='auto' dispatch cutoff: above this exact-duplicate ratio the
# corpus is dup-DENSE (candidate pairs grow quadratically in clique
# size) and the keys-only 'join' plan wins; the sf10 100-clique A/B in
# SCALING.md measured the crossover decisively (carry >1800 s vs join
# completing) at ratio ≈0.99, while organic corpora sit ≪0.1.
AUTO_DENSE_DUP_RATIO = 0.2

INGEST_FRACTION = 0.1  # hash-selected "incoming batch" slice
INGEST_SALT = 13


def ingest_dedup_stats(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Incremental-ingest dedup accounting — the nightly-batch shape: an
    incoming slice of documents is screened against the existing corpus
    by token-set fingerprint, classifying each incoming doc as (a) a
    duplicate of the existing corpus, (b) a within-batch duplicate
    (first-by-doc_id survives), or (c) genuinely new. One row per
    source: incoming count, the three buckets, and the accept rate.

    Plan shape at scale: the existing side reduces to its DISTINCT
    fingerprints before the join (one shuffle each side on a 32-hex
    key); within-batch dedup is a window over the same fingerprint key.
    Nothing rescans the corpus per batch beyond that fingerprint
    projection — and in a real deployment the existing-fingerprint
    table is the thing you'd persist between runs."""
    from approximatequeryengine_spark.functions.hashing import (
        fraction_threshold,
        portable_hash_col,
    )

    fps = fingerprint_cols(F.col("text"))
    # Hash-select the demo batch: the fixture's doc_id ≡ source (mod
    # #sources), so a modulus slice would correlate with source; the
    # salted hash is uncorrelated with every fixture dimension.
    inc = portable_hash_col(F.col("doc_id"), salt=INGEST_SALT) < F.lit(
        fraction_threshold(INGEST_FRACTION)
    )
    tagged = docs.select(
        "doc_id", "source", fps["fp_tokenset"].alias("fp"), inc.alias("incoming"),
    )
    existing_fps = tagged.filter(~F.col("incoming")).select("fp").distinct()
    incoming = tagged.filter(F.col("incoming"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = (
        incoming.join(
            existing_fps.withColumn("in_existing", F.lit(True)), on="fp", how="left"
        )
        .withColumn("rk", F.row_number().over(w))
        .select(
            "source",
            F.coalesce(F.col("in_existing"), F.lit(False)).alias("dup_existing"),
            (F.col("rk") > 1).alias("dup_batch"),
        )
    )
    new_doc = ~F.col("dup_existing") & ~F.col("dup_batch")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum(F.col("dup_existing").cast("long")).alias("n_dup_existing"),
            F.sum((F.col("dup_batch") & ~F.col("dup_existing")).cast("long")).alias(
                "n_dup_batch"
            ),
            F.sum(new_doc.cast("long")).alias("n_new"),
            F.round(
                F.sum(new_doc.cast("long")) / F.count(F.lit(1)), 6
            ).alias("accept_rate"),
        )
        .orderBy("source")
    )


def ingest_dedup_stats_sql() -> str:
    from approximatequeryengine_spark.functions.hashing import (
        fraction_threshold,
        portable_hash_sql,
    )

    fp = fingerprint_sql_parts()["fp_tokenset"]
    inc = f"{portable_hash_sql('doc_id', INGEST_SALT)} < {fraction_threshold(INGEST_FRACTION)}"
    return f"""
WITH tagged AS (
  SELECT doc_id, source, {fp} AS fp,
         {inc} AS incoming
  FROM documents
),
existing AS (SELECT DISTINCT fp FROM tagged WHERE NOT incoming),
flagged AS (
  SELECT t.source,
         e.fp IS NOT NULL AS dup_existing,
         row_number() OVER (PARTITION BY t.fp ORDER BY t.doc_id) > 1 AS dup_batch
  FROM tagged t LEFT JOIN existing e USING (fp)
  WHERE t.incoming
)
SELECT source, count(*) AS n_incoming,
       CAST(sum(CASE WHEN dup_existing THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_existing,
       CAST(sum(CASE WHEN dup_batch AND NOT dup_existing THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_batch,
       CAST(sum(CASE WHEN NOT dup_existing AND NOT dup_batch THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       round(CAST(sum(CASE WHEN NOT dup_existing AND NOT dup_batch THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS accept_rate
FROM flagged GROUP BY source ORDER BY source
"""


# -- MinHash + LSH ----------------------------------------------------------

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = N_HASHES // BANDS


def minhash_array_col(ints: Column) -> Column:
    """All ``N_HASHES`` minhashes in ONE pass over the shingle-int
    array: ``aggregate`` folds each element's 16 salted hashes into a
    running element-wise minimum. Crucially the expensive
    text→tokens→shingles→hash32 chain feeding ``ints`` is referenced
    exactly ONCE — a 16-separate-columns formulation gets inlined by
    projection collapse and re-evaluates the whole chain per column
    (measured 17× slower on the documents fixture). Sentinel 2³² for
    empty shingle sets (instead of NULL) keeps the fold total."""
    from approximatequeryengine_spark.functions.hashing import (
        HASH_SPACE,
        M31,
        MULT,
        MULT2,
        OFFSET,
        SALT_STRIDE,
    )

    def salted(s: Column, j: Column) -> Column:
        t1 = (F.abs(s.cast("long")) + j.cast("long") * F.lit(SALT_STRIDE)) % F.lit(M31)
        t2 = (t1 * F.lit(MULT) + F.lit(OFFSET)) % F.lit(HASH_SPACE)
        return ((t2 % F.lit(M31)) * F.lit(MULT2) + F.lit(144)) % F.lit(HASH_SPACE)

    idx = F.sequence(F.lit(0), F.lit(N_HASHES - 1))
    init = F.expr(f"array_repeat(CAST({HASH_SPACE} AS BIGINT), {N_HASHES})")
    return F.aggregate(
        ints,
        init,
        lambda acc, s: F.zip_with(
            acc, F.transform(idx, lambda j: salted(s, j)), lambda a, b: F.least(a, b)
        ),
    )


_JAVA_WS = "".join(chr(c) for c in range(0x21))  # String.trim strips ≤ U+0020


def _sig_fanout(docs: DataFrame) -> int:
    """Partition count for the signature stage: size-proportional for
    small corpora (fanning a 5000-doc fixture to every core pays more
    per-task Python-worker round-trip than it buys — guide §2,
    scale-adaptive partitioning), full default parallelism for large or
    unknown-size inputs where the shingle/md5 kernel genuinely needs
    the cores. ``weight=8``: the minhash kernel runs ~8× the per-byte
    CPU of the light text expressions the quantum is calibrated for."""
    from approximatequeryengine_spark.operators import parallelism_target

    t = parallelism_target(docs, weight=8.0)
    if t:
        return t
    return docs.sparkSession.sparkContext.defaultParallelism


def _minhash_sig_pandas(docs: DataFrame, shingle_size: int, n_parts: int) -> DataFrame:
    """Arrow fast path: per-batch numpy minhash. Bit-identical to the
    expression path (same Java-regex tokenization ``[ \\t\\n\\x0b\\f\\r]+``,
    same md5-prefix string hash, same salted arithmetic in int64 — no
    overflow: (2³¹−1)·MULT < 2⁶³−1), ~20× faster because the per-shingle
    work is two vectorized matrix ops instead of an interpreted
    expression tree per element."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    from approximatequeryengine_spark.functions.hashing import (
        HASH_SPACE,
        M31,
        MULT,
        MULT2,
        OFFSET,
        SALT_STRIDE,
    )

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
    salts = (np.arange(N_HASHES, dtype=np.int64) * SALT_STRIDE)[None, :]

    def batches(it):
        # Per-task memo: replicas (identical text) share one signature
        # computation — in the replica-dense ingest corpora most rows
        # skip the shingle+md5+minhash work. Capped at 64k entries AND
        # by stored shingle volume: each entry's shingle list holds
        # every token ~shingle_size times, so on distinct-heavy splits
        # of large documents an entry-count cap alone could pin several
        # times the split size per concurrent task. Past either cap rows
        # simply compute; no eviction churn.
        memo: dict[str, tuple[list, list]] = {}
        memo_chars = 0
        memo_char_budget = 1 << 24  # ~16M shingle chars per task, max
        for pdf in it:
            ids, shs, mhs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hit = memo.get(text)
                if hit is not None:
                    ids.append(doc_id)
                    shs.append(hit[0])
                    mhs.append(hit[1])
                    continue
                t = text.strip(_JAVA_WS)
                toks = ws_re.split(t) if t else []
                if len(toks) >= shingle_size:
                    sh = [
                        " ".join(toks[i : i + shingle_size])
                        for i in range(len(toks) - shingle_size + 1)
                    ]
                else:
                    sh = [" ".join(toks)]
                sh = list(dict.fromkeys(sh))  # array_distinct
                ints = np.fromiter(
                    (
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                t1 = (np.abs(ints)[:, None] + salts) % M31
                t2 = (t1 * MULT + OFFSET) % HASH_SPACE
                h = ((t2 % M31) * MULT2 + 144) % HASH_SPACE
                mh = h.min(axis=0) if len(sh) else np.full(N_HASHES, HASH_SPACE, dtype=np.int64)
                mh_l = mh.tolist()
                sh_chars = sum(len(s) for s in sh)
                if len(memo) < 65536 and memo_chars + sh_chars <= memo_char_budget:
                    memo[text] = (sh, mh_l)
                    memo_chars += sh_chars
                ids.append(doc_id)
                shs.append(sh)
                mhs.append(mh_l)
            yield pd.DataFrame({"doc_id": ids, "sh": shs, "mh": mhs})

    # Trailing repartition = exchange barrier ABOVE the kernel: every
    # consumer reads the computed signatures from the shuffle (AQE
    # ReusedExchange) instead of re-running the kernel per plan subtree.
    return (
        docs.repartition(n_parts, "doc_id")
        .select("doc_id", "text")
        # NULL text has no content: excluded from the signature table.
        # The expression path reaches the same end state via NULL
        # propagation (NULL shingles -> no band rows), and the oracle's
        # NULL band keys never join — this keeps the kernel equivalent
        # instead of crashing on None.
        .filter(F.col("text").isNotNull())
        .mapInPandas(batches, schema="doc_id long, sh array<string>, mh array<long>")
        .repartition(n_parts, "doc_id")
    )


def _auto_verify_choice(docs: DataFrame, profile=None) -> str:
    """Pick the MinHash verify plan from duplicate density: 'join'
    above ``AUTO_DENSE_DUP_RATIO`` (dup-dense, quadratic clique pairs
    must travel keys-only), else 'carry'.

    Density source, in preference order (round 8, VERDICT r7 #6):

    1. ``profile`` — a persisted ``ingest_dedup_stats`` output (parquet
       path or DataFrame). Dup ratio = 1 − Σn_new/Σn_incoming, read
       from O(sources) rows: ZERO extra corpus scans, which is the
       whole point at 100 TB. An unreadable/missing path falls through.
    2. The probe: one bounded aggregate measuring the exact-duplicate
       ratio (1 − distinct token-set fingerprints / docs — the same
       statistic the ingest profile accounts per batch) — one extra
       fingerprint scan before any dedup work."""
    if profile is not None:
        prof_df = profile
        if isinstance(profile, str):
            try:
                prof_df = docs.sparkSession.read.parquet(profile)
            except Exception:
                prof_df = None  # no profile persisted yet → probe
        if prof_df is not None:
            row = prof_df.agg(
                F.sum("n_incoming").alias("n"), F.sum("n_new").alias("new")
            ).collect()[0]
            dup_ratio = 0.0 if not row["n"] else 1.0 - row["new"] / row["n"]
            return "join" if dup_ratio > AUTO_DENSE_DUP_RATIO else "carry"
    fp = fingerprint_cols(F.col("text"))["fp_tokenset"]
    prof = (
        docs.filter(F.col("text").isNotNull())
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct(fp).alias("d"))
        .collect()[0]
    )
    dup_ratio = 0.0 if not prof["n"] else 1.0 - prof["d"] / prof["n"]
    return "join" if dup_ratio > AUTO_DENSE_DUP_RATIO else "carry"


def minhash_lsh_pairs(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_size: int = 3,
    use_arrow: bool = True,
    verify: str = "carry",
    profile: "DataFrame | str | None" = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH banding for candidates, exact
    shingle-Jaccard verification. Returns (doc_a, doc_b, jaccard).

    Shuffle discipline: one repartition BEFORE the signature chain (the
    per-row CPU cost dominates — a single input file must not mean a
    single task) and one AFTER it (an exchange barrier, so the band
    fan-out below reads ``mh``/``sh`` as physical columns instead of
    re-inlining the signature expression 16×). ``use_arrow`` picks the
    vectorized numpy signature stage (default); the pure-JVM expression
    path computes the identical signatures and exists for environments
    where Arrow is unavailable (equivalence is tested).

    ``verify`` picks where the shingle payload travels — the output
    pairs are IDENTICAL either way (equivalence is tested); the knob is
    a physical-plan choice keyed on corpus duplicate density, which a
    pipeline knows from its ingest profile (``dedup_ingest_stats`` /
    exact-dup groups) before any near-dup pass runs:

    - ``'carry'`` (default, sparse-optimal): the shingle arrays ride
      along through the band fan-out, so the band self-join's output
      pairs already carry both sides' shingles and verification is
      join-free — the signature stage is computed exactly ONCE (the
      band exchange is reused for both self-join sides). Cost: the
      band shuffle carries sh ``BANDS``×, and every CANDIDATE pair row
      carries two full shingle arrays — Σ_buckets C(|bucket|, 2) ×
      payload through the dedup shuffle, quadratic in clique size.
    - ``'join'`` (dense-clique-optimal): the band fan-out and the
      candidate self-join carry KEYS ONLY (band, key, doc_id); the
      deduplicated candidate list then joins the single shingle table
      back in (twice) from the same reused signature exchange. The
      quadratic term shrinks to two longs per candidate row — measured
      at the 100-replica sf10 corpus (every doc in a 100-clique,
      ~24.7M organic pairs): carry > 1800 s, join completes the same
      output (SCALING.md round-6). The trade is two extra hash joins
      of the verified-candidate set against O(docs) shingle rows —
      noise while candidates ≳ docs, which is exactly the dense
      regime.

    This mirrors the persisted-index layout (``neardup_index_write``:
    slim band table + ONE shingle table), which is the petabyte-scale
    shape — at that size you materialize signatures once and every
    batch joins against the store instead of re-shingling.

    ``verify='auto'`` measures the density instead of asking for it:
    one bounded aggregate computes the exact-duplicate ratio
    (1 − distinct fingerprints / docs — the ingest-profile statistic
    ``ingest_dedup_stats`` accounts per batch) and dispatches 'join'
    when it exceeds ``AUTO_DENSE_DUP_RATIO``, else 'carry' — the same
    measure-then-dispatch pattern as ``ann_auto_topk``. The probe is
    one extra fingerprint scan + 1-row collect; a pipeline that already
    persists its ingest profile passes it as ``profile`` (path or
    DataFrame of ``ingest_dedup_stats`` output) and auto mode reads dup
    density from those O(sources) rows instead of re-scanning — a
    missing/unreadable path falls back to the probe."""
    if verify == "auto":
        verify = _auto_verify_choice(docs, profile=profile)
    if verify not in ("carry", "join"):
        raise ValueError(
            f"verify must be 'carry', 'join' or 'auto', got {verify!r}"
        )
    n_parts = _sig_fanout(docs)
    if use_arrow:
        sig_df = _minhash_sig_pandas(docs, shingle_size, n_parts)
    else:
        toks = ws_tokens_col(F.col("text"))
        shingles = F.array_distinct(word_shingles_col(toks, shingle_size))
        ints = F.transform(shingles, str_hash32_col)
        sig_df = (
            docs.repartition(n_parts, "doc_id")
            .select(
                F.col("doc_id"),
                shingles.alias("sh"),
                minhash_array_col(ints).alias("mh"),
            )
            .repartition(n_parts, "doc_id")
        )
    if verify == "carry":
        bands = sig_df.select(
            "doc_id", "sh", F.explode(_band_key_col()).alias("bk")
        ).select(
            "doc_id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
        cand = (
            bands.alias("a")
            .join(bands.alias("b"), on=["band", "key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.sh").alias("sh_a"),
                F.col("b.sh").alias("sh_b"),
            )
            # A pair colliding in k bands appears k times — keep one.
            .dropDuplicates(["doc_a", "doc_b"])
        )
    else:  # verify == "join": keys-only fan-out, shingles joined back
        bands_k = sig_df.select(
            "doc_id", F.explode(_band_key_col()).alias("bk")
        ).select(
            "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
        cand_keys = (
            bands_k.alias("a")
            .join(bands_k.alias("b"), on=["band", "key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sh_tbl = sig_df.select("doc_id", "sh")
        cand = cand_keys.join(
            sh_tbl.select(
                F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        ).join(
            sh_tbl.select(
                F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
    jac = cand.select(
        "doc_a",
        "doc_b",
        # Guard 0/0: two empty shingle sets collide on the sentinel
        # signature; their Jaccard is undefined → NULL → filtered.
        F.when(
            F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))) > 0,
            F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
            / F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double"),
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_lsh_pairs_sql(threshold: float = 0.5, shingle_size: int = 3) -> str:
    toks = ws_tokens_sql("text")
    shing = word_shingles_sql("t", shingle_size)
    sig_exprs = ", ".join(
        f"{minhash_sql('si', j)} AS mh{j}" for j in range(N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || ':' || ".join(
                f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
shv AS (SELECT doc_id, list_distinct({shing}) AS sh FROM tok),
ints AS (SELECT doc_id, sh, list_transform(sh, s -> {str_hash32_sql('s')}) AS si FROM shv),
sig AS (SELECT doc_id, sh, {sig_exprs} FROM ints),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
jac AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         / len(list_distinct(x.sh || y.sh)) AS jaccard
  FROM cand JOIN shv x ON cand.doc_a = x.doc_id
            JOIN shv y ON cand.doc_b = y.doc_id
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM jac
WHERE jaccard >= {threshold}
"""


# -- persisted near-dup signature index -------------------------------------


def _band_key_col() -> Column:
    """The band/key fan-out expression shared by the in-memory pairs
    operator and the persisted index (one struct per band, key = the
    ':'-joined band rows of the signature)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.element_at("mh", b * ROWS_PER_BAND + r + 1).cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("key"),
            )
            for b in range(BANDS)
        ]
    )


def neardup_index_write(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    shingle_size: int = 3,
) -> None:
    """Materialize the MinHash signature index to storage — the
    petabyte-scale shape ``minhash_lsh_pairs``' docstring promises:
    corpus signatures are computed ONCE (Arrow kernel) and persisted as
    TWO tables: a slim band-partitioned candidate table
    (``path/bands``: band, key, doc_id — integers and a short string,
    no payload) and ONE copy of the shingle sets keyed by doc_id
    (``path/shingles``). The dominant storage term (shingles) is stored
    exactly once instead of once per band — 4× smaller than a
    band-exploded payload layout — and verification joins shingles in
    only for the (sparse) candidate set. Every incoming batch then
    joins its own O(batch) band table against the store instead of
    re-shingling the corpus."""
    n_parts = _sig_fanout(docs)
    sig = _minhash_sig_pandas(docs, shingle_size, n_parts)
    bands = sig.select("doc_id", F.explode(_band_key_col()).alias("bk")).select(
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "doc_id",
    )
    bands.write.partitionBy("band").mode("overwrite").parquet(f"{path}/bands")
    sig.select("doc_id", "sh").write.mode("overwrite").parquet(f"{path}/shingles")


def neardup_index_query(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-duplicates of an incoming batch AGAINST the persisted index:
    (batch_doc, index_doc, jaccard ≥ threshold). Candidates come from
    equality on the stored (band, key); verification joins the single
    stored shingle table in for the candidate set only — the index side
    is never re-shingled and its payload is read once per matched doc,
    not once per band. Batch-internal duplicates are out of scope here
    (run ``minhash_lsh_pairs`` on the batch for those)."""
    n_parts = _sig_fanout(new_docs)
    index_bands = spark.read.parquet(f"{path}/bands")
    index_sh = spark.read.parquet(f"{path}/shingles")
    sig = _minhash_sig_pandas(new_docs, shingle_size, n_parts)
    batch_bands = sig.select(
        "doc_id", "sh", F.explode(_band_key_col()).alias("bk")
    ).select(
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
        F.col("doc_id").alias("batch_doc"), F.col("sh").alias("sh_b"),
    )
    cand = (
        batch_bands.join(index_bands, on=["band", "key"])
        .filter(F.col("batch_doc") != F.col("doc_id"))
        .select("batch_doc", F.col("doc_id").alias("index_doc"), "sh_b")
        .dropDuplicates(["batch_doc", "index_doc"])
        .join(
            index_sh.select(
                F.col("doc_id").alias("index_doc"), F.col("sh").alias("sh_i")
            ),
            on="index_doc",
        )
    )
    jac = cand.select(
        "batch_doc",
        "index_doc",
        F.when(
            F.size(F.array_union(F.col("sh_b"), F.col("sh_i"))) > 0,
            F.size(F.array_intersect(F.col("sh_b"), F.col("sh_i")))
            / F.size(F.array_union(F.col("sh_b"), F.col("sh_i"))).cast("double"),
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "batch_doc", "index_doc", F.round("jaccard", 6).alias("jaccard")
    )


def neardup_index_query_sql(
    threshold: float = 0.5,
    shingle_size: int = 3,
    batch_where: str | None = None,
) -> str:
    """DuckDB oracle for the index-query path: re-derives BOTH sides'
    signatures from the documents table (the index is just materialized
    state — its contents are a pure function of the corpus split), bands
    them, and joins across the split. ``batch_where`` selects the
    incoming batch; its complement is the indexed corpus."""
    from approximatequeryengine_spark.functions.hashing import (
        fraction_threshold,
        portable_hash_sql,
    )

    if batch_where is None:
        batch_where = (
            f"{portable_hash_sql('doc_id', INGEST_SALT)} < "
            f"{fraction_threshold(INGEST_FRACTION)}"
        )
    toks = ws_tokens_sql("text")
    shing = word_shingles_sql("t", shingle_size)
    sig_exprs = ", ".join(f"{minhash_sql('si', j)} AS mh{j}" for j in range(N_HASHES))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, is_batch, sh, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || ':' || ".join(
                f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    return f"""
WITH tok AS (SELECT doc_id, ({batch_where}) AS is_batch, {toks} AS t FROM documents),
shv AS (SELECT doc_id, is_batch, list_distinct({shing}) AS sh FROM tok),
ints AS (SELECT doc_id, is_batch, sh,
                list_transform(sh, s -> {str_hash32_sql('s')}) AS si FROM shv),
sig AS (SELECT doc_id, is_batch, sh, {sig_exprs} FROM ints),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS index_doc
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.is_batch AND NOT b.is_batch AND a.doc_id != b.doc_id
),
jac AS (
  SELECT batch_doc, index_doc,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         / len(list_distinct(x.sh || y.sh)) AS jaccard
  FROM cand JOIN shv x ON cand.batch_doc = x.doc_id
            JOIN shv y ON cand.index_doc = y.doc_id
)
SELECT batch_doc, index_doc, round(jaccard, 6) AS jaccard FROM jac
WHERE jaccard >= {threshold}
"""


# -- connected-component cluster resolution ---------------------------------


def dedup_connected_clusters(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = 0.5,
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS (connected
    components) and pick one survivor per cluster — the step a
    production dedup pipeline runs after candidate detection, since
    near-duplication is transitive in effect (A≈B, B≈C ⇒ keep one of
    {A,B,C}) but pairwise output alone can't say so.

    Algorithm: hash-min label propagation — every doc starts labeled
    with its own id; each round joins labels across the (undirected)
    near-dup edges and keeps the minimum; converges in ≤ diameter
    rounds (components here are near-cliques from LSH candidates, so
    2-3 rounds in practice). Each round is one join + one groupBy —
    the standard BSP connected-components shape that scales out (for
    web-scale graphs you'd switch to large-star/small-star to bound
    skew, same API). The driver-side convergence check mirrors the
    adaptive CLT loop's bounded sync.

    Deterministic (min over ids), so the DuckDB oracle re-derives the
    same components with a recursive transitive-closure CTE over the
    same MinHash pairs. Returns (cluster_id, n_members, n_dups_removed)
    per multi-member cluster; cluster_id doubles as the surviving
    doc_id."""
    # verify='join': clustering is the dup-DENSE regime by definition
    # (you run it because the corpus has clique structure), which is
    # exactly where the keys-only candidate plan wins — measured 4.2×
    # at the 100-clique sf10 corpus (SCALING.md round-6); pair output
    # is identical (physical-only knob, equivalence-tested).
    edges = minhash_lsh_pairs(spark, docs, threshold=threshold, verify="join").select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    )
    edges = edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    edges = edges.distinct().persist()
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    # Convergence check via the label-sum invariant: hash-min labels
    # are monotone NON-INCREASING per node, so the total label sum
    # strictly decreases iff any node changed — one map-side-combined
    # aggregate per round instead of the old full label-vs-label join
    # (exactly the same stop round). DECIMAL(38,0): a BIGINT sum of
    # doc-id labels overflows at web-scale node counts.
    _lbl_sum = lambda frame: frame.agg(  # noqa: E731
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    prev_sum = _lbl_sum(labels)  # also materializes the labels cache
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["s"] == labels["node"])
            .groupBy(F.col("d").alias("node2"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            )
            .persist()
        )
        new_sum = _lbl_sum(new_labels)  # materializes the round's cache
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # A silent exit here would split one component into several
        # clusters and diverge from the oracle's transitive closure with
        # no hint at the cause. LSH components are near-cliques (diameter
        # 2-3), so hitting this means pathological chain-shaped data —
        # surface it rather than return wrong clusters.
        edges.unpersist()
        labels.unpersist()  # the last persisted rung — don't leak it
        raise RuntimeError(
            f"dedup_connected_clusters: label propagation did not "
            f"converge within max_iterations={max_iterations}; component "
            f"diameter exceeds the round budget — raise max_iterations"
        )
    out = (
        labels.groupBy(F.col("lbl").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .select(
            "cluster_id",
            "n_members",
            (F.col("n_members") - 1).alias("n_dups_removed"),
        )
        .orderBy("cluster_id")
    )
    edges.unpersist()
    return out


def dedup_connected_clusters_sql(threshold: float = 0.5) -> str:
    pairs = minhash_lsh_pairs_sql(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({pairs}) __p),
e AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
cc(n, m) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM e) __v
  UNION
  SELECT cc.n, e.d FROM cc JOIN e ON cc.m = e.s
)
SELECT min_m AS cluster_id, count(*) AS n_members,
       count(*) - 1 AS n_dups_removed
FROM (SELECT n, min(m) AS min_m FROM cc GROUP BY n) __l
GROUP BY min_m HAVING count(*) > 1
ORDER BY cluster_id
"""


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_col(text: Column) -> Column:
    """32-bit SimHash over distinct whitespace tokens: per bit, majority
    vote of token-hash bits."""
    toks = F.array_distinct(ws_tokens_col(text))
    hashes = F.transform(toks, str_hash32_col)
    n = F.size(hashes)

    def _bit_counter(b: int):
        # binary lambda only — see _salted() note about pyspark lambdas.
        return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1))

    bits = []
    for b in range(SIMHASH_BITS):
        ones = F.aggregate(hashes, F.lit(0).cast("long"), _bit_counter(b))
        bits.append(F.when(ones * 2 > n, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return F.when(n == 0, F.lit(0).cast("long")).otherwise(out)


def simhash_sql(text: str = "text") -> str:
    toks = f"list_distinct({ws_tokens_sql(text)})"
    hashes = f"list_transform({toks}, tk -> {str_hash32_sql('tk')})"
    terms = []
    for b in range(SIMHASH_BITS):
        ones = f"list_sum(list_transform(h, v -> (v >> {b}) & 1))"
        terms.append(f"(CASE WHEN {ones} * 2 > len(h) THEN {2**b} ELSE 0 END)")
    total = " + ".join(terms)
    return (
        f"(SELECT CASE WHEN len(h) = 0 THEN 0 ELSE {total} END "
        f"FROM (SELECT {hashes} AS h) __sh)"
    )


def _simhash32_pandas(docs: DataFrame) -> DataFrame:
    """Arrow fast path for the 32-bit SimHash: per-doc signature in one
    vectorized pass. Bit-identical to ``simhash_col`` (same ``_JAVA_WS``
    strip + Java-``\\s+`` tokenization, same distinct-token md5-prefix
    hash, same ``ones·2 > n`` majority; NULL and empty text → 0 — the
    expression's per-bit ``otherwise(0)`` collapses the NULL lineage to
    0, as does the oracle's per-term ``ELSE 0``) — pinned by
    ``test_simhash_arrow_matches_expression``.
    Why: ``simhash_col`` builds 32 separate interpreted array folds and
    each re-evaluates the tokenize+md5 transform (higher-order
    expressions get no codegen and interpreted projections do no
    common-subexpression elimination) — tokenize+md5 ran ~32× per doc."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s
    bitpos = np.arange(SIMHASH_BITS, dtype=np.int64)
    weights = np.int64(1) << bitpos

    def batches(it):
        memo: dict[str, int] = {}
        for pdf in it:
            srcs, sims = [], []
            for source, text in zip(pdf["source"], pdf["text"]):
                srcs.append(source)
                if text is None:
                    sims.append(0)
                    continue
                hit = memo.get(text)
                if hit is not None:
                    sims.append(hit)
                    continue
                t = text.strip(_JAVA_WS)
                toks = list(dict.fromkeys(ws_re.split(t))) if t else []
                n = len(toks)
                if n == 0:
                    sim = 0
                else:
                    hs = np.fromiter(
                        (
                            int(hashlib.md5(tk.encode("utf-8")).hexdigest()[:8], 16)
                            for tk in toks
                        ),
                        dtype=np.int64,
                        count=n,
                    )
                    ones = ((hs[:, None] >> bitpos) & 1).sum(axis=0)
                    sim = int((weights * (ones * 2 > n)).sum())
                if len(memo) < 65536:
                    memo[text] = sim
                sims.append(sim)
            yield pd.DataFrame({"source": srcs, "simhash": sims}, dtype=object)

    return docs.select("source", "text").mapInPandas(
        batches, schema="source string, simhash long"
    )


def simhash_summary(
    spark: SparkSession, docs: DataFrame, use_arrow: bool = True
) -> DataFrame:
    """Per-source SimHash diversity — collisions indicate near-dups."""
    docs = ensure_parallelism(docs, weight=4.0)
    if use_arrow:
        per_doc = _simhash32_pandas(docs)
    else:
        per_doc = docs.select(
            F.col("source"), simhash_col(F.col("text")).alias("simhash")
        )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("simhash").alias("n_distinct_simhash"),
    )


def simhash_summary_sql() -> str:
    return (
        f"SELECT source, count(*) AS n_docs, "
        f"count(DISTINCT {simhash_sql('text')}) AS n_distinct_simhash "
        f"FROM documents GROUP BY source"
    )


# -- n-gram Jaccard within blocks ------------------------------------------


def _char_ngrams(text: Column, n: int = 4) -> Column:
    # substring via expr to use the (col, pos_col, len) form
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(text) - n, F.lit(0))),
            lambda i: text.substr(i + 1, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = 0.55,
    n: int = 4,
    plan: str = "prefix",
) -> DataFrame:
    """Exact char-n-gram Jaccard pairs (≥ ``threshold``) within a
    ``source``. Two physical plans produce the IDENTICAL pair set
    (equivalence pinned in tests/test_pipeline_ops.py):

    ``plan='prefix'`` (default) — **prefix filtering** under a global
    rarest-first gram order (the published AllPairs/PPJoin principle):
    if ``J(A,B) ≥ τ`` then ``|A∩B| ≥ ⌈τ·|A|⌉``, and any |A∩B| ≥ o
    forces a common gram inside the first ``|A|−o+1`` grams of BOTH
    sets under one total order — so probing only each doc's
    ``⌊(1−τ)·|A|⌋+1``-gram prefix, ordered by ascending document
    frequency (rarest grams first, ties by gram), is lossless while
    making candidate collisions rare by construction. Candidates are
    keys-only (the full gram arrays are re-joined for verification
    only for surviving pairs — the same payload lesson as
    ``minhash_lsh_pairs(verify='join')``), pre-filtered by the size
    bound J ≤ min/max with a slack of one gram so float τ·max can
    never drop an exact-boundary pair. The full-registry sf1 sweep
    caught the need: on a near-dup-dense corpus every doc shares its
    size class, so the size-class blocks go quadratic — 363 s at sf1
    vs 29 s for MinHash on MORE output; prefix filtering bounds
    per-gram fan-out instead of per-block membership.

    ``plan='sizeclass'`` — the previous lossless blocking on
    ``(source, bit_length(|gram set|))``: J ≥ τ ≥ 0.5 forces gram-set
    sizes within 2×, so ``floor(log2)`` differs by ≤ 1 and probing
    ``{blen, blen+1}`` catches every qualifying pair. Bounded only
    when sizes spread — degenerates on uniform-length corpora (kept
    for A/B measurement and as the cheaper plan when |block| is small).

    The DuckDB oracle keeps the simple declarative quadratic; the
    correctness gate certifies both plans against it. Requires
    ``threshold ≥ 0.5`` (both plans' bounds need it); at lower
    thresholds fall back on ``minhash_lsh_pairs``."""
    if threshold < 0.5:
        raise ValueError(
            "lossless blocking/prefix bounds need threshold >= 0.5; "
            f"got {threshold} — use minhash_lsh_pairs for loose thresholds"
        )
    if plan not in ("prefix", "sizeclass"):
        raise ValueError(f"plan must be 'prefix' or 'sizeclass', got {plan!r}")
    docs = ensure_parallelism(docs)
    # Exchange barrier ABOVE the gram computation (the certified
    # _minhash_sig_pandas pattern): tok, and the two verification
    # sides ga/gb, all consume `grams` — without the barrier the
    # interpreted char-ngram transform re-ran once per consumer
    # (~1 s × 3 at sf0.1); with it every consumer reads the computed
    # arrays from one shuffle (AQE ReusedExchange). Round 10: the
    # EXECUTED plan showed reuse engaging for only one of the three —
    # column pruning gave ga/gb a 2-column subtree whose canonical form
    # no longer matched the 3-column barrier exchange — so ga/gb below
    # keep `source` live by joining on it (an equality that always
    # holds: doc_id determines source), which makes all three consumer
    # subtrees canonically identical. Verified: 2 ReusedExchange of the
    # barrier in the final adaptive plan (an intra-query persist was
    # measured as the alternative and LOST — cache write + eager
    # materialization cost more than the two saved transforms).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    grams = docs.select(
        F.col("source"), F.col("doc_id"), _char_ngrams(F.col("text"), n).alias("g")
    ).repartition(n_parts, "doc_id")

    if plan == "sizeclass":
        blocked = grams.withColumn(
            "blen", F.length(F.bin(F.greatest(F.size("g"), F.lit(1))))
        )
        probe = blocked.select(
            "source",
            "doc_id",
            "g",
            F.explode(F.array(F.col("blen"), F.col("blen") + 1)).alias("bkey"),
        )
        pairs = (
            probe.alias("a")
            .join(
                blocked.alias("b"),
                (F.col("a.source") == F.col("b.source"))
                & (F.col("a.bkey") == F.col("b.blen")),
            )
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.col("a.source").alias("source"),
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                (
                    F.size(F.array_intersect(F.col("a.g"), F.col("b.g")))
                    / F.size(F.array_union(F.col("a.g"), F.col("b.g"))).cast("double")
                ).alias("jaccard"),
            )
        )
        return (
            pairs.filter(F.col("jaccard") >= threshold)
            # equal-size-class pairs are probed from both sides — keep one.
            .dropDuplicates(["doc_a", "doc_b"])
            .select(
                "source", "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
            )
        )

    # plan == 'prefix'
    tok = grams.select(
        "source", "doc_id", F.size("g").alias("sz"), F.explode("g").alias("gram")
    )
    # document frequency per (source, gram): rarest-first is what makes
    # prefix grams collide rarely. One linear grouped count.
    df_ = tok.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("df"))
    # rank is induced by ONE global total order (df asc, gram asc), so
    # rank comparisons are CONSISTENT across documents — the property
    # the exact count-bound below rests on.
    ranked = tok.join(df_, ["source", "gram"]).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("source", "doc_id").orderBy("df", "gram")
        ),
    )

    # AllPairs asymmetric prefixes (smaller doc probes, larger indexes):
    #   index prefix  ⌊(1−τ)·sz⌋ + 1          ( = sz − ⌈τ·sz⌉ + 1 )
    #   probe prefix  ⌊(1−τ)/(1+τ)·sz⌋ + 1    ( = sz − ⌈2τ/(1+τ)·sz⌉ + 1 )
    # Losslessness: J ≥ τ forces overlap o ≥ ⌈τ/(1+τ)·(szA+szB)⌉; with
    # szA ≤ szB that is ≥ ⌈2τ/(1+τ)·szA⌉ and ≥ ⌈τ·szB⌉, and any o-sized
    # overlap must place a common gram within the first sz−o+1 grams of
    # BOTH sets under the shared order. +1e-9 guards the only unsafe
    # float direction (the product landing a hair below an exact
    # integer would shorten a prefix; true non-integers of these small
    # rationals sit orders of magnitude further from integers).
    plen_index = F.floor(F.lit(1.0 - threshold) * F.col("sz") + F.lit(1e-9)) + 1
    plen_probe = (
        F.floor(
            F.lit((1.0 - threshold) / (1.0 + threshold)) * F.col("sz")
            + F.lit(1e-9)
        )
        + 1
    )
    probe = ranked.filter(F.col("rank") <= plen_probe).select(
        "source", "gram", "doc_id", "sz", "rank"
    )
    index = ranked.filter(F.col("rank") <= plen_index).select(
        "source", "gram", "doc_id", "sz", "rank"
    )
    joined = (
        probe.alias("a")
        .join(index.alias("b"), ["source", "gram"])
        # probe side is the smaller set (ties by doc_id) — each
        # qualifying pair is generated from exactly one direction
        .filter(
            (F.col("a.sz") < F.col("b.sz"))
            | ((F.col("a.sz") == F.col("b.sz")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        )
        # size bound J ≤ min/max, slack one gram against float τ·max
        .filter(
            F.col("a.sz").cast("double") >= F.lit(threshold) * F.col("b.sz") - 1.0
        )
    )
    # Exact overlap upper bound per candidate pair, aggregate form of
    # PPJoin's position filter: let g* be the max-key gram shared by
    # both prefixes (the generation rows). Every shared gram with key
    # BELOW key(g*) is automatically inside both prefixes (prefixes are
    # downward-closed in the shared order) — so it is counted in c_pre;
    # every shared gram with key ABOVE key(g*) ranks after g* in BOTH
    # docs, so their count is ≤ min(szA − rank_A(g*), szB − rank_B(g*)).
    # Hence o ≤ c_pre + min(szA − max(rank_a), szB − max(rank_b)) — an
    # EXACT bound from quantities the candidate groupBy yields for free
    # (it replaces the .distinct() the first cut used, at the same
    # shuffle). Filter against o_req = τ/(1+τ)·(szA+szB) with one gram
    # of slack so float rounding can only ADD candidates, never drop.
    cand = (
        joined.groupBy(
            "source",
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(
            F.count(F.lit(1)).alias("c_pre"),
            F.max("a.rank").alias("mra"),
            F.max("b.rank").alias("mrb"),
        )
        .filter(
            (
                F.col("c_pre")
                + F.least(F.col("sza") - F.col("mra"), F.col("szb") - F.col("mrb"))
            ).cast("double")
            >= F.lit(threshold / (1.0 + threshold))
            * (F.col("sza") + F.col("szb")).cast("double")
            - 1.0
        )
        .select("source", "da", "db", "sza", "szb")
    )
    # `source` in the join keys keeps all 3 columns live below the
    # exchange → canonical match with the barrier → AQE reuse (see the
    # barrier comment above). doc_id → source is functional, so the
    # extra equality never drops a row.
    ga = grams.select(
        "source", F.col("doc_id").alias("da"), F.col("g").alias("g_a")
    )
    gb = grams.select(
        "source", F.col("doc_id").alias("db"), F.col("g").alias("g_b")
    )
    # Verify in two stages so the hot path runs ONE array op per
    # candidate. A naive `jaccard ≥ τ` filter here gets pushed into
    # the join condition with array_intersect inlined at EVERY
    # occurrence — measured as 2 intersects per candidate row. Stage 1
    # is a RELAXED division-free test in which the intersect size
    # appears exactly once (|A∪B| = szA+szB−i since gram arrays are
    # distinct, so i/(S−i) ≥ τ ⟺ i ≥ τ/(1+τ)·S, relaxed by one gram so
    # float rounding can only admit, never drop). Stage 2 applies the
    # EXACT oracle-equivalent jaccard filter above an aggregation
    # barrier — predicate pushdown cannot cross an Aggregate whose
    # filter references aggregate outputs, so the exact (multi-
    # occurrence) expression only ever evaluates on the thin boundary
    # shell stage 1 admits (~the true pair count), not on all
    # candidates.
    isect = F.size(F.array_intersect("g_a", "g_b"))
    relaxed = isect.cast("double") >= (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("sza") + F.col("szb")).cast("double")
        - 1.0
    )
    shell = (
        cand.join(ga, ["source", "da"]).join(gb, ["source", "db"]).where(relaxed)
        # barrier: rows per pair are identical, first() is deterministic
        .groupBy("source", "da", "db", "sza", "szb")
        .agg(F.first("g_a").alias("g_a"), F.first("g_b").alias("g_b"))
    )
    isect2 = F.size(F.array_intersect("g_a", "g_b"))
    verified = shell.withColumn(
        "jaccard",
        isect2 / (F.col("sza") + F.col("szb") - isect2).cast("double"),
    ).filter(F.col("jaccard") >= threshold)
    return verified.select(
        "source",
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def ngram_jaccard_pairs_sql(threshold: float = 0.55, n: int = 4) -> str:
    grams = (
        f"list_distinct(list_transform("
        f"range(0, greatest(length(text) - {n}, 0) + 1), "
        f"i -> substring(text, i + 1, {n})))"
    )
    return f"""
WITH g AS (SELECT source, doc_id, {grams} AS g FROM documents)
SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / len(list_distinct(a.g || b.g)), 6) AS jaccard
FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / len(list_distinct(a.g || b.g)) >= {threshold}
"""


def simhash_hamming_pairs(
    spark: SparkSession, docs: DataFrame, k: int = 3
) -> DataFrame:
    """SimHash near-dup PAIRS at hamming distance ≤ ``k`` via the
    pigeonhole multi-index (Manku, Jain & Das Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW 2007 — Google's production
    simhash design): split the ``SIMHASH_BITS``-bit signature into
    ``k+1`` blocks; any pair within distance ``k`` must agree EXACTLY
    on at least one block, so candidates come from ``k+1`` equi-joins
    on (block-id, block-value) — the same banded shape as the MinHash
    LSH path, never an all-pairs scan — and the exact popcount filter
    keeps the result LOSSLESS (bit-identical to the quadratic the
    oracle runs).

    Returns (doc_a, doc_b, hamming), doc_a < doc_b, deduplicated
    across blocks BEFORE the verify so each candidate pays one
    popcount.

    Scale note: block width is SIMHASH_WIDE_BITS/(k+1) = 60/4 = 15
    bits → 32k buckets per block, so candidate volume grows ~n²/32k
    per block — the configuration that took the sf1 pair search from
    401 s (the earlier 32-bit/8-bit-block layout, n²/256 candidates)
    to 44.8 s. The function raises unless k+1 divides
    ``SIMHASH_WIDE_BITS``; widening further (e.g. 120-bit signatures,
    30-bit blocks) keeps the same construction with only the two
    constants moving."""
    sig_pairs, per = _simhash_sig_pairs(docs, k)
    # Expand signature pairs back to document pairs. Intra-group pairs
    # (identical signature, hamming 0) come from ONE sh-key self-join;
    # inter-group pairs fan each qualifying signature pair out to its
    # groups' cross product. Both expansions are OUTPUT-bound — no
    # verification work rides them.
    a = per.select(F.col("sh").alias("sha"), F.col("doc_id").alias("da"))
    b = per.select(F.col("sh").alias("shb"), F.col("doc_id").alias("db"))
    intra = (
        a.join(b, (F.col("sha") == F.col("shb")) & (F.col("da") < F.col("db")))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    inter = (
        sig_pairs.join(a, "sha")
        .join(b, "shb")
        .select(
            F.least(F.col("da"), F.col("db")).alias("doc_a"),
            F.greatest(F.col("da"), F.col("db")).alias("doc_b"),
            F.col("hamming"),
        )
    )
    return intra.unionAll(inter)


def _simhash_sig_pairs(docs: DataFrame, k: int):
    """Pigeonhole search over DISTINCT signatures: returns
    (sig_pairs, per) where ``per`` is (doc_id, sh) and ``sig_pairs`` is
    (sha, shb, hamming) with sha < shb, 1 ≤ hamming ≤ k.

    Joining distinct signatures instead of documents is the dup-dense
    defense (the lesson the sf10 100-replica corpus taught MinHash,
    round 6): a clique of identical documents collapses to ONE
    signature before any pairwise work, so candidate volume scales
    with distinct CONTENT (n_sig²/2^width per block), not corpus size
    — the round-7 sf10 sweep measured the doc-level join exceeding a
    2400 s timeout where this shape completes in ~2 min."""
    nb = k + 1
    if SIMHASH_WIDE_BITS % nb:
        raise ValueError(
            f"k+1 = {nb} must divide SIMHASH_WIDE_BITS = {SIMHASH_WIDE_BITS}"
        )
    width = SIMHASH_WIDE_BITS // nb
    mask = (1 << width) - 1
    # wide signatures (60-bit, Arrow kernel): 15-bit blocks give 32k
    # buckets per block vs the 32-bit signature's 256 — the difference
    # between ~linear and ~n²/256 candidate growth (measured 401 s at
    # sf1 on the 8-bit blocks; see simhash_wide_sig).
    per = simhash_wide_sig(docs)
    sigs = per.select("sh").distinct()
    blocks = sigs.select(
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("sh"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(nb)
                ]
            )
        ).alias("bk"),
    ).select("sh", F.col("bk.blk").alias("blk"), F.col("bk.bv").alias("bv"))
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).cast("long")
    sig_pairs = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.sh") < F.col("b.sh")),
        )
        .select(F.col("a.sh").alias("sha"), F.col("b.sh").alias("shb"))
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= k)
    )
    return sig_pairs, per


def simhash_hamming_pairs_sql(k: int = 3) -> str:
    """DuckDB oracle: the straight quadratic (all pairs, popcount ≤ k)
    — the pigeonhole index must be LOSSLESS against it."""
    sh = simhash_wide_sql("text")
    return f"""
WITH per AS (
  -- NULL text is excluded (matching the Spark signature kernel): the
  -- scalar signature rendering folds a NULL token list to sig 0,
  -- which would cross-match every contentless doc with genuinely
  -- empty-text docs at hamming 0
  SELECT doc_id, {sh} AS sh FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM per a JOIN per b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {k}
"""


def simhash_hamming_stats(
    spark: SparkSession, docs: DataFrame, k: int = 3
) -> DataFrame:
    """Bounded readout over the simhash pair search: pair counts per
    hamming distance (≤ k+1 rows however large the corpus) — the shape
    to certify at scale, where the raw pair set itself is the
    quadratic-ish object (15k pairs already at sf0.01 on this
    template-generated fixture corpus).

    Counted WITHOUT enumerating pairs (round 7): hamming-0 pairs are
    Σ C(n_sig, 2) over signature-group sizes, and each inter-group
    signature pair contributes n_a·n_b — so the plan is one group-size
    aggregate plus the distinct-signature pigeonhole search, with
    NOTHING proportional to the pair count materialized. Same rows as
    counting :func:`simhash_hamming_pairs` (pinned in tests)."""
    sig_pairs, per = _simhash_sig_pairs(docs, k)
    counts = per.groupBy("sh").agg(F.count(F.lit(1)).alias("n"))
    intra = counts.agg(
        F.lit(0).cast("long").alias("hamming"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
    ).filter(F.col("n_pairs") > 0)
    inter = (
        sig_pairs.join(counts.select(F.col("sh").alias("sha"), F.col("n").alias("na")), "sha")
        .join(counts.select(F.col("sh").alias("shb"), F.col("n").alias("nb")), "shb")
        .groupBy("hamming")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("n_pairs"))
    )
    return intra.unionAll(inter)


def simhash_hamming_stats_sql(k: int = 3) -> str:
    return (
        f"SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs "
        f"FROM ({simhash_hamming_pairs_sql(k)}) __p GROUP BY hamming"
    )


SIMHASH_WIDE_BITS = 60  # 15 hex digits of md5; 4 pigeonhole blocks of 15 bits


def simhash_wide_sig(docs: DataFrame, bits: int = SIMHASH_WIDE_BITS) -> DataFrame:
    """Wide (default 60-bit) SimHash signatures via an Arrow kernel —
    the corpus-scale signature for the hamming pair search. The 32-bit
    expression form (`simhash_col`) gives only 256 buckets per
    8-bit pigeonhole block, so candidate pairs grow ~n²/256: measured
    401 s at sf1 (500k docs) vs 5 s at sf0.1 — an 80× step for 10×
    data. 15-bit blocks give 32k buckets and restore ~linear candidate
    growth. Bit-identical to :func:`simhash_wide_sql` (same Java-ws
    tokenization, md5-prefix hash, majority vote with ties → 0)."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
    weights = (1 << np.arange(bits, dtype=np.int64))
    shifts = np.arange(bits, dtype=np.int64)
    nhex = -(-bits // 4)  # hex digits covering `bits`

    def batches(it):
        for pdf in it:
            ids, shs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.strip(_JAVA_WS)
                toks = list(dict.fromkeys(ws_re.split(t))) if t else []
                if not toks:
                    ids.append(doc_id)
                    shs.append(0)
                    continue
                ints = np.fromiter(
                    (
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:nhex], 16)
                        for s in toks
                    ),
                    dtype=np.int64,
                    count=len(toks),
                )
                ones = ((ints[:, None] >> shifts[None, :]) & 1).sum(axis=0)
                sh = int(((ones * 2 > len(toks)) * weights).sum())
                ids.append(doc_id)
                shs.append(sh)
            yield pd.DataFrame({"doc_id": ids, "sh": shs})

    return (
        ensure_parallelism(docs)
        .select("doc_id", "text")
        # NULL text has no content: such docs are excluded from the
        # signature table, matching the SQL rendering where a NULL sig
        # can never satisfy the hamming filter (and the oracle's NULL
        # propagation generally). Without this the kernel crashes on
        # None — a real corpus always has some NULL rows.
        .filter(F.col("text").isNotNull())
        .repartition("doc_id")
        .mapInPandas(batches, schema="doc_id long, sh long")
        .repartition("doc_id")  # exchange barrier: signatures computed once
    )


def simhash_wide_sql(text: str = "text", bits: int = SIMHASH_WIDE_BITS) -> str:
    """DuckDB rendering of the wide signature (oracle twin)."""
    from approximatequeryengine_spark.functions.text import str_hash60_sql

    toks = f"list_distinct({ws_tokens_sql(text)})"
    hashes = f"list_transform({toks}, tk -> {str_hash60_sql('tk')})"
    terms = []
    for b in range(bits):
        ones = f"list_sum(list_transform(h, v -> (v >> {b}) & 1))"
        terms.append(f"(CASE WHEN {ones} * 2 > len(h) THEN {2**b} ELSE 0 END)")
    total = " + ".join(terms)
    return (
        f"(SELECT CASE WHEN len(h) = 0 THEN 0 ELSE {total} END "
        f"FROM (SELECT {hashes} AS h) __shw)"
    )


# ---------------------------------------------------------------------------
# FastSS edit-distance-1 pair search (deletion neighborhoods)
# ---------------------------------------------------------------------------


def editdist1_pairs(df: DataFrame, col: str) -> DataFrame:
    """All DISTINCT value pairs within edit distance 1, via the FastSS
    deletion-neighborhood index (Bocek et al. 2007) — the fuzzy-string
    sibling of the SimHash pigeonhole search (`simhash_hamming_pairs`):
    candidates come from an EQUI-join, never a quadratic scan.

    dist(a, b) ≤ 1 holds iff b is a's single-position deletion
    (insert/delete pair) or a and b share a SAME-position deletion
    (substitution). So each value emits its length-|s| deletion
    variants tagged with the position, candidates are
    (position, variant) equi-matches plus variant-to-original matches,
    and every candidate is verified with a real ``levenshtein`` call —
    the pigeonhole is provably COMPLETE for k = 1 (pinned against the
    quadratic scan in tests), the verify step makes it exact.

    At 100 TB: the variant table is |values| · avg_len rows; join
    fan-out per (position, variant) bucket is bounded by the alphabet
    (for fixed-format keys like ``Customer#000000042`` a bucket holds
    at most the 10 digit substitutions), so candidate output grows
    linearly with data — the same blocked-join contract as the LSH and
    pigeonhole searches. Readout: one row
    (n_values, n_candidate_pairs, n_verified_pairs).

    No counterpart in /root/reference (its engine has no string-join
    machinery); included as a training-data-curation primitive
    (near-identical keys/titles are a standard dirty-corpus signal).
    """
    names = df.select(F.col(col).alias("s")).filter(F.col("s").isNotNull()).distinct()
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # Exchange barrier above the deletion-variant explode (the
    # certified _minhash_sig_pandas pattern): the variant table feeds
    # THREE join inputs (both sides of the substitution self-join plus
    # the indel probe) — without the barrier the interpreted
    # per-character transform re-ran once per consumer; with it every
    # consumer reads the variants from one shuffle (AQE ReusedExchange).
    # Round 10: the indel probe below references `i` with a trivially
    # true predicate so column pruning cannot give it a 2-column
    # subtree whose canonical form no longer matches the barrier
    # exchange — the condition for ReusedExchange to engage (runtime-
    # plan-verified; the ngram barrier had the same partial-reuse bug).
    dels = (
        names.select(
            "s",
            F.expr(
                "explode(transform(sequence(1, length(s)), i -> struct("
                "i AS i, concat(substring(s, 1, i - 1), substring(s, i + 1, 1000000)) AS v)))"
            ).alias("d"),
        )
        .select("s", F.col("d.i").alias("i"), F.col("d.v").alias("v"))
        .repartition(n_parts, "v")
    )
    sub = (
        dels.alias("a")
        .join(
            dels.alias("b"),
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    )
    indel = (
        dels.alias("a")
        .join(names.alias("n"), F.col("a.v") == F.col("n.s"))
        # i >= 1 holds for every deletion variant (i ranges over
        # sequence(1, length)) — it exists only to keep `i` in this
        # consumer's column set so the barrier exchange is reused
        .filter((F.col("a.s") != F.col("n.s")) & (F.col("a.i") >= 1))
        .select(
            F.least(F.col("a.s"), F.col("n.s")).alias("sa"),
            F.greatest(F.col("a.s"), F.col("n.s")).alias("sb"),
        )
    )
    cand = sub.unionAll(indel).distinct()
    counts = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(
            F.when(F.levenshtein(F.col("sa"), F.col("sb")) <= 1, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_verified_pairs"),
    )
    nn = names.agg(F.count(F.lit(1)).cast("long").alias("n_values"))
    return nn.crossJoin(counts)  # 1-row × 1-row readout


def editdist1_pairs_sql(table: str, col: str) -> str:
    """DuckDB oracle: replays the deletion-neighborhood candidate join
    and the levenshtein verification."""
    return f"""
WITH names AS (
  SELECT DISTINCT {col} AS s FROM {table} WHERE {col} IS NOT NULL
),
dels AS (
  SELECT s, i, substr(s, 1, i - 1) || substr(s, i + 1) AS v
  FROM (SELECT s, unnest(generate_series(1, CAST(length(s) AS BIGINT))) AS i
        FROM names)
),
sub AS (
  SELECT a.s AS sa, b.s AS sb
  FROM dels a JOIN dels b ON a.i = b.i AND a.v = b.v AND a.s < b.s
),
indel AS (
  SELECT least(a.s, n.s) AS sa, greatest(a.s, n.s) AS sb
  FROM dels a JOIN names n ON a.v = n.s AND a.s <> n.s
),
cand AS (
  SELECT DISTINCT sa, sb FROM (SELECT * FROM sub UNION ALL SELECT * FROM indel)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM names) AS n_values,
       CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN levenshtein(sa, sb) <= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_verified_pairs
FROM cand
"""


def cross_source_dup_matrix(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-source duplication matrix — which sources share near-dup
    content with which (the contamination-flow diagnostic a curation
    pipeline reads before trusting per-source mixture weights). Rides
    the certified MinHash-LSH pair search: verified pairs join each
    side's source, pairs collapse onto unordered (source_lo, source_hi)
    cells, and the readout is the bounded |sources|² matrix
    (src_a, src_b, n_pairs, n_docs_a_side, n_docs_b_side). Same-source
    cells measure internal duplication; off-diagonal cells measure
    cross-source copying.

    At 100 TB: the pair search is the banded-LSH path (its scale
    argument unchanged); everything after joins the (small) pair set
    against the doc→source projection — the planner picks the build
    side — and one grouped count over the pairs.
    """
    # verify='join': the duplication matrix is run on corpora suspected
    # of heavy cross-source copying — the dense regime where the
    # keys-only candidate plan wins 4.2× (minhash_lsh_pairs docstring).
    pairs = minhash_lsh_pairs(spark, docs, threshold=threshold, verify="join").select(
        "doc_a", "doc_b"
    )
    src = docs.select("doc_id", "source")
    # No broadcast hint: the doc→source projection is O(|corpus|) and
    # CANNOT ship to the driver at scale — the PAIR table is the small
    # side, so the planner (AQE) broadcasts/shuffles correctly on its
    # own.
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            on="doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            on="doc_b",
        )
        .select(
            F.least(F.col("sa"), F.col("sb")).alias("src_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("src_b"),
            F.when(F.col("sa") <= F.col("sb"), F.col("doc_a")).otherwise(F.col("doc_b")).alias("da"),
            F.when(F.col("sa") <= F.col("sb"), F.col("doc_b")).otherwise(F.col("doc_a")).alias("db"),
        )
    )
    return (
        j.groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("da").cast("long").alias("n_docs_a_side"),
            F.countDistinct("db").cast("long").alias("n_docs_b_side"),
        )
        .orderBy("src_a", "src_b")
    )


def cross_source_dup_matrix_sql(threshold: float = 0.5) -> str:
    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(threshold)}) __p
),
lab AS (
  SELECT p.doc_a, p.doc_b, a.source AS sa, b.source AS sb
  FROM pairs p
  JOIN documents a ON a.doc_id = p.doc_a
  JOIN documents b ON b.doc_id = p.doc_b
),
canon AS (
  SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
         CASE WHEN sa <= sb THEN doc_a ELSE doc_b END AS da,
         CASE WHEN sa <= sb THEN doc_b ELSE doc_a END AS db
  FROM lab
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT da) AS BIGINT) AS n_docs_a_side,
       CAST(count(DISTINCT db) AS BIGINT) AS n_docs_b_side
FROM canon GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- dedup-policy yield curve ------------------------------------------------

YIELD_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def dedup_yield_curve(
    spark: SparkSession,
    docs: DataFrame,
    thresholds: tuple[float, ...] = YIELD_THRESHOLDS,
) -> DataFrame:
    """Dedup-policy evidence: for each candidate Jaccard cutoff, how
    many verified near-dup pairs survive and how many documents they
    touch — the curve a curation pipeline reads before committing to a
    threshold (too low deletes real content, too high leaves
    near-copies in). Output per threshold: (threshold, n_pairs,
    n_docs_affected, pct_docs_affected), ordered.

    ONE pair search at the loosest cutoff feeds every row: tighter
    cutoffs are conditional aggregates over the same verified pair
    table (same one-scan-sweep shape as the quality-threshold and ELP
    curves; both engines compare the identically-rounded jaccard).
    Scale: the pair search is the banded-LSH path; the curve itself is
    O(pairs) → |thresholds| rows.
    """
    lo = min(thresholds)
    # verify='join': the loosest cutoff maximizes candidate density —
    # the regime where the keys-only plan wins (4.2× at sf10; see
    # minhash_lsh_pairs docstring). Identical pair output.
    # Persisted (round 10): the pair-search subtree appears THREE
    # times in the readout's one action (pa once, the sides union
    # twice) and the differing parents defeat exchange reuse — the
    # whole LSH search ran up to 3×. Intra-query persist with paired
    # unpersist; the readout (|thresholds| rows) is materialized while
    # the cache is live, per the repo's collect-then-release pattern.
    pairs = (
        minhash_lsh_pairs(spark, docs, threshold=lo, verify="join")
        .select("doc_a", "doc_b", "jaccard")
        .persist()
    )
    sides = pairs.select(F.col("doc_a").alias("d"), "jaccard").unionAll(
        pairs.select(F.col("doc_b").alias("d"), "jaccard")
    )
    pa = pairs.agg(
        *[
            F.sum(F.when(F.col("jaccard") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"p{i}")
            for i, t in enumerate(thresholds)
        ]
    )
    sa = sides.agg(
        *[
            F.countDistinct(F.when(F.col("jaccard") >= t, F.col("d")))
            .cast("long")
            .alias(f"a{i}")
            for i, t in enumerate(thresholds)
        ]
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    wide = pa.crossJoin(sa).crossJoin(tot)  # 1×1×1-row readout
    rows = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"p{i}").alias("n_pairs"),
                F.col(f"a{i}").alias("n_docs_affected"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    out = (
        wide.select(F.explode(rows).alias("r"), "n_docs")
        .select(
            F.col("r.threshold").alias("threshold"),
            F.col("r.n_pairs").alias("n_pairs"),
            F.col("r.n_docs_affected").alias("n_docs_affected"),
            F.round(F.col("r.n_docs_affected") / F.col("n_docs"), 6).alias(
                "pct_docs_affected"
            ),
        )
        .orderBy("threshold")
    )
    try:
        collected = out.collect()
        return spark.createDataFrame(collected, out.schema)
    finally:
        pairs.unpersist()


def dedup_yield_curve_sql(
    thresholds: tuple[float, ...] = YIELD_THRESHOLDS,
) -> str:
    lo = min(thresholds)
    vals = ", ".join(f"(CAST({t!r} AS DOUBLE))" for t in thresholds)
    return f"""
WITH pairs AS ({minhash_lsh_pairs_sql(threshold=lo)}),
sides AS (
  SELECT doc_a AS d, jaccard FROM pairs
  UNION ALL
  SELECT doc_b AS d, jaccard FROM pairs
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
thr(threshold) AS (VALUES {vals})
SELECT threshold,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs
        WHERE jaccard >= threshold) AS n_pairs,
       (SELECT CAST(count(DISTINCT d) AS BIGINT) FROM sides
        WHERE jaccard >= threshold) AS n_docs_affected,
       round((SELECT CAST(count(DISTINCT d) AS DOUBLE) FROM sides
              WHERE jaccard >= threshold) / n_docs, 6) AS pct_docs_affected
FROM thr, tot
ORDER BY threshold
"""
