"""Dataset profiling operators — the pre-flight checks a pipeline runs
before trusting a new table:

- **Column profiler**: per column, row/null/distinct counts and numeric
  min/max — the schema-drift and data-quality snapshot (a sudden jump
  in null rate or distinct count is how upstream breakage is caught).
- **RFM segmentation**: the classic recency/frequency/monetary customer
  quintiles — per-(R,F) cell counts with monetary averages — the
  standard behavioral rollup over an orders fact.

Both are exact one-pass aggregates with DuckDB oracle renderings. The
profiler computes every column's measures in ONE aggregate (Spark
rewrites multi-distinct via a single Expand — one scan, |cols|×rows
expanded in-memory, no per-column re-scan); min/max are reported for
numeric columns only, because float→string rendering differs across
engines and string collation is locale-trapped, while numeric min/max
compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def profile_columns(spark: SparkSession, df: DataFrame) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_val, max_val) — min/max as doubles for numeric columns, NULL
    otherwise."""
    from approximatequeryengine_spark.operators import ensure_parallelism

    # The multi-distinct aggregate plans as Expand(×|distinct aggs|+1)
    # + partial agg INSIDE the scan stage — on a single-file fixture
    # scan that whole 12× blow-up ran in ONE task (measured 4.5 s
    # straggler at sf0.1). Size-proportional fan-out; a no-op once the
    # scanner itself splits the input (the 100 TB case).
    df = ensure_parallelism(df, weight=4.0)
    cols = df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
        if dtypes[c].startswith(NUMERIC_TYPES):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        numeric = dtypes[c].startswith(NUMERIC_TYPES)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_val"),
                (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_val"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def profile_columns_sql(table: str, cols: list[tuple[str, bool]]) -> str:
    """DuckDB oracle: one UNION ALL branch per (column, is_numeric)."""
    parts = []
    for c, numeric in cols:
        mn = f"CAST(min({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_val, {mx} AS max_val "
            f"FROM {table}"
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"' 


RFM_BUCKETS = 5


def rfm_segments(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Recency/Frequency/Monetary quintiles over the orders fact: per
    customer compute last-order date, order count and total spend;
    bucket each metric into ``RFM_BUCKETS`` ntiles (deterministic
    tie-break on the customer key, identical ntile semantics in both
    engines); report each (R, F) cell's customer count and average
    monetary value — the marketing-standard behavioral matrix.

    Plan shape: one shuffle on the customer key for the per-customer
    rollup; the three ntile windows order the |customers| rollup (much
    smaller than the fact) — at extreme customer counts swap ntile for
    the grid-histogram bucketing, same downstream shape."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("double")).alias("monetary"),
    )
    r_w = Window.orderBy(F.desc("last_order"), F.asc("o_custkey"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "monetary",
        F.ntile(RFM_BUCKETS).over(r_w).alias("r_bucket"),
        F.ntile(RFM_BUCKETS).over(f_w).alias("f_bucket"),
        F.ntile(RFM_BUCKETS).over(m_w).alias("m_bucket"),
    )
    return (
        scored.groupBy("r_bucket", "f_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 2).alias("avg_monetary"),
            F.round(F.avg("m_bucket"), 6).alias("avg_m_bucket"),
        )
        .orderBy("r_bucket", "f_bucket")
    )


def rfm_segments_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DOUBLE)) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, monetary,
         ntile({RFM_BUCKETS}) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r_bucket,
         ntile({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_bucket,
         ntile({RFM_BUCKETS}) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_bucket
  FROM per_cust
)
SELECT r_bucket, f_bucket, count(*) AS n_customers,
       round(avg(monetary), 2) AS avg_monetary,
       round(avg(m_bucket), 6) AS avg_m_bucket
FROM scored GROUP BY r_bucket, f_bucket ORDER BY r_bucket, f_bucket
"""


def key_frequency_spectrum(
    spark: SparkSession, df: DataFrame, key: str, top: int = 20
) -> DataFrame:
    """Frequency-of-frequencies profile ("count of counts") for a key
    column: one row per multiplicity f with the number of keys that
    occur exactly f times — the spectrum that predicts dedup yield
    (mass above f=1 is removable), join fan-out (Σ f² is the self-join
    size — cross-checkable against the AMS sketch), and sampler choice
    (a heavy tail argues for the outlier-index estimators). Also the
    input Chao-style distinct estimators read (f1, f2).

    Output: (freq, n_keys, n_rows) for the ``top`` most common
    multiplicities by key count, freq-ascending — bounded readout at
    any scale. Two grouped aggregates: O(N) then O(distinct keys);
    both map-side combined.
    """
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("freq"))
    spec = (
        per_key.groupBy("freq")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .withColumn("n_rows", (F.col("freq") * F.col("n_keys")).cast("long"))
    )
    return (
        spec.orderBy(F.col("n_keys").desc(), F.col("freq"))
        .limit(top)
        .orderBy("freq")
        .select(F.col("freq").cast("long"), "n_keys", "n_rows")
    )


def key_frequency_spectrum_sql(table: str, key: str, top: int = 20) -> str:
    return f"""
WITH per_key AS (
  SELECT {key}, count(*) AS freq FROM {table} GROUP BY {key}
),
spec AS (
  SELECT CAST(freq AS BIGINT) AS freq,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(freq * count(*) AS BIGINT) AS n_rows
  FROM per_key GROUP BY freq
)
SELECT freq, n_keys, n_rows
FROM (SELECT * FROM spec ORDER BY n_keys DESC, freq LIMIT {top}) __t
ORDER BY freq
"""


# ---------------------------------------------------------------------------
# Data-quality constraint suite (Deequ-style validation)
# ---------------------------------------------------------------------------


def constraint_checks_orders(
    spark: SparkSession, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """The pre-training data-quality gate (the AWS Deequ /
    great-expectations shape): a fixed suite of constraints over the
    orders table, each reported as (check_name, metric, passed). ALL
    table-local checks ride ONE aggregate scan; the referential check
    is one left-anti join count — never a scan per constraint, which
    is how naive validators turn a 6-check suite into 6 passes over
    100 TB.

    Checks: row_count > 0; completeness(o_custkey) = 1; primary-key
    uniqueness(o_orderkey) = 1; value range min(o_totalprice) > 0;
    accepted values o_orderstatus ⊆ {O, F, P}; referential integrity
    orders.o_custkey → customer.c_custkey (orphan fraction = 0).
    Metrics are count ratios — exact IEEE divisions of integer counts,
    identical in any engine."""
    stats = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_custkey").cast("long").alias("n_custkey"),
        F.countDistinct("o_orderkey").cast("long").alias("n_key"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_status_ok"),
    )
    orphans = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphan"))
    )
    row = stats.crossJoin(orphans)  # 1-row × 1-row
    checks = [
        ("row_count", F.col("n").cast("double"), F.col("n") > 0),
        (
            "completeness_o_custkey",
            F.col("n_custkey") / F.col("n"),
            F.col("n_custkey") == F.col("n"),
        ),
        (
            "uniqueness_o_orderkey",
            F.col("n_key") / F.col("n"),
            F.col("n_key") == F.col("n"),
        ),
        ("min_o_totalprice", F.round(F.col("min_price"), 2), F.col("min_price") > 0),
        (
            "accepted_values_o_orderstatus",
            F.col("n_status_ok") / F.col("n"),
            F.col("n_status_ok") == F.col("n"),
        ),
        (
            "referential_o_custkey",
            F.col("n_orphan") / F.col("n"),
            F.col("n_orphan") == 0,
        ),
    ]
    out = None
    for name, metric, passed in checks:
        r = row.select(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.cast("boolean").alias("passed"),
        )
        out = r if out is None else out.unionAll(r)
    return out.orderBy("check_name")


def constraint_checks_orders_sql() -> str:
    """DuckDB oracle: one aggregate + one anti-join count, fanned into
    the same six rows."""
    return """
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_custkey) AS BIGINT) AS n_custkey,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_key,
         min(o_totalprice) AS min_price,
         CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_status_ok
  FROM orders
),
orphans AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orphan
  FROM orders WHERE NOT EXISTS
    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
),
row0 AS (SELECT * FROM stats, orphans)
SELECT check_name, CAST(metric AS DOUBLE) AS metric, passed FROM (
  SELECT 'row_count' AS check_name, CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM row0
  UNION ALL SELECT 'completeness_o_custkey',
    CAST(n_custkey AS DOUBLE) / n, n_custkey = n FROM row0
  UNION ALL SELECT 'uniqueness_o_orderkey',
    CAST(n_key AS DOUBLE) / n, n_key = n FROM row0
  UNION ALL SELECT 'min_o_totalprice',
    round(min_price, 2), min_price > 0 FROM row0
  UNION ALL SELECT 'accepted_values_o_orderstatus',
    CAST(n_status_ok AS DOUBLE) / n, n_status_ok = n FROM row0
  UNION ALL SELECT 'referential_o_custkey',
    CAST(n_orphan AS DOUBLE) / n, n_orphan = 0 FROM row0
)
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# Distribution-drift monitor: Population Stability Index per source
# ---------------------------------------------------------------------------

PSI_BINS = 8
PSI_BIN_WIDTH = 80  # n_chars bins: [0,80), [80,160), ..., [560, inf)


def psi_drift_by_source(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole corpus — the standard ML data-drift
    monitor (PSI > 0.2 = investigate). Output:
    (source, n_docs, psi, drifted).

    Lengths bin into fixed-width cells (top cell open-ended); both the
    per-source and corpus proportions are Laplace-smoothed
    ((c + 0.5) / (n + B/2)) so empty cells contribute finitely instead
    of ln(0). One scan produces the (source, bin) counts; everything
    after runs on O(sources × bins) rows — the dense grid comes from a
    broadcast nested-loop of two tiny frames, never a shuffle. The
    only transcendental is ln() on identical doubles; the 6-decimal
    rounding absorbs any libm ulp difference between engines."""
    b = F.least(
        F.floor(F.col("n_chars") / F.lit(PSI_BIN_WIDTH)), F.lit(PSI_BINS - 1)
    ).cast("long")
    cnt = docs.groupBy(F.col("source"), b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    srcs = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    corpus = cnt.groupBy("bin").agg(F.sum("c").cast("long").alias("cc"))
    total = cnt.agg(F.sum("c").cast("long").alias("n"))
    bins = spark.range(PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    grid = (
        srcs.crossJoin(F.broadcast(bins))
        .join(cnt, on=["source", "bin"], how="left")
        .join(F.broadcast(corpus), on="bin", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_s",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("cc"), F.lit(0)).alias("cc"),
            "n",
        )
    )
    half_b = PSI_BINS / 2.0
    p_s = (F.col("c") + F.lit(0.5)) / (F.col("n_s") + F.lit(half_b))
    p_c = (F.col("cc") + F.lit(0.5)) / (F.col("n") + F.lit(half_b))
    term = (p_s - p_c) * F.log(p_s / p_c)
    out = grid.groupBy("source", "n_s").agg(F.round(F.sum(term), 6).alias("psi"))
    return out.select(
        "source",
        F.col("n_s").alias("n_docs"),
        "psi",
        (F.col("psi") > 0.2).alias("drifted"),
    ).orderBy("source")


def psi_drift_by_source_sql() -> str:
    half_b = PSI_BINS / 2.0
    return f"""
WITH binned AS (
  SELECT source,
         least(CAST(floor(n_chars / {PSI_BIN_WIDTH}.0) AS BIGINT),
               {PSI_BINS - 1}) AS bin
  FROM documents
),
cnt AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
        FROM binned GROUP BY 1, 2),
srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM cnt GROUP BY 1),
corpus AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cc FROM cnt GROUP BY 1),
total AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
bins AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin),
grid AS (
  SELECT srcs.source, srcs.n_s, bins.bin,
         coalesce(cnt.c, 0) AS c, coalesce(corpus.cc, 0) AS cc, total.n
  FROM srcs CROSS JOIN bins
  LEFT JOIN cnt ON cnt.source = srcs.source AND cnt.bin = bins.bin
  LEFT JOIN corpus ON corpus.bin = bins.bin
  CROSS JOIN total
),
scored AS (
  SELECT source, n_s,
         round(sum(((c + 0.5) / (n_s + {half_b}) - (cc + 0.5) / (n + {half_b}))
               * ln(((c + 0.5) / (n_s + {half_b}))
                    / ((cc + 0.5) / (n + {half_b})))), 6) AS psi
  FROM grid GROUP BY 1, 2
)
SELECT source, n_s AS n_docs, psi, psi > 0.2 AS drifted
FROM scored ORDER BY source
"""


# ---------------------------------------------------------------------------
# Embedding-space drift: per-label centroid direction vs the corpus
# centroid. The embedding analogue of the PSI length-distribution
# check above — a label (or shard/source/day in production) whose
# centroid swings away from the corpus direction signals an encoder
# change, a data mix shift, or a corrupted shard BEFORE any downstream
# ANN/semantic-dedup quality drop is visible.
#
# Determinism contract: every per-dimension accumulation is an exact
# integer — values snap to a 2⁻¹⁶ grid (floor(e·65536 + 0.5)), sums
# ride DECIMAL(38,0)/HUGEINT, and cosine is scale-invariant so it is
# computed directly on the integer SUM vectors (no centroid division
# ever happens). The only float ops are one division and two sqrts on
# the same exact integers in the same order — bit-identical across
# engines, with no float-fold-order hazard anywhere.
#
# Scale: one posexplode pass (rows × dims), two tiny grouped sums
# (labels×dims, then dims), a broadcast-sized join. 100 TB of
# embeddings reduces to a (labels × dims) integer table.
# ---------------------------------------------------------------------------

EMB_GRID = 65536  # 2^16 quantization grid for embedding values


def quantized_dims(emb: DataFrame) -> DataFrame:
    """(label, d, q): one row per (vector, dimension) on the 2⁻¹⁶
    integer grid — the shared front of the batch and streaming paths.
    Vector-validity policy applies: a vector with any non-finite dim is
    invalid (floor(NaN·grid) raises the integer cast in BOTH engines),
    so it contributes no rows and is not counted in n_vecs."""
    from approximatequeryengine_spark.operators.similarity import valid_vec_col

    emb = emb.filter(valid_vec_col(F.col("embedding")))
    return emb.select(
        "label",
        F.posexplode("embedding").alias("d", "e"),
    ).select(
        "label",
        "d",
        F.floor(F.col("e").cast("double") * EMB_GRID + 0.5)
        .cast("long")
        .alias("q"),
    )


def drift_readout(by_label: DataFrame) -> DataFrame:
    """Cosine readout over the (label, d, s, cnt) integer sum table —
    consumed by the batch path below and by the drained streaming
    state (``streaming/pipeline.py::embedding_drift_stream``), which
    equals the batch table exactly because integer sums are order-free."""
    corpus = by_label.groupBy("d").agg(F.sum("s").alias("sg"))
    m = (
        by_label.join(F.broadcast(corpus), "d")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("sg")).alias("dot"),
            F.sum(F.col("s") * F.col("s")).alias("n2l"),
            F.sum(F.col("sg") * F.col("sg")).alias("n2g"),
        )
    )
    # n_vecs = vectors that CONTRIBUTE dimensions (NULL/empty
    # embeddings yield no posexplode rows, so they are invisible to
    # the state table and must not be counted — the oracle filters
    # them the same way). max over d is exact even for ragged dims:
    # every non-empty vector has dimension 0, so cnt(d=0) equals the
    # contributing-vector count and no deeper d can exceed it.
    counts = by_label.groupBy("label").agg(F.max("cnt").alias("n_vecs"))
    return (
        m.join(counts, "label")
        .select(
            "label",
            "n_vecs",
            # A zero quantized sum-vector (all-zero or near-zero
            # embeddings — the corrupted-shard case itself) has no
            # direction: emit NULL rather than divide by zero (ANSI
            # would raise; non-ANSI NULL could diverge from the oracle
            # unless both engines gate identically).
            F.when(
                (F.col("n2l") > 0) & (F.col("n2g") > 0),
                F.round(
                    F.col("dot").cast("double")
                    / (
                        F.sqrt(F.col("n2l").cast("double"))
                        * F.sqrt(F.col("n2g").cast("double"))
                    ),
                    6,
                ),
            ).alias("cosine_to_corpus"),
        )
        .orderBy("label")
    )


def embedding_drift_by_label(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Per-label rows: (label, n_vecs, cosine_to_corpus) ordered by
    label — cosine between the label's integer sum-vector and the
    corpus sum-vector."""
    by_label = quantized_dims(emb).groupBy("label", "d").agg(
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return drift_readout(by_label)


def embedding_drift_by_label_sql() -> str:
    """DuckDB oracle: identical grid, integer sum vectors, and scalar
    cosine chain. Dimension pairing uses list indexing over a
    select-list unnest(generate_series(...)) — this DuckDB build has
    neither WITH ORDINALITY nor lateral generate_series parameters."""
    from approximatequeryengine_spark.operators.similarity import valid_vec_sql

    vv = valid_vec_sql("embedding")
    return f"""
WITH dims AS (
  SELECT label, embedding,
         unnest(generate_series(1, len(embedding))) AS d
  FROM embeddings WHERE {vv}
),
q AS (
  SELECT label, d,
         CAST(floor(CAST(embedding[d] AS DOUBLE) * {EMB_GRID} + 0.5) AS BIGINT) AS q
  FROM dims
),
by_label AS (
  SELECT label, d, sum(q) AS s FROM q GROUP BY 1, 2
),
corpus AS (
  SELECT d, sum(s) AS sg FROM by_label GROUP BY 1
),
m AS (
  SELECT label,
         sum(b.s * c.sg) AS dot,
         sum(b.s * b.s) AS n2l,
         sum(c.sg * c.sg) AS n2g
  FROM by_label b JOIN corpus c USING (d)
  GROUP BY 1
),
counts AS (
  SELECT label, count(*) AS n_vecs FROM embeddings
  WHERE {vv} AND len(embedding) > 0 GROUP BY 1
)
SELECT m.label,
       counts.n_vecs,
       CASE WHEN n2l > 0 AND n2g > 0
            THEN round(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(n2l AS DOUBLE)) * sqrt(CAST(n2g AS DOUBLE))),
                       6)
       END AS cosine_to_corpus
FROM m JOIN counts ON m.label = counts.label
ORDER BY m.label
"""
