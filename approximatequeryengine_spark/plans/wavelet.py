"""Haar-wavelet synopsis for range-count estimation — the classic
wavelet AQP technique (Matias, Vitter & Wang SIGMOD'98; Chakrabarti,
Garofalakis, Rastogi & Shim, "Approximate query processing using
wavelets", VLDB 2000): build a value histogram on a dyadic grid, take
its Haar decomposition, keep only the B largest coefficients, and
answer range-count queries from the truncated error tree.

Determinism contract: every pyramid value is a DYADIC rational
(integer counts divided by powers of two, denominators ≤ 2^LEVELS) of
magnitude ≤ N — exactly representable in IEEE doubles, so additions
are exact and ORDER-FREE, divisions by 2 are exact, and the truncated
reconstruction is bit-identical in Spark and DuckDB with no rounding
games. Coefficient selection uses the support-weighted absolute mass
``|d|·2^(LEVELS+1-l)`` (the total absolute change the coefficient
contributes across its support) with (weight DESC, level, index)
tie-breaks — a greedy criterion on exact dyadic weights, avoiding the
sqrt of the L2-normalized criterion which would reintroduce float
noise into the ORDER BY.

Scale shape: the ONLY pass over data is the histogram groupBy (G=64
rows out, map-side combined). The pyramid, selection, and
reconstruction are metadata-scale lazy transforms over ≤64-row frames
(6 tiny shuffles on ≤64 rows) — at 100 TB the histogram aggregate is
>99.9% of the work and everything downstream is constant-size.

The reference has no synopsis structures at all; this complements the
repo's sketch family (CMS = point frequency, HLL/KMV = distinct,
grid-histogram = quantiles, wavelet = range counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

G = 64  # dyadic histogram buckets
LEVELS = 6  # log2(G)
BUCKET_WIDTH = 2048  # l_extendedprice domain [0, 131072) — max is ~105k
DEFAULT_B = 8  # kept coefficients (plus the overall average)
# Selectivity cutoffs (in buckets): deliberately NOT aligned to the
# dyadic tree — aligned ranges cancel every coefficient whose support
# lies inside them, which would make the synopsis look exact at coarse
# granularity; unaligned prefixes exercise all levels of the error
# tree, which is the actual selectivity-estimation workload.
PREFIX_CUTOFFS = (5, 11, 19, 26, 37, 45, 51, 61)


def _bucket_col(value: F.Column) -> F.Column:
    # Clamp BOTH ends: an unclamped low end would send negative values
    # to bucket -1, which the 0..G-1 grid join silently drops — the
    # mass would vanish from every estimate (including the "exact"
    # full-coefficient reconstruction) in both engines at once.
    return F.greatest(
        F.least(
            F.floor(value / F.lit(float(BUCKET_WIDTH))).cast("long"), F.lit(G - 1)
        ),
        F.lit(0).cast("long"),
    )


def wavelet_range_counts(
    spark: SparkSession, df: DataFrame, value_col: str, b: int = DEFAULT_B
) -> DataFrame:
    """Estimated selectivities ``count(value < cutoff)`` for the
    ``PREFIX_CUTOFFS``, answered from a B-term Haar synopsis — the
    selectivity-estimation workload wavelets were built for. Output:
    (cutoff_bucket, est_count, n_coeffs)."""
    hist_rows = (
        df.select(_bucket_col(F.col(value_col)).alias("j"))
        .groupBy("j")
        .agg(F.count(F.lit(1)).cast("double").alias("a"))
        .collect()
    )
    # Everything past the histogram is metadata-scale (≤ G=64 rows)
    # and — per the module's determinism contract — EXACT dyadic
    # arithmetic, so the pyramid/selection/reconstruction run on the
    # driver with bit-identical doubles (round 10). The lazy-frame
    # pipeline this replaces spelled 6 tiny level shuffles, a 6-way
    # union whose branches each re-derived the pyramid chain, and two
    # broadcast joins — ~15 AQE stage-jobs per call for 64 values
    # (guide §5: the driver SHOULD do the O(synopsis) work; the one
    # data-scale pass is the histogram aggregate above). The final
    # round(·, 4) stays a Spark expression so the decimal rounding is
    # the same engine implementation as before.
    a = [0.0] * G
    for r in hist_rows:
        a[int(r["j"])] = float(r["a"])
    level = a
    coefs: list[tuple[int, int, float]] = []  # (lvl, i, d)
    for lvl in range(LEVELS, 0, -1):
        nxt = []
        for i in range(len(level) // 2):
            ae, ao = level[2 * i], level[2 * i + 1]
            coefs.append((lvl, i, (ae - ao) / 2))
            nxt.append((ae + ao) / 2)
        level = nxt
    a00 = level[0]
    kept = {
        (lvl, i): d
        for lvl, i, d in sorted(
            coefs,
            key=lambda t: (-abs(t[2]) * 2.0 ** (LEVELS + 1 - t[0]), t[0], t[1]),
        )[:b]
    }
    # Each bucket j consults its ancestor coefficient at every level:
    # index i = j >> (LEVELS+1-l), sign from bit (LEVELS-l) of j.
    c_hat = []
    for j in range(G):
        v = a00
        for l in range(1, LEVELS + 1):
            d = kept.get((l, j >> (LEVELS + 1 - l)))
            if d is not None:
                v += d if (j >> (LEVELS - l)) % 2 == 0 else -d
        c_hat.append(v)
    rows = [(int(t), float(sum(c_hat[:t])), b) for t in PREFIX_CUTOFFS]
    return spark.createDataFrame(
        rows, "cutoff_bucket long, est_raw double, n_coeffs long"
    ).select(
        "cutoff_bucket",
        F.round("est_raw", 4).alias("est_count"),
        F.col("n_coeffs"),
    )


def wavelet_range_counts_sql(table: str, value_col: str, b: int = DEFAULT_B) -> str:
    """DuckDB oracle — the same histogram, pyramid, support-weighted
    top-B selection, and error-tree reconstruction (exact dyadic
    arithmetic on both engines)."""
    parts = [
        f"""hist AS (
  SELECT greatest(least(CAST(floor({value_col} / {float(BUCKET_WIDTH)!r}) AS BIGINT), {G - 1}), 0) AS j,
         CAST(count(*) AS DOUBLE) AS a
  FROM {table} GROUP BY 1
),
lvl{LEVELS} AS (
  SELECT g.j, coalesce(h.a, 0.0) AS a
  FROM (SELECT unnest(range(0, {G})) AS j) g LEFT JOIN hist h ON h.j = g.j
)"""
    ]
    for lvl in range(LEVELS, 0, -1):
        parts.append(
            f"""p{lvl} AS (
  SELECT CAST(j // 2 AS BIGINT) AS j,
         sum(CASE WHEN j % 2 = 0 THEN a END) AS ae,
         sum(CASE WHEN j % 2 = 1 THEN a END) AS ao
  FROM lvl{lvl} GROUP BY 1
),
d{lvl} AS (SELECT {lvl} AS lvl, j AS i, (ae - ao) / 2 AS d FROM p{lvl}),
lvl{lvl - 1} AS (SELECT j, (ae + ao) / 2 AS a FROM p{lvl})"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM d{l}" for l in range(1, LEVELS + 1))
    parts.append(
        f"""coefs AS ({union}),
kept AS (
  SELECT lvl, i, d FROM (
    SELECT lvl, i, d, abs(d) * power(2.0, {LEVELS + 1} - lvl) AS w FROM coefs
  ) ORDER BY w DESC, lvl ASC, i ASC LIMIT {b}
),
cand AS (
  -- floor(j / 2^x), NOT j // power(2, x): DuckDB's // does TRUE
  -- division when either operand is DOUBLE (power returns DOUBLE) and
  -- the BIGINT cast then ROUNDS — 33 // 64.0 = 0.515625 → 1.
  SELECT g.j, t.lvl,
         CAST(floor(g.j / power(2, {LEVELS + 1} - t.lvl)) AS BIGINT) AS i,
         CASE WHEN CAST(floor(g.j / power(2, {LEVELS} - t.lvl)) AS BIGINT) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(range(0, {G})) AS j) g,
       (SELECT unnest(range(1, {LEVELS + 1})) AS lvl) t
),
recon AS (
  SELECT c.j, sum(c.s * k.d) AS detail
  FROM cand c JOIN kept k ON k.lvl = c.lvl AND k.i = c.i
  GROUP BY c.j
),
est AS (
  SELECT g.j, (SELECT a FROM lvl0) + coalesce(r.detail, 0.0) AS c_hat
  FROM (SELECT unnest(range(0, {G})) AS j) g LEFT JOIN recon r ON r.j = g.j
)"""
    )
    body = ",\n".join(parts)
    cutoffs = ", ".join(str(int(t)) for t in PREFIX_CUTOFFS)
    return f"""
WITH {body}
SELECT t.cutoff_bucket, round(sum(e.c_hat), 4) AS est_count,
       CAST({b} AS BIGINT) AS n_coeffs
FROM est e JOIN (SELECT unnest([{cutoffs}]) AS cutoff_bucket) t
  ON e.j < t.cutoff_bucket
GROUP BY 1
"""
