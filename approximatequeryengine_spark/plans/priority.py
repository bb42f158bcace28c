"""Priority sampling — weighted subset-sum estimation (Duffield, Lund &
Thorup, JACM'07; Alon et al. analysis).

Given per-item weights w_i, draw u_i ~ U(0,1], give every item priority
p_i = w_i / u_i, and keep the k items of highest priority. With
τ = the (k+1)-st highest priority, the estimator for ANY subset S fixed
after sampling is

    Ŝ = Σ_{i ∈ sample ∩ S} max(w_i, τ)

— unbiased (DLT Theorem 1), and within a factor 1 + O(1/√k) of the
variance-optimal weighted scheme for subset sums (Szegedy's proof of
the DLT conjecture). This is the estimator a 100 TB engine wants for
"one sample, many later predicates": unlike a per-query Bernoulli
sample, ONE size-k priority sample answers every subsequent subset-sum
query, with heavy items (w ≥ τ) represented exactly — the same
heavy-tail robustness motivation as the outlier-indexed estimator
(`plans/outlier.py`), but sample-once/query-many.

Determinism contract: u_i = (h_i + 1) / 2^32 from the portable hash, so
p_i = w_i · 2^32 / (h_i + 1) involves ONE multiply and ONE divide —
both IEEE-correctly-rounded, hence bit-identical in Spark and DuckDB
(no transcendentals). Ties order by the key column. τ is snapped UP to
the integer cents grid (ceil) before entering max(w_i, τ): every
retained term is then an exact BIGINT, the sum is order-free integer
arithmetic (no float-fold nondeterminism), at the cost of ≤ 1 cent
upward shift per below-threshold term — the repo's standard
integer-grid deviation, stated here rather than hidden.

Scale shape: one scan computing (w, priority, predicate) in pure
codegen → TakeOrdered(k+1) (per-partition heaps + one driver-side-free
reduction, NO global sort) → a (k+1)-row single-partition readout.
Nothing proportional to N is shuffled or collected.

Reference scope note: the reference engine's samplers (R1–R30) are all
unweighted row designs; weighted sample-once/query-many estimation is
beyond-reference (SURVEY §2.4 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from approximatequeryengine_spark.functions.hashing import (
    HASH_SPACE,
    portable_hash_col,
    portable_hash_sql,
)


def priority_sample_subset_sum(
    df: DataFrame,
    key: str,
    weight_cents: Column,
    subset: Column,
    k: int = 2048,
    salt: int = 0,
) -> DataFrame:
    """One-row readout (n_sample, tau_cents, n_subset_sample, est_sum).

    ``weight_cents`` must be an integer-cents Column (the sampling
    weight AND the summed measure); ``subset`` is the membership
    predicate — fixed after sampling, so any later predicate is fair.
    ``est_sum`` is in dollars on the 2-decimal grid.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = portable_hash_col(F.expr(key), salt)
    # DLT requires strictly positive weights; w = 0 rows contribute
    # nothing to any subset sum, so dropping them changes no estimate,
    # and negative weights (unsupported by the scheme) are excluded
    # rather than silently mis-ranked. Mirrored in the oracle SQL.
    df = df.filter(weight_cents.cast("long") > 0)
    base = df.select(
        F.expr(key).alias("__k"),
        weight_cents.cast("long").alias("__w"),
        subset.cast("int").alias("__in"),
        (
            weight_cents.cast("double")
            * F.lit(float(HASH_SPACE))
            / (h + F.lit(1)).cast("double")
        ).alias("__p"),
    )
    top = base.orderBy(F.desc("__p"), F.asc("__k")).limit(k + 1)
    w_rank = Window.orderBy(F.desc("__p"), F.asc("__k"))
    w_all = Window.partitionBy()
    ranked = (
        top.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn(
            "__tau",
            F.max(
                F.when(F.col("__rn") == k + 1, F.ceil("__p").cast("long"))
            ).over(w_all),
        )
        .withColumn("__tau", F.coalesce("__tau", F.lit(0)))
    )
    kept = ranked.filter(F.col("__rn") <= k)
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.max("__tau").cast("long").alias("tau_cents"),
        F.sum("__in").cast("long").alias("n_subset_sample"),
        F.round(
            F.sum(
                F.when(F.col("__in") == 1, F.greatest("__w", "__tau")).otherwise(
                    F.lit(0)
                )
            )
            / F.lit(100.0),
            2,
        ).alias("est_sum"),
    )


def priority_sample_subset_sum_sql(
    table: str,
    key: str,
    weight_cents_sql: str,
    subset_sql: str,
    k: int = 2048,
    salt: int = 0,
) -> str:
    """DuckDB oracle: the identical derivation — same hash, same
    single-multiply/single-divide priority, same (p DESC, key) ranking,
    same ceil-to-cents τ, same integer summation."""
    h = portable_hash_sql(key, salt)
    return f"""
WITH base AS (
  SELECT {key} AS k,
         CAST({weight_cents_sql} AS BIGINT) AS w,
         CASE WHEN {subset_sql} THEN 1 ELSE 0 END AS inn,
         CAST({weight_cents_sql} AS DOUBLE) * {float(HASH_SPACE)!r}
           / CAST(({h} + 1) AS DOUBLE) AS p
  FROM {table}
  WHERE CAST({weight_cents_sql} AS BIGINT) > 0
),
top AS (
  SELECT *, row_number() OVER (ORDER BY p DESC, k) AS rn
  FROM base ORDER BY p DESC, k LIMIT {k + 1}
),
tagged AS (
  SELECT *, coalesce(max(CASE WHEN rn = {k + 1}
                               THEN CAST(ceil(p) AS BIGINT) END) OVER (), 0) AS tau
  FROM top
)
SELECT CAST(count(*) AS BIGINT) AS n_sample,
       CAST(max(tau) AS BIGINT) AS tau_cents,
       CAST(sum(inn) AS BIGINT) AS n_subset_sample,
       round(CAST(sum(CASE WHEN inn = 1 THEN greatest(w, tau) ELSE 0 END)
                  AS DOUBLE) / 100.0, 2) AS est_sum
FROM tagged WHERE rn <= {k}
"""


def priority_grouped_sum(
    df: DataFrame,
    key: str,
    group: str,
    weight_cents: Column,
    k: int = 512,
    salt: int = 0,
) -> DataFrame:
    """Per-group priority sampling: one size-k DLT sample PER GROUP,
    per-group thresholds τ_g, per-group totals Σ max(w, τ_g). Rows
    (group, n_sample, tau_cents, est_sum) — the grouped complement of
    :func:`priority_sample_subset_sum`, the same relationship grouped
    outlier-index SUM bears to its global form.

    The rank is a slim ``row_number`` window over (group, priority,
    key) — only three columns enter the per-group sort, and groups
    sort independently after one shuffle on the group key. τ_g snaps
    UP to the cents grid, so each group's readout is order-free
    integer arithmetic (the global estimator's convention)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = portable_hash_col(F.expr(key), salt)
    base = df.filter(weight_cents.cast("long") > 0).select(
        F.col(group).alias("__g"),
        F.expr(key).alias("__k"),
        weight_cents.cast("long").alias("__w"),
        (
            weight_cents.cast("double")
            * F.lit(float(HASH_SPACE))
            / (h + F.lit(1)).cast("double")
        ).alias("__p"),
    )
    w_rank = Window.partitionBy("__g").orderBy(F.desc("__p"), F.asc("__k"))
    ranked = base.withColumn("__rn", F.row_number().over(w_rank)).filter(
        F.col("__rn") <= k + 1
    )
    w_g = Window.partitionBy("__g")
    tagged = ranked.withColumn(
        "__tau",
        F.coalesce(
            F.max(
                F.when(F.col("__rn") == k + 1, F.ceil("__p").cast("long"))
            ).over(w_g),
            F.lit(0),
        ),
    )
    return (
        tagged.filter(F.col("__rn") <= k)
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sample"),
            F.max("__tau").cast("long").alias("tau_cents"),
            F.round(
                F.sum(F.greatest("__w", "__tau")) / F.lit(100.0), 2
            ).alias("est_sum"),
        )
        .select(F.col("__g").alias(group), "n_sample", "tau_cents", "est_sum")
        .orderBy(group)
    )


def priority_grouped_sum_sql(
    table: str,
    key: str,
    group: str,
    weight_cents_sql: str,
    k: int = 512,
    salt: int = 0,
) -> str:
    """DuckDB oracle for the grouped estimator — identical ranking,
    per-group τ, and integer summation."""
    h = portable_hash_sql(key, salt)
    return f"""
WITH base AS (
  SELECT {group} AS g, {key} AS kk,
         CAST({weight_cents_sql} AS BIGINT) AS w,
         CAST({weight_cents_sql} AS DOUBLE) * {float(HASH_SPACE)!r}
           / CAST(({h} + 1) AS DOUBLE) AS p
  FROM {table}
  WHERE CAST({weight_cents_sql} AS BIGINT) > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY g ORDER BY p DESC, kk) AS rn
  FROM base
),
kept AS (SELECT * FROM ranked WHERE rn <= {k + 1}),
tagged AS (
  SELECT *, coalesce(max(CASE WHEN rn = {k + 1}
                               THEN CAST(ceil(p) AS BIGINT) END)
                     OVER (PARTITION BY g), 0) AS tau
  FROM kept
)
SELECT g AS {group}, CAST(count(*) AS BIGINT) AS n_sample,
       CAST(max(tau) AS BIGINT) AS tau_cents,
       round(CAST(sum(greatest(w, tau)) AS BIGINT) / 100.0, 2) AS est_sum
FROM tagged WHERE rn <= {k}
GROUP BY g ORDER BY g
"""
