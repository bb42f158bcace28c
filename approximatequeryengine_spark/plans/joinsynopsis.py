"""Join synopses — precomputed uniform samples OF A JOIN (Acharya,
Gibbons, Poosala, Ramaswamy: "Join Synopses for Approximate Query
Processing", SIGMOD 1999; the same construction underlies AQUA and
BlinkDB's join handling).

Sampling two tables independently and joining the samples does NOT
give a uniform sample of the join (inclusion probability p² and the
sample-of-joins ≠ join-of-samples problem the paper names). The AQUA
fix: sample the FACT side with the engine's deterministic uniform hash
and join the sample along its FOREIGN KEY — each fact row matches
exactly one dimension row, so join multiplicity is 1 and the result is
a true Bernoulli(p) sample of the full join. Persist it once; every
later query over the join runs on the synopsis through the standard
Horvitz-Thompson estimator layer (`plans/estimators.py`) with the
usual CIs — no join is ever executed at query time.

At 100 TB: the build pays the fact-dim shuffle ONCE at ingest (with
the dim side broadcast when small, which Catalyst chooses for TPC-H
dims); queries scan only the f·|fact| synopsis — two orders of
magnitude less IO at f=1% — and are plain grouped aggregates with no
shuffle beyond their own group-by. The synopsis maintains
incrementally: the hash predicate is row-local, so sampling an ingest
batch and joining it to the (current) dimension table appends exactly
the rows a full rebuild would produce (append == rebuild,
bit-for-bit, pinned in tests).

Determinism contract: the fact sample is the portable hash predicate
(`plans/sampling.py::sampling_where_sql` renders it for DuckDB), so
the oracle replays sample → FK join → HT estimate on the base tables
and must match the synopsis-served answer exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from approximatequeryengine_spark.plans.estimators import (
    AggSpec,
    approx_aggregate,
)
from approximatequeryengine_spark.plans.sampling import (
    P_COL,
    SamplingSpec,
    apply_sampling,
)


def join_synopsis_build(
    spark: SparkSession,
    path: str,
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_key: str,
    fraction: float = 0.1,
    salt: int = 0,
    columns: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Sample ``fact`` (deterministic uniform hash on ``fact_key``),
    join along the FK ``on``, persist the synopsis (plus ``__p``).

    ``columns`` prunes the persisted schema to what later queries
    need; the FK join is inner (reference-intact FKs — TPC-H
    guarantees it; an orphaned fact row would silently drop, which a
    production build would flag with an anti-join count).
    """
    spec = SamplingSpec(
        design="uniform_hash", fraction=fraction, key=fact_key, salt=salt
    )
    syn = apply_sampling(fact, spec).join(dim, on=on, how="inner")
    if columns:
        syn = syn.select(*columns, P_COL)
    syn.write.mode(mode).parquet(path)


def join_synopsis_append(
    spark: SparkSession,
    path: str,
    fact_batch: DataFrame,
    dim: DataFrame,
    on: str,
    fact_key: str,
    fraction: float = 0.1,
    salt: int = 0,
    columns: list[str] | None = None,
) -> None:
    """Ingest-time maintenance: the row-local hash predicate makes
    sample(batch) ∪ sample(existing) == sample(existing ∪ batch), so
    appending the sampled-joined batch equals a full rebuild."""
    join_synopsis_build(
        spark, path, fact_batch, dim, on, fact_key,
        fraction=fraction, salt=salt, columns=columns, mode="append",
    )


def join_synopsis_agg(
    spark: SparkSession,
    path: str,
    agg: AggSpec,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Answer an aggregate over the JOIN from the synopsis alone —
    standard HT estimate + CI; the base tables are never touched."""
    return approx_aggregate(spark.read.parquet(path), agg, group_by=group_by)
