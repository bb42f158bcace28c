"""Sample-based distinct-count estimation (Chao1 species richness).

The naive "COUNT(DISTINCT x) in the sample" strictly undercounts (values
entirely outside the sample are invisible). Chao1 corrects from the
sample's abundance spectrum:

    D̂ = D_obs + f1² / (2·f2)        (f2 > 0)
    D̂ = D_obs + f1·(f1−1) / 2       (f2 = 0, bias-corrected form)

where f1/f2 are the counts of values seen exactly once/twice (Chao 1984).
Complements the HLL++ sketch (`sketch_approx_distinct`): Chao1 needs only
a sample (works on top of any deterministic design here); HLL needs a
full scan but gives tighter error.

Everything is integer-derived arithmetic over the deterministic hash
sample — no float summation — so one SQL text is bit-identical in Spark
and DuckDB (the CAST AS DOUBLE inside round() pins the result type,
which DuckDB would otherwise widen to DECIMAL).

Scale shape: one scan with the codegen sample predicate → one shuffle on
(group, value) for the frequency table → map-side-combined rollup to
|groups| rows. The frequency shuffle carries only sampled rows.
"""

from __future__ import annotations

from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    sampling_where_sql,
)


def chao1_sql(
    table: str,
    column: str,
    spec: SamplingSpec,
    group_col: str | None = None,
) -> str:
    """Engine-portable Chao1 SQL (global, or per ``group_col``)."""
    where = sampling_where_sql(spec)
    g_sel = f"{group_col} AS g, " if group_col else ""
    g_key = "g, " if group_col else ""
    g_head = f"g AS {group_col}, " if group_col else ""
    g_tail = " GROUP BY g ORDER BY g" if group_col else ""
    f1 = "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)"
    f2 = "sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)"
    chao = (
        f"CASE WHEN {f2} > 0 THEN ({f1} * {f1}) / (2.0 * {f2}) "
        f"ELSE ({f1} * ({f1} - 1)) / 2.0 END"
    )
    return (
        f"WITH s AS (SELECT {g_sel}{column} FROM {table} WHERE {where}), "
        f"freq AS (SELECT {g_key}{column}, count(*) AS c FROM s "
        f"         GROUP BY {g_key}{column}) "
        f"SELECT {g_head}count(*) AS d_obs, "
        f"CAST({f1} AS BIGINT) AS f1, CAST({f2} AS BIGINT) AS f2, "
        f"round(CAST(count(*) + {chao} AS DOUBLE), 2) AS d_chao1 "
        f"FROM freq{g_tail}"
    )
