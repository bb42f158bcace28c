"""APPROX markers inside arbitrary SQL — beyond the reference grammar.

The reference dialect (``frontend/dialect.py``, mirroring
``enhanced_aqe_cli.py:83-95``) accepts one aggregate over one table.
This module lets a user write *plain SQL* — joins, multi-column group
bys, ORDER BY/LIMIT — and mark it approximate with two SQL-standard
pieces of syntax:

- ``FROM fact TABLESAMPLE (p PERCENT) JOIN ...`` says WHICH table to
  sample (and at what rate),
- ``APPROX(SUM(expr)) AS alias`` in the SELECT list says WHAT to
  estimate (SUM/AVG/COUNT, any expression, any number of them).

The rewrite is a sampled-CTE injection: the marked table is replaced by
a derived table filtered to the engine's deterministic hash sample
(``sampling_where_sql`` — the SAME membership predicate every other
estimator uses, NOT Spark's nondeterministic native TABLESAMPLE), and
each APPROX aggregate becomes the Horvitz-Thompson estimate with the
repo's CLT confidence interval, computed from per-group moment columns
in an inner aggregate (the exact formulas of
``plans/estimators.py::moments_sql``).

Statistical precondition (the user asserts it by marking the table):
every sampled row joins at most a BOUNDED, sample-independent number of
rows on the other side — true for key-preserving star joins (each fact
row matches exactly one row per dim), where per-row inclusion
probability survives the join unchanged. A fan-out join would need
weight corrections this rewrite does not apply. The certified
``approx_join_revenue_by_nation`` entry pins the estimator's
correctness through such a join; this module makes the same plan
reachable from SQL text.

The rewritten text is PORTABLE (Spark SQL ∩ DuckDB SQL): the driver
oracle runs the identical string, so the two engines compute the same
sample, estimate and CI bit-for-bit (modulo the documented rounding).

Scale note: the sample predicate lands inside the derived table, so
Catalyst pushes it into the fact scan (10× fewer rows BEFORE any join
shuffle); the moment columns ride the one aggregate the query already
needed. No extra passes, no driver-side math.
"""

from __future__ import annotations

import re

from approximatequeryengine_spark.plans.estimators import Z_95
from approximatequeryengine_spark.plans.sampling import (
    SamplingSpec,
    sampling_p_sql,
    sampling_where_sql,
)

_TABLESAMPLE = re.compile(
    r"(\w+)\s+TABLESAMPLE\s*\(\s*([\d.]+)\s*PERCENT\s*\)", re.IGNORECASE
)

# Top-level clause keywords, longest-match-first.
_CLAUSES = ["GROUP BY", "HAVING", "ORDER BY", "LIMIT"]


def _scan_top_level(s: str, word: str, start: int = 0) -> int:
    """Index of ``word`` at paren-depth 0 outside quotes, or -1."""
    depth = 0
    i = start
    n = len(s)
    wl = len(word)
    lower = s.lower()
    wordl = word.lower()
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and lower.startswith(wordl, i):
            before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
            j = i + wl
            after_ok = j >= n or not (s[j].isalnum() or s[j] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _split_commas(s: str) -> list[str]:
    """Split on top-level commas."""
    parts, depth, last = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[last:i].strip())
            last = i + 1
    parts.append(s[last:].strip())
    return [p for p in parts if p]


_APPROX_ITEM = re.compile(
    r"^APPROX\s*\(\s*(SUM|AVG|COUNT)\s*\((.*)\)\s*\)\s+AS\s+(\w+)$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_select_item(item: str):
    """-> ('approx', agg, expr, alias) | ('plain', text)."""
    m = _APPROX_ITEM.match(item.strip())
    if not m:
        return ("plain", item.strip())
    agg, expr, alias = m.group(1).upper(), m.group(2).strip(), m.group(3)
    # The regex is greedy across the two closing parens; verify the
    # captured expr is itself balanced (rejects APPROX(SUM(a)) + 1).
    if expr.count("(") != expr.count(")"):
        return ("plain", item.strip())
    return ("approx", agg, expr, alias)


def rewrite_approx_sql(
    query: str,
    key_by_table: dict[str, str],
    z: float = Z_95,
    round_to: int | None = None,
) -> str | None:
    """Rewrite plain SQL with TABLESAMPLE + APPROX() markers into the
    portable sampled-estimate query, or None when the markers or shape
    don't apply (caller falls back to exact ``spark.sql``).

    ``key_by_table`` maps table name → unique-key SQL expression for the
    deterministic hash sample (``catalog.TABLES`` for the fixtures).
    ``round_to`` rounds estimates and CI bounds (both engines).
    """
    if "APPROX" not in query.upper():
        return None
    ts = _TABLESAMPLE.search(query)
    if not ts:
        return None
    table, pct = ts.group(1), float(ts.group(2))
    if table not in key_by_table or not 0.0 < pct <= 100.0:
        return None
    spec = SamplingSpec(
        design="uniform_hash", fraction=pct / 100.0, key=key_by_table[table]
    )
    sampled = f"(SELECT * FROM {table} WHERE {sampling_where_sql(spec)}) {table}"
    query = query[: ts.start()] + sampled + query[ts.end() :]

    # Clause layout (top level only; HAVING/CTE/set-ops are out of the
    # v1 shape and return None → exact fallback).
    if _scan_top_level(query, "HAVING") != -1:
        return None
    sel_at = _scan_top_level(query, "SELECT")
    from_at = _scan_top_level(query, "FROM")
    if sel_at != 0 or from_at == -1:
        return None
    select_list = query[sel_at + len("SELECT") : from_at]
    tail_at = len(query)
    tail = ""
    for kw in ("ORDER BY", "LIMIT"):
        at = _scan_top_level(query, kw)
        if at != -1 and at < tail_at:
            tail_at = at
    body = query[from_at:tail_at].rstrip().rstrip(";")
    tail = query[tail_at:].rstrip().rstrip(";")

    items = [_parse_select_item(i) for i in _split_commas(select_list)]
    approxes = [i for i in items if i[0] == "approx"]
    if not approxes:
        return None

    p_sql = sampling_p_sql(spec)
    inner_cols: list[str] = []
    outer_cols: list[str] = []
    for it in items:
        if it[0] == "plain":
            inner_cols.append(it[1])
            # project the alias if present, else the expression verbatim
            alias = re.search(r"\bAS\s+(\w+)\s*$", it[1], re.IGNORECASE)
            outer_cols.append(alias.group(1) if alias else it[1])
    single = len(approxes) == 1
    for k, (_, agg, expr, alias) in enumerate(approxes):
        x = "CAST(1 AS DOUBLE)" if expr.strip() == "*" else f"CAST({expr} AS DOUBLE)"
        inner_cols += [
            f"COUNT({x}) AS n_{k}",
            f"SUM({x}) AS s1_{k}",
            f"SUM({x}*{x}) AS s2_{k}",
            f"SUM({x} / {p_sql}) AS ht_{k}",
            f"SUM(1.0 / {p_sql}) AS htn_{k}",
            f"SUM({x}*{x} * (1.0 - {p_sql}) / ({p_sql} * {p_sql})) AS vht_{k}",
            f"AVG({p_sql}) AS pavg_{k}",
        ]
        var = (
            f"CASE WHEN n_{k} >= 2 THEN "
            f"greatest((s2_{k} - s1_{k}*s1_{k}/n_{k}) / (n_{k} - 1.0), 0.0) "
            f"ELSE 0.0 END"
        )
        if agg == "AVG":
            est = f"ht_{k} / htn_{k}"
            margin = f"{z} * sqrt(({var}) / n_{k})"
        elif agg == "SUM":
            est = f"ht_{k}"
            margin = f"{z} * sqrt(greatest(vht_{k}, 0.0))"
        else:  # COUNT
            est = f"htn_{k}"
            margin = f"{z} * sqrt(n_{k} * (1.0 - pavg_{k})) / pavg_{k}"
        margin = f"CASE WHEN n_{k} >= 2 THEN {margin} ELSE 0.0 END"
        if agg != "AVG":  # integer margin — see estimators._ci_columns
            margin = (
                f"CASE WHEN ({margin}) > 0 "
                f"THEN greatest(round({margin}, 0), 1.0) ELSE 0.0 END"
            )

        def _r(e: str) -> str:
            return f"round({e}, {round_to})" if round_to is not None else e

        lo = "ci_lower" if single else f"{alias}_lo"
        hi = "ci_upper" if single else f"{alias}_hi"
        outer_cols += [
            f"{_r(est)} AS {alias}",
            f"{_r(f'({est}) - ({margin})')} AS {lo}",
            f"{_r(f'({est}) + ({margin})')} AS {hi}",
        ]
    outer_cols.append("CAST(n_0 AS BIGINT) AS n_samples")

    inner = f"SELECT {', '.join(inner_cols)} {body}"
    out = f"SELECT {', '.join(outer_cols)} FROM ({inner}) __m"
    if tail:
        out = f"{out} {tail}"
    return out
