"""Adversarial NULL-injection parity sweep.

The shipped fixtures carry no NULLs in feature columns, so any
cross-engine divergence in NULL handling (grouping, ordering with
LIMIT, count-vs-filtered-count, NULL-skipping aggregates) is invisible
to the regular correctness gate — the drift-monitor n_vecs bug was
exactly this class. This tool builds a DERIVED copy of sf0.001 with
deterministic NULLs injected into feature columns (keys stay non-null:
join/blocking keys are structural contracts, several operators
rightly raise on them), then runs the SAME spark-vs-DuckDB comparison
check_entry.py applies, against the injected directory:

    python tools/null_sweep.py            # build + sweep all entries
    python tools/null_sweep.py build      # build the directory only

Injection is keyed on row ids (key % prime == 0, ~2-3% per column) so
the corpus is reproducible run to run. A FAIL here means the two
engines disagree on NULL semantics for that entry — triage each as a
real parity bug (fix the entry/oracle) or a declared non-null input
contract (add it to SKIP with the reason).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.001"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".nullinj_sf0001"
)

# extra non-NULL dirt: (column, key, value-SQL) applied after the NULL
# injection — realistic telemetry noise (NaN/Infinity measurements).
# Both engines use total-order NaN semantics (NaN > 0 and NaN = NaN are
# TRUE in Spark and DuckDB), so these certify end-to-end parity, not
# just comparison semantics.
DIRTY = {
    # table -> column -> (key, nan_prime, inf_prime)
    "events": {"value": ("event_id", 53, 59)},
}

# vector dirt: replace dimension 1 with NaN on key % prime == 0 rows
# (a broken encoder emits non-finite dims; the vector-validity policy
# is all-or-nothing — one bad dim invalidates the vector)
DIRTY_VEC = {
    "embeddings": {"embedding": ("vec_id", 53)},
}

# column -> (key expression, prime) — NULL where key % prime == 0
INJECT = {
    "documents": {
        "text": ("doc_id", 41),
        "lang": ("doc_id", 43),
    },
    "embeddings": {
        "embedding": ("vec_id", 41),
        "label": ("vec_id", 43),
    },
    "events": {
        "event_type": ("event_id", 41),
        "value": ("event_id", 43),
        # telemetry rows do arrive without an event time; NULL-ts
        # ordering is also where the engines' defaults diverge
        # (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST)
        "ts": ("event_id", 61),
    },
    "orders": {
        "o_orderpriority": ("o_orderkey", 41),
    },
    "lineitem": {
        "l_discount": ("l_orderkey", 41),
        "l_returnflag": ("l_orderkey", 43),
    },
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Entries whose input contract or physical design legitimately
# excludes the injected NULLs — each with the written reason.
SKIP: dict[str, str] = {}


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        inj = INJECT.get(t, {})

        dirty = DIRTY.get(t, {})
        dirty_vec = DIRTY_VEC.get(t, {})

        def render(c: str) -> str:
            expr = c
            if c in dirty_vec:
                key, p = dirty_vec[c]
                expr = (
                    f"CASE WHEN {key} % {p} = 0 THEN "
                    f"list_concat(['NaN'::FLOAT], {expr}[2:]) ELSE {expr} END"
                )
            if c in dirty:
                key, pn, pi = dirty[c]
                expr = (
                    f"CASE WHEN {key} % {pn} = 0 THEN 'NaN'::DOUBLE "
                    f"WHEN {key} % {pi} = 0 THEN 'Infinity'::DOUBLE "
                    f"ELSE {expr} END"
                )
            if c in inj:
                key, p = inj[c]
                expr = f"CASE WHEN {key} % {p} = 0 THEN NULL ELSE {expr} END"
            return f"{expr} AS {c}" if expr != c else c

        sel = ", ".join(render(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows, injected {sorted(inj)}", flush=True)


def sweep() -> int:
    os.environ["AQE_CHECK_SF_DIR"] = DST
    from check_entry import check_query, get_session, make_duck

    import __spark_entry__ as entrymod

    spark = get_session()
    con = make_duck(DST)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name in SKIP:
            print(f"  {name}: SKIP ({SKIP[name]})", flush=True)
            continue
        reason, ok = check_query(spark, con, name, fn, oracles.get(name), sf_dir=DST)
        if reason:
            failures.append((name, reason))
            print(f"FAIL {name}: {reason[:200]}", flush=True)
        else:
            print(f"  {name}: {ok}", flush=True)
    print(
        f"\nnull-injection sweep: {len(qs) - len(failures) - len(SKIP)} ok, "
        f"{len(failures)} FAIL, {len(SKIP)} skipped"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    build()
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        sys.exit(0)
    sys.exit(sweep())
