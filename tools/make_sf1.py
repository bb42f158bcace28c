"""Synthesize an sf1-scale measurement dataset (~10x sf0.1) for the
SCALING.md data-term curve of the CPU-bound operators.

The driver only ships sf{0.001,0.01,0.1} fixtures; this replicates the
sf0.1 tables 10x with shifted keys into .scaling_sf1/ — MEASUREMENT
INPUT ONLY (never used for correctness oracles, which run on the
driver's own fixtures). Key shifting keeps uniqueness invariants
(l_orderkey, doc_id, vec_id) so hash sampling and dedup behave like
real data rather than 10 identical copies; document text gets a
replica-tag token appended so near-dup operators see distinct-but-
similar corpora instead of a degenerate 10x exact-dup blowup.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
# Default: 10 replicas -> .scaling_sf1 (sf1). Pass an integer argv[1]
# for other decades, e.g. ``python tools/make_sf1.py 100`` builds
# .scaling_sf10 (100x sf0.1) for the two-decade scaling table.
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    f".scaling_sf{REPLICAS // 10}" if REPLICAS != 10 else ".scaling_sf1",
)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    key_shift = {
        "lineitem": ("l_orderkey", 100_000_000),
        "orders": ("o_orderkey", 100_000_000),
        "documents": ("doc_id", 10_000_000),
        "embeddings": ("vec_id", 10_000_000),
        "events": ("event_id", 1_000_000_000),
    }
    for table, (key, stride) in key_shift.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        sel = []
        for c in cols:
            if c == key:
                sel.append(f"{c} + r.i * {stride} AS {c}")
            elif table == "documents" and c == "text":
                sel.append("CASE WHEN r.i = 0 THEN text ELSE text || ' rep' || r.i END AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}' t CROSS JOIN "
            f"(SELECT unnest(range({REPLICAS})) AS i) r) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows")
    # small dims copied verbatim (joins need them present)
    for table in ("region", "nation", "customer", "supplier", "part"):
        src, dst = f"{SRC}/{table}.parquet", f"{DST}/{table}.parquet"
        if not os.path.exists(dst):
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            print(f"{table}: copied")
    # Corpus metadata: queries whose semantics depend on the replica
    # blowup (q20's stock-vs-shipped cutoff) derive their constants
    # from THIS file per sf_dir (workload._fixture_replicas) — never
    # from process environment.
    import json

    with open(os.path.join(DST, "fixture_meta.json"), "w") as f:
        json.dump({"replicas": REPLICAS, "source": SRC}, f)
        f.write("\n")


if __name__ == "__main__":
    sys.exit(main())
