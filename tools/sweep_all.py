"""Measure EVERY registered queries() entry at one SF dir in a single
warm session: per-entry wall seconds (run twice, report both — run 1
pays plan compilation, run 2 is the steady-state number), written as
JSONL so a crash/stall leaves a complete record up to the offender.

    python tools/sweep_all.py [sf_dir] [out.jsonl]

Complements tools/time_one.py (per-query subprocess + external timeout,
for entries suspected of blowing up): this sweep is the cheap full-
registry pass that FINDS the suspects — any entry whose sf1 wall is
far above its family's is the next zorder-ntile/SimHash-candidate
class scale bug. Output entries that are pair lists still collect();
interpret their walls as output-bound (see SCALING.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling_sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_all.jsonl"

    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.workload import QUERIES

    spark = get_spark(
        app_name="sweep-all",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    with open(out_path, "w") as f:
        for name, fn in QUERIES.items():
            rec: dict = {"query": name}
            try:
                walls = []
                rows = 0
                for _ in range(2):
                    t0 = time.time()
                    rows = len(fn(spark, sf_dir).collect())
                    walls.append(round(time.time() - t0, 3))
                rec.update(cold=walls[0], warm=walls[1], rows=rows)
            except Exception as e:  # noqa: BLE001 — record and continue
                rec["err"] = f"{type(e).__name__}: {e}"[:300]
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
