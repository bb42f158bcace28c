"""Time ONE registered query at an arbitrary SF dir: best-of-N warm
wall seconds, printed as a single JSON line. Meant to be driven per
query under an external `timeout` so a single blowup cannot stall a
whole scaling sweep (the sf10 protocol in SCALING.md):

    timeout 600 python tools/time_one.py <query> [sf_dir] [runs]

Set AQE_TIME_COUNT=1 to measure plan execution throughput WITHOUT
driver materialization (df.count() instead of .collect()) — the right
measure for entries whose output is itself large (pair lists), where
collect() would time driver serialization rather than the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaling_sf10"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    count_mode = os.environ.get("AQE_TIME_COUNT") == "1"

    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.workload import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"time-{name}", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["exact_count"](spark, sf_dir).collect()  # warm session + footers

    samples, n_rows = [], None
    for _ in range(runs):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n_rows = df.count() if count_mode else len(df.collect())
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "best": min(samples),
        "samples": samples, "rows": n_rows,
        "mode": "count" if count_mode else "collect",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
