"""Capture .explain("formatted") for registry queries into a directory.

    python tools/explain_all.py <out_dir> [suffix] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (default:
the bench HEADLINE list). Queries whose entry point does not return a
DataFrame plan directly (driver-orchestrated multi-job entries) still
produce the plan of the FINAL returned frame — the per-pass plans of
multi-job entries are captured by their own plan gates in tests.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(out_dir, exist_ok=True)

    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.workload import QUERIES

    if len(sys.argv) > 3:
        names = sys.argv[3:]
    else:
        from bench import HEADLINE
        names = list(HEADLINE)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="explain-all", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
