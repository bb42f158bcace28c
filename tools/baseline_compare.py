"""Head-to-head vs the reference's published anchor: exact + approximate
SUM/AVG/COUNT over a 10M-row `sales` table (the reference's own demo
schema and scale — BASELINE.md: exact B-tree aggregate 5.123 s, ~1.95M
records/s; CLT path 0.025-0.110 s *simulated*).

Generates the 10M rows distributed (sources.registry.create_sales_df —
the reference's utils.py generator re-expressed as a spark.range
pipeline), materializes to parquet once, then times:
  - exact SUM(amount)  (the 5.123 s anchor)
  - APPROX 10% uniform SUM with CI (the sampled path)
  - adaptive CLT SUM at 2% error budget (the reference's headline mode)

Prints one JSON line. Run: python tools/baseline_compare.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 10_000_000


def main() -> None:
    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.plans.adaptive import adaptive_aggregate
    from approximatequeryengine_spark.plans.estimators import AggSpec, approx_aggregate
    from approximatequeryengine_spark.plans.sampling import SamplingSpec, apply_sampling
    from approximatequeryengine_spark.sources.registry import create_sales_df

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="baseline-compare", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(tempfile.gettempdir(), f"aqe_sales_{N}")
    if not os.path.exists(path):
        create_sales_df(spark, n=N).write.mode("overwrite").parquet(path)
    sales = spark.read.parquet(path)
    sales.count()  # warm file listing + footers

    out: dict = {"rows": N, "cpus": int(cpus)}

    def best_of(fn, runs=2):
        best, result = float("inf"), None
        for _ in range(runs):
            t0 = time.time()
            result = fn()
            best = min(best, time.time() - t0)
        return best, result

    t, exact = best_of(lambda: sales.agg({"amount": "sum"}).collect()[0][0])
    out["exact_sum_sec"] = round(t, 4)
    out["exact_throughput_mrows_per_sec"] = round(N / out["exact_sum_sec"] / 1e6, 2)

    spec = SamplingSpec(design="uniform_hash", fraction=0.10, key="id")
    t, row = best_of(lambda: approx_aggregate(
        apply_sampling(sales, spec), AggSpec("sum", "amount")
    ).collect()[0])
    out["approx10_sec"] = round(t, 4)
    out["approx10_rel_err_pct"] = round(
        100.0 * abs(row["sum_amount"] - exact) / exact, 4
    )
    out["approx10_ci_covers"] = bool(row["ci_lower"] <= exact <= row["ci_upper"])

    t, res = best_of(lambda: adaptive_aggregate(
        sales, AggSpec("sum", "amount"),
        SamplingSpec(design="uniform_hash", fraction=0.10, key="id"),
        error_pct=2.0))
    out["clt2pct_sec"] = round(t, 4)
    out["clt2pct_rel_err_pct"] = round(100.0 * abs(res.value - exact) / exact, 4)
    out["clt2pct_samples"] = res.samples_used

    out["reference_exact_sec"] = 5.123  # BASELINE.md anchor, 10M records
    out["speedup_exact_vs_reference"] = round(5.123 / out["exact_sum_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
