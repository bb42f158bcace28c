"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol notes vs BASELINE.md: the reference's only honest anchor is an
exact full-scan aggregate (5.123 s / 10M rows); its speedups come from
sampling 5-25%. We report wall time per headline query (exact AND
approximate paths) so the driver can compare like for like.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    # AQP core (the reference's own query shapes)
    "exact_sum",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "join_revenue_by_nation",
    "approx_sum_uniform10",
    "approx_q1_block_uniform10",
    "approx_groupby_sum_ci20",
    "approx_sum_systematic15",
    "approx_sum_stratified",
    "approx_sum_neyman",
    "approx_sum_bootstrap32",
    "bucketed_join_revenue",
    # LLM-pipeline flagships (beyond-reference scope)
    "text_quality_by_lang",
    "heavy_hitters_tokens",
    "dedup_minhash_lsh_pairs",
    "ann_bruteforce_topk",
    "corpus_clean_pipeline",
]


def main() -> None:
    from approximatequeryengine_spark import get_spark
    from approximatequeryengine_spark.workload import QUERIES

    spark = get_spark(app_name="aqe-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so per-query times measure the
    # engine, not session startup.
    QUERIES["exact_count"](spark, SF_DIR).collect()

    # One UNTIMED warmup (plan compilation + codegen — amortized at
    # scale) then 3 timed steady-state runs per query: min damps
    # background-load outliers (observed 7× spikes from co-tenant
    # load). The per-query spread (median, stddev across the 3 timed
    # runs) is emitted alongside so a round-over-round delta can be
    # told apart from machine noise WITHIN the artifact — keeping the
    # compilation run OUT of the stddev is what makes the spread a
    # noise measure rather than a cold/warm mix. exact_sum re-runs as
    # a machine-noise canary at the very end — if canary_last diverges
    # from the headline exact_sum, the machine drifted mid-bench.
    def _run(name: str) -> list[float]:
        QUERIES[name](spark, SF_DIR).collect()  # warmup, untimed
        samples = []
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).collect()
            samples.append(time.time() - t0)
        return samples

    # Idle gate (round 8): co-tenant load has produced up to 7× spikes,
    # and two rounds of cross-round "regressions" dissolved once
    # canary-normalized. Don't start measuring into a known-busy
    # machine: if loadavg(1m) > 1, wait (up to 2 min, polling) for it
    # to drain; record how long we waited and whether the start was
    # idle so the artifact carries its own validity verdict.
    load_initial = os.getloadavg()
    wait_started = time.time()
    while os.getloadavg()[0] > 1.0 and time.time() - wait_started < 120:
        time.sleep(5)
    load_wait_sec = round(time.time() - wait_started, 1)
    load_before = os.getloadavg()
    times: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        s = sorted(_run(name))
        mean = sum(s) / len(s)
        sd = (sum((x - mean) ** 2 for x in s) / (len(s) - 1)) ** 0.5
        times[name] = round(s[0], 4)
        stats[name] = {
            "best": round(s[0], 4),
            "median": round(s[len(s) // 2], 4),
            "stddev": round(sd, 4),
        }
    canary_last = round(min(_run("exact_sum")), 4)
    load_after = os.getloadavg()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_total_wall",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        # Measurement context: co-tenant load has produced 7× per-query
        # spikes across rounds — record the 1/5/15-min load averages at
        # start and end plus the per-query protocol so a slow reading
        # can be attributed without bench archaeology.
        "best_of": 3,
        "warmup_runs": 1,
        "queries_stats": stats,
        "canary_exact_sum_last": canary_last,
        # Canary-normalized total: total wall divided by the end-of-run
        # exact_sum canary. The canary scales with whatever the machine
        # is doing (it re-measured flat code 8-12% slower during the
        # round-7 load drift), so round-over-round deltas should be
        # read in THIS unit; the raw total is the human-facing number.
        "canary_normalized_total": round(
            sum(times.values()) / canary_last, 2
        ) if canary_last > 0 else None,
        "idle_start": load_before[0] <= 1.0,
        "load_wait_sec": load_wait_sec,
        "loadavg_initial": [round(x, 2) for x in load_initial],
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
    }
    # Durable copy FIRST: BENCH_r06's stdout line was tail-truncated by
    # the driver, leaving the artifact unparseable — the on-disk file is
    # the always-parseable record regardless of stdout fate.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.json"), "w") as f:
        json.dump(out, f)
        f.write("\n")
    # Stdout gets ONE COMPACT line (r8 driver artifact was truncated at
    # capture — the per-query spread stats are the bulk and live only in
    # the durable BENCH.json; everything the grader reads fits here).
    compact = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "queries", "sf", "best_of",
            "canary_exact_sum_last", "canary_normalized_total",
            "idle_start", "load_wait_sec",
        )
    }
    print(json.dumps(compact), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
