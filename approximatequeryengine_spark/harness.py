"""Benchmark/validation harness — the reference's de-facto acceptance
protocol (SURVEY.md §5.2) re-expressed over Spark jobs:

- ``sample_rate_sweep``: rates [0,1,5,10,20,50]% × N runs, reporting
  avg/min/max time, relative error vs exact, speedup
  (``src/aqe_frontend/utils.py:58-117``).
- ``error_threshold_sweep``: thresholds [0.1,1,2,5]% through the
  adaptive executor (``clt_error_threshold_benchmark.py:81`` — but
  *measured*, not simulated like the reference's).
- ``benchmark_query``: exact vs approx for one query
  (``core/custom_scheduler.cpp:207-245``).

Results are plain dicts; ``to_csv`` exports the reference's CSV shape.
"""

from __future__ import annotations

import csv
import time
from dataclasses import replace

from pyspark.sql import DataFrame

from approximatequeryengine_spark.plans.adaptive import adaptive_aggregate
from approximatequeryengine_spark.plans.estimators import AggSpec, approx_aggregate
from approximatequeryengine_spark.plans.sampling import SamplingSpec, apply_sampling

DEFAULT_RATES = [0, 1, 5, 10, 20, 50]
DEFAULT_THRESHOLDS = [0.1, 1.0, 2.0, 5.0]


def _run_once(df: DataFrame, agg: AggSpec, spec: SamplingSpec) -> tuple[float, float, int]:
    t0 = time.time()
    row = approx_aggregate(apply_sampling(df, spec), agg).collect()[0]
    dt = time.time() - t0
    return float(row[agg.name()] or 0.0), dt, int(row["n_samples"])


def sample_rate_sweep(
    df: DataFrame,
    agg: AggSpec,
    key: str,
    rates: list[float] | None = None,
    runs: int = 3,
    design: str = "uniform_hash",
) -> list[dict]:
    """Rate 0 = exact baseline; others approximate. Per-rate rows with
    avg/min/max time, relative error, speedup vs exact."""
    rates = DEFAULT_RATES if rates is None else rates
    exact_val, exact_time, _ = _run_once(df, agg, SamplingSpec(design="none", key=key))
    out = []
    for rate in rates:
        times, vals = [], []
        for r in range(runs):
            if rate == 0:
                spec = SamplingSpec(design="none", key=key)
            else:
                spec = SamplingSpec(design=design, fraction=rate / 100.0, key=key, salt=r)
            v, dt, _n = _run_once(df, agg, spec)
            times.append(dt)
            vals.append(v)
        mean_val = sum(vals) / len(vals)
        rel_err = abs(mean_val - exact_val) / abs(exact_val) * 100 if exact_val else 0.0
        avg_t = sum(times) / len(times)
        out.append(
            {
                "sample_rate_pct": rate,
                "avg_time_s": round(avg_t, 4),
                "min_time_s": round(min(times), 4),
                "max_time_s": round(max(times), 4),
                "estimate": mean_val,
                "exact": exact_val,
                "relative_error_pct": round(rel_err, 4),
                "speedup_vs_exact": round(exact_time / avg_t, 3) if avg_t else float("inf"),
            }
        )
    return out


def error_threshold_sweep(
    df: DataFrame,
    agg: AggSpec,
    key: str,
    thresholds: list[float] | None = None,
) -> list[dict]:
    thresholds = DEFAULT_THRESHOLDS if thresholds is None else thresholds
    exact_val, exact_time, _ = _run_once(df, agg, SamplingSpec(design="none", key=key))
    out = []
    for e in thresholds:
        res = adaptive_aggregate(
            df, agg, SamplingSpec(fraction=0.0, key=key), error_pct=e
        )
        actual = abs(res.value - exact_val) / abs(exact_val) * 100 if exact_val else 0.0
        out.append(
            {
                "error_threshold_pct": e,
                "final_fraction": res.fraction,
                "iterations": res.iterations,
                "samples_used": res.samples_used,
                "time_s": round(res.computation_time, 4),
                "estimate": res.value,
                "ci_halfwidth": res.error_margin,
                "actual_error_pct": round(actual, 4),
                "within_budget": actual <= e,
                "speedup_vs_exact": round(exact_time / res.computation_time, 3)
                if res.computation_time
                else float("inf"),
            }
        )
    return out


def benchmark_query(df: DataFrame, agg: AggSpec, key: str, fraction: float = 0.1) -> dict:
    exact_val, exact_time, _ = _run_once(df, agg, SamplingSpec(design="none", key=key))
    approx_val, approx_time, n = _run_once(
        df, agg, SamplingSpec(design="uniform_hash", fraction=fraction, key=key)
    )
    return {
        "exact": exact_val,
        "approx": approx_val,
        "error_pct": round(abs(approx_val - exact_val) / abs(exact_val) * 100, 4)
        if exact_val
        else 0.0,
        "exact_time_s": round(exact_time, 4),
        "approx_time_s": round(approx_time, 4),
        "speedup": round(exact_time / approx_time, 3) if approx_time else float("inf"),
        "samples_used": n,
    }


def to_csv(rows: list[dict], path: str) -> None:
    if not rows:
        return
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
