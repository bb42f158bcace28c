"""Adaptive / CLT-stopped execution (reference R8-R10, V1-V7).

The reference spawns fast/slow sampling threads that stop when
``z·√(var/n)/|mean|·100 ≤ max_error%`` (``custom_bplus_db.cpp:953-961``)
and cross-validates the fast estimate against repeated slow 2% samples
(``scheduler.cpp:291-397``). Spark can't cheaply stop mid-job, so the
idiomatic translation (SURVEY.md §7 phase 4) is a driver loop that
escalates the sample *fraction* geometrically between jobs:

    fraction ← error-ladder(e)            (enhanced_aqe_cli.py:243-250)
    repeat:  one moments job → margin;  stop if rel. margin ≤ e
             else fraction ← min(1, 2·fraction)

Because the default ``uniform_hash`` design is *nested* in the fraction
(h(k) < f·2³²), every escalation step's sample is a superset of the
last — total rows ever scanned ≤ 2× the final sample, the same bounded
overshoot the reference gets from incremental growth. Each iteration is
one Spark job over a cheap codegen'd filter; nothing is collected but
the (few-row) moments result.

Validation (V1-V5): k independent small samples via different hash
salts; confidence = max(0, 1 − cv) over their estimates, and the
fast-vs-validators drift check classifies STABLE / DRIFTING.
"""

from __future__ import annotations

import time
from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximatequeryengine_spark.plans.estimators import Z_95, AggSpec, approx_aggregate
from approximatequeryengine_spark.plans.sampling import SamplingSpec, apply_sampling
from approximatequeryengine_spark.result import (
    ApproximationStatus,
    ApproxResult,
    heuristic_confidence,
)


def error_ladder(error_pct: float) -> float:
    """Initial sampling fraction from the error budget
    (``enhanced_aqe_cli.py:243-250``)."""
    if error_pct <= 1.0:
        return 0.20
    if error_pct <= 2.0:
        return 0.15
    if error_pct <= 5.0:
        return 0.10
    return 0.05


def adaptive_grouped_aggregate(
    df: DataFrame,
    agg: AggSpec,
    group_by: list[str],
    spec: SamplingSpec,
    error_pct: float = 2.0,
    max_iterations: int = 8,
    min_samples: int = 50,
    z: float = Z_95,
) -> tuple[DataFrame, float, int]:
    """Grouped adaptive escalation (R8-R10 extended beyond the
    reference, which runs grouped queries at a FIXED fraction,
    ``enhanced_aqe_cli.py:243-250``): double the sampling fraction until
    the *worst group's* relative CI half-width meets ``error_pct``.

    One grouped moments job per rung; the driver sees only ≤|groups|
    rows per iteration, so the sync cost is the same bounded shape as
    the global loop. Samples are nested in the fraction
    (``uniform_hash``: h(k) < f·2³²), so total rows scanned ≤ 2× the
    final rung. A group must have ``n ≥ min_samples`` and a nonzero
    estimate to count as converged; a rung with no rows at all never
    converges. The terminal rung is a pure function of the data —
    the DuckDB oracle re-derives it by evaluating every rung's grouped
    moments and applying the identical all-groups stop rule
    (``workload._adaptive_grouped_oracle``).

    Returns ``(result_df, final_fraction, iterations)`` where
    ``result_df`` is the terminal rung's grouped estimate + CI frame.
    """
    fraction = spec.fraction if spec.fraction else error_ladder(error_pct)
    fraction = max(min(fraction, 1.0), 1e-6)
    # The stop rule must see groups the sample MISSED, not just the ones
    # present at the current rung — a rare group whose keys all hash
    # outside the threshold would otherwise be silently dropped from a
    # "converged" result. For every DETERMINISTIC design the guard rides
    # the rung job itself: the grouped moments run over the UNSAMPLED
    # frame with the sample predicate as an aggregate MASK
    # (sampling.sampling_mask → estimators.approx_aggregate(mask=...)),
    # so every group in the data appears — missed ones with
    # n_samples = 0, which fails the min_samples check. Identical
    # estimates (NULL-skipping aggregates), one scan per rung, and no
    # standalone distinct-count job. Only ``bernoulli`` — whose
    # membership lives in Spark's sampler state, not a row expression —
    # keeps the up-front column-pruned distinct count.
    from approximatequeryengine_spark.plans.sampling import (
        MASKABLE_DESIGNS,
        P_COL,
        sampling_mask,
    )

    masked = spec.design in MASKABLE_DESIGNS
    n_groups = (
        None if masked else df.select(*group_by).distinct().count()
    )
    iterations = 0
    rdf: DataFrame | None = None
    while True:
        iterations += 1
        cur = replace(spec, fraction=fraction)
        if masked:
            mask, p = sampling_mask(cur)
            full = df.withColumn(P_COL, p)
            rdf = approx_aggregate(full, agg, group_by=group_by, z=z, mask=mask)
        else:
            rdf = approx_aggregate(
                apply_sampling(df, cur), agg, group_by=group_by, z=z
            )
        rows = rdf.collect()  # ≤ |groups| rows — bounded driver sync

        def _rel(row) -> float:
            est = row[agg.name()]
            if est is None or est == 0:
                return float("inf")
            lo, hi = row["ci_lower"], row["ci_upper"]
            if lo is None or hi is None:
                # Sampled extrema (MIN/MAX) carry no CLT CI — keep
                # escalating to the full-scan rung, where the estimator
                # emits the exact zero-width interval and rel = 0.
                return float("inf")
            return 100.0 * (hi - lo) / 2.0 / abs(est)

        converged = (
            bool(rows)
            # Masked rungs list every group in the data, so all-groups
            # coverage is structural; other designs compare against the
            # up-front universe count.
            and (n_groups is None or len(rows) == n_groups)
            and all(
                r["n_samples"] >= min_samples and _rel(r) <= error_pct
                for r in rows
            )
        )
        if converged or fraction >= 1.0 or iterations >= max_iterations:
            break
        fraction = min(1.0, fraction * 2.0)
    assert rdf is not None
    if masked:
        # Output parity with the filtered path (and the DuckDB oracle):
        # groups the terminal sample missed are stop-rule signal, not
        # result rows.
        rdf = rdf.filter(F.col("n_samples") > 0)
    return rdf, fraction, iterations


def adaptive_aggregate(
    df: DataFrame,
    agg: AggSpec,
    spec: SamplingSpec,
    error_pct: float = 2.0,
    confidence: float = 0.95,
    max_iterations: int = 8,
    min_samples: int = 50,
    validators: int = 0,
    validator_fraction: float = 0.02,
    z: float = Z_95,
) -> ApproxResult:
    """Escalate ``spec.fraction`` until the realized CI half-width is
    within ``error_pct`` percent of the estimate (global aggregates
    only — grouped queries use a fixed fraction, as in the reference).
    """
    t0 = time.time()
    fraction = spec.fraction if spec.fraction else error_ladder(error_pct)
    fraction = max(min(fraction, 1.0), 1e-6)

    est = margin = float("nan")
    n = 0
    iterations = 0
    result_df: DataFrame | None = None
    while True:
        iterations += 1
        cur = replace(spec, fraction=fraction)
        result_df = approx_aggregate(apply_sampling(df, cur), agg, z=z)
        row = result_df.collect()[0]
        est = row[agg.name()]
        n = row["n_samples"]
        margin = (row["ci_upper"] - row["ci_lower"]) / 2.0 if est is not None else float("nan")
        rel = 100.0 * margin / abs(est) if est else float("inf")
        converged = n >= min_samples and rel <= error_pct
        if converged or fraction >= 1.0 or iterations >= max_iterations:
            break
        fraction = min(1.0, fraction * 2.0)

    status = ApproximationStatus.STABLE
    conf = min(confidence, heuristic_confidence(n))
    if n < min_samples:
        status = ApproximationStatus.INSUFFICIENT_DATA
    elif validators and est:
        # Cross-validation: independent small samples through different
        # hash functions (salts), the Spark analogue of the slow-pointer
        # validator's repeated 2% rowid-offset samples (V2).
        vals = []
        for i in range(validators):
            vspec = replace(spec, fraction=validator_fraction, salt=spec.salt + 17 + i)
            vrow = approx_aggregate(apply_sampling(df, vspec), agg, z=z).collect()[0]
            if vrow[agg.name()] is not None:
                vals.append(float(vrow[agg.name()]))
        if vals:
            vmean = sum(vals) / len(vals)
            if len(vals) > 1:
                vvar = sum((v - vmean) ** 2 for v in vals) / (len(vals) - 1)
                cv = (vvar**0.5) / abs(vmean) if vmean else float("inf")
                conf = max(0.0, min(1.0, 1.0 - cv))  # V4
            drift = abs(est - vmean) / abs(est) if est else float("inf")
            if drift > error_pct / 100.0:  # V3
                status = ApproximationStatus.DRIFTING

    return ApproxResult(
        df=result_df,
        value=float(est) if est is not None else None,
        ci_lower=float(est - margin) if est is not None else None,
        ci_upper=float(est + margin) if est is not None else None,
        status=status,
        confidence_level=conf,
        error_margin=float(margin),
        samples_used=int(n),
        fraction=fraction,
        computation_time=time.time() - t0,
        method="adaptive_clt",
        iterations=iterations,
    )
