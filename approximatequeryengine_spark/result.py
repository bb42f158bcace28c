"""Result objects mirroring the reference's ``ValidationResult``
(``core/scheduler.h:12-26``, ``core/custom_scheduler.hpp:8-22``) —
driver-side metadata travelling alongside the result DataFrame, never
part of the data plane.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame


class ApproximationStatus(str, Enum):
    STABLE = "STABLE"
    DRIFTING = "DRIFTING"
    INSUFFICIENT_DATA = "INSUFFICIENT_DATA"
    ERROR = "ERROR"
    EXACT = "EXACT"


def heuristic_confidence(n: int) -> float:
    """Sample-size → confidence lookup (V5, ``core/custom_scheduler.cpp:296-305``)."""
    if n >= 1000:
        return 0.95
    if n >= 500:
        return 0.90
    if n >= 100:
        return 0.85
    if n >= 50:
        return 0.80
    return 0.70


@dataclass
class ApproxResult:
    """Value + diagnostics for a single approximate (or exact) query.

    ``df`` is the result DataFrame (1 row for a global aggregate, N rows
    for GROUP BY) with columns ``[group..., value, ci_lower, ci_upper,
    n_samples]``. The scalar convenience fields are populated for global
    aggregates after the driver collects the single row.
    """

    df: DataFrame
    value: float | None = None
    ci_lower: float | None = None
    ci_upper: float | None = None
    status: ApproximationStatus = ApproximationStatus.STABLE
    confidence_level: float = 0.95
    error_margin: float = 0.0
    samples_used: int = 0
    fraction: float = 1.0
    computation_time: float = 0.0
    method: str = "exact"
    iterations: int = 1
    groups: dict = field(default_factory=dict)

    def relative_error_pct(self) -> float:
        if not self.value:
            return float("inf")
        return 100.0 * self.error_margin / abs(self.value)
