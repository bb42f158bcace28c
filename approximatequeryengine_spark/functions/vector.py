"""Vector math over ``array<float>`` columns using JVM-side built-ins.

No Python UDFs in the hot path: ``F.zip_with`` + ``F.aggregate`` stay
inside Catalyst/codegen, so brute-force cosine scans distribute cleanly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    # Zero-norm guard: a zero vector has no direction — its cosine is
    # NULL, which no >= threshold predicate passes, matching DuckDB
    # (NULL on x/0) while Spark's ANSI mode would RAISE on the 0/0.
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != F.lit(0.0), dot(a, b) / denom)
