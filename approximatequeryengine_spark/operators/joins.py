"""Skew-robust join utilities.

AQE's skew-join splitting (enabled in the session factory) handles most
hot-key cases at runtime, but only for sort-merge joins it can observe.
``salted_join`` is the explicit fallback for the remaining shapes —
e.g. a medium dimension that is too big to broadcast joined against a
fact table where a handful of keys dominate: salting fans each hot key
out over ``salt_buckets`` reducers at the cost of replicating the
smaller side ``salt_buckets``×.

Semantics are identical to the plain equi-join (tested); only the
physical key distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__aqe_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s join-key distribution has hot keys.

    The skewed side gets a per-row salt in ``[0, salt_buckets)`` (from a
    hash of the whole row's partition-position — cheap, no extra
    shuffle); ``other`` is replicated once per salt value. The join key
    becomes ``(on…, salt)``, so one hot key spreads across
    ``salt_buckets`` tasks instead of one straggler.
    """
    if isinstance(on, str):
        on = [on]
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.spark_partition_id() * 2654435761 + F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted.join(replicated, on=[*on, SALT_COL], how=how).drop(SALT_COL)
