from approximatequeryengine_spark.functions.hashing import (
    portable_hash_col,
    portable_hash_sql,
    fraction_threshold,
    HASH_SPACE,
)
from approximatequeryengine_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = [
    "portable_hash_col",
    "portable_hash_sql",
    "fraction_threshold",
    "HASH_SPACE",
    "cosine_sim",
    "dot",
    "l2_norm",
]
