from approximatequeryengine_spark.frontend.dialect import (
    QuerySpec,
    rewrite_approx,
    parse_query,
    METHODS,
    select_method,
)

__all__ = ["QuerySpec", "rewrite_approx", "parse_query", "METHODS", "select_method"]
