"""PySpark-native approximate query engine.

A brand-new engine with the query and data-processing capabilities of
``saumyarr8/ApproximateQueryEngine`` (see SURVEY.md), re-expressed
Spark-first: sampling designs become DataFrame transformations,
estimators become single-pass aggregate expressions with closed-form
confidence intervals, and the adaptive CLT loop becomes a driver-side
fraction-escalation loop between Spark jobs.

Public surface::

    from approximatequeryengine_spark import AQEngine, get_spark

    spark = get_spark()
    eng = AQEngine(spark, "/root/testdata/sf0.01")
    res = eng.run("SELECT APPROX(SUM(l_extendedprice)) FROM lineitem")
"""

from approximatequeryengine_spark.session import get_spark
from approximatequeryengine_spark.catalog import Catalog, TABLES
from approximatequeryengine_spark.engine import AQEngine
from approximatequeryengine_spark.result import ApproxResult, ApproximationStatus

__all__ = [
    "get_spark",
    "Catalog",
    "TABLES",
    "AQEngine",
    "ApproxResult",
    "ApproximationStatus",
]

__version__ = "0.1.0"
