from approximatequeryengine_spark.plans.sampling import SamplingSpec, apply_sampling
from approximatequeryengine_spark.plans.estimators import approx_aggregate, AggSpec
from approximatequeryengine_spark.plans.adaptive import adaptive_aggregate

__all__ = [
    "SamplingSpec",
    "apply_sampling",
    "approx_aggregate",
    "AggSpec",
    "adaptive_aggregate",
]
