from tenzir_spark.plans.pipeline import Pipeline
from tenzir_spark.plans.tql import exec_pipeline, parse_pipeline, split_pipeline

__all__ = ["Pipeline", "parse_pipeline", "exec_pipeline", "split_pipeline"]
