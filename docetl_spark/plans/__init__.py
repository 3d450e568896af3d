from docetl_spark.plans.pipeline import Pipeline, run_pipeline

__all__ = ["Pipeline", "run_pipeline"]
