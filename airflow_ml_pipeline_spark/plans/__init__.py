from airflow_ml_pipeline_spark.plans.registry import QUERIES, ORACLES, query  # noqa: F401
