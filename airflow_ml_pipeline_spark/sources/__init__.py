from airflow_ml_pipeline_spark.sources.catalog import load_table, register_views  # noqa: F401
