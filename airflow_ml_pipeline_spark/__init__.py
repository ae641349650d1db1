"""PySpark-native analytics engine with the capabilities of the reference
``twteed/airflow-ml-pipeline`` (an Airflow-orchestrated churn ML pipeline),
rebuilt Spark-first and extended with a relational operator surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Blueprint: /root/repo/SURVEY.md. Everything here is (a) DataFrame-in /
DataFrame-out operators, (b) pyspark.ml Pipeline stages, or (c) driver-side
control flow. No RDDs, no collect() on data-sized results.
"""

__version__ = "0.1.0"

from airflow_ml_pipeline_spark.session import get_spark, tune  # noqa: F401
