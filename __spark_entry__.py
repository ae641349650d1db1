"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
just exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_ml_pipeline_spark.session import tune  # noqa: E402
from airflow_ml_pipeline_spark.plans import registry  # noqa: E402

# importing the operator modules populates the registry
import airflow_ml_pipeline_spark.operators.relational  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.relational_ext  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.events  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.temporal  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.tpch_extra  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.tpch_extra2  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.stats  # noqa: F401,E402

try:  # widened over time; keep entry importable even mid-build
    import airflow_ml_pipeline_spark.operators.textstats  # noqa: F401,E402
    import airflow_ml_pipeline_spark.operators.dedup  # noqa: F401,E402
    import airflow_ml_pipeline_spark.operators.similarity  # noqa: F401,E402
    import airflow_ml_pipeline_spark.operators.grouped_pandas  # noqa: F401,E402
    import airflow_ml_pipeline_spark.operators.mlops  # noqa: F401,E402
    import airflow_ml_pipeline_spark.operators.multimodal  # noqa: F401,E402
    import airflow_ml_pipeline_spark.streaming.queries  # noqa: F401,E402
except ImportError:
    pass

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return registry.QUERIES["revenue_by_segment"](spark, SMOKE_SF_DIR)


def _tuned(fn: registry.QueryFn) -> registry.QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _tuned(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(registry.ORACLES)
