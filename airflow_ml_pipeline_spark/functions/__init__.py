from airflow_ml_pipeline_spark.functions.compare import (  # noqa: F401
    DEC,
    SQL_DAVG,
    SQL_DSUM,
    davg,
    dsum,
    fmt_ts,
)
