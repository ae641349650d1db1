"""SparkSession factory and runtime tuning.

Design notes (100 TB posture):
- AQE on everywhere: runtime shuffle-partition coalescing, skew-join
  splitting, and broadcast-join conversion are the main levers that keep a
  fixed logical plan efficient as data scales 1000x.
- Arrow on for every pandas_udf / mapInPandas / toPandas path.
- Session timezone pinned to UTC so event-time semantics are stable across
  drivers (and match the naive-timestamp DuckDB oracle).
- ``spark.sql.shuffle.partitions`` is a *default* for small/local runs; AQE
  coalescing makes the exact number unimportant, and on a real cluster the
  deploy config overrides it (rule of thumb: 2-3x total executor cores,
  target 64-256 MB per shuffle partition).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and desirable) to set on an already-running session.
RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # runtime-settable: matters for driver-supplied sessions that default to
    # 200 shuffle partitions (AQE coalesces batch queries, but stateful
    # streaming pins its state partition count at query start)
    "spark.sql.shuffle.partitions": "32",
    # corpus versions that store events.ts as TIMESTAMP(NANOS) — which
    # vanilla Spark rejects — arrive as bigint under this flag; the catalog
    # normalizes bigint/NTZ/LTZ alike (sources/catalog.py
    # normalize_event_time). Harmless for µs-encoded corpora.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Confs that must be set before the session starts.
STARTUP_CONF = {
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Naive parquet timestamps (pyarrow default) should stay wall-clock.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def get_spark(
    app_name: str = "airflow-ml-pipeline-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    cluster master is configured; on a real cluster the submitter supplies
    the master and this argument stays None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    for key, value in {**STARTUP_CONF, **RUNTIME_CONF, **(extra_conf or {})}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return tune(spark)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we did not create (e.g. the
    driver-supplied session in ``__spark_entry__``)."""
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # immutable conf on this build — keep going
            pass
    return spark
