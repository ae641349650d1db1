"""Runtime bloom-filter join pruning (Spark 3.3+ AQE runtime filters).

When a selective filter sits on one side of a shuffle join, Spark can
build a bloom filter from the filtered side's join keys and inject a
``might_contain(...)`` predicate into the OTHER side's scan — rows that
cannot match are dropped before the shuffle instead of after it. At
100 TB this is the difference between shuffling the whole fact table and
shuffling the ~matching fraction: the classic star-join accelerator
beside broadcast joins (which need the small side to fit in memory) and
storage-partition pruning (which needs the key to be a partition
column). Bloom pruning needs NEITHER — only a selective creation side.

Spark gates insertion on size thresholds meant for production data
(application side >= ``spark.sql.optimizer.runtime.bloomFilter.
applicationSideScanSizeThreshold``, default 10 GB), so on test-scale
inputs the feature silently never fires — exactly the kind of
scale-only behavior that rots unnoticed. :func:`runtime_bloom` scopes
the confs so tests can force insertion and pin the plan shape
(tests/test_scale_utils.py); production code on real sizes runs with
the defaults and gets the same plan.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

@contextmanager
def runtime_bloom(
    spark: SparkSession,
    application_side_min: str = "10GB",
    creation_side_max: str = "100MB",
):
    """Scope the runtime bloom-filter knobs for the duration of a block:
    ``application_side_min`` is the big-side scan size below which Spark
    judges pruning not worth the filter build (set "0" to force on test
    data); ``creation_side_max`` caps the filtered side size the bloom
    build will aggregate. Previous values are restored on exit."""
    values = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_min,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_max,
    }
    prev: dict[str, str | None] = {}
    for k, v in values.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
