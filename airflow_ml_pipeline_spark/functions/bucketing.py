"""Bucketed-table co-location: pre-shuffle once at write time so every
subsequent join/aggregation on the bucket key runs with ZERO exchanges.

This is the canonical 100 TB play for fact-fact joins (e.g. lineitem ⋈
orders on orderkey): both tables are written ``bucketBy(N, key)`` with one
file per bucket; Spark's bucketed scan then feeds a SortMergeJoin whose
children need neither Exchange nor (with ``sortBy``) a full re-sort. The
write-time shuffle is paid once, amortized over every downstream query.

Proven by plan assertion in tests/test_scale_utils.py (join of two
bucketed tables contains no ``Exchange hashpartitioning``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and optionally
    sorted) by ``key``.

    ``repartition(buckets, key)`` first so each bucket is a single file —
    otherwise every writing task emits its own file per bucket and the
    sorted-merge property is lost (Spark then re-sorts at read time).
    """
    writer = (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed managed table (bucketed scan is automatic when
    ``spark.sql.sources.bucketing.enabled`` is true, the default)."""
    return spark.table(table)
