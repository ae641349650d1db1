"""Training-data manifest: the handoff artifact between corpus preparation
and the training job. After the prepared-corpus pipeline (quality gate →
exact dedup → near-dup removal, ``operators/dedup.py::prepared_corpus``),
the trainer needs a per-shard contract it can verify before reading a
byte: document counts, token budgets, id ranges, and an order-insensitive
membership checksum that detects a silently re-run or partially-written
shard. This module computes that manifest as one plan over the prepared
corpus — the table a 100 TB pipeline writes next to every corpus release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators.dedup import (
    _SQL_PREPARED_CTES,
    prepared_corpus,
)
from airflow_ml_pipeline_spark.operators.packing import _shard
from airflow_ml_pipeline_spark.plans.registry import query


@query(
    "training_data_manifest",
    oracle=f"""
    WITH {_SQL_PREPARED_CTES},
    sharded AS (
        SELECT *,
               CAST(instr('0123456789abcdef',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                    AS INTEGER) AS shard,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR))
                   AS member_fp
        FROM prepared
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           md5(string_agg(member_fp, '' ORDER BY member_fp)) AS members_md5
    FROM sharded
    GROUP BY shard
    """,
)
def training_data_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest of the prepared corpus: shard id (md5 hex-prefix,
    the same engine-neutral assignment ``corpus_shuffled_shards`` uses),
    document count, token budget, id range, and an ORDER-INSENSITIVE
    membership checksum — md5 over the sorted per-member fingerprints
    (doc_id:n_tokens), so any engine, run, or partitioning that produces
    the same shard contents produces the same checksum, and a dropped or
    duplicated document changes it.

    Scale shape: the prepared-corpus lineage is the composed pipeline
    (its shuffles are documented on ``corpus_prepared``); the manifest
    itself adds ONE hash aggregation on the 16-way shard key, with the
    sorted-fingerprint concatenation bounded per shard. The checksum
    sorts WITHIN each shard's collected fingerprints (bounded by shard
    membership), never globally."""
    prepared = prepared_corpus(spark, sf_dir)
    member_fp = F.md5(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("n_tokens").cast("string"))
    )
    return (
        prepared.select(
            "doc_id",
            "n_tokens",
            _shard("doc_id").alias("shard"),
            member_fp.alias("member_fp"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.md5(
                F.concat_ws("", F.array_sort(F.collect_list("member_fp")))
            ).alias("members_md5"),
        )
    )
