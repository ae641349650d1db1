"""Streaming corpus ingestion with dedup-store maintenance — the
``foreachBatch`` production pattern the rest of the streaming surface was
missing: documents arrive as a file stream (Kafka/Kinesis in production),
and each micro-batch UPSERTS the exact-dedup fingerprint store so
duplicates are dropped AT INGESTION, not in a nightly batch.

Exactly-once contract (the part worth copying):

- the store is parquet partitioned by ``batch_id=N`` directories;
- batch N anti-joins its (fp, doc_id) winners against partitions
  ``batch_id < N`` ONLY, then overwrites its own partition — a retried
  micro-batch rewrites exactly its own output (deterministic), never
  double-inserts, and crucially never anti-joins against its own partial
  output (which would erase its rows on retry);
- store reads never conflict with the write because each batch writes its
  own subdirectory, not the root.

At 100 TB the store is the same 16-byte-per-doc artifact
``dedup_incremental`` maintains (operators/dedup.py) — this module is its
streaming writer. The fingerprint SET the store converges to is
independent of micro-batch boundaries, which is what the driver oracle
checks; per-duplicate winner resolution within one batch is min(doc_id),
across batches it is first-arrival (test-asserted with controlled
batches).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

INGEST_ROOT = "/tmp/spark_graft_ingest"
N_STAGE_FILES = 4


def _corpus_fingerprint(sf_dir: str) -> str:
    """Path + (mtime_ns, size) hash of documents.parquet — a corpus
    regenerated in place gets a fresh staging/store/checkpoint trio."""
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    h = hashlib.sha256(src.encode())
    if os.path.isdir(src):
        for name in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, name))
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size};".encode())
    elif os.path.exists(src):
        st = os.stat(src)
        h.update(f"{st.st_mtime_ns}:{st.st_size};".encode())
    return h.hexdigest()[:16]


def ingest_dirs(sf_dir: str) -> tuple[str, str, str]:
    """(staging, store, checkpoint) directories for this corpus version."""
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}-{_corpus_fingerprint(sf_dir)}"
    root = os.path.join(INGEST_ROOT, tag)
    return (
        os.path.join(root, "arrivals"),
        os.path.join(root, "store"),
        os.path.join(root, "checkpoint"),
    )


def stage_documents_stream(spark: SparkSession, sf_dir: str) -> str:
    """Split the static documents table into N_STAGE_FILES range-partitioned
    parquet files so the file source genuinely replays multiple
    micro-batches (idempotent per corpus version)."""
    arrivals, _, _ = ingest_dirs(sf_dir)
    marker = os.path.join(arrivals, "_staged")
    if not os.path.exists(marker):
        docs = load_table(spark, sf_dir, "documents")
        tmp = f"{arrivals}.build.{os.getpid()}"
        docs.repartitionByRange(N_STAGE_FILES, "doc_id").write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, arrivals)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        with open(marker, "w") as f:
            f.write("ok")
    return arrivals


def store_before(spark: SparkSession, store_dir: str, batch_id: int) -> DataFrame | None:
    """The store as of batches strictly BEFORE ``batch_id`` — the
    anti-join base that makes a retried batch idempotent."""
    if not os.path.isdir(store_dir):
        return None
    parts = [
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < batch_id
    ]
    if not parts:
        return None
    return spark.read.option("basePath", store_dir).parquet(*parts)


def upsert_batch(batch_df: DataFrame, batch_id: int, store_dir: str) -> None:
    """foreachBatch body: in-batch winners (min doc_id per fingerprint),
    anti-join against the prior store, overwrite ONLY this batch's
    partition directory."""
    spark = batch_df.sparkSession
    winners = (
        batch_df.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    prior = store_before(spark, store_dir, batch_id)
    if prior is not None:
        winners = winners.join(prior.select("fp"), "fp", "left_anti")
    winners.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch_id={batch_id}")
    )


def run_dedup_ingest(spark: SparkSession, sf_dir: str) -> str:
    """Replay the corpus through the streaming dedup ingester (AvailableNow,
    one staged file per micro-batch) and return the store directory.
    Re-running against an unchanged corpus is a no-op: the checkpoint
    remembers processed files and the store is already converged."""
    arrivals, store, checkpoint = ingest_dirs(sf_dir)
    stage_documents_stream(spark, sf_dir)
    schema = spark.read.parquet(arrivals).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(arrivals)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: upsert_batch(df, bid, store)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store


@query(
    "stream_dedup_ingest_fps",
    oracle="""
    SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY md5(text)
    """,
)
def stream_dedup_ingest_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the streaming dedup ingester: after the AvailableNow
    replay, the store's fingerprint SET equals batch exact-dedup's
    fingerprint set exactly (set convergence is independent of micro-batch
    boundaries, so the oracle is deterministic); n_docs counts every
    arrival carrying that fingerprint — re-derived via one broadcast-fp
    join so the store's dedup claim is checked against the raw corpus, not
    against itself."""
    store = run_dedup_ingest(spark, sf_dir)
    kept = spark.read.parquet(store).select("fp")
    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("fp")
    )
    return docs.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")).join(
        kept, "fp"
    )
