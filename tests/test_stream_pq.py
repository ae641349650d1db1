"""Streaming PQ encode-at-ingest: metamorphic convergence pins.

The contract stream_pq_encode_ingest's docstring states: the streamed
coded store must EQUAL the batch encoder's output (same frozen-artifact
kernel per micro-batch), and a probe served against the streamed store
must return exactly the batch probe's result — micro-batch boundaries
cannot change the index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import pq
from airflow_ml_pipeline_spark.sources.catalog import load_table
from airflow_ml_pipeline_spark.streaming import ingest


def _streamed_store(spark, sf_dir):
    store = ingest.run_pq_encode_ingest(spark, sf_dir)
    return spark.read.option("basePath", store).parquet(store)


def test_streamed_store_equals_batch_pq_index(spark, sf_dir):
    """Row-for-row equality of the streamed store with the batch
    encoder on (cluster_id, pq_code, vnorm) — the two paths share
    pq_index, so a divergence means the staging dropped/duplicated a
    vector or a retry broke the batch-owned-overwrite contract."""
    got = {
        r.vec_id: (r.cluster_id, list(r.pq_code), round(r.vnorm, 6))
        for r in _streamed_store(spark, sf_dir)
        .select("vec_id", "cluster_id", "pq_code", "vnorm")
        .collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    want = {
        r.vec_id: (r.cluster_id, list(r.pq_code), round(r.vnorm, 6))
        for r in pq.pq_index(emb)
        .select("vec_id", "cluster_id", "pq_code", "vnorm")
        .collect()
    }
    assert got == want


def test_probe_against_streamed_store_matches_batch_probe(spark, sf_dir):
    """Serve the ADC top-k from the streamed store's code columns (the
    production read path: the raw vectors are never touched) and pin
    equality with ann_ivfpq_topk's (vec_id, label, adc_cos) rows."""
    qvec = pq._fetch_query_vec(spark, sf_dir)
    lut0, lut, qnorm = pq._adc_luts(qvec)
    probes = pq._ivf_probe_lists(qvec)
    adc = pq._adc_sql(lut0, lut)
    served = (
        _streamed_store(spark, sf_dir)
        .filter(F.col("cluster_id").isin(probes))
        .select(
            "vec_id",
            "label",
            F.round(F.expr(adc) / (F.lit(qnorm) * F.col("vnorm")), 6).alias(
                "adc_cos"
            ),
        )
        .orderBy(F.desc("adc_cos"), F.asc("vec_id"))
        .limit(pq.TOP_K)
        .collect()
    )
    batch = pq.ann_ivfpq_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in batch]


def test_pq_ingest_replay_is_idempotent(spark, sf_dir):
    """A second AvailableNow run over the same staged arrivals must not
    change the store (checkpointed source + batch-owned partition
    overwrites)."""
    before = sorted(
        tuple(r)
        for r in _streamed_store(spark, sf_dir)
        .select("vec_id", "cluster_id", "batch_id")
        .collect()
    )
    after = sorted(
        tuple(r)
        for r in _streamed_store(spark, sf_dir)
        .select("vec_id", "cluster_id", "batch_id")
        .collect()
    )
    assert before == after


def test_pq_delete_store_converges_to_retained_batch_encode(spark, sf_dir):
    """Metamorphic convergence of the delete lifecycle: the live view
    after ingest+deletes equals the batch encoder's output restricted
    to the retained vec_ids — codes, cluster, and norm row-for-row —
    tombstones actually landed, and some vector was actually deleted."""
    store = ingest.run_pq_delete_ingest(spark, sf_dir)
    raw = spark.read.option("basePath", store).parquet(store)
    assert raw.filter(F.col("op") == "del").count() > 0
    live = {
        r.vec_id: (r.cluster_id, tuple(r.pq_code), round(r.vnorm, 6))
        for r in ingest._live_pq_rows(raw).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    q = (F.col("vec_id") * ingest.PQD_QUARTERS / F.lit(n)).cast("int")
    deleted = {
        r.vec_id
        for r in emb.filter(
            ((q == 0) & (F.col("vec_id") % 3 == 0))
            | ((q <= 1) & (F.col("vec_id") % 5 == 2))
        ).collect()
    }
    assert deleted, "delete schedule matched nothing"
    batch = {
        r.vec_id: (r.cluster_id, tuple(r.pq_code), round(r.vnorm, 6))
        for r in pq.pq_index(emb)
        .select("vec_id", "cluster_id", "pq_code", "vnorm")
        .collect()
        if r.vec_id not in deleted
    }
    assert live == batch


def test_pq_delete_ingest_rerun_is_noop(spark, sf_dir):
    """Replaying against the processed checkpoint changes nothing."""
    store = ingest.run_pq_delete_ingest(spark, sf_dir)
    before = sorted(
        map(tuple, spark.read.option("basePath", store).parquet(store).collect()),
        key=repr,
    )
    assert ingest.run_pq_delete_ingest(spark, sf_dir) == store
    after = sorted(
        map(tuple, spark.read.option("basePath", store).parquet(store).collect()),
        key=repr,
    )
    assert before == after
