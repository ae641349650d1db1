"""Streaming dedup-ingest contract: store convergence to the batch-exact
fingerprint set, first-arrival winner semantics, and foreachBatch retry
idempotency (the exactly-once property the partition-per-batch layout
exists for)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import dedup
from airflow_ml_pipeline_spark.sources.catalog import load_table
from airflow_ml_pipeline_spark.streaming import ingest


def _fresh(spark, sf_dir):
    arrivals, store, checkpoint = ingest.ingest_dirs(sf_dir)
    for d in (store, checkpoint):
        shutil.rmtree(d, ignore_errors=True)
    return arrivals, store, checkpoint


def test_store_converges_to_batch_exact_dedup(spark, sf_dir):
    _fresh(spark, sf_dir)
    store = ingest.run_dedup_ingest(spark, sf_dir)
    stored = spark.read.parquet(store)
    store_fps = {r.fp for r in stored.select("fp").collect()}
    batch_fps = {
        r.fp
        for r in load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("fp"))
        .distinct()
        .collect()
    }
    assert store_fps == batch_fps
    # one winner per fingerprint — the store IS deduplicated
    assert stored.count() == len(store_fps)
    # survivors agree with the exact-dedup kernel's survivor count
    assert stored.count() == dedup.dedup_corpus(spark, sf_dir).count()


def test_rerun_is_noop(spark, sf_dir):
    store = ingest.run_dedup_ingest(spark, sf_dir)
    before = spark.read.parquet(store).count()
    store2 = ingest.run_dedup_ingest(spark, sf_dir)  # checkpoint: no new files
    assert store2 == store
    assert spark.read.parquet(store).count() == before


def test_upsert_batch_retry_is_idempotent(spark, tmp_path):
    """Replaying a committed batch must rewrite exactly its own partition:
    same rows after the retry, and no self-anti-join erasure."""
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], ["doc_id", "text"]
    )
    ingest.upsert_batch(b0, 0, store)
    ingest.upsert_batch(b1, 1, store)
    rows = {(r.fp, r.doc_id) for r in spark.read.parquet(store).collect()}
    # batch 0: min-doc winners; batch 1: beta already stored -> only gamma
    assert len(rows) == 3
    winners = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert winners == {1, 3, 5}
    # retry both batches (crash-replay): store unchanged
    ingest.upsert_batch(b0, 0, store)
    ingest.upsert_batch(b1, 1, store)
    assert {(r.fp, r.doc_id) for r in spark.read.parquet(store).collect()} == rows


def test_first_arrival_wins_across_batches(spark, tmp_path):
    """Across batches the winner is first-arrival (ingestion semantics),
    even when a later batch carries a smaller doc_id."""
    store = str(tmp_path / "store")
    ingest.upsert_batch(
        spark.createDataFrame([(9, "dup")], ["doc_id", "text"]), 0, store
    )
    ingest.upsert_batch(
        spark.createDataFrame([(1, "dup")], ["doc_id", "text"]), 1, store
    )
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1 and rows[0].doc_id == 9


def test_near_dup_ingest_replay_and_batch_semantics(spark, sf_dir):
    """AvailableNow replay of the near-dup ingester is idempotent (second
    run converges to the same survivor set via the checkpoint), batch 0
    passes through untouched (nothing seen before it), and every dropped
    doc belongs to a later batch."""
    surv_dir = ingest.run_near_dedup_ingest(spark, sf_dir)
    surv1 = {r.doc_id for r in spark.read.parquet(surv_dir).collect()}
    surv2 = {
        r.doc_id
        for r in spark.read.parquet(
            ingest.run_near_dedup_ingest(spark, sf_dir)
        ).collect()
    }
    assert surv1 == surv2
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    all_ids = {
        r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    batch0 = {i for i in all_ids if i % ingest.NEAR_N_BATCHES == 0}
    assert batch0 <= surv1
    assert all(i % ingest.NEAR_N_BATCHES != 0 for i in all_ids - surv1)


def test_stale_ingest_state_is_pruned(spark, sf_dir, tmp_path, monkeypatch):
    """A regenerated corpus changes the content fingerprint; the previous
    tag's staging/store/checkpoint would otherwise leak in /tmp forever.
    Old-and-different tags for the same corpus basename are GC'd; young
    dirs (possibly a concurrent session) and other basenames survive."""
    import os
    import time

    monkeypatch.setattr(ingest, "INGEST_ROOT", str(tmp_path))
    base = os.path.basename(os.path.normpath(sf_dir))
    stale = tmp_path / f"{base}-deadbeefdeadbeef"
    young = tmp_path / f"{base}-cafecafecafecafe"
    other = tmp_path / "othersf-deadbeefdeadbeef"
    for d in (stale, young, other):
        d.mkdir()
    old = time.time() - 100000
    os.utime(stale, (old, old))
    os.utime(other, (old, old))

    ingest.ingest_dirs(sf_dir)
    assert not stale.exists(), "old different-fingerprint tag must be GC'd"
    assert young.exists(), "young dirs may belong to a concurrent session"
    assert other.exists(), "other corpus basenames are untouched"


def test_funnel_rerun_is_stable_and_consistent(spark, sf_dir):
    """Re-running the funnel ingest against an unchanged corpus is a
    checkpointed no-op (identical stats), arrivals partition the corpus,
    and per-batch counters obey the funnel ordering."""
    from airflow_ml_pipeline_spark.sources.catalog import load_table
    from airflow_ml_pipeline_spark.streaming.ingest import (
        FUNNEL_N_BATCHES,
        stream_ingest_funnel,
    )

    r1 = sorted(map(tuple, stream_ingest_funnel(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, stream_ingest_funnel(spark, sf_dir).collect()))
    assert r1 == r2
    assert len(r1) == FUNNEL_N_BATCHES
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r[1] for r in r1) == n_docs
    for batch_id, n_arr, n_gate, n_uniq, n_new in r1:
        assert 0 <= n_gate <= n_arr
        assert 0 < n_uniq <= n_arr
        assert 0 <= n_new <= n_uniq


def test_delete_ingest_tombstones_and_reentry(spark, sf_dir):
    """Semantics of the delete lifecycle on the staged schedule: the
    live view excludes every fingerprint whose last event is a delete,
    includes every fingerprint with a later add (re-entry), tombstone
    rows exist in the store (the deletes actually landed), and the
    exercise is non-trivial (some deleted fingerprint stays dead)."""
    store = ingest.run_delete_ingest(spark, sf_dir)
    rows = spark.read.parquet(store).collect()
    dels = {r.fp for r in rows if r.op == "del"}
    assert dels, "no tombstones landed — the delete batches are empty"
    live = {
        r.fp: (r.doc_id, r.added_in_batch)
        for r in ingest.stream_store_deletes(spark, sf_dir).collect()
    }
    # recompute the closed form: last delete batch per fp, first add
    # batch after it
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    adds: dict[str, list[tuple[int, int]]] = {}
    lastdel: dict[str, int] = {}
    import hashlib

    for r in docs.collect():
        fp = hashlib.md5(r.text.encode()).hexdigest()
        ab = {0: 0, 1: 2, 2: 4, 3: 5}[r.doc_id % 4]
        adds.setdefault(fp, []).append((ab, r.doc_id))
        if r.doc_id % 4 == 0 and r.doc_id % 3 == 0:
            lastdel[fp] = max(lastdel.get(fp, -1), 1)
        if r.doc_id % 4 <= 1 and r.doc_id % 5 == 2:
            lastdel[fp] = max(lastdel.get(fp, -1), 3)
    want = {}
    dead = set()
    for fp, arr in adds.items():
        dmax = lastdel.get(fp, -1)
        after = [(b, d) for b, d in arr if b > dmax]
        if after:
            b = min(x[0] for x in after)
            want[fp] = (min(d for bb, d in after if bb == b), b)
        else:
            dead.add(fp)
    assert live == want
    assert dead, "every deleted fingerprint re-entered — schedule too weak"
    assert dead.isdisjoint(live)


def test_delete_ingest_rerun_is_noop(spark, sf_dir):
    """Replaying against the processed checkpoint changes nothing: the
    store's row multiset (incl. tombstones) is stable across reruns."""
    store = ingest.run_delete_ingest(spark, sf_dir)
    # tombstone rows carry NULL doc_id — sort on repr so None compares
    before = sorted(map(tuple, spark.read.parquet(store).collect()), key=repr)
    store2 = ingest.run_delete_ingest(spark, sf_dir)
    assert store2 == store
    after = sorted(map(tuple, spark.read.parquet(store).collect()), key=repr)
    assert before == after


def test_apply_delete_batch_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch rewrites exactly its own partition: adds
    anti-join LIVE prior fingerprints (so a re-arrival after deletion
    wins again) and a second apply of the same batch leaves the store
    identical."""
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, "aa", "add"), (2, "aa", "add"), (3, "bb", "add")],
        "doc_id long, text string, op string",
    )
    ingest.apply_delete_batch(b0, 0, store)
    b1 = spark.createDataFrame(
        [(1, "aa", "del")], "doc_id long, text string, op string"
    )
    ingest.apply_delete_batch(b1, 1, store)
    b2 = spark.createDataFrame(
        [(9, "aa", "add")], "doc_id long, text string, op string"
    )
    ingest.apply_delete_batch(b2, 2, store)
    first = sorted(map(tuple, spark.read.parquet(store).collect()), key=repr)
    ingest.apply_delete_batch(b2, 2, store)  # retry
    second = sorted(map(tuple, spark.read.parquet(store).collect()), key=repr)
    assert first == second
    live = {
        r.fp: r.doc_id
        for r in ingest._live_fps(spark.read.parquet(store)).collect()
    }
    import hashlib

    fa = hashlib.md5(b"aa").hexdigest()
    fb = hashlib.md5(b"bb").hexdigest()
    # 'aa' was deleted at batch 1 and re-entered at batch 2 with the NEW
    # arrival's id — not the batch-0 winner's
    assert live == {fa: 9, fb: 3}


def test_compacted_store_preserves_reads(spark, sf_dir):
    """Compaction must not change any read: the live view over the
    compacted store equals the live view over the full log, the
    compacted store has exactly one row per distinct fingerprint, and
    dead fingerprints keep their final tombstone."""
    store = ingest.run_delete_ingest(spark, sf_dir)
    compacted = ingest.compact_delete_store(spark, sf_dir)
    log = spark.read.parquet(store)
    comp = spark.read.parquet(compacted)
    assert comp.count() == log.select("fp").distinct().count()
    live_log = sorted(
        map(tuple, ingest._live_fps(log).collect()), key=repr
    )
    live_comp = sorted(
        map(tuple, ingest._live_fps(comp).collect()), key=repr
    )
    assert live_log == live_comp
    dead = comp.filter(F.col("op") == "del")
    assert dead.count() > 0
    assert dead.filter(F.col("doc_id").isNotNull()).count() == 0


def test_asof_view_relates_to_final_state(spark, sf_dir):
    """Time travel semantics: the as-of-batch-3 view equals the fold
    over the log restricted to batches <= 3; every fp deleted at batch
    <= 3 and not re-added by then is absent; and the final view differs
    from the as-of view exactly by later batches' effects (re-entries
    and new adds — nothing live as-of 3 with no later event changes)."""
    store = ingest.run_delete_ingest(spark, sf_dir)
    log = spark.read.parquet(store)
    asof = {
        r.fp: (r.doc_id, r.added_in_batch)
        for r in ingest.stream_store_asof(spark, sf_dir).collect()
    }
    manual = {
        r.fp: (r.doc_id, r.added_in_batch)
        for r in ingest._live_fps(
            log.filter(F.col("batch_id").cast("int") <= ingest.ASOF_BATCH)
        ).collect()
    }
    assert asof == manual
    final = {
        r.fp: (r.doc_id, r.added_in_batch)
        for r in ingest._live_fps(log).collect()
    }
    later = {
        r.fp
        for r in log.filter(
            F.col("batch_id").cast("int") > ingest.ASOF_BATCH
        ).collect()
    }
    # a key with no event after the cutoff keeps its as-of state
    for fp, st in asof.items():
        if fp not in later:
            assert final.get(fp) == st, fp
    for fp, st in final.items():
        if fp not in later:
            assert asof.get(fp) == st, fp
    # the views genuinely differ (batches 4/5 add new content)
    assert asof != final
