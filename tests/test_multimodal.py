"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism,
frame fan-out. The decode/encode kernels are deterministic stubs (no codecs
in this container) — the Spark-side contract is what's under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import multimodal
from airflow_ml_pipeline_spark.sources.catalog import load_table


def _media(spark, sf_dir):
    return multimodal.synthesize_media(load_table(spark, sf_dir, "documents").limit(60))


def test_media_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "modality", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert {r.modality for r in media.select("modality").distinct().collect()} == {
        "image", "audio", "video",
    }


def test_decode_batch_shape_and_determinism(spark, sf_dir):
    media = _media(spark, sf_dir)
    d1 = multimodal.decode_media(media).orderBy("media_id").collect()
    d2 = multimodal.decode_media(media).orderBy("media_id").collect()
    assert d1 == d2  # Arrow-batched kernel is deterministic
    assert len(d1) == 60
    for r in d1:
        assert r.n_bytes > 0
        assert 0.0 <= r.mean_intensity <= 255.0
        assert len(r.sha256) == 64


def test_feature_extraction_embeddings(spark, sf_dir):
    feats = multimodal.extract_features(_media(spark, sf_dir)).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r.embedding) == multimodal.EMBED_DIM
        assert all(0.0 <= v <= 1.0 for v in r.embedding)


def test_frame_sampling_fanout(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = multimodal.sample_frames(media, every_ms=500)
    joined = (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("frame_ms").alias("last"))
        .join(media.filter(F.col("modality") == "video"), "media_id")
    )
    for r in joined.collect():
        expected = (r.meta.duration_ms - 1) // 500 + 1
        assert r.n_frames == expected
        assert r.last < r.meta.duration_ms


def test_python_datasource_binary_ingestion(spark):
    """Spark 4 Python DataSource API: declared schema, planned partitions,
    deterministic binary payloads — the multimodal ingestion seam."""
    from airflow_ml_pipeline_spark.sources import binary_source

    binary_source.register(spark)
    df = (
        spark.read.format("fake_media")
        .option("n_rows", 48)
        .option("n_partitions", 6)
        .option("payload_bytes", 128)
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,width:int,height:int,payload:binary>"
    )
    assert df.rdd.getNumPartitions() == 6
    rows = df.collect()
    assert len(rows) == 48
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    assert all(len(r.payload) == 128 for r in rows)
    # deterministic: re-read yields identical payloads
    again = {r.media_id: r.payload for r in df.collect()}
    assert all(again[r.media_id] == r.payload for r in rows)
    # payloads differ across rows (not a constant stub)
    assert len({bytes(r.payload) for r in rows}) == 48


def test_python_datasource_streaming_reader(spark, tmp_path):
    """The same custom source consumed as a micro-batched stream
    (readStream + AvailableNow): offsets advance per batch, total rows and
    payloads match the batch read exactly."""
    from airflow_ml_pipeline_spark.sources import binary_source

    binary_source.register(spark)
    stream = (
        spark.readStream.format("fake_media")
        .option("n_rows", 40)
        .option("rows_per_batch", 16)
        .option("payload_bytes", 64)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("fake_media_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # drain: the bounded source stops emitting at n_rows; poll until all
    # 40 rows arrived (multiple micro-batches -> offsets really advance)
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.table("fake_media_stream").count() >= 40:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.table("fake_media_stream").collect()
    assert len(got) == 40
    batch = {
        r.media_id: r.payload
        for r in spark.read.format("fake_media")
        .option("n_rows", 40)
        .option("payload_bytes", 64)
        .load()
        .collect()
    }
    assert all(batch[r.media_id] == r.payload for r in got)


def test_digest_dedup_shuffles_digests_not_payloads(spark, sf_dir):
    """The content-addressable dedup must hash map-side and prune the
    payload BEFORE the exchange — shipping the bytes through the shuffle
    is the scale failure the operator exists to avoid. Also: planted
    duplicate payloads collapse to one digest row with the min keeper."""
    from airflow_ml_pipeline_spark.operators.multimodal import (
        multimodal_dedup_by_digest,
        synthesize_media,
    )

    df = multimodal_dedup_by_digest(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    exchanges = [b for b in blocks if re.match(r"\(\d+\) Exchange", b)]
    assert exchanges, "expected at least one Exchange in the plan"
    for b in exchanges:
        assert "payload" not in b, f"payload crossed a shuffle:\n{b}"

    docs = spark.createDataFrame(
        [(0, "same bytes"), (1, "same bytes"), (2, "same bytes"), (5, "other")],
        "doc_id long, text string",
    )
    media = synthesize_media(docs)
    from pyspark.sql import functions as F

    rows = {
        r.digest: (r.n_copies, r.keep_media_id, r.n_modalities)
        for r in media.groupBy(
            F.sha2(F.col("payload"), 256).alias("digest"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").cast("bigint").alias("keep_media_id"),
            F.count_distinct("modality").cast("bigint").alias("n_modalities"),
        )
        .collect()
    }
    import hashlib

    dup = hashlib.sha256(b"same bytes").hexdigest()
    other = hashlib.sha256(b"other").hexdigest()
    assert rows[dup] == (3, 0, 3)  # ids 0,1,2 -> image,audio,video
    assert rows[other] == (1, 5, 1)
