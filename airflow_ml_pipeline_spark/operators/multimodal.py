"""Multimodal column plumbing (north-star requirement): images/audio/video
as opaque ``binary`` payloads with typed metadata, processed through
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs (no PIL/ffmpeg), so the *decode*
kernels are deterministic fakes clearly marked as stubs — but everything
Spark-side is real and tested: the schema contract, the binary column
handling, the mapInPandas batch shapes, the explode fan-out for frame
sampling, and the partitioning story (payloads never shuffle unless the
operator needs them to).

Swap `_fake_decode_stats` / `_fake_embedding` for real codec calls
(PIL.Image.open / torchaudio / pyav) on a cluster with the libs installed —
the signatures and schemas stay identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

EMBED_DIM = 16

DECODED_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields[:2]
    + [
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("sha256", T.StringType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus: payload = utf-8 bytes
    of the text (a stand-in blob), modality assigned round-robin. Real
    pipelines land here straight from `spark.read.format('binaryFile')`."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_stats(payload: bytes) -> tuple[int, float, str]:
    """STUB decode: real implementation would run the codec. Deterministic:
    byte stats + content hash."""
    if payload is None:
        raise NotImplementedError("decode of NULL payload: no codec available")
    mean = sum(payload) / len(payload) if payload else 0.0
    return len(payload), mean, hashlib.sha256(payload).hexdigest()


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: binary payload -> per-item stats. One
    mapInPandas pass, no shuffle; payload bytes stay inside the partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [_fake_decode_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [s[0] for s in stats],
                    "mean_intensity": [s[1] for s in stats],
                    "sha256": [s[2] for s in stats],
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def _fake_embedding(payload: bytes, dim: int = EMBED_DIM) -> list[float]:
    """STUB feature extractor (real: a vision/audio encoder). Deterministic:
    dim floats derived from the content digest."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i % 32] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: payload -> embedding array. The
    batch shape (N in -> N out, array column) is exactly what a GPU encoder
    stage uses; swap the kernel, keep the plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "embedding": [_fake_embedding(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table


@query(
    "multimodal_decode_stats",
    oracle="""
    SELECT doc_id AS media_id,
           (ARRAY['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
               AS modality,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           CASE WHEN strlen(text) > 0
                THEN CAST(list_sum(list_transform(
                         range(1, strlen(text) + 1), i -> unicode(text[i])))
                     AS DOUBLE) / strlen(text)
                ELSE 0.0 END AS mean_intensity,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_decode_stats(spark, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline over the synthesized media table.
    The codec kernel is the documented deterministic stub (byte stats +
    content hash), which makes the whole path ORACLE-checkable: the DuckDB
    twin restates the byte arithmetic over the corpus text (pure ASCII, so
    codepoints == utf-8 bytes), so a green row proves the binary payloads
    cross the Arrow/mapInPandas boundary byte-exactly — batch splits,
    ordering, and encoding included. Swap the stub for a real codec and
    the oracle reverts to rows-only; the plumbing guarantee stays."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media)


@query(
    "multimodal_features",
    oracle=f"""
    WITH comps AS (
        SELECT doc_id,
               list_transform(range(0, {EMBED_DIM}),
                   i -> CAST(CAST(
                            CAST(('0x' || substr(sha256(text), 2*i + 1, 2))
                                 AS INTEGER) / 255.0
                        AS REAL) AS DOUBLE)) AS v
        FROM documents
    )
    SELECT doc_id AS media_id,
           (ARRAY['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
               AS modality,
           CAST({EMBED_DIM} AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
           round(v[1], 6) AS c0,
           round(v[2], 6) AS c1
    FROM comps
    """,
)
def multimodal_features(spark, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (binary -> embedding array), surfaced
    as scalar per-item facts for the harness.

    ``extract_features`` keeps returning the raw ``array<float>`` column for
    library use; the *registered* query projects it to hashable scalars
    (dim, L2 norm, first two components) because the driver canonicalizer
    sorts result columns through pandas, which cannot factorize ndarray
    cells — the same scalars-only output contract map-typed queries follow
    (see ``user_eventtype_map_stats``).

    ORACLE-checked: the stub encoder derives components from sha256 digest
    bytes, which DuckDB restates from the hex digest — including the
    float32 quantization the Arrow schema applies (REAL round-trip cast).
    A green row proves the encoder-stage Arrow path end-to-end; swap in a
    real encoder and the entry reverts to rows-only.
    """
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    sq = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    return feats.select(
        "media_id",
        "modality",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("c0"),
        F.round(F.element_at("embedding", 2).cast("double"), 6).alias("c1"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: explode one row per sampled timestamp
    (decode of the actual frame is the stub boundary). Pure JVM fan-out —
    the payload column is NOT duplicated per frame (only offsets), which is
    what keeps this viable at 100 TB."""
    video = media.filter(F.col("modality") == "video")
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return video.select(
        "media_id",
        F.explode(offsets).alias("frame_ms"),
    )


@query(
    "multimodal_frame_samples",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0,
                greatest(length(text) * 10 - 1, 0), 1000)) AS BIGINT)
               AS frame_ms
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def multimodal_frame_samples(spark, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out for the video modality, declared and
    oracle-checked: one row per sampled timestamp, derived purely from the
    duration metadata — the payload column never fans out (only offsets
    do), which is what keeps frame sampling viable at 100 TB. The decode
    of each sampled frame is the stub boundary; the row fan-out, modality
    filter, and offset arithmetic are exact and engine-checked.

    (``synthesize_media`` assigns modality round-robin: doc_id % 3 == 2 →
    'video', duration_ms = 10 ms/char — the oracle restates both.)"""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media).select(
        "media_id", F.col("frame_ms").cast("bigint").alias("frame_ms")
    )


@query(
    "multimodal_dedup_by_digest",
    oracle="""
    SELECT sha256(text) AS digest,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keep_media_id,
           CAST(COUNT(DISTINCT CASE WHEN doc_id % 3 = 0 THEN 'image'
                                    WHEN doc_id % 3 = 1 THEN 'audio'
                                    ELSE 'video' END) AS BIGINT)
               AS n_modalities
    FROM documents
    GROUP BY 1, 2
    """,
)
def multimodal_dedup_by_digest(spark, sf_dir: str) -> DataFrame:
    """Content-addressable media dedup: group payloads by (sha256 digest,
    byte length) and report copy counts, the canonical keeper (min
    media_id), and how many MODALITIES the same bytes were ingested under
    (the classic media-pipeline duplicate: one asset registered as both
    image and video thumbnail). The step before writing 100 TB of media
    to blob storage — storage cost scales with distinct digests, not
    arrivals.

    Scale: the digest is computed map-side from the payload and the
    payload column is pruned BEFORE the exchange — only (digest, n_bytes,
    modality, media_id) shuffle, never the bytes; one hash aggregate with
    map-side partials. The oracle restates digest and byte length over
    the utf-8 stand-in payload (`sha256(text)`), so the binary
    plumbing is value-checked end-to-end."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy(
        F.sha2(F.col("payload"), 256).alias("digest"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("media_id").cast("bigint").alias("keep_media_id"),
        F.count_distinct("modality").cast("bigint").alias("n_modalities"),
    )
