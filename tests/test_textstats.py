"""Text-analysis operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import textstats
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_doc_stats_consistency(spark, sf_dir):
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = textstats.doc_stats(spark, sf_dir).collect()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_tokens >= r.n_unique_tokens >= 1
        assert r.avg_token_len > 0
        assert r.n_chars_actual > 0


def test_token_frequencies_vocab(spark, sf_dir):
    rows = textstats.token_frequencies(spark, sf_dir).collect()
    assert all(r.freq >= r.doc_freq >= 1 for r in rows)
    total_freq = sum(r.freq for r in rows)
    total_tokens = sum(
        r.n_tokens for r in textstats.doc_stats(spark, sf_dir).collect()
    )
    assert total_freq == total_tokens


def test_quality_flags_are_binary(spark, sf_dir):
    rows = textstats.doc_quality(spark, sf_dir).collect()
    assert all(r.quality_pass in (0, 1) for r in rows)
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in rows)
    assert all(0.0 < r.unique_ratio <= 1.0 for r in rows)


def test_langid_outputs_known_labels(spark, sf_dir):
    rows = textstats.langid_heuristic(spark, sf_dir).collect()
    allowed = set(textstats.LANG_MARKERS) | {"unknown"}
    assert all(r.predicted_lang in allowed for r in rows)


def test_heavy_hitters_sketch_has_no_false_negatives(spark, sf_dir):
    """freqItems' one-directional guarantee, asserted directly: every
    token above the support threshold appears in the sketch result, and
    the declared query's flags are all 1 (the same fact the oracle pins)."""
    from airflow_ml_pipeline_spark.operators.textstats import (
        HH_SUPPORT,
        token_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = {r.token: r.cnt for r in toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(counts.values())
    sketch = set(toks.stat.freqItems(["token"], HH_SUPPORT).collect()[0][0])
    heavy = {t for t, c in counts.items() if c > HH_SUPPORT * total}
    assert heavy <= sketch
    out = token_heavy_hitters(spark, sf_dir).collect()
    assert len(out) == min(10, len(counts))
    assert all(r.hh_guarantee == 1 for r in out)
