"""Spark ML text-feature pipeline (Tokenizer → HashingTF → IDF →
Normalizer), the MLlib-native path for turning documents into sparse
feature vectors (SURVEY.md §2.12 text-analysis row).

The columnar TF-IDF in operators/textstats.py is the oracle-checkable twin;
this pipeline is the one you feed to MLlib estimators (e.g. clustering for
topic-ish dedup) — vectors are engine-specific (hashing buckets), so it is
exposed as a library + tests rather than an oracle query.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import IDF, HashingTF, Normalizer, RegexTokenizer
from pyspark.sql import DataFrame


def build_tfidf_pipeline(
    input_col: str = "text",
    output_col: str = "tfidf",
    num_features: int = 1 << 12,
) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol=input_col, outputCol="__tokens", pattern="\\s+"
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=num_features
    )
    idf = IDF(inputCol="__tf", outputCol="__tfidf")
    norm = Normalizer(inputCol="__tfidf", outputCol=output_col, p=2.0)
    return Pipeline(stages=[tokenizer, tf, idf, norm])


def fit_transform_tfidf(docs: DataFrame, **kwargs) -> tuple[DataFrame, PipelineModel]:
    model = build_tfidf_pipeline(**kwargs).fit(docs)
    out = model.transform(docs).drop("__tokens", "__tf", "__tfidf")
    return out, model
