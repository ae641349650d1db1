"""Cross-library parity tests: the Spark implementations of pandas-defined
semantics (pd.cut buckets, quantile interpolation, ddof conventions) are
checked against pandas itself on the same data — pandas is the reference's
substrate, so agreement here IS reference parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import features, generate


@pytest.fixture(scope="module")
def pdf(spark):
    df = generate.generate_synthetic_data(spark, n_samples=400, random_state=7)
    return df.toPandas()


def test_tenure_bucket_matches_pd_cut(spark, pdf):
    expected = (
        pd.cut(
            pdf["tenure"],
            bins=[0, 6, 12, 24, 48, 72],
            labels=["0-6m", "6-12m", "1-2y", "2-4y", "4-6y"],
        )
        .astype(str)
        .tolist()
    )
    sdf = spark.createDataFrame(pdf)
    got = [
        r.tenure_bucket
        for r in features.add_engineered_features(sdf, high_value_threshold=0.0)
        .select("tenure_bucket")
        .collect()
    ]
    assert got == expected


def test_percentile_matches_pandas_quantile(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    got = sdf.agg(F.percentile("monthly_charges", F.lit(0.75))).collect()[0][0]
    expected = pdf["monthly_charges"].quantile(0.75)
    assert abs(got - expected) < 1e-9


def test_clip_outliers_uses_sample_std(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    clipped = features.clip_outliers(sdf, ["total_charges"], 3.0)
    got_max = clipped.agg(F.max("total_charges")).collect()[0][0]
    m, s = pdf["total_charges"].mean(), pdf["total_charges"].std()  # ddof=1
    expected_max = min(pdf["total_charges"].max(), m + 3.0 * s)
    assert abs(got_max - expected_max) < 1e-6


def test_standard_scaler_uses_population_std(spark, pdf):
    """sklearn StandardScaler divides by the population std (ddof=0)."""
    prep = features.Preprocessor(
        scaling_method="standard",
        numerical_cols=["monthly_charges"],
        categorical_cols=[],
    ).fit(spark.createDataFrame(pdf))
    center, scale = prep.scaler_stats["monthly_charges"]
    assert abs(center - pdf["monthly_charges"].mean()) < 1e-9
    assert abs(scale - pdf["monthly_charges"].std(ddof=0)) < 1e-9


def test_ohe_basis_matches_sklearn_convention(spark, pdf):
    """drop='first' on sorted categories; unknown value at transform time
    encodes to all-zeros (handle_unknown='ignore')."""
    prep = features.Preprocessor(
        scaling_method="standard",
        numerical_cols=[],
        categorical_cols=["contract_type"],
    ).fit(spark.createDataFrame(pdf))
    cats = sorted(pdf["contract_type"].unique())
    assert prep.categories["contract_type"] == cats
    assert prep.feature_names == [f"cat__contract_type_{v}" for v in cats[1:]]

    unknown = spark.createDataFrame(
        pd.DataFrame({"contract_type": ["never-seen-value"]})
    )
    row = prep.transform(unknown).collect()[0]
    assert all(v == 0.0 for v in row)


def test_minmax_scaler_formula(spark, pdf):
    prep = features.Preprocessor(
        scaling_method="minmax",
        numerical_cols=["monthly_charges"],
        categorical_cols=[],
    ).fit(spark.createDataFrame(pdf))
    lo, rng = prep.scaler_stats["monthly_charges"][0], prep.scaler_stats["monthly_charges"][1]
    assert abs(lo - pdf["monthly_charges"].min()) < 1e-9
    assert abs(rng - (pdf["monthly_charges"].max() - pdf["monthly_charges"].min())) < 1e-9
    out = prep.transform(spark.createDataFrame(pdf))
    row = out.agg(F.min("num__monthly_charges"), F.max("num__monthly_charges")).collect()[0]
    assert abs(row[0] - 0.0) < 1e-9 and abs(row[1] - 1.0) < 1e-9


def test_robust_scaler_formula(spark, pdf):
    prep = features.Preprocessor(
        scaling_method="robust",
        numerical_cols=["monthly_charges"],
        categorical_cols=[],
    ).fit(spark.createDataFrame(pdf))
    center, scale = prep.scaler_stats["monthly_charges"]
    s = pdf["monthly_charges"]
    assert abs(center - s.quantile(0.5)) < 1e-9
    assert abs(scale - (s.quantile(0.75) - s.quantile(0.25))) < 1e-9
