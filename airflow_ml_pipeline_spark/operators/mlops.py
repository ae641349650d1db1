"""ML-pipeline operators exposed as declared queries: synthetic generation,
validation/drift profiling, feature engineering and a compact train+eval —
the reference's own dataflow (SURVEY.md §2.2-2.8) made visible to the
driver harness. Generation/training are not SQL-expressible → rows-only
checks; the drift profile over the corpus ``customer`` table is
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import SQL_DAVG, davg
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table


@query("synthetic_customers")  # rows-only: distributed RNG has no SQL twin
def synthetic_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G9: generate 2,000 churn-customer rows (seed 42) and validate them
    (V1-V8 raise on failure, so a returned frame IS the passing check)."""
    from airflow_ml_pipeline_spark.operators.generate import generate_synthetic_data
    from airflow_ml_pipeline_spark.operators.validate import validate_data

    df = generate_synthetic_data(spark, n_samples=2000, random_state=42)
    validate_data(df)
    return df


@query("engineered_customer_features")  # rows-only: derives from generated data
def engineered_customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4 over generated customers: derived ratio features, pd.cut-parity
    tenure buckets, quantile flag."""
    from airflow_ml_pipeline_spark.operators.features import add_engineered_features
    from airflow_ml_pipeline_spark.operators.generate import generate_synthetic_data

    df = generate_synthetic_data(spark, n_samples=2000, random_state=42)
    return add_engineered_features(df).select(
        "tenure",
        "tenure_bucket",
        F.round("charge_per_tenure", 4).alias("charge_per_tenure"),
        "high_value",
        F.round("support_intensity", 4).alias("support_intensity"),
        "churn",
    )


@query(
    "customer_drift_profile",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           {SQL_DAVG('c_acctbal')} AS acctbal_mean,
           CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS acctbal_nulls,
           MIN(c_acctbal) AS acctbal_min,
           MAX(c_acctbal) AS acctbal_max
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def customer_drift_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9 drift profile as a declared query: per-segment mean/null-count/
    min/max in ONE wide aggregate (the reference ran one pandas pass per
    statistic)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        davg(F.col("c_acctbal")).alias("acctbal_mean"),
        F.sum(F.col("c_acctbal").isNull().cast("int")).cast("long").alias("acctbal_nulls"),
        F.min("c_acctbal").alias("acctbal_min"),
        F.max("c_acctbal").alias("acctbal_max"),
    )


@query("churn_train_eval")  # rows-only: model fitting is not SQL-expressible
def churn_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact end-to-end ML check: generate → features → stratified split →
    single logistic-regression fit → confusion-kernel metrics. Returns one
    row of metric values (driver rows-only check verifies it runs and has a
    stable schema)."""
    from airflow_ml_pipeline_spark.operators.evaluation import evaluate_model
    from airflow_ml_pipeline_spark.operators.features import build_features
    from airflow_ml_pipeline_spark.operators.generate import generate_synthetic_data
    from airflow_ml_pipeline_spark.operators.split import stratified_split
    from airflow_ml_pipeline_spark.operators.training import assemble, train_model

    config = {
        "features": {
            "numerical": [
                "tenure",
                "monthly_charges",
                "total_charges",
                "num_support_tickets",
                "avg_monthly_usage_gb",
            ],
            "categorical": ["contract_type", "payment_method", "internet_service"],
            "target": "churn",
            "scaling_method": "standard",
            "handle_outliers": True,
            "outlier_threshold": 3.0,
        }
    }
    df = generate_synthetic_data(spark, n_samples=2000, random_state=42)
    features_df, _, feature_names = build_features(df, config, fit=True)
    ml_df = assemble(features_df, feature_names)
    train_df, test_df = stratified_split(ml_df, "label", test_size=0.2, seed=42)
    model, cv = train_model(
        "logistic_regression",
        train_df.cache(),
        param_grid={"C": [1.0], "penalty": ["l2"], "max_iter": [100]},
        cv_folds=2,
        scoring="f1",
        random_state=42,
    )
    scores = evaluate_model(model, test_df)
    return spark.createDataFrame(
        [
            {
                "model": "logistic_regression",
                "cv_f1": float(cv["best_cv_score"]),
                **{k: float(v) for k, v in scores.items() if isinstance(v, float)},
            }
        ]
    )
