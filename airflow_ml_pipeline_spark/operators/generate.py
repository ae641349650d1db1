"""Synthetic customer-churn data generation, Spark-native (SURVEY.md §2.2
G1-G9; reference /root/reference/src/ml_pipeline/data_ingestion.py:12-109).

The reference draws from NumPy's RandomState stream; bit-level reproduction
of that stream under distributed execution is impossible, so the contract is
weakened to: same distributions, deterministic per (seed, n_samples)
(SURVEY.md §5.1). Everything is a column expression over ``spark.range`` —
the generator scales linearly with zero shuffles:

- exponential draws by inverse CDF: -scale * ln(rand)
- weighted categoricals by CDF bucketing of rand
- conditional normals from randn
- Poisson by inverse-CDF lookup against a precomputed literal CDF array
  (lambda is a fixed config constant, so the CDF is a tiny plan literal —
  no UDF, no Python in the executor path)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed seed-relation partitioning — part of the generator's
#: determinism contract (see generate_synthetic_data)
GEN_PARTITIONS = 16

EXPECTED_COLUMNS = [
    "tenure",
    "contract_type",
    "payment_method",
    "internet_service",
    "monthly_charges",
    "total_charges",
    "num_support_tickets",
    "avg_monthly_usage_gb",
    "churn",
]


def _exponential(scale: float, seed: int) -> Column:
    """Inverse-CDF exponential draw (G1/G6)."""
    return -F.lit(float(scale)) * F.log(F.lit(1.0) - F.rand(seed))


def _clip(c: Column, lo: float, hi: float) -> Column:
    return F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), c))


def _weighted_choice(values: list[str], probs: list[float], seed: int) -> Column:
    """Weighted categorical via CDF bucketing of one uniform draw (G2)."""
    u = F.rand(seed)
    cdf = 0.0
    expr = None
    for value, p in zip(values[:-1], probs[:-1]):
        cdf += p
        branch = (u < cdf, F.lit(value))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return expr.otherwise(F.lit(values[-1]))


def _poisson(lam: float, seed: int, max_k: int = 30) -> Column:
    """Inverse-CDF Poisson draw (G5): k = #{cdf values < u} over a literal
    CDF array — stays inside whole-stage codegen, no UDF."""
    cdf, term = [], math.exp(-lam)
    acc = term
    for k in range(max_k):
        cdf.append(acc)
        term *= lam / (k + 1)
        acc += term
    u = F.rand(seed)
    cdf_arr = F.lit(cdf).cast("array<double>")
    return F.size(F.filter(cdf_arr, lambda c: c < u))


def generate_synthetic_data(
    spark: SparkSession, n_samples: int = 10000, random_state: int = 42
) -> DataFrame:
    """Generate the synthetic churn table with the reference's distributions
    (data_ingestion.py:28-102): correlated monthly charges / usage by
    service type, logistic churn model, Bernoulli labels."""
    s = random_state
    # G9: the seed relation. numPartitions is PINNED: F.rand/F.randn seed
    # per (partition index, row offset), so leaving it to
    # defaultParallelism makes the draw depend on the session's core
    # count — fine for distribution tests, fatal for the staged-artifact
    # oracle (engineered_customer_features) where the driver's session
    # and this one must generate byte-identical frames. 16 partitions
    # also keeps the generator parallel at any n_samples.
    df = spark.range(0, n_samples, 1, GEN_PARTITIONS)

    tenure = _clip(_exponential(24, s + 1), 1, 72).cast("int")
    contract_type = _weighted_choice(
        ["month-to-month", "one-year", "two-year"], [0.50, 0.30, 0.20], s + 2
    )
    payment_method = _weighted_choice(
        ["electronic_check", "mailed_check", "bank_transfer", "credit_card"],
        [0.35, 0.20, 0.25, 0.20],
        s + 3,
    )
    internet_service = _weighted_choice(
        ["fiber_optic", "dsl", "none"], [0.45, 0.35, 0.20], s + 4
    )

    df = (
        df.withColumn("tenure", tenure)
        .withColumn("contract_type", contract_type)
        .withColumn("payment_method", payment_method)
        .withColumn("internet_service", internet_service)
    )

    # G3: conditional normal per service tier, clipped and rounded
    base_charge = (
        F.when(F.col("internet_service") == "fiber_optic", F.randn(s + 5) * 15 + 80)
        .when(F.col("internet_service") == "dsl", F.randn(s + 5) * 10 + 55)
        .otherwise(F.randn(s + 5) * 5 + 25)
    )
    df = df.withColumn("monthly_charges", F.round(_clip(base_charge, 18, 120), 2))

    # G4: arithmetic derive + noise, floor at 0
    df = df.withColumn(
        "total_charges",
        F.greatest(
            F.lit(0.0),
            F.round(F.col("monthly_charges") * F.col("tenure") + F.randn(s + 6) * 50, 2),
        ),
    )

    df = df.withColumn("num_support_tickets", _poisson(1.5, s + 7))

    df = df.withColumn(
        "avg_monthly_usage_gb",
        F.when(F.col("internet_service") == "none", F.lit(0.0)).otherwise(
            F.round(_clip(_exponential(15, s + 8), 0.5, 100), 2)
        ),
    )

    # G7/G8: logistic churn model + Bernoulli draw
    churn_logit = (
        F.lit(-1.5)
        + 0.8 * (F.col("contract_type") == "month-to-month").cast("double")
        - 0.5 * (F.col("contract_type") == "two-year").cast("double")
        + 0.4 * (F.col("payment_method") == "electronic_check").cast("double")
        - 0.02 * F.col("tenure")
        + 0.01 * F.col("monthly_charges")
        + 0.15 * F.col("num_support_tickets")
        - 0.01 * F.col("avg_monthly_usage_gb")
        + F.randn(s + 9) * 0.3
    )
    churn_prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-churn_logit))
    df = df.withColumn("churn", (F.rand(s + 10) < churn_prob).cast("int"))

    return df.select(*EXPECTED_COLUMNS)


def ingest_data(spark: SparkSession, config: dict) -> DataFrame:
    """Load-or-generate (S3; data_ingestion.py:169-194): read the raw CSV if
    present, else generate + persist. Validation runs either way."""
    import os

    from airflow_ml_pipeline_spark.operators.validate import validate_data
    from airflow_ml_pipeline_spark.schemas import CUSTOMERS
    from airflow_ml_pipeline_spark.sources.catalog import read_csv, write_csv

    raw_path = config["data"]["raw_data_path"]
    if os.path.exists(raw_path):
        df = read_csv(spark, raw_path, CUSTOMERS)
    else:
        df = generate_synthetic_data(
            spark,
            n_samples=config["data"]["n_samples"],
            random_state=config["data"]["random_state"],
        )
        write_csv(df, raw_path)
        df = read_csv(spark, raw_path, CUSTOMERS)

    validate_data(df)
    return df
