"""Product-analytics operators (funnel, cohort retention) — the OLAP query
shapes a warehouse user expects beyond TPC-H, expressed as compositions of
window functions and month arithmetic. Both carry DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

FUNNEL_STEPS = ("signup", "view", "purchase")


@query(
    "events_funnel",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END) AS t0,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN ts END) AS t1,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN ts END) AS t2
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL) AS BIGINT) AS n_step1,
           CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0) AS BIGINT)
               AS n_step2,
           CAST(COUNT(*) FILTER (WHERE t0 IS NOT NULL AND t1 > t0 AND t2 > t1)
               AS BIGINT) AS n_step3
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (signup → first later view → first later
    purchase): one aggregation computes each user's earliest time per step,
    then ordered-progression counts. Single shuffle on user_id with full
    map-side partials — the funnel never materializes per-event rows past
    the first aggregate, which is what keeps it linear at 100 TB (the naive
    formulation is a per-user sequence self-join)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == step, F.col("ts"))).alias(f"t{i}")
            for i, step in enumerate(FUNNEL_STEPS)
        ]
    )
    s1 = F.col("t0").isNotNull()
    s2 = s1 & (F.col("t1") > F.col("t0"))
    s3 = s2 & (F.col("t2") > F.col("t1"))
    return firsts.agg(
        F.sum(s1.cast("long")).alias("n_step1"),
        F.sum(s2.cast("long")).alias("n_step2"),
        F.sum(s3.cast("long")).alias("n_step3"),
    )


@query(
    "orders_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               date_trunc('month', MIN(o_orderdate)) AS cohort_month
        FROM orders
        GROUP BY o_custkey
    )
    SELECT strftime(cohort_month, '%Y-%m') AS cohort_month,
           CAST(date_diff('month', cohort_month,
                date_trunc('month', o_orderdate)) AS INTEGER) AS month_offset,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    counted per month offset of their later orders. Two aggregations: the
    cohort assignment (groupBy custkey) and the matrix (groupBy cohort,
    offset); the cohort frame re-joins the fact table on its shuffle key so
    AQE can pick a broadcast when cohorts fit."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    month_offset = (
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
        )
        .cast("int")
        .alias("month_offset")
    )
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
            month_offset,
        )
        .agg(F.count_distinct("o_custkey").alias("n_customers"))
    )
