"""Additional TPC-H-shaped queries: correlated/nested subqueries, HAVING
gates, ratio aggregates, argmax-by-subquery — the query shapes Q10/Q14/Q15/
Q18 exercise, adapted to this corpus's schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import SQL_DSUM, dsum
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "large_quantity_orders",
    oracle=f"""
    SELECT c_name, o_orderkey,
           {SQL_DSUM('l_quantity')} AS total_qty,
           round(MAX(o_totalprice), 2) AS order_price
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
    )
    GROUP BY c_name, o_orderkey
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with a HAVING gate → left-semi join on
    the pre-aggregated key set (never a distinct-after-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(
            dsum(F.col("l_quantity")).alias("total_qty"),
            F.round(F.max("o_totalprice"), 2).alias("order_price"),
        )
    )


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           {SQL_DSUM(f"CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE 0.0 END")}
               AS promo_revenue,
           {SQL_DSUM(SQL_REVENUE)} AS total_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio numerators computed in
    the same single pass as the denominator (the ratio itself is left to the
    consumer — division of engine-exact decimals stays exact downstream)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(_revenue()).alias("total_revenue"),
        )
    )


@query(
    "top_revenue_suppliers",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, {SQL_DSUM(SQL_REVENUE)} AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_name, total_rev
    FROM srev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax via scalar-subquery equality on an exact
    aggregate (exactness matters: a float '=' against a recomputed max is
    only safe because the decimal sums are bit-identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    srev = li.groupBy("l_suppkey").agg(dsum(_revenue()).alias("total_rev"))
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "total_rev")
    )


@query(
    "returned_revenue_by_customer",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {SQL_DSUM(SQL_REVENUE)} AS lost_revenue,
           COUNT(*) AS n_returned_items
    FROM customer
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    """,
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer (selective
    fact-side filter pushed to the lineitem scan before the join chain)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(_revenue()).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
    )
