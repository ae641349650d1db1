"""TPC-H query shapes round 3: market share (Q8), min-cost-supplier ranking
(Q2), and value-concentration thresholds (Q11) — adapted to this corpus's
schema (no partsupp table; lineitem serves as the part×supplier relation).

Reference parity note: the reference (twteed/airflow-ml-pipeline) has no
relational surface (SURVEY.md §2.12); these extend the driver's
DuckDB-oracle coverage with three planner shapes the earlier rounds lacked:
a two-dimension-nation join tree feeding a conditional share, a per-group
argmin over a derived ratio, and a decorrelated fraction-of-group-total
filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_ml_pipeline_spark.functions.compare import DEC, SQL_DSUM, dsum
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

SHARE_NATION = "NATION_7"
SHARE_REGION = "ASIA"
BEST_SUPPLIER_PTYPE = "LARGE"
CONCENTRATION_FRAC = 0.002


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "nation_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ROUND({SQL_DSUM(f"CASE WHEN n2.n_name = '{SHARE_NATION}' "
                           "THEN l_extendedprice * (1 - l_discount) "
                           "ELSE 0 END")}
                 / {SQL_DSUM("l_extendedprice * (1 - l_discount)")},
                 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = '{SHARE_REGION}'
    GROUP BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of supplier revenue into one region's
    customers, per order year. The fact table joins four dimensions — all
    broadcast (region/nation/supplier/customer are each orders of magnitude
    below the fact side at every scale), so the plan is a single fact scan
    with map-side lookups and one final year aggregation. The share is a
    conditional decimal sum over the same aggregation pass — no second scan,
    no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    cust_region = (
        cust.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == SHARE_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    rev = _revenue()
    national = F.when(F.col("supp_nation") == SHARE_NATION, rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(dsum(national) / dsum(rev), 6).alias("mkt_share"))
    )


@query(
    "part_best_supplier",
    oracle=f"""
    WITH unit AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name,
               CAST(SUM(CAST(l_extendedprice AS {DEC.upper()})) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS {DEC.upper()})) AS DOUBLE)
                 AS unit_price
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_type = '{BEST_SUPPLIER_PTYPE}'
        GROUP BY 1, 2, 3, 4
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           ROUND(unit_price, 6) AS unit_price
    FROM unit
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY p_partkey ORDER BY unit_price, s_suppkey) = 1
    """,
)
def part_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per part (one type), the supplier with the lowest observed
    average unit price, suppkey as the deterministic tiebreaker. The
    correlated min-subquery of textbook Q2 is decorrelated into one
    aggregation to (part, supplier) grain plus a rank-1 window — one shuffle
    for the agg, one for the window, both on keys that scale with the
    dimension (part count), not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == BEST_SUPPLIER_PTYPE
    )
    supp = load_table(spark, sf_dir, "supplier")
    unit_price = F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.sum(
        F.col("l_quantity").cast(DEC)
    ).cast("double")
    unit = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name")
        .agg(unit_price.alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "s_suppkey")
    return (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.round(F.col("unit_price"), 6).alias("unit_price"),
        )
    )


@query(
    "nation_value_concentration",
    oracle=f"""
    WITH part_value AS (
        SELECT n_name, l_partkey,
               {SQL_DSUM("l_extendedprice * (1 - l_discount)")} AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT n_name,
               CAST(SUM(CAST(part_value AS {DEC.upper()})) AS DOUBLE)
                   AS nation_total
        FROM part_value GROUP BY 1
    )
    SELECT p.n_name, l_partkey,
           ROUND(part_value, 6) AS part_value
    FROM part_value p JOIN totals t ON p.n_name = t.n_name
    WHERE part_value > {CONCENTRATION_FRAC} * nation_total
    """,
)
def nation_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value exceeds a fixed fraction of
    their supplier nation's total — the fraction-of-group-total filter whose
    textbook form is a correlated scalar subquery. Decorrelated: aggregate
    once to (nation, part) grain, re-aggregate that small frame to nation
    totals, broadcast-join the totals back and filter. The fact table is
    scanned exactly once; the threshold comparison runs on engine-identical
    decimal-exact doubles so the oracle filter agrees bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    part_value = (
        li.join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name", "l_partkey")
        .agg(dsum(_revenue()).alias("part_value"))
    )
    totals = part_value.groupBy("n_name").agg(
        F.sum(F.col("part_value").cast(DEC)).cast("double").alias("nation_total")
    )
    return (
        part_value.join(F.broadcast(totals), "n_name")
        .filter(F.col("part_value") > CONCENTRATION_FRAC * F.col("nation_total"))
        .select("n_name", "l_partkey", F.round("part_value", 6).alias("part_value"))
    )


#: scale-free thresholds: a fixed absolute count would sweep in every
#: supplier (or none) as the fact table grows; ratios keep the predicate
#: meaningful at every sf
RETURN_HEAVY_RATIO = 0.35
DOMINANT_FAIR_SHARE_MULT = 2.5


@query(
    "brand_supplier_counts",
    oracle=f"""
    WITH excluded AS (
        SELECT l_suppkey AS bad_suppkey
        FROM lineitem
        GROUP BY 1
        HAVING CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
               / COUNT(*) > {RETURN_HEAVY_RATIO}
    )
    SELECT p_brand, p_type,
           CAST(CASE WHEN p_size < 25 THEN 'small' ELSE 'large' END
                AS VARCHAR) AS size_class,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (SELECT bad_suppkey FROM excluded)
    GROUP BY 1, 2, 3
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per part attribute group, with a
    NOT-IN exclusion subquery (return-heavy suppliers). The exclusion set is
    an aggregate over the fact table itself — tiny output (supplier-keyed),
    so it broadcasts into an anti join; the NOT IN never becomes a
    nested-loop because the subquery is provably non-null (grouped keys).
    One fact scan feeds both the exclusion aggregate and the main count."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excluded = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_returns"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(
            F.col("n_returns").cast("double") / F.col("n_items")
            > RETURN_HEAVY_RATIO
        )
        .select("l_suppkey")
    )
    size_class = F.when(F.col("p_size") < 25, "small").otherwise("large")
    return (
        li.join(F.broadcast(excluded), "l_suppkey", "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", size_class.alias("size_class"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "dominant_part_suppliers",
    oracle=f"""
    WITH per AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
        SELECT l_partkey,
               CAST(SUM(CAST(qty AS DECIMAL(25,6))) AS DOUBLE) AS total_qty,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM per GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM per
    JOIN tot USING (l_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE qty * n_suppliers > {DOMINANT_FAIR_SHARE_MULT} * total_qty
    GROUP BY 1, 2
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped well above their fair share
    (2.5x 1/n_suppliers) of some part's total volume, with how many parts
    they dominate — the scale-free form of the threshold, since absolute
    shares shrink as the supplier count per part grows with the corpus.
    The correlated availability
    subquery of textbook Q20 decorrelates into a two-level aggregation —
    (part, supplier) grain, re-aggregated to part totals — joined back on
    the part key and filtered on the share threshold. Same single-fact-scan
    property as the Q11 shape; the final supplier aggregation keys on the
    (tiny) supplier domain."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum(F.col("qty").cast(DEC)).cast("double").alias("total_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        per.join(tot, "l_partkey")
        .filter(
            F.col("qty") * F.col("n_suppliers")
            > DOMINANT_FAIR_SHARE_MULT * F.col("total_qty")
        )
        .join(F.broadcast(supp.select("s_suppkey", "s_name")), per.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


LOCAL_REVENUE_REGION = "ASIA"
LOCAL_REVENUE_YEAR = 1996
FORECAST_DISC_LO = 0.05
FORECAST_DISC_HI = 0.07
FORECAST_QTY_LT = 24


@query(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n_name,
           ROUND({SQL_DSUM("l_extendedprice * (1 - l_discount)")}, 6)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{LOCAL_REVENUE_REGION}'
      AND o_orderdate >= DATE '{LOCAL_REVENUE_YEAR}-01-01'
      AND o_orderdate <  DATE '{LOCAL_REVENUE_YEAR + 1}-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where the supplier is LOCAL to the
    customer (s_nationkey = c_nationkey) — the co-location join predicate
    that distinguishes Q5 from a plain star join, restricted to one region
    and one order year.

    Plan shape: the year filter pushes into the orders scan and the region
    filter prunes nation keys before anything touches lineitem; nation and
    region broadcast (fixed-size dims), while the scale-growing
    orders/customer/supplier joins stay hash joins for AQE to re-plan at
    runtime. The local-supplier condition rides the supplier join as an
    extra equi-clause — no post-join filter, so the join output never
    carries non-local pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= f"{LOCAL_REVENUE_YEAR}-01-01")
        & (F.col("o_orderdate") < f"{LOCAL_REVENUE_YEAR + 1}-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == LOCAL_REVENUE_REGION
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(dsum(_revenue()), 6).alias("revenue"))
    )


@query(
    "forecast_revenue_change",
    oracle=f"""
    SELECT ROUND({SQL_DSUM("l_extendedprice * l_discount")}, 6)
               AS revenue_increase,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '{LOCAL_REVENUE_YEAR}-01-01'
      AND l_shipdate <  DATE '{LOCAL_REVENUE_YEAR + 1}-01-01'
      AND l_discount BETWEEN {FORECAST_DISC_LO} AND {FORECAST_DISC_HI}
      AND l_quantity < {FORECAST_QTY_LT}
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the what-if revenue from eliminating mid-range discounts
    on small orders — a pure scan-filter-aggregate with zero joins.

    The planner-relevant property: ALL three predicates (date range,
    discount band, quantity cap) push down into the parquet scan as
    min/max row-group filters, and the aggregation is a single partial+
    final pair over a 2-column projection — at 100 TB this query's cost is
    I/O on exactly the pruned row groups, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= f"{LOCAL_REVENUE_YEAR}-01-01")
            & (F.col("l_shipdate") < f"{LOCAL_REVENUE_YEAR + 1}-01-01")
            & (F.col("l_discount") >= FORECAST_DISC_LO)
            & (F.col("l_discount") <= FORECAST_DISC_HI)
            & (F.col("l_quantity") < FORECAST_QTY_LT)
        )
        .agg(
            F.round(dsum(F.col("l_extendedprice") * F.col("l_discount")), 6)
            .alias("revenue_increase"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
