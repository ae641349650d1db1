"""TPC-H query shapes round 2: EXISTS/NOT-EXISTS semi/anti joins (Q4/Q21/
Q22), conditional two-way counts (Q12), outer-join count distributions
(Q13), correlated-average gates (Q17), and disjunctive multi-predicate
join filters (Q19) — adapted to this corpus's schema (no
commitdate/receiptdate/shipmode/phone columns; see
``/root/testdata``'s schemas in TESTDATA.md).

Reference parity note: the reference (twteed/airflow-ml-pipeline) has no
relational surface at all (SURVEY.md §2.12); these queries exist for the
driver's DuckDB-oracle contract and exercise the join/agg planner shapes a
100 TB workload hits constantly.
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
    "priority_order_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join.

    The semi join never materializes lineitem columns, so at scale the
    shuffle carries only orderkeys; the count happens after the probe side
    is reduced to matching orders.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "returnflag_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
)
def returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two complementary conditional counts in one pass
    (shipmode replaced by l_returnflag in this schema)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join preserving order-less customers,
    then a distribution-of-counts re-aggregation.

    COUNT(o_orderkey) (not COUNT(*)) so unmatched customers count 0. The
    second aggregate's key cardinality is tiny, so the re-agg is cheap at
    any scale; the heavy shuffle is the first groupBy on c_custkey.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "small_quantity_revenue",
    oracle=f"""
    SELECT {SQL_DSUM("l_extendedprice")} AS total_price, COUNT(*) AS n_items
    FROM lineitem
    JOIN (
        SELECT l_partkey AS avg_partkey,
               0.5 * AVG(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    ) ON l_partkey = avg_partkey
    WHERE l_quantity < half_avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into an
    aggregate-then-self-join.

    Spark and DuckDB both compute AVG as double sum/count over the same
    per-part groups; the 0.5* threshold comparison is IEEE-deterministic,
    so no decimal detour is needed for the *gate* — only the final revenue
    sum uses the exact decimal kernel.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgs = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    ).withColumnRenamed("l_partkey", "avg_partkey")
    return (
        li.join(avgs, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT {SQL_DSUM(SQL_REVENUE)} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive brand/size/quantity predicates
    straddling the join.

    Expressed as one boolean filter *after* the join so Catalyst can split
    it: the part-only disjuncts (brand OR'd with brand) can't prune the
    scan, but the combined predicate still runs inside whole-stage codegen
    with no UDF. Part is broadcast — the disjunction never forces a
    shuffle-side evaluation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#11") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#22") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#33") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            dsum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "sole_supplier_returns",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
)
def sole_supplier_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on (orderkey,
    suppkey-inequality) — suppliers who were the *only* one whose items were
    returned in a finished multi-supplier order.

    Decorrelated without inequality joins: per-order supplier stats
    (distinct suppliers overall / distinct suppliers with returns) are
    aggregated once, then the EXISTS pair becomes two cheap predicates on
    that pre-aggregated frame joined back by orderkey. At 100 TB this is
    two shuffles on l_orderkey instead of three correlated probes.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supps"),
    )
    # EXISTS(other supplier)          <=> n_supps > 1
    # NOT EXISTS(other ret. supplier) <=> every 'R' row in the order is mine
    #                                 <=> n_ret_supps == 1 (I have an R row)
    eligible = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1)
    ).select("l_orderkey")

    mine = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        mine.join(eligible.withColumnRenamed("l_orderkey", "e_orderkey"),
                  F.col("l_orderkey") == F.col("e_orderkey"))
        .join(orders_f, F.col("l_orderkey") == orders_f.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "idle_rich_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_nationkey
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join —
    above-average-balance customers with no urgent orders, per nation.

    (The synthetic corpus gives every customer at least one order, so the
    anti join is against the urgent subset to keep the check non-vacuous.)

    The global average is a one-row broadcast; the anti join ships only
    custkeys. Both sides of the threshold comparison are the same double
    AVG in both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "nation_pair_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           {SQL_DSUM(SQL_REVENUE)} AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE cn.n_nationkey < 5 AND sn.n_nationkey < 5
      AND cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between (customer-nation,
    supplier-nation) pairs by year — the same dimension table joined twice
    under different aliases, both broadcast; the nation filters cut the
    probe before the fact-side shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cn, cust.c_nationkey == F.col("cn_key"))
        .join(sn, supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cn_key") != F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(dsum(_revenue()).alias("volume"))
    )


@query(
    "nation_profit_by_year",
    oracle=f"""
    SELECT n_name AS supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           {SQL_DSUM("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity")}
               AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2
    """,
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus part-cost proxy) per supplier
    nation and year, with a part-name LIKE filter evaluated on the
    broadcast build side before the fact join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%a%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = _revenue() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )
