"""Structural checks for the Q4/Q12/Q13/Q17/Q19/Q21/Q22-shaped queries and
the stats/range-join module — deep correctness is the DuckDB oracle harness
(tools/oracle_check.py / the driver's t2 gate)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import stats, tpch_extra2
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_priority_counts_cover_all_priorities(spark, sf_dir):
    rows = tpch_extra2.priority_order_counts(spark, sf_dir).collect()
    assert {r.o_orderpriority for r in rows} == {
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    }
    assert all(r.order_count > 0 for r in rows)


def test_returnflag_priority_counts_partition(spark, sf_dir):
    """high + low must equal the unconditional join-filtered count."""
    rows = tpch_extra2.returnflag_priority_counts(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    total = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == total


def test_customer_order_distribution_mass(spark, sf_dir):
    rows = tpch_extra2.customer_order_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    # synthetic corpus: every customer has orders -> no zero bucket
    assert all(r.c_count > 0 for r in rows)


def test_sole_supplier_returns_semantics(spark, sf_dir):
    """Spot-check the decorrelation: any supplier counted must come from an
    order with >1 suppliers where it holds every 'R' row."""
    li = load_table(spark, sf_dir, "lineitem")
    finished = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = li.join(finished, li.l_orderkey == finished.o_orderkey, "left_semi")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.count_distinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret_supps"),
        )
        .filter((F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1))
        .count()
    )
    rows = tpch_extra2.sole_supplier_returns(spark, sf_dir).collect()
    # numwait counts R-rows, >= one per eligible (order, supplier) pair
    assert sum(r.numwait for r in rows) >= per_order > 0


def test_idle_rich_customers_nonvacuous(spark, sf_dir):
    rows = tpch_extra2.idle_rich_customers(spark, sf_dir).collect()
    assert rows, "anti join must keep some customers at this SF"
    assert all(r.numcust > 0 and r.totacctbal > 0 for r in rows)


def test_event_stats_match_builtin_within_tolerance(spark, sf_dir):
    """The exact-moment formulas must agree with Spark's built-in corr /
    stddev_samp to float tolerance (bit-exactness vs DuckDB is the oracle
    harness's job; this guards against formula typos)."""
    ours = {
        r.event_type: r for r in stats.event_value_hour_stats(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    ref = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.avg("value").alias("mean_value"),
            F.stddev_samp("value").alias("std_value"),
            F.corr(F.col("value"), F.hour("ts").cast("double")).alias("c"),
        )
        .collect()
    }
    assert set(ours) == set(ref)
    for k, r in ours.items():
        assert math.isclose(r.mean_value, ref[k].mean_value, rel_tol=1e-6)
        assert math.isclose(r.std_value, ref[k].std_value, rel_tol=1e-6)
        assert math.isclose(r.corr_value_hour, ref[k].c, rel_tol=1e-4, abs_tol=1e-4)


def test_errors_before_purchase_window_is_strict(spark, sf_dir):
    """Every counted pair must be within (0, 1h] before the purchase."""
    df = stats.errors_before_purchase(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r.n_errors > 0 for r in rows)
    # recompute one purchase by hand
    ev = load_table(spark, sf_dir, "events")
    pid = rows[0].purchase_id
    p = ev.filter(F.col("event_id") == pid).collect()[0]
    manual = ev.filter(
        (F.col("user_id") == p.user_id)
        & (F.col("event_type") == "error")
        & (F.col("ts") < p.ts)
        & (F.col("ts") >= F.lit(p.ts) - F.expr("INTERVAL 1 HOUR"))
    ).count()
    assert manual == rows[0].n_errors


def test_disjunctive_brand_revenue_broadcasts_part(spark, sf_dir):
    plan = tpch_extra2.disjunctive_brand_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nation_market_share_is_a_valid_share(spark, sf_dir):
    from airflow_ml_pipeline_spark.operators import tpch_extra3

    rows = tpch_extra3.nation_market_share(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_part_best_supplier_is_unique_and_minimal(spark, sf_dir):
    from airflow_ml_pipeline_spark.operators import tpch_extra3

    df = tpch_extra3.part_best_supplier(spark, sf_dir)
    rows = df.collect()
    assert rows
    # one winner per part
    assert len({r.p_partkey for r in rows}) == len(rows)
    assert all(r.unit_price > 0 for r in rows)


def test_nation_value_concentration_rows_exceed_threshold(spark, sf_dir):
    from airflow_ml_pipeline_spark.operators import tpch_extra3
    from airflow_ml_pipeline_spark.functions.compare import DEC

    res = tpch_extra3.nation_value_concentration(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = supp.join(
        nation.select("n_nationkey", "n_name"),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    totals = (
        li.join(sn, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            )
            .cast("double")
            .alias("nation_total")
        )
    )
    checked = res.join(totals, "n_name").filter(
        F.col("part_value") <= tpch_extra3.CONCENTRATION_FRAC * F.col("nation_total")
    )
    assert checked.count() == 0


def test_brand_supplier_counts_bounds_and_exclusion(spark, sf_dir):
    from airflow_ml_pipeline_spark.operators import tpch_extra3

    rows = tpch_extra3.brand_supplier_counts(spark, sf_dir).collect()
    assert rows
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert all(0 < r.supplier_cnt <= n_supp for r in rows)
    assert all(r.size_class in ("small", "large") for r in rows)


def test_dominant_part_suppliers_exceed_fair_share(spark, sf_dir):
    from airflow_ml_pipeline_spark.operators import tpch_extra3

    rows = tpch_extra3.dominant_part_suppliers(spark, sf_dir).collect()
    assert rows
    assert all(r.n_dominated_parts >= 1 for r in rows)


def test_benford_reports_uniform_price_nonconformance(spark, sf_dir):
    """Digits partition the orders; probabilities sum to 1 on each side;
    TPC-H's range-uniform prices are NOT Benford and the query must report
    that (low digits overrepresented relative to high digits is the
    uniform-range signature within the generated magnitude span)."""
    from airflow_ml_pipeline_spark.operators.stats import (
        BENFORD_P,
        orders_benford_deviation,
    )
    from airflow_ml_pipeline_spark.sources.catalog import load_table

    rows = {r.digit: r for r in orders_benford_deviation(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 10))
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows.values()) == n_orders
    assert abs(sum(r.observed_p for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert abs(r.expected_p - BENFORD_P[d]) < 1e-9
        assert r.chi2_term >= 0
    chi2 = sum(r.chi2_term for r in rows.values())
    assert chi2 > 0.01, "uniform prices must not conform to Benford"
