"""Scale-utility tests: salting equivalence, partitioned writes with
partition pruning, bucketing-free co-location sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions import skew
from airflow_ml_pipeline_spark.sources.catalog import load_table, write_parquet


def test_salted_aggregation_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n_rows, round(r.total, 4))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n_rows, round(r.total, 4))
        for r in skew.salted_count_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = (
        li.join(part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        skew.salted_join(li, part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.p_brand, r.n) for r in plain.collect()} == {
        (r.p_brand, r.n) for r in salted.collect()
    }


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned parquet layout: a ship-year filter must prune to the
    matching partition directories (PartitionFilters in the scan)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "lineitem_by_year")
    write_parquet(li, out, partition_by=["ship_year"])

    scan = spark.read.parquet(out).filter(F.col("ship_year") == 1997)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "ship_year" in plan.split("PartitionFilters", 1)[1][:200]
    expected = li.filter(F.col("ship_year") == 1997).count()
    assert scan.count() == expected
