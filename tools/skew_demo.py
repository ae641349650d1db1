"""Skew-helper win demonstration (round-3 verdict item 7).

The salted helpers in ``functions/skew.py`` are oracle-checked for result
transparency on the driver corpus, but that corpus is uniform — salting
never gets to *win* there. This script builds a deliberately hot-keyed
fixture (one key owns ~35% of all rows) and times:

- plain ``groupBy(key).agg(count, sum)`` vs ``salted_count_sum`` — the
  honest NEGATIVE result: Spark's map-side combine already collapses the
  hot key to one partial row per map task, so salting only adds shuffle
  volume for algebraic aggregates (this scopes where the helper applies);
- plain ``COUNT(DISTINCT value)`` per key vs ``salted_count_distinct`` —
  the aggregation shape where salting wins: map-side dedup cannot shrink
  the hot key's distinct-pair fan-in to one reducer, the value-hash salt
  splits it across n_salts reducers with exact disjoint counts;
- plain shuffle join vs ``salted_join`` with AQE's skew-join splitting OFF,
  isolating the technique AQE implements internally (the engine session
  keeps AQE skew-join ON for every join that isn't hand-salted — the demo
  also times the AQE-on plain join for reference).

Each timed variant is asserted result-equal before timing. Results are
printed as a markdown block to paste into SCALING.md (and stdout JSON).

Usage: python tools/skew_demo.py [n_rows] (default 20_000_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_ml_pipeline_spark.functions.skew import (  # noqa: E402
    salted_count_distinct,
    salted_count_sum,
    salted_join,
)
from airflow_ml_pipeline_spark.session import get_spark  # noqa: E402

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_KEYS = 100_000
HOT_SHARE = 0.35
STAGE = "/tmp/spark_graft_skew_demo"


def build_fixture(spark):
    """~35% of rows on key 0, the rest uniform over N_KEYS keys."""
    big = (
        spark.range(N_ROWS)
        .select(
            F.when(F.rand(1) < HOT_SHARE, F.lit(0))
            .otherwise((F.rand(2) * N_KEYS).cast("long"))
            .alias("key"),
            F.rand(3).alias("value"),
        )
    )
    big.write.mode("overwrite").parquet(f"{STAGE}/big.parquet")
    small = spark.range(N_KEYS).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("dim_attr")
    )
    small.write.mode("overwrite").parquet(f"{STAGE}/small.parquet")


def timed(label, df, results, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    results[label] = round(best, 2)
    print(f"# {label}: {results[label]}s", file=sys.stderr)


def main():
    spark = get_spark("skew-demo", master="local[32]")
    build_fixture(spark)
    big = spark.read.parquet(f"{STAGE}/big.parquet")
    small = spark.read.parquet(f"{STAGE}/small.parquet")
    results = {}

    plain_agg = big.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total"),
    )
    salted_agg = salted_count_sum(big, ["key"], "value")
    mismatch = plain_agg.join(
        salted_agg.withColumnRenamed("n_rows", "n2").withColumnRenamed(
            "total", "t2"
        ),
        "key",
        "full",
    ).filter(
        (F.col("n_rows") != F.col("n2"))
        | (F.abs(F.col("total") - F.col("t2")) > 1e-6)
    )
    assert mismatch.count() == 0, "salted aggregation result mismatch"
    timed("agg_plain", plain_agg, results)
    timed("agg_salted", salted_agg, results)

    # distinct-count: the hot key carries ~7M distinct doubles — plain
    # distinct-agg funnels all of them to one reducer
    plain_distinct = big.groupBy("key").agg(
        F.count_distinct("value").alias("n_distinct")
    )
    salted_distinct = salted_count_distinct(big, ["key"], "value")
    dmismatch = plain_distinct.join(
        salted_distinct.withColumnRenamed("n_distinct", "d2"), "key", "full"
    ).filter(F.col("n_distinct") != F.col("d2"))
    assert dmismatch.count() == 0, "salted distinct-count mismatch"
    timed("distinct_plain", plain_distinct, results)
    timed("distinct_salted", salted_distinct, results)

    # join demo: count(big x small) — aggregate after the join so the noop
    # sink measures the join, not a 20M-row materialization
    plain_join = big.join(small, "key").groupBy("dim_attr").agg(
        F.count(F.lit(1)).alias("n")
    )
    salted_join_df = salted_join(big, small, "key").groupBy("dim_attr").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = {r.dim_attr: r.n for r in plain_join.collect()}
    b = {r.dim_attr: r.n for r in salted_join_df.collect()}
    assert a == b, "salted join result mismatch"

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    # sort-merge path: broadcast would hide the shuffle skew being treated
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed("join_plain_no_aqe_skew", plain_join, results)
    timed("join_salted_no_aqe_skew", salted_join_df, results)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("join_plain_aqe_skew_on", plain_join, results)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        "10485760",
    )

    shutil.rmtree(STAGE, ignore_errors=True)
    out = {
        "n_rows": N_ROWS,
        "n_keys": N_KEYS,
        "hot_share": HOT_SHARE,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
