"""Per-query A/B re-bench: time a named subset of the declared queries
N times back-to-back in ONE session (the shared-tenancy host varies ±30%
across sessions, so cross-session comparisons under ~1.4x are noise —
verify-skill gotcha). Prints per-run times + min/median per query as a
markdown block (for SCALING.md attribution notes) and one JSON line.

Usage:
    python tools/ab_bench.py [-n REPS] [--sf SF_DIR] name [name ...]

Timing action is the same noop-format write bench.py uses (count() would
let Catalyst prune projected columns). The same warmups as bench.py run
first so run 1 measures the operator, not engine startup.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from airflow_ml_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_bench", master=f"local[{cpus}]")
    qs = entrymod.queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # same warmups as bench.py: JVM/codegen/parquet footers + Python
    # worker pool + streaming engine, so run 1 is not a startup measure
    from pyspark.sql import functions as F

    spark.read.parquet(f"{args.sf}/region.parquet").count()
    from pyspark.sql.functions import pandas_udf

    def _warm_noop(s):
        return s

    warm_udf = pandas_udf(_warm_noop, "double")
    spark.range(1024).select(warm_udf(F.col("id").cast("double"))).count()
    if any(n.startswith("stream_") for n in args.names):
        from airflow_ml_pipeline_spark.streaming.sources import (
            read_events_stream,
            run_available_now,
        )

        run_available_now(
            read_events_stream(spark, args.sf)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")),
            output_mode="complete",
        ).count()

    results: dict[str, dict] = {}
    print(f"| query | runs (s) | min | median |")
    print(f"|---|---|---|---|")
    for name in args.names:
        runs = []
        for _ in range(args.n):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        results[name] = {
            "runs": runs,
            "min": min(runs),
            "median": round(statistics.median(runs), 3),
        }
        print(
            f"| {name} | {', '.join(f'{r:.2f}' for r in runs)} "
            f"| {min(runs):.2f} | {statistics.median(runs):.2f} |"
        )
    print(json.dumps({"sf": args.sf, "n": args.n, "results": results},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
