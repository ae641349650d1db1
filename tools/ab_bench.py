"""Per-query A/B re-bench: time a named subset of the declared queries
N times back-to-back in ONE session (the shared-tenancy host varies ±30%
across sessions, so cross-session comparisons under ~1.4x are noise —
verify-skill gotcha). Prints per-run times + min/median per query as a
markdown block (for SCALING.md attribution notes) and one JSON line.

Usage:
    python tools/ab_bench.py [-n REPS] [--sf SF_DIR] name [name ...]

Timing action is the same noop-format write bench.py uses (count() would
let Catalyst prune projected columns). bench.py's OWN warm_session runs
first (imported, not copied) so run 1 measures the operator under the
identical regime as the round bench.
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

    # THE shared warmup bench.py uses — identical timing regime, one
    # definition (r7 review: a hand-copied subset drifted)
    from bench import warm_session

    warm_session(spark, args.sf, qs)

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
