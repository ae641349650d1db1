"""Driver-side construction audit: split each headline query's per-call
cost into CONSTRUCTION (calling the query function — Column-tree building
via py4j, plus any eager driver-side setup jobs like collected quantile
cuts or query vectors) and EXECUTION (noop-sink write of the prebuilt
frame). Construction is paid on EVERY call by every caller — the round-12
ann_ivf_topk finding: 1.4 s of py4j expression-construction dwarfed the
0.4 s execution until the tree became one F.expr parse.

Usage: python tools/construction_audit.py [sf_dir]
Writes a markdown table to stdout, sorted by construction time.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as entrymod
    from airflow_ml_pipeline_spark.session import get_spark
    from bench import HEADLINE, warm_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("construction-audit", master="local[32]")
    qs = entrymod.queries()
    warm_session(spark, sf_dir, qs)

    rows = []
    for name in [n for n in HEADLINE if n in qs]:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_con = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exe = time.time() - t0
        rows.append((name, t_con, t_exe))
        print(f"# {name}: construct {t_con:.2f}s exec {t_exe:.2f}s",
              file=sys.stderr)

    rows.sort(key=lambda r: -r[1])
    print("| query | construct (s) | exec (s) | construct share |")
    print("|---|---|---|---|")
    for name, t_con, t_exe in rows:
        tot = t_con + t_exe
        print(f"| {name} | {t_con:.2f} | {t_exe:.2f} |"
              f" {100 * t_con / tot:.0f}% |")


if __name__ == "__main__":
    main()
