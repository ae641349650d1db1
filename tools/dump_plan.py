"""Dump `.explain("formatted")` for named declared queries to files.

Usage: python tools/dump_plan.py OUTDIR name [name ...]

Writes OUTDIR/<name>.txt. Construction only — no job is executed (the
lazy localCheckpoints inside query constructors may run tiny pin jobs,
matching how every real caller constructs the plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    from airflow_ml_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dump_plan", master=f"local[{cpus}]")
    qs = entrymod.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()
