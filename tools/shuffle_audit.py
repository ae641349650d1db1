"""Shuffle-economy audit: run declared queries with the Spark event log
enabled and report measured rows/bytes — input read, shuffle write,
spill — per query. PLANS.md proves the plan SHAPE (what shuffles); this
measures the plan ECONOMY (how much), the number that actually decides
100 TB viability: a query whose shuffle-write is a small fraction of its
input is shipping aggregates/fingerprints, not data.

One SparkSession for all queries (event log keyed by job group), parsed
from the JSON event log after stop. Writes a markdown table to stdout;
paste into SCALING.md. ``--json PATH`` additionally writes the raw
per-query metrics for machine consumption (tests/test_shuffle_economy.py
runs this tool as a subprocess — event logging is a SparkContext-creation
option, so the audit needs its own JVM, not the shared test session).

Default query set (round 9, VERDICT r8 ask #5): EVERY declared query
except the ``stream_*`` family — Structured Streaming micro-batch jobs
are submitted from the stream execution thread, which does not inherit
the caller's thread-local job group, so their stages cannot be
attributed per-query here (their scale posture is measured by
tools/ingest_scale_bench.py instead).

Usage: python tools/shuffle_audit.py [--json PATH] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_names() -> list[str]:
    import __spark_entry__ as entrymod

    return [n for n in entrymod.queries() if not n.startswith("stream_")]


def run_audit(sf_dir: str, names: list[str]) -> dict[str, dict[str, int]]:
    """Run ``names`` under an event-logged session and return per-query
    {input_rows, shuffle_rows, shuffle_write, spill}. Creates and stops
    its own SparkSession — call from a fresh process (event logging is a
    context-creation config; getOrCreate on an existing context would
    silently not log)."""
    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("shuffle_audit")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    from airflow_ml_pipeline_spark.session import tune

    tune(spark)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sc = spark.sparkContext
    for name in names:
        sc.setJobGroup(name, name)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc.setJobGroup("", "")
    app_id = sc.applicationId
    spark.stop()

    # parse the event log: job group property -> job -> stages -> metrics.
    # Spark 4 writes a rolling v2 layout: eventlog_v2_<appid>/events_*.zstd
    events_paths: list[str] = []
    flat = os.path.join(log_dir, app_id)
    v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isfile(flat):
        events_paths = [flat]
    elif os.path.isdir(v2):
        events_paths = sorted(
            os.path.join(v2, f)
            for f in os.listdir(v2)
            if f.startswith("events_")
        )
    else:
        raise SystemExit(f"no event log for {app_id} under {log_dir}")
    stage_to_group: dict[int, str] = {}
    metrics: dict[str, dict[str, int]] = {
        n: {
            "input_rows": 0,
            "shuffle_rows": 0,
            "shuffle_write": 0,
            "spill": 0,
        }
        for n in names
    }
    events = []
    for path in events_paths:
        with open(path) as f:
            lines = f.read().splitlines()
        events.extend(json.loads(line) for line in lines if line.strip())
    for e in events:
        if e.get("Event") == "SparkListenerJobStart":
            group = (e.get("Properties") or {}).get("spark.jobGroup.id", "")
            for sid in e.get("Stage IDs", []):
                if group in metrics:
                    stage_to_group[sid] = group
    for e in events:
        if e.get("Event") != "SparkListenerStageCompleted":
            continue
        info = e["Stage Info"]
        group = stage_to_group.get(info["Stage ID"])
        if group is None:
            continue
        m = metrics[group]
        # per-stage totals live in the accumulables list. Row counts are
        # the robust economy metric (byte counters vary with codec and
        # OS-cache behavior across scan implementations).
        for acc in info.get("Accumulables", []):
            nm, val = acc.get("Name"), acc.get("Value")
            if not isinstance(val, int):
                continue
            if nm == "internal.metrics.input.recordsRead":
                m["input_rows"] += val
            elif nm == "internal.metrics.shuffle.write.recordsWritten":
                m["shuffle_rows"] += val
            elif nm == "internal.metrics.shuffle.write.bytesWritten":
                m["shuffle_write"] += val
            elif nm in (
                "internal.metrics.memoryBytesSpilled",
                "internal.metrics.diskBytesSpilled",
            ):
                m["spill"] += val
    return metrics


def main() -> None:
    args = sys.argv[1:]
    json_path = None
    if args and args[0] == "--json":
        json_path = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or default_names()

    metrics = run_audit(sf_dir, names)

    def mb(x: int) -> str:
        return f"{x / 1048576:.1f}"

    print(
        "| query | rows read | rows shuffled | shuffled/read "
        "| shuffle MB | spill MB |"
    )
    print("|---|---|---|---|---|---|")
    for n in names:
        m = metrics[n]
        ratio = (
            m["shuffle_rows"] / m["input_rows"] if m["input_rows"] else 0.0
        )
        print(
            f"| {n} | {m['input_rows']} | {m['shuffle_rows']} | {ratio:.3f} "
            f"| {mb(m['shuffle_write'])} | {mb(m['spill'])} |"
        )
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": metrics}, f, indent=1)


if __name__ == "__main__":
    main()
