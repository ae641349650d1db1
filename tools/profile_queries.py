"""Per-query job/stage profiler (optimization-round measurement aid).

Runs named declared queries under the bench regime (same warmup, same
noop-sink action) with the Spark event log enabled and each query's jobs
labelled via ``setJobDescription``; then parses the event log and prints,
per query: wall time, job count, summed job time, task count, shuffle
read/write bytes, and the slowest stages — the local[32]/sf0.1 stand-in
for the Spark UI's Stages page (guide §1.1/§1.5/§7.1).

Usage:
    python tools/profile_queries.py [--top N] [name ...]

``--top N`` profiles the N slowest queries from the committed
bench_results.json in addition to any explicit names.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the run; parse the existing event log "
                         "(wall times reported as 0)")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench_results.json")) as f:
            prev = json.load(f)["queries"]
        for n, _ in sorted(prev.items(), key=lambda kv: -kv[1])[: args.top]:
            if n not in names:
                names.append(n)

    walls: dict[str, float] = {name: 0.0 for name in names}
    if not args.parse_only:
        os.makedirs(EVDIR, exist_ok=True)
        import shutil

        for old in glob.glob(f"{EVDIR}/*"):
            shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)

        from airflow_ml_pipeline_spark.session import get_spark

        import __spark_entry__ as entrymod

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = get_spark(
            "profile",
            master=f"local[{cpus}]",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": EVDIR,
            },
        )
        qs = entrymod.queries()
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

        from bench import warm_session

        warm_session(spark, args.sf, qs)

        sc = spark.sparkContext
        for name in names:
            sc.setJobDescription(f"profile:{name}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            walls[name] = round(time.time() - t0, 3)
            sc.setJobDescription(None)
        spark.stop()

    # ---- parse the event log ----
    # Spark 4 rolling layout: a directory eventlog_v2_<app>/ holding
    # events_<n>_<app> part files (+ appstatus marker); older layouts are
    # a single file. Collect every part file.
    roots = glob.glob(f"{EVDIR}/*")
    parts: list[str] = []
    for r in roots:
        if os.path.isdir(r):
            parts.extend(
                p for p in sorted(glob.glob(f"{r}/events_*"))
                if not p.endswith(".inprogress")
            )
        elif not r.endswith(".inprogress"):
            parts.append(r)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_owner: dict[int, str] = {}
    tasks_per_stage: dict[int, int] = {}
    sread: dict[int, int] = {}
    swrite: dict[int, int] = {}
    def _lines():
        import io
        import subprocess

        for p in parts:
            if p.endswith(".zstd"):
                proc = subprocess.Popen(
                    ["zstd", "-dc", p], stdout=subprocess.PIPE)
                assert proc.stdout is not None
                yield from io.TextIOWrapper(proc.stdout)
                proc.wait()
            else:
                with open(p) as f:
                    yield from f

    for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "") or ""
                if not desc.startswith("profile:"):
                    continue
                q = desc[len("profile:"):]
                jid = ev["Job ID"]
                jobs[jid] = {"q": q, "t0": ev["Submission Time"]}
                for sid in ev.get("Stage IDs", []):
                    stage_owner[sid] = q
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                if sid in stage_owner and "Completion Time" in si:
                    stages[sid] = {
                        "q": stage_owner[sid],
                        "ms": si["Completion Time"] - si.get(
                            "Submission Time", si["Completion Time"]),
                        "name": si.get("Stage Name", "")[:60],
                        "ntasks": si.get("Number of Tasks", 0),
                    }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                if sid not in stage_owner:
                    continue
                tm = ev.get("Task Metrics") or {}
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                sread[sid] = sread.get(sid, 0) + srm.get(
                    "Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                swrite[sid] = swrite.get(sid, 0) + swm.get(
                    "Shuffle Bytes Written", 0)
                tasks_per_stage[sid] = tasks_per_stage.get(sid, 0) + 1

    report: dict[str, dict] = {}
    for name in names:
        qjobs = [j for j in jobs.values() if j["q"] == name and "t1" in j]
        qstages = {sid: s for sid, s in stages.items() if s["q"] == name}
        report[name] = {
            "wall_s": walls[name],
            "n_jobs": len(qjobs),
            "job_time_s": round(
                sum(j["t1"] - j["t0"] for j in qjobs) / 1000.0, 3),
            "n_stages": len(qstages),
            "n_tasks": sum(s["ntasks"] for s in qstages.values()),
            "stage_time_s": round(
                sum(s["ms"] for s in qstages.values()) / 1000.0, 3),
            "shuffle_read_mb": round(sum(
                sread.get(sid, 0) for sid in qstages) / 1e6, 2),
            "shuffle_write_mb": round(sum(
                swrite.get(sid, 0) for sid in qstages) / 1e6, 2),
            "top_stages": [
                {"ms": s["ms"], "ntasks": s["ntasks"], "name": s["name"]}
                for s in sorted(
                    qstages.values(), key=lambda s: -s["ms"])[:6]
            ],
        }

    for name, r in sorted(report.items(), key=lambda kv: -kv[1]["wall_s"]):
        print(
            f"\n== {name}: wall {r['wall_s']}s, {r['n_jobs']} jobs "
            f"(sum {r['job_time_s']}s), {r['n_stages']} stages "
            f"(sum {r['stage_time_s']}s), {r['n_tasks']} tasks, "
            f"shuffle R/W {r['shuffle_read_mb']}/{r['shuffle_write_mb']} MB"
        )
        for s in r["top_stages"]:
            print(f"   {s['ms']:>6} ms  {s['ntasks']:>4} tasks  {s['name']}")
    out = "/tmp/profile_report.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"\nfull report: {out}")


if __name__ == "__main__":
    main()
