"""Per-query job/stage/task profile at a given SF (guide §1, §7.1).

The round-10 sf0.01-vs-sf0.1 sidecar pair showed ~2/3 of the sf0.1
bench wall is scale-INDEPENDENT per-query cost (162 queries: 107 s at
sf0.01 vs 146 s at sf0.1), i.e. stage/task scheduling and driver-side
work, not data compute. This tool attributes that constant: for each
declared query it records builder wall (plan construction, outside the
bench's timed window for non-eager queries), noop-sink execution wall,
and the number of Spark jobs / stages / tasks the action launched (via
SparkStatusTracker), so "too many tiny stages" is measurable per query
instead of inferred from plan dumps.

Usage:
    python tools/profile_queries.py --sf-dir /root/testdata/sf0.1 [names...]
    python tools/profile_queries.py --top 25            # 25 slowest from a sidecar
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mdio_python_spark.plans.registry import registry  # noqa: E402
from mdio_python_spark.session import get_spark  # noqa: E402


def _job_ids(tracker) -> set[int]:
    return set(tracker.getJobIdsForGroup(None) or [])


def _stage_task_counts(tracker, job_ids) -> tuple[int, int]:
    stages = 0
    tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            stages += 1
            si = tracker.getStageInfo(sid)
            if si is not None:
                tasks += si.numTasks
    return stages, tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N slowest queries from --sidecar")
    ap.add_argument("--sidecar", default="BENCH_detail_20260817T103715Z-6465.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="runtime SQL conf override (repeatable), e.g. "
                         "--set spark.sql.adaptive.coalescePartitions."
                         "parallelismFirst=false")
    ap.add_argument("names", nargs="*")
    ns = ap.parse_args()

    regs = registry()
    names = ns.names
    if ns.top:
        side = json.load(open(Path(__file__).resolve().parents[1] / ns.sidecar))
        names = [k for k, _ in sorted(side["queries"].items(),
                                      key=lambda kv: -kv[1])[: ns.top]]
    if not names:
        names = list(regs)

    spark = get_spark("mdio-profile")
    for kv in ns.set:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    warm = "/root/testdata/sf0.001"
    if not Path(warm).is_dir():
        warm = ns.sf_dir

    rows = {}
    for name in names:
        spec = regs[name]
        try:
            spec.fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warm ERROR {exc}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        best = None
        for _ in range(ns.runs):
            before = _job_ids(tracker)
            t0 = time.perf_counter()
            df = spec.fn(spark, ns.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            after = _job_ids(tracker)
            new = after - before
            stages, tasks = _stage_task_counts(tracker, new)
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "timed_s": round((t2 - t0) if spec.eager else (t2 - t1), 3),
                "jobs": len(new),
                "stages": stages,
                "tasks": tasks,
                "eager": spec.eager,
            }
            if best is None or rec["timed_s"] < best["timed_s"]:
                best = rec
            spark.catalog.clearCache()
            sc._jvm.System.gc()
        rows[name] = best
        print(f"{name}: build {best['build_s']:.2f}s exec {best['exec_s']:.2f}s "
              f"jobs {best['jobs']} stages {best['stages']} tasks {best['tasks']}",
              file=sys.stderr)

    print(json.dumps({"sf_dir": ns.sf_dir, "queries": rows}, indent=1))
    if ns.out:
        json.dump({"sf_dir": ns.sf_dir, "queries": rows}, open(ns.out, "w"),
                  indent=1)


if __name__ == "__main__":
    main()
