"""Plan-scalability evidence from Spark event logs.

The sandbox VM caps sustained CPU at ~2 cores regardless of vCPU count
(see BENCH/BASELINE.md forensics), so wall-clock N-vs-4N comparisons
measure the host quota, not the engine. What CAN be measured honestly:

1. **Task-time balance** — a job scales to more executors iff its work is
   evenly sharded. We report per-stage task counts, total task time, and
   the max/median task-time ratio (straggler factor) for the index build.
2. **Skew defusal** — the same build with n_buckets=1 (no doc-range salt)
   vs n_buckets=32: the head-term stage's straggler factor shows the salt
   working (SURVEY §2.2 P2).
3. **Serial fraction** — wall time not covered by any running task ≈ the
   Amdahl serial component (driver planning + commit).

Usage: python scripts/task_metrics.py [--docs 160000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> dict:
    stages: dict[int, dict] = {}
    intervals: list[tuple[int, int]] = []
    app_start = app_end = None
    paths = []
    for base, _, names in os.walk(log_dir):
        paths += [os.path.join(base, n) for n in names if "appstatus" not in n]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    tm = ev.get("Task Metrics") or {}
                    run = tm.get("Executor Run Time", 0)
                    s = stages.setdefault(sid, {"tasks": 0, "run_ms": 0, "task_ms": []})
                    s["tasks"] += 1
                    s["run_ms"] += run
                    s["task_ms"].append(run)
                    if ti:
                        intervals.append((ti["Launch Time"], ti["Finish Time"]))
                elif et == "SparkListenerApplicationStart":
                    app_start = ev["Timestamp"]
                elif et == "SparkListenerApplicationEnd":
                    app_end = ev["Timestamp"]
    # serial fraction: wall not covered by ≥1 running task
    covered = 0
    if intervals:
        intervals.sort()
        cur_s, cur_e = intervals[0]
        for s, e in intervals[1:]:
            if s > cur_e:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
    wall = (app_end - app_start) if (app_start and app_end) else None
    out_stages = []
    for sid, s in sorted(stages.items()):
        ts = sorted(s["task_ms"])
        med = ts[len(ts) // 2] if ts else 0
        out_stages.append(
            {
                "stage": sid,
                "tasks": s["tasks"],
                "total_task_sec": round(s["run_ms"] / 1000, 1),
                "max_task_sec": round(max(ts) / 1000, 2) if ts else 0,
                "median_task_sec": round(med / 1000, 2),
                "straggler_factor": round(max(ts) / med, 2) if med else None,
            }
        )
    return {
        "stages": out_stages,
        "wall_sec": round(wall / 1000, 1) if wall else None,
        "task_covered_sec": round(covered / 1000, 1),
        "serial_sec": round((wall - covered) / 1000, 1) if wall else None,
        "total_task_sec": round(sum(s["total_task_sec"] for s in out_stages), 1),
    }


def run_build(docs_path: str, n_buckets: int, cpus: int = 8) -> dict:
    from conveyorbelt_spark.index.build import build_index
    from conveyorbelt_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="cb_evlog_")
    idx = tempfile.mkdtemp(prefix="cb_tm_idx_")
    spark = get_spark(
        f"taskmetrics-{n_buckets}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    try:
        build_index(spark, spark.read.parquet(docs_path), idx, n_buckets=n_buckets)
    finally:
        spark.stop()
        shutil.rmtree(idx, ignore_errors=True)
    out = parse_event_log(log_dir)
    shutil.rmtree(log_dir, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=160000)
    ap.add_argument("--corpus", default="/tmp/cb_tm_corpus")
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 32])
    args = ap.parse_args()

    if not os.path.isdir(args.corpus):
        from conveyorbelt_spark.corpus import corpus_spark_df
        from conveyorbelt_spark.session import get_spark

        spark = get_spark("tm-gen", master="local[8]")
        corpus_spark_df(spark, args.docs, seed=42, n_parts=64).write.parquet(args.corpus)
        spark.stop()

    results = {}
    for nb in args.buckets:
        results[f"n_buckets={nb}"] = run_build(args.corpus, nb)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
