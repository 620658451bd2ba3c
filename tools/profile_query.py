"""Per-query profiler: run one or more bench/queries() entries in a
fresh session and report, for each, wall seconds, number of jobs,
number of stages, task totals (executorRunTime / executorCpuTime),
shuffle bytes, and the slowest stages — the guide §1 measurement step
in one command.

Usage:
    python tools/profile_query.py [--sf SF_DIR] [--reps N] name [name ...]

Names resolve against plans/queries.py `q_<name>` (called with
(spark, sf_dir) and driven by .count()), after the same construct-once
warmup bench.py does (hetero + mod997 graphs built and cached,
construction reported separately).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request


def rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/{path}", timeout=10
        )
    )


def stage_mark(spark):
    try:
        return max(
            (s["stageId"] for s in rest(spark, "stages?status=complete")),
            default=-1,
        )
    except Exception:
        return -1


def job_mark(spark):
    try:
        return max((j["jobId"] for j in rest(spark, "jobs")), default=-1)
    except Exception:
        return -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=8, help="slowest stages shown")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from graph500_spark.session import get_spark
    from graph500_spark.plans import queries as Q

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")

    # bench-equivalent warmup: construct-once graphs
    Q.hetero_edges(spark, args.sf).count()
    Q.clean_hetero_graph(spark, args.sf)
    Q.clean_mod997_graph(spark, args.sf)
    Q.directed_mod997_graph(spark, args.sf)

    for name in args.names:
        fn = getattr(Q, f"q_{name}", None)
        if fn is None:
            print(f"SKIP {name}: no q_{name}")
            continue
        best = None
        for rep in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            jm = job_mark(spark)
            sm = stage_mark(spark)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            fn(spark, args.sf).count()
            wall = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [j for j in rest(spark, "jobs") if j["jobId"] > jm]
            stages = [
                s
                for s in rest(spark, "stages?status=complete")
                if s["stageId"] > sm
            ]
            run_s = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
            cpu_s = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
            sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
            sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            ntasks = sum(s.get("numCompleteTasks", 0) for s in stages)
            rec = {
                "wall": wall,
                "jobs": len(jobs),
                "stages": len(stages),
                "tasks": ntasks,
                "task_run_s": run_s,
                "task_cpu_s": cpu_s,
                "shuffle_read_mb": sh_r / 1e6,
                "shuffle_write_mb": sh_w / 1e6,
                "slow_stages": sorted(
                    (
                        (
                            round(s.get("executorRunTime", 0) / 1e3, 2),
                            s["stageId"],
                            s.get("numCompleteTasks", 0),
                            (s.get("description") or s.get("name", ""))[:90],
                        )
                        for s in stages
                    ),
                    reverse=True,
                )[: args.top],
            }
            if best is None or wall < best["wall"]:
                best = rec
        print(f"== {name}: wall {best['wall']:.2f}s  jobs {best['jobs']}"
              f"  stages {best['stages']}  tasks {best['tasks']}"
              f"  task_run {best['task_run_s']:.1f}s"
              f"  task_cpu {best['task_cpu_s']:.1f}s"
              f"  shufR {best['shuffle_read_mb']:.1f}MB"
              f"  shufW {best['shuffle_write_mb']:.1f}MB")
        for row in best["slow_stages"]:
            print(f"    stage {row[1]:>5}  {row[0]:>7.2f}s  tasks={row[2]:>4}  {row[3]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
