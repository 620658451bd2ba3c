"""A/B triage for heavy-row drifts.

Round-10 addition — the bench-context mode this tool was missing:

    python tools/ab_heavy.py bench_context [reps]

runs bench.py in SPARK_GRAFT_BENCH_HEAVY_ONLY mode (short fixed
warmup standing in for the 124-query suite; spec64 / hub-stress /
20x-corpus / streaming tiers off) `reps` times in FRESH processes and
prints each run's s20/s22 heavy rows plus their task-total/CPU
companions. ~2-3 min per arm instead of ~10; measures the rows in
(approximate) bench context, which the r8/r9 lesson showed
fresh-session single-row arms cannot (2.4x off even warm). Run it
ALONE — measurement jobs on this box share 32 cores with nothing.

Original fresh-session single-row modes below (kept for the cases
where the question is "is the operator itself slower", not "is the
bench row slower"):

Driver r7→r8: `bfs_s22` 32.8 → 40.1s (+22%) and `hub_k_truss_s14`
12.3 → 14.4s (+17%) while neither operator's code changed in round 8
(the s22 CONSTRUCTION row actually improved 41.5 → 38.3s). The prior
is the documented session-context class (the heavy tier runs after
~115 headline queries in the same JVM; the r7 streaming A/B traced an
identical-looking dip to exactly that), but per the round-7/8 lesson
that class is claimed only after an isolated measurement.

This tool runs ONE row in a FRESH session (driver heap 16g, matching
bench.py) with no preceding work, 2 timed reps (min reported, matching
the bench's min-of-N convention for steady rows; the s22 arm also
reports each rep since BFS there is single-shot in the bench):

    python tools/ab_heavy.py bfs_s22
    python tools/ab_heavy.py hub_k_truss_s14

Interpretation: fresh-session time ≈ r7's driver value → the r8 drift
is session context (same cause class as the r7 streaming dip);
fresh-session time ≈ r8's drifted value → a real regression to chase.
Results recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _bench_context(reps: int) -> int:
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_HEAVY_ONLY="1",
        SPARK_GRAFT_BENCH_HEAVY24="0",
        SPARK_GRAFT_BENCH_SPEC64="0",
        SPARK_GRAFT_BENCH_HUBSTRESS="0",
        SPARK_GRAFT_BENCH_HEAVY20X="0",
        SPARK_GRAFT_BENCH_STREAMING="0",
    )
    for rep in range(reps):
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            cwd=repo,
        )
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            return 1
        data = json.loads(line)
        print(
            json.dumps(
                {
                    "rep": rep,
                    "arm_wall_sec": round(time.monotonic() - t0, 1),
                    "heavy": data["heavy"],
                }
            )
        )
    return 0


def main() -> int:
    row = sys.argv[1] if len(sys.argv) > 1 else "hub_k_truss_s14"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if row == "bench_context":
        return _bench_context(reps)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from graph500_spark.session import get_spark

    spark = get_spark(app_name=f"ab-heavy-{row}")
    spark.sparkContext.setLogLevel("ERROR")

    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.sources.generator import generate_kronecker_edges

    times: list[float] = []
    out: dict[str, object] = {"row": row, "fresh_session": True}
    if row == "bfs_s22":
        from graph500_spark.operators.bfs import bfs
        from graph500_spark.operators.roots import find_roots

        t0 = time.monotonic()
        raw = generate_kronecker_edges(spark, 22, 16).persist()
        raw.count()
        g = build_clean_edges(raw).persist()
        g.count()
        construct = time.monotonic() - t0
        for _ in range(reps):
            t0 = time.monotonic()
            root = find_roots(spark, raw, 1 << 22, num_roots=1)[0]
            pred = bfs(spark, g, root).persist()
            pred.count()
            times.append(round(time.monotonic() - t0, 3))
            pred.unpersist()
        out["construct_sec"] = round(construct, 3)
    elif row == "hub_k_truss_s14":
        from graph500_spark.operators.triangles import k_truss

        g = build_clean_edges(
            generate_kronecker_edges(spark, 14, 16)
        ).persist()
        g.count()
        for _ in range(reps):
            t0 = time.monotonic()
            k_truss(g, k=4).count()
            times.append(round(time.monotonic() - t0, 3))
    else:
        raise SystemExit(f"unknown row: {row}")

    out["reps_sec"] = times
    out["min_sec"] = min(times)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
