"""A/B triage for the round-8 heavy-row drifts.

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


def main() -> int:
    row = sys.argv[1] if len(sys.argv) > 1 else "hub_k_truss_s14"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
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
