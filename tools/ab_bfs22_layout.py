"""A/B the constructed-cache layout for bfs_s22 — at s22 itself.

Round-12 close-out: the three same-day opt-round bench runs showed
bfs_s22 task_total above the baseline (998 -> 1326/1598/1850 s) with
task_cpu straddling it (757 -> 1025/699/1381) on byte-unchanged
traversal code. tools/ab_census_layout.py already cleared the new
construction layout at s14 for the graphlet machinery; this tool asks
the same question at the exact scale and operator of the flagged row:
one session, raw s22 edges generated once, g22 built BOTH ways (new
dedup-first + in-partition explode symmetrize vs the pre-round
dedup(symmetrize(...)) order), both persisted, and the bench's own
BFS (same find_roots root) timed over each arm interleaved.

Usage: python tools/ab_bfs22_layout.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from graph500_spark.session import get_spark  # noqa: E402
from graph500_spark.sources.generator import generate_kronecker_edges  # noqa: E402
from graph500_spark.operators import graph_build as gb  # noqa: E402
from graph500_spark.operators.bfs import bfs  # noqa: E402
from graph500_spark.operators.roots import find_roots  # noqa: E402
from graph500_spark.operators.validate import edge_visit_count  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-bfs22-layout")
    spark.sparkContext.setLogLevel("ERROR")

    raw = generate_kronecker_edges(spark, 22, 16).persist()
    n_raw = raw.count()
    print(f"raw s22 edges: {n_raw}", flush=True)

    arms = {
        "new": gb.build_clean_edges(raw).persist(),
        "old": gb.dedup_edges(
            gb.symmetrize(gb.remove_self_loops(raw))
        ).persist(),
    }
    for name, g in arms.items():
        t0 = time.monotonic()
        n = g.count()
        dt = time.monotonic() - t0
        print(
            f"arm {name}: rows={n} partitions={g.rdd.getNumPartitions()}"
            f" build+count {dt:.1f}s",
            flush=True,
        )

    root = find_roots(spark, raw, 1 << 22, num_roots=1)[0]
    print(f"root: {root}", flush=True)

    # Alternate arm order between reps: on this box the SECOND arm of
    # an interleaved pair systematically wins (measured — a fixed
    # new->old order showed old winning all pairs; reversing the order
    # flipped it), so a fixed order biases the comparison.
    results: dict[str, list[float]] = {}
    for rep in range(reps):
        order = ("new", "old") if rep % 2 == 0 else ("old", "new")
        for aname in order:
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            pred = bfs(spark, arms[aname], root).persist()
            n = pred.count()
            dt = time.monotonic() - t0
            results.setdefault(aname, []).append(dt)
            ec = edge_visit_count(raw, pred).collect()[0][
                "edge_visit_count"
            ]
            pred.unpersist()
            print(
                f"rep{rep} arm={aname}: {dt:.2f}s pred_rows={n} "
                f"edge_visits={ec} golden_ok={ec == 67_108_130}",
                flush=True,
            )
    print("---- summary (min / all)")
    for aname in ("new", "old"):
        r = results[aname]
        print(
            f"bfs_s22 arm={aname}  min {min(r):6.2f}s  "
            + " ".join(f"{x:.2f}" for x in r)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
