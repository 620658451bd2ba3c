"""A/B the constructed-cache layout for the hub graphlet machinery.

Round 12 changed build_clean_edges to dedup-first + in-partition
explode symmetrize; the hub_s14 rows' task_cpu rose above the
baseline three-run envelope while the census/four-cycle CODE was
byte-unchanged. This decides whether the new cache layout (canonical
-pair-hash partitioning, both orientations co-located) is the cause:
one session, same code, g14 built BOTH ways (new pipeline vs the old
dedup(symmetrize(...)) order, both persisted), graphlet_census_4 and
four_cycle_count timed over each arm interleaved.

Usage: python tools/ab_census_layout.py [reps]
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
from graph500_spark.operators.graphlets import graphlet_census_4  # noqa: E402
from graph500_spark.operators.triangles import four_cycle_count  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-census-layout")
    spark.sparkContext.setLogLevel("ERROR")

    raw = generate_kronecker_edges(spark, 14, 16)
    arms = {
        "new": gb.build_clean_edges(raw).persist(),
        "old": gb.dedup_edges(
            gb.symmetrize(gb.remove_self_loops(raw))
        ).persist(),
    }
    for name, g in arms.items():
        n = g.count()
        print(f"arm {name}: rows={n} partitions={g.rdd.getNumPartitions()}",
              flush=True)

    rows = [
        ("census", lambda g: len(graphlet_census_4(g).collect())),
        ("four_cycle", lambda g: len(four_cycle_count(g).collect())),
    ]
    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for rname, fn in rows:
            for aname in ("new", "old"):
                spark.sparkContext._jvm.System.gc()
                t0 = time.monotonic()
                out = fn(arms[aname])
                dt = time.monotonic() - t0
                results.setdefault((rname, aname), []).append(dt)
                print(f"rep{rep} {rname} arm={aname}: {dt:.2f}s n={out}",
                      flush=True)
    print("---- summary (min / all)")
    for rname, _ in rows:
        for aname in ("new", "old"):
            r = results[(rname, aname)]
            print(f"{rname:11s} arm={aname}  min {min(r):6.2f}s  "
                  + " ".join(f"{x:.2f}" for x in r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
