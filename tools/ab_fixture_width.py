"""A/B the constructed-graph cache width for the hetero BFS family.

One session, same code: builds the cleaned hetero graph twice —
repartition(A, 'src') and repartition(B, 'src') — and times
bfs_full / closeness_sampled / betweenness_sampled over each,
interleaved, reps per arm, reporting min and per-rep walls plus task
totals. Decides the fixture-width question with same-session data
(cross-run comparisons on this box carry ±25% phase noise).

Usage: python tools/ab_fixture_width.py [widthA widthB [reps]]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from graph500_spark.session import get_spark  # noqa: E402
from graph500_spark.plans import queries as Q  # noqa: E402
from graph500_spark.operators import bfs as bfs_mod  # noqa: E402
from graph500_spark.operators import centrality as cent  # noqa: E402
from graph500_spark.operators import graph_build as gb  # noqa: E402


def main() -> int:
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="ab-fixture-width")
    spark.sparkContext.setLogLevel("ERROR")

    base = gb.build_clean_edges(Q.hetero_edges(spark, sf))
    arms = {}
    for w in (a, b):
        g = base.repartition(w, "src").persist()
        g.count()
        arms[w] = g

    def bfs_full(g, sp):
        return bfs_mod.bfs(
            spark, g, Q.BFS_ROOT, prepartition=False, shuffle_partitions=sp
        ).count()

    def closeness(g, sp):
        return bfs_mod.harmonic_closeness_sampled(
            spark, g, Q.MULTI_BFS_ROOTS,
            prepartition=False, shuffle_partitions=sp,
        ).count()

    def betweenness(g, sp):
        return cent.betweenness_sampled(
            spark, g, Q.MULTI_BFS_ROOTS, shuffle_partitions=sp
        ).count()

    rows = [("bfs_full", bfs_full), ("closeness", closeness),
            ("betweenness", betweenness)]
    results: dict[tuple[str, int], list[float]] = {}
    for rep in range(reps):
        for name, fn in rows:
            for w in (a, b):
                # per-level shuffle width rides the arm width
                spark.sparkContext._jvm.System.gc()
                t0 = time.monotonic()
                n = fn(arms[w], w)
                dt = time.monotonic() - t0
                results.setdefault((name, w), []).append(dt)
                print(f"rep{rep} {name} width={w}: {dt:.2f}s rows={n}",
                      flush=True)
    print("---- summary (min / all)")
    for name, _ in rows:
        for w in (a, b):
            r = results[(name, w)]
            print(f"{name:12s} width={w:3d}  min {min(r):6.2f}s  "
                  + " ".join(f"{x:.2f}" for x in r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
