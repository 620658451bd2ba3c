"""A/B harness for the truncate_plan stats-clean rewrap (PLANS.md round 7).

Runs the five iterative entries that regressed in the committed local
bench between r05 and r06 (k_truss, sssp, maximal_independent_set,
connected_components, modularity) at a given SF, three timed repetitions
each, in ONE fresh JVM, and prints a JSON line.  Run it twice — once with
SPARK_GRAFT_PLANTRUNC=off (plain eager localCheckpoint, stats propagated)
and once without (stats-clean rewrap) — each in its own process so the
JVM state is comparable:

    SPARK_GRAFT_PLANTRUNC=off python tools/ab_plantrunc.py /root/testdata/sf0.1
    python tools/ab_plantrunc.py /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time


ENTRIES = [
    "modularity",
    "connected_components",
    "sssp",
    "maximal_independent_set",
    "k_truss",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from graph500_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # one untimed warmup of a cheap query so session/codegen startup
    # isn't charged to the first entry
    qs["degrees"](spark, sf_dir).count()
    out: dict[str, list[float]] = {}
    for name in ENTRIES:
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = times
    print(
        json.dumps(
            {
                "mode": os.environ.get("SPARK_GRAFT_PLANTRUNC", "rewrap")
                or "rewrap",
                "sf_dir": sf_dir,
                "times": out,
                "min": {k: min(v) for k, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
