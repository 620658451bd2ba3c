"""Snapshot .explain('formatted') for queries() entries.

Usage:
    python tools/snap_plans.py --out plans/r12 --suffix _before \
        [--sf SF_DIR] name [name ...]

Writes <out>/<name><suffix>.txt. Iterative operators execute their
driver loop while the DataFrame is being built; the captured plan is
the final-state plan (the loop structure is in the operator source).
Special names: 'construction' maps to q_clean_edges.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from graph500_spark.session import get_spark
    from graph500_spark.plans import queries as Q

    spark = get_spark(app_name="snap-plans")
    spark.sparkContext.setLogLevel("ERROR")
    Q.hetero_edges(spark, args.sf).count()
    Q.clean_hetero_graph(spark, args.sf)
    Q.clean_mod997_graph(spark, args.sf)
    Q.directed_mod997_graph(spark, args.sf)

    os.makedirs(args.out, exist_ok=True)
    alias = {"construction": "clean_edges"}
    for name in args.names:
        fn = getattr(Q, f"q_{alias.get(name, name)}", None)
        if fn is None:
            print(f"SKIP {name}")
            continue
        df = fn(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
