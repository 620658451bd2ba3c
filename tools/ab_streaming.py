"""A/B triage for the round-7 streaming-throughput regression.

Driver r6→r7: corpus ingest 8,216.6 → 6,929.7 docs/s (−15.7%), edge
ingest 322.3k → 304.7k rows/s (−5.5%). Candidate causes named by the
round-7 verdict: (a) the monitor idle-timeout re-arm (not on the
ingest path — streaming/monitor.py is not imported by either ingest
pipeline), (b) the bench heap change 8g → 16g (bench.py round 7),
(c) session context (the streaming tier runs LAST in bench.py, after
~115 queries + s22 + spec64 + hub-stress in the same JVM).

This tool isolates (b) from (c): it runs bench._streaming_tier alone
in a FRESH session at a given heap size. Invoke once per arm (fresh
process per run — heap is fixed at JVM launch):

    python tools/ab_streaming.py 8g
    python tools/ab_streaming.py 16g

If fresh-session rates match r6 at BOTH heaps, the regression is
session-age context (cause c); if 16g-fresh is slower than 8g-fresh,
it is the heap change (cause b). Results recorded in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    heap = sys.argv[1] if len(sys.argv) > 1 else "16g"
    pressured = len(sys.argv) > 2 and sys.argv[2] == "pressured"
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from graph500_spark.session import get_spark
    import bench

    spark = get_spark(app_name=f"ab-streaming-{heap}")
    spark.sparkContext.setLogLevel("ERROR")

    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.sources.generator import generate_kronecker_edges

    kron16 = build_clean_edges(
        generate_kronecker_edges(spark, 16, 16)
    ).persist()
    kron16.count()

    if pressured:
        # round 12: reproduce the bench-suite context the tier runs in
        # (tier runs LAST after ~136 queries) with a representative
        # slice of the preceding headline work, untimed — if the
        # corpus-stream task_cpu inflates here on identical code, the
        # driver r11 "both up" reading is session context, not an
        # ingest-path regression
        from graph500_spark.plans import queries as Q

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        for name in (
            "q_corpus_clean",
            "q_exact_duplicates",
            "q_minhash_near_duplicates",
            "q_pagerank",
            "q_connected_components",
            "q_triangle_counts",
            "q_louvain_multilevel",
            "q_bpe_fertility_by_lang",
            "q_cosine_topk",
            "q_bm25_prf",
        ):
            getattr(Q, name)(spark, sf_dir).count()

    rates = bench._streaming_tier(spark, kron16)
    print(
        json.dumps(
            {
                "heap": heap,
                "fresh_session": True,
                "pressured": pressured,
                **rates,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
