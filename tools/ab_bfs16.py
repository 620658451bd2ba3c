"""Adjudicate the bfs_s16_4roots pair drift (round-11 verdict watch
item): batched 3.33s (r10) -> 5.0-8.9s in ALL THREE r11 runs on
byte-identical bfs/bfs_multi code. Hypothesis: bench-session
position (cache pressure / scheduler state accumulated by the ~25
headline rows that run before the pair), not a plan or env step.

Two arms in ONE fresh session, mirroring the round-11 A/B discipline:
  A "fresh"    — s12 warmup only, then the pair, 3 reps each;
  B "pressured" — then re-run the pair AFTER a suite-like preload
    (kron s16 reconstruct + the dedup/corpus rows that precede the
    pair in bench order), 3 reps each.
If arm A reproduces r10 (~3.3s batched) and arm B reproduces r11
(5-9s) with task_cpu flat, the drift is measurement context — the
pair's suite position — and the committed r10 number was simply
recorded from a cleaner context. Wall + task trio per rep.

Usage: python tools/ab_bfs16.py  (exclusive box, fresh JVM)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import bench as B
    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.session import get_spark
    from graph500_spark.sources.generator import generate_kronecker_edges

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-bfs16")
    spark.sparkContext.setLogLevel("ERROR")

    # s12 warmup (JIT + codegen), untimed
    build_clean_edges(generate_kronecker_edges(spark, 12, 16)).count()

    kron16 = build_clean_edges(
        generate_kronecker_edges(spark, 16, 16)
    ).persist()
    kron16.count()

    def measure(tag: str, fn) -> dict:
        rows = []
        for rep in range(3):
            spark.sparkContext._jvm.System.gc()
            mark = B._stage_mark(spark)
            t0 = time.monotonic()
            fn()
            wall = round(time.monotonic() - t0, 3)
            run_s, cpu_s = B._task_totals_sec(spark, mark)
            rows.append(
                {"wall": wall, "task_total": run_s, "task_cpu": cpu_s}
            )
        print(tag, json.dumps(rows), flush=True)
        return {"tag": tag, "reps": rows}

    out = []
    # arm A: fresh context
    out.append(
        measure(
            "A_fresh_sequential",
            lambda: B._bfs16_roots_seq(spark, kron16),
        )
    )
    out.append(
        measure(
            "A_fresh_batched",
            lambda: B._bfs16_roots_batched(spark, kron16),
        )
    )

    # suite-like preload: the expensive rows that precede the pair in
    # bench order (cache-pressure generators), untimed
    from graph500_spark.plans import queries as Q

    for name in (
        "q_corpus_clean",
        "q_exact_duplicates",
        "q_minhash_near_duplicates",
        "q_pagerank",
        "q_connected_components",
        "q_triangle_counts",
        "q_cosine_topk",
        "q_hits",
    ):
        getattr(Q, name)(spark, sf_dir).count()
    B._bfs16(spark, kron16)  # the bfs_kron_s16 row that runs just before

    # arm B: pressured context (bench-suite-like)
    out.append(
        measure(
            "B_pressured_sequential",
            lambda: B._bfs16_roots_seq(spark, kron16),
        )
    )
    out.append(
        measure(
            "B_pressured_batched",
            lambda: B._bfs16_roots_batched(spark, kron16),
        )
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
