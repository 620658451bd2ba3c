"""Stage-attributed profile of the 20x corpus heavy rows
(exact_dedup_20x / minhash_near_dup_20x / corpus_clean_20x) in the
bench's own input shape (docs20 persisted + counted before timing).

Usage: python tools/profile_corpus20.py [--sf SF_DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=6)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from pyspark.sql import functions as F

    from graph500_spark.operators import corpus as corpus_mod
    from graph500_spark.operators import dedup
    from graph500_spark.session import get_spark
    from tools.profile_query import job_mark, rest, stage_mark

    spark = get_spark(app_name="profile-corpus20")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
    n_docs = docs.count()
    replicas = spark.range(20).select(F.col("id").alias("rep"))
    docs20 = (
        docs.crossJoin(F.broadcast(replicas))
        .select(
            (F.col("doc_id") + F.col("rep") * (n_docs * 2)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .persist()
    )
    docs20.count()

    shots = {
        "exact_dedup_20x": lambda: dedup.exact_duplicates(docs20).count(),
        "minhash_near_dup_20x": lambda: dedup.minhash_near_duplicates(
            docs20
        ).count(),
        "corpus_clean_20x": lambda: corpus_mod.corpus_clean(docs20).count(),
    }
    for name, fn in shots.items():
        best = None
        for _ in range(args.reps):
            jm, sm = job_mark(spark), stage_mark(spark)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            fn()
            wall = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            stages = [
                s
                for s in rest(spark, "stages?status=complete")
                if s["stageId"] > sm
            ]
            jobs = [j for j in rest(spark, "jobs") if j["jobId"] > jm]
            rec = {
                "wall": wall,
                "jobs": len(jobs),
                "run": sum(s.get("executorRunTime", 0) for s in stages) / 1e3,
                "cpu": sum(s.get("executorCpuTime", 0) for s in stages) / 1e9,
                "shr": sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6,
                "slow": sorted(
                    (
                        (
                            round(s.get("executorRunTime", 0) / 1e3, 2),
                            round(s.get("executorCpuTime", 0) / 1e9, 2),
                            s["stageId"],
                            s.get("numCompleteTasks", 0),
                        )
                        for s in stages
                    ),
                    reverse=True,
                )[: args.top],
            }
            if best is None or wall < best["wall"]:
                best = rec
        print(
            f"== {name}: wall {best['wall']:.2f}s jobs {best['jobs']}"
            f" task_run {best['run']:.1f}s task_cpu {best['cpu']:.1f}s"
            f" shufR {best['shr']:.1f}MB"
        )
        for run_s, cpu_s, sid, nt in best["slow"]:
            print(
                f"    stage {sid:>5}  run {run_s:>8.2f}s  cpu {cpu_s:>8.2f}s"
                f"  tasks={nt}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
