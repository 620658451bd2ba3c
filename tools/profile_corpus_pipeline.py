"""Per-STAGE profile of the staged corpus pipeline heavy row
(`corpus_pipeline_20x`) — guide §1 measurement for the round-12
"Not yet optimized" item #4. Builds docs20 exactly as bench.py does
(20x-replicated sf corpus, repartition(32), persisted + counted as
input prep) and runs `run_corpus_pipeline` into a fresh temp dir per
rep, reporting each stage's wall seconds (now recorded by the runner
itself) plus UI-REST job/stage deltas per stage boundary.

Usage: python tools/profile_corpus_pipeline.py [--sf SF_DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from pyspark.sql import functions as F

    from graph500_spark.plans.corpus_runner import run_corpus_pipeline
    from graph500_spark.session import get_spark

    spark = get_spark(app_name="profile-corpus-pipeline")
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

    for rep in range(args.reps):
        pipe_dir = tempfile.mkdtemp(prefix="prof_pipe_")
        try:
            t0 = time.monotonic()
            res = run_corpus_pipeline(spark, docs20, pipe_dir)
            wall = time.monotonic() - t0
            print(f"== rep {rep}: total {wall:.2f}s")
            for s in res.stages:
                print(
                    f"    {s['stage']:>12}  {s.get('seconds', -1):>7.2f}s"
                    f"  rows={s['rows']:>8}  {s['status']}"
                )
        finally:
            shutil.rmtree(pipe_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
