"""A/B the corpus-cleaner micro-batch shape, same warm session.

Round 12 reshaped _clean_batch from a payload window shuffle to a
proxy-row dedup; the bench corpus rate halved while task seconds
dropped 4x (the annotation ran at the 2-file scan parallelism).
Arms, interleaved in ONE warm session (fresh checkpoint/sink per run):

  window — the pre-round shape: window over text_hash on full rows
  proxy  — round-12 shape without the width guard
  guard  — round-12 shape + widen-narrow-batches guard (HEAD)

Usage: python tools/ab_corpus_stream.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

import pyspark.sql.functions as F  # noqa: E402

from graph500_spark.session import get_spark  # noqa: E402
from graph500_spark.streaming import corpus_ingest as ci  # noqa: E402
from graph500_spark.operators import text as tx  # noqa: E402


def _clean_batch_window(batch, accepted, min_quality, n_accepted=None,
                        broadcast_rows=2_000_000):
    """The pre-round shape (payload window shuffle), new signature."""
    from pyspark.sql import Window

    hashed = batch.withColumn(
        "text_hash", F.expr(tx.spark_strhash("text")).cast("long")
    )
    w = Window.partitionBy("text_hash")
    survivors = (
        hashed.withColumn("_min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )
    if accepted is not None:
        survivors = survivors.join(
            accepted.select("text_hash"), "text_hash", "left_anti"
        )
    return (
        tx.annotate_quality_lang(survivors)
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != "und")
        )
        .select(
            "doc_id", "text_hash", "lang_pred", "quality_score", "n_tokens"
        )
    )


def _clean_batch_proxy(batch, accepted, min_quality, n_accepted=None,
                       broadcast_rows=2_000_000):
    """Round-12 proxy shape WITHOUT the width guard."""
    hashed = batch.withColumn(
        "text_hash", F.expr(tx.spark_strhash("text")).cast("long")
    )
    min_ids = (
        hashed.select("text_hash", "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = hashed.join(min_ids, ["text_hash", "doc_id"], "left_semi")
    if accepted is not None:
        acc = accepted.select("text_hash")
        if n_accepted is not None and n_accepted <= broadcast_rows:
            acc = F.broadcast(acc)
        survivors = survivors.join(acc, "text_hash", "left_anti")
    return (
        tx.annotate_quality_lang(survivors)
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != "und")
        )
        .select(
            "doc_id", "text_hash", "lang_pred", "quality_score", "n_tokens"
        )
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-corpus-stream")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n1 = docs.count()
    reps8 = spark.range(8).select(F.col("id").alias("rep"))
    docs8 = docs.crossJoin(F.broadcast(reps8)).select(
        (F.col("doc_id") + F.col("rep") * (n1 * 2)).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    base = tempfile.mkdtemp(prefix="ab_corpus_stream_")
    dsrc = os.path.join(base, "docs_in")
    docs8.repartition(8).write.parquet(dsrc)
    n_docs = n1 * 8

    arms = {
        "window": _clean_batch_window,
        "proxy": _clean_batch_proxy,
        "guard": ci._clean_batch,
    }
    orig = ci._clean_batch
    results: dict[str, list[float]] = {}
    try:
        # warmup: one full stream run so codegen/parquet caches are hot
        q = ci.start_corpus_ingest(
            spark, dsrc, os.path.join(base, "warm_out"),
            os.path.join(base, "warm_ckpt"), max_files_per_trigger=2,
        )
        q.awaitTermination()
        for rep in range(reps):
            for name, fn in arms.items():
                ci._clean_batch = fn
                run_dir = os.path.join(base, f"{name}_{rep}")
                t0 = time.monotonic()
                q = ci.start_corpus_ingest(
                    spark, dsrc, os.path.join(run_dir, "out"),
                    os.path.join(run_dir, "ckpt"), max_files_per_trigger=2,
                )
                q.awaitTermination()
                dt = time.monotonic() - t0
                n_out = spark.read.parquet(os.path.join(run_dir, "out")).count()
                results.setdefault(name, []).append(dt)
                print(f"rep{rep} {name}: {dt:.2f}s rate={n_docs/dt:,.0f}/s "
                      f"accepted={n_out}", flush=True)
    finally:
        ci._clean_batch = orig
        shutil.rmtree(base, ignore_errors=True)
    print("---- summary (min wall -> max rate)")
    for name, r in results.items():
        print(f"{name:7s} min {min(r):6.2f}s  max_rate {n_docs/min(r):,.0f}/s  "
              + " ".join(f"{x:.2f}" for x in r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
