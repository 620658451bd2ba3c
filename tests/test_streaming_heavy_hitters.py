"""The streaming heavy-hitters monitor must converge to the batch
answer: after consuming the document log in micro-batches, the top-k
readout equals heavy_hitter_tokens over the full corpus in one pass
(counts column; the batch op's n_docs needs doc-id sets as state and
is deliberately not streamed) — and the shared sink-as-state replay
marker makes at-least-once batch replay a no-op."""

from __future__ import annotations


def _batch_topk(docs, k):
    from graph500_spark.operators.text import heavy_hitter_tokens

    return sorted(
        (r["token"], r["n_occurrences"])
        for r in heavy_hitter_tokens(docs, k=k).collect()
    )


def _streamed_topk(spark, topk_out):
    from graph500_spark.streaming.heavy_hitters import read_heavy_hitters

    return sorted(
        (r["token"], r["n_occurrences"])
        for r in read_heavy_hitters(spark, topk_out).collect()
    )


def test_streaming_heavy_hitters_equals_batch(spark, tmp_path):
    from graph500_spark.streaming.heavy_hitters import (
        start_heavy_hitters_monitor,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_dir = str(tmp_path / "docs_in")
    docs.repartition(8).write.parquet(src_dir)

    counts_out = str(tmp_path / "counts_out")
    topk_out = str(tmp_path / "topk_out")
    q = start_heavy_hitters_monitor(
        spark,
        src_dir,
        counts_out,
        topk_out,
        str(tmp_path / "ckpt"),
        k=50,
        max_files_per_trigger=2,  # 4 real micro-batches
    )
    q.awaitTermination()

    got = _streamed_topk(spark, topk_out)
    want = _batch_topk(docs, 50)
    assert got == want
    assert len(got) > 10  # sf0.001's synthetic vocab is ~31 tokens


def test_streaming_heavy_hitters_restart_and_replay(spark, tmp_path):
    """One test drives both recovery paths of the shared state sink:
    (a) a fresh stream (new checkpoint) over the second half SEEDS
    from the persisted counts, and (b) deleting the second stream's
    last commit marker and restarting replays that batch, which the
    (ckpt, batch_id) marker must skip — final counts exact, not
    doubled."""
    import glob
    import os

    from graph500_spark.streaming.heavy_hitters import (
        start_heavy_hitters_monitor,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()
    half1 = docs.filter("doc_id % 2 = 0")
    half2 = docs.filter("doc_id % 2 = 1")
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    half1.repartition(2).write.parquet(in1)
    half2.repartition(2).write.parquet(in2)

    counts_out = str(tmp_path / "counts_out")
    topk_out = str(tmp_path / "topk_out")
    q1 = start_heavy_hitters_monitor(
        spark, in1, counts_out, topk_out, str(tmp_path / "ck1"), k=50
    )
    q1.awaitTermination()

    ck2 = str(tmp_path / "ck2")
    q2 = start_heavy_hitters_monitor(
        spark, in2, counts_out, topk_out, ck2, k=50
    )
    q2.awaitTermination()

    # crash window: counts snapshot written, commit marker not
    commits = [
        p
        for p in glob.glob(os.path.join(ck2, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    last = sorted(commits)[-1]
    os.remove(last)
    crc = os.path.join(
        os.path.dirname(last), "." + os.path.basename(last) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    q3 = start_heavy_hitters_monitor(
        spark, in2, counts_out, topk_out, ck2, k=50
    )
    q3.awaitTermination()

    got = _streamed_topk(spark, topk_out)
    want = _batch_topk(docs, 50)
    docs.unpersist()
    assert got == want
