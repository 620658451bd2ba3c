"""The streaming KMV distinct-token monitor must EQUAL the batch
sketch over the full ingested corpus (k-smallest sets are exactly
mergeable, including under the statesink truncate_state hook), carry
state bounded at k rows, and seed across streams from the sink."""

from __future__ import annotations


def _readout_row(spark, readout_out):
    from graph500_spark.streaming.distinct import read_distinct

    r = read_distinct(spark, readout_out).collect()[0]
    return (r["k"], r["n_sketch"], r["kth_hash"], r["est_distinct"])


def _batch_row(docs, k):
    from graph500_spark.operators.sketches import kmv_distinct_tokens

    r = kmv_distinct_tokens(docs, k=k).collect()[0]
    return (r["k"], r["n_sketch"], r["kth_hash"], r["est_distinct"])


def test_streaming_distinct_equals_batch_with_truncation(spark, tmp_path):
    from graph500_spark.streaming.distinct import start_distinct_monitor
    from graph500_spark.streaming.statesink import read_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_in")
    docs.repartition(8).write.parquet(src)

    counts_out = str(tmp_path / "counts_out")
    readout_out = str(tmp_path / "readout_out")
    # k=16 < the sf0.001 vocabulary (~31 tokens), so the sketch is
    # genuinely truncated every batch — the hook under test
    q = start_distinct_monitor(
        spark,
        src,
        counts_out,
        readout_out,
        str(tmp_path / "ckpt"),
        k=16,
        max_files_per_trigger=2,  # 4 real micro-batches
    )
    q.awaitTermination()

    got = _readout_row(spark, readout_out)
    want = _batch_row(docs, 16)
    assert got == want
    assert got[1] == 16  # sketch full → the estimator path, not exact
    # carried state is bounded at k rows
    assert read_counts(spark, counts_out).count() == 16


def test_streaming_distinct_restart_seeds_from_sink(spark, tmp_path):
    from graph500_spark.streaming.distinct import start_distinct_monitor

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()
    half1 = docs.filter("doc_id % 2 = 0")
    half2 = docs.filter("doc_id % 2 = 1")
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    half1.repartition(2).write.parquet(in1)
    half2.repartition(2).write.parquet(in2)

    counts_out = str(tmp_path / "counts_out")
    readout_out = str(tmp_path / "readout_out")
    q1 = start_distinct_monitor(
        spark, in1, counts_out, readout_out, str(tmp_path / "ck1"), k=16
    )
    q1.awaitTermination()
    q2 = start_distinct_monitor(
        spark, in2, counts_out, readout_out, str(tmp_path / "ck2"), k=16
    )
    q2.awaitTermination()

    got = _readout_row(spark, readout_out)
    want = _batch_row(docs, 16)
    docs.unpersist()
    assert got == want
