"""The streaming KS drift monitor must converge to the batch answer:
after consuming the document log in micro-batches, the drift readout
equals ks_source_drift over the full corpus in one pass — and a
restart seeds its count state from the sink."""

from __future__ import annotations


def _rows(df):
    return sorted(
        (r["source"], r["n_source"], r["ks_ppm"], r["at_value"])
        for r in df.collect()
    )


def test_streaming_drift_equals_batch(spark, tmp_path):
    from graph500_spark.operators.traindata import ks_source_drift
    from graph500_spark.streaming.drift import (
        read_drift,
        start_drift_monitor,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_dir = str(tmp_path / "docs_in")
    docs.repartition(8).write.parquet(src_dir)

    counts_out = str(tmp_path / "counts_out")
    drift_out = str(tmp_path / "drift_out")
    q = start_drift_monitor(
        spark,
        src_dir,
        counts_out,
        drift_out,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # 4 real micro-batches
    )
    q.awaitTermination()

    got = _rows(read_drift(spark, drift_out))
    want = _rows(ks_source_drift(docs))
    assert got == want
    assert len(got) > 1  # several sources actually present


def test_streaming_drift_restart_seeds_from_sink(spark, tmp_path):
    from graph500_spark.operators.traindata import ks_source_drift
    from graph500_spark.streaming.drift import (
        read_drift,
        start_drift_monitor,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()
    half1 = docs.filter("doc_id % 2 = 0")
    half2 = docs.filter("doc_id % 2 = 1")

    in1 = str(tmp_path / "in1")
    in2 = str(tmp_path / "in2")
    half1.repartition(2).write.parquet(in1)
    half2.repartition(2).write.parquet(in2)

    counts_out = str(tmp_path / "counts_out")
    drift_out = str(tmp_path / "drift_out")
    # first stream consumes half 1
    q1 = start_drift_monitor(
        spark, in1, counts_out, drift_out, str(tmp_path / "ck1")
    )
    q1.awaitTermination()
    # fresh stream (new checkpoint) over half 2 must SEED from the
    # persisted counts, so the final readout covers both halves
    q2 = start_drift_monitor(
        spark, in2, counts_out, drift_out, str(tmp_path / "ck2")
    )
    q2.awaitTermination()

    got = _rows(read_drift(spark, drift_out))
    want = _rows(ks_source_drift(docs))
    docs.unpersist()
    assert got == want


def test_streaming_drift_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: crash after the counts write but
    before the streaming checkpoint commit replays the batch on
    restart. The (ckpt, batch_id) marker embedded in the snapshot must
    make the replayed merge a no-op — counts stay exact, not doubled."""
    import glob
    import os

    from graph500_spark.operators.traindata import ks_source_drift
    from graph500_spark.streaming.drift import (
        read_drift,
        start_drift_monitor,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_dir = str(tmp_path / "docs_in")
    docs.repartition(4).write.parquet(src_dir)

    counts_out = str(tmp_path / "counts_out")
    drift_out = str(tmp_path / "drift_out")
    ckpt = str(tmp_path / "ckpt")
    q1 = start_drift_monitor(spark, src_dir, counts_out, drift_out, ckpt)
    q1.awaitTermination()

    # simulate the crash window: the counts snapshot is on disk but the
    # streaming commit marker for the last batch is not
    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    numeric = [p for p in commits if os.path.basename(p).isdigit()]
    assert numeric, commits
    os.remove(numeric[-1])
    crc = os.path.join(
        os.path.dirname(numeric[-1]),
        "." + os.path.basename(numeric[-1]) + ".crc",
    )
    if os.path.exists(crc):  # local ChecksumFs keeps a shadow file
        os.remove(crc)

    # restart with the SAME checkpoint: Spark replays that batch_id
    q2 = start_drift_monitor(spark, src_dir, counts_out, drift_out, ckpt)
    q2.awaitTermination()

    got = _rows(read_drift(spark, drift_out))
    want = _rows(ks_source_drift(docs))
    assert got == want
    from graph500_spark.streaming.statesink import read_counts

    total = (
        read_counts(spark, counts_out).groupBy().sum("c").collect()[0][0]
    )
    assert total == docs.count()  # not doubled by the replay


def test_streaming_drift_torn_snapshot_ignored(spark, tmp_path):
    """A crash mid-snapshot-write leaves a versioned dir WITHOUT
    Spark's _SUCCESS commit marker. Seeding must ignore it and resume
    from the last committed snapshot — never treat the torn write as
    state, never reset to zero."""
    import os

    from graph500_spark.operators.traindata import ks_source_drift
    from graph500_spark.streaming.drift import (
        read_drift,
        start_drift_monitor,
    )
    from graph500_spark.streaming.statesink import read_counts

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).persist()
    half1 = docs.filter("doc_id % 2 = 0")
    half2 = docs.filter("doc_id % 2 = 1")
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    half1.repartition(2).write.parquet(in1)
    half2.repartition(2).write.parquet(in2)

    counts_out = str(tmp_path / "counts_out")
    drift_out = str(tmp_path / "drift_out")
    q1 = start_drift_monitor(
        spark, in1, counts_out, drift_out, str(tmp_path / "ck1")
    )
    q1.awaitTermination()

    # fabricate the torn write: a later-versioned snap dir holding a
    # (valid) parquet file but NO _SUCCESS marker — what a crash
    # between task commits and job commit leaves behind
    committed = read_counts(spark, counts_out)
    torn_dir = os.path.join(counts_out, "snap-00099999")
    committed.limit(1).write.parquet(torn_dir)
    os.remove(os.path.join(torn_dir, "_SUCCESS"))
    crc = os.path.join(torn_dir, "._SUCCESS.crc")
    if os.path.exists(crc):
        os.remove(crc)

    q2 = start_drift_monitor(
        spark, in2, counts_out, drift_out, str(tmp_path / "ck2")
    )
    q2.awaitTermination()

    got = _rows(read_drift(spark, drift_out))
    want = _rows(ks_source_drift(docs))
    docs.unpersist()
    assert got == want  # torn snapshot neither used nor fatal


def test_streaming_drift_corrupt_sink_raises(spark, tmp_path):
    """A corrupt counts sink must propagate, not silently reset the
    monitor to zero state (only a MISSING path means fresh start)."""
    import pytest

    from graph500_spark.streaming.drift import start_drift_monitor

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_dir = str(tmp_path / "docs_in")
    docs.limit(50).write.parquet(src_dir)

    counts_out = tmp_path / "counts_out"
    counts_out.mkdir()
    (counts_out / "part-garbage.parquet").write_text("not parquet")

    q = start_drift_monitor(
        spark,
        src_dir,
        str(counts_out),
        str(tmp_path / "drift_out"),
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="(?i)parquet|magic|footer|schema"):
        q.awaitTermination()
