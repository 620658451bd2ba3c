"""The streaming key-skew monitor must converge to the batch
diagnostic over the full ingested event log, and seed across streams
from the persisted per-key counts."""

from __future__ import annotations


def _row(df):
    r = df.collect()[0]
    return tuple(r[c] for c in df.columns)


def test_streaming_skew_equals_batch(spark, tmp_path):
    from graph500_spark.operators.dq import key_skew_stats
    from graph500_spark.streaming.skew import (
        read_skew,
        start_skew_monitor,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_in")
    events.repartition(8).write.parquet(src)

    counts_out = str(tmp_path / "counts_out")
    readout_out = str(tmp_path / "readout_out")
    q = start_skew_monitor(
        spark,
        src,
        counts_out,
        readout_out,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # 4 real micro-batches
    )
    q.awaitTermination()

    got = _row(read_skew(spark, readout_out))
    want = _row(key_skew_stats(events, "user_id", "events"))
    assert got == want
    assert got[3] > 1  # several keys actually present


def test_streaming_skew_restart_seeds_from_sink(spark, tmp_path):
    from graph500_spark.operators.dq import key_skew_stats
    from graph500_spark.streaming.skew import (
        read_skew,
        start_skew_monitor,
    )

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).persist()
    half1 = events.filter("event_id % 2 = 0")
    half2 = events.filter("event_id % 2 = 1")
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    half1.repartition(2).write.parquet(in1)
    half2.repartition(2).write.parquet(in2)

    counts_out = str(tmp_path / "counts_out")
    readout_out = str(tmp_path / "readout_out")
    q1 = start_skew_monitor(
        spark, in1, counts_out, readout_out, str(tmp_path / "ck1")
    )
    q1.awaitTermination()
    q2 = start_skew_monitor(
        spark, in2, counts_out, readout_out, str(tmp_path / "ck2")
    )
    q2.awaitTermination()

    got = _row(read_skew(spark, readout_out))
    want = _row(key_skew_stats(events, "user_id", "events"))
    events.unpersist()
    assert got == want
