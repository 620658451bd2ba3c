"""Streaming EWMA monitor: streamed recurrence == batch event_ewma on
bounded in-order input (row-identical), and the multi-batch fold with
zero-filled gaps matches a hand recurrence."""

from __future__ import annotations

from tests.conftest import SF_SMALL

E6 = 1_000_000


def test_stream_ewma_equals_batch(spark):
    from graph500_spark.operators.timeseries import event_ewma
    from graph500_spark.sources import testdata as td
    from graph500_spark.streaming.monitor import ewma_monitor_stream
    from graph500_spark.streaming.windows import stream_events

    out = (
        # evict_idle=False: bounded replay — with a timeout armed,
        # AvailableNow never self-terminates (see operator docstring)
        ewma_monitor_stream(stream_events(spark, SF_SMALL), evict_idle=False)
        .writeStream.format("memory")
        .queryName("ewma_monitor_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(300)
    out.stop()  # defensive: never leak a query into the shared session
    streamed = {
        (r["event_type"], r["bucket_start_us"]): (r["n_events"], r["ewma_e6"])
        for r in spark.table("ewma_monitor_test").collect()
    }
    batch = {
        (r["event_type"], r["bucket_start_us"]): (r["n_events"], r["ewma_e6"])
        for r in event_ewma(td.load_table(spark, SF_SMALL, "events")).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_ewma_multibatch_gap_fill(spark):
    """Drive the recurrence through foreachBatch-free manual state: two
    batches with a 3-bucket gap between them must zero-fill the gap."""
    import pandas as pd

    from graph500_spark.streaming.monitor import ewma_monitor_stream

    HOUR_NS = 3_600_000_000_000
    rows_b1 = [(i, 1, 0 * HOUR_NS + i, "a", 0.0) for i in range(8)]
    rows_b2 = [(100 + i, 1, 4 * HOUR_NS + i, "a", 0.0) for i in range(4)]
    schema = "event_id long, user_id long, ts long, event_type string, value double"

    import tempfile

    d = tempfile.mkdtemp(prefix="ewma_stream_")
    spark.createDataFrame(rows_b1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/b=1")
    spark.createDataFrame(rows_b2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/b=2")
    # FileStreamSource orders files by modification time; pin distinct
    # mtimes so b=1 is always the first micro-batch (identical mtimes
    # would let b=2 go first, making the hour-0 rows "late" → flake).
    import glob
    import os

    for i, part in enumerate(
        sorted(glob.glob(f"{d}/b=*/part-*.parquet"))
    ):
        os.utime(part, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b=*")
    )
    q = (
        ewma_monitor_stream(stream, evict_idle=False)
        .writeStream.format("memory")
        .queryName("ewma_gap_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()  # defensive: never leak a query into the shared session
    got = {
        r["bucket_start_us"]: (r["n_events"], r["ewma_e6"])
        for r in spark.table("ewma_gap_test").collect()
    }
    # hand recurrence: x = [8, 0, 0, 0, 4] over hours 0..4
    s = [8 * E6]
    for x in (0, 0, 0, 4):
        s.append((x * E6 + 7 * s[-1]) // 8)
    want = {
        h * 3_600_000_000: (x, s[h])
        for h, x in enumerate((8, 0, 0, 0, 4))
    }
    assert got == want
