"""The watermarked stream-stream interval join must produce exactly
the batch bounded-range-join rows on bounded input."""

from __future__ import annotations

from graph500_spark.sources import testdata as td
from graph500_spark.streaming.joins import (
    purchase_click_pairs,
    run_stream_join_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_join_equals_batch(spark):
    batch = purchase_click_pairs(td.load_table(spark, SF_DIR, "events"))
    expect = sorted(map(tuple, batch.collect()))
    got = sorted(
        map(tuple, run_stream_join_to_memory(spark, SF_DIR).collect())
    )
    assert len(expect) > 0  # fixture must actually exercise the join
    assert got == expect


def test_watermarked_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """An at-least-once source (every event delivered twice, split
    across micro-batches) must come out exactly-once, and the
    surviving rows must be the original events."""
    from pyspark.sql import functions as F

    from graph500_spark.streaming.windows import (
        run_deduped_events_to_memory,
    )

    events = td.load_table(spark, SF_DIR, "events")
    n = events.count()
    src = str(tmp_path / "dup_events")
    # two identical copies in separate files -> separate micro-batches
    events.coalesce(1).write.parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)

    out = run_deduped_events_to_memory(
        spark, src, watermark="3650 days", max_files_per_trigger=1
    )
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n
    # content round-trips, not just counts
    diff = out.select("event_id", "event_type").exceptAll(
        events.select("event_id", "event_type")
    )
    assert diff.count() == 0
