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
