"""As-of join semantics: latest at-or-before match per key, equal-ts
matches, no-prior-row nulls, and equal-ts right-duplicate resolution."""

from __future__ import annotations

from graph500_spark.operators.asof import asof_join

EV_SCHEMA = "event_id long, user_id long, ts long, value double"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (100, 1, 50, 1.0),   # matches right ts=30 (latest <= 50)
            (101, 1, 10, 2.0),   # no prior right row → nulls
            (102, 1, 30, 3.0),   # equal-ts right row matches
            (103, 2, 99, 4.0),   # other key: its own stream
        ],
        EV_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (200, 1, 20, 10.0),
            (201, 1, 30, 11.0),
            (202, 1, 30, 12.0),  # duplicate (key, ts): max event_id wins
            (203, 1, 60, 13.0),  # after every left row → never matched
            (204, 2, 90, 14.0),
        ],
        EV_SCHEMA,
    )
    out = {r["event_id"]: r for r in asof_join(left, right).collect()}
    assert out[100]["matched_event_id"] == 202 and out[100]["r_ts"] == 30
    assert out[100]["r_value"] == 12.0
    assert out[101]["matched_event_id"] is None
    assert out[102]["matched_event_id"] == 202  # ts-equal (<=) matches
    assert out[103]["matched_event_id"] == 204  # key isolation
    assert len(out) == 4  # left join: every left row survives


def test_range_join_boundaries_and_bucket_spanning(spark):
    from graph500_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, 1, 1000, 0.0)], "event_id long, user_id long, ts long, value double"
    )
    right = spark.createDataFrame(
        [
            (10, 1, 899, 1.0),   # ts + lower - 1 → excluded
            (11, 1, 900, 2.0),   # ts + lower → included (closed)
            (12, 1, 999, 3.0),   # just below upper → included
            (13, 1, 1000, 4.0),  # ts + upper → excluded (open)
            (14, 2, 950, 5.0),   # other key → excluded
        ],
        "event_id long, user_id long, ts long, value double",
    )
    # window [ts-100, ts): buckets of width 100 — right rows 899/900
    # fall in a different bucket than 999, so a match spanning both
    # buckets proves the left-side explode works
    out = range_join(left, right, "user_id", "ts", -100, 0)
    got = sorted(r["r_event_id"] for r in out.collect())
    assert got == [11, 12]
