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
