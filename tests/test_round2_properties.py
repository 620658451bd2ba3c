"""Property tests for the round-2 surfaces: hash-tier agreement with
an independent Python reference, and sessionization formulation
equivalence on randomized event sets."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from graph500_spark.streaming.sessions import sessionize, sessionize_native

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=80,
)


def _md5_60(s: str) -> int:
    """Independent third implementation of the md5-60bit hash tier
    (Spark: conv(substr(md5,1,15),16,10); DuckDB: 0x-cast)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_md5_tier_matches_python_reference(spark):
    import pyspark.sql.functions as F

    from graph500_spark.operators.text import spark_strhash

    samples = ["", "a", "hello world", "x" * 200, "Quick brown fox 42!"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [
        r[0]
        for r in df.select(F.expr(spark_strhash("s", "md5")).cast("long")).collect()
    ]
    assert got == [_md5_60(s) for s in samples]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user_id
            st.integers(min_value=0, max_value=10**8),  # ts seconds-ish
        ),
        min_size=1,
        max_size=25,
    )
)
def test_sessionize_formulations_agree(spark, events_raw):
    """Lag-window and native session_window produce identical session
    sets on arbitrary event streams (including gap-boundary hits —
    ts values are coarse enough to collide with the gap)."""
    gap_us = 1_000_000  # 1s gap so random inputs straddle it often
    rows = [
        (i, ts * 1_000_000_000, u, "click", 0.0, "{}")  # bigint nanos
        for i, (u, ts) in enumerate(events_raw)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    lag = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in sessionize(events, gap_us).collect()
    )
    native = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in sessionize_native(events, gap_us).collect()
    )
    assert lag == native
