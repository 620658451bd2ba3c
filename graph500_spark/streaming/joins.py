"""Stream-stream interval join: purchases × clicks within a bounded
event-time window.

The remaining headline Structured Streaming capability after windowed
aggregation (windows.py), stateful sessionization (sessions.py) and
foreachBatch ingest (ingest.py / corpus_ingest.py): joining two
unbounded streams. Spark can only run such a join with bounded state,
which requires (a) watermarks on BOTH sides and (b) an event-time
range constraint in the join condition — from those two, the engine
derives when buffered rows can be evicted, which is what lets the
join run forever at 100 TB/day ingest rates.

The batch-equivalent `purchase_click_pairs` is the oracle-checked
registry entry (a bounded range join: equi-key on user_id + residual
time predicate — Catalyst plans the equi-join and applies the interval
as a post-filter; the bucketing rewrite of operators/rangejoin.py is
the scale path when the equi-key alone is too coarse). The streaming
variant must produce exactly the same rows on bounded input —
asserted in tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_spark.functions.eventtime import event_micros, event_time
from graph500_spark.streaming.windows import stream_events

WINDOW_MINUTES = 10
_WINDOW_US = WINDOW_MINUTES * 60_000_000


def purchase_click_pairs(events: DataFrame) -> DataFrame:
    """[purchase_id, user_id, click_id, p_ts_us, gap_us]: every
    (purchase, click) pair of the same user with the click at most
    WINDOW_MINUTES before (or equal to) the purchase. Epoch-micro
    timestamps (the eventtime.py convention)."""
    ts_us = event_micros(events)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        ts_us.alias("p_ts_us"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        ts_us.alias("c_ts_us"),
    )
    gap = F.col("p_ts_us") - F.col("c_ts_us")
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (gap >= 0)
            & (gap < F.lit(_WINDOW_US)),
        )
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            "p_ts_us",
            gap.alias("gap_us"),
        )
    )


PURCHASE_CLICK_PAIRS_SQL = (
    "WITH p AS (SELECT event_id AS purchase_id, user_id,"
    " epoch_us(ts) AS p_ts_us FROM events WHERE event_type = 'purchase'),"
    " c AS (SELECT event_id AS click_id, user_id AS c_user_id,"
    " epoch_us(ts) AS c_ts_us FROM events WHERE event_type = 'click')"
    " SELECT purchase_id, user_id, click_id, p_ts_us,"
    " p_ts_us - c_ts_us AS gap_us"
    " FROM p JOIN c ON user_id = c_user_id"
    " AND p_ts_us - c_ts_us >= 0"
    f" AND p_ts_us - c_ts_us < {_WINDOW_US}"
)


def stream_purchase_click_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming plan: watermarked purchases stream ⋈ watermarked
    clicks stream with an event-time interval condition. State bound:
    clicks are kept only until the watermark passes their eviction
    horizon (join window + late-data allowance)."""
    ev = stream_events(spark, sf_dir)
    ev_time = event_time(ev)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            ev_time.alias("p_time"),
        )
        .withWatermark("p_time", "10 minutes")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            ev_time.alias("c_time"),
        )
        .withWatermark("c_time", "10 minutes")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_time") <= F.col("p_time"))
        & (
            F.col("c_time")
            > F.col("p_time") - F.expr(f"INTERVAL {WINDOW_MINUTES} MINUTES")
        ),
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.unix_micros("p_time").alias("p_ts_us"),
        (F.unix_micros("p_time") - F.unix_micros("c_time")).alias("gap_us"),
    )


def run_stream_join_to_memory(
    spark: SparkSession, sf_dir: str, table: str = "click_pairs"
) -> DataFrame:
    """Drain the bounded source with availableNow into a memory sink;
    on bounded input the result must equal purchase_click_pairs."""
    q = (
        stream_purchase_click_pairs(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(table)
