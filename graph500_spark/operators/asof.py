"""As-of join — an operator Spark's DataFrame API lacks natively
(pandas has merge_asof; DuckDB has ASOF JOIN): for every left row,
attach the latest right row with the same key and right.ts <= left.ts.
Canonical training-pipeline / event-analytics use: attribute each
conversion to the most recent prior interaction.

Spark-first formulation (no UDF, no per-key collect): tag both sides,
union, and run one window per key ordered by (ts, side) carrying the
right side's payload forward with ``last(..., ignorenulls=True)``. One
shuffle on the key — the same exchange a plain equi-join would need —
and the sort is per-key within partitions (Spark's window sort), so
the plan scales like groupBy(key).

Tie semantics: a right row with ts equal to the left's matches (the
<= convention, matching DuckDB ASOF). The right side is first deduped
to one row per (key, ts) — keeping the max event id — so both engines
resolve equal-timestamp duplicates identically.

Skew note: one hot key serializes into one window partition. At 100 TB
the fix is range-bucketing ts into coarse buckets per key and carrying
each bucket's closing state into the next (two window passes);
unnecessary at the driver-testdata scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph500_spark.functions.eventtime import event_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """ASOF LEFT JOIN: every left row, plus [matched_event_id, r_ts,
    r_value] of the latest right row at-or-before it (nulls when no
    prior right row exists).

    Expects both sides to carry [event_id, key, ts, value]. The ts
    column is ordered but otherwise opaque — any orderable type works
    (callers on the events table pre-convert TIMESTAMP to epoch micros
    via functions/eventtime.py)."""
    r = (
        right.groupBy(key, ts)
        .agg(
            F.max("event_id").alias("r_event_id"),
            F.max_by("value", "event_id").alias("r_value"),
        )
        .select(
            key,
            F.col(ts).alias("r_ts"),
            "r_event_id",
            "r_value",
            F.lit(0).alias("side"),
        )
    )
    l = left.select(
        key,
        F.col(ts).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
        F.lit(1).alias("side"),
    )
    tagged = r.select(
        key,
        F.col("r_ts").alias("order_ts"),
        F.lit(None).cast("long").alias("l_event_id"),
        F.lit(None).cast("double").alias("l_value"),
        "r_event_id",
        "r_ts",
        "r_value",
        "side",
    ).unionByName(
        l.select(
            key,
            F.col("l_ts").alias("order_ts"),
            "l_event_id",
            "l_value",
            F.lit(None).cast("long").alias("r_event_id"),
            F.lit(None).cast(l.schema["l_ts"].dataType).alias("r_ts"),
            F.lit(None).cast("double").alias("r_value"),
            "side",
        )
    )
    # right rows sort before left rows at equal ts → ts-equal matches
    w = (
        Window.partitionBy(key)
        .orderBy("order_ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            key,
            "order_ts",
            "l_event_id",
            "l_value",
            "side",
            F.last("r_event_id", ignorenulls=True).over(w).alias("matched_event_id"),
            F.last("r_ts", ignorenulls=True).over(w).alias("r_ts"),
            F.last("r_value", ignorenulls=True).over(w).alias("r_value"),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("l_event_id").alias("event_id"),
            key,
            F.col("order_ts").alias("l_ts"),
            "l_value",
            "matched_event_id",
            "r_ts",
            "r_value",
        )
    )


def click_attribution(events: DataFrame) -> DataFrame:
    """[event_id, user_id, l_ts_us, l_value, matched_event_id,
    r_ts_us, r_value] — every purchase attributed to the user's most
    recent click at-or-before it. Event time is converted to epoch
    micros up front (functions/eventtime.py) so the asof window orders
    plain longs and the cross-engine value hash is exact."""
    ev = events.select(
        "event_id",
        "user_id",
        event_micros(events).alias("ts"),
        "value",
        "event_type",
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(purchases, clicks)
    return out.select(
        "event_id",
        "user_id",
        F.col("l_ts").alias("l_ts_us"),
        F.round("l_value", 6).alias("l_value"),
        "matched_event_id",
        F.col("r_ts").alias("r_ts_us"),
        F.round("r_value", 6).alias("r_value"),
    )


CLICK_ATTRIBUTION_SQL = (
    "WITH r0 AS (SELECT user_id, ts, MAX(event_id) AS r_event_id,"
    " arg_max(value, event_id) AS r_value"
    " FROM events WHERE event_type = 'click' GROUP BY user_id, ts),"
    " l AS (SELECT event_id, user_id, ts, value FROM events"
    " WHERE event_type = 'purchase')"
    " SELECT l.event_id, l.user_id,"
    " epoch_us(l.ts) AS l_ts_us,"
    " ROUND(l.value, 6) AS l_value,"
    " r0.r_event_id AS matched_event_id,"
    " epoch_us(r0.ts) AS r_ts_us,"
    " ROUND(r0.r_value, 6) AS r_value"
    " FROM l ASOF LEFT JOIN r0"
    " ON l.user_id = r0.user_id AND l.ts >= r0.ts"
)


def multi_touch_attribution(
    events: DataFrame, window_minutes: int = 60
) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value is split
    equally across ALL the user's clicks in the lookback window
    [purchase − window, purchase] —
    [purchase_id, click_id, n_touches, credit].

    The many-row generalization of click_attribution's last-touch
    as-of join. Plan: user-keyed equi-join (per-user bounded fan-out,
    never a global product) + range filter + a purchase-keyed count
    window to split the credit; credit = round(value/n, 6) is one
    deterministic division per row."""
    win_us = 60_000_000 * window_minutes
    ev = events.select(
        "event_id", "user_id", event_micros(events).alias("ts"),
        "value", "event_type",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    touches = p.join(c, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.lit(win_us))
    )
    w = Window.partitionBy("purchase_id")
    return touches.select(
        "purchase_id",
        "click_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_touches"),
        F.round(
            F.col("value") / F.count(F.lit(1)).over(w), 6
        ).alias("credit"),
    )


def multi_touch_attribution_sql(window_minutes: int = 60) -> str:
    win_us = 60_000_000 * window_minutes
    return (
        "WITH p AS (SELECT event_id AS purchase_id, user_id,"
        " epoch_us(ts) AS p_ts, value FROM events"
        " WHERE event_type = 'purchase'),"
        " c AS (SELECT event_id AS click_id, user_id,"
        " epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'),"
        " touches AS (SELECT p.purchase_id, c.click_id, p.value"
        " FROM p JOIN c ON p.user_id = c.user_id"
        f" AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - {win_us})"
        " SELECT purchase_id, click_id,"
        " CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)"
        " AS n_touches,"
        " ROUND(value / COUNT(*) OVER (PARTITION BY purchase_id), 6)"
        " AS credit FROM touches"
    )
