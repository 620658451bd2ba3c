"""Sessionization — the custom stateful operator the reference has no
analogue for (its only iteration is the BFS loop); built three ways:

  * ``sessionize_native`` — Spark's built-in ``session_window``
    operator (gap-merged windows), boundary-aligned to the lag-window
    formulation.

  * ``sessionize`` — batch formulation: a lag window over (user, time)
    marks session starts, a running sum assigns session ids. Pure
    Column algebra, oracle-checkable, scales as one shuffle on user_id
    (windows partitioned by user — parallel across users).
  * ``sessionize_stream`` — Structured Streaming formulation with
    ``applyInPandasWithState``: per-user session state (last event
    time, open session id) kept in the state store with a processing
    timeout — the shape a real stream pipeline needs when input is
    unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph500_spark.functions.eventtime import event_micros, pandas_micros

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """[user_id, session_id, n_events, session_start_us, session_end_us]

    session_id is 1-based per user, ordered by event time; ties broken
    by event_id for determinism.
    """
    ts_us = event_micros(events)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = (
        events.select("user_id", "event_id", ts_us.alias("ts_us"))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts_us") - F.col("prev_ts") > gap_us)
            ).cast("long"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


def sessionize_sql(gap_us: int = SESSION_GAP_US) -> str:
    return (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us"
        " FROM events),"
        " marked AS (SELECT user_id, event_id, ts_us,"
        " LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "  AS prev_ts FROM e),"
        " flagged AS (SELECT user_id, ts_us,"
        " CAST(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {g}"
        "  THEN 1 ELSE 0 END AS BIGINT) AS new_session, event_id"
        " FROM marked),"
        " sess AS (SELECT user_id, ts_us,"
        " CAST(SUM(new_session) OVER (PARTITION BY user_id"
        "  ORDER BY ts_us, event_id) AS BIGINT) AS session_id FROM flagged)"
        " SELECT user_id, session_id, COUNT(*) AS n_events,"
        " MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us"
        " FROM sess GROUP BY user_id, session_id"
    ).format(g=gap_us)


def sessionize_stream(
    events_stream: DataFrame, gap_us: int = SESSION_GAP_US
) -> DataFrame:
    """applyInPandasWithState sessionizer: emits one row per *closed*
    session. State per user: (open session start, last seen ts,
    event count)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start_us long, session_end_us long,"
        " n_events long"
    )
    state_schema = "start_us long, last_us long, n long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            rows.append((user_id, start_us, last_us, n))
            state.remove()
        else:
            ts_list = []
            for pdf in pdfs:
                ts_list.extend(pandas_micros(pdf["ts"]).tolist())
            ts_list.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = None, None, 0
            for t in ts_list:
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    rows.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
            if last_us is not None:
                state.update((start_us, last_us, n))
                state.setTimeoutDuration(60_000)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_native(
    events: DataFrame, gap_us: int = SESSION_GAP_US
) -> DataFrame:
    """[user_id, session_start_us, session_end_us, n_events] via
    Spark's NATIVE ``session_window`` operator — the third
    formulation next to the lag-window batch ``sessionize`` and the
    ``applyInPandasWithState`` stream. Must produce exactly the
    sessions of ``sessionize`` (asserted by the oracle and tests).

    Boundary alignment: Spark merges an event into the open session
    when its distance from the last event is <= gap (touching session
    windows merge — verified by the boundary unit test), which is
    exactly ``sessionize``'s rule (``> gap`` starts a new session), so
    the gap passes through unchanged."""
    from graph500_spark.functions.eventtime import event_time

    t = event_time(events)
    win = F.session_window(F.col("et"), f"{gap_us} microseconds")
    return (
        events.select("user_id", t.alias("et"))
        .groupBy("user_id", win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            (F.unix_micros("w.end") - F.lit(gap_us)).alias("session_end_us"),
            "n_events",
        )
    )


def sessionize_native_sql(gap_us: int = SESSION_GAP_US) -> str:
    """Oracle: the lag-window sessionization (sessionize_sql's
    arithmetic) projected to the session_window output shape."""
    return (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us"
        " FROM events),"
        " marked AS (SELECT user_id, event_id, ts_us,"
        " LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "  AS prev_ts FROM e),"
        " flagged AS (SELECT user_id, ts_us,"
        " CAST(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {g}"
        "  THEN 1 ELSE 0 END AS BIGINT) AS new_session, event_id"
        " FROM marked),"
        " sess AS (SELECT user_id, ts_us,"
        " CAST(SUM(new_session) OVER (PARTITION BY user_id"
        "  ORDER BY ts_us, event_id) AS BIGINT) AS session_id FROM flagged)"
        " SELECT user_id, MIN(ts_us) AS session_start_us,"
        " MAX(ts_us) AS session_end_us, COUNT(*) AS n_events"
        " FROM sess GROUP BY user_id, session_id"
    ).format(g=gap_us)


def session_stats(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """One-row session-distribution summary over sessionize():
    [n_sessions, n_users, avg_events, p50_events, p90_events,
    avg_duration_us, max_duration_us]. Exact interpolated percentiles
    (Spark percentile ≡ DuckDB quantile_cont); averages are explicit
    sum/count quotients so both engines round identically."""
    s = sessionize(events, gap_us)
    dur = F.col("session_end_us") - F.col("session_start_us")
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 5)
        .cast("double")
        .alias("avg_events"),
        F.round(F.expr("percentile(n_events, 0.5)"), 5)
        .cast("double")
        .alias("p50_events"),
        F.round(F.expr("percentile(n_events, 0.9)"), 5)
        .cast("double")
        .alias("p90_events"),
        F.round(F.sum(dur) / F.count(F.lit(1)), 5)
        .cast("double")
        .alias("avg_duration_us"),
        F.max(dur).cast("long").alias("max_duration_us"),
    )


def session_stats_sql(gap_us: int = SESSION_GAP_US) -> str:
    return (
        f"WITH s AS ({sessionize_sql(gap_us)})"
        " SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,"
        " CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,"
        " CAST(round(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 5)"
        "  AS DOUBLE) AS avg_events,"
        " CAST(round(quantile_cont(n_events, 0.5), 5) AS DOUBLE)"
        "  AS p50_events,"
        " CAST(round(quantile_cont(n_events, 0.9), 5) AS DOUBLE)"
        "  AS p90_events,"
        " CAST(round(SUM(session_end_us - session_start_us)"
        "  / CAST(COUNT(*) AS DOUBLE), 5) AS DOUBLE) AS avg_duration_us,"
        " CAST(MAX(session_end_us - session_start_us) AS BIGINT)"
        "  AS max_duration_us"
        " FROM s"
    )
