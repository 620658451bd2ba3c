"""Range (interval) join — the second operator Spark's DataFrame API
lacks natively (Catalyst plans a raw range predicate as a nested-loop
join): left row l matches right rows r with the same key and r.ts in
[l.ts + lower, l.ts + upper).

Spark-first scale path — bucketed range join (what Databricks' RANGE_JOIN
hint implements): quantize time into buckets of the window width, explode
each left row to the (≤2) buckets its interval overlaps, leave each right
row in its single home bucket, equi-join on (key, bucket), then apply the
exact range predicate. Turns the nested loop into one hash shuffle with
bounded fan-out; each (l, r) match pair occurs exactly once because the
right row's bucket is unique.

Oracle: a plain inequality join in DuckDB computes the identical result
(testdata scales are small enough for its nested-loop path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.functions.eventtime import event_micros

# 10 minutes in the events table's nanosecond timestamps
WINDOW_NS = 600 * 10**9


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and
    ``l.ts + lower <= r.ts < l.ts + upper``. Left columns keep their
    names; right columns arrive prefixed ``r_``. Bucket width =
    interval width, so each left interval spans at most 2 buckets."""
    width = upper - lower
    assert width > 0, "empty range"
    # integer `div`, NOT `/`: long/long division in Spark returns a
    # double, and epoch timestamps exceed double's 2^53 exact-integer
    # range — float bucket ids would mis-bucket boundary rows
    r = right.select(
        F.col(key),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != key
        ],
        F.expr(f"{ts} div {width}").alias("bucket"),
    )
    l = left.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"({ts} + {lower}) div {width}"),
                    F.expr(f"({ts} + {upper} - 1) div {width}"),
                )
            )
        ),
    )
    return l.join(r, [key, "bucket"]).filter(
        (F.col(f"r_{ts}") >= F.col(ts) + F.lit(lower))
        & (F.col(f"r_{ts}") < F.col(ts) + F.lit(upper))
    ).drop("bucket")


def error_context(events: DataFrame, window_ns: int = WINDOW_NS) -> DataFrame:
    """[event_id, user_id, n_context, sum_value] — for every error
    event, how many same-user events (any type) occurred in the
    preceding window (strictly before the error), and their value sum.
    Errors with no context appear with zeros (left join).

    Comparisons run on epoch micros (functions/eventtime.py — the
    engine-wide convention, exact vs DuckDB's ``epoch_us``)."""
    window_us = window_ns // 1000
    ts_us = event_micros(events).alias("ts_us")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", ts_us
    )
    context = events.select("user_id", ts_us, "value")
    pairs = range_join(errors, context, "user_id", "ts_us", -window_us, 0)
    agg = pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_context"),
        F.round(F.sum("r_value"), 6).alias("sum_value"),
    )
    return (
        errors.select("event_id", "user_id")
        .join(agg, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_context", F.lit(0)).alias("n_context"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def error_context_sql(window_ns: int = WINDOW_NS) -> str:
    window_us = window_ns // 1000
    return (
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us"
        " FROM events WHERE event_type = 'error'),"
        " c AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),"
        " agg AS (SELECT e.event_id, e.user_id,"
        " COUNT(*) AS n_context, ROUND(SUM(c.value), 6) AS sum_value"
        " FROM e JOIN c ON e.user_id = c.user_id"
        f" AND c.ts_us >= e.ts_us - {window_us} AND c.ts_us < e.ts_us"
        " GROUP BY e.event_id, e.user_id)"
        " SELECT e.event_id, e.user_id,"
        " COALESCE(agg.n_context, 0) AS n_context,"
        " COALESCE(agg.sum_value, 0.0) AS sum_value"
        " FROM e LEFT JOIN agg"
        " ON agg.event_id = e.event_id AND agg.user_id = e.user_id"
    )
