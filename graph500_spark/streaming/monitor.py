"""Streaming EWMA monitor: the stateful-stream twin of the batch
``operators/timeseries.event_ewma`` — per-series smoothed event-rate
tracking over micro-batches with O(1) state per series.

State per event_type: (last processed bucket, current ewma_e6).  Each
micro-batch buckets its rows, then folds the per-series recurrence
forward IN BUCKET ORDER, zero-filling any gap buckets between the
stored state and the newly arrived data (the dense-grid semantics of
the batch operator).  Rows for buckets at or before the stored bucket
are late data and are dropped — the same discard-past-the-mark policy
a watermark would enforce; on in-order bounded input the streamed
output is row-identical to the batch operator, which the test
asserts.

At 100 TB the state store shards by series key across executors, each
batch touches only the series present in it, and emitted rows are one
per (series, bucket) — the monitoring dashboard's native grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph500_spark.functions.eventtime import pandas_micros

E6 = 1_000_000
OUT_SCHEMA = (
    "event_type string, bucket_start_us long, n_events long, ewma_e6 long"
)
STATE_SCHEMA = "last_bucket long, s long"


def ewma_monitor_stream(
    events_stream: DataFrame,
    minutes: int = 60,
    alpha_num: int = 1,
    alpha_den: int = 8,
    evict_idle: bool = True,
) -> DataFrame:
    """Append-mode stream of [event_type, bucket_start_us, n_events,
    ewma_e6] — the integer EWMA recurrence advanced per micro-batch.

    evict_idle=True (production default) arms a processing-time
    timeout that drops idle series' state. CAVEAT for bounded runs:
    with ANY GroupStateTimeout armed, Trigger.AvailableNow never
    self-terminates — the runner keeps firing empty micro-batches to
    service pending timeouts (and processAllAvailable never settles).
    Bounded replays / tests must either pass evict_idle=False (state
    is finite anyway) or stop() the query explicitly."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    win_us = 60_000_000 * minutes
    a, dn = alpha_num, alpha_den

    def update(key, pdfs, state: GroupState):
        (event_type,) = key
        if state.hasTimedOut:  # idle series: drop its O(1) state
            state.remove()
            yield pd.DataFrame(
                [],
                columns=[
                    "event_type",
                    "bucket_start_us",
                    "n_events",
                    "ewma_e6",
                ],
            )
            return
        counts: dict[int, int] = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pandas_micros(pdf["ts"])
            for b in (us - us % win_us).tolist():
                counts[b] = counts.get(b, 0) + 1
        rows = []
        if counts:
            if state.exists:
                last_b, s = state.get
            else:
                last_b, s = None, None
            max_b = max(counts)
            # late data (bucket <= stored mark) is dropped; the fold
            # starts one bucket past the mark, zero-filling gaps
            start = min(counts) if last_b is None else last_b + win_us
            b = start
            while b <= max_b:
                x = counts.get(b, 0)
                if s is None:
                    s = x * E6
                else:
                    s = (a * x * E6 + (dn - a) * s) // dn
                rows.append((event_type, b, x, s))
                b += win_us
            if rows:
                state.update((rows[-1][1], s))
        # Re-arm OUTSIDE the rows-branch: Spark clears any previously
        # armed timeout on every invocation, so a micro-batch carrying
        # only late data (all buckets <= the stored mark) would
        # otherwise permanently disarm idle-state eviction for this
        # series — a slow state-store leak.
        if evict_idle and state.exists:
            state.setTimeoutDuration(3_600_000)
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "bucket_start_us",
                "n_events",
                "ewma_e6",
            ],
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
