"""Custom stateful streaming via Spark 4's transformWithStateInPandas
— the successor API to applyInPandasWithState (which sessions.py
uses): typed per-key state handles (ValueState/ListState/MapState)
with an explicit StatefulProcessor lifecycle instead of a single
GroupState blob.

Operator here: per-user running activity totals — every micro-batch
emits the user's UPDATED lifetime (n_events, value_sum_c) after
folding that batch's rows into ValueState. The canonical
"incremental aggregate with addressable state" shape: at 100 TB the
state store shards by user key across executors and each batch
touches only the keys present in it.

Exactness: value is cents-exact in the testdata, so state holds exact
integers and the bounded-input final emission equals the batch
groupBy — asserted by tests/test_stateful_tws.py.

Environment gate: the transformWithState wire protocol needs the
Python ``protobuf`` package, which this container does not ship (no
pip installs allowed), so the runtime path is guarded by
``tws_available()`` and the test skips without it — the same honest
env-gating pattern as the optional multimodal codecs. The
applyInPandasWithState sessionizer (streaming/sessions.py) is the
always-available stateful path; this module is the forward-looking
twin on the successor API.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum_c long"


def tws_available() -> bool:
    """True iff the transformWithState Python protocol can run here
    (requires the google.protobuf package)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState[(n_events, value_sum_c)] per user; emits the updated
    totals once per (user, batch)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n_events long, value_sum_c long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, s = (0, 0)
        if self._state.exists():
            n, s = self._state.get()
        for pdf in rows:
            n += len(pdf)
            # value arrives cents-exact; round like the batch mirror
            s += int(round(pdf["value"].astype(float).sum() * 100))
        self._state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum_c": [s],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running totals via
    transformWithStateInPandas (update mode, processing-time)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_running_totals_to_memory(
    spark: SparkSession,
    source_path: str,
    table: str = "tws_totals",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain a bounded event directory through the stateful processor
    into a memory sink; the LAST row per user is the lifetime total."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    # transformWithState requires the RocksDB state store (the default
    # HDFS-backed provider does not implement its state API)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        q = (
            running_totals_stream(reader.parquet(source_path))
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if saved is not None:
            spark.conf.set(provider_key, saved)
        else:
            spark.conf.unset(provider_key)
    return spark.table(table)


def batch_totals(events: DataFrame) -> DataFrame:
    """Batch mirror: the bounded-input ground truth the stream must
    converge to (exact integer cents)."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .alias("value_sum_c"),
    )
