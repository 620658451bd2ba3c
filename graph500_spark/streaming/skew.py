"""Streaming shuffle-key skew monitor: the incremental twin of
``operators/dq.key_skew_stats`` — after every micro-batch, the
hot-key/mean skew readout for everything ingested so far, so a
pipeline learns WHEN a key needs salting before the nightly join
falls over, not after.

State shape follows the shared sink-as-state convention
(``streaming/statesink.py``): the carried state is the per-key count
table — key-domain (monitoring) grain, independent of row volume —
and the readout is the SAME aggregation the batch diagnostic runs
(``dq.key_skew_from_counts``), so streamed == batch by construction.
Crash/replay behavior (versioned _SUCCESS-committed snapshots,
(ckpt, batch_id) replay marker) is inherited wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators.dq import key_skew_from_counts
from graph500_spark.streaming.statesink import keyed_count_merge_batch

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet files dropped in ``path``
    (stand-in for Kafka; the downstream plan is identical)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def start_skew_monitor(
    spark: SparkSession,
    source_path: str,
    counts_out: str,
    readout_out: str,
    checkpoint: str,
    key: str = "user_id",
    table_name: str = "events",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Consume an events directory as a file stream; after each
    micro-batch, ``readout_out`` holds the one-row skew diagnostic
    [table_name, key_col, n_rows, n_keys, max_key_n, p99_key_n,
    mean_key_n_micro, skew_ratio_micro] for the rows ingested so
    far."""

    def extract(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(F.col(key).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    def readout(counts: DataFrame) -> DataFrame:
        return key_skew_from_counts(
            counts.select("k", F.col("c").alias("n")), table_name, key
        )

    merge_batch = keyed_count_merge_batch(
        counts_out,
        readout_out,
        checkpoint,
        keys=["k"],
        extract=extract,
        readout=readout,
    )

    return (
        event_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_skew(spark: SparkSession, readout_out: str) -> DataFrame:
    """The skew readout as of the last completed batch."""
    return spark.read.parquet(readout_out)
