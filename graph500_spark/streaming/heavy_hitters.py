"""Streaming heavy-hitters monitor: the incremental twin of the batch
``operators/text.heavy_hitter_tokens`` — the corpus-global top-k
frequent tokens, refreshed every micro-batch.

The live stop-list / vocabulary-pressure dashboard a training-data
ingest pipeline watches: as documents stream in, the top-k token
table converges to exactly the batch operator's answer over
everything ingested so far (the parity the test pins, modulo the
batch op's n_docs column — a streaming distinct-doc count would need
per-token doc-id sets as state, which is corpus-sized; the monitor
deliberately carries counts only).

State shape, replay safety, and crash/recovery follow the shared
sink-as-state convention in ``streaming/statesink.py``: the carried
state is the (token, c) count table — vocabulary-sized, independent
of corpus row count. Per batch: one token explode + map-side partial
count compresses the micro-batch to its vocabulary, one count-keyed
union-aggregate merges it into the state, and the readout is a
distributed TakeOrdered over the state (never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators.text import SPARK_TOKENS
from graph500_spark.streaming.statesink import keyed_count_merge_batch

COUNT_SCHEMA = "token string, c long"


def start_heavy_hitters_monitor(
    spark: SparkSession,
    source_path: str,
    counts_out: str,
    topk_out: str,
    checkpoint: str,
    k: int = 100,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Consume a documents directory as a file stream; after each
    micro-batch, ``topk_out`` holds [token, n_occurrences] — the k
    most frequent tokens of the corpus ingested so far, ordered by
    (n_occurrences desc, token asc) like the batch operator."""
    from graph500_spark.streaming.corpus_ingest import document_stream

    def extract(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(F.explode(F.expr(SPARK_TOKENS)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    def readout(counts: DataFrame) -> DataFrame:
        return (
            counts.select(
                "token", F.col("c").alias("n_occurrences")
            )
            .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
            .limit(k)
        )

    merge_batch = keyed_count_merge_batch(
        counts_out,
        topk_out,
        checkpoint,
        keys=["token"],
        extract=extract,
        readout=readout,
    )

    return (
        document_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_heavy_hitters(spark: SparkSession, topk_out: str) -> DataFrame:
    """The top-k readout as of the last completed batch."""
    return spark.read.parquet(topk_out)
