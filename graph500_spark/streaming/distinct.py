"""Streaming KMV distinct-token monitor: incremental vocabulary
cardinality of everything ingested so far — the streamed twin of
``operators/sketches.kmv_distinct_tokens``.

State shape: the k smallest distinct token hashes, carried through
the shared sink-as-state discipline (``streaming/statesink.py``)
with its ``truncate_state`` hook — the first bounded-sketch consumer
of that hook. KMV is exactly mergeable under truncation (k-smallest
of (k-smallest(A) ∪ B) == k-smallest(A ∪ B)), so the streamed
estimate EQUALS the batch operator over the full ingested corpus —
an equality the test pins, not an approximate match. State size is k
rows regardless of corpus size; the per-batch merge is a union +
sort-limit over ≤ k + |batch vocabulary| rows.

Crash/replay behavior is inherited wholesale from statesink:
versioned _SUCCESS-committed snapshots, (ckpt, batch_id) replay
marker, torn-write recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators.sketches import _kmv_est_spark
from graph500_spark.operators.text import SPARK_TOKENS, spark_strhash
from graph500_spark.streaming.statesink import keyed_count_merge_batch


def start_distinct_monitor(
    spark: SparkSession,
    source_path: str,
    counts_out: str,
    readout_out: str,
    checkpoint: str,
    k: int = 64,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Consume a documents directory as a file stream; after each
    micro-batch, ``readout_out`` holds one row [k, n_sketch,
    kth_hash, est_distinct] for the corpus ingested so far."""
    from graph500_spark.streaming.corpus_ingest import document_stream

    def extract(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                F.explode(F.expr(SPARK_TOKENS)).alias("token")
            )
            .select(F.expr(spark_strhash("token")).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    def trunc(merged: DataFrame) -> DataFrame:
        return merged.orderBy("h").limit(k)

    def readout(counts: DataFrame) -> DataFrame:
        est = _kmv_est_spark("n_sketch", "kth_hash", k, "n_sketch")
        return counts.agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").cast("long").alias("kth_hash"),
        ).select(
            F.lit(k).cast("long").alias("k"),
            "n_sketch",
            "kth_hash",
            F.expr(est).alias("est_distinct"),
        )

    merge_batch = keyed_count_merge_batch(
        counts_out,
        readout_out,
        checkpoint,
        keys=["h"],
        extract=extract,
        readout=readout,
        truncate_state=trunc,
    )

    return (
        document_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct(spark: SparkSession, readout_out: str) -> DataFrame:
    """The vocabulary-cardinality readout as of the last batch."""
    return spark.read.parquet(readout_out)
