"""Streaming KS drift monitor: the incremental twin of the batch
``operators/traindata.ks_source_drift`` — per ingest source, the
two-sample Kolmogorov-Smirnov distance between the source's
doc-length distribution and the whole corpus so far, refreshed every
micro-batch.

State shape, replay safety, and crash/recovery follow the shared
sink-as-state convention in ``streaming/statesink.py``: the carried
state is the COMPRESSED (source, x, c) count table — exactly the
table the batch operator reduces the corpus to before its windows,
so the streamed readout is definitionally the batch operator applied
to everything ingested so far (the parity the test pins). State size
is |sources| x |distinct lengths| — monitoring-dashboard grain,
independent of corpus row count; at 100 TB the per-batch merge is
one count-keyed union-aggregate over a tiny table plus the KS
windows over the compressed domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators.traindata import ks_from_counts
from graph500_spark.streaming.statesink import keyed_count_merge_batch

COUNT_SCHEMA = "source string, x long, c long"


def start_drift_monitor(
    spark: SparkSession,
    source_path: str,
    counts_out: str,
    drift_out: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Consume a documents directory as a file stream; after each
    micro-batch, ``drift_out`` holds [source, n_source, ks_ppm,
    at_value] for the corpus ingested so far."""
    from graph500_spark.streaming.corpus_ingest import document_stream

    def extract(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                "source", F.col("n_chars").cast("long").alias("x")
            )
            .groupBy("source", "x")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    merge_batch = keyed_count_merge_batch(
        counts_out,
        drift_out,
        checkpoint,
        keys=["source", "x"],
        extract=extract,
        readout=ks_from_counts,
    )

    return (
        document_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_drift(spark: SparkSession, drift_out: str) -> DataFrame:
    """The per-source drift readout as of the last completed batch."""
    return spark.read.parquet(drift_out)
