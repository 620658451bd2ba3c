"""Streaming KS drift monitor: the incremental twin of the batch
``operators/traindata.ks_source_drift`` — per ingest source, the
two-sample Kolmogorov-Smirnov distance between the source's
doc-length distribution and the whole corpus so far, refreshed every
micro-batch.

State shape (the sink-as-state convention of corpus_ingest): the
carried state is the COMPRESSED (source, x, c) count table — exactly
the table the batch operator reduces the corpus to before its
windows, so the streamed readout is definitionally the batch operator
applied to everything ingested so far (the parity the test pins).
State size is |sources| x |distinct lengths| — monitoring-dashboard
grain, independent of corpus row count; at 100 TB the per-batch merge
is one count-keyed union-aggregate over a tiny table plus the
KS windows over the compressed domain.

Crash/recovery: state seeds from the persisted counts parquet at
stream (re)start. foreachBatch is AT-LEAST-ONCE, so the snapshot
carries replay metadata: each counts overwrite embeds the stream's
checkpoint path and the batch_id it already includes. If a crash
lands between the counts write and the streaming checkpoint commit,
the restarted stream replays that batch — the seeded (ckpt, batch_id)
marker detects the replay (same checkpoint, batch_id <= persisted)
and skips the merge instead of double-counting, re-emitting only the
drift readout (which may be stale if the crash preceded its write).
A FRESH stream over the same sink (new checkpoint dir, batch ids
restarting at 0) has a different checkpoint path, so its batches
always merge — that is the deliberate resume-across-streams path the
restart test pins.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.functions.plantrunc import truncate_plan
from graph500_spark.operators.traindata import ks_from_counts

COUNT_SCHEMA = "source string, x long, c long"
_META_COLS = ("ckpt", "batch_id")


def _is_missing_path(exc: AnalysisException) -> bool:
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


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

    state: dict[str, object] = {
        "counts": None,  # DataFrame | None
        "applied": None,  # (ckpt, batch_id) already in the snapshot
        "seeded": False,
    }

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_s = batch_df.sparkSession
        if not state["seeded"]:
            try:
                snap = spark_s.read.parquet(counts_out)
                seed = snap.select("source", "x", "c").persist()
                seed.count()
                state["counts"] = seed
                if all(c in snap.columns for c in _META_COLS):
                    meta = snap.select(*_META_COLS).first()
                    if meta is not None:
                        state["applied"] = (meta["ckpt"], meta["batch_id"])
            except AnalysisException as exc:
                # only a missing sink means "fresh start"; a corrupt or
                # unreadable sink must raise, not silently reset to zero
                if not _is_missing_path(exc):
                    raise
                state["counts"] = None
            state["seeded"] = True
        prev = state["counts"]
        applied = state["applied"]
        if (
            applied is not None
            and prev is not None
            and applied[0] == checkpoint
            and batch_id <= applied[1]
        ):
            # at-least-once replay: this batch is already merged into
            # the persisted snapshot. Skip the merge; refresh only the
            # readout (idempotent), which the crash may have skipped.
            ks_from_counts(prev).write.mode("overwrite").parquet(drift_out)
            return
        new = batch_df.select(
            "source", F.col("n_chars").cast("long").alias("x")
        ).groupBy("source", "x").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        merged = (
            (new if prev is None else prev.unionByName(new))
            .groupBy("source", "x")
            .agg(F.sum("c").cast("long").alias("c"))
            .transform(truncate_plan)
        )
        if prev is not None:
            prev.unpersist()
        state["counts"] = merged
        state["applied"] = (checkpoint, batch_id)
        # snapshot state + replay marker together (one write, so the
        # marker can never disagree with the counts it describes)
        merged.withColumn("ckpt", F.lit(checkpoint)).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(counts_out)
        ks_from_counts(merged).write.mode("overwrite").parquet(drift_out)

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
