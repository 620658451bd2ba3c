"""Replay-safe sink-as-state for foreachBatch keyed-count monitors.

The convention (shared by the KS drift monitor and the heavy-hitters
monitor): the carried state is a COMPRESSED keyed count table — the
exact table the batch operator reduces the corpus to before its final
windows/top-k — persisted to a parquet sink after every micro-batch,
so the streamed readout is definitionally the batch operator applied
to everything ingested so far. State size is the key-domain size
(sources × value grid, vocabulary), independent of corpus row count;
at 100 TB the per-batch merge is one count-keyed union-aggregate over
a tiny table.

Replay safety: foreachBatch is AT-LEAST-ONCE. Each counts overwrite
embeds the stream's checkpoint path and the batch_id it already
includes (one write — the marker can never disagree with the counts
it describes). If a crash lands between the counts write and the
streaming checkpoint commit, the restarted stream replays that batch;
the seeded (ckpt, batch_id) marker detects the replay (same
checkpoint, batch_id <= persisted) and skips the merge instead of
double-counting, re-emitting only the readout. A FRESH stream over
the same sink (new checkpoint dir, batch ids restarting at 0) has a
different checkpoint path, so its batches always merge — the
deliberate resume-across-streams path.

Seeding: only a MISSING sink means fresh start; a corrupt or
transiently unreadable sink raises instead of silently resetting the
monitor to zero state.
"""

from __future__ import annotations

from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.functions.plantrunc import truncate_plan

_META_COLS = ("ckpt", "batch_id")


def _is_missing_path(exc: AnalysisException) -> bool:
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def keyed_count_merge_batch(
    counts_out: str,
    readout_out: str,
    checkpoint: str,
    keys: list[str],
    extract: Callable[[DataFrame], DataFrame],
    readout: Callable[[DataFrame], DataFrame],
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function for a keyed-count monitor.

    ``extract(batch_df)`` reduces one micro-batch to its
    [*keys, c: long] count table; ``readout(counts_df)`` maps the
    merged state to the user-facing readout written to
    ``readout_out`` after each batch.
    """
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
                seed = snap.select(*keys, "c").persist()
                seed.count()
                state["counts"] = seed
                if all(c in snap.columns for c in _META_COLS):
                    meta = snap.select(*_META_COLS).first()
                    if meta is not None:
                        state["applied"] = (meta["ckpt"], meta["batch_id"])
            except AnalysisException as exc:
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
            # at-least-once replay: already merged into the persisted
            # snapshot — refresh only the readout (idempotent), which
            # the crash may have skipped
            readout(prev).write.mode("overwrite").parquet(readout_out)
            return
        new = extract(batch_df)
        merged = (
            (new if prev is None else prev.unionByName(new))
            .groupBy(*keys)
            .agg(F.sum("c").cast("long").alias("c"))
            .transform(truncate_plan)
        )
        if prev is not None:
            prev.unpersist()
        state["counts"] = merged
        state["applied"] = (checkpoint, batch_id)
        merged.withColumn("ckpt", F.lit(checkpoint)).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(counts_out)
        readout(merged).write.mode("overwrite").parquet(readout_out)

    return merge_batch
