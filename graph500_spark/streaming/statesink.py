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

Crash safety (write): each snapshot goes to a FRESH versioned
subdirectory ``<counts_out>/snap-NNNNNNNN`` with ``mode("error")``;
Spark's output committer renames task files into place and creates
``_SUCCESS`` only after the job commits, so ``_SUCCESS`` is the
commit marker. The previous committed snapshot is deleted only AFTER
the new one is durable — a crash mid-write leaves a ``_SUCCESS``-less
torn directory that seeding ignores, never a half-snapshot that
looks committed and never a destroyed predecessor (the failure modes
of a plain delete-then-overwrite). This holds on object stores too:
no rename-of-a-directory is ever relied on for atomicity, only
"marker file appears after data".

Replay safety (merge): foreachBatch is AT-LEAST-ONCE. Each snapshot
embeds the stream's checkpoint path and the batch_id it already
includes, in the same committed write as the counts. If a crash lands
between the snapshot commit and the streaming checkpoint commit, the
restarted stream replays that batch; the seeded (ckpt, batch_id)
marker detects the replay (same checkpoint, batch_id <= persisted)
and skips the merge instead of double-counting, re-emitting only the
readout. A FRESH stream over the same sink (new checkpoint dir,
batch ids restarting at 0) has a different checkpoint path, so its
batches always merge — the deliberate resume-across-streams path.

Seeding: a MISSING sink, an empty sink directory, or a sink holding
only torn (uncommitted) snapshots means fresh start; a sink directory
holding anything that is not a ``snap-*`` entry raises instead of
silently resetting the monitor to zero state. The readout sink stays
a plain overwrite: it is a derived view, rebuilt from the committed
counts on the next batch (or on replay).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_spark.functions.plantrunc import truncate_plan

_META_COLS = ("ckpt", "batch_id")
_SNAP_RE = re.compile(r"^snap-(\d{8})$")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf —
    portable across local FS / HDFS / object stores."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _list_snapshots(spark: SparkSession, counts_out: str):
    """Classify the sink directory: (committed [(ver, path)], torn
    [(ver, path)], foreign [names]). Missing dir -> all empty."""
    fs, hpath = _hadoop_fs(spark, counts_out)
    committed: list[tuple[int, str]] = []
    torn: list[tuple[int, str]] = []
    foreign: list[str] = []
    if not fs.exists(hpath):
        return committed, torn, foreign
    jvm = spark._jvm
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        m = _SNAP_RE.match(name)
        if m is None or not st.isDirectory():
            foreign.append(name)
            continue
        ver = int(m.group(1))
        spath = str(st.getPath())
        marker = jvm.org.apache.hadoop.fs.Path(spath, "_SUCCESS")
        (committed if fs.exists(marker) else torn).append((ver, spath))
    committed.sort()
    torn.sort()
    return committed, torn, foreign


def read_counts(spark: SparkSession, counts_out: str) -> DataFrame:
    """The latest COMMITTED counts snapshot (including the ckpt /
    batch_id marker columns). Raises if the sink is missing, holds no
    committed snapshot, or is not a snapshot sink."""
    committed, torn, foreign = _list_snapshots(spark, counts_out)
    if foreign:
        raise ValueError(
            f"counts sink {counts_out} has non-snapshot entries "
            f"{sorted(foreign)}; expected only snap-NNNNNNNN parquet "
            "snapshot directories — refusing to guess"
        )
    if not committed:
        raise FileNotFoundError(
            f"counts sink {counts_out} has no committed snapshot "
            f"(torn: {[p for _, p in torn]})"
        )
    return spark.read.parquet(committed[-1][1])


def keyed_count_merge_batch(
    counts_out: str,
    readout_out: str,
    checkpoint: str,
    keys: list[str],
    extract: Callable[[DataFrame], DataFrame],
    readout: Callable[[DataFrame], DataFrame],
    truncate_state: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function for a keyed-count monitor.

    ``extract(batch_df)`` reduces one micro-batch to its
    [*keys, c: long] count table; ``readout(counts_df)`` maps the
    merged state to the user-facing readout written to
    ``readout_out`` after each batch.

    ``truncate_state`` (optional) bounds the carried state after each
    merge — for sketch-shaped state whose merge is closed under
    truncation (KMV's k-smallest-hash set: k-smallest of
    (k-smallest(A) ∪ B) == k-smallest(A ∪ B), so dropping rows
    beyond k loses nothing). It must be deterministic; the drop is
    reflected in the persisted snapshot, so replay stays exact.
    """
    state: dict[str, object] = {
        "counts": None,  # DataFrame | None
        "applied": None,  # (ckpt, batch_id) already in the snapshot
        "next_ver": 0,
        "seeded": False,
    }

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_s = batch_df.sparkSession
        if not state["seeded"]:
            committed, torn, foreign = _list_snapshots(
                spark_s, counts_out
            )
            if foreign:
                raise ValueError(
                    f"counts sink {counts_out} has non-snapshot "
                    f"entries {sorted(foreign)}; expected only "
                    "snap-NNNNNNNN parquet snapshot directories — "
                    "refusing to reset monitor state"
                )
            all_vers = [v for v, _ in committed] + [v for v, _ in torn]
            state["next_ver"] = (max(all_vers) + 1) if all_vers else 0
            if committed:
                snap = spark_s.read.parquet(committed[-1][1])
                seed = snap.select(*keys, "c").persist()
                seed.count()
                state["counts"] = seed
                if all(c in snap.columns for c in _META_COLS):
                    meta = snap.select(*_META_COLS).first()
                    if meta is not None:
                        state["applied"] = (
                            meta["ckpt"],
                            meta["batch_id"],
                        )
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
        )
        if truncate_state is not None:
            merged = truncate_state(merged)
        merged = merged.transform(truncate_plan)
        ver = int(state["next_ver"])  # type: ignore[arg-type]
        snap_path = f"{counts_out}/snap-{ver:08d}"
        merged.withColumn("ckpt", F.lit(checkpoint)).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("error").parquet(snap_path)
        # the new snapshot is durable (its _SUCCESS exists) — only now
        # retire everything older, best-effort
        try:
            fs, _ = _hadoop_fs(spark_s, counts_out)
            jvm = spark_s._jvm
            com2, torn2, _ = _list_snapshots(spark_s, counts_out)
            for v, p in com2 + torn2:
                if v < ver:
                    fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
        except Exception:
            pass  # stale snapshots are inert; next batch retries
        if prev is not None:
            prev.unpersist()
        state["counts"] = merged
        state["applied"] = (checkpoint, batch_id)
        state["next_ver"] = ver + 1
        readout(merged).write.mode("overwrite").parquet(readout_out)

    return merge_batch
