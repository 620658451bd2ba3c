"""Stats-clean plan truncation for iterative dataflows.

The hazard (measured, Spark 4.1): ``df.localCheckpoint(eager=True)``
truncates the PHYSICAL lineage but propagates the original plan's
*statistics* into the new ``LogicalRDD`` leaf.  Catalyst's
size-in-bytes estimator multiplies child sizes at every join
(``SizeInBytesOnlyStatsPlanVisitor``), so in an iterative loop whose
round r references round r−1's frame more than once the sizeInBytes
VALUE compounds geometrically — digits grow Fibonacci-like (~×1.6 per
round; measured 4 → 428 digits in 8 rounds of the CC shape).  After a
few dozen rounds the stats are million-digit BigIntegers and every
plan/persist call drags ``BigInteger.multiplyToomCook3`` for CPU-
minutes — the incremental-CC streaming test froze the whole suite
this way (stats compound across micro-batches too, because the
carried state's checkpoint keeps re-propagating them).

``truncate_plan`` materializes the frame (eager local checkpoint,
same semantics as before) and then rewraps the checkpointed RDD in a
FRESH ``LogicalRDD`` without origin stats, so every round restarts
from the flat ``defaultSizeInBytes`` leaf estimate.  Loops that want
a broadcast join still say so explicitly (every loop here does), so
losing the propagated estimate costs nothing.

Block lifecycle: the wrapper shares the checkpointed RDD; explicit
``unpersist()`` on the wrapper is a no-op, and superseded rounds'
blocks are reclaimed by Spark's ContextCleaner when the driver drops
the last reference (the loops rebind their variables every round, so
this happens promptly).

The rewrap uses two JVM-internal calls (``parseDataType``,
``internalCreateDataFrame``); if a future Spark moves them, the
helper degrades to the plain eager localCheckpoint — correct, merely
re-exposed to the stats pathology at extreme round counts.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame

# A/B knob: SPARK_GRAFT_PLANTRUNC=off degrades to the plain eager
# localCheckpoint (stats propagated) so the rewrap's cost/benefit can be
# measured in isolation — used by tools/ab_plantrunc.py; never set it in
# long-running loops (reintroduces the BigInteger stats blowup).
_warned_fallback = False


def truncate_plan(df: DataFrame, eager: bool = True) -> DataFrame:
    """Eagerly materialize ``df`` and return it as a leaf plan with
    RESET statistics (see module docstring).  Drop-in replacement for
    ``df.localCheckpoint(eager=True)`` in iterative loops; chainable
    as ``df.transform(truncate_plan)``."""
    ck = df.localCheckpoint(eager=eager)
    if os.environ.get("SPARK_GRAFT_PLANTRUNC", "") == "off":
        return ck
    try:
        spark = ck.sparkSession
        jrdd = ck._jdf.queryExecution().toRdd()
        jschema = spark._jsparkSession.parseDataType(ck.schema.json())
        jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jschema, False
        )
        return DataFrame(jdf, spark)
    except Exception:  # pragma: no cover — internal-API drift guard
        # Visible once per process: silently degrading would re-expose
        # iterative loops to the geometric stats blowup after a Spark
        # upgrade moves the two internal calls above.
        global _warned_fallback
        if not _warned_fallback:
            _warned_fallback = True
            warnings.warn(
                "truncate_plan: stats-clean rewrap unavailable on this "
                "Spark build; falling back to plain localCheckpoint "
                "(propagated-stats blowup hazard in long loops)",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck


def truncate_plan_lazy(df: DataFrame) -> DataFrame:
    """Plan-truncation barrier WITHOUT the eager materialization job
    (guide §1.2/§5 — driver barriers are the per-superstep floor).

    The returned frame is a stats-clean leaf over a LAZILY
    local-checkpoint-marked RDD: the FIRST action that computes it —
    typically the loop's own per-round scalar readout (a count, a
    fixpoint probe, a broadcast build of the next round's join input)
    — materializes and caches it as a side effect, so the checkpoint
    job and the readout job collapse into one driver barrier. After
    that first action the frame behaves exactly like the eager form
    (cached leaf, truncated lineage, flat stats).

    Loops that previously paid ``truncate_plan`` (one job) + ``count``
    (a second job) per round pay ONE job with

        nxt = candidates.transform(truncate_plan_lazy)
        n = nxt.count()          # materializes + counts in one job
    """
    return truncate_plan(df, eager=False)
