"""Volume-derived shuffle partitioning for iterative dataflows.

The round-11 s24 knob probe (PLANS.md) pinned the rule: size an
iterative loop's shuffles to DATA VOLUME (~2M edge rows per
partition), not core count. At 268M edges, 32 partitions put ~7.5M
rows in every per-level sort-merge task — spill territory; ~2M
rows/task cut task_cpu 23% and wall 26% against the warm baseline.
AQE coalesces downstream shuffles but cannot RESIZE the loop's
explicit exchanges upward, and it never re-derives the loop's
``repartition`` width — the driver has to pick it.

``resolve_shuffle_partitions`` is that rule as the engine-wide
default ("auto") for bfs/sssp/pregel loops:

* an explicit int is used as-is (caller knows best);
* ``None`` inherits the session value (explicit opt-out — the
  documented cluster-scale posture where session tuning + AQE
  govern);
* ``"auto"`` derives ``clamp(32, n_edges / 2M, 512)`` and applies it
  ONLY when it exceeds the current session value. That guard is why
  the default is safe below the rung: at s20/s22 (8M / 67M edges)
  the derived value (32 / 33) does not exceed a 32-partition session
  and behavior is byte-identical to round 11; the override engages
  exactly where the probe measured the win (s24: 268M edges → 134).

The edge count comes from ``edge_count`` when the caller already
knows it (generators and benchmarks do — never a count job), else
from ``count_fn`` when the operator has a persisted edge table whose
materialization the count merely fronts (bfs's prepartitioned table,
pregel's cached edges); when neither is available "auto" degrades to
inherit-session rather than schedule a scan over unpersisted lineage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

ROWS_PER_PARTITION = 2_000_000
AUTO_FLOOR = 32
AUTO_CAP = 512


def derived_partitions(n_rows: int) -> int:
    """clamp(AUTO_FLOOR, n_rows / ROWS_PER_PARTITION, AUTO_CAP)."""
    return max(AUTO_FLOOR, min(AUTO_CAP, int(n_rows) // ROWS_PER_PARTITION))


def resolve_shuffle_partitions(
    spark: SparkSession,
    requested: int | str | None,
    edge_count: int | None = None,
    count_fn: Callable[[], int] | None = None,
) -> int | None:
    """Resolve a loop's shuffle-partition override; None = leave the
    session value untouched (see module docstring for the contract)."""
    if requested is None:
        return None
    if requested != "auto":
        return int(requested)
    n = edge_count
    if n is None:
        if count_fn is None:
            return None
        n = count_fn()
    # the guard compares the UNCLAMPED requirement to the session
    # width: a small graph needs few partitions regardless of the
    # floor, and forcing floor-width shuffles onto a narrower session
    # (test sessions run 8) would widen exactly the small cases the
    # rule is not about
    need = int(n) // ROWS_PER_PARTITION
    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if need <= session:
        return None
    return derived_partitions(n)


def widen_narrow_input(df, *keys: str, probe=None):
    """Hash-repartition ``df`` up to ``defaultParallelism`` when its
    current layout is NARROWER — the size-aware input for CPU-heavy
    fan-out stages (wedge joins: guide §2.5/§1.2 step 1).

    Why: a quadratic-fan-out stage (wedge enumeration) inherits its
    task count from the input layout when the optimizer broadcasts the
    other join sides — a persisted graph laid out at 8 partitions runs
    the O(Σ deg²) compute on 8 of 32 cores. One linear keyed exchange
    of the input buys full-machine parallelism for the quadratic
    stage. A WIDE input (cluster scale: thousands of scan partitions)
    is returned untouched — repartitioning it down to core count would
    be the opposite of the point.

    The width probe reads ``getNumPartitions()`` from ``probe``
    (default: ``df`` itself); pass a cached/scan-rooted frame (the
    persisted graph fixture, a checkpoint leaf) so the probe is
    plan-compile only — no job. Keys must include the downstream join
    key so a later shuffle join can reuse the exchange (§2.4)."""
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = (probe if probe is not None else df).rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans: skip widening
        return df
    if cur >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)
