"""HITS (hubs & authorities) by fixed-iteration mutual reinforcement.

Companion centrality to operators/pagerank.py over a DIRECTED edge
list (on a symmetrized graph HITS degenerates to hub ≡ auth, so the
registry runs it on the directed dedup'd fixture): auth(v) = Σ hub(u)
over in-edges, hub(u) = Σ auth(v) over out-edges; HITS is linear so
the L1 normalization is deferred to the final output (a pure scale
factor per half-step that cancels). Fixed iteration count ⇒ the
result is an exact algebraic function of the input and the DuckDB
oracle unrolls the same deferred arithmetic
(plans/queries.py::hits_sql).

Scale notes: each half-step is one equi-join of the (broadcastable
under driver-known count) score vector against the stationary cached
edge table + a map-side-partial sum — the PageRank iteration's plan,
twice per round — and the eager localCheckpoint bounding plan depth
is the ONLY driver barrier: no per-step totals, no scalar
``collect``s. The two L1 totals are broadcast-cross-joined once at
the end, inside the dataflow. Output scaled ×n_vertices and rounded
to 5 (the cross-engine float convention) so the hash has
discrimination left after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hits(
    spark: SparkSession,
    edges_directed: DataFrame,
    n_iterations: int = 5,
    broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """[vertex, hub, auth] after `n_iterations` rounds from the
    uniform authority vector over a directed [src, dst] edge list."""
    edges = edges_directed.select("src", "dst").persist()
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()

    auth = verts.select(
        "vertex", (F.lit(1.0) / F.lit(float(n))).alias("score")
    ).localCheckpoint(eager=True)
    hub = auth

    # HITS is linear, so per-half-step L1 normalization is a pure
    # scale factor that cancels in the final normalized output —
    # DEFER it: each half-step is just join + map-side-partial sum +
    # left-join + eager checkpoint (the only driver barrier), with no
    # per-step total agg or broadcast build. Both L1 divisions happen
    # once at the end, inside the dataflow. The DuckDB oracle
    # (plans/queries.py::hits_sql) unrolls the identical deferred
    # arithmetic so the float sequences match. Magnitudes stay finite:
    # raw ~ (avg_degree)^k / n, ~1e12 for k=10 at sf0.1 — well inside
    # double. Eager checkpointing per half-step is load-bearing: a
    # lazy nested half-step re-evaluates its input subtree through
    # every consuming branch (measured 16s vs 9s at sf0.1).
    def half_step(scores: DataFrame, out_edges: bool) -> DataFrame:
        """sum scores over (out_edges ? dst : src) neighbors (raw,
        unnormalized)."""
        s = scores.withColumnRenamed(
            "vertex", "dst" if out_edges else "src"
        )
        if n <= broadcast_rows:
            s = F.broadcast(s)
        raw = (
            edges.join(s, "dst" if out_edges else "src")
            .groupBy(
                F.col("src" if out_edges else "dst").alias("vertex")
            )
            .agg(F.sum("score").alias("raw"))
        )
        return (
            verts.join(raw, "vertex", "left")
            .select(
                "vertex", F.coalesce("raw", F.lit(0.0)).alias("score")
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(n_iterations):
        new_hub = half_step(auth, out_edges=True)
        hub.unpersist()
        hub = new_hub
        new_auth = half_step(hub, out_edges=False)
        auth.unpersist()
        auth = new_auth

    h_total = hub.agg(F.sum("score").alias("h_total"))
    a_total = auth.agg(F.sum("score").alias("a_total"))
    out = (
        hub.withColumnRenamed("score", "h")
        .join(auth.withColumnRenamed("score", "a"), "vertex")
        .crossJoin(F.broadcast(h_total))
        .crossJoin(F.broadcast(a_total))
        .select(
            "vertex",
            F.round(
                F.col("h") / F.col("h_total") * F.lit(float(n)), 5
            ).alias("hub"),
            F.round(
                F.col("a") / F.col("a_total") * F.lit(float(n)), 5
            ).alias("auth"),
        )
    )
    edges.unpersist()
    return out
