"""HITS (hubs & authorities) by fixed-iteration mutual reinforcement.

Companion centrality to operators/pagerank.py over a DIRECTED edge
list (on a symmetrized graph HITS degenerates to hub ≡ auth, so the
registry runs it on the directed dedup'd fixture): auth(v) = Σ hub(u)
over in-edges, hub(u) = Σ auth(v) over out-edges, L1-normalized after
each half-step. Fixed iteration count ⇒ the result is an exact
algebraic function of the input and the DuckDB oracle unrolls the same
half-steps (plans/queries.py::hits_sql).

Scale notes: each half-step is one equi-join of the (broadcastable
under driver-known count) score vector against the stationary cached
edge table + a map-side-partial sum — the PageRank iteration's plan,
twice per round. The L1 norm stays IN the dataflow: the 1-row total
is broadcast-cross-joined back onto the scores (Spark reuses the
shuffle between the two branches), so the only driver sync per
half-step is the eager localCheckpoint that bounds plan depth — no
scalar ``collect``s. Output scaled ×n_vertices and rounded to 5 (the
cross-engine float convention) so the hash has discrimination left
after rounding.
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

    def half_step(scores: DataFrame, out_edges: bool) -> DataFrame:
        """sum scores over (out_edges ? dst : src) neighbors, L1-norm."""
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
        full = verts.join(raw, "vertex", "left").select(
            "vertex", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        total = full.agg(F.sum("raw").alias("l1_total"))
        # eager checkpoint per half-step: `full` feeds both the total
        # agg and the main branch, so a lazy half-step would re-evaluate
        # its input subtree through both — nesting the hub step lazily
        # inside the auth step measured 16s vs 9s at sf0.1. The
        # checkpoint is the ONLY driver barrier per half-step (the L1
        # total never leaves the dataflow).
        return (
            full.crossJoin(F.broadcast(total))
            .select(
                "vertex", (F.col("raw") / F.col("l1_total")).alias("score")
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

    out = (
        hub.withColumnRenamed("score", "h")
        .join(auth.withColumnRenamed("score", "a"), "vertex")
        .select(
            "vertex",
            F.round(F.col("h") * F.lit(float(n)), 5).alias("hub"),
            F.round(F.col("a") * F.lit(float(n)), 5).alias("auth"),
        )
    )
    edges.unpersist()
    return out
