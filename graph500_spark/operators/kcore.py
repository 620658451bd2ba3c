"""k-core extraction by iterative peeling.

Engine capability beyond the reference surface (companion to
operators/components.py / pagerank.py / triangles.py over the same
cleaned symmetric edge table): the k-core is the maximal subgraph in
which every vertex has degree ≥ k — the standard density filter before
expensive graph analytics (e.g. drop the long tail before triangle
enumeration).

Algorithm: repeatedly delete vertices of current degree < k until none
remain (the deletion fixpoint is unique, so peeling order is
irrelevant — the result is deterministic and oracle-checkable). Each
round is one degree aggregation + one semi-join; the surviving edge
set is localCheckpoint'ed per round (same lineage discipline as every
other loop in this engine). Rounds needed = peeling depth, typically
tiny on heavy-tailed graphs; the DuckDB oracle unrolls a fixed round
budget ≥ the fixpoint depth (extra rounds are no-ops on both sides,
so any budget past convergence yields the identical result —
plans/queries.py::k_core_sql).

Scale notes: per round ONE shuffle (the degree groupBy; the semi-joins
reuse its output broadcast — survivor vertex lists shrink
monotonically). Peeling touches only the shrinking edge set; at 100 TB
the first round's degree agg is the same job as A1 over the bucketed
edge table (exchange-free on src).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges_clean: DataFrame,
    k: int,
    max_rounds: int = 16,
    broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """[vertex, degree]: vertices of the k-core with their within-core
    degree. Empty result if the graph has no k-core."""
    # No checkpoint of the input — at scale the full edge table is huge
    # and only the (shrinking) survivor sets are loop state; round ≥ 1
    # edge sets are checkpointed as they are produced.
    edges = edges_clean.select("src", "dst")
    n_edges = edges.count()

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = edges.groupBy(F.col("src").alias("vertex")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        survivors = deg.filter(F.col("degree") >= k).select("vertex")
        n_vertices = deg.count()
        n_survivors = survivors.count()
        if n_survivors == n_vertices:
            break  # fixpoint: nobody peeled this round
        if n_survivors <= broadcast_rows:
            survivors = F.broadcast(survivors)
        new_edges = (
            edges.join(
                survivors.select(F.col("vertex").alias("src")), "src", "left_semi"
            )
            .join(
                survivors.select(F.col("vertex").alias("dst")), "dst", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        old = edges
        edges = new_edges
        n_edges = edges.count()
        old.unpersist()

    return edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("degree")
    ).filter(F.col("degree") >= k)
