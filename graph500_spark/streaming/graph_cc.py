"""Streaming incremental connected components.

The batch engine computes CC over the full edge log
(operators/components.py). A long-running deployment ingesting edges
continuously should NOT pay CC-over-history per refresh: connectivity
is an equivalence relation, so the current (vertex, component) map is
a lossless summary of every edge ever seen. Each micro-batch therefore
contracts the NEW edges against the current map:

    compressed graph = { (v, component(v)) bindings }  ∪  batch edges
    new map          = min-label CC over the compressed graph

The compressed graph has |V| + |batch| rows regardless of how many
edges the stream has delivered, and its binding edges form stars
(diameter ≤ 2 per old component), so the per-batch delta-iteration
converges in a handful of rounds — per-batch cost is bounded by the
component-map size plus the batch, never by the edge history. This is
the standard incremental-CC contraction; it produces EXACTLY the batch
answer (min vertex id per component) because binding edges preserve
the connectivity partition and component ids are themselves vertex
ids, so the global min survives contraction.

State lives in two places, same discipline as corpus_ingest: a
localCheckpoint-truncated DataFrame carried across batches (hot path),
and the components parquet sink (restart seed / readers). At 100 TB
the sink write would be a keyed upsert of CHANGED rows into a
transactional table; plain parquet overwrite is the container-honest
stand-in, flagged below.

Reference scope note: /root/reference is batch-only (one
generate→construct pass, SURVEY.md §2.7) — this module is part of the
engine-extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators import graph_build as gb
from graph500_spark.operators.components import connected_components
from graph500_spark.streaming.ingest import edge_stream
from graph500_spark.functions.plantrunc import truncate_plan


def _contract(
    spark: SparkSession, batch_edges: DataFrame, prev_map: DataFrame | None
) -> DataFrame:
    """One incremental step: CC over (bindings ∪ batch edges)."""
    clean = gb.symmetrize(gb.remove_self_loops(batch_edges)).select(
        "src", "dst"
    )
    if prev_map is not None:
        bindings = prev_map.filter(
            F.col("vertex") != F.col("component")
        ).select(
            F.col("vertex").alias("src"), F.col("component").alias("dst")
        )
        clean = clean.unionByName(
            bindings.unionByName(
                bindings.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
        )
    cc = connected_components(spark, clean)
    if prev_map is not None:
        # Every prev vertex belonging to a component of size >= 2 has a
        # binding edge (members as src, representatives as dst), so the
        # CC above re-labels ALL of them. The only prev vertices absent
        # from cc are isolated singletons no batch edge touched — their
        # component (themselves) cannot have changed; re-attach as-is.
        carried = prev_map.join(cc.select("vertex"), "vertex", "left_anti")
        cc = cc.unionByName(carried)
    return cc


def start_incremental_cc(
    spark: SparkSession,
    source_path: str,
    components_out: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the incremental CC maintainer. The components sink always
    holds the exact batch-CC answer for every edge delivered so far."""
    state: dict[str, object] = {"map": None, "seeded": False}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_s = batch_df.sparkSession
        if not state["seeded"]:
            try:
                seed = spark_s.read.parquet(components_out).transform(truncate_plan)
                state["map"] = seed
            except Exception:
                state["map"] = None
            state["seeded"] = True
        new_map = _contract(spark_s, batch_df, state["map"]).transform(truncate_plan)
        # production: keyed upsert of changed rows into a transactional
        # table; overwrite is the plain-parquet stand-in
        new_map.write.mode("overwrite").parquet(components_out)
        state["map"] = new_map

    return (
        edge_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
