"""Streaming incremental minimum spanning forest.

Companion to graph_cc.py, same contraction idea via the classic MST
sparsification property: for a strict total edge order (here
(weight, lo, hi) — deterministic even under weight ties),

    MSF(A ∪ B) = MSF(MSF(A) ∪ B)

because every edge of A discarded by MSF(A) is the maximum of some
cycle in A (red rule) and stays the maximum of that cycle in A ∪ B —
so it is never in MSF(A ∪ B). Each micro-batch therefore runs Boruvka
over (current forest ∪ batch edges): the forest carries at most
|V| − 1 rows no matter how many edges the stream has delivered, so
per-batch cost is bounded by the vertex count plus the batch size,
never the edge history.

State discipline mirrors graph_cc/corpus_ingest: the forest rides
across batches as a localCheckpoint-truncated DataFrame, with the
forest parquet sink as restart seed. Reprocessing delivered edges is
idempotent (re-offering discarded edges cannot enter the forest, by
the same red-rule argument).

Reference scope note: /root/reference is batch-only; its weighted
surface is the stubbed SSSP (SURVEY §2.7). This module belongs to the
engine-extension inventory (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators.mst import minimum_spanning_forest
from graph500_spark.functions.plantrunc import truncate_plan

WEIGHTED_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def weighted_edge_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(WEIGHTED_EDGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def start_incremental_msf(
    spark: SparkSession,
    source_path: str,
    forest_out: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | None = 8,
) -> StreamingQuery:
    """Maintain the exact MSF of all edges delivered so far; the
    forest sink always equals the batch minimum_spanning_forest over
    the full history.

    ``shuffle_partitions`` defaults low (8): the per-batch pool is
    |V| − 1 forest rows plus one micro-batch, so Boruvka's nested
    iteration is scheduling-bound, not data-bound — a production
    deployment sizes it to the batch volume."""
    state: dict[str, object] = {"forest": None, "seeded": False}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_s = batch_df.sparkSession
        if not state["seeded"]:
            try:
                seed = spark_s.read.parquet(forest_out).transform(truncate_plan)
                state["forest"] = seed
            except Exception:
                state["forest"] = None
            state["seeded"] = True
        prev = state["forest"]
        pool = (
            batch_df
            if prev is None
            else batch_df.select("src", "dst", "weight").unionByName(
                prev.select("src", "dst", "weight")
            )
        )
        forest = minimum_spanning_forest(
            spark_s, pool, shuffle_partitions=shuffle_partitions
        ).transform(truncate_plan)
        # production: transactional keyed rewrite; parquet overwrite is
        # the container-honest stand-in (the forest is <= |V|-1 rows)
        forest.write.mode("overwrite").parquet(forest_out)
        state["forest"] = forest

    return (
        weighted_edge_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
