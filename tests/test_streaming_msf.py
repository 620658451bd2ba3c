"""Incremental streaming MSF == batch MSF over the full edge log
(the sparsification property MSF(A∪B) = MSF(MSF(A)∪B) under the
strict (weight, lo, hi) edge order)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _forest_set(rows):
    return {(r["src"], r["dst"], round(r["weight"], 9)) for r in rows}


def _weighted(spark, scale):
    from graph500_spark.sources.generator import generate_kronecker_edges

    raw = generate_kronecker_edges(spark, scale, 16)
    # deterministic synthetic weights WITH ties, to exercise the
    # (weight, lo, hi) tie-break across the incremental boundary
    return raw.select(
        "src",
        "dst",
        ((F.col("src") * 31 + F.col("dst") * 17) % 7).cast("double")
        .alias("weight"),
    )


def test_incremental_msf_equals_batch(spark, tmp_path):
    from graph500_spark.operators.mst import minimum_spanning_forest
    from graph500_spark.streaming.graph_msf import start_incremental_msf

    edges = _weighted(spark, 8)
    src_dir = str(tmp_path / "edges_in")
    edges.repartition(8).write.parquet(src_dir)

    forest_out = str(tmp_path / "forest_out")
    q = start_incremental_msf(
        spark, src_dir, forest_out, str(tmp_path / "ckpt"), 4
    )
    q.awaitTermination()

    got = _forest_set(spark.read.parquet(forest_out).collect())
    want = _forest_set(minimum_spanning_forest(spark, edges).collect())
    assert got == want
    assert len(want) > 100  # a real forest, not a trivial graph


def test_incremental_msf_restart_and_reprocess_idempotent(spark, tmp_path):
    from graph500_spark.operators.mst import minimum_spanning_forest
    from graph500_spark.streaming.graph_msf import start_incremental_msf

    edges = _weighted(spark, 7)
    first = edges.filter(F.col("src") % 2 == 0)
    src_dir = str(tmp_path / "edges_in")
    first.repartition(2).write.parquet(src_dir)

    forest_out = str(tmp_path / "forest_out")
    q = start_incremental_msf(
        spark, src_dir, forest_out, str(tmp_path / "ckpt1"), 1
    )
    q.awaitTermination()

    edges.filter(F.col("src") % 2 != 0).repartition(2).write.mode(
        "append"
    ).parquet(src_dir)
    # fresh query: seeds from the sink, reprocesses everything — the
    # red-rule argument makes re-offered discarded edges harmless
    q = start_incremental_msf(
        spark, src_dir, forest_out, str(tmp_path / "ckpt2"), 1
    )
    q.awaitTermination()

    got = _forest_set(spark.read.parquet(forest_out).collect())
    want = _forest_set(minimum_spanning_forest(spark, edges).collect())
    assert got == want
