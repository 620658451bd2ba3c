"""Incremental streaming CC must converge to the batch answer: the
component map after streaming the edge log in micro-batches equals
connected_components over the full log in one pass."""

from __future__ import annotations

import pyspark.sql.functions as F


def _final_map(spark, path):
    return {
        r["vertex"]: r["component"]
        for r in spark.read.parquet(path).collect()
    }


def test_incremental_cc_equals_batch(spark, tmp_path):
    from graph500_spark.operators import graph_build as gb
    from graph500_spark.operators.components import connected_components
    from graph500_spark.sources.generator import generate_kronecker_edges
    from graph500_spark.streaming.graph_cc import start_incremental_cc

    raw = generate_kronecker_edges(spark, 10, 16)
    src_dir = str(tmp_path / "edges_in")
    raw.select("src", "dst").repartition(8).write.parquet(src_dir)

    comp_out = str(tmp_path / "components_out")
    q = start_incremental_cc(
        spark,
        src_dir,
        comp_out,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # 4 real micro-batches
    )
    q.awaitTermination()

    got = _final_map(spark, comp_out)
    want = {
        r["vertex"]: r["component"]
        for r in connected_components(
            spark, gb.symmetrize(gb.remove_self_loops(raw))
        ).collect()
    }
    assert got == want
    # sanity: the graph actually has several components at s10
    assert len(set(want.values())) >= 1
    assert len(want) > 500


def test_incremental_cc_restart_seeds_from_sink(spark, tmp_path):
    """Stop after a prefix, restart a NEW query over the rest — the
    final map must still equal the batch answer (state reseeded from
    the components sink, the documented recovery path)."""
    from graph500_spark.operators import graph_build as gb
    from graph500_spark.operators.components import connected_components
    from graph500_spark.sources.generator import generate_kronecker_edges
    from graph500_spark.streaming.graph_cc import start_incremental_cc

    raw = generate_kronecker_edges(spark, 8, 16)
    first = raw.filter(F.col("src") % 2 == 0)
    rest = raw.filter(F.col("src") % 2 != 0)
    src_dir = str(tmp_path / "edges_in")
    first.select("src", "dst").repartition(2).write.parquet(src_dir)

    comp_out = str(tmp_path / "components_out")
    q = start_incremental_cc(
        spark, src_dir, comp_out, str(tmp_path / "ckpt1"), 1
    )
    q.awaitTermination()

    # new files arrive; a FRESH query (new checkpoint, state seeded
    # from the sink) processes everything it hasn't seen
    rest.select("src", "dst").repartition(2).write.mode("append").parquet(
        src_dir
    )
    q = start_incremental_cc(
        spark, src_dir, comp_out, str(tmp_path / "ckpt2"), 1
    )
    q.awaitTermination()

    got = _final_map(spark, comp_out)
    want = {
        r["vertex"]: r["component"]
        for r in connected_components(
            spark, gb.symmetrize(gb.remove_self_loops(raw))
        ).collect()
    }
    assert got == want
