"""Streaming edge ingest must converge to exactly the batch
construction: same cleaned edge set, same degree totals, across
multiple micro-batches."""

from __future__ import annotations

from graph500_spark.operators import graph_build as gb
from graph500_spark.streaming.ingest import (
    read_clean_edges,
    read_degrees,
    start_ingest,
)


def test_ingest_converges_to_batch_construction(spark, tmp_path):
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    edges_out = str(tmp_path / "edges_clean")
    degrees_out = str(tmp_path / "degrees")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(0, 1), (1, 2), (2, 2), (0, 1)]  # self-loop + dup
    batch2 = [(2, 3), (3, 0), (1, 2)]  # cross-batch dup of (1,2)
    all_rows = batch1 + batch2

    # drop batch 1, drain, then batch 2, drain — two separate
    # availableNow runs sharing one checkpoint exercise restart/resume
    for i, rows in enumerate((batch1, batch2)):
        spark.createDataFrame(rows, "src long, dst long").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src_dir / f"b{i}"))
        q = start_ingest(
            spark, str(src_dir) + "/*", edges_out, degrees_out, ckpt
        )
        q.awaitTermination(120)

    # reference: the batch constructor over the full raw union
    raw = spark.createDataFrame(all_rows, "src long, dst long")
    expect_edges = sorted(
        map(tuple, gb.build_clean_edges(raw).collect())
    )
    got_edges = sorted(map(tuple, read_clean_edges(spark, edges_out).collect()))
    assert got_edges == expect_edges

    # degree totals count the raw symmetrized multi-edges
    expect_deg = {
        r["vertex"]: r["degree"]
        for r in gb.degrees(
            gb.symmetrize(gb.remove_self_loops(raw))
        ).collect()
    }
    got_deg = {
        r["vertex"]: r["degree"] for r in read_degrees(spark, degrees_out).collect()
    }
    assert got_deg == expect_deg
