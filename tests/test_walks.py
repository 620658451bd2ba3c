"""Deterministic random-walk corpus tests."""

from __future__ import annotations

from graph500_spark.operators.graph_build import build_clean_edges
from graph500_spark.operators.walks import random_walks


def _clean(spark, pairs):
    return build_clean_edges(
        spark.createDataFrame(pairs, "src: long, dst: long")
    )


def test_walk_shape_and_validity(spark):
    g = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    edges = _clean(spark, g)
    adj = {}
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
    rows = random_walks(spark, edges, walk_len=4).collect()
    # one row per (vertex, step)
    assert len(rows) == 4 * 5  # wait: 4 vertices × 5 steps
    walks = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.vertex
    for wid, steps in walks.items():
        assert steps[0] == wid
        for s in range(1, 5):
            assert steps[s] in adj[steps[s - 1]]  # every hop is an edge


def test_walks_are_deterministic(spark):
    g = [(i, (i + 1) % 7) for i in range(7)]
    e = _clean(spark, g)
    a = sorted(map(tuple, random_walks(spark, e).collect()))
    b = sorted(map(tuple, random_walks(spark, e.repartition(13)).collect()))
    assert a == b
