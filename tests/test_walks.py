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


class TestNeighborSample:
    def _graph(self, spark):
        # K5 plus a pendant chain: hubs exercise the fan-out cap
        pairs = [(a, b) for a in range(5) for b in range(5) if a != b]
        pairs += [(4, 10), (10, 4), (10, 11), (11, 10)]
        return build_clean_edges(
            spark.createDataFrame(pairs, "src: long, dst: long")
        )

    def test_fanout_bounds_and_layers(self, spark):
        from graph500_spark.operators.walks import neighbor_sample

        out = neighbor_sample(
            spark, self._graph(spark), fanout=(2, 1)
        ).collect()
        by = {}
        for r in out:
            by.setdefault((r.seed, r.layer, r.src), set()).add(r.dst)
        for (seed, layer, src), dsts in by.items():
            assert len(dsts) <= (2 if layer == 1 else 1)
        # layer-2 sources must be layer-1 destinations of the same seed
        l1 = {}
        for r in out:
            if r.layer == 1:
                l1.setdefault(r.seed, set()).add(r.dst)
        for r in out:
            if r.layer == 2:
                assert r.src in l1[r.seed]

    def test_deterministic_across_partitionings(self, spark):
        from graph500_spark.operators.walks import neighbor_sample

        g = self._graph(spark)
        a = {
            (r.seed, r.layer, r.src, r.dst)
            for r in neighbor_sample(spark, g, fanout=(2, 2)).collect()
        }
        b = {
            (r.seed, r.layer, r.src, r.dst)
            for r in neighbor_sample(
                spark, g.repartition(7), fanout=(2, 2)
            ).collect()
        }
        assert a == b

    def test_low_degree_vertices_keep_all_neighbors(self, spark):
        from graph500_spark.operators.walks import neighbor_sample

        out = neighbor_sample(
            spark, self._graph(spark), fanout=(3,)
        ).collect()
        dsts_11 = {r.dst for r in out if r.seed == 11 and r.src == 11}
        assert dsts_11 == {10}


class TestNode2vecWalks:
    def test_hops_are_edges_and_deterministic(self, spark):
        from graph500_spark.operators.walks import node2vec_walks

        g = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (0, 2)]
        edges = _clean(spark, g)
        adj = {}
        for r in edges.collect():
            adj.setdefault(r.src, set()).add(r.dst)
        a = node2vec_walks(spark, edges, walk_len=4).collect()
        walks = {}
        for r in a:
            walks.setdefault(r.walk_id, {})[r.step] = r.vertex
        for wid, steps in walks.items():
            assert steps[0] == wid
            for s in range(1, 5):
                assert steps[s] in adj[steps[s - 1]]
        b = node2vec_walks(spark, edges.repartition(5), walk_len=4).collect()
        assert {(r.walk_id, r.step, r.vertex) for r in a} == {
            (r.walk_id, r.step, r.vertex) for r in b
        }

    def test_return_penalty_biases_away_from_backtracking(self, spark):
        from graph500_spark.operators.walks import (
            node2vec_walks,
            random_walks,
        )

        # star + ring: from a leaf, the only way back is the hub —
        # compare backtrack frequency against the unbiased walker on
        # a graph where every vertex has >= 2 choices
        pairs = [(i, (i + 1) % 20) for i in range(20)]
        pairs += [(i, (i + 7) % 20) for i in range(20)]
        edges = _clean(spark, pairs)

        def backtracks(rows):
            walks = {}
            for r in rows:
                walks.setdefault(r.walk_id, {})[r.step] = r.vertex
            n = 0
            for steps in walks.values():
                for s in range(2, max(steps) + 1):
                    if steps[s] == steps[s - 2]:
                        n += 1
            return n

        biased = backtracks(
            node2vec_walks(
                spark, edges, walk_len=6, p_mult=200, q_mult=1
            ).collect()
        )
        unbiased = backtracks(
            random_walks(spark, edges, walk_len=6).collect()
        )
        assert biased <= unbiased
