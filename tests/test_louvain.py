"""Louvain local-moving fixpoint (operators/louvain.py): planted
community recovery, exact-integer gain determinism, and the
modularity cross-check through the oracle-checked stats operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph500_spark.operators.louvain import (
    louvain_communities,
    louvain_quality,
)


def sym(pairs):
    """Symmetrize an undirected edge list into directed rows."""
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def clique(vertices):
    vs = list(vertices)
    return [
        (vs[i], vs[j])
        for i in range(len(vs))
        for j in range(i + 1, len(vs))
    ]


def ring_of_cliques(n_cliques=4, size=5):
    """The standard Louvain fixture: cliques joined in a ring by
    single bridge edges — ground truth is one community per clique."""
    pairs, bridges = [], []
    for c in range(n_cliques):
        base = c * size
        pairs += clique(range(base, base + size))
        bridges.append((base, ((c + 1) % n_cliques) * size + 1))
    return sym(pairs + bridges), [
        frozenset(range(c * size, (c + 1) * size))
        for c in range(n_cliques)
    ]


class TestLouvain:
    def test_recovers_ring_of_cliques(self, spark):
        rows, truth = ring_of_cliques()
        edges = spark.createDataFrame(rows, "src: long, dst: long")
        out = louvain_communities(spark, edges).collect()
        groups = {}
        for r in out:
            groups.setdefault(r.community, set()).add(r.vertex)
        # set comparison: frozenset's < is subset (a partial order),
        # so sorted() over frozensets is input-order-dependent
        assert {frozenset(g) for g in groups.values()} == set(truth)

    def test_deterministic_across_partitionings(self, spark):
        rows, _ = ring_of_cliques(5, 4)
        e1 = spark.createDataFrame(rows, "src: long, dst: long")
        e2 = e1.repartition(13)
        a = {r.vertex: r.community
             for r in louvain_communities(spark, e1).collect()}
        b = {r.vertex: r.community
             for r in louvain_communities(spark, e2).collect()}
        assert a == b

    def test_modularity_improves_over_singletons(self, spark):
        from graph500_spark.operators.stats import modularity

        rows, _ = ring_of_cliques()
        edges = spark.createDataFrame(rows, "src: long, dst: long")
        singletons = edges.select(
            F.col("src").alias("vertex")
        ).distinct().select(
            "vertex", F.col("vertex").alias("community")
        )
        (q0,) = modularity(edges, singletons).collect()
        (q1,) = louvain_quality(spark, edges).collect()
        assert q1.modularity > q0.modularity
        assert q1.n_communities == 4
        # ring of 4 5-cliques: known-good partition quality
        assert q1.modularity > 0.5

    def test_two_triangles_bridge(self, spark):
        rows = sym(clique([0, 1, 2]) + clique([10, 11, 12]) + [(2, 10)])
        edges = spark.createDataFrame(rows, "src: long, dst: long")
        out = louvain_communities(spark, edges).collect()
        groups = {}
        for r in out:
            groups.setdefault(r.community, set()).add(r.vertex)
        assert sorted(map(sorted, groups.values())) == [
            [0, 1, 2],
            [10, 11, 12],
        ]

    def test_no_edges_between_same_vertex_required(self, spark):
        # a single edge: both endpoints end in one community
        edges = spark.createDataFrame(
            sym([(1, 2)]), "src: long, dst: long"
        )
        out = louvain_communities(spark, edges).collect()
        assert len({r.community for r in out}) == 1


class TestContractAndMultilevel:
    def test_contract_merges_and_self_loops(self, spark):
        from graph500_spark.operators.louvain import contract_graph

        rows = sym(clique([0, 1, 2]) + clique([10, 11, 12]) + [(2, 10)])
        edges = spark.createDataFrame(rows, "src: long, dst: long")
        cmap = spark.createDataFrame(
            [(v, v // 10) for v in [0, 1, 2, 10, 11, 12]],
            "vertex: long, community: long",
        )
        out = {
            (r.src, r.dst): r.weight
            for r in contract_graph(edges, cmap).collect()
        }
        # each triangle: 6 directed rows -> self-loop weight 6;
        # the bridge: one row each direction
        assert out == {
            (0, 0): 6,
            (1, 1): 6,
            (0, 1): 1,
            (1, 0): 1,
        }

    def test_contract_composes_weighted(self, spark):
        from graph500_spark.operators.louvain import contract_graph

        lvl1 = spark.createDataFrame(
            [(0, 0, 6), (1, 1, 6), (0, 1, 1), (1, 0, 1)],
            "src: long, dst: long, weight: long",
        )
        cmap = spark.createDataFrame(
            [(0, 0), (1, 0)], "vertex: long, community: long"
        )
        out = {
            (r.src, r.dst): r.weight
            for r in contract_graph(lvl1, cmap).collect()
        }
        assert out == {(0, 0): 14}

    def test_weighted_louvain_groups_heavy_pair(self, spark):
        from graph500_spark.operators.louvain import louvain_communities

        # 4 super-vertices: (0,1) tied by weight 10, (2,3) by 10,
        # cross ties weight 1 — heavy pairs must merge
        rows = []
        for a, b, w in [(0, 1, 10), (2, 3, 10), (1, 2, 1), (3, 0, 1)]:
            rows += [(a, b, w), (b, a, w)]
        edges = spark.createDataFrame(
            rows, "src: long, dst: long, weight: long"
        )
        out = {
            r.vertex: r.community
            for r in louvain_communities(spark, edges).collect()
        }
        assert out[0] == out[1] and out[2] == out[3]
        assert out[0] != out[2]

    def test_multilevel_recovers_ring_and_composes(self, spark):
        from graph500_spark.operators.louvain import (
            louvain_multilevel,
            louvain_multilevel_quality,
        )

        rows, truth = ring_of_cliques()
        edges = spark.createDataFrame(rows, "src: long, dst: long")
        out = louvain_multilevel(spark, edges).collect()
        groups = {}
        for r in out:
            groups.setdefault(r.community, set()).add(r.vertex)
        assert {frozenset(g) for g in groups.values()} == set(truth)
        (q,) = louvain_multilevel_quality(spark, edges).collect()
        assert q.modularity > 0.5
