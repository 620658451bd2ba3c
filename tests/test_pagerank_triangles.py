"""Unit tests for PageRank and triangle counting on hand-checkable
graphs, plus invariants the power method must preserve."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph500_spark.operators.graph_build import build_clean_edges
from graph500_spark.operators.pagerank import pagerank
from graph500_spark.operators.triangles import (
    global_triangle_count,
    orient_edges,
    triangle_counts,
    triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def _clean(spark, pairs):
    return build_clean_edges(_edges(spark, pairs))


class TestTriangles:
    def test_k4_counts(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
        counts = {
            r.vertex: r.triangles
            for r in triangle_counts(_clean(spark, k4)).collect()
        }
        # K4 has C(4,3)=4 triangles; each vertex sits in C(3,2)=3.
        assert counts == {0: 3, 1: 3, 2: 3, 3: 3}
        assert global_triangle_count(_clean(spark, k4)).collect()[0][
            "n_triangles"
        ] == 4

    def test_triangle_free_path(self, spark):
        path = [(0, 1), (1, 2), (2, 3)]
        assert triangle_counts(_clean(spark, path)).count() == 0
        assert global_triangle_count(_clean(spark, path)).collect()[0][
            "n_triangles"
        ] == 0

    def test_single_triangle_with_pendant(self, spark):
        g = [(0, 1), (1, 2), (2, 0), (2, 9)]
        tri = triangles(_clean(spark, g)).collect()
        assert len(tri) == 1
        assert sorted([tri[0].a, tri[0].b, tri[0].c]) == [0, 1, 2]
        counts = {
            r.vertex: r.triangles
            for r in triangle_counts(_clean(spark, g)).collect()
        }
        assert counts == {0: 1, 1: 1, 2: 1}  # pendant 9 omitted

    def test_orientation_is_acyclic_and_complete(self, spark):
        g = [(a, b) for a in range(6) for b in range(6) if a < b]
        oriented = orient_edges(_clean(spark, g)).collect()
        # one row per undirected edge
        assert len(oriented) == 15
        # strict order ⇒ no edge appears in both directions
        seen = {(r.lo, r.hi) for r in oriented}
        assert all((hi, lo) not in seen for lo, hi in seen)


class TestPageRank:
    def test_ranks_sum_to_one(self, spark):
        g = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
        out = pagerank(spark, _clean(spark, g), n_iterations=8)
        rows = out.collect()
        n = len(rows)
        total = sum(r.norm_rank for r in rows)
        assert math.isclose(total, n, rel_tol=0, abs_tol=1e-3)

    def test_uniform_on_regular_graph(self, spark):
        # A cycle is 2-regular: PageRank stays exactly uniform, so
        # every normalized rank is exactly 1.0 at any iteration count.
        cyc = [(i, (i + 1) % 8) for i in range(8)]
        out = pagerank(spark, _clean(spark, cyc), n_iterations=5)
        assert [r.norm_rank for r in out.collect()] == [1.0] * 8

    def test_hub_outranks_leaves(self, spark):
        star = [(0, i) for i in range(1, 9)]
        ranks = {
            r.vertex: r.norm_rank
            for r in pagerank(
                spark, _clean(spark, star), n_iterations=10
            ).collect()
        }
        assert ranks[0] > max(v for k, v in ranks.items() if k != 0)
        leaf_vals = {v for k, v in ranks.items() if k != 0}
        assert len(leaf_vals) == 1  # symmetry preserved


class TestClusteringCoefficient:
    def test_k4_is_fully_clustered(self, spark):
        from graph500_spark.operators.triangles import clustering_coefficient

        k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
        out = clustering_coefficient(_clean(spark, k4)).collect()
        assert {r.vertex: r.coeff for r in out} == {v: 1.0 for v in range(4)}

    def test_path_center_is_open(self, spark):
        from graph500_spark.operators.triangles import clustering_coefficient

        path = [(0, 1), (1, 2)]
        out = {r.vertex: r.coeff for r in clustering_coefficient(
            _clean(spark, path)).collect()}
        assert out == {1: 0.0}  # endpoints have degree 1 → excluded


class TestPersonalizedPageRank:
    def test_mass_concentrates_near_seed(self, spark):
        # two triangles joined by one bridge edge; seed in triangle A
        g = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
        ranks = {
            r.vertex: r.norm_rank
            for r in pagerank(
                spark, _clean(spark, g), n_iterations=12, sources=[0]
            ).collect()
        }
        assert min(ranks[v] for v in (0, 1, 2)) > max(
            ranks[v] for v in (4, 5)
        )

    def test_unreached_component_gets_zero(self, spark):
        g = [(0, 1), (10, 11)]  # seed component {0,1}; island {10,11}
        ranks = {
            r.vertex: r.norm_rank
            for r in pagerank(
                spark, _clean(spark, g), n_iterations=6, sources=[0]
            ).collect()
        }
        assert ranks[10] == 0.0 and ranks[11] == 0.0
        assert ranks[0] > 0 and ranks[1] > 0


class TestCommonNeighbors:
    def test_hand_graph_counts_and_hub_cap(self, spark):
        from graph500_spark.operators.triangles import common_neighbors_topk

        # path 1-2-3 plus hub 9 connected to all: N(1)∩N(3) = {2, 9}
        und = [(1, 2), (2, 3), (9, 1), (9, 2), (9, 3)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        out = {
            (r.u, r.v): r.n_common
            for r in common_neighbors_topk(edges, k=10).collect()
        }
        assert out[(1, 3)] == 2          # via 2 and via 9
        assert out[(1, 2)] == 1          # via 9 only
        assert out[(2, 9)] == 2          # via 1 and 3
        # hub cap 2 keeps only centers 1 and 3 (degree 2); both
        # centers' single wedge is the pair (2, 9) — wedges through
        # the degree-3 centers (2 and hub 9) are dropped
        capped = {
            (r.u, r.v): r.n_common
            for r in common_neighbors_topk(
                edges, k=10, max_center_degree=2
            ).collect()
        }
        assert capped == {(2, 9): 2}


class TestJaccardTopk:
    def test_hand_graph_scores(self, spark):
        from graph500_spark.operators.triangles import (
            JACCARD_SCALE,
            jaccard_topk,
        )

        # square 1-2-3-4-1: opposite corners share both neighbors
        # (jaccard 2/2), adjacent corners share none.
        und = [(1, 2), (2, 3), (3, 4), (4, 1)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        rows = {
            (r.u, r.v): (r.n_common, r.union_size, r.jaccard_q)
            for r in jaccard_topk(edges, k=10).collect()
        }
        assert rows == {
            (1, 3): (2, 2, JACCARD_SCALE),
            (2, 4): (2, 2, JACCARD_SCALE),
        }

    def test_partial_overlap_truncates(self, spark):
        from graph500_spark.operators.triangles import jaccard_topk

        # N(1)={2,3,4}, N(5)={3,4,6}: cn=2, union=4 → 500000
        und = [(1, 2), (1, 3), (1, 4), (5, 3), (5, 4), (5, 6)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        rows = {
            (r.u, r.v): r.jaccard_q
            for r in jaccard_topk(edges, k=100).collect()
        }
        assert rows[(1, 5)] == 500000


class TestKTruss:
    def test_k4_is_a_4_truss(self, spark):
        from graph500_spark.operators.triangles import k_truss

        k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
        edges = spark.createDataFrame(k4, "src: long, dst: long")
        out = {(r.u, r.v): r.support for r in k_truss(edges, k=4).collect()}
        # every K4 edge sits in exactly 2 triangles
        assert out == {
            (0, 1): 2, (0, 2): 2, (0, 3): 2,
            (1, 2): 2, (1, 3): 2, (2, 3): 2,
        }

    def test_pendant_triangle_peels(self, spark):
        from graph500_spark.operators.triangles import k_truss

        # K4 on {0..3} plus a pendant triangle (3,4,5): the pendant
        # triangle's edges have support 1 < 2 and peel away; removing
        # them does not disturb the K4 core.
        und = (
            [(a, b) for a in range(4) for b in range(4) if a < b]
            + [(3, 4), (3, 5), (4, 5)]
        )
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        out = {(r.u, r.v) for r in k_truss(edges, k=4).collect()}
        assert out == {
            (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
        }

    def test_triangle_free_graph_empties(self, spark):
        from graph500_spark.operators.triangles import k_truss

        und = [(1, 2), (2, 3), (3, 4)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        assert k_truss(edges, k=3).count() == 0

    def test_k_truss_matches_bruteforce_on_random_graph(self, spark):
        """Multi-round cascading peel vs a pure-Python full-recompute
        reference — pins the incremental delta update (support is only
        adjusted for triangles destroyed by each round's removals)
        against the definitionally-correct algorithm, for several k."""
        from graph500_spark.operators.triangles import k_truss

        n = 40
        und = sorted(
            {
                (min(a, b), max(a, b))
                for a in range(n)
                for b in range(n)
                if a != b
                and ((a * 1315423911 + b * 2654435761) % 100) < 18
            }
        )

        def py_truss(half_edges, k):
            es = set(half_edges)
            while True:
                nbrs: dict[int, set[int]] = {}
                for a, b in es:
                    nbrs.setdefault(a, set()).add(b)
                    nbrs.setdefault(b, set()).add(a)
                sup = {
                    (a, b): len(nbrs[a] & nbrs[b]) for (a, b) in es
                }
                bad = {e for e, s in sup.items() if s < k - 2}
                if not bad:
                    return sup
                es -= bad

        sym = und + [(b, a) for a, b in und]
        edges = spark.createDataFrame(sym, "src: long, dst: long")
        for k in (3, 4, 5, 6):
            got = {
                (r.u, r.v): r.support
                for r in k_truss(edges, k=k).collect()
            }
            assert got == py_truss(und, k), f"k={k}"


class TestModularity:
    def test_two_cliques_perfect_split(self, spark):
        from graph500_spark.operators.stats import modularity
        import pyspark.sql.functions as F

        # two disjoint triangles; community = component. Q = 1/2.
        und = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        cmap = (
            edges.select(F.col("src").alias("vertex"))
            .distinct()
            .select("vertex", (F.col("vertex") / 10).cast("long").alias("community"))
        )
        row = modularity(edges, cmap).collect()[0]
        assert row.n_communities == 2
        assert row.two_m == 12
        assert row.within_rows == 12
        assert abs(row.modularity - 0.5) < 1e-9

    def test_single_community_is_zero(self, spark):
        from graph500_spark.operators.stats import modularity
        import pyspark.sql.functions as F

        und = [(0, 1), (1, 2), (0, 2)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        cmap = (
            edges.select(F.col("src").alias("vertex"))
            .distinct()
            .select("vertex", F.lit(0).alias("community"))
        )
        row = modularity(edges, cmap).collect()[0]
        # all edges internal but D_c² term cancels exactly: Q = 0
        assert abs(row.modularity) < 1e-9


class TestFourCycleCount:
    def _sym(self, spark, und):
        return spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )

    def test_square_is_one_cycle(self, spark):
        from graph500_spark.operators.triangles import four_cycle_count

        edges = self._sym(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert four_cycle_count(edges).collect()[0].n_four_cycles == 1

    def test_k4_has_three(self, spark):
        from graph500_spark.operators.triangles import four_cycle_count

        und = [(a, b) for a in range(4) for b in range(4) if a < b]
        edges = self._sym(spark, und)
        # K4: 3 distinct 4-cycles (each omits one perfect matching)
        assert four_cycle_count(edges).collect()[0].n_four_cycles == 3

    def test_triangle_has_none(self, spark):
        from graph500_spark.operators.triangles import four_cycle_count

        edges = self._sym(spark, [(1, 2), (2, 3), (1, 3)])
        assert four_cycle_count(edges).collect()[0].n_four_cycles == 0


class TestSampledSubgraph:
    def test_induced_and_stable(self, spark):
        from graph500_spark.operators.graph_build import sampled_subgraph

        und = [(i, j) for i in range(20) for j in range(20) if i < j]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        out1 = {(r.src, r.dst) for r in sampled_subgraph(edges).collect()}
        out2 = {(r.src, r.dst) for r in sampled_subgraph(edges).collect()}
        assert out1 == out2                      # deterministic
        kept = {v for e in out1 for v in e}
        # induced: every edge between two kept vertices is present
        assert all(
            (a, b) in out1
            for a in kept for b in kept if a != b
        )

    def test_permille_extremes(self, spark):
        from graph500_spark.operators.graph_build import sampled_subgraph

        und = [(1, 2), (2, 3)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        assert sampled_subgraph(edges, keep_permille=1000).count() == 4
        assert sampled_subgraph(edges, keep_permille=0).count() == 0


class TestFourClique:
    def test_k5_contains_five_k4s(self, spark):
        from graph500_spark.operators.triangles import four_clique_count

        k5 = [(a, b) for a in range(5) for b in range(5) if a != b]
        edges = spark.createDataFrame(k5, "src: long, dst: long")
        assert four_clique_count(edges).collect()[0][
            "n_four_cliques"
        ] == 5  # C(5,4)

    def test_clique_free_graph_zero(self, spark):
        from graph500_spark.operators.triangles import four_clique_count

        # two triangles sharing an edge: no K4
        und = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        assert four_clique_count(edges).collect()[0][
            "n_four_cliques"
        ] == 0


class TestEdgeClustering:
    def test_hand_graph(self, spark):
        from graph500_spark.operators.triangles import edge_clustering

        # triangle 0-1-2 plus bridge 2-3 plus triangle 3-4-5
        und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        rows = {
            (r.u, r.v): (r.support, r.min_deg, r.ec_ppm)
            for r in edge_clustering(edges).collect()
        }
        # bridge (2,3): no triangle, min_deg 3 -> ec 0 (a local bridge)
        assert rows[(2, 3)] == (0, 3, 0)
        # (0,1): 1 triangle of min_deg-1 = 1 possible -> ec 1.0
        assert rows[(0, 1)] == (1, 2, 1_000_000)
        # pendant-free graph: all 7 edges have min_deg >= 2
        assert len(rows) == 7


class TestTrussNumbers:
    def test_matches_bruteforce_and_k_truss(self, spark):
        from graph500_spark.operators.triangles import (
            k_truss,
            truss_numbers,
        )

        n = 30
        und = sorted(
            {
                (min(a, b), max(a, b))
                for a in range(n)
                for b in range(n)
                if a != b
                and ((a * 2654435761 + b * 40503) % 100) < 22
            }
        )

        def py_trussness(half_edges):
            es = set(half_edges)
            t = {}
            k = 3
            while es:
                while True:
                    nbrs: dict[int, set[int]] = {}
                    for a, b in es:
                        nbrs.setdefault(a, set()).add(b)
                        nbrs.setdefault(b, set()).add(a)
                    bad = {
                        (a, b)
                        for (a, b) in es
                        if len(nbrs[a] & nbrs[b]) < k - 2
                    }
                    if not bad:
                        break
                    for e in bad:
                        t[e] = k - 1
                    es -= bad
                k += 1
            return t

        sym = und + [(b, a) for a, b in und]
        edges = spark.createDataFrame(sym, "src: long, dst: long")
        got = {
            (r.u, r.v): r.trussness
            for r in truss_numbers(edges).collect()
        }
        want = py_trussness(und)
        assert got == want
        # cross-check: {e : trussness >= k} == k_truss(k) membership
        for k in (3, 4, 5):
            in_truss = {
                (r.u, r.v) for r in k_truss(edges, k=k).collect()
            }
            assert {e for e, t in got.items() if t >= k} == in_truss, k
