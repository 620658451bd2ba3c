"""Boruvka minimum spanning forest (operators/mst.py): known-answer
graphs, tie determinism, forest structure invariants, and a brute
-force Kruskal cross-check on a generated graph."""

from __future__ import annotations

from graph500_spark.operators.mst import minimum_spanning_forest, msf_summary


def _collect(msf):
    return sorted((r.src, r.dst, r.weight) for r in msf.collect())


class TestKnownGraphs:
    def test_triangle_drops_heaviest(self, spark):
        edges = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 2), (1, 3, 5)],
            "src long, dst long, weight long",
        )
        assert _collect(minimum_spanning_forest(spark, edges)) == [
            (1, 2, 1),
            (2, 3, 2),
        ]

    def test_two_components_forest(self, spark):
        edges = spark.createDataFrame(
            [(1, 2, 3), (1, 3, 1), (2, 3, 2), (10, 11, 7)],
            "src long, dst long, weight long",
        )
        assert _collect(minimum_spanning_forest(spark, edges)) == [
            (1, 3, 1),
            (2, 3, 2),
            (10, 11, 7),
        ]

    def test_equal_weights_deterministic(self, spark):
        # all weights equal: the (lo, hi) tie-break picks the
        # lexicographically smallest edges — a path 1-2, 1-3, 1-4
        # competes with 2-3, 2-4, 3-4
        edges = spark.createDataFrame(
            [(a, b, 5) for a in range(1, 5) for b in range(a + 1, 5)],
            "src long, dst long, weight long",
        )
        out = _collect(minimum_spanning_forest(spark, edges))
        assert out == [(1, 2, 5), (1, 3, 5), (1, 4, 5)]

    def test_parallel_edges_and_self_loops(self, spark):
        edges = spark.createDataFrame(
            [(1, 2, 9), (2, 1, 4), (1, 1, 1), (2, 3, 2)],
            "src long, dst long, weight long",
        )
        assert _collect(minimum_spanning_forest(spark, edges)) == [
            (1, 2, 4),
            (2, 3, 2),
        ]

    def test_empty(self, spark):
        edges = spark.createDataFrame([], "src long, dst long, weight long")
        assert minimum_spanning_forest(spark, edges).count() == 0


class TestCrossCheck:
    def test_matches_kruskal_on_generated_graph(self, spark):
        """Deterministic pseudo-random graph; MSF total weight and
        edge count must equal a driver-side Kruskal."""
        rows = []
        for i in range(400):
            a = (i * 37) % 60
            b = (i * 61 + 13) % 60
            if a == b:
                continue
            rows.append((a, b, (i * 97) % 50 + 1))
        edges = spark.createDataFrame(
            rows, "src long, dst long, weight long"
        )
        msf = minimum_spanning_forest(spark, edges)
        got = _collect(msf)

        # driver-side Kruskal under the same (weight, lo, hi) order
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        picked = []
        for w, lo, hi in sorted(
            (w, min(a, b), max(a, b)) for a, b, w in rows
        ):
            ra, rb = find(lo), find(hi)
            if ra != rb:
                parent[ra] = rb
                picked.append((lo, hi, w))
        assert sorted(picked) == got

        # structure invariant: |V| - #components edges
        verts = {v for a, b, _ in rows for v in (a, b)}
        comps = len({find(v) for v in verts})
        row = msf_summary(msf).collect()[0]
        assert row.n_edges == len(verts) - comps
        assert row.total_weight == sum(w for _, _, w in picked)


class TestValidateMsf:
    EDGES = [(1, 2, 1), (2, 3, 2), (1, 3, 5), (10, 11, 7)]

    def _edges(self, spark):
        return spark.createDataFrame(
            self.EDGES, "src long, dst long, weight long"
        )

    def test_correct_forest_all_zeros(self, spark):
        from graph500_spark.operators.mst import (
            minimum_spanning_forest,
            validate_msf,
        )

        edges = self._edges(spark)
        msf = minimum_spanning_forest(spark, edges)
        row = validate_msf(spark, edges, msf).collect()[0]
        assert (row.err_not_subset, row.err_not_spanning,
                row.err_not_tree) == (0, 0, 0)

    def test_foreign_edge_fires_subset(self, spark):
        from graph500_spark.operators.mst import validate_msf

        edges = self._edges(spark)
        fake = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 2), (10, 11, 99)],  # wrong weight
            "src long, dst long, weight long",
        )
        row = validate_msf(spark, edges, fake).collect()[0]
        assert row.err_not_subset == 1

    def test_missing_edge_fires_spanning(self, spark):
        from graph500_spark.operators.mst import validate_msf

        edges = self._edges(spark)
        partial = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 2)],  # second component unspanned BUT
            # its vertices fall back to singleton comps → partition
            # mismatch (10-11 joined in input, separate in forest)
            "src long, dst long, weight long",
        )
        row = validate_msf(spark, edges, partial).collect()[0]
        assert row.err_not_spanning > 0

    def test_cycle_fires_tree(self, spark):
        from graph500_spark.operators.mst import validate_msf

        edges = self._edges(spark)
        cyclic = spark.createDataFrame(
            [(1, 2, 1), (2, 3, 2), (1, 3, 5), (10, 11, 7)],  # triangle
            "src long, dst long, weight long",
        )
        row = validate_msf(spark, edges, cyclic).collect()[0]
        assert row.err_not_tree == 1
