"""Brute-force parity for the connected 4-vertex graphlet census.

The brute force enumerates each pattern directly from adjacency sets
(independent of the engine's counting identities), so agreement pins
both the identities and their Spark expression.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from graph500_spark.operators.graphlets import graphlet_census_4


def _brute(und: list[tuple[int, int]]) -> dict[str, int]:
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    vs = sorted(adj)
    edge = lambda x, y: y in adj.get(x, set())

    tris = [
        (a, b, c)
        for a, b, c in combinations(vs, 3)
        if edge(a, b) and edge(b, c) and edge(a, c)
    ]
    n_stars = sum(
        1 for v in vs for _ in combinations(sorted(adj[v]), 3)
    )
    # P4: ordered simple paths u-a-b-v / 2
    n_paths = (
        sum(
            1
            for a in vs
            for b in adj[a]
            for u in adj[a] - {b}
            for v in adj[b] - {a}
            if u != v
        )
        // 2
    )
    n_tailed = sum(
        1
        for (a, b, c) in tris
        for corner in (a, b, c)
        for t in adj[corner] - {a, b, c}
    )
    # C4: ordered closed walks u-w-v-x-u with 4 distinct vertices / 8
    n_cycles = (
        sum(
            1
            for u in vs
            for w in adj[u]
            for v in adj[w] - {u}
            for x in adj[v] - {w}
            if x != u and edge(x, u)
        )
        // 8
    )
    # diamonds: unordered pairs of triangles sharing exactly one edge
    n_diamonds = sum(
        1
        for t1, t2 in combinations(tris, 2)
        if len(set(t1) & set(t2)) == 2
    )
    n_k4 = sum(
        1
        for q in combinations(vs, 4)
        if all(edge(x, y) for x, y in combinations(q, 2))
    )
    return {
        "n_3stars": n_stars,
        "n_4paths": n_paths,
        "n_tailed_triangles": n_tailed,
        "n_4cycles": n_cycles,
        "n_diamonds": n_diamonds,
        "n_4cliques": n_k4,
    }


def _sym(spark, und):
    return spark.createDataFrame(
        und + [(b, a) for a, b in und], "src: long, dst: long"
    )


FIXTURES = {
    "square": [(1, 2), (2, 3), (3, 4), (4, 1)],
    "k4": [(a, b) for a, b in combinations(range(4), 2)],
    "k5": [(a, b) for a, b in combinations(range(5), 2)],
    "tailed_tri": [(1, 2), (2, 3), (1, 3), (3, 4)],
    "path4": [(1, 2), (2, 3), (3, 4)],
    "star": [(0, 1), (0, 2), (0, 3), (0, 4)],
    "diamond": [(1, 2), (2, 3), (1, 3), (1, 4), (3, 4)],
    "triangle_free": [(1, 2), (3, 4)],
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_census_fixture_parity(spark, name):
    und = FIXTURES[name]
    row = graphlet_census_4(_sym(spark, und)).collect()[0].asDict()
    assert row == _brute(und), (name, row, _brute(und))


def test_census_random_graphs_parity(spark):
    """Deterministic pseudo-random graphs incl. a hub (the shape the
    oriented plans exist for)."""
    for seed in (3, 7):
        und = sorted(
            {
                (min(a, b), max(a, b))
                for k in range(40)
                for a, b in [
                    ((seed * 97 + k * 31) % 12, (seed * 53 + k * 17) % 12)
                ]
                if a != b
            }
        )
        # add a hub joined to everything
        und = sorted(set(und) | {(i, 99) for i in range(12)})
        row = graphlet_census_4(_sym(spark, und)).collect()[0].asDict()
        assert row == _brute(und), (seed, row, _brute(und))


def test_census_empty(spark):
    empty = spark.createDataFrame([], "src: long, dst: long")
    row = graphlet_census_4(empty).collect()[0].asDict()
    assert all(v == 0 for v in row.values())
