"""k-core peeling unit tests on hand-checkable graphs."""

from __future__ import annotations

from graph500_spark.operators.graph_build import build_clean_edges
from graph500_spark.operators.kcore import k_core


def _clean(spark, pairs):
    return build_clean_edges(
        spark.createDataFrame(pairs, "src: long, dst: long")
    )


def test_clique_with_tail_peels_to_clique(spark):
    # K5 on {0..4} plus a pendant path 4-10-11: the 3-core is exactly
    # the clique (peeling must cascade through the path in 2 rounds).
    g = [(a, b) for a in range(5) for b in range(5) if a < b]
    g += [(4, 10), (10, 11)]
    out = {r.vertex: r.degree for r in k_core(_clean(spark, g), k=3).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_no_core_returns_empty(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    assert k_core(_clean(spark, path), k=2).count() == 0


def test_cycle_is_its_own_2core(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    out = {r.vertex: r.degree for r in k_core(_clean(spark, cyc), k=2).collect()}
    assert out == {i: 2 for i in range(6)}


# --- core_numbers: the full decomposition (h-index fixpoint) ---


def _peel_coreness(pairs):
    """Reference sequential min-degree peel (Batagelj-Zaversnik)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core, alive = {}, dict(deg)
    while alive:
        v = min(alive, key=lambda x: (alive[x], x))
        k = alive[v]
        core[v] = max(core.get(v, 0), k)
        for u in adj[v]:
            if u in alive and u != v:
                alive[u] = max(alive[u] - 1, k)
        del alive[v]
    return core


def test_coreness_clique_with_tail(spark):
    from graph500_spark.operators.kcore import core_numbers

    g = [(a, b) for a in range(5) for b in range(5) if a < b]
    g += [(4, 10), (10, 11)]
    out = {
        r.vertex: r.coreness
        for r in core_numbers(_clean(spark, g)).collect()
    }
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 10: 1, 11: 1}


def test_coreness_path_and_cycle(spark):
    from graph500_spark.operators.kcore import core_numbers

    path = [(0, 1), (1, 2), (2, 3)]
    out = {
        r.vertex: r.coreness
        for r in core_numbers(_clean(spark, path)).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    out = {
        r.vertex: r.coreness
        for r in core_numbers(_clean(spark, cyc)).collect()
    }
    assert out == {i: 2 for i in range(6)}


def test_coreness_matches_sequential_peel(spark):
    from graph500_spark.operators.kcore import core_numbers, k_core

    # deterministic pseudo-random graph
    pairs = sorted(
        {
            tuple(sorted(((i * i * 7 + 3) % 60, (i * 13 + 5) % 60)))
            for i in range(400)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r.vertex: r.coreness
        for r in core_numbers(_clean(spark, pairs)).collect()
    }
    exp = _peel_coreness(pairs)
    assert got == exp
    # cross-check against the peeling operator: {coreness >= k} is
    # exactly the k-core vertex set
    for k in (2, 3):
        kc = {
            r.vertex for r in k_core(_clean(spark, pairs), k=k).collect()
        }
        assert {v for v, c in got.items() if c >= k} == kc
