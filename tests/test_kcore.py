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
