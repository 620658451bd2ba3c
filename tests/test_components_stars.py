"""Large-star/small-star CC must agree with delta-propagation CC —
including on the adversarial shapes that motivate it (long paths,
where delta propagation needs O(diameter) rounds)."""

from __future__ import annotations

import random

from graph500_spark.operators.components import (
    connected_components,
    connected_components_stars,
)
from graph500_spark.operators.graph_build import build_clean_edges


def _clean(spark, pairs):
    return build_clean_edges(
        spark.createDataFrame(pairs, "src: long, dst: long")
    )


def _labels(df):
    return {r.vertex: r.component for r in df.collect()}


def test_long_shuffled_path(spark):
    # a 60-vertex path with shuffled ids: component min must reach the
    # far end despite pointer chains
    rng = random.Random(7)
    ids = list(range(100, 160))
    rng.shuffle(ids)
    path = list(zip(ids, ids[1:]))
    edges = _clean(spark, path)
    got = _labels(connected_components_stars(spark, edges))
    assert set(got.values()) == {min(ids)}
    assert got == _labels(connected_components(spark, edges))


def test_random_multi_component(spark):
    rng = random.Random(13)
    pairs = []
    for base in (0, 1000, 2000):  # three islands
        verts = [base + i for i in range(50)]
        # random spanning tree + extra edges
        for i, v in enumerate(verts[1:], 1):
            pairs.append((v, verts[rng.randrange(i)]))
        for _ in range(30):
            pairs.append((rng.choice(verts), rng.choice(verts)))
    edges = _clean(spark, pairs)
    got = _labels(connected_components_stars(spark, edges))
    expect = _labels(connected_components(spark, edges))
    assert got == expect
    assert set(got.values()) == {0, 1000, 2000}
