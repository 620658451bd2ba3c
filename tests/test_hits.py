"""HITS sanity on a hand-checkable directed graph."""

from __future__ import annotations

from graph500_spark.operators.hits import hits


def test_hub_and_authority_separate(spark):
    # 0,1,2 all point at 9 and 10; classic hub/authority split
    g = [(0, 9), (0, 10), (1, 9), (1, 10), (2, 9), (2, 10)]
    e = spark.createDataFrame(g, "src: long, dst: long")
    out = {r.vertex: (r.hub, r.auth) for r in hits(spark, e).collect()}
    for v in (0, 1, 2):
        assert out[v][0] > 0 and out[v][1] == 0.0  # pure hubs
    for v in (9, 10):
        assert out[v][0] == 0.0 and out[v][1] > 0  # pure authorities
    assert out[0] == out[1] == out[2]  # symmetry preserved
