"""Skyline frontier + negative-sampling properties."""

from __future__ import annotations

from graph500_spark.operators.graph_build import negative_edge_samples
from graph500_spark.operators.relational import part_skyline

PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string,"
    " p_size int, p_retailprice double"
)


def test_skyline_dominance_exact(spark):
    # (price, size): frontier should be (1.00, 9), (2.00, 5), (5.00, 1)
    rows = [
        (1, "a", "b", "t", 9, 1.00),
        (2, "a", "b", "t", 12, 1.00),   # same price, bigger -> out
        (3, "a", "b", "t", 5, 2.00),
        (4, "a", "b", "t", 6, 3.00),    # dominated by (2.00, 5)
        (5, "a", "b", "t", 1, 5.00),
        (6, "a", "b", "t", 9, 4.00),    # dominated by (1.00, 9)
    ]
    part = spark.createDataFrame(rows, PART_SCHEMA)
    got = {
        (r["price_cents"], r["size"]) for r in part_skyline(part).collect()
    }
    assert got == {(100, 9), (200, 5), (500, 1)}


def test_negative_samples_are_nonedges(spark):
    und = [(i, (i + 1) % 10) for i in range(10)]  # 10-cycle
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src: long, dst: long"
    )
    out = {(r["u"], r["v"]) for r in negative_edge_samples(edges).collect()}
    edge_set = {(min(a, b), max(a, b)) for a, b in und}
    verts = set(range(10))
    assert out  # sampler produces something on a 10-cycle
    for u, v in out:
        assert u < v and u in verts and v in verts
        assert (u, v) not in edge_set
    # determinism
    out2 = {(r["u"], r["v"]) for r in negative_edge_samples(edges).collect()}
    assert out == out2


def test_negative_samples_k_multiplies_yield(spark):
    """k>1 yields more negatives (k slots per vertex), every pair is
    still a valid non-edge, slot 0 keeps the legacy k=1 output, and
    the engine matches the SQL oracle at k=8."""
    import duckdb

    from graph500_spark.operators.graph_build import (
        negative_edge_samples_sql,
    )

    und = [(i, (i + 1) % 40) for i in range(40)]  # 40-cycle
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src: long, dst: long")
    edge_set = {(min(a, b), max(a, b)) for a, b in und}
    verts = set(range(40))

    k1 = {(r["u"], r["v"]) for r in negative_edge_samples(edges).collect()}
    k8 = {
        (r["u"], r["v"])
        for r in negative_edge_samples(edges, k=8).collect()
    }
    assert k1 <= k8  # slot 0 preserved
    # 8 slots over 40 vertices: demand a real multiple after dedup
    # and the edge anti-join (ratio-of-negatives check)
    assert len(k8) >= 4 * len(k1)
    for u, v in k8:
        assert u < v and u in verts and v in verts
        assert (u, v) not in edge_set

    vals = ", ".join(f"({a}, {b})" for a, b in sym)
    clean = f"SELECT * FROM (VALUES {vals}) AS t(src, dst)"
    got = {
        (int(u), int(v))
        for u, v in duckdb.sql(
            negative_edge_samples_sql(clean, k=8)
        ).fetchall()
    }
    assert got == k8
