"""Prefix-filtered set-similarity join + Adamic-Adar link prediction:
completeness vs brute force, LSH-recall superset property, and exact
wedge math on a constructed graph."""

from __future__ import annotations

from tests.conftest import SF_MEDIUM


def test_setsim_superset_of_minhash_pairs(spark):
    """Exact shingle-Jaccard >= 0.5 pairs must contain every verified
    minhash-LSH pair at the same threshold (LSH can only lose
    candidates, never invent them)."""
    from graph500_spark.operators.dedup import (
        minhash_near_duplicates,
        setsim_join_prefix,
    )
    from graph500_spark.sources import testdata as td

    docs = td.load_table(spark, SF_MEDIUM, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]) for r in setsim_join_prefix(docs).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0


def test_setsim_prefix_complete_vs_bruteforce(spark):
    """Tiny corpus where the all-pairs answer is computable by hand
    tooling: the prefix-filtered result equals brute force."""
    from itertools import combinations

    from graph500_spark.operators.dedup import (
        SETSIM_TAU_PPM,
        setsim_join_prefix,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "a completely different document about spark engines",
        "a completely different document about spark engines indeed",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "short text",
    ]
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in setsim_join_prefix(docs).collect()
    }

    def shingles(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    want = {}
    for a, b in combinations(range(len(texts)), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if 1_000_000 * inter >= SETSIM_TAU_PPM * union:
            want[(a, b)] = (1_000_000 * inter) // union
    assert got == want
    assert (0, 4) in got and got[(0, 4)] == 1_000_000  # exact dup pair


def test_adamic_adar_exact_on_constructed_graph(spark):
    """Star + path: hand-computable AA scores, existing edges excluded."""
    # undirected edges: hub 0 - {1,2,3}; plus 1-2 edge.
    und = [(0, 1), (0, 2), (0, 3), (1, 2)]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")
    from graph500_spark.operators.linkpred import adamic_adar_topk

    rows = {
        (r["u"], r["v"]): (r["n_common"], r["aa_score_q"])
        for r in adamic_adar_topk(edges, k=10).collect()
    }
    # non-adjacent pairs with common neighbors: (1,3) via 0, (2,3) via 0
    # deg(0) = 3 → term = round(1e6/ln 3)
    import math

    t0 = round(1_000_000 / math.log(3))
    assert rows == {(1, 3): (1, t0), (2, 3): (1, t0)}


def _sym(und):
    return und + [(b, a) for a, b in und]


def test_adamic_adar_capped_matches_uncapped(spark):
    """Certified hub phase: a mega-hub adjacent to everything plus
    low-degree wedge structure — the capped run must return exactly
    the uncapped top-k (rows AND scores) and pass its in-engine
    certificate."""
    from graph500_spark.operators.linkpred import adamic_adar_topk

    # centers 10..19 each adjacent to (0,1); centers 20..24 to (2,3);
    # hub 99 adjacent to every vertex => every pair gains one hub
    # common neighbor; pairs (0,1) and (2,3) are non-adjacent.
    und = []
    for z in range(10, 20):
        und += [(z, 0), (z, 1)]
    for z in range(20, 25):
        und += [(z, 2), (z, 3)]
    verts = sorted({v for e in und for v in e})
    und += [(99, v) for v in verts]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")

    full = adamic_adar_topk(edges, k=3).collect()
    capped = adamic_adar_topk(edges, k=3, max_center_degree=10).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in full]
    # hub 99 (deg = |verts|) is above the cap, so the hub phase ran:
    # top pair (0,1) must include the hub's term in its exact score
    import math

    # centers are degree 3 (both endpoints + the hub edge)
    t_center = round(1_000_000 / math.log(3))
    t_hub = round(1_000_000 / math.log(len(verts)))
    (u, v, n_common, score) = tuple(capped[0])
    assert (u, v) == (0, 1)
    assert n_common == 11  # ten deg-3 centers + the hub
    assert score == 10 * t_center + t_hub


def test_adamic_adar_certificate_failure_raises(spark):
    """Hub-only pairs that the low phase can never see must make the
    capped run RAISE (never silently approximate): graph where all
    common neighbors are hubs."""
    import pytest

    from graph500_spark.operators.linkpred import adamic_adar_topk

    # two hubs 100, 101 each adjacent to 0..9; no low-degree centers.
    und = [(h, v) for h in (100, 101) for v in range(10)]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    with pytest.raises(ValueError, match="certificate"):
        adamic_adar_topk(edges, k=5, max_center_degree=4)


def test_common_neighbors_certified_matches_uncapped(spark):
    """Unweighted certified tier: capped run equals the uncapped
    top-k on the mega-hub graph (adjacent pairs included)."""
    from graph500_spark.operators.linkpred import (
        common_neighbors_topk_certified,
    )

    und = []
    for z in range(10, 20):
        und += [(z, 0), (z, 1)]
    for z in range(20, 25):
        und += [(z, 2), (z, 3)]
    verts = sorted({v for e in und for v in e})
    und += [(99, v) for v in verts]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")

    full = common_neighbors_topk_certified(edges, k=4).collect()
    capped = common_neighbors_topk_certified(
        edges, k=4, max_center_degree=10
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in full]
    assert tuple(capped[0]) == (0, 1, 11)  # ten centers + the hub
