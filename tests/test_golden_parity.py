"""End-to-end golden parity with the reference implementation.

The reference hardcodes expected edge-visit counts per SCALE for the
spec2010 generator at edgefactor 16, seeds (2,3) — the pf_nedge table,
/root/reference/mpi/utils.hpp:3663-3708 (scale 10 → 16,383; scale
12 → 65,535). Reproducing them requires every stage to be bit-exact:
MRG PRNG + skip-ahead, R-MAT descent with clip-and-flip, endpoint
scramble, dedup/symmetrize construction, root sampling, the BFS
reached set, and the spec's raw-edge visit counting. One number checks
the whole pipeline.
"""

from __future__ import annotations

import pytest

from graph500_spark.operators.bfs import bfs
from graph500_spark.operators.graph_build import build_clean_edges
from graph500_spark.operators.roots import find_roots
from graph500_spark.operators.validate import edge_visit_count
from graph500_spark.sources.generator import generate_kronecker_edges

# pf_nedge[scale], mpi/utils.hpp:3663-3708; 16 is the reference's
# default CLI workload (mpi/main.cc:211); 20 (16.8M generated edges,
# 31.4M clean rows) is the large-scale spot check — ~40s, the
# slowest test in the suite by design
PF_NEDGE = {10: 16_383, 12: 65_535, 16: 1_048_570, 20: 16_776_976}


@pytest.mark.parametrize("scale", [10, 12, 16, 20])
def test_edge_visit_count_matches_reference_golden(spark, scale):
    raw = generate_kronecker_edges(spark, scale, 16).persist()
    raw.count()
    clean = build_clean_edges(raw).persist()
    clean.count()
    try:
        root = find_roots(spark, raw, 1 << scale, num_roots=1)[0]
        pred = bfs(spark, clean, root, prepartition=False)
        ec = edge_visit_count(raw, pred).collect()[0]["edge_visit_count"]
        assert ec == PF_NEDGE[scale]
    finally:
        raw.unpersist()
        clean.unpersist()
