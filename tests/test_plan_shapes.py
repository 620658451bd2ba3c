"""Physical-plan regression guards: PLANS.md's audit, automated.

These don't check answers (the oracle gate does); they check that the
plans KEEP the shape that makes them scale — a refactor that silently
turns a bucketed range join into a nested loop, or widens a pruned
scan, fails here long before it shows up as a 100 TB incident.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from graph500_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Queries whose plans must NEVER contain a nested-loop/cartesian join.
# (The ANN family is excluded by design: queries×corpus and
# corpus×centroids broadcast products are the intended plan.)
NO_NESTED_LOOP = [
    "clean_edges",
    "degrees",
    "degree_order_map",
    "adjacency",
    "token_count",
    "exact_duplicates",
    "minhash_near_duplicates",
    "simhash_near_duplicates_blocked",
    "decontaminate",
    "sessionize",
    "sessionize_native",
    "event_window_counts",
    "event_gapfill",
    "purchase_click_pairs",
    "error_context",
    "click_attribution",
]


@pytest.mark.parametrize("name", NO_NESTED_LOOP)
def test_no_nested_loop_join(spark, name):
    plan = plan_of(Q.QUERIES[name](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_token_count_scan_is_pruned(spark):
    """The 2-column projection must reach the parquet reader — a scan
    of the wide documents table here means column pruning broke."""
    plan = plan_of(Q.QUERIES["token_count"](spark, SF))
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "doc_id" in scan[0] and "text" in scan[0]
    assert "lang" not in scan[0] and "source" not in scan[0]


def test_degrees_pushes_filters_to_scan(spark):
    plan = plan_of(Q.QUERIES["degrees"](spark, SF))
    assert "PushedFilters: [" in plan


def test_range_join_is_equi_join(spark):
    """error_context's interval predicate must plan as a (sort-merge
    or hash) equi-join on (key, bucket) — Catalyst's nested-loop
    fallback for raw range predicates must not appear."""
    plan = plan_of(Q.QUERIES["error_context"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_bfs_edges_partitioned_once(spark):
    """A BFS level join must read the edge table from cache
    (InMemoryTableScan) and broadcast the frontier (BroadcastHashJoin)
    — i.e. the stationary edge side is persisted and NEVER re-shuffled
    per level. Asserted on a reconstructed level-1 plan (the real
    loop's per-level plans are checkpoint-truncated and invisible in
    the final explain), plus an end-to-end smoke of the loop itself."""
    import pyspark.sql.functions as F

    from graph500_spark.operators.bfs import bfs

    edges = Q.clean_hetero_graph(spark, SF)  # persisted, repartitioned(src)
    frontier = spark.createDataFrame(
        [(Q.BFS_ROOT,)], "vertex long"
    ).localCheckpoint(eager=True)
    level = edges.join(
        F.broadcast(frontier.select(F.col("vertex").alias("src"))), "src"
    ).select(F.col("dst").alias("vertex"), F.col("src").alias("pred"))
    plan = plan_of(level)
    assert "InMemoryTableScan" in plan  # edge side read from cache
    assert "BroadcastHashJoin" in plan  # frontier ships, edges stay
    # no shuffle exchange anywhere in the level plan: the edge table's
    # cached partitioning is reused as-is
    assert "Exchange hashpartitioning" not in plan

    out = bfs(spark, edges, root=Q.BFS_ROOT)
    assert out.count() > 0  # loop executes end to end at test scale


def test_repetition_stats_no_cartesian_and_pruned(spark):
    """Repetition stats must stay explode+hash-agg shaped (no
    cartesian), and only (doc_id, text) may reach the scan."""
    plan = plan_of(Q.QUERIES["repetition_stats"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans
    for s in scans:
        assert "lang" not in s and "source" not in s


def test_stratified_sample_is_narrow(spark):
    """A per-row filter: on a raw table read the operator itself must
    add no exchange and no join, and the salted-hash predicate must
    sit directly on the pruned scan. (The registry wrapper's fixture
    loader adds a local-mode repartition — that is the loader, not the
    operator, so the probe reads the parquet directly.)"""
    from graph500_spark.operators.traindata import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(stratified_sample(docs))
    assert "Exchange" not in plan
    assert "Join" not in plan
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans and "doc_id" in scans[0] and "source" in scans[0]
    assert "text" not in scans[0]


def test_pq_scoring_broadcasts_and_avoids_raw_rescans(spark):
    """ADC scoring must broadcast the codebook/LUT sides (any join
    against the big codes table is a BroadcastHashJoin) and must not
    plan a shuffle join of the raw embeddings."""
    plan = plan_of(Q.QUERIES["cosine_topk_pq"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_spans_shape(spark):
    """Span detection must stay explode + gram-hash shuffle + windows:
    no join at all (a cartesian/self-join formulation would be the
    O(n^2) trap), and the scan pruned to (doc_id, text)."""
    plan = plan_of(Q.QUERIES["duplicate_spans"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans
    for s in scans:
        assert "lang" not in s and "n_chars" not in s


def test_nb_predict_model_join_broadcasts(spark):
    """The trained model is a dimension table: its join into the
    exploded token stream must be a BroadcastHashJoin (the intended
    cross join with the tiny per-lang floor table is the only
    nested-loop site)."""
    plan = plan_of(Q.QUERIES["nb_predict"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# Continuation batch: the new operators must keep their blocked /
# pruned / equi-join shapes too.
NO_NESTED_LOOP_NEW = [
    "levenshtein_near_duplicates",
    "normalized_duplicates",
    "heavy_hitter_tokens",
    "jaccard_topk",
    "sliding_window_counts",
    "retention_cohorts",
    "event_type_transitions",
    "feature_hashing",
    "char_entropy",
]


@pytest.mark.parametrize("name", NO_NESTED_LOOP_NEW)
def test_no_nested_loop_join_new(spark, name):
    plan = plan_of(Q.QUERIES[name](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_levenshtein_blocking_is_equi_join(spark):
    """The edit-distance near-dup must pair docs through the
    (lang, bucket) equi-join — the levenshtein kernel may only run
    on block-joined candidates, never an all-pairs product."""
    plan = plan_of(Q.QUERIES["levenshtein_near_duplicates"](spark, SF))
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)
    assert "CartesianProduct" not in plan


def test_heavy_hitters_scan_is_pruned(spark):
    plan = plan_of(Q.QUERIES["heavy_hitter_tokens"](spark, SF))
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans
    for s in scans:
        assert "lang" not in s and "source" not in s and "n_chars" not in s


def test_pmi_totals_are_broadcast_products(spark):
    """pmi's N_tokens / N_bigrams one-row totals must attach as
    broadcast products (the HITS pattern); everything keyed joins
    through hash joins, and nothing is an unbroadcast cartesian."""
    plan = plan_of(Q.QUERIES["pmi_collocations"](spark, SF))
    assert "CartesianProduct" not in plan
    # nt and nb only (each physical node prints twice: tree + details)
    bnlj_nodes = [
        ln for ln in plan.splitlines()
        if ln.startswith("(") and "BroadcastNestedLoopJoin" in ln
    ]
    assert len(bnlj_nodes) <= 2
    assert "BroadcastHashJoin" in plan  # unigram counts broadcast back


def test_user_rfm_broadcasts_global_max(spark):
    """The 1-row corpus max must ship as a broadcast, not force a
    shuffle of the per-user table."""
    plan = plan_of(Q.QUERIES["user_rfm"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # events scanned once per agg branch at most (details section
    # lists each physical node once as "(n) Scan parquet")
    detail_scans = [
        ln for ln in plan.splitlines()
        if ln.startswith("(") and "Scan parquet" in ln
    ]
    assert len(detail_scans) <= 2


def test_certified_wedge_topk_plan_shape(spark):
    """The certified hub-cap entries must keep the wedge join an
    equi-join (no cartesian/nested-loop) and broadcast the center
    terms onto it — the 100 TB shape the docstrings claim."""
    for name in ("adamic_adar_nonedges", "common_neighbors_certified"):
        plan = plan_of(Q.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name  # terms onto wedges


def _tree(plan: str) -> list[str]:
    """The operator-tree section of a formatted explain."""
    return plan.split("\n\n")[0].splitlines()


def _compressed_below_window(tree: list[str], window_idx: int) -> bool:
    """True if the window at tree line `window_idx` consumes an
    aggregated (domain-compressed) or TakeOrdered-reduced input: some
    HashAggregate / TakeOrderedAndProject line appears below it before
    the first raw scan."""
    for line in tree[window_idx + 1:]:
        if "HashAggregate" in line or "TakeOrderedAndProject" in line:
            return True
        if "Scan" in line:
            return False
    return False


def test_ecdf_window_runs_over_compressed_domain(spark):
    """event_value_ecdf's cumulative window must consume the
    (type, value) hash-aggregated table — a refactor that windows the
    raw event rows turns a |distinct values| sort into a |events| sort
    and breaks the operator's 100 TB story."""
    tree = _tree(plan_of(Q.QUERIES["event_value_ecdf"](spark, SF)))
    windows = [i for i, l in enumerate(tree) if "Window (" in l]
    assert windows, "plan lost its window"
    for wi in windows:
        assert _compressed_below_window(tree, wi), tree[wi]


def test_ks_windows_run_over_compressed_domain(spark):
    """ks_source_drift: the per-source cumsum window consumes the
    compressed (source, value) grid, and the per-source argmax is
    rank<=1 so Spark must push a WindowGroupLimit (top-1 per group
    retains k rows per partition instead of sorting whole groups)."""
    tree = _tree(plan_of(Q.QUERIES["ks_source_drift"](spark, SF)))
    windows = [i for i, l in enumerate(tree) if "Window (" in l]
    assert len(windows) >= 2, "expected cumsum + argmax windows"
    # innermost window = the ECDF cumsum; must sit above the count agg
    assert _compressed_below_window(tree, windows[-1]), tree[windows[-1]]
    assert any("WindowGroupLimit" in l for l in tree), (
        "argmax lost its top-1 group-limit pushdown"
    )


def test_zipf_window_runs_over_reduced_head(spark):
    """zipf_slope's rank window must consume the TakeOrdered top-500
    head, never the full token-count table."""
    tree = _tree(plan_of(Q.QUERIES["zipf_slope"](spark, SF)))
    windows = [i for i, l in enumerate(tree) if "Window (" in l]
    assert windows
    assert any(
        "TakeOrderedAndProject" in l for l in tree[windows[-1] + 1:]
    ), "window input is not the reduced head"


def test_calibration_window_runs_over_compressed_domain(spark):
    """quality_dup_calibration's cumulative decile window must consume
    the (score_q, cnt) hash-aggregated table — windowing the flagged
    per-doc rows would turn a |distinct scores| sort into a |docs|
    sort and break the operator's 100 TB story (fourth member of the
    ECDF/KS/Zipf compressed-domain window family)."""
    tree = _tree(plan_of(Q.QUERIES["quality_dup_calibration"](spark, SF)))
    windows = [i for i, l in enumerate(tree) if "Window (" in l]
    assert windows, "plan lost its window"
    for wi in windows:
        assert _compressed_below_window(tree, wi), tree[wi]


def test_cdc_doc_pairs_is_equi_join_on_chunk_hash(spark):
    """The pair join must be a (broadcast/shuffled) EQUI-join keyed by
    chunk_hash over the distinct (hash, doc) table — never a
    nested-loop doc×doc product; and the corpus window stays
    partitioned by doc_id (bounded partitions)."""
    plan = plan_of(Q.QUERIES["cdc_doc_pairs"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_minhash_calibration_no_all_pairs(spark):
    """Candidates come from the banded equi-join; the calibration
    joins back by doc key — no cartesian anywhere."""
    plan = plan_of(Q.QUERIES["minhash_jaccard_calibration"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_key_skew_stats_two_phase_agg(spark):
    """One count per key with a map-side partial, then a 1-row agg
    over key grain: the plan must show partial aggregation (the
    corpus never reaches the final agg un-reduced) and scan only the
    key column."""
    plan = plan_of(Q.QUERIES["key_skew_stats"](spark, SF))
    assert "partial" in plan.lower()
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "user_id" in scan[0]
    assert "props" not in scan[0] and "event_type" not in scan[0]


def test_kmv_distinct_tokens_takeordered_head(spark):
    """The sketch head must be a distributed TakeOrdered(AndProject)
    of k rows, not a global sort."""
    plan = plan_of(Q.QUERIES["kmv_distinct_tokens"](spark, SF))
    assert "TakeOrdered" in plan
