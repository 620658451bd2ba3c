"""Round-11 operators: batched TEPS numerators, WordPiece greedy
segmentation (incl. the [UNK] long-word rule the synthetic corpus
never exercises), and the double-sweep diameter bound."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_edge_visit_counts_multi_matches_per_root(spark):
    from graph500_spark.operators.bfs import bfs_multi
    from graph500_spark.operators.graph_build import build_clean_edges
    from graph500_spark.operators.validate import (
        edge_visit_count,
        edge_visit_counts_multi,
    )
    from graph500_spark.sources.generator import generate_kronecker_edges

    raw = generate_kronecker_edges(spark, 8, 8).persist()
    clean = build_clean_edges(raw).persist()
    roots = [2, 5, 9]
    pred = bfs_multi(spark, clean, roots, prepartition=False).persist()
    multi = {
        r["root"]: r["edge_visit_count"]
        for r in edge_visit_counts_multi(raw, pred).collect()
    }
    for root in roots:
        single = edge_visit_count(
            raw, pred.filter(F.col("root") == root).drop("root")
        ).collect()[0]["edge_visit_count"]
        assert multi[root] == single, (root, multi[root], single)
    raw.unpersist(), clean.unpersist(), pred.unpersist()


def test_wordpiece_greedy_and_unk(spark):
    """Constructed corpus: 'abcd' frequent enough that the 4-gram and
    its prefixes enter the vocabulary — greedy longest-match must take
    'abcd' whole, not piecewise; a >16-char word maps to [UNK]."""
    from graph500_spark.operators.wordpiece import wordpiece_segment

    long_word = "x" * 20
    rows = [(i, "abcd ab", "en", "s", 7) for i in range(5)]
    rows.append((99, long_word, "en", "s", len(long_word)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    seg = {
        r["word"]: (r["n_subwords"], r["seg"])
        for r in wordpiece_segment(spark, docs).collect()
    }
    assert seg["abcd"] == (1, "abcd")
    assert seg["ab"] == (1, "ab")
    assert seg[long_word] == (1, "[UNK]")


def test_wordpiece_fertility_shape(spark):
    from graph500_spark.operators.wordpiece import (
        wordpiece_fertility,
        wordpiece_segment,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = wordpiece_fertility(wordpiece_segment(spark, docs)).collect()[0]
    assert row["n_subwords"] >= row["n_words"] > 0
    assert row["fertility_micro"] >= 1_000_000


def test_diameter_double_sweep_path_graph(spark):
    """Path 0-1-2-3-4-5: starting mid-path (root 2), sweep 1 reaches
    an endpoint, sweep 2 must find the true diameter 5."""
    from graph500_spark.operators.bfs import diameter_double_sweep

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(i + 1, i) for i in range(5)],
        "src long, dst long",
    )
    row = diameter_double_sweep(
        spark, edges, root=2, prepartition=False
    ).collect()[0]
    assert row["start_root"] == 2
    assert row["ecc1"] == 3  # farthest endpoint from vertex 2 is 5
    assert row["far_vertex"] == 5
    assert row["diameter_lb"] == 5
    assert row["far_vertex2"] == 0


def test_cdc_chunks_reconstruct_and_shift_invariance(spark):
    """Chunks partition each doc's token stream in order; prepending
    a token to a doc leaves every chunk after the first boundary
    byte-identical (the content-defined property fixed-size blocking
    lacks)."""
    from graph500_spark.operators.dedup import cdc_chunks

    base = " ".join(f"tok{i % 97}x{i % 13}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, "prefix " + base, "en", "s", len(base) + 7)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    ch = cdc_chunks(docs).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        n_tok = sum(r["n_tokens"] for r in rows)
        assert n_tok == (400 if doc_id == 1 else 401)
    h1 = [r["chunk_hash"] for r in by_doc[1]]
    h2 = [r["chunk_hash"] for r in by_doc[2]]
    assert len(h1) > 3  # the 400-token stream actually got cut
    # all chunks after the (shifted) first one line up again
    assert h1[1:] == h2[1:]


def test_bm25_prf_expands_and_ranks(spark):
    """PRF result stays k rows per query with dense ranks; expansion
    must be able to promote a doc that lacks the original query terms
    but shares the feedback docs' vocabulary."""
    from graph500_spark.operators.traindata import (
        BM25_QUERIES,
        bm25_prf_topk,
        bm25_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bm25_prf_topk(docs).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {qid for qid, _ in BM25_QUERIES}
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # expanded scoring differs from plain BM25 for at least one query
    base = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_topk(docs).collect()
    }
    prf = {(r["query_id"], r["doc_id"]): r["rank"] for r in out}
    assert base.keys() != prf.keys() or any(
        base[k] != prf[k] for k in base
    )
