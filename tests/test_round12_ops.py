"""Round-12 operators: CDC doc-pair provenance (planted cross-doc
duplicated passage, hub cap) and the WordPiece corpus-apply side."""

from __future__ import annotations

from pyspark.sql import functions as F

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _passage(n: int = 400) -> str:
    # varied deterministic tokens: with the mod-64 boundary rule a
    # 400-token run contains boundary tokens with near-certainty (the
    # hash is deterministic, so this either always holds or never does
    # — verified by the assertions below, not by chance at runtime)
    return " ".join(f"tok{i * 7919 % 4999}x{i % 13}" for i in range(n))


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], _SCHEMA
    )


def test_cdc_doc_pairs_planted_passage(spark):
    """Docs 1 and 2 share a planted 400-token passage (different
    tails); doc 3 is disjoint. The pair readout must contain exactly
    (1,2), with shared token mass > 0 and sane ppm fractions."""
    from graph500_spark.operators.dedup import cdc_doc_pairs

    p = _passage()
    docs = _mkdocs(
        spark,
        [
            (1, p + " tailone alpha beta"),
            (2, p + " tailtwo gamma delta epsilon"),
            (3, " ".join(f"uniq{i}z{i % 7}" for i in range(300))),
        ],
    )
    rows = cdc_doc_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r["n_shared_chunks"] >= 1
    assert 0 < r["shared_tokens"] <= 403
    # fractions are per-doc: doc 1 is shorter, so its fraction is >=
    assert r["dup_frac_a_ppm"] >= r["dup_frac_b_ppm"] > 0
    assert r["dup_frac_a_ppm"] <= 1_000_000


def test_cdc_doc_pairs_hub_cap(spark):
    """A passage shared by 40 docs exceeds max_group=32: its chunk
    hashes must be dropped (boilerplate discipline) — no pairs at the
    default cap, pairs reappear when the cap admits the group."""
    from graph500_spark.operators.dedup import cdc_doc_pairs

    p = _passage()
    docs = _mkdocs(
        spark,
        [(i, p + f" tail{i}only{i}") for i in range(40)],
    )
    assert cdc_doc_pairs(docs, max_group=32).count() == 0
    assert cdc_doc_pairs(docs, max_group=64).count() == 40 * 39 // 2


def test_wordpiece_token_counts_consistent_with_fertility(spark):
    """Corpus-apply cross-check: summing the per-doc apply readout
    over all docs must reproduce the fertility aggregate computed on
    the distinct-word table (same vocabulary, same greedy loop)."""
    from graph500_spark.operators.wordpiece import (
        wordpiece_fertility,
        wordpiece_segment,
        wordpiece_token_counts,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    seg = wordpiece_segment(spark, docs).persist()
    per_doc = wordpiece_token_counts(docs, seg)
    got = per_doc.agg(
        F.sum("n_tokens").alias("w"), F.sum("n_wp_tokens").alias("s")
    ).collect()[0]
    want = wordpiece_fertility(seg).collect()[0]
    seg.unpersist()
    assert got["w"] == want["n_words"]
    assert got["s"] == want["n_subwords"]
    assert per_doc.count() == docs.filter(F.length("text") > 0).count()


def test_minhash_calibration_identical_docs(spark):
    """Two byte-identical docs must calibrate at est=K matches,
    est==exact==1.0 (ppm), err 0 — the fixed point of the estimator."""
    from graph500_spark.operators.dedup import (
        minhash_jaccard_calibration,
        release_caches,
    )

    t = _passage(60)
    docs = _mkdocs(spark, [(1, t), (2, t)])
    rows = minhash_jaccard_calibration(docs).collect()
    release_caches()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r["est_matches"] == 16
    assert r["est_jaccard_ppm"] == 1_000_000
    assert r["exact_jaccard_ppm"] == 1_000_000
    assert r["err_ppm"] == 0


def test_key_skew_stats_planted_hot_key(spark):
    """1000 rows on one key + 100 singleton keys: max=1000, mean =
    1100/101 rows/key, ratio = 1000/mean — exact values pinned."""
    from graph500_spark.operators.dq import key_skew_stats

    rows = [(i, 7) for i in range(1000)]
    rows += [(1000 + i, 100 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    r = key_skew_stats(df, "user_id", "events").collect()[0]
    assert r["n_rows"] == 1100 and r["n_keys"] == 101
    assert r["max_key_n"] == 1000
    assert r["mean_key_n_micro"] == round(1100 / 101 * 1_000_000)
    assert r["skew_ratio_micro"] == round(1000 * 101 / 1100 * 1_000_000)
