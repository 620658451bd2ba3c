"""Semantic tests for text/dedup/simsearch operators on small inline
fixtures (engine-parity with DuckDB is covered by tools/compare_oracle
and the driver gate; these check the *meaning*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph500_spark.operators import dedup, simsearch, text

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog", "en", "s0", 43),  # near dup
        (3, "der hund und die katze und der vogel", "de", "s0", 36),
        (4, "completely different words here about spark engines", "en", "s1", 51),
        (5, "el gato y el perro en la casa que es grande", "es", "s1", 43),
    ]
    base = (
        "the alpha and bravo of charlie in delta for echo on foxtrot"
        " golf hotel india juliet kilo lima mike november oscar papa"
        " quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    )
    # long near-dup pair (one trailing word changed → jaccard ≈ 0.94,
    # reliably caught by the 4x4 LSH banding, unlike the short doc 2
    # whose jaccard 0.4 sits below the banding's detection sweet spot)
    rows += [
        (6, base, "en", "s1", len(base)),
        (7, base.replace("zulu", "zero"), "en", "s1", len(base)),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_token_count(docs):
    out = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert out[0] == 9
    assert out[3] == 8


def test_language_id(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in text.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[5] == "es"


def test_fingerprint_stable_and_distinct(docs):
    out = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert out[0] == out[1]  # identical text → identical fingerprint
    assert out[0] != out[4]


def test_quality_scores_bounded(docs):
    rows = text.text_quality(docs).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    dup = [g for g in groups if g["n_copies"] > 1]
    assert len(dup) == 1
    assert dup[0]["rep_doc_id"] == 0
    assert dup[0]["n_copies"] == 2


def test_minhash_identical_signatures(docs):
    sig = {r["doc_id"]: tuple(r[c] for c in r.asDict() if c.startswith("mh"))
           for r in dedup.minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]  # exact dup → identical signature
    # near dup shares most minhash values
    shared = sum(a == b for a, b in zip(sig[0], sig[2]))
    # E[shared] = K * jaccard ≈ 16 * 0.5; allow sampling slack
    assert shared >= 5


def test_lsh_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs
    nd = {(r["doc_a"], r["doc_b"]): r["jaccard"]
          for r in dedup.minhash_near_duplicates(docs, threshold=0.5).collect()}
    assert nd[(0, 1)] == 1.0
    if (0, 2) in nd:
        assert 0.5 <= nd[(0, 2)] < 1.0


def test_simhash_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_duplicates(docs, max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # one word changed → high 3-gram overlap


@pytest.fixture(scope="module")
def embs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),    # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0], 1),   # opposite, other label
        (50, [0.5, 0.5, 0.0, 0.0], 0),   # a query id (50 % 50 == 0)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_embedding_near_duplicates(embs):
    nd = {(r["vec_a"], r["vec_b"]): r["cosine"]
          for r in dedup.embedding_near_duplicates(embs, threshold=0.9).collect()}
    assert (0, 1) in nd and nd[(0, 1)] > 0.99
    assert (0, 2) not in nd


def test_embedding_near_duplicates_ivf(embs):
    """Label-free path: pairs form only within learned kmeans cells
    and every reported pair passes the exact cosine verifier."""
    from graph500_spark.operators.simsearch import kmeans_cells

    nd = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup.embedding_near_duplicates_ivf(
            embs, threshold=0.9, centroid_filter="vec_id IN (0, 2)", dim=4
        ).collect()
    }
    assert all(c >= 0.9 for c in nd.values())
    cells = {
        r["vec_id"]: r["cell"]
        for r in kmeans_cells(
            embs, centroid_filter="vec_id IN (0, 2)", dim=4
        ).collect()
    }
    assert all(cells[a] == cells[b] for a, b in nd)
    # the near-identical pair lands in one cell and is found
    assert (0, 1) in nd and nd[(0, 1)] > 0.99


def test_cosine_topk(embs):
    out = simsearch.cosine_topk(embs, k=2, query_filter="vec_id = 0").collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert ranked[0]["neighbor_id"] == 1  # most similar
    assert ranked[0]["rank"] == 1
    assert len(ranked) == 2


def test_ivf_cells_assignment(embs):
    # centroids 0 (+x) and 2 (+y): vectors split by nearest direction
    cells = {r["vec_id"]: r["cell"]
             for r in simsearch.ivf_cells(embs, "vec_id IN (0, 2)").collect()}
    assert cells[0] == 0 and cells[1] == 0   # near +x
    assert cells[2] == 2                      # +y is its own cell
    assert cells[50] in (0, 2)                # diagonal ties to one cell
    assert len(cells) == 5                    # every vector assigned once


def test_cosine_topk_ivf_finds_in_probed_cells(embs):
    out = simsearch.cosine_topk_ivf(
        embs, k=2, nprobe=1, query_filter="vec_id = 0",
        centroid_filter="vec_id IN (0, 2)",
    ).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    # probing only the +x cell still finds the true nearest neighbor
    assert ranked[0]["neighbor_id"] == 1 and ranked[0]["rank"] == 1
    brute = {(r["query_id"], r["neighbor_id"])
             for r in simsearch.cosine_topk(embs, k=2, query_filter="vec_id = 0").collect()}
    assert {(r["query_id"], r["neighbor_id"]) for r in out} <= brute


def test_cosine_topk_lsh_subset_of_bruteforce(embs):
    brute = {(r["query_id"], r["neighbor_id"])
             for r in simsearch.cosine_topk(embs, k=4, query_filter="vec_id = 0").collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in simsearch.cosine_topk_lsh(embs, k=4, query_filter="vec_id = 0").collect()}
    # LSH returns a subset of candidates (same bucket only)
    assert approx <= brute or len(approx) <= len(brute)


def test_corpus_clean_applies_all_gates(docs):
    from graph500_spark.operators.corpus import corpus_clean

    # min_quality=0 isolates the dedup + language gates
    out = {r["doc_id"]: r for r in corpus_clean(docs, min_quality=0.0).collect()}
    assert 0 in out            # canonical copy of the exact-dup group
    assert 1 not in out        # exact duplicate of 0 (higher id)
    assert 6 in out            # canonical copy of the near-dup pair
    assert 7 not in out        # near-duplicate of 6 (jaccard ≈ 0.94)
    assert 4 not in out        # no stopword markers → 'und' → dropped
    assert {3, 5} <= set(out)
    assert out[3]["lang_pred"] == "de"

    # raising the quality bar drops more docs, never adds
    strict = {r["doc_id"] for r in corpus_clean(docs, min_quality=0.9).collect()}
    assert strict <= set(out)


def test_simhash_blocked_equals_global_bruteforce(docs):
    # pigeonhole completeness: chunk blocking must find EXACTLY the
    # global all-pairs result for hamming <= max_hamming
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    ids = sorted(sh)
    brute = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_duplicates_blocked(docs, 3).collect()
    }
    assert got == brute
    assert any(h == 0 for _, _, h in got)  # the exact-dup pair (0,1)


def test_decontaminate_known_overlap(spark):
    from graph500_spark.operators.corpus import decontaminate

    base = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, base, "en", "s0", len(base)),                 # eval (0 % 97 == 0)
        (1, base + " extra tail words", "en", "s0", 1),   # contaminated train
        (2, "totally unrelated content words only", "en", "s1", 1),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = {(r["train_doc"], r["eval_doc"]): r["n_shared"]
           for r in decontaminate(docs).collect()}
    # doc 1 contains all 4 of doc 0's 5-grams; doc 2 shares none
    assert out == {(1, 0): 4}


def test_dup_clusters_transitive(spark):
    from graph500_spark.operators.corpus import dup_clusters

    base = (
        "the alpha and bravo of charlie in delta for echo on foxtrot"
        " golf hotel india juliet kilo lima mike november oscar papa"
    )
    rows = [
        (10, base, "en", "s0", len(base)),
        (11, base.replace("papa", "p1"), "en", "s0", 1),   # ~10
        (12, base.replace("alpha", "a2"), "en", "s0", 1),  # ~10 (and ~11 via 10)
        (13, "completely different text about something else entirely here",
         "en", "s1", 1),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = {r["doc_id"]: r["cluster"] for r in dup_clusters(spark, docs).collect()}
    # 10/11/12 collapse transitively into one cluster labeled min id
    assert out[10] == out[11] == out[12] == 10
    assert out[13] == 13  # singleton clusters with itself


def test_kmeans_cells_recovers_clusters_and_is_partition_invariant(spark):
    from graph500_spark.operators.simsearch import kmeans_cells

    # two well-separated directions in R^4; ids 7 and 68 are the medoid
    # seeds (vec_id % 61 == 7)
    a = [1.0, 0.05, 0.0, 0.0]
    b = [0.0, 0.02, 1.0, 0.1]
    rows = [(7, a), (68, b)]
    rows += [(i, [1.0, 0.05 + i * 0.01, 0.02 * i, 0.0]) for i in range(1, 6)]
    rows += [(i, [0.01, 0.0, 1.0, 0.1 + (i - 60) * 0.01]) for i in range(61, 66)]
    embs = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r["cell"] for r in kmeans_cells(embs, dim=4).collect()}
    a_ids = [7] + list(range(1, 6))
    b_ids = [68] + list(range(61, 66))
    assert len({out[i] for i in a_ids}) == 1
    assert len({out[i] for i in b_ids}) == 1
    assert out[7] != out[68]
    # exact integer sums + fixed-order folds => identical assignment
    # under any physical partitioning
    out2 = {
        r["vec_id"]: r["cell"]
        for r in kmeans_cells(embs.repartition(7), dim=4).collect()
    }
    assert out == out2


def test_corpus_mix_epoch_counts(spark):
    from graph500_spark.operators.corpus import corpus_mix

    rows = [
        (0, "t", "src0", "en", 1),  # 0 % 3 + 1 = 1 epoch
        (1, "t", "src1", "en", 1),  # 2 epochs
        (2, "t", "src2", "en", 1),  # 3 epochs
    ]
    docs = spark.createDataFrame(
        [(d, t, l, s, n) for d, t, s, l, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {}
    for r in corpus_mix(docs).collect():
        out.setdefault(r["doc_id"], []).append(r["epoch"])
    assert sorted(out[0]) == [1]
    assert sorted(out[1]) == [1, 2]
    assert sorted(out[2]) == [1, 2, 3]


class TestDuplicateSpans:
    def test_canonical_survives_and_spans_merge(self, spark):
        from graph500_spark.operators.dedup import (
            duplicate_spans,
            merged_dup_spans,
        )

        # doc 1 and doc 2 share the 5-gram 'a b c d e' (doc1 pos 1,
        # doc2 pos 2); doc 2 repeats it at pos 8 too.
        docs = spark.createDataFrame(
            [
                (1, "a b c d e x y z"),
                (2, "q a b c d e r a b c d e"),
                (3, "totally different words here now"),
            ],
            "doc_id: long, text: string",
        )
        spans = duplicate_spans(docs, n=5).collect()
        got = {(r.doc_id, r.start_pos, r.end_pos) for r in spans}
        # canonical = (doc 1, pos 1) -> not listed; removable are the
        # doc-2 occurrences at pos 2 and pos 8
        assert (1, 1, 5) not in got
        assert (2, 2, 6) in got
        assert (2, 8, 12) in got
        assert all(r.doc_id != 3 for r in spans)

        merged = {
            (r.doc_id, r.span_start, r.span_end, r.n_spans_merged)
            for r in merged_dup_spans(docs, n=5).collect()
        }
        # doc2's spans [2,6] and [8,12] are NOT adjacent (gap at 7) ->
        # stay separate
        assert (2, 2, 6, 1) in merged and (2, 8, 12, 1) in merged

    def test_overlapping_spans_merge(self, spark):
        from graph500_spark.operators.dedup import merged_dup_spans

        # 'a b c d e f' shared by both docs -> two overlapping
        # duplicated 5-grams in doc 2 (pos 1..5 and 2..6) merge to one
        # interval [1, 6].
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d e f"),
            ],
            "doc_id: long, text: string",
        )
        merged = {
            (r.doc_id, r.span_start, r.span_end, r.n_spans_merged)
            for r in merged_dup_spans(docs, n=5).collect()
        }
        assert merged == {(2, 1, 6, 2)}


class TestTemperatureMix:
    def test_small_sources_upsample_and_cap(self, spark):
        from graph500_spark.operators.corpus import corpus_mix_temperature

        rows = (
            [(i, "t", "en", "big", 1) for i in range(100)]
            + [(200 + i, "t", "en", "small", 1) for i in range(4)]
            + [(300, "t", "en", "tiny", 1)]
        )
        docs = spark.createDataFrame(
            rows, "doc_id: long, text: string, lang: string,"
            " source: string, n_chars: long"
        )
        out = corpus_mix_temperature(docs, alpha=0.5, max_epochs=6)
        per_src = {
            r.source: r.n
            for r in out.groupBy("source")
            .agg(F.countDistinct("epoch").alias("n"))
            .collect()
        }
        # alpha=0.5: epochs = round((sz/max)^-0.5): big->1, small->5,
        # tiny->10 capped at 6
        assert per_src == {"big": 1, "small": 5, "tiny": 6}
        # alpha=1 is uniform
        uni = corpus_mix_temperature(docs, alpha=1.0)
        assert uni.count() == len(rows)


class TestNormalizedDuplicates:
    def test_reformat_only_dups_collapse(self, spark):
        from graph500_spark.operators.dedup import normalized_duplicates

        rows = [
            (0, "Hello, World!", "en", "s0", 13),
            (1, "hello   world", "en", "s0", 13),   # same after norm
            (2, "HELLO WORLD.", "en", "s0", 12),    # same after norm
            (3, "goodbye world", "en", "s0", 13),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = {
            r.rep_doc_id: (r.n_copies, r.n_raw_variants)
            for r in normalized_duplicates(docs).collect()
        }
        assert out[0] == (3, 3)   # three raw variants, one norm group
        assert out[3] == (1, 1)

    def test_exact_dups_count_one_variant(self, spark):
        from graph500_spark.operators.dedup import normalized_duplicates

        rows = [
            (0, "same text", "en", "s0", 9),
            (1, "same text", "en", "s0", 9),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        row = normalized_duplicates(docs).collect()[0]
        assert (row.n_copies, row.n_raw_variants) == (2, 1)


class TestLevenshteinNearDuplicates:
    def test_finds_cross_bucket_pair(self, spark):
        from graph500_spark.operators.dedup import (
            levenshtein_near_duplicates,
        )

        # texts straddle a length-bucket boundary (63 vs 65 chars with
        # bucket=64) — the ±1 block expansion must still pair them
        a = "x" * 63
        b = "x" * 63 + "yz"
        rows = [
            (0, a, "en", "s0", len(a)),
            (1, b, "en", "s0", len(b)),
            (2, "totally unrelated different text", "en", "s0", 32),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = {
            (r.doc_a, r.doc_b): r.dist
            for r in levenshtein_near_duplicates(
                docs, max_dist=5, bucket=64
            ).collect()
        }
        assert out == {(0, 1): 2}

    def test_lang_blocks_and_threshold(self, spark):
        from graph500_spark.operators.dedup import (
            levenshtein_near_duplicates,
        )

        rows = [
            (0, "abcdefgh", "en", "s0", 8),
            (1, "abcdefgx", "en", "s0", 8),   # dist 1
            (2, "abcdefgh", "de", "s0", 8),   # same text, other lang
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = {(r.doc_a, r.doc_b) for r in
               levenshtein_near_duplicates(docs, max_dist=1, bucket=64).collect()}
        assert out == {(0, 1)}

    def test_bucket_narrower_than_dist_rejected(self, spark):
        from graph500_spark.operators.dedup import (
            levenshtein_near_duplicates,
        )

        with pytest.raises(ValueError):
            levenshtein_near_duplicates(
                spark.createDataFrame([], DOCS_SCHEMA), max_dist=64, bucket=32
            )


class TestHeavyHitterTokens:
    def test_counts_and_order(self, spark):
        from graph500_spark.operators.text import heavy_hitter_tokens

        rows = [
            (0, "apple apple banana", "en", "s0", 18),
            (1, "apple cherry", "en", "s0", 12),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = [
            (r.token, r.n_occurrences, r.n_docs)
            for r in heavy_hitter_tokens(docs, k=2).collect()
        ]
        assert out == [("apple", 3, 2), ("banana", 1, 1)]


class TestPmiCollocations:
    def test_fixed_phrase_tops(self, spark):
        from graph500_spark.operators.text import pmi_collocations

        # "new york" always co-occurs; filler tokens are independent
        rows = [
            (i, f"new york w{i} x{i} y{i} z{i}", "en", "s0", 30)
            for i in range(4)
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = pmi_collocations(docs, min_count=3, k=10).collect()
        assert [(r.x, r.y) for r in out] == [("new", "york")]
        assert out[0].n_xy == 4
        # p(xy)=4/20 bigrams, p(x)=p(y)=4/24 tokens → PMI=ln(7.2)
        import math

        assert out[0].pmi_q == round(math.log(0.2 / (4 / 24) ** 2) * 1e6)

    def test_min_count_floors_rare_pairs(self, spark):
        from graph500_spark.operators.text import pmi_collocations

        docs = spark.createDataFrame(
            [(0, "rare pair only once", "en", "s0", 19)], DOCS_SCHEMA
        )
        assert pmi_collocations(docs, min_count=2, k=10).count() == 0


class TestCharEntropy:
    def test_single_char_doc_is_zero(self, spark):
        from graph500_spark.operators.text import char_entropy

        docs = spark.createDataFrame(
            [(0, "aaaa", "en", "s0", 4)], DOCS_SCHEMA
        )
        row = char_entropy(docs).collect()[0]
        assert row.n_chars_calc == 4
        # H = ln 4 - (4 ln 4)/4 = 0
        assert row.entropy_micro == 0

    def test_uniform_two_symbols(self, spark):
        import math

        from graph500_spark.operators.text import char_entropy

        docs = spark.createDataFrame(
            [(0, "abab", "en", "s0", 4)], DOCS_SCHEMA
        )
        row = char_entropy(docs).collect()[0]
        # H = ln 4 - (2·2ln2 + 2·2ln2)/4... = ln2
        assert abs(row.entropy_micro - round(math.log(2) * 1e6)) <= 1


class TestUserRfm:
    def test_hand_values(self, spark):
        from graph500_spark.streaming.windows import user_rfm

        _min = 60_000_000_000  # one minute in nanos (legacy int branch)
        rows = [
            (0, 0 * _min, 1, "a", 1.5),
            (1, 5 * _min, 1, "a", 2.5),
            (2, 10 * _min, 2, "a", 7.0),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts long, user_id long,"
            " event_type string, value double",
        )
        out = {r.user_id: (r.recency_us, r.frequency, r.monetary)
               for r in user_rfm(ev).collect()}
        assert out[1] == (5 * 60_000_000, 2, 4.0)
        assert out[2] == (0, 1, 7.0)


class TestBigramLogppl:
    def test_hand_model(self, spark):
        import math

        from graph500_spark.operators.text import bigram_logppl

        # corpus = one doc "a b a b": bigrams ab, ba, ab
        # c(ab)=2 c(ba)=1 c(a)=2 c(b)=2 V=2
        docs = spark.createDataFrame(
            [(0, "a b a b", "en", "s0", 7)], DOCS_SCHEMA
        )
        row = bigram_logppl(docs).collect()[0]
        assert row.n_bigrams == 3
        nlp_ab = -round(math.log(3 / 4) * 1e6)
        nlp_ba = -round(math.log(2 / 4) * 1e6)
        assert row.neg_logprob_q == 2 * nlp_ab + nlp_ba
        assert row.logppl_micro == round(row.neg_logprob_q / 3)

    def test_single_token_doc_absent(self, spark):
        from graph500_spark.operators.text import bigram_logppl

        docs = spark.createDataFrame(
            [(0, "lonely", "en", "s0", 6), (1, "two tokens", "en", "s0", 10)],
            DOCS_SCHEMA,
        )
        assert [r.doc_id for r in bigram_logppl(docs).collect()] == [1]


class TestSourceOverlapMatrix:
    def test_shared_and_unshared(self, spark):
        from graph500_spark.operators.corpus import source_overlap_matrix

        rows = [
            (0, "shared text", "en", "sA", 11),
            (1, "shared text", "en", "sB", 11),
            (2, "shared text", "en", "sC", 11),
            (3, "only in A", "en", "sA", 9),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        out = {
            (r.source_a, r.source_b): r.n_shared_texts
            for r in source_overlap_matrix(docs).collect()
        }
        assert out == {
            ("sA", "sB"): 1, ("sA", "sC"): 1, ("sB", "sC"): 1,
        }

    def test_within_source_dups_do_not_count(self, spark):
        from graph500_spark.operators.corpus import source_overlap_matrix

        rows = [
            (0, "dup", "en", "sA", 3),
            (1, "dup", "en", "sA", 3),
        ]
        docs = spark.createDataFrame(rows, DOCS_SCHEMA)
        assert source_overlap_matrix(docs).count() == 0


class TestGraphSummary:
    def test_triangle(self, spark):
        from graph500_spark.operators.graph_build import graph_summary

        und = [(0, 1), (1, 2), (0, 2)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        row = graph_summary(edges).collect()[0]
        assert (row.n_vertices, row.n_directed_rows,
                row.n_undirected_edges, row.max_degree) == (3, 6, 3, 2)
        assert row.avg_degree == 2.0
        assert row.density == 1.0


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark):
        from graph500_spark.functions.skew import salted_join
        import pyspark.sql.functions as F

        left = spark.createDataFrame(
            [(k % 3, i) for i, k in enumerate(range(30))], "k: long, v: long"
        )
        right = spark.createDataFrame(
            [(0, "a"), (1, "b"), (1, "c")], "k: long, tag: string"
        )
        plain = sorted(
            map(tuple, left.join(right, ["k"]).collect())
        )
        salted = sorted(
            map(tuple, salted_join(left, right, ["k"], n_salt=4).collect())
        )
        assert salted == plain and len(plain) > 0

    def test_left_join_preserves_unmatched(self, spark):
        from graph500_spark.functions.skew import salted_join

        left = spark.createDataFrame([(1, 10), (2, 20)], "k: long, v: long")
        right = spark.createDataFrame([(1, "x")], "k: long, tag: string")
        out = sorted(
            map(tuple, salted_join(left, right, ["k"], n_salt=4,
                                   how="left").collect())
        )
        assert out == [(1, 10, "x"), (2, 20, None)]

    def test_rejects_other_join_types(self, spark):
        from graph500_spark.functions.skew import salted_join

        df = spark.createDataFrame([(1, 1)], "k: long, v: long")
        with pytest.raises(ValueError):
            salted_join(df, df, ["k"], how="full")


class TestDecontaminateSalted:
    def test_equals_unsalted(self, spark, docs):
        from graph500_spark.operators.corpus import (
            decontaminate,
            decontaminate_salted,
        )

        plain = sorted(map(tuple, decontaminate(docs).collect()))
        salted = sorted(map(tuple, decontaminate_salted(docs).collect()))
        assert salted == plain


class TestBestMatchSemantics:
    def test_greatest_per_group_tiebreak(self, spark):
        # pure-logic check of the greatest-per-group used by
        # best_match_per_doc: highest jaccard wins, tie -> min partner
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        sym = spark.createDataFrame(
            [(1, 2, 0.9), (1, 3, 0.9), (1, 4, 0.5)],
            "doc_id long, partner long, jaccard double",
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("jaccard").desc(), F.col("partner").asc()
        )
        best = (
            sym.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()[0]
        )
        assert (best.doc_id, best.partner) == (1, 2)


class TestTtrAndHapax:
    def test_ttr_hand_values(self, spark):
        from graph500_spark.operators.text import type_token_ratio

        docs = spark.createDataFrame(
            [(0, "a a a a", "en", "s0", 7), (1, "a b c d", "en", "s0", 7)],
            DOCS_SCHEMA,
        )
        out = {r.doc_id: (r.n_tokens, r.n_types, r.ttr_micro)
               for r in type_token_ratio(docs).collect()}
        assert out[0] == (4, 1, 250000)
        assert out[1] == (4, 4, 1000000)

    def test_hapax_profile(self, spark):
        from graph500_spark.operators.text import hapax_stats

        docs = spark.createDataFrame(
            [(0, "once twice twice thrice thrice thrice", "en", "s0", 38)],
            DOCS_SCHEMA,
        )
        row = hapax_stats(docs).collect()[0]
        assert (row.n_types, row.n_hapax, row.n_dis) == (3, 1, 1)
        assert row.hapax_ratio == round(1 / 3, 6)


class TestReciprocity:
    def test_half_reciprocal(self, spark):
        from graph500_spark.operators.graph_build import reciprocity

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 3), (3, 4)], "src: long, dst: long"
        )
        row = reciprocity(edges).collect()[0]
        assert (row.n_edges, row.n_reciprocal) == (4, 2)
        assert row.reciprocity == 0.5


def test_minhash_distinct_set_parity_on_replicated_corpus(spark, docs):
    """Pins the distinct-set (sid-level) minhash formulation against
    the per-doc reference shape on a replica-heavy corpus — the case
    the restructure exists for. Every doc is replicated 5x with fresh
    ids (the bench's 20x shape in miniature), so same-set families,
    cross-set near-dup expansion, and the empty-set family are all
    exercised; the outputs must match pair-for-pair INCLUDING the
    jaccard values."""
    reps = spark.range(5).select(F.col("id").alias("rep"))
    docs5 = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * 100).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    # add an empty-text family: empty shingle sets must stay excluded
    extra = spark.createDataFrame(
        [(900, "", "en", "s9", 0), (901, "", "en", "s9", 0)], DOCS_SCHEMA
    )
    docs5 = docs5.unionByName(extra)

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates(docs5, threshold=0.5).collect()
    }

    # reference: the pre-round per-doc formulation, inline
    cands = dedup.lsh_candidate_pairs(docs5)
    sh = dedup.shingle_hashes(docs5)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want
    # the replica families must actually be present (5 replicas of the
    # exact-dup pair 0/1 = one 10-doc same-set family, C(10,2) pairs)
    fam = [p for p in got if p[0] % 100 in (0, 1) and p[1] % 100 in (0, 1)]
    assert len(fam) == 45 and all(got[p] == 1.0 for p in fam)
    # empty-set docs never pair
    assert all(900 not in p and 901 not in p for p in got)
