"""Unit tests for training-set preparation operators (split
stability, TF-IDF ordering, concat-and-chunk packing invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph500_spark.operators.traindata import (
    PACK_SHARDS,
    pack_chunks,
    term_doc_frequency,
    tfidf_top_terms,
    train_test_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestSplit:
    def test_split_is_stable_under_appends(self, spark):
        small = _docs(spark, [(i, "x") for i in range(50)])
        big = _docs(spark, [(i, "x") for i in range(100)])
        s_small = {
            r.doc_id: r.split for r in train_test_split(small).collect()
        }
        s_big = {r.doc_id: r.split for r in train_test_split(big).collect()}
        assert all(s_big[d] == s for d, s in s_small.items())

    def test_proportion_roughly_holds(self, spark):
        docs = _docs(spark, [(i, "x") for i in range(2000)])
        out = train_test_split(docs, test_permille=250)
        n_test = out.filter(F.col("split") == "test").count()
        assert 0.18 < n_test / 2000 < 0.32


class TestTfidf:
    DOCS = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]

    def test_df_counts(self, spark):
        out = {
            r.term: r.df
            for r in term_doc_frequency(_docs(spark, self.DOCS)).collect()
        }
        assert out == {"apple": 1, "banana": 2, "cherry": 2, "durian": 1}

    def test_rare_term_tops_its_doc(self, spark):
        top = tfidf_top_terms(_docs(spark, self.DOCS), k=1).collect()
        best = {r.doc_id: r.term for r in top}
        # doc 1: apple tf=2 and rarer than banana; doc 3: cherry tf=3
        # dominates even though durian is rarer.
        assert best[1] == "apple"
        assert best[2] == "cherry" or best[2] == "banana"
        assert best[3] == "cherry"


class TestPacking:
    def test_chunks_cover_token_stream(self, spark):
        rows = [(i, " ".join(["tok"] * (3 * i % 7 + 1))) for i in range(40)]
        out = pack_chunks(_docs(spark, rows), budget=5).collect()
        assert len(out) == 40
        by_shard: dict[int, list] = {}
        for r in out:
            assert 0 <= r.shard < PACK_SHARDS
            assert r.end_chunk >= r.start_chunk
            by_shard.setdefault(r.shard, []).append(r)
        # within a shard, chunk intervals are non-decreasing in doc_id
        # order and contiguous (next start == prev end or prev end + 1
        # when the cut falls exactly on the boundary)
        for rows_ in by_shard.values():
            rows_.sort(key=lambda r: r.doc_id)
            for a, b in zip(rows_, rows_[1:]):
                assert b.start_chunk in (a.end_chunk, a.end_chunk + 1)

    def test_doc_longer_than_budget_spans_chunks(self, spark):
        rows = [(7, " ".join(["tok"] * 23))]
        r = pack_chunks(_docs(spark, rows), budget=5).collect()[0]
        assert r.end_chunk - r.start_chunk == 4  # 23 tokens / 5 ⇒ 5 chunks


class TestNaiveBayes:
    DOCS = [
        (1, "der hund und die katze", "de"),
        (2, "die der und nicht ist", "de"),
        (3, "the cat and the dog", "en"),
        (4, "the of and to in", "en"),
        # held-out-ish rows: label says de/en, tokens overlap training
        (5, "der und die", "de"),
        (6, "the and of", "en"),
    ]

    def _docs(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id: long, text: string, lang: string"
        )

    def test_train_table_shape_and_monotonicity(self, spark):
        from graph500_spark.operators.traindata import nb_train

        model = nb_train(self._docs(spark)).collect()
        rows = {(r.lang, r.token): r.ll_q for r in model}
        # seen-token likelihood always above an unseen one would be
        # (floor): cnt+1 >= 2 > 1
        assert all(v < 0 for v in rows.values())
        # 'der' appears 3x in de -> higher (less negative) than 'katze' 1x
        assert rows[("de", "der")] > rows[("de", "katze")]
        # no cross-label leakage rows for tokens never seen in a lang
        assert ("en", "katze") not in rows

    def test_predict_recovers_training_labels(self, spark):
        from graph500_spark.operators.traindata import nb_predict

        preds = {
            r.doc_id: r.nb_pred
            for r in nb_predict(self._docs(spark)).collect()
        }
        want = {d[0]: d[2] for d in self.DOCS}
        assert preds == want


class TestFeatureHashing:
    def test_repeated_token_accumulates(self, spark):
        from graph500_spark.operators.traindata import feature_hashing

        docs = spark.createDataFrame(
            [(0, "spark spark spark", "en", "s0", 17)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rows = feature_hashing(docs).collect()
        assert len(rows) == 1
        assert abs(rows[0].feature_val) == 3
        assert 0 <= rows[0].feature_idx < 256

    def test_same_text_same_features(self, spark):
        from graph500_spark.operators.traindata import feature_hashing

        docs = spark.createDataFrame(
            [
                (0, "alpha bravo charlie", "en", "s0", 19),
                (1, "alpha bravo charlie", "en", "s0", 19),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        feats = feature_hashing(docs).collect()
        f0 = sorted((r.feature_idx, r.feature_val) for r in feats if r.doc_id == 0)
        f1 = sorted((r.feature_idx, r.feature_val) for r in feats if r.doc_id == 1)
        assert f0 == f1 and len(f0) >= 1

    def test_dim_bounds_and_dtype(self, spark):
        from graph500_spark.operators.traindata import feature_hashing

        docs = spark.createDataFrame(
            [(0, "one two three four five six seven eight", "en", "s0", 39)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = feature_hashing(docs, dim=16)
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "feature_idx", "feature_val",
        ]
        assert all(0 <= r.feature_idx < 16 for r in out.collect())


class TestKnnPredictAndDimStats:
    def _embs(self, spark):
        # two tight clusters on axes 0 and 1; queries are vec_id 0, 50
        rows = []
        for i in range(6):
            rows.append((i * 50 if i < 2 else i + 100,
                         [1.0, 0.01 * i, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.01 * i],
                         i % 2))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_knn_majority_label(self, spark):
        from graph500_spark.operators.simsearch import knn_predict

        # cluster A (label 0) along x-axis: ids 0, 102, 104
        # cluster B (label 1) along y-axis: ids 50, 103, 105
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (102, [0.99, 0.1, 0.0], 0),
            (104, [0.98, 0.15, 0.0], 0),
            (50, [0.0, 1.0, 0.0], 1),
            (103, [0.1, 0.99, 0.0], 1),
            (105, [0.15, 0.98, 0.0], 1),
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {
            r.query_id: (r.true_label, r.predicted_label)
            for r in knn_predict(embs, k=2).collect()
        }
        assert out == {0: (0, 0), 50: (1, 1)}

    def test_dim_stats_hand_values(self, spark):
        from graph500_spark.operators.simsearch import embedding_dim_stats

        embs = spark.createDataFrame(
            [(0, [1.0, 2.0], 0), (1, [3.0, 2.0], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        out = {r.dim: (r.n, r.mean, r.std)
               for r in embedding_dim_stats(embs).collect()}
        assert out[1] == (2, 2.0, 1.0)   # values 1, 3
        assert out[2] == (2, 2.0, 0.0)   # values 2, 2


class TestDocChunks:
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"

    def test_sliding_windows_with_overlap(self, spark):
        from graph500_spark.operators.traindata import doc_chunks

        # 10 tokens, size 4, stride 3 → starts 0,3,6,9
        text = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame([(0, text, "en", "s0", len(text))],
                                     self.DOCS)
        rows = sorted(
            (r.chunk_idx, r.start_token, r.n_chunk_tokens, r.chunk_text)
            for r in doc_chunks(docs, size=4, stride=3).collect()
        )
        assert rows == [
            (0, 0, 4, "t0 t1 t2 t3"),
            (1, 3, 4, "t3 t4 t5 t6"),
            (2, 6, 4, "t6 t7 t8 t9"),
            (3, 9, 1, "t9"),
        ]

    def test_short_doc_single_chunk(self, spark):
        from graph500_spark.operators.traindata import doc_chunks

        docs = spark.createDataFrame([(0, "a b", "en", "s0", 3)], self.DOCS)
        rows = doc_chunks(docs, size=4, stride=3).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "a b"

    def test_empty_doc_absent(self, spark):
        from graph500_spark.operators.traindata import doc_chunks

        docs = spark.createDataFrame([(0, "!!!", "en", "s0", 3)], self.DOCS)
        assert doc_chunks(docs).count() == 0

    def test_invalid_stride_rejected(self, spark):
        from graph500_spark.operators.traindata import doc_chunks

        docs = spark.createDataFrame([], self.DOCS)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            doc_chunks(docs, size=4, stride=5)


class TestFilteredSearchAndPrototypes:
    def test_filtered_neighbors_share_label(self, spark):
        from graph500_spark.operators.simsearch import cosine_topk_filtered

        rows = [
            (0, [1.0, 0.0], 0),     # query (vec_id % 50 == 0)
            (1, [0.9, 0.1], 0),
            (2, [1.0, 0.0], 1),     # identical vector, wrong label
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = cosine_topk_filtered(embs, k=5).collect()
        assert {r.neighbor_id for r in out} == {1}

    def test_prototype_means(self, spark):
        from graph500_spark.operators.simsearch import label_prototypes

        embs = spark.createDataFrame(
            [(0, [1.0, 0.0], 0), (1, [3.0, 0.0], 0), (2, [5.0, 2.0], 1)],
            "vec_id long, embedding array<float>, label int",
        )
        out = {(r.label, r.dim): (r.n, r.mean_q)
               for r in label_prototypes(embs).collect()}
        assert out[(0, 1)] == (2, 2_000_000)
        assert out[(0, 2)] == (2, 0)
        assert out[(1, 1)] == (1, 5_000_000)


class TestPrototypePredict:
    def test_queries_classified_by_nearest_centroid(self, spark):
        from graph500_spark.operators.simsearch import prototype_predict

        rows = [
            (0, [1.0, 0.0], 0),      # query on x-axis
            (50, [0.0, 1.0], 1),     # query on y-axis
            (101, [0.9, 0.1], 0),
            (102, [0.1, 0.9], 1),
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {
            r.query_id: (r.true_label, r.predicted_label)
            for r in prototype_predict(embs).collect()
        }
        assert out == {0: (0, 0), 50: (1, 1)}


class TestDegreeHistogramLog:
    def test_bit_length_buckets(self, spark):
        from graph500_spark.operators.graph_build import (
            degree_histogram_log,
        )
        import pyspark.sql.functions as F

        # star: hub degree 5 (bucket 2), leaves degree 1 (bucket 0)
        und = [(0, i) for i in range(1, 6)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        out = {r.log2_bucket: (r.n_vertices, r.min_degree, r.max_degree)
               for r in degree_histogram_log(edges).collect()}
        assert out == {0: (5, 1, 1), 2: (1, 5, 5)}


class TestQualityWeightedSample:
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"

    def test_deterministic_and_score_bounded(self, spark):
        from graph500_spark.operators.traindata import (
            model_quality_scores,
            quality_weighted_sample,
        )

        rows = [(i, f"tok{i} words here {i}", "en", "s0", 20)
                for i in range(50)]
        docs = spark.createDataFrame(rows, self.DOCS)
        a = sorted(r.doc_id for r in quality_weighted_sample(docs).collect())
        b = sorted(r.doc_id for r in quality_weighted_sample(docs).collect())
        assert a == b
        # every kept row satisfies the acceptance inequality
        for r in quality_weighted_sample(docs).collect():
            assert r.bucket < r.model_score_e5

    def test_zero_score_never_kept(self, spark):
        from graph500_spark.operators.traindata import (
            quality_weighted_sample,
        )

        # tokenless docs score 0 → never accepted
        docs = spark.createDataFrame(
            [(i, "!!!", "en", "s0", 3) for i in range(20)], self.DOCS
        )
        assert quality_weighted_sample(docs).count() == 0


class TestDedupRateBySource:
    def test_rates(self, spark):
        from graph500_spark.operators.corpus import dedup_rate_by_source

        rows = [
            (0, "x", "en", "sA", 1),
            (1, "x", "en", "sA", 1),
            (2, "y", "en", "sA", 1),
            (3, "z", "en", "sB", 1),
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = {r.source: (r.n_docs, r.n_distinct_texts, r.n_dup_docs,
                          r.dup_rate)
               for r in dedup_rate_by_source(docs).collect()}
        assert out["sA"] == (3, 2, 1, round(1 / 3, 6))
        assert out["sB"] == (1, 1, 0, 0.0)


class TestTfidfCosinePairs:
    DOCS = "doc_id long, text string, lang string, source string, n_chars long"

    def test_identical_docs_cosine_one(self, spark):
        from graph500_spark.operators.traindata import tfidf_cosine_pairs

        rows = [
            (0, "alpha beta gamma", "en", "s0", 16),
            (1, "alpha beta gamma", "en", "s0", 16),
            (2, "totally different words", "en", "s0", 23),
        ]
        docs = spark.createDataFrame(rows, self.DOCS)
        out = {(r.doc_a, r.doc_b): r.cosine
               for r in tfidf_cosine_pairs(docs, threshold=0.9).collect()}
        assert out == {(0, 1): 1.0}

    def test_cross_source_pairs_blocked(self, spark):
        from graph500_spark.operators.traindata import tfidf_cosine_pairs

        rows = [
            (0, "same words here", "en", "sA", 15),
            (1, "same words here", "en", "sB", 15),
        ]
        docs = spark.createDataFrame(rows, self.DOCS)
        # within-source blocking: the cross-source identical pair is
        # out of scope by design (LSH candidates own that case)
        assert tfidf_cosine_pairs(docs, threshold=0.1).count() == 0


class TestWeightedDegrees:
    def test_strength_sums(self, spark):
        from graph500_spark.operators.graph_build import weighted_degrees

        edges = spark.createDataFrame(
            [(1, 2, 5), (1, 3, 7), (2, 1, 5)],
            "src: long, dst: long, weight: long",
        )
        out = {r.vertex: (r.degree, r.strength)
               for r in weighted_degrees(edges).collect()}
        assert out == {1: (2, 12), 2: (1, 5)}


class TestCurriculumOrder:
    def test_exact_global_rank_with_ties(self, spark):
        from graph500_spark.operators.traindata import (
            curriculum_order,
            model_quality_scores,
        )

        # identical texts → identical scores → doc_id tiebreak; empty
        # text scores 0 and ranks last
        rows = [
            (10, "alpha beta"),
            (3, "alpha beta"),
            (7, "gamma gamma gamma"),
            (1, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")
        out = {
            r.doc_id: r.global_rank
            for r in curriculum_order(docs, num_parts=3).collect()
        }
        scores = {
            r.doc_id: r.model_score_e5
            for r in model_quality_scores(docs).collect()
        }
        want_order = sorted(scores, key=lambda d: (-scores[d], d))
        assert out == {d: i + 1 for i, d in enumerate(want_order)}
        # ranks are a permutation of 1..n regardless of partitioning
        assert sorted(out.values()) == [1, 2, 3, 4]

    def test_partition_count_invariance(self, spark):
        from graph500_spark.operators.traindata import curriculum_order

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        a = {
            r.doc_id: r.global_rank
            for r in curriculum_order(docs, num_parts=2).collect()
        }
        b = {
            r.doc_id: r.global_rank
            for r in curriculum_order(docs, num_parts=13).collect()
        }
        assert a == b

    def test_plan_has_no_single_partition_sort(self, spark):
        import contextlib
        import io

        from graph500_spark.operators.traindata import curriculum_order

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        df = curriculum_order(docs)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # the scale trap this operator exists to avoid: an
        # unpartitioned window's Exchange SinglePartition
        assert "SinglePartition" not in plan, plan


class TestBm25:
    DOCS = [
        (1, "apple banana apple apple"),
        (2, "apple banana"),
        (3, "cherry cherry banana cherry durian"),
        (4, "durian"),
    ]

    def _run(self, spark, queries, k=10):
        from graph500_spark.operators.traindata import bm25_topk

        return bm25_topk(_docs(spark, self.DOCS), k=k, queries=queries)

    def test_matches_hand_computed(self, spark):
        import math

        out = self._run(spark, (("q", ("apple",)),)).collect()
        # N=4, df(apple)=2, idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
        # dl: 4, 2, 5, 1; avgdl = 3.0; k1=1.2, b=0.75
        def score(tf, dl):
            idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
            return round(
                idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)),
                5,
            )

        got = {r.doc_id: r.bm25 for r in out}
        assert got == {1: score(3, 4), 2: score(1, 2)}

    def test_multi_term_sum_and_rank(self, spark):
        out = self._run(spark, (("q", ("apple", "banana")),)).collect()
        ranks = {r.doc_id: r.rank for r in out}
        # doc 1 carries apple tf=3 + banana; doc 2 both terms shorter
        # doc; doc 3 only banana — saturation still ranks 1 or 2 first
        assert set(ranks) == {1, 2, 3}
        assert ranks[3] == 3

    def test_rarer_term_outscores_common_at_same_tf(self, spark):
        out = self._run(
            spark, (("qa", ("durian",)), ("qb", ("banana",)))
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, {})[r.doc_id] = r.bm25
        # durian df=2 < banana df=3: for doc 3 (same dl, tf=1 both)
        # the rarer term must score at least as high
        assert by_q["qa"][3] > by_q["qb"][3]

    def test_topk_cutoff(self, spark):
        out = self._run(spark, (("q", ("banana",)),), k=2).collect()
        assert len(out) == 2 and all(r.rank <= 2 for r in out)
