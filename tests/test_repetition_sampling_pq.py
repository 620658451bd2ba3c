"""Unit tests for the round-3 additions: Gopher-style repetition
stats, stratified per-source sampling, and product-quantization ANN.
(Cross-engine value parity is covered by the oracle gate; these pin
the operator semantics on hand-computable fixtures.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph500_spark.operators.simsearch import (
    PQ_M,
    cosine_topk_pq,
    pq_codes,
)
from graph500_spark.operators.text import repetition_stats
from graph500_spark.operators.traindata import stratified_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestRepetitionStats:
    def test_hand_computed_fractions(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a a a a"),          # fully repetitive
                (2, "w x y z"),          # fully distinct
                (3, "..."),              # zero tokens
                (4, "a b a b a b"),      # repeating 2-gram pattern
            ],
        )
        rows = {r.doc_id: r for r in repetition_stats(docs).collect()}

        r1 = rows[1]
        assert r1.n_tokens == 4
        assert r1.top_token_frac == 1.0
        # 2-grams: ['a a'] x3 -> (3 - 1) / 3
        assert r1.dup_2gram_frac == pytest.approx(2 / 3, abs=1e-6)
        # 3-grams: ['a a a'] x2 -> (2 - 1) / 2
        assert r1.dup_3gram_frac == pytest.approx(0.5, abs=1e-6)

        r2 = rows[2]
        assert r2.dup_2gram_frac == 0.0
        assert r2.top_token_frac == pytest.approx(0.25, abs=1e-6)

        r3 = rows[3]
        assert r3.n_tokens == 0
        assert (
            r3.dup_2gram_frac
            == r3.dup_3gram_frac
            == r3.top_token_frac
            == r3.top_2gram_frac
            == 0.0
        )

        r4 = rows[4]
        # tokens a,b alternating: top token frac = 3/6
        assert r4.top_token_frac == 0.5
        # 2-grams: 'a b','b a','a b','b a','a b' -> dup = 5-2 = 3
        assert r4.dup_2gram_frac == pytest.approx(3 / 5, abs=1e-6)
        # top 2-gram 'a b' x3 of 5
        assert r4.top_2gram_frac == pytest.approx(0.6, abs=1e-6)


class TestStratifiedSample:
    def _src_docs(self, spark, n=400):
        rows = [(i, "t", "en", "sA" if i % 2 == 0 else "sB", 1) for i in range(n)]
        return spark.createDataFrame(
            rows, "doc_id: long, text: string, lang: string,"
            " source: string, n_chars: long"
        )

    def test_rates_respected_exactly_at_extremes(self, spark):
        docs = self._src_docs(spark)
        out = stratified_sample(docs, rates={"sA": 1000, "sB": 0}).collect()
        kept = {r.doc_id for r in out}
        assert kept == {i for i in range(400) if i % 2 == 0}

    def test_deterministic_and_append_stable(self, spark):
        small = self._src_docs(spark, 200)
        big = self._src_docs(spark, 400)
        rates = {"sA": 500, "sB": 250}
        kept_small = {r.doc_id for r in stratified_sample(small, rates).collect()}
        kept_big = {r.doc_id for r in stratified_sample(big, rates).collect()}
        # a doc's decision never changes when the corpus grows
        assert kept_small == {d for d in kept_big if d < 200}

    def test_intermediate_rate_roughly_holds(self, spark):
        docs = self._src_docs(spark, 2000)
        out = stratified_sample(docs, rates={"sA": 500, "sB": 500})
        frac = out.count() / 2000
        assert 0.4 < frac < 0.6


class TestPQ:
    def _embs(self, spark, n=120, dim=64):
        rows = [
            (i, [((i * 31 + j * 7) % 19 - 9) / 10.0 for j in range(dim)], 0)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id: long, embedding: array<float>, label: int"
        )

    def test_codebook_vectors_encode_to_themselves(self, spark):
        embs = self._embs(spark)
        codes = pq_codes(embs, codebook_filter="vec_id % 10 = 1")
        own = codes.filter(F.expr("vec_id % 10 = 1"))
        # a seed's subvector is L2-0 from its own codeword; ties by min
        # cid can only pick another seed with an IDENTICAL subvector,
        # which still has distance 0 — so distance must be 0: check via
        # code's subvector equality is overkill; the argmin guarantees
        # cosine_topk_pq correctness, here we pin the common case
        mismatched = own.filter(F.col("code") != F.col("vec_id")).count()
        # allow only exact-duplicate-subvector collisions (deterministic
        # fixture has none)
        assert mismatched == 0
        assert codes.count() == 120 * PQ_M

    def test_topk_shape_and_rank_contract(self, spark):
        embs = self._embs(spark)
        out = cosine_topk_pq(
            embs, k=3, query_filter="vec_id % 40 = 0",
            codebook_filter="vec_id % 10 = 1",
        )
        rows = out.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        assert set(by_q) == {0, 40, 80}
        for q, rs in by_q.items():
            ranks = sorted(r.rank for r in rs)
            assert ranks == [1, 2, 3]
            assert all(r.neighbor_id != q for r in rs)
            # scores non-increasing in rank
            rs = sorted(rs, key=lambda r: r.rank)
            assert all(
                rs[i].cosine >= rs[i + 1].cosine for i in range(len(rs) - 1)
            )


class TestVocabCoverage:
    def test_ordering_and_cumulative(self, spark):
        from graph500_spark.operators.traindata import vocab_coverage

        docs = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a b d")],
            "doc_id: long, text: string",
        )
        rows = vocab_coverage(docs, top_n=3).orderBy("rank").collect()
        assert [(r.token, r.cnt) for r in rows] == [("a", 4), ("b", 3), ("c", 1)]
        assert rows[0].frac == pytest.approx(4 / 9, abs=1e-6)
        assert rows[1].cum_frac == pytest.approx(7 / 9, abs=1e-6)
        # ranks dense from 1
        assert [r.rank for r in rows] == [1, 2, 3]

    def test_tie_breaks_lexicographic(self, spark):
        from graph500_spark.operators.traindata import vocab_coverage

        docs = spark.createDataFrame(
            [(1, "z y z y")], "doc_id: long, text: string"
        )
        rows = vocab_coverage(docs, top_n=2).orderBy("rank").collect()
        assert [r.token for r in rows] == ["y", "z"]


class TestEventValueQuantiles:
    def test_percentiles_match_interpolation(self, spark):
        from graph500_spark.streaming.windows import event_value_quantiles

        import datetime

        ts = datetime.datetime(2024, 1, 1)
        rows = [(i, ts, 1, "click", float(v), "{}") for i, v in
                enumerate([1.0, 2.0, 3.0, 4.0])]
        events = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp, user_id: long,"
            " event_type: string, value: double, props: string",
        )
        out = event_value_quantiles(events).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_events == 4
        # linear interpolation: p25 of [1,2,3,4] = 1.75, p50 = 2.5
        assert r.p25 == pytest.approx(1.75)
        assert r.p50 == pytest.approx(2.5)
        assert r.p90 == pytest.approx(3.7)
        assert r.min_value == 1.0 and r.max_value == 4.0


class TestAnnRecall:
    def test_recall_bounds_and_methods(self, spark):
        from graph500_spark.operators.simsearch import ann_recall

        rows = [
            (i, [((i * 13 + j * 5) % 17 - 8) / 8.0 for j in range(64)], 0)
            for i in range(150)
        ]
        embs = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<float>, label: int"
        )
        out = {r.method: r for r in ann_recall(embs, k=3).collect()}
        assert set(out) == {"ivf", "lsh", "pq", "pq_rerank"}
        for m, r in out.items():
            assert 0.0 <= r.recall <= 1.0, m
            assert r.n_hits >= 0
        # exact rerank of an ADC shortlist can only improve recall
        assert out["pq_rerank"].recall >= out["pq"].recall


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        from graph500_spark.operators.text import pii_scrub

        docs = _docs(
            spark,
            [
                (1, "mail me at jane.doe@example.com or call 555-123-4567"),
                (2, "ssn 123-45-6789 from host 192.168.0.1"),
                (3, "nothing sensitive here"),
            ],
        )
        rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
        r1 = rows[1]
        assert r1.n_email == 1 and r1.n_phone == 1
        assert "<EMAIL>" in r1.redacted and "<PHONE>" in r1.redacted
        assert "jane.doe" not in r1.redacted
        r2 = rows[2]
        assert r2.n_ssn == 1 and r2.n_ipv4 == 1
        assert "<SSN>" in r2.redacted and "<IPV4>" in r2.redacted
        assert "123-45-6789" not in r2.redacted
        r3 = rows[3]
        assert (r3.n_email, r3.n_ssn, r3.n_phone, r3.n_ipv4) == (0, 0, 0, 0)
        assert r3.redacted == "nothing sensitive here"


class TestUnigramLogppl:
    def test_rare_tokens_score_higher(self, spark):
        from graph500_spark.operators.text import unigram_logppl

        # 'common' dominates the corpus; doc 2 is all rare tokens
        docs = _docs(
            spark,
            [
                (1, "common common common common common common"),
                (2, "rare1 rare2 rare3"),
                (3, "common rare1"),
            ],
        )
        rows = {r.doc_id: r for r in unigram_logppl(docs).collect()}
        assert rows[1].logppl_micro < rows[3].logppl_micro
        assert rows[3].logppl_micro < rows[2].logppl_micro
        # exactness: total = n_tokens-weighted combination
        assert rows[1].n_tokens == 6 and rows[2].n_tokens == 3
        assert rows[1].neg_logprob_q == 6 * (
            rows[1].neg_logprob_q // 6
        )  # six identical tokens -> divisible total
