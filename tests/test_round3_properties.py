"""Property/differential tests for the round-3 operators: the
repetition statistics are checked against an independent pure-Python
reference on hypothesis-generated corpora, and the span-merge /
sampling invariants are asserted over randomized inputs. (Cross-engine
value parity is the oracle gate's job; these pin the semantics against
a second implementation and against algebraic invariants.)"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graph500_spark.operators.dedup import duplicate_spans, merged_dup_spans
from graph500_spark.operators.text import repetition_stats

TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "e9"]), min_size=0, max_size=12
)
CORPUS = st.lists(TOKENS, min_size=1, max_size=5)


def _py_repetition(tokens: list[str]) -> dict:
    def dup_frac(n):
        grams = [
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        ]
        if not grams:
            return 0.0
        return (len(grams) - len(set(grams))) / len(grams)

    def top_frac(items):
        if not items:
            return 0.0
        c = Counter(items)
        return max(c.values()) / len(items)

    grams2 = [" ".join(tokens[i : i + 2]) for i in range(len(tokens) - 1)]
    return {
        "n_tokens": len(tokens),
        "dup_2gram_frac": dup_frac(2),
        "dup_3gram_frac": dup_frac(3),
        "top_token_frac": top_frac(tokens),
        "top_2gram_frac": top_frac(grams2),
    }


@pytest.mark.usefixtures("spark")
class TestRepetitionDifferential:
    @given(CORPUS)
    @settings(max_examples=8, deadline=None)
    def test_matches_python_reference(self, spark, corpus):
        docs = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: r for r in repetition_stats(docs).collect()}
        for i, toks in enumerate(corpus):
            want = _py_repetition(toks)
            r = got[i]
            assert r.n_tokens == want["n_tokens"], toks
            for k in (
                "dup_2gram_frac",
                "dup_3gram_frac",
                "top_token_frac",
                "top_2gram_frac",
            ):
                assert abs(getattr(r, k) - want[k]) <= 1e-6, (k, toks)


class TestSpanInvariants:
    def test_merged_spans_are_disjoint_sorted_and_cover(self, spark):
        # randomized-but-deterministic corpus with heavy duplication
        vocab = ["w%d" % (i % 7) for i in range(11)]
        rows = [
            (
                d,
                " ".join(
                    vocab[(d * 13 + j * 5) % len(vocab)] for j in range(30)
                ),
            )
            for d in range(24)
        ]
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")
        raw = duplicate_spans(docs, n=5).collect()
        merged = merged_dup_spans(docs, n=5).collect()

        by_doc: dict[int, list] = {}
        for m in merged:
            by_doc.setdefault(m.doc_id, []).append(m)
        for d, spans in by_doc.items():
            spans.sort(key=lambda s: s.span_start)
            for s in spans:
                assert 1 <= s.span_start <= s.span_end <= 30
            # disjoint AND non-adjacent (adjacent would have merged)
            for a, b in zip(spans, spans[1:]):
                assert b.span_start > a.span_end + 1, (d, a, b)

        # every removable raw span lies inside exactly one merged span
        for r in raw:
            hits = [
                m
                for m in by_doc.get(r.doc_id, [])
                if m.span_start <= r.start_pos and r.end_pos <= m.span_end
            ]
            assert len(hits) == 1, r
        # merged span counts add up to the raw span count
        assert sum(m.n_spans_merged for m in merged) == len(raw)


class TestSamplingInvariants:
    def test_output_subset_and_bucket_under_rate(self, spark):
        from graph500_spark.operators.traindata import stratified_sample

        rows = [
            (i, "t", "xx", f"s{i % 5}", 1) for i in range(500)
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )
        rates = {"s0": 0, "s1": 100, "s2": 500, "s3": 900, "s4": 1000}
        out = stratified_sample(docs, rates).collect()
        in_ids = {r[0] for r in rows}
        for r in out:
            assert r.doc_id in in_ids
            assert 0 <= r.bucket < rates[r.source]
        assert not [r for r in out if r.source == "s0"]
        n4 = sum(1 for r in out if r.source == "s4")
        assert n4 == 100  # rate 1000 keeps every s4 row


class TestEmptyInputs:
    """Operators must return empty results (correct schema), not
    crash, on an empty corpus — the behavior a pipeline stage sees
    when a partition filter matches nothing."""

    def _empty_docs(self, spark):
        return spark.createDataFrame(
            [],
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )

    def test_text_family_on_empty(self, spark):
        from graph500_spark.operators.text import repetition_stats
        from graph500_spark.operators.traindata import (
            nb_train,
            stratified_sample,
            vocab_coverage,
        )

        empty = self._empty_docs(spark)
        assert repetition_stats(empty).count() == 0
        assert vocab_coverage(empty).count() == 0
        assert stratified_sample(empty).count() == 0
        assert nb_train(empty).count() == 0

    def test_span_family_on_empty(self, spark):
        from graph500_spark.operators.dedup import (
            duplicate_spans,
            merged_dup_spans,
        )

        empty = self._empty_docs(spark)
        assert duplicate_spans(empty).count() == 0
        assert merged_dup_spans(empty).count() == 0

    def test_quantiles_on_empty_events(self, spark):
        from graph500_spark.streaming.windows import event_value_quantiles

        empty = spark.createDataFrame(
            [],
            "event_id: long, ts: timestamp, user_id: long,"
            " event_type: string, value: double, props: string",
        )
        assert event_value_quantiles(empty).count() == 0
        assert event_value_quantiles(empty, approx=True).count() == 0


EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double"
)
# ts as raw bigint NANOS (eventtime.py's legacy integral branch)
_US = 1000  # 1 microsecond in nanos
_MIN = 60_000_000 * _US


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


class TestSlidingWindows:
    def test_each_event_in_size_over_slide_windows(self, spark):
        from graph500_spark.streaming.windows import sliding_window_counts

        # one event at t=12min with 10min/5min windows → it belongs to
        # starts 10min and 5min (not 0: 0+10 ≤ 12)
        ev = _events(spark, [(0, 12 * _MIN, 1, "click", 1.0)])
        out = sorted(
            (r.window_start_us, r.n_events)
            for r in sliding_window_counts(ev, 10, 5).collect()
        )
        assert out == [(5 * 60_000_000, 1), (10 * 60_000_000, 1)]

    def test_counts_partition_events(self, spark):
        from graph500_spark.streaming.windows import sliding_window_counts

        ev = _events(
            spark,
            [(i, i * _MIN, 1, "click", 1.0) for i in range(0, 30)],
        )
        out = sliding_window_counts(ev, 10, 5).collect()
        # every event appears in exactly 2 windows
        assert sum(r.n_events for r in out) == 60

    def test_indivisible_slide_rejected(self, spark):
        from graph500_spark.streaming.windows import sliding_window_counts

        with pytest.raises(ValueError):
            sliding_window_counts(_events(spark, []), 10, 3)


class TestRetentionCohorts:
    def test_triangle(self, spark):
        from graph500_spark.streaming.windows import (
            DAY_US,
            retention_cohorts,
        )

        day = DAY_US * _US  # nanos per day
        rows = [
            # user 1: days 0, 1, 3; user 2: days 1, 3; user 3: day 3
            (0, 0 * day, 1, "a", 0.0),
            (1, 1 * day, 1, "a", 0.0),
            (2, 3 * day, 1, "a", 0.0),
            (3, 1 * day, 2, "a", 0.0),
            (4, 3 * day, 2, "a", 0.0),
            (5, 3 * day, 3, "a", 0.0),
        ]
        out = {
            (r.cohort_day, r.day_offset): r.n_users
            for r in retention_cohorts(_events(spark, rows)).collect()
        }
        assert out == {
            (0, 0): 1, (0, 1): 1, (0, 3): 1,
            (1, 0): 1, (1, 2): 1,
            (3, 0): 1,
        }


class TestEventTypeTransitions:
    def test_bigrams_per_user(self, spark):
        from graph500_spark.streaming.windows import event_type_transitions

        rows = [
            (0, 1 * _MIN, 1, "view", 0.0),
            (1, 2 * _MIN, 1, "click", 0.0),
            (2, 3 * _MIN, 1, "purchase", 0.0),
            (3, 1 * _MIN, 2, "view", 0.0),
            (4, 2 * _MIN, 2, "click", 0.0),
        ]
        out = {
            (r.from_type, r.to_type): r.n_transitions
            for r in event_type_transitions(_events(spark, rows)).collect()
        }
        assert out == {("view", "click"): 2, ("click", "purchase"): 1}

    def test_simultaneous_ties_break_on_event_id(self, spark):
        from graph500_spark.streaming.windows import event_type_transitions

        rows = [
            (0, 1 * _MIN, 1, "a", 0.0),
            (1, 1 * _MIN, 1, "b", 0.0),  # same ts — event_id orders it
        ]
        out = {
            (r.from_type, r.to_type): r.n_transitions
            for r in event_type_transitions(_events(spark, rows)).collect()
        }
        assert out == {("a", "b"): 1}


class TestMultiTouchAttribution:
    def test_equal_split_within_window(self, spark):
        from graph500_spark.operators.asof import multi_touch_attribution

        _min = 60_000_000_000  # one minute in nanos
        rows = [
            (0, 10 * _min, 1, "click", 0.0),
            (1, 30 * _min, 1, "click", 0.0),
            (2, 40 * _min, 1, "purchase", 9.0),
            (3, 200 * _min, 1, "click", 0.0),   # after the purchase
            (4, 35 * _min, 2, "click", 0.0),    # other user
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts long, user_id long,"
            " event_type string, value double",
        )
        out = {
            r.click_id: (r.n_touches, r.credit)
            for r in multi_touch_attribution(ev, 60).collect()
        }
        assert out == {0: (2, 4.5), 1: (2, 4.5)}

    def test_lookback_window_bounds(self, spark):
        from graph500_spark.operators.asof import multi_touch_attribution

        _min = 60_000_000_000
        rows = [
            (0, 0 * _min, 1, "click", 0.0),      # 100 min before
            (1, 100 * _min, 1, "purchase", 5.0),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts long, user_id long,"
            " event_type string, value double",
        )
        assert multi_touch_attribution(ev, 60).count() == 0


class TestPackEfficiency:
    def test_fill_ratio_hand_values(self, spark):
        from graph500_spark.operators.traindata import pack_efficiency

        # single shard (n_shards=1): docs of 3 + 4 tokens, budget 4
        # → cum 7 → chunks 0..1 (2 chunks), fill = 7/8
        docs = spark.createDataFrame(
            [
                (0, "a b c", "en", "s0", 5),
                (1, "d e f g", "en", "s0", 7),
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        row = pack_efficiency(docs, budget=4, n_shards=1).collect()[0]
        assert (row.n_docs, row.total_tokens, row.n_chunks) == (2, 7, 2)
        assert row.fill_ratio == 0.875


class TestEmptyInputsContinuation:
    """Empty-input hygiene for the continuation-batch operators."""

    def _empty_docs(self, spark):
        return spark.createDataFrame(
            [],
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )

    def _empty_events(self, spark):
        return spark.createDataFrame(
            [],
            "event_id long, ts long, user_id long, event_type string,"
            " value double",
        )

    def _empty_edges(self, spark):
        return spark.createDataFrame([], "src: long, dst: long")

    def _empty_embs(self, spark):
        return spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )

    def test_text_continuation_on_empty(self, spark):
        from graph500_spark.operators.corpus import source_overlap_matrix
        from graph500_spark.operators.dedup import (
            levenshtein_near_duplicates,
            normalized_duplicates,
        )
        from graph500_spark.operators.text import (
            bigram_logppl,
            char_entropy,
            heavy_hitter_tokens,
            lang_confusion,
            pmi_collocations,
        )
        from graph500_spark.operators.traindata import (
            doc_chunks,
            feature_hashing,
            pack_efficiency,
        )

        empty = self._empty_docs(spark)
        for op in (
            normalized_duplicates,
            levenshtein_near_duplicates,
            heavy_hitter_tokens,
            pmi_collocations,
            char_entropy,
            bigram_logppl,
            lang_confusion,
            source_overlap_matrix,
            feature_hashing,
            doc_chunks,
            pack_efficiency,
        ):
            assert op(empty).count() == 0, op.__name__

    def test_events_continuation_on_empty(self, spark):
        from graph500_spark.operators.asof import multi_touch_attribution
        from graph500_spark.streaming.windows import (
            event_type_transitions,
            retention_cohorts,
            sliding_window_counts,
            user_rfm,
        )

        empty = self._empty_events(spark)
        for op in (
            sliding_window_counts,
            retention_cohorts,
            event_type_transitions,
            user_rfm,
            multi_touch_attribution,
        ):
            assert op(empty).count() == 0, op.__name__

    def test_graph_continuation_on_empty(self, spark):
        from graph500_spark.operators.graph_build import (
            degree_histogram_log,
            graph_summary,
        )
        from graph500_spark.operators.triangles import (
            jaccard_topk,
            k_truss,
        )

        empty = self._empty_edges(spark)
        assert jaccard_topk(empty).count() == 0
        assert k_truss(empty).count() == 0
        assert degree_histogram_log(empty).count() == 0
        assert graph_summary(empty).count() == 1  # one (all-zero/null) row

    def test_embeddings_continuation_on_empty(self, spark):
        from graph500_spark.operators.simsearch import (
            embedding_dim_stats,
            knn_predict,
            label_prototypes,
        )

        empty = self._empty_embs(spark)
        assert knn_predict(empty).count() == 0
        assert embedding_dim_stats(empty).count() == 0
        assert label_prototypes(empty).count() == 0


class TestMaximalIndependentSet:
    def _sym(self, spark, und):
        return spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )

    def test_independence_and_maximality(self, spark):
        from graph500_spark.operators.setops import (
            maximal_independent_set,
        )

        # two triangles joined by a bridge + a pendant
        und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5),
               (5, 6)]
        edges = self._sym(spark, und)
        mis = {r.vertex for r in maximal_independent_set(edges).collect()}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        # independence: no edge inside the set
        assert all(adj[v].isdisjoint(mis) for v in mis)
        # maximality: every outside vertex touches the set
        outside = set(adj) - mis
        assert all(adj[v] & mis for v in outside)

    def test_star_hub_or_leaves(self, spark):
        from graph500_spark.operators.setops import (
            maximal_independent_set,
        )

        und = [(0, i) for i in range(1, 8)]
        edges = self._sym(spark, und)
        mis = {r.vertex for r in maximal_independent_set(edges).collect()}
        # either the hub alone or every leaf — both are maximal
        assert mis == {0} or mis == set(range(1, 8))

    def test_deterministic(self, spark):
        from graph500_spark.operators.setops import (
            maximal_independent_set,
        )

        und = [(i, i + 1) for i in range(12)]
        edges = self._sym(spark, und)
        a = {r.vertex for r in maximal_independent_set(edges).collect()}
        b = {r.vertex for r in maximal_independent_set(edges).collect()}
        assert a == b and a


class TestTableStats:
    def test_profile_values(self, spark):
        from graph500_spark.operators.stats import table_stats

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None)], "id long, tag string"
        )
        out = {r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
               for r in table_stats(df).collect()}
        assert out == {"id": (3, 0, 3), "tag": (3, 1, 1)}
