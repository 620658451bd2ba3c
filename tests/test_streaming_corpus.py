"""Streaming corpus ingest must converge to the batch pipeline's
exact-dedup + gating stages: same accepted doc set whether documents
arrive in one batch or across several (including cross-batch exact
duplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph500_spark.operators import dedup as dd
from graph500_spark.operators import text as tx
from graph500_spark.streaming.corpus_ingest import (
    read_corpus,
    start_corpus_ingest,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

BATCH1 = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
    (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
    (2, "der hund und die katze und der vogel sind da", "de", "s0", 44),
    (3, "xyzzy qwerty asdf", "und", "s0", 17),  # no markers → dropped
]
BATCH2 = [
    (4, "the quick brown fox jumps over the lazy dog", "en", "s1", 43),  # cross-batch dup of 0
    (5, "el gato y el perro en la casa que es grande", "es", "s1", 43),
]


def _batch_expected(spark, rows, min_quality):
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    surv = dd.exact_duplicates(docs).select(
        F.col("rep_doc_id").alias("doc_id")
    )
    lang = tx.language_id(docs).select("doc_id", "lang_pred")
    qual = tx.text_quality(docs).select("doc_id", "quality_score")
    return {
        r["doc_id"]
        for r in surv.join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != "und")
        )
        .collect()
    }


def test_corpus_ingest_converges_to_batch(spark, tmp_path):
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    accepted_out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")

    for i, rows in enumerate((BATCH1, BATCH2)):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / f"b{i}"))
        q = start_corpus_ingest(
            spark, str(src_dir) + "/*", accepted_out, ckpt, min_quality=0.0
        )
        q.awaitTermination(120)

    got = {r["doc_id"] for r in read_corpus(spark, accepted_out).collect()}
    expect = _batch_expected(spark, BATCH1 + BATCH2, 0.0)
    assert got == expect
    assert 0 in got and 1 not in got  # within-batch exact dup dropped
    assert 4 not in got               # cross-batch exact dup dropped
    assert 3 not in got               # language gate
    assert {2, 5} <= got

    # annotations ride along
    rows = {r["doc_id"]: r for r in read_corpus(spark, accepted_out).collect()}
    assert rows[2]["lang_pred"] == "de"
    assert rows[5]["lang_pred"] == "es"
    assert 0.0 <= rows[2]["quality_score"] <= 1.0


def test_event_rollup_grains_consistent(spark):
    """Rollup invariants: each grain's totals equal the raw count, and
    coarser grains have fewer-or-equal windows."""
    from graph500_spark.sources import testdata as td
    from graph500_spark.streaming.windows import event_rollup

    events = td.load_table(spark, "/root/testdata/sf0.001", "events")
    out = event_rollup(spark, events).collect()
    n = events.count()
    by_grain = {}
    for r in out:
        g = by_grain.setdefault(r["granularity"], {"n": 0, "wins": set()})
        g["n"] += r["n_events"]
        g["wins"].add(r["window_start_us"])
    assert set(by_grain) == {"minute", "hour", "day"}
    for g in by_grain.values():
        assert g["n"] == n  # every grain partitions all events
    assert (len(by_grain["day"]["wins"])
            <= len(by_grain["hour"]["wins"])
            <= len(by_grain["minute"]["wins"]))


def test_event_gapfill_locf(spark):
    """Holes materialize with n_events=0 and carry the last sum forward."""
    from graph500_spark.streaming.windows import event_gapfill

    h_ns = 3_600_000_000_000  # one hour in nanos (bigint-nanos fixture path)
    rows = [
        # type 'a': events in hours 0 and 3 — hours 1, 2 are holes
        (1, 0 * h_ns, 1, "a", 10.0, "{}"),
        (2, 3 * h_ns + 5, 1, "a", 7.0, "{}"),
        # type 'b': single event
        (3, 1 * h_ns, 2, "b", 1.5, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r["event_type"], r["bucket_start_us"]): (r["n_events"], r["filled_sum"])
        for r in event_gapfill(events, minutes=60).collect()
    }
    h_us = 3_600_000_000
    assert out[("a", 0)] == (1, 10.0)
    assert out[("a", 1 * h_us)] == (0, 10.0)  # hole, carried forward
    assert out[("a", 2 * h_us)] == (0, 10.0)
    assert out[("a", 3 * h_us)] == (1, 7.0)
    assert out[("b", 1 * h_us)] == (1, 1.5)
    assert ("b", 0) not in out  # axis spans each key's own range only


def test_sessionize_native_boundary_alignment(spark):
    """An event at EXACTLY the gap stays in-session in both
    formulations (the session_window gap+1 alignment)."""
    from graph500_spark.streaming.sessions import (
        SESSION_GAP_US,
        sessionize,
        sessionize_native,
    )

    g_ns = SESSION_GAP_US * 1000
    rows = [
        (1, 0, 7, "click", 0.0, "{}"),
        (2, g_ns, 7, "click", 0.0, "{}"),          # exactly gap later: SAME
        (3, 2 * g_ns + 1000, 7, "click", 0.0, "{}"),  # gap+1us later: NEW
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    lag = sorted(
        (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in sessionize(events).collect()
    )
    native = sorted(
        (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in sessionize_native(events).collect()
    )
    assert lag == native == [(0, SESSION_GAP_US, 2), (2 * SESSION_GAP_US + 1, 2 * SESSION_GAP_US + 1, 1)]


def test_compaction_removes_near_dups_like_batch(spark, tmp_path):
    """Ingest (exact dedup + gates) then compact (near-dup pass) must
    land exactly where the equivalent batch composition lands:
    exact-dedup survivors, gated, then MinHash near-dup removal among
    them."""
    from graph500_spark.streaming.corpus_ingest import compact_near_dups

    # two near-duplicate German docs (share most 3-gram shingles) + a
    # distinct one; ids chosen so canonical choices are unambiguous
    base = "der hund und die katze laufen durch das haus und der garten"
    rows = [
        (10, base, "de", "s", 1),
        (20, base + " heute", "de", "s", 1),   # near-dup of 10
        (30, "el gato y el perro en la casa que es grande y bonita",
         "es", "s", 1),
    ]
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    accepted_out = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    docs.coalesce(1).write.parquet(str(src_dir / "b0"))
    q = start_corpus_ingest(
        spark, str(src_dir) + "/*", accepted_out, ckpt, min_quality=0.0
    )
    q.awaitTermination(120)

    before = {r.doc_id for r in read_corpus(spark, accepted_out).collect()}
    assert before == {10, 20, 30}  # exact dedup + gates keep all three

    n = compact_near_dups(spark, accepted_out, docs, jaccard_threshold=0.5)
    after = {r.doc_id for r in read_corpus(spark, accepted_out).collect()}
    assert n == len(after)
    # batch expectation: near-dup pass among accepted survivors
    expect_dropped = {
        r.doc_b
        for r in dd.minhash_near_duplicates(
            docs.filter(F.col("doc_id").isin(list(before))), 0.5
        ).collect()
    }
    assert after == before - expect_dropped
    assert after == {10, 30}  # 20 is the non-canonical near-dup

    # idempotent: a second compaction changes nothing
    n2 = compact_near_dups(spark, accepted_out, docs, jaccard_threshold=0.5)
    assert n2 == n
