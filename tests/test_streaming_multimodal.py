"""Streaming + multimodal plumbing tests: the streaming window agg must
equal the batch formulation on bounded input; the stateful sessionizer
and the Arrow-batched featurizer must produce the declared schemas and
deterministic values."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_stream_window_equals_batch(spark):
    from graph500_spark.sources import testdata as td
    from graph500_spark.streaming.windows import (
        event_window_counts,
        run_stream_to_memory,
    )

    batch = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in event_window_counts(
            td.load_table(spark, SF_SMALL, "events")
        ).collect()
    }
    stream = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_stream_to_memory(
            spark, SF_SMALL, table="win_counts_test"
        ).collect()
    }
    assert batch == stream


def test_sessionize_stream_smoke(spark):
    """applyInPandasWithState plumbing: runs, right schema, and closed
    sessions are a subset of the batch sessionization."""
    from graph500_spark.streaming.sessions import sessionize, sessionize_stream
    from graph500_spark.streaming.windows import stream_events
    from graph500_spark.sources import testdata as td

    out = (
        sessionize_stream(stream_events(spark, SF_SMALL))
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    # With a GroupStateTimeout armed, AvailableNow never
    # self-terminates (it keeps firing empty batches to service
    # pending timeouts) — stop explicitly so the query doesn't leak
    # into the shared suite session (see streaming/monitor.py).
    out.stop()
    got = spark.table("sessions_test")
    assert got.columns == [
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
    ]
    batch = sessionize(td.load_table(spark, SF_SMALL, "events"))
    batch_sessions = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in batch.collect()
    }
    # closed streaming sessions must exist in the batch result
    for r in got.collect():
        key = (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
        )
        assert key in batch_sessions


@pytest.fixture()
def media(spark):
    from graph500_spark.operators.multimodal import attach_fake_media

    docs = spark.createDataFrame(
        [
            (0, "hello world", "en", "s0", 11),
            (1, "abc", "en", "s0", 3),
            (2, "video payload bytes here", "en", "s1", 24),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return attach_fake_media(docs)


def test_attach_and_featurize(spark, media):
    from graph500_spark.operators.multimodal import extract_features

    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"
    assert rows[1]["n_bytes"] == 3
    assert rows[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
    # rolling hash of 'abc' (matches the engine-wide strhash)
    h = 0
    for ch in b"abc":
        h = (h * 131 + ch) % 2147483647
    assert rows[1]["head_hash"] == h


def test_frame_sample(spark, media):
    from graph500_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, n_frames=4).collect()
    assert all(r["doc_id"] == 2 for r in frames)  # only the video doc
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3]
    joined = b"".join(bytes(r["frame"]) for r in sorted(frames, key=lambda x: x["frame_idx"]))
    assert joined.startswith(b"video payload bytes "[: len(joined)])


def test_decode_stub_raises(spark):
    from graph500_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"not a real image")


def test_resize_media(spark, media):
    from graph500_spark.operators.multimodal import resize_media

    out = {r["doc_id"]: r for r in resize_media(media, target_bytes=4).collect()}
    # short payloads pass through untouched
    assert bytes(out[1]["payload"]) == b"abc"
    # long payloads stride-subsample down to exactly target_bytes
    long_doc = max(out, key=lambda d: out[d]["n_bytes"])
    assert out[long_doc]["n_bytes"] <= 4
    # schema matches the input media table → composes with featurizer
    from graph500_spark.operators.multimodal import extract_features

    feats = extract_features(resize_media(media, target_bytes=4)).collect()
    assert {r["doc_id"] for r in feats} == set(out)


def test_sliding_stream_equals_batch(spark):
    """Hopping-window streaming form == batch sliding_window_counts
    on bounded input (same columns, same values)."""
    from graph500_spark.sources import testdata as td
    from graph500_spark.streaming.windows import (
        run_sliding_stream_to_memory,
        sliding_window_counts,
    )

    batch = {
        (r["window_start_us"], r["event_type"]): (
            r["n_events"], r["sum_value"],
        )
        for r in sliding_window_counts(
            td.load_table(spark, SF_SMALL, "events"), 10, 5
        ).collect()
    }
    stream = {
        (r["window_start_us"], r["event_type"]): (
            r["n_events"], r["sum_value"],
        )
        for r in run_sliding_stream_to_memory(
            spark, SF_SMALL, 10, 5, table="sliding_counts_test"
        ).collect()
    }
    assert batch == stream
