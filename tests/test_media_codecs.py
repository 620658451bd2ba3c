"""Real media codec tests: the stdlib PNG encoder/decoder must
round-trip exactly (including reconstruction of all 5 scanline filter
types a foreign encoder may emit), the PCM16 WAV path must round-trip,
and the media_decode_stats operator must recover the oracle-predicted
shapes and content sums through actual encoded bytes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def _rt_image(arr):
    from graph500_spark.operators.multimodal import decode_png, encode_png

    return decode_png(encode_png(arr))


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert (_rt_image(img) == img).all()


def test_png_roundtrip_gray_and_rgba():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, (5, 17), dtype=np.uint8)
    assert (_rt_image(gray) == gray[:, :, None]).all()
    rgba = rng.integers(0, 256, (6, 4, 4), dtype=np.uint8)
    assert (_rt_image(rgba) == rgba).all()


def _encode_with_filters(img, filters):
    """Reference-filter a raw image per the PNG spec (the encodings a
    foreign encoder may choose) so the decoder's reconstruction of
    Sub/Up/Average/Paeth is exercised, not just filter 0."""
    from graph500_spark.operators.multimodal import _PNG_SIG, _png_chunk

    h, w, c = img.shape
    prev = np.zeros(w * c, np.int32)
    raws = []
    for y, f in zip(range(h), filters):
        line = img[y].reshape(-1).astype(np.int32)
        enc = line.copy()
        if f == 1:
            enc[c:] = (line[c:] - line[:-c]) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            for i in range(w * c):
                a = line[i - c] if i >= c else 0
                enc[i] = (line[i] - ((int(a) + int(prev[i])) >> 1)) % 256
        elif f == 4:
            for i in range(w * c):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                )
                enc[i] = (line[i] - pred) % 256
        raws.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decoder_reconstructs_all_filters():
    from graph500_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    png = _encode_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert (decode_png(png) == img).all()


def test_png_rejects_non_png():
    from graph500_spark.operators.multimodal import decode_image

    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\xff\xd8\xff\xe0 not a png")


def test_wav_roundtrip():
    from graph500_spark.operators.multimodal import decode_wav, encode_wav

    samples = (np.arange(500, dtype=np.int64) * 997 % 65536 - 32768).astype(
        np.int16
    )
    rate, out = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000
    assert out.shape == (500, 1)
    assert (out[:, 0] == samples).all()


def test_media_decode_stats_matches_generator(spark):
    """End-to-end through Spark: encoded PNG/WAV payloads decoded in
    the Arrow kernel recover the generator's shapes and sums."""
    from graph500_spark.operators.multimodal import (
        _fixture_audio,
        _fixture_image,
        media_decode_stats,
    )
    from graph500_spark.sources import testdata as td

    rows = {
        r["doc_id"]: r
        for r in media_decode_stats(
            td.load_table(spark, SF_SMALL, "documents")
        ).collect()
    }
    img_ids = [d for d in rows if d % 3 == 0][:5]
    for d in img_ids:
        img = _fixture_image(d)
        r = rows[d]
        assert (r["height"], r["width"], r["channels"]) == (
            img.shape[0],
            img.shape[1],
            3,
        )
        assert r["value_sum"] == int(img.astype("int64").sum())
        assert r["n_samples"] is None
    aud_ids = [d for d in rows if d % 3 == 1][:5]
    for d in aud_ids:
        aud = _fixture_audio(d)
        r = rows[d]
        assert r["n_samples"] == len(aud)
        assert r["value_sum"] == int(aud.astype("int64").sum())
        assert r["height"] is None
    assert all(d % 3 != 2 for d in rows)
