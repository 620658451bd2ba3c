"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms (mapInPandas).

Decode is REAL for PNG and PCM-WAV payloads: ``decode_image`` prefers
pillow when installed but falls back to a self-contained stdlib PNG
decoder (zlib inflate + full filter reconstruction, 8-bit
gray/RGB/RGBA non-interlaced — the format this pipeline's fixtures
and most training corpora use); ``decode_audio`` prefers soundfile
and falls back to the stdlib ``wave`` reader for PCM16. Other codecs
(JPEG, MP3, video containers) still require the optional production
libraries and raise NotImplementedError without them — but the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is identical either way, and the round-trip is value-checked
end-to-end by the ``media_decode_stats`` registry entry (deterministic
generated PNG/WAV payloads decoded back to oracle-predicted sums).

Feature extraction uses a deterministic byte-arithmetic "featurizer"
(length, byte-sum hash, head hash) so the whole path — binary column →
mapInPandas → typed features — is oracle-checkable: the same numbers
are reproducible from the text the payload encodes.

Scale notes: mapInPandas streams Arrow record batches — constant
memory per task regardless of table size; binary payloads never
round-trip through Python row objects. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2147483647
HASH_BASE = 131

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, byte_sum long, head_hash long"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """[doc_id, media_type, payload: binary, n_bytes] — deterministic
    fake media derived from the text column (payload = UTF-8 bytes).
    Stands in for a real (path, bytes) ingest; the schema is the
    production one."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr) -> bytes:
    """Minimal standards-conforming PNG writer: 8-bit gray/RGB/RGBA,
    non-interlaced, filter 0 per scanline. Input: uint8 array (H, W)
    or (H, W, C)."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Self-contained PNG decoder (stdlib zlib + struct): 8-bit
    grayscale / RGB / RGBA, non-interlaced, all 5 scanline filters
    reconstructed per the spec. Returns uint8 array (H, W, C)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise NotImplementedError(
            "stdlib PNG decoder handles 8-bit gray/RGB/RGBA"
            " non-interlaced; install pillow for other formats"
        )
    c = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    # Filter reconstruction, byte-identical to the spec recurrences but
    # not per-pixel numpy indexing (which is ~100x scalar-op cost):
    # None/Up are whole-line uint8 vector ops (unsigned add wraps mod
    # 256), Sub is a per-channel prefix sum (cumsum), and the two
    # inherently serial recurrences (Average, Paeth) run over
    # bytearray/bytes scalars — C-speed indexing, no numpy boxing.
    for y in range(h):
        f = raw[p]
        seg = raw[p + 1 : p + 1 + stride]
        p += stride + 1
        if f == 0:  # None
            line = np.frombuffer(seg, np.uint8).copy()
        elif f == 1:  # Sub: x[i] = raw[i] + x[i-c] — prefix sum mod 256
            px = np.frombuffer(seg, np.uint8).reshape(w, c)
            line = (
                (px.cumsum(axis=0, dtype=np.int64) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up: uint8 add wraps mod 256
            line = np.frombuffer(seg, np.uint8) + prev
        elif f == 3:  # Average (serial in x[i-c])
            la = bytearray(seg)
            pb = prev.tobytes()
            for i in range(c):
                la[i] = (la[i] + (pb[i] >> 1)) & 0xFF
            for i in range(c, stride):
                la[i] = (la[i] + ((la[i - c] + pb[i]) >> 1)) & 0xFF
            line = np.frombuffer(bytes(la), np.uint8)
        elif f == 4:  # Paeth (serial in x[i-c])
            la = bytearray(seg)
            pb = prev.tobytes()
            for i in range(c):
                la[i] = (la[i] + pb[i]) & 0xFF  # a = cc = 0 -> pred = b
            for i in range(c, stride):
                a = la[i - c]
                b = pb[i]
                cc = pb[i - c]
                pa = abs(b - cc)
                pbd = abs(a - cc)
                pc = abs(a + b - cc - cc)
                pred = a if (pa <= pbd and pa <= pc) else (b if pbd <= pc else cc)
                la[i] = (la[i] + pred) & 0xFF
            line = np.frombuffer(bytes(la), np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, c)


def encode_wav(samples, rate: int = 8000) -> bytes:
    """PCM16 mono WAV writer (stdlib ``wave``)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(
            np.asarray(samples).astype("<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(payload: bytes):
    """PCM16 WAV reader (stdlib ``wave``). Returns (rate,
    int16 array (n_frames, n_channels))."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise NotImplementedError(
                "stdlib WAV decoder handles PCM16; install soundfile"
                " for other sample widths"
            )
        data = np.frombuffer(
            wv.readframes(wv.getnframes()), "<i2"
        ).reshape(-1, wv.getnchannels())
        return wv.getframerate(), data


def decode_image(payload: bytes):
    """Decode an image payload to an HxWxC uint8 array.

    Prefers pillow (any format) when installed; falls back to the
    self-contained stdlib PNG decoder above. Non-PNG payloads without
    pillow raise NotImplementedError."""
    try:
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires pillow (not available in this"
        " container); the stdlib path decodes PNG"
    )


def decode_audio(payload: bytes):
    """Decode audio to (rate, waveform array).

    Prefers soundfile (any format) when installed; falls back to the
    stdlib PCM16 WAV reader. Non-WAV payloads without soundfile raise
    NotImplementedError."""
    try:
        import io

        import soundfile

        data, rate = soundfile.read(io.BytesIO(payload))
        return rate, data
    except ImportError:
        pass
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "non-WAV audio decode requires soundfile (not available in"
        " this container); the stdlib path decodes PCM16 WAV"
    )


def _featurize_bytes(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fallback featurizer: (n_bytes, byte_sum mod p,
    rolling hash of the first 64 bytes)."""
    n = len(payload)
    byte_sum = sum(payload) % HASH_MOD
    h = 0
    for b in payload[:64]:
        h = (h * HASH_BASE + b) % HASH_MOD
    return n, byte_sum, h


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Output: [doc_id, media_type, n_bytes, byte_sum, head_hash].
    In production the body of ``featurize`` calls the real decoder +
    model; the batch shape, schema, and partitioning stay identical.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_featurize_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_sum": [f[1] for f in feats],
                    "head_hash": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling for video payloads: n equally
    spaced byte-slices standing in for decoded frames.

    Output: [doc_id, frame_idx, frame: binary] — one row per frame
    (the production shape for a frame-level feature pipeline).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "video" or len(payload) == 0:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    lo = min(i * step, len(payload))
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(payload[lo : lo + step]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return media.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame binary"
    )


def resize_media(media: DataFrame, target_bytes: int = 32) -> DataFrame:
    """Deterministic media "resize": stride-subsample the payload down
    to ~target_bytes (the byte-level stand-in for pixel resampling —
    a real deployment decodes, resizes, re-encodes inside the same
    mapInPandas body).

    Output: [doc_id, media_type, payload: binary, n_bytes] — the SAME
    schema as the input media table, so resize composes with
    extract_features / frame_sample exactly like a production
    image-resize stage."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if len(payload) <= target_bytes:
                    out.append(bytes(payload))
                else:
                    stride = len(payload) // target_bytes
                    out.append(bytes(payload[::stride][:target_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return media.mapInPandas(
        resize,
        schema="doc_id long, media_type string, payload binary, n_bytes long",
    )


def multimodal_features(docs: DataFrame) -> DataFrame:
    """End-to-end: docs → fake media → Arrow-batched featurizer."""
    return extract_features(attach_fake_media(docs))


# ---------------------------------------------------------------------------
# Real-codec round-trip: generated PNG / WAV payloads, decoded back
# ---------------------------------------------------------------------------

def _fixture_image(doc_id: int):
    """Deterministic RGB image for doc_id: shape (8 + id%7, 8 + id%5,
    3), pixel value at linear index i = (doc_id + i) mod 256."""
    import numpy as np

    h, w = 8 + doc_id % 7, 8 + doc_id % 5
    return (
        (doc_id + np.arange(h * w * 3, dtype=np.int64)) % 256
    ).astype(np.uint8).reshape(h, w, 3)


def _fixture_audio(doc_id: int):
    """Deterministic int16 waveform: n = 256 + id%64 samples,
    sample[i] = ((doc_id*31 + i*17) mod 65536) - 32768."""
    import numpy as np

    n = 256 + doc_id % 64
    return (
        (doc_id * 31 + np.arange(n, dtype=np.int64) * 17) % 65536 - 32768
    ).astype(np.int16)


def attach_real_media(docs: DataFrame) -> DataFrame:
    """[doc_id, media_type, payload: binary] — REAL encoded media:
    image rows carry an actual PNG (zlib-deflated, CRC-chunked), audio
    rows an actual PCM16 WAV, deterministic per doc_id so the decoded
    content is oracle-predictable. Video rows are omitted (no stdlib
    container codec). Same media_type mapping as attach_fake_media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_type, out_payload = [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                m = doc_id % 3
                if m == 0:
                    out_payload.append(encode_png(_fixture_image(doc_id)))
                    out_type.append("image")
                elif m == 1:
                    out_payload.append(encode_wav(_fixture_audio(doc_id)))
                    out_type.append("audio")
                else:
                    continue
                out_doc.append(doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "media_type": pd.Series(out_type, dtype="object"),
                    "payload": pd.Series(out_payload, dtype="object"),
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, media_type string, payload binary"
    )


MEDIA_DECODE_SCHEMA = (
    "doc_id long, media_type string, height long, width long,"
    " channels long, n_samples long, value_sum long"
)


def media_decode_stats(docs: DataFrame) -> DataFrame:
    """Round-trip value check for the REAL decoders: encode
    deterministic media per doc (actual PNG / WAV bytes), decode with
    decode_image / decode_audio, and report decoded shape + content
    sums. Image rows: (height, width, channels, value_sum=Σ pixels);
    audio rows: (n_samples, value_sum=Σ samples). The DuckDB oracle
    re-derives the same sums from the generator arithmetic — a decoder
    bug (filter reconstruction, stride, sign) breaks the hash."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype == "image":
                    arr = decode_image(bytes(payload))
                    rows.append(
                        (
                            doc_id,
                            mtype,
                            arr.shape[0],
                            arr.shape[1],
                            arr.shape[2],
                            None,
                            int(arr.astype("int64").sum()),
                        )
                    )
                else:
                    _rate, wave_arr = decode_audio(bytes(payload))
                    rows.append(
                        (
                            doc_id,
                            mtype,
                            None,
                            None,
                            None,
                            wave_arr.shape[0],
                            int(wave_arr.astype("int64").sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "height",
                    "width",
                    "channels",
                    "n_samples",
                    "value_sum",
                ],
            )

    return attach_real_media(docs).mapInPandas(
        stats, schema=MEDIA_DECODE_SCHEMA
    )


# Oracle: decoded shapes and content sums re-derived from the fixture
# generator arithmetic (no codec involved — the oracle predicts what a
# CORRECT decoder must recover from the encoded bytes).
MEDIA_DECODE_STATS_SQL = (
    "SELECT doc_id, 'image' AS media_type,"
    " CAST(8 + doc_id % 7 AS BIGINT) AS height,"
    " CAST(8 + doc_id % 5 AS BIGINT) AS width,"
    " CAST(3 AS BIGINT) AS channels,"
    " CAST(NULL AS BIGINT) AS n_samples,"
    " CAST(list_reduce(list_transform("
    "   generate_series(0, (8 + doc_id % 7) * (8 + doc_id % 5) * 3 - 1),"
    "   i -> (doc_id + i) % 256), (a, b) -> a + b) AS BIGINT) AS value_sum"
    " FROM documents WHERE doc_id % 3 = 0"
    " UNION ALL"
    " SELECT doc_id, 'audio', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),"
    " CAST(NULL AS BIGINT), CAST(256 + doc_id % 64 AS BIGINT),"
    " CAST(list_reduce(list_transform("
    "   generate_series(0, 256 + doc_id % 64 - 1),"
    "   i -> (doc_id * 31 + i * 17) % 65536 - 32768),"
    "   (a, b) -> a + b) AS BIGINT) AS value_sum"
    " FROM documents WHERE doc_id % 3 = 1"
)


# Oracle: the featurizer's arithmetic re-derived from the text column
# (payload is the UTF-8 encoding of text; documents are ASCII so
# byte == ascii(char)).
MULTIMODAL_FEATURES_SQL = (
    "SELECT doc_id,"
    " ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,"
    " CAST(length(text) AS BIGINT) AS n_bytes,"
    " CAST(list_reduce([CAST(0 AS BIGINT)] ||"
    "  list_transform(generate_series(1, length(text)),"
    "   i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),"
    "  (acc, x) -> acc + x) % 2147483647 AS BIGINT) AS byte_sum,"
    " CAST(list_reduce([CAST(0 AS BIGINT)] ||"
    "  list_transform(generate_series(1, least(length(text), 64)),"
    "   i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),"
    "  (acc, x) -> (acc * 131 + x) % 2147483647) AS BIGINT) AS head_hash"
    " FROM documents"
)
