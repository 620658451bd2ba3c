"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms (mapInPandas).

The decode step is STUBBED: the real image/audio libraries are not in
this container, so ``decode_image``/``decode_audio`` raise
NotImplementedError unless the optional dependency imports — but the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real, tested, and exactly what a production pipeline would
run with the stub swapped for a real decoder.

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


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: decode an image payload to HxWxC array.

    Requires pillow, which is not installed in this container; the
    call-site plumbing (extract_features) is real and tested with the
    deterministic fallback featurizer.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow (not available in this "
            "container); swap in a real decoder at deployment"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: decode audio to a waveform array (requires soundfile)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile (not available in this "
            "container); swap in a real decoder at deployment"
        ) from exc


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
