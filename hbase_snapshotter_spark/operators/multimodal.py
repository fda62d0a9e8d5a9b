"""Multimodal column handling (SURVEY §2.3 N16) — opaque binary payloads
with typed metadata, decoded via Arrow-batched Pandas UDFs.

Model: a modality column is ``binary`` plus a struct of metadata
(``modality``, ``media_type``, byte length, content hash).  Heavy decode
(image resize, audio resample, video frame-sample) runs in
``mapInPandas`` — one Python worker per partition, Arrow-batched, never
row-at-a-time.  The actual codecs (PIL/ffmpeg/…) are NOT in this
container, so ``decode_payload`` is a clearly-marked deterministic stub;
the Spark-side plumbing — schema, batch iteration, partitioning — is
real and tested, and swapping the stub for a real codec changes no plan.

Scale notes: binary payloads inflate row size; keep them out of shuffles
(derive features first, drop the payload before any wide op) and size
``spark.sql.files.maxPartitionBytes`` down when payloads are megabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Set True only in environments with real codec libraries installed.
REAL_CODECS_AVAILABLE = False


def attach_payload(df: DataFrame, source_col: str, *, modality: str = "image",
                   media_type: str = "image/png") -> DataFrame:
    """Wrap a column's bytes as a modality payload with typed metadata —
    the ingestion shape for multimodal tables."""
    payload = F.col(source_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(media_type).alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ),
    )


DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("feature_hash", StringType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a codec: derives fake dimensions and a
    feature hash from the payload bytes.  Replace with PIL/ffmpeg when
    REAL_CODECS_AVAILABLE."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire the real codec here")
    h = hashlib.md5(payload or b"").hexdigest()
    width = 16 + int(h[:4], 16) % 2048
    height = 16 + int(h[4:8], 16) % 2048
    n_frames = 1 + int(h[8:10], 16) % 32
    return width, height, n_frames, h


def decode_payload(df: DataFrame, *, id_col: str = "doc_id",
                   payload_col: str = "payload", batch_hint: int = 1024) -> DataFrame:
    """Decode payloads to per-item features via ``mapInPandas`` — the
    Arrow-batched lane for Python-only work.  Input needs ``id_col`` and
    ``payload_col``; output follows :data:`DECODED_SCHEMA`."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p) if p is not None else b"")
                       for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_frames": [d[2] for d in decoded],
                "feature_hash": [d[3] for d in decoded],
            })

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("content_md5", StringType()),
])


def resize_payload(df: DataFrame, *, width: int, height: int,
                   id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """Resize image payloads to ``width`` × ``height`` via
    ``mapInPandas`` — binary in, binary out, one Arrow batch per
    partition chunk, metadata recomputed from the NEW bytes.  The codec
    is the deterministic stub (output bytes = md5(payload) || 'WxH',
    repeated to a plausible thumbnail size); swapping in PIL changes
    only ``_fake_resize``, no plan.

    Scale: 1 row in → 1 row out, payload never enters a shuffle here —
    callers derive features from the resized output before any wide op.
    """

    def _fake_resize(payload: bytes) -> bytes:
        if REAL_CODECS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire the real codec here")
        seed = hashlib.md5(payload or b"").hexdigest().encode()
        tag = f"|{width}x{height}".encode()
        # a "thumbnail" scales with the requested dims, not the input
        target_len = max(16, (width * height) // 64)
        body = (seed * (target_len // len(seed) + 1))[:target_len]
        return body + tag

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_fake_resize(bytes(p) if p is not None else b"")
                   for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "payload": out,
                "width": width,
                "height": height,
                "content_md5": [hashlib.md5(b).hexdigest() for b in out],
            })

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_payload", BinaryType()),
])

#: Default cap for evenly-spaced frame sampling.
FRAME_SAMPLE_CAP = 8


def sample_frames(df: DataFrame, *, max_frames: int = FRAME_SAMPLE_CAP,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Sample ≤ ``max_frames`` evenly-spaced frames per video payload —
    the 1→N ``mapInPandas`` shape (a batch yields MORE rows than it
    received).  Frame count comes from the decode stub's ``n_frames``;
    sampled indices are ``floor(j · n_frames / k)`` for j < k =
    min(max_frames, n_frames) — deterministic, first frame always
    included.  Frame bytes are the stub (md5(payload || idx)); a real
    ffmpeg seek-and-decode drops in per frame without changing the
    plan.

    Scale: the fan-out is bounded by ``max_frames``; frames inherit the
    input partitioning (no shuffle), so downstream per-frame feature
    extraction stays embarrassingly parallel."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                n_frames = _fake_decode(raw)[2]
                k = min(max_frames, n_frames)
                for j in range(k):
                    idx = (j * n_frames) // k
                    ids.append(i)
                    idxs.append(idx)
                    payloads.append(hashlib.md5(
                        raw + str(idx).encode()).digest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_payload": payloads,
            })

    return df.select(id_col, payload_col).mapInPandas(
        frame_batches, FRAME_SCHEMA)
