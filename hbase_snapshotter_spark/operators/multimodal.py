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
