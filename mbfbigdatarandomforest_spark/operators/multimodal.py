"""Multimodal column handling (north-star extension, BASELINE.json).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (format, width/height or sample rate,
...). All heavy per-item work (decode, resize, feature extraction,
frame sampling) runs as Arrow-batched ``mapInPandas`` — the one place
Python in the hot path is justified, because the work is per-blob CPU,
not relational.

The decode kernels themselves are STUBS in this environment (no
PIL/ffmpeg in the container): ``decode=None`` uses a deterministic fake
that hashes the payload into the output feature space, so the Spark-side
plumbing — schema evolution, batch shapes, partition sizing — is real
and testable; swap ``decode`` for a real kernel in production.

Scale notes: blobs make partitions heavy; ``target_partition_mb``
repartitions by byte size, not row count, before the UDF so a 100 TB
media table doesn't produce 2 GB Arrow batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StructType,
)

MEDIA_META_FIELDS = "format string, width int, height int, n_frames int, sample_rate int"


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", meta_col: str = "media_meta"
) -> DataFrame:
    """Attach a typed metadata struct for an opaque binary column.
    Real pipelines parse container headers; the stub derives plausible
    deterministic values from the payload hash (format tag + sizes)."""
    h = F.crc32(F.col(payload_col))
    return df.withColumn(
        meta_col,
        F.struct(
            F.element_at(
                F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav"), F.lit("mp4")),
                (h % 4 + 1).cast("int"),
            ).alias("format"),
            (h % 1920 + 1).cast("int").alias("width"),
            (h % 1080 + 1).cast("int").alias("height"),
            (h % 300 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ),
    )


def _fake_embed(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: seed a PRNG from the
    payload digest. Stable across runs/machines."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.normal(size=dim).astype(np.float32)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    dim: int = 64,
    decode: Callable[[bytes], list[float]] | None = None,
    target_partition_mb: int = 64,
    avg_blob_kb: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``decode`` is the per-blob kernel (bytes -> list[float]); the default
    is the deterministic fake (see module docstring). Raises cleanly on
    real-media expectations: pass your own kernel in production.
    """
    kernel = decode or (lambda b: _fake_embed(b, dim))
    rows_per_partition = max(1, target_partition_mb * 1024 // avg_blob_kb)
    n_rows = df.count()
    n_parts = max(1, n_rows // rows_per_partition)

    out_schema = StructType(df.schema.fields.copy()).add(
        out_col, ArrayType(FloatType())
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [kernel(b) for b in pdf[payload_col]]
            yield pdf

    return df.repartition(n_parts).mapInPandas(run, schema=out_schema)


def decode_image_stub(payload: bytes) -> list[float]:  # pragma: no cover
    """Placeholder for a real image decoder (PIL/opencv not available in
    this container)."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; pass decode=<kernel> "
        "or use the deterministic fake (decode=None)"
    )


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    every_nth: int = 30,
    out_col: str = "sampled_frames",
) -> DataFrame:
    """Video frame sampling: emits the frame indices that a real decoder
    would extract (the index math is the Spark-side contract; the pixel
    work is the stubbed kernel)."""
    n = F.col(f"{meta_col}.n_frames")
    return df.withColumn(
        out_col,
        F.sequence(F.lit(0), n - 1, F.lit(every_nth)),
    )
