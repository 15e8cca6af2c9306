"""Multimodal column handling (north-star extension, BASELINE.json).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (format, width/height or sample rate,
...). All heavy per-item work (decode, resize, feature extraction,
frame sampling) runs as Arrow-batched ``mapInPandas`` — the one place
Python in the hot path is justified, because the work is per-blob CPU,
not relational.

Decode support in this environment (no PIL/opencv/ffmpeg):

- **BMP (24-bit uncompressed)** — REAL decoder/encoder in pure numpy
  (header parse + bottom-up row-padded pixel array).
- **PNG (8-bit, non-interlaced, all five filter types, color types
  0/2/3/4/6)** — REAL decoder/encoder on stdlib ``zlib`` + numpy (r7).
- **WAV (16-bit PCM)** — REAL decoder via the stdlib ``wave`` module +
  numpy ``frombuffer``.
- jpeg/mp4 — require native codecs; ``decode_image_stub`` raises a
  clear error, and the deterministic fake embedding (hash-seeded PRNG)
  keeps the Spark-side plumbing testable for those formats.

Feature kernels built on the real decoders:
- ``image_features``: decode → fixed GRID×GRID mean-pool per channel +
  global mean/std (deterministic, resolution-independent).
- ``audio_features``: decode → RMS, zero-crossing rate, and FFT octave
  band energies.

Scale notes: blobs make partitions heavy; ``target_partition_mb``
repartitions by byte size, not row count, before the UDF so a 100 TB
media table doesn't produce 2 GB Arrow batches.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_FIELDS = "format string, width int, height int, n_frames int, sample_rate int"


# --------------------------------------------------------------------------
# Real codecs — formats decodable with stdlib + numpy only.
# --------------------------------------------------------------------------
def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP → (height, width, 3) uint8 RGB.

    Pure numpy: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B),
    bottom-up rows padded to 4-byte boundaries, BGR channel order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    flipped = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)
    bgr = raw[:, : width * 3].reshape(height, width, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flipped else rgb


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB → 24-bit BMP bytes (round-trips with
    ``decode_bmp``; also used to build test fixtures)."""
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    pixel_bytes = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + pixel_bytes


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit depth): gray, RGB, palette,
#: gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → (height, width, 3) uint8 RGB.

    Stdlib ``zlib`` + numpy only (r7 — retires the png half of the
    compressed-image stub; jpeg stays honestly env-gated on a real
    codec library). Full filter support: None/Sub/Up/Average/Paeth
    (spec §9), color types 0/2/3/4/6; alpha is dropped, gray broadcast
    to RGB, palette indices resolved through PLTE. Filters None/Up
    reconstruct vectorized; Sub/Average/Paeth carry an intra-row
    sequential dependency, so those rows reconstruct in a per-byte
    loop — correctness-first; this kernel feeds Arrow-batched
    ``extract_features``, where per-blob Python is already the model."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, palette, ihdr = 8, b"", None, None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        # malformed inputs must surface as the codec's ValueError
        # contract, not a downstream numpy/struct/zlib error (ADVICE r7)
        if pos + 12 + ln > len(payload):
            raise ValueError(
                f"PNG chunk {typ!r} length {ln} overruns payload "
                f"({len(payload)} bytes)"
            )
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError(f"PNG IHDR must be 13 bytes, got {ln}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if ln == 0 or ln % 3 != 0:
                raise ValueError(
                    f"PNG PLTE length {ln} not a positive multiple of 3"
                )
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"color_type={ctype}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:  # None
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) & 255
        elif f == 1:  # Sub
            rec = row.copy()
            for i in range(ch, stride):
                rec[i] = (rec[i] + rec[i - ch]) & 255
        elif f == 3:  # Average
            rec = row.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            rec = row.copy()
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 255
        else:
            raise ValueError(f"unknown PNG filter type {f} on row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, ch)
    if ctype == 2:
        return arr.copy()
    if ctype == 6:
        return arr[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(arr, 3, axis=2)
    if ctype == 4:
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = arr[:, :, 0]
    top = int(idx.max()) if idx.size else 0
    if top >= len(palette):
        raise ValueError(
            f"PNG palette index {top} out of range (PLTE has "
            f"{len(palette)} entries)"
        )
    return palette[idx]


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)


def encode_png(rgb: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """Encode (h, w, 3) uint8 RGB → PNG bytes (color type 2, 8-bit).

    ``row_filters`` (one of 0..4 per row, default all-None) applies the
    spec's forward filters — test fixtures use it to exercise every
    reconstruction path in ``decode_png`` without an external encoder."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    filters = row_filters if row_filters is not None else [0] * h
    if len(filters) != h:
        raise ValueError(f"need {h} row filters, got {len(filters)}")
    flat = rgb.reshape(h, w * 3).astype(np.int32)
    prev = np.zeros(w * 3, np.int32)
    body = bytearray()
    for y, f in enumerate(filters):
        cur = flat[y]
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        body.append(f)
        body.extend((enc & 255).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Route a binary image payload to its real decoder (BMP or PNG)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError("unsupported image container (BMP and PNG decode natively)")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode 16-bit PCM WAV → (float32 mono samples in [-1, 1],
    sample_rate). Stdlib ``wave`` + numpy; multi-channel is averaged."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = w.getframerate()
        n_ch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] → 16-bit PCM mono WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    ints = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def resize_image(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (deterministic)."""
    h, w, _ = rgb.shape
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return rgb[ri][:, ci]


# --------------------------------------------------------------------------
# Feature kernels on the real decoders.
# --------------------------------------------------------------------------
def image_features(payload: bytes, grid: int = 4) -> list[float]:
    """BMP/PNG → grid×grid mean-pooled RGB (grid²·3 dims) + global
    mean/std per channel (6 dims). Resolution-independent and
    deterministic."""
    rgb = decode_image(payload).astype(np.float64) / 255.0
    h, w, _ = rgb.shape
    pooled = np.zeros((grid, grid, 3))
    hb = np.linspace(0, h, grid + 1).astype(int)
    wb = np.linspace(0, w, grid + 1).astype(int)
    for i in range(grid):
        for j in range(grid):
            cell = rgb[hb[i] : max(hb[i + 1], hb[i] + 1),
                       wb[j] : max(wb[j + 1], wb[j] + 1)]
            pooled[i, j] = cell.reshape(-1, 3).mean(axis=0)
    stats = np.concatenate(
        [rgb.reshape(-1, 3).mean(axis=0), rgb.reshape(-1, 3).std(axis=0)]
    )
    return [float(x) for x in np.concatenate([pooled.ravel(), stats])]


def audio_features(payload: bytes, n_bands: int = 8) -> list[float]:
    """WAV → [rms, zero-crossing rate, n_bands octave FFT energies]."""
    x, _rate = decode_wav(payload)
    if len(x) == 0:
        return [0.0] * (2 + n_bands)
    rms = float(np.sqrt(np.mean(x**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x)) ** 2
    # octave-ish log-spaced band edges over the spectrum
    edges = np.unique(
        np.geomspace(1, len(spec), n_bands + 1).astype(int)
    )
    bands = [float(spec[a:b].sum()) for a, b in zip(edges[:-1], edges[1:])]
    bands += [0.0] * (n_bands - len(bands))
    total = sum(bands) or 1.0
    return [rms, zcr] + [b / total for b in bands]


# --------------------------------------------------------------------------
# Metadata: REAL header sniffing for BMP/WAV; hash-derived fake for
# formats whose codecs aren't in this environment.
# --------------------------------------------------------------------------
def sniff_media_meta(payload: bytes) -> tuple[str, int, int, int, int]:
    """(format, width, height, n_frames, sample_rate) from container
    headers. BMP, PNG and WAV are parsed for real; anything else gets a
    deterministic hash-derived placeholder tagged format='unknown'."""
    if payload[:2] == b"BM" and len(payload) >= 26:
        width, height = struct.unpack_from("<ii", payload, 18)
        return ("bmp", int(width), abs(int(height)), 1, 0)
    if payload[:8] == _PNG_SIG and len(payload) >= 24:
        # IHDR is always the first chunk: width/height at offsets 16/20
        width, height = struct.unpack_from(">II", payload, 16)
        return ("png", int(width), int(height), 1, 0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                return ("wav", 0, 0, w.getnframes(), w.getframerate())
        except wave.Error:
            pass
    if payload[:4] == b"MBFV" and len(payload) >= 12:
        n_frames, frame_len = struct.unpack_from("<II", payload, 4)
        w = h = 0
        if n_frames and payload[12:14] == b"BM" and len(payload) >= 38:
            w, h = struct.unpack_from("<ii", payload, 12 + 18)
        return ("mbfv", int(w), abs(int(h)), int(n_frames), 0)
    h = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "big")
    return ("unknown", h % 1920 + 1, h % 1080 + 1, h % 300 + 1, 16000)


_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", meta_col: str = "media_meta"
) -> DataFrame:
    """Attach a typed metadata struct for an opaque binary column by
    sniffing container headers (Arrow-batched; BMP/WAV parsed for
    real, unknown formats tagged)."""
    out_schema = StructType(df.schema.fields.copy()).add(meta_col, _META_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_media_meta(b or b"") for b in pdf[payload_col]]
            pdf[meta_col] = [
                {
                    "format": f,
                    "width": w,
                    "height": h,
                    "n_frames": n,
                    "sample_rate": r,
                }
                for f, w, h, n, r in metas
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _fake_embed(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for codecs absent in this environment:
    seed a PRNG from the payload digest. Stable across runs/machines."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.normal(size=dim).astype(np.float32)]


def _sizing_partitions(
    df: DataFrame,
    target_partition_mb: int,
    avg_blob_kb: int,
    n_rows: int | None,
) -> int:
    """Partition count for a blob table WITHOUT scanning it: from a
    caller-supplied row estimate, else from source-file byte sizes via
    filesystem metadata (one getFileStatus per file, no data read),
    else the frame's existing partitioning."""
    if n_rows is not None:
        rows_per_partition = max(1, target_partition_mb * 1024 // avg_blob_kb)
        return max(1, n_rows // rows_per_partition)
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — purely an optimization probe
        files = []
    if files:
        try:
            sc = df.sparkSession.sparkContext
            jpath = sc._jvm.org.apache.hadoop.fs.Path
            conf = sc._jsc.hadoopConfiguration()
            total = 0
            for f in files:
                p = jpath(f)
                total += p.getFileSystem(conf).getFileStatus(p).getLen()
            return max(1, int(total) // (target_partition_mb * 1024 * 1024))
        except Exception:  # noqa: BLE001
            pass
    return max(1, df.rdd.getNumPartitions())


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    dim: int = 64,
    decode: Callable[[bytes], list[float]] | None = None,
    target_partition_mb: int = 64,
    avg_blob_kb: int = 256,
    safe: bool = False,
    error_col: str = "decode_error",
    n_rows: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``decode`` is the per-blob kernel (bytes -> list[float]) — use
    ``image_features`` for BMP or ``audio_features`` for WAV; the
    default remains the deterministic fake for codec-less formats.

    ``safe=True`` is the production posture for web-scale media: a
    blob the kernel cannot decode yields NULL features plus the error
    message in ``error_col`` instead of killing the task (and with it
    the stage's other ten thousand blobs). Filter
    ``error_col IS NOT NULL`` downstream for the quarantine table.

    Partition sizing never scans the data: ``n_rows`` (caller-supplied
    estimate) wins; otherwise the source files' on-disk bytes are read
    from filesystem metadata (blob columns barely compress, so parquet
    bytes ≈ decoded bytes); a source-less frame keeps its current
    partitioning. At 100 TB of media an extra full pass just to count
    rows is not free — sizing must come from metadata.
    """
    kernel = decode or (lambda b: _fake_embed(b, dim))
    n_parts = _sizing_partitions(
        df, target_partition_mb, avg_blob_kb, n_rows
    )

    out_schema = StructType(df.schema.fields.copy()).add(
        out_col, ArrayType(FloatType())
    )
    if safe:
        out_schema = out_schema.add(error_col, StringType())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not safe:
                pdf[out_col] = [kernel(b) for b in pdf[payload_col]]
                yield pdf
                continue
            feats, errs = [], []
            for b in pdf[payload_col]:
                try:
                    feats.append(kernel(b))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine, don't kill the stage
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            pdf[out_col] = feats
            pdf[error_col] = errs
            yield pdf

    return df.repartition(n_parts).mapInPandas(run, schema=out_schema)


def decode_image_stub(payload: bytes) -> list[float]:  # pragma: no cover
    """Placeholder for the remaining compressed-image decoder (jpeg
    needs PIL/opencv, absent in this container). BMP and PNG decode for
    real — see ``decode_image`` / ``image_features``."""
    raise NotImplementedError(
        "jpeg decoding requires PIL/opencv; BMP and PNG are supported "
        "natively (decode=image_features), or pass decode=<kernel>"
    )


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    every_nth: int = 30,
    out_col: str = "sampled_frames",
) -> DataFrame:
    """Video frame sampling: emits the frame indices that a real decoder
    would extract (the index math is the Spark-side contract; pixel
    work needs a video codec, absent here)."""
    n = F.col(f"{meta_col}.n_frames")
    return df.withColumn(
        out_col,
        F.sequence(F.lit(0), n - 1, F.lit(every_nth)),
    )


# --------------------------------------------------------------------------
# Video: a minimal multi-frame container with RANDOM-ACCESS decode.
# Real video codecs (h264/vp9) need ffmpeg, absent here — but the part
# that matters for the Spark pipeline (seek to the sampled frames
# without decoding the rest, per-frame feature fan-out) is real and
# format-agnostic; swap ``decode_video_frame`` for an ffmpeg-backed
# kernel and nothing else changes.
#
# Layout: b"MBFV" | uint32 n_frames | uint32 frame_len | frames...
# (fixed frame_len = same-dimension BMP frames, so frame i starts at
# 12 + i*frame_len — O(1) random access.)
# --------------------------------------------------------------------------
_VIDEO_MAGIC = b"MBFV"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Pack same-shaped RGB frames into the MBFV container (each frame
    stored as a 24-bit BMP)."""
    if not frames:
        return _VIDEO_MAGIC + struct.pack("<II", 0, 0)
    blobs = [encode_bmp(f) for f in frames]
    if len({len(b) for b in blobs}) != 1:
        raise ValueError("all frames must share one shape")
    return (
        _VIDEO_MAGIC
        + struct.pack("<II", len(blobs), len(blobs[0]))
        + b"".join(blobs)
    )


def video_meta(payload: bytes) -> tuple[int, int]:
    """(n_frames, frame_len) from the container header."""
    if payload[:4] != _VIDEO_MAGIC or len(payload) < 12:
        raise ValueError("not an MBFV container")
    return struct.unpack_from("<II", payload, 4)


def decode_video_frame(payload: bytes, idx: int) -> np.ndarray:
    """Random-access decode of frame ``idx`` — reads ONLY that frame's
    bytes (the property that makes sparse frame sampling at 100 TB a
    byte-range read, not a full-blob decode)."""
    n, flen = video_meta(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range [0, {n})")
    start = 12 + idx * flen
    return decode_bmp(payload[start : start + flen])


def frame_sample_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_nth: int = 30,
    grid: int = 2,
) -> DataFrame:
    """Sample every ``every_nth`` frame from MBFV video blobs and emit
    one row per (media_id, frame_idx) with the frame's image features —
    the long-format fan-out a training pipeline joins/filters on.

    Arrow-batched; per blob only the sampled frames are decoded
    (random access via the frame index). Output:
    (media_id, frame_idx, features array<float>)."""
    out_schema = StructType(
        [
            StructField("media_id", df.schema[id_col].dataType, True),
            StructField("frame_idx", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                n, flen = video_meta(blob)
                for i in range(0, n, every_nth):
                    frame_bmp = blob[12 + i * flen : 12 + (i + 1) * flen]
                    ids.append(mid)
                    idxs.append(i)
                    feats.append(image_features(frame_bmp, grid=grid))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "features": feats}
            )

    return df.mapInPandas(run, schema=out_schema)
