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
- **MP4 (ISO-BMFF) container metadata** — REAL parser on stdlib
  ``struct`` (r9): box tree, brand, movie duration, per-track
  dimensions / sample rate / sample count (``parse_mp4_meta``); the
  mdat SAMPLES stay opaque (h264/vp9 need ffmpeg) — the same honest
  split as WAV (header real, payload math real, codec gated).
- progressive jpeg / webp / mp4 sample decode — require native codecs;
  ``decode_image_stub`` raises a clear error, and the deterministic
  fake embedding (hash-seeded PRNG) keeps the Spark-side plumbing
  testable for those formats. Baseline sequential JPEG decodes for
  real since r8 (``decode_jpeg``), as PNG has since r7.

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
    compressed-image stub; r8's ``decode_jpeg`` below retired the
    baseline-JPEG half, so only progressive-JPEG/WebP stay gated).
    Full filter support: None/Sub/Up/Average/Paeth
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


# --------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 sequential DCT, JFIF container) — stdlib +
# numpy only, same pattern as the r7 PNG codec. Scope: 8-bit baseline
# (SOF0), grayscale / 4:4:4 / 4:2:0 (and any h×v ≤ 2 sampling),
# restart markers honored. Progressive (SOF2), arithmetic coding, and
# 12-bit remain out of scope → ValueError.
# --------------------------------------------------------------------------

#: zigzag order: _ZIGZAG[i] = raster index of the i-th zigzag element
_ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 quantization tables (luminance, chrominance), raster order
_JPEG_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_JPEG_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

#: Annex K.3 typical Huffman tables as (bits[1..16], huffval) pairs
_JPEG_HUFF = {
    ("dc", 0): (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("dc", 1): (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("ac", 0): (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
            0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
            0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
            0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
            0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
            0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
            0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
            0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
            0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
            0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
            0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    ),
    ("ac", 1): (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
            0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
            0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
            0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
            0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
            0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
            0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
            0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
            0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
            0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    ),
}


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: symbol → (code, length) in canonical code order."""
    out: dict[int, tuple[int, int]] = {}
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT basis M (M @ f @ M.T = forward DCT;
    M.T @ F @ M = inverse)."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _idct_matrix()


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.acc, self.nbits = 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy stream truncated")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("JPEG entropy stream ended at a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        # Drop the consumed high bits: without this, acc grows by one
        # byte per _fill for the life of the scan and every shift above
        # costs O(bytes consumed), making decode quadratic in stream
        # size (measured 48.7 s on a 236 KB photo before the trim).
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc, self.nbits = 0, 0
        if self.pos + 1 >= len(self.buf):
            raise ValueError("JPEG entropy stream truncated")
        if (
            self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("JPEG restart marker expected")

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF/JPEG → (h, w, 3) uint8 RGB.

    Stdlib + numpy only (r8 — retires the jpeg half of the image stub;
    mp4 stays honestly env-gated). Scope: 8-bit baseline DCT (SOF0),
    1 or 3 components, sampling factors ≤ 2 (covers 4:4:4, 4:2:2,
    4:2:0), DRI/RSTn honored. Huffman + dequant + exact float64 IDCT +
    nearest-neighbor chroma upsample + BT.601 YCbCr→RGB. Grayscale is
    broadcast to RGB, matching ``decode_png``'s gray handling.
    Progressive / arithmetic / 12-bit → ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[str, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    scan = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if pos + 2 + seg_len > n:
            raise ValueError(
                f"JPEG segment 0x{marker:02x} length {seg_len} overruns payload"
            )
        data = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                if pq != 0:
                    raise ValueError("only 8-bit JPEG quant tables supported")
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = np.frombuffer(data, np.uint8, 64, i + 1)
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(data[i + 17 : i + 17 + nv])
                codes = _huff_codes(bits, vals)
                huff[("dc" if tc == 0 else "ac", th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + nv
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential JPEG (SOF0) supported, got SOF "
                f"marker 0x{marker:02x}"
            )
        elif marker == 0xC0:  # SOF0
            precision = data[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            fh = int.from_bytes(data[1:3], "big")
            fw = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c], data[7 + 3 * c], data[8 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError("JPEG sampling factors must be 1 or 2")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(data[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = data[0]
            sel = {}
            for c in range(ns):
                cid, tt = data[1 + 2 * c], data[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("JPEG has zero dimensions")
    sel, data_pos = scan
    missing = [cid for cid, _, _, _ in comps if cid not in sel]
    if missing:
        raise ValueError(f"JPEG SOS omits frame component ids {missing}")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    reader = _JpegBitReader(payload, data_pos)
    planes = []
    for _, hs, vs, _ in comps:
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), np.float64))
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                if tq not in quant:
                    raise ValueError(f"JPEG quant table {tq} missing")
                dc_t, ac_t = sel[cid]
                dc_table = huff.get(("dc", dc_t))
                ac_table = huff.get(("ac", ac_t))
                if dc_table is None or ac_table is None:
                    raise ValueError("JPEG Huffman table missing")
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.float64)
                        s = reader.decode_huff(dc_table)
                        diff = _extend(reader.read(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_table)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coeff = np.zeros(64, np.float64)
                        coeff[_ZIGZAG] = zz
                        block = coeff.reshape(8, 8) * quant[tq]
                        pix = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution and trim
    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        p = planes[ci]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # Trim emitted high bits so acc stays <2 bytes; an untrimmed
        # bigint makes encode quadratic in entropy-stream length.
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _jpeg_scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (quality 1..100)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def encode_jpeg(
    rgb: np.ndarray, quality: int = 90, subsample: bool = False,
    gray: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB → baseline JFIF bytes — the fixture
    generator for ``decode_jpeg`` (same role ``encode_png`` plays for
    the PNG decoder; quality/subsample exercise the dequant and 4:2:0
    paths, ``gray`` the 1-component path). Annex K quant (IJG quality
    scaling) + typical Huffman tables; 4:4:4 by default,
    ``subsample=True`` emits 4:2:0 with 2×2 chroma averaging."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8).astype(np.float64)
    h, w, _ = rgb.shape
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql = _jpeg_scaled_quant(_JPEG_QUANT_LUMA, quality)
    qc = _jpeg_scaled_quant(_JPEG_QUANT_CHROMA, quality)
    enc_tabs = {k: _huff_codes(*v) for k, v in _JPEG_HUFF.items()}

    if gray:
        comp_planes = [(y, 1, 1, 0)]
    elif subsample:
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cb_p = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr_p = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb_s = cb_p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr_s = cr_p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comp_planes = [(y, 2, 2, 0), (cb_s, 1, 1, 1), (cr_s, 1, 1, 1)]
    else:
        comp_planes = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
    hmax = max(c[1] for c in comp_planes)
    vmax = max(c[2] for c in comp_planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    padded = []
    for plane, hs, vs, tq in comp_planes:
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        padded.append((p, hs, vs, tq))

    def _bitlen(v: int) -> int:
        return int(v).bit_length()

    writer = _JpegBitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, hs, vs, tq) in enumerate(padded):
                qt = ql if tq == 0 else qc
                dc_tab = enc_tabs[("dc", tq)]
                ac_tab = enc_tabs[("ac", tq)]
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeff = _DCT_M @ block @ _DCT_M.T
                        qz = np.rint(coeff / qt).astype(np.int64)
                        zz = qz.reshape(-1)[_ZIGZAG]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = _bitlen(abs(diff))
                        code, ln = dc_tab[s]
                        writer.write(code, ln)
                        if s:
                            writer.write(
                                diff if diff > 0 else diff + (1 << s) - 1, s
                            )
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if k > last_nz:
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tab[0xF0]
                                writer.write(code, ln)
                                run -= 16
                            s = _bitlen(abs(v))
                            code, ln = ac_tab[(run << 4) | s]
                            writer.write(code, ln)
                            writer.write(v if v > 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_tab[0x00]  # EOB
                            writer.write(code, ln)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    used_tq = {tq for _, _, _, tq in padded}
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in ((0, ql), (1, qc)):
        if tq in used_tq:
            out += seg(
                0xDB, bytes([tq]) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8))
            )
    sof = (
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([len(padded)])
    )
    for cid, (_, hs, vs, tq) in enumerate(padded, start=1):
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    for (kind, th), (bits, vals) in _JPEG_HUFF.items():
        if th in used_tq:
            tc = 0 if kind == "dc" else 1
            out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([len(padded)])
    for cid, (_, _, _, tq) in enumerate(padded, start=1):
        sos += bytes([cid, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Route a binary image payload to its real decoder (BMP, PNG, or
    baseline JPEG)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise ValueError(
        "unsupported image container (BMP, PNG and baseline JPEG decode natively)"
    )


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
# ISO-BMFF (MP4) container metadata — stdlib struct only (r9, the WAV
# split applied to video: the CONTAINER layer is fully parseable
# without any codec — box tree, movie header, track headers, sample
# counts — while the mdat SAMPLES stay opaque; ``decode_video_frame``
# remains honestly gated on a real h264/vp9 decoder). Box grammar per
# ISO/IEC 14496-12 §4.2: [size:4][type:4], size==1 → 64-bit largesize
# follows, size==0 → box runs to end of file.
# --------------------------------------------------------------------------
_MP4_CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, content_start, box_end) for each box in [start, end);
    malformed sizes raise ValueError (the quarantine contract)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 largesize header truncated")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("MP4 box overruns payload")
        yield btype, pos + hdr, pos + size
        pos += size


def parse_mp4_meta(payload: bytes) -> dict:
    """Parse ftyp/moov metadata from an ISO-BMFF payload: brand, movie
    timescale/duration, and per-track (kind, width, height, timescale,
    n_samples). Raises ValueError on non-MP4 or malformed boxes.

    n_samples comes from each track's stsz sample_count — the REAL
    frame count for video / sample-block count for audio, so
    ``frame_sample``'s index contract works on genuine mp4 metadata.
    An audio track's mdhd timescale IS its sample rate (14496-12
    §8.4.2)."""
    if len(payload) < 12 or payload[4:8] not in (b"ftyp", b"styp"):
        raise ValueError("not an ISO-BMFF (mp4) payload")
    brand = payload[8:12].decode("latin1")
    meta: dict = {"brand": brand, "timescale": 0, "duration": 0, "tracks": []}

    def _need(btype: bytes, c0: int, c1: int, nbytes: int) -> None:
        # a full box shorter than the fields we are about to read must
        # fail as the documented ValueError, not IndexError (nor parse
        # an undersized slice silently as zeros) — ADVICE r9
        if c1 - c0 < nbytes:
            raise ValueError(
                f"MP4 {btype.decode('latin1')} box content too short "
                f"({c1 - c0} < {nbytes} bytes)"
            )

    def _walk(start: int, end: int, track: dict | None, depth: int) -> None:
        # real files nest ~5 deep (moov/trak/mdia/minf/stbl); a crafted
        # payload nesting thousands of container boxes must fail as the
        # documented ValueError, not RecursionError
        if depth > 16:
            raise ValueError("MP4 box tree nested too deep")
        for btype, c0, c1 in _iter_mp4_boxes(payload, start, end):
            if btype == b"trak":
                t = {"kind": "", "width": 0, "height": 0,
                     "timescale": 0, "n_samples": 0}
                meta["tracks"].append(t)
                _walk(c0, c1, t, depth + 1)
            elif btype in _MP4_CONTAINER_BOXES:
                _walk(c0, c1, track, depth + 1)
            elif btype == b"mvhd":
                _need(btype, c0, c1, 4)
                ver = payload[c0]
                if ver == 1:
                    _need(btype, c0, c1, 32)
                    meta["timescale"] = int.from_bytes(payload[c0 + 20 : c0 + 24], "big")
                    meta["duration"] = int.from_bytes(payload[c0 + 24 : c0 + 32], "big")
                else:
                    _need(btype, c0, c1, 20)
                    meta["timescale"] = int.from_bytes(payload[c0 + 12 : c0 + 16], "big")
                    meta["duration"] = int.from_bytes(payload[c0 + 16 : c0 + 20], "big")
            elif btype == b"tkhd" and track is not None:
                _need(btype, c0, c1, 4)
                ver = payload[c0]
                _need(btype, c0, c1, (96 if ver == 1 else 84))
                off = c0 + (88 if ver == 1 else 76)
                # 16.16 fixed-point presentation dimensions
                track["width"] = int.from_bytes(payload[off : off + 4], "big") >> 16
                track["height"] = int.from_bytes(payload[off + 4 : off + 8], "big") >> 16
            elif btype == b"mdhd" and track is not None:
                _need(btype, c0, c1, 4)
                ver = payload[c0]
                _need(btype, c0, c1, (24 if ver == 1 else 16))
                off = c0 + (20 if ver == 1 else 12)
                track["timescale"] = int.from_bytes(payload[off : off + 4], "big")
            elif btype == b"hdlr" and track is not None:
                _need(btype, c0, c1, 12)
                track["kind"] = payload[c0 + 8 : c0 + 12].decode("latin1")
            elif btype == b"stsz" and track is not None:
                _need(btype, c0, c1, 12)
                track["n_samples"] = int.from_bytes(payload[c0 + 8 : c0 + 12], "big")

    _walk(0, len(payload), None, 0)
    meta["duration_s"] = (
        meta["duration"] / meta["timescale"] if meta["timescale"] else 0.0
    )
    meta["n_tracks"] = len(meta["tracks"])
    return meta


def _mp4_box(btype: bytes, content: bytes) -> bytes:
    return struct.pack(">I", 8 + len(content)) + btype + content


def encode_mp4_container(
    video: tuple[int, int, int] | None = (640, 360, 90),
    audio_rate: int = 0,
    audio_samples: int = 0,
    duration_s: float = 3.0,
    mdat: bytes = b"\x00" * 64,
) -> bytes:
    """Fixture generator for the ISO-BMFF parser (the role encode_png /
    encode_jpeg play for the image decoders): a structurally valid
    ftyp+moov+mdat file whose CONTAINER metadata is real — brand,
    mvhd, per-track tkhd/mdhd/hdlr/stsz — while mdat holds opaque
    bytes (no codec; samples are NOT decodable, matching the honest
    split ``parse_mp4_meta`` documents). ``video=(w, h, n_frames)``."""
    movie_ts = 1000
    tracks = b""

    def _trak(kind: bytes, w: int, h: int, ts: int, n: int) -> bytes:
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07" + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">I", ts)
            + struct.pack(">I", int(duration_s * ts)) + b"\x55\xc4\x00\x00",
        )
        hdlr = _mp4_box(
            b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + kind + b"\x00" * 13
        )
        stsz = _mp4_box(
            b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, n)
        )
        stbl = _mp4_box(b"stbl", stsz)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"trak", tkhd + mdia)

    if video is not None:
        w, h, n_frames = video
        tracks += _trak(b"vide", w, h, movie_ts, n_frames)
    if audio_rate:
        tracks += _trak(b"soun", 0, 0, audio_rate, audio_samples)
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", movie_ts, int(duration_s * movie_ts))
        + b"\x00" * 80,
    )
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    return ftyp + _mp4_box(b"moov", mvhd + tracks) + _mp4_box(b"mdat", mdat)


# --------------------------------------------------------------------------
# Metadata: REAL header sniffing for BMP/PNG/JPEG/WAV/MP4; hash-derived
# fake for formats whose codecs aren't in this environment.
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
    if payload[:2] == b"\xff\xd8":
        # walk segments to the first SOFn for dimensions
        pos = 2
        while pos + 9 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker in (0xD9, 0xDA):
                break
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                fh = int.from_bytes(payload[pos + 5 : pos + 7], "big")
                fw = int.from_bytes(payload[pos + 7 : pos + 9], "big")
                return ("jpeg", fw, fh, 1, 0)
            pos += 2 + seg_len
        return ("jpeg", 0, 0, 1, 0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                return ("wav", 0, 0, w.getnframes(), w.getframerate())
        except wave.Error:
            pass
    if len(payload) >= 12 and payload[4:8] in (b"ftyp", b"styp"):
        try:
            m = parse_mp4_meta(payload)
        except ValueError:
            return ("mp4", 0, 0, 0, 0)  # mp4 brand, malformed boxes
        vids = [t for t in m["tracks"] if t["kind"] == "vide"]
        auds = [t for t in m["tracks"] if t["kind"] == "soun"]
        return (
            "mp4",
            vids[0]["width"] if vids else 0,
            vids[0]["height"] if vids else 0,
            vids[0]["n_samples"] if vids else 0,
            auds[0]["timescale"] if auds else 0,
        )
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
    """Placeholder for image formats beyond the native codecs (BMP,
    PNG, baseline JPEG all decode for real — see ``decode_image`` /
    ``image_features``). Remaining gaps: progressive JPEG, WebP, ...,
    which need libjpeg-turbo/PIL, absent in this container."""
    raise NotImplementedError(
        "progressive-JPEG/WebP decoding requires PIL/opencv; BMP, PNG and "
        "baseline JPEG are supported natively (decode=image_features), or "
        "pass decode=<kernel>"
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
