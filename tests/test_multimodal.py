"""Multimodal tests: real BMP/WAV codecs (pure numpy / stdlib wave),
header sniffing, Arrow feature extraction, frame-index sampling.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbfbigdatarandomforest_spark.operators.multimodal import (
    attach_media_metadata,
    audio_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    frame_sample,
    image_features,
    resize_image,
    sniff_media_meta,
)


def _media_df(spark, n=20):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, payload binary")


def _bmp(w=7, h=5, seed=3) -> bytes:
    rng = np.random.default_rng(seed)
    return encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def _wav(n=800, rate=8000, seed=4) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=n)
    return encode_wav(x, rate)


def test_bmp_roundtrip_exact():
    """encode → decode must reproduce the pixel array bit-for-bit,
    including non-multiple-of-4 row widths (padding path)."""
    rng = np.random.default_rng(1)
    for w, h in [(1, 1), (3, 2), (7, 5), (8, 8)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip_close():
    x, rate = decode_wav(_wav())
    assert rate == 8000 and len(x) == 800
    # 16-bit quantization: within 1/32767 of the clipped original
    rng = np.random.default_rng(4)
    t = np.arange(800) / 8000
    orig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=800)
    # encode scales by 32767, decode by 32768 → bound ~2 LSBs
    assert np.abs(x - np.clip(orig, -1, 1)).max() < 2.0 / 32767


def test_sniff_media_meta_real_headers():
    fmt, w, h, n, r = sniff_media_meta(_bmp(w=7, h=5))
    assert (fmt, w, h, n) == ("bmp", 7, 5, 1)
    fmt, _, _, n, r = sniff_media_meta(_wav(n=800, rate=8000))
    assert fmt == "wav" and n == 800 and r == 8000
    assert sniff_media_meta(b"\x00garbage")[0] == "unknown"


def test_image_features_values():
    """Mean-pool features must equal the direct numpy computation."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    feats = image_features(encode_bmp(img), grid=2)
    assert len(feats) == 2 * 2 * 3 + 6
    # every pooled cell: (1, 0, 0); global mean (1,0,0), std 0
    assert feats[:3] == [1.0, 0.0, 0.0]
    assert feats[12:15] == [1.0, 0.0, 0.0]
    assert feats[15:18] == [0.0, 0.0, 0.0]


def test_audio_features_shape_and_energy():
    feats = audio_features(_wav(), n_bands=8)
    assert len(feats) == 10
    assert feats[0] > 0.2  # RMS of a 0.5-amplitude sine ≈ 0.35
    assert abs(sum(feats[2:]) - 1.0) < 1e-9  # band energies normalized


def test_resize_image_nearest():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_image(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[0, 0], img[0, 0])


def test_metadata_struct_schema_and_real_sniff(spark):
    rows = [(0, _bmp()), (1, _wav()), (2, b"\x01unknownpayload")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r["media_meta"] for r in attach_media_metadata(df).collect()}
    assert out[0]["format"] == "bmp" and out[0]["width"] == 7
    assert out[1]["format"] == "wav" and out[1]["sample_rate"] == 8000
    assert out[2]["format"] == "unknown"
    f = attach_media_metadata(df).schema["media_meta"]
    assert [x.name for x in f.dataType.fields] == [
        "format", "width", "height", "n_frames", "sample_rate",
    ]


def test_extract_features_deterministic(spark):
    df = _media_df(spark)
    a = {r["id"]: r["features"] for r in extract_features(df, dim=8).collect()}
    b = {r["id"]: r["features"] for r in extract_features(df, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    # different payloads → different features
    assert a[0] != a[1]


def test_extract_features_real_image_kernel(spark):
    """The Arrow path with the REAL BMP kernel must equal local calls."""
    payloads = [(i, _bmp(w=6 + i, h=4 + i, seed=i)) for i in range(4)]
    df = spark.createDataFrame(payloads, "id long, payload binary")
    got = {
        r["id"]: r["features"]
        for r in extract_features(df, decode=image_features).collect()
    }
    for i, p in payloads:
        want = image_features(p)
        assert got[i] == pytest.approx(want, rel=1e-6)


def test_frame_sample_indices(spark):
    df = attach_media_metadata(_media_df(spark))
    out = frame_sample(df, every_nth=30).collect()
    for r in out:
        n = r["media_meta"]["n_frames"]
        assert list(r["sampled_frames"]) == list(range(0, n, 30))


def test_video_container_roundtrip_and_random_access():
    import numpy as np

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_video_frame,
        encode_video,
        video_meta,
    )

    rng = np.random.default_rng(5)
    frames = [
        (rng.integers(0, 256, size=(8, 6, 3))).astype(np.uint8) for _ in range(7)
    ]
    blob = encode_video(frames)
    n, flen = video_meta(blob)
    assert n == 7 and flen > 0
    for i in (0, 3, 6):
        np.testing.assert_array_equal(decode_video_frame(blob, i), frames[i])
    with __import__("pytest").raises(IndexError):
        decode_video_frame(blob, 7)


def test_frame_sample_features_matches_direct(spark):
    """The Spark fan-out must emit exactly the sampled frame indices,
    with features equal to computing image_features on each sampled
    frame directly."""
    import numpy as np

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_bmp,
        encode_video,
        frame_sample_features,
        image_features,
    )

    rng = np.random.default_rng(9)
    vids = []
    for mid in range(3):
        frames = [
            (rng.integers(0, 256, size=(6, 4, 3))).astype(np.uint8)
            for _ in range(5 + mid)
        ]
        vids.append((mid, encode_video(frames), frames))
    df = spark.createDataFrame(
        [(m, b) for m, b, _ in vids], ["media_id", "payload"]
    )
    got = frame_sample_features(df, id_col="media_id", every_nth=2, grid=2).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r["features"] for r in got}
    want_keys = {
        (m, i) for m, _, fr in vids for i in range(0, len(fr), 2)
    }
    assert set(by_key) == want_keys
    for m, _, fr in vids:
        for i in range(0, len(fr), 2):
            direct = image_features(encode_bmp(fr[i]), grid=2)
            assert by_key[(m, i)] == [__import__("pytest").approx(x, abs=1e-6) for x in direct]


def test_sniff_recognizes_video_container():
    import numpy as np

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_video,
        sniff_media_meta,
    )

    frames = [np.zeros((4, 3, 3), dtype=np.uint8)] * 2
    fmt, w, h, n, rate = sniff_media_meta(encode_video(frames))
    assert (fmt, w, h, n, rate) == ("mbfv", 3, 4, 2, 0)


def test_extract_features_safe_mode_quarantines_bad_blobs(spark):
    """safe=True: corrupt payloads yield NULL features + the error
    string; good payloads in the same batch still decode — the stage
    must not die (the 100 TB posture: one bad blob never costs the
    partition)."""
    import numpy as np

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_bmp,
        extract_features,
        image_features,
    )

    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    rows = [(0, good), (1, b"not a bmp at all"), (2, good)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = extract_features(
        df, decode=image_features, safe=True, avg_blob_kb=1
    ).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["decode_error"] is None and by_id[0]["features"] is not None
    assert by_id[2]["decode_error"] is None
    assert by_id[1]["features"] is None
    assert by_id[1]["decode_error"]  # carries the exception text

    # unsafe mode on the same data must raise (the strict default)
    import pytest as _pt

    with _pt.raises(Exception):
        extract_features(df, decode=image_features, avg_blob_kb=1).collect()


def test_sizing_partitions_needs_no_scan(spark, tmp_path):
    """Partition sizing must come from metadata, never a count() scan:
    caller estimate wins, parquet sources size from file bytes, and an
    in-memory frame keeps its partitioning."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        _sizing_partitions,
    )

    df = spark.createDataFrame([(i, b"x" * 100) for i in range(64)], ["id", "payload"])
    # caller-supplied rows: 64 rows at 256KB avg vs 64MB target -> 256 rows/part
    assert _sizing_partitions(df, 64, 256, n_rows=10_000) == 10_000 // 256
    # in-memory frame, no source files: keep existing partitioning
    assert _sizing_partitions(df, 64, 256, None) == df.rdd.getNumPartitions()
    # parquet source: sized from on-disk bytes (tiny file -> 1 partition)
    p = str(tmp_path / "blobs")
    df.write.parquet(p)
    assert _sizing_partitions(spark.read.parquet(p), 64, 256, None) == 1


# --------------------------------------------------------------------------
# r7: real PNG codec (stdlib zlib + filter reconstruction)
# --------------------------------------------------------------------------
def test_png_golden_all_filter_types():
    """Hand-built golden: a known pixel array encoded with every spec
    filter type (None/Sub/Up/Average/Paeth, one per row) must decode
    back to the exact array — exercising each reconstruction path
    against the same data."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    png = encode_png(img, row_filters=[0, 1, 2, 3, 4])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(png)
    assert out.dtype == np.uint8 and out.shape == (5, 6, 3)
    assert np.array_equal(out, img)


def test_png_roundtrip_each_filter_uniformly():
    """Every filter type applied to EVERY row must round-trip on
    gradient data (worst case for prediction filters), including a
    width that stresses the first-pixel (no-left-neighbor) branches."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    h, w = 7, 4
    img = (
        np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3) * 37 % 256
    ).astype(np.uint8)
    for f in range(5):
        out = decode_png(encode_png(img, row_filters=[f] * h))
        assert np.array_equal(out, img), f"filter {f} failed"


def test_png_color_types_gray_alpha_palette():
    """Non-RGB color types: gray broadcast to RGB, alpha dropped,
    palette resolved through PLTE. Chunks hand-assembled so no external
    encoder is needed."""
    import struct
    import zlib

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
    )

    sig = b"\x89PNG\r\n\x1a\n"

    def build(w, h, ctype, body_rows, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in body_rows)
        chunks = [_png_chunk(b"IHDR", ihdr)]
        if plte is not None:
            chunks.append(_png_chunk(b"PLTE", plte))
        chunks += [_png_chunk(b"IDAT", zlib.compress(raw)), _png_chunk(b"IEND", b"")]
        return sig + b"".join(chunks)

    # grayscale (type 0): value v → (v, v, v)
    g = decode_png(build(3, 2, 0, [bytes([10, 20, 30]), bytes([40, 50, 60])]))
    assert np.array_equal(g[0, 1], [20, 20, 20]) and np.array_equal(g[1, 2], [60, 60, 60])
    # gray+alpha (type 4): alpha dropped
    ga = decode_png(build(2, 1, 4, [bytes([100, 255, 200, 0])]))
    assert np.array_equal(ga[0, 0], [100, 100, 100])
    assert np.array_equal(ga[0, 1], [200, 200, 200])
    # RGBA (type 6): alpha dropped
    rgba = decode_png(build(1, 1, 6, [bytes([1, 2, 3, 128])]))
    assert np.array_equal(rgba[0, 0], [1, 2, 3])
    # palette (type 3): indices through PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pal = decode_png(build(3, 1, 3, [bytes([2, 0, 1])], plte=plte))
    assert np.array_equal(pal[0], [[0, 0, 255], [255, 0, 0], [0, 255, 0]])


def test_png_rejects_unsupported():
    from mbfbigdatarandomforest_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")
    # 16-bit depth rejected via a hand-built header
    import struct
    import zlib

    from mbfbigdatarandomforest_spark.operators.multimodal import _png_chunk

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    bad = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="only 8-bit"):
        decode_png(bad)


def test_png_malformed_inputs_raise_valueerror():
    """ADVICE r7: malformed chunks must surface as the codec's
    ValueError contract, never a raw numpy/struct/zlib error — the
    quarantine path in extract_features keys on ValueError."""
    import struct
    import zlib

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
    )

    sig = b"\x89PNG\r\n\x1a\n"

    def build(chunks):
        return sig + b"".join(chunks)

    ihdr_pal = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0))
    idat_pal = _png_chunk(b"IDAT", zlib.compress(b"\x00" + bytes([2, 0, 1])))
    iend = _png_chunk(b"IEND", b"")

    # PLTE length not a multiple of 3
    with pytest.raises(ValueError, match="PLTE length"):
        decode_png(build([ihdr_pal, _png_chunk(b"PLTE", b"\xff\x00"), idat_pal, iend]))
    # palette index out of range (PLTE has 2 entries, index 2 used)
    plte2 = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(build([ihdr_pal, plte2, idat_pal, iend]))
    # chunk length overruns the payload
    over = struct.pack(">I", 1 << 20) + b"IDAT" + b"\x00" * 8
    with pytest.raises(ValueError, match="overruns"):
        decode_png(build([ihdr_pal, over]))
    # IHDR wrong size
    with pytest.raises(ValueError, match="IHDR must be 13"):
        decode_png(build([_png_chunk(b"IHDR", b"\x00" * 5), iend]))
    # corrupt IDAT stream
    ihdr_rgb = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="IDAT stream corrupt"):
        decode_png(build([ihdr_rgb, _png_chunk(b"IDAT", b"\x13\x37\x00\x00"), iend]))


def test_png_sniff_and_feature_pipeline(spark):
    """The Spark-side plumbing runs on PNG payloads end-to-end: sniff
    reports the real header, and image_features through the Arrow
    extract_features path equals the direct kernel call — with BMP and
    PNG payloads of the SAME image producing identical features."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_png,
        encode_png,
        sniff_media_meta,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    png, bmp = encode_png(img, row_filters=[4] * 8), encode_bmp(img)

    assert sniff_media_meta(png) == ("png", 9, 8, 1, 0)

    df = spark.createDataFrame([(0, png), (1, bmp)], "id long, payload binary")
    got = {
        r["id"]: r["features"]
        for r in extract_features(
            df, decode=image_features, n_rows=2
        ).collect()
    }
    direct = image_features(png)
    assert np.allclose(got[0], direct)
    assert np.allclose(got[0], got[1])  # same pixels, either container


def test_jpeg_roundtrip_quality_ladder():
    """decode(encode(img)) stays within quantization tolerance across
    quality levels and odd (non-multiple-of-8/16) dimensions; the IDCT
    basis is orthonormal so q=100 on noise is near-exact."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        _DCT_M,
        decode_jpeg,
        encode_jpeg,
    )

    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)
    h, w = 24, 33
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [
            xx * 255 / (w - 1),
            yy * 255 / (h - 1),
            (xx + yy) * 255 / (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)
    for q, sub, tol in ((95, False, 6), (90, True, 12), (50, False, 20)):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= tol, (q, sub)
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, quality=100))
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 2


def test_jpeg_grayscale_single_component():
    """1-component JPEG broadcasts gray to RGB, matching decode_png's
    gray handling."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    g = np.linspace(0, 255, 16 * 11).reshape(16, 11).astype(np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(img, quality=95, gray=True))
    assert out.shape == (16, 11, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_jpeg_rejects_unsupported_and_malformed():
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BM000000")
    img = np.zeros((8, 8, 3), np.uint8)
    good = bytearray(encode_jpeg(img))
    # flip SOF0 (0xFFC0) to progressive SOF2 (0xFFC2)
    sof = good.find(b"\xff\xc0")
    prog = good[:sof] + b"\xff\xc2" + good[sof + 2 :]
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(prog))
    # truncated segment: chop inside the huffman tables
    dht = good.find(b"\xff\xc4")
    with pytest.raises(ValueError, match="overruns|missing SOF0/SOS"):
        decode_jpeg(bytes(good[: dht + 6]))


def test_jpeg_bit_accumulators_stay_bounded():
    """The r8 codec kept every consumed byte in the Python bigint acc,
    so each shift cost O(bytes-so-far) and decode/encode were quadratic
    in entropy-stream size (48.7 s for a 236 KB photo). The r9 trim
    keeps acc under 3 bytes; this pins it so the quadratic can't
    silently return."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        _JpegBitReader,
        _JpegBitWriter,
    )

    reader = _JpegBitReader(b"\x55" * 10_000, 0)
    for _ in range(9_000):
        reader.read(8)
        assert reader.acc.bit_length() <= 24
    writer = _JpegBitWriter()
    for i in range(9_000):
        writer.write(i & 0x1F, 5)
        assert writer.acc.bit_length() <= 24


def test_jpeg_malformed_entropy_raises_valueerror():
    """Truncation inside the entropy stream and an SOS referencing a
    component id absent from SOF must both surface as the documented
    ValueError (not IndexError/KeyError) so decode_image callers that
    key on ValueError — and extract_features' quarantine — behave."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    good = bytearray(encode_jpeg(img))
    sos = good.find(b"\xff\xda")
    assert sos > 0
    # chop mid-entropy-stream: must be ValueError, never IndexError
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(bytes(good[: sos + 30]))
    # remap the SOS component ids (1,2,3 -> 7,8,9): ids no longer match
    # SOF; must be ValueError, never KeyError
    bad = bytearray(good)
    ns = bad[sos + 4]
    for c in range(ns):
        bad[sos + 5 + 2 * c] += 6
    with pytest.raises(ValueError, match="SOS omits"):
        decode_jpeg(bytes(bad))


def test_jpeg_sniff_and_container_equivalence(spark):
    """sniff reports real SOF dimensions, and a JPEG payload flows
    through the Arrow extract_features path alongside BMP/PNG of the
    same pixels with near-equal features (JPEG is lossy — tolerance,
    where PNG/BMP assert exact equality)."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_jpeg,
        encode_png,
        sniff_media_meta,
    )

    h, w = 16, 9
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [xx * 20, yy * 12, xx * 10 + yy * 6], axis=2
    ).astype(np.uint8)
    jpg = encode_jpeg(img, quality=95)
    assert sniff_media_meta(jpg) == ("jpeg", w, h, 1, 0)

    df = spark.createDataFrame(
        [(0, jpg), (1, encode_bmp(img)), (2, encode_png(img))],
        "id long, payload binary",
    )
    got = {
        r["id"]: np.array(r["features"])
        for r in extract_features(df, decode=image_features, n_rows=3).collect()
    }
    assert np.allclose(got[1], got[2])  # lossless twins exact
    # lossy twin: mean-pooled features move by at most a few gray levels
    assert np.abs(got[0] - got[1]).max() <= 4.0 / 255.0


def test_mp4_container_metadata_parses_for_real():
    """r9: the WAV honest-split applied to video — ISO-BMFF box tree,
    mvhd, per-track tkhd/mdhd/hdlr/stsz all parse with stdlib struct
    (no codec), while mdat samples stay opaque and decode_video_frame
    stays gated."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_mp4_container,
        parse_mp4_meta,
        sniff_media_meta,
    )

    p = encode_mp4_container(
        video=(1280, 720, 300), audio_rate=44100, audio_samples=431,
        duration_s=10.0,
    )
    m = parse_mp4_meta(p)
    assert m["brand"] == "isom" and m["duration_s"] == 10.0
    assert m["n_tracks"] == 2
    vide, soun = m["tracks"]
    assert (vide["kind"], vide["width"], vide["height"], vide["n_samples"]) == (
        "vide", 1280, 720, 300,
    )
    # an audio track's mdhd timescale IS its sample rate (14496-12)
    assert (soun["kind"], soun["timescale"], soun["n_samples"]) == (
        "soun", 44100, 431,
    )
    assert sniff_media_meta(p) == ("mp4", 1280, 720, 300, 44100)
    # audio-only variant
    assert sniff_media_meta(
        encode_mp4_container(video=None, audio_rate=16000, audio_samples=50)
    ) == ("mp4", 0, 0, 0, 16000)


def test_mp4_malformed_boxes_keep_valueerror_contract():
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        encode_mp4_container,
        parse_mp4_meta,
        sniff_media_meta,
    )

    p = encode_mp4_container()
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        parse_mp4_meta(b"\x00" * 32)
    # corrupt the moov size: parse raises, sniff degrades to zeros
    bad = p[:28] + b"\xff\xff\xff\xf0" + p[32:]
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(bad)
    assert sniff_media_meta(bad) == ("mp4", 0, 0, 0, 0)
    # truncated 64-bit largesize header
    with pytest.raises(ValueError, match="largesize"):
        parse_mp4_meta(p[:28] + b"\x00\x00\x00\x01" + p[32:40])
    # a crafted deep-nest payload must fail as ValueError, never
    # RecursionError (the quarantine contract)
    deep = b""
    for i in range(64):
        inner = len(deep) + 8
        deep = (inner.to_bytes(4, "big") + b"moov") + deep
    with pytest.raises(ValueError, match="nested too deep"):
        parse_mp4_meta(p[:28] + deep)
    # undersized full boxes (ADVICE r9): a zero-content mvhd as the
    # LAST box must fail as ValueError, not IndexError; an undersized
    # tkhd/mdhd/hdlr/stsz must not silently parse short slices as zeros
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
    zero_mvhd = (8).to_bytes(4, "big") + b"mvhd"
    moov = (16).to_bytes(4, "big") + b"moov" + zero_mvhd
    with pytest.raises(ValueError, match="mvhd box content too short"):
        parse_mp4_meta(ftyp + moov)
    for btype in (b"tkhd", b"mdhd", b"hdlr", b"stsz"):
        short = (12).to_bytes(4, "big") + btype + b"\x00\x00\x00\x00"
        trak = (20).to_bytes(4, "big") + b"trak" + short
        moov = (28).to_bytes(4, "big") + b"moov" + trak
        with pytest.raises(ValueError, match="box content too short"):
            parse_mp4_meta(ftyp + moov)


def test_mp4_and_mbfv_share_the_frame_sample_contract(spark):
    """Container equivalence: an mp4 and an MBFV blob with the same
    frame count flow through attach_media_metadata -> frame_sample and
    emit IDENTICAL sampled-index arrays — the Spark-side contract is
    container-agnostic, only the (gated) pixel decode differs."""
    from mbfbigdatarandomforest_spark.operators.multimodal import (
        attach_media_metadata,
        encode_mp4_container,
        encode_video,
        frame_sample,
    )

    n_frames = 91
    frames = [np.zeros((4, 4, 3), np.uint8)] * n_frames
    df = spark.createDataFrame(
        [(0, encode_mp4_container(video=(4, 4, n_frames))),
         (1, encode_video(frames))],
        "id long, payload binary",
    )
    rows = (
        frame_sample(attach_media_metadata(df), every_nth=30)
        .select("id", "media_meta.format", "sampled_frames")
        .collect()
    )
    got = {r["id"]: (r["format"], r["sampled_frames"]) for r in rows}
    assert got[0][0] == "mp4" and got[1][0] == "mbfv"
    assert got[0][1] == got[1][1] == [0, 30, 60, 90]


def test_jpeg_decodes_real_world_files_when_available():
    """Independent-encoder evidence: the roundtrip tests share the
    encoder's conventions, so a symmetric bug (e.g. a mirrored zigzag
    on both sides) would cancel there. Real libjpeg-encoded files on
    this host cannot share such a bug. Skips where none exist."""
    import os

    from mbfbigdatarandomforest_spark.operators.multimodal import (
        decode_jpeg,
        sniff_media_meta,
    )

    candidates = [
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/flower-of-life.jpg",
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/docs/_static/pyparsingClassDiagram_1.5.2.jpg",
    ]
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no third-party baseline JPEGs on this host")
    decoded = 0
    for p in found:
        payload = open(p, "rb").read()
        fmt, w, h, _, _ = sniff_media_meta(payload)
        assert fmt == "jpeg" and w > 0 and h > 0
        try:
            img = decode_jpeg(payload)
        except ValueError as e:
            assert "SOF0" in str(e)  # progressive is out of scope, loudly
            continue
        assert img.shape == (h, w, 3) and img.dtype == np.uint8
        assert img.std() > 0  # a real picture, not a constant field
        decoded += 1
    if found and not decoded:
        pytest.skip("only progressive JPEGs on this host")
