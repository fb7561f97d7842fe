"""Real-codec branch of the multimodal surface — no Pillow required.

``decode_image_numpy`` is a dependency-free decoder for three public
formats (binary PPM/PGM, uncompressed 24-bit BMP), so the REAL pixel
paths of decode_images / image_phash / resize_images execute in this
container instead of the deterministic fake. Expected pixel values are
crafted by hand (struct-packed headers), never by the code under test.
"""

import struct

import numpy as np
import pytest

from iniz_exporters_spark.multimodal.binary import (
    decode_image_numpy,
    decode_images,
    encode_ppm,
    image_phash,
    resize_images,
)


def make_bmp(px: np.ndarray, bottom_up: bool = True) -> bytes:
    """Independent 24-bit BI_RGB BMP writer (BITMAPINFOHEADER)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        row = px[y][:, ::-1].tobytes()  # RGB → BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    raster = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, h if bottom_up else -h, 1, 24, 0, len(raster), 2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return head + info + raster


GRAD8 = np.arange(64, dtype=np.uint8).reshape(8, 8)  # mean 31.5 → bits = p>=32


def test_decode_ppm_p6_roundtrip():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = decode_image_numpy(encode_ppm(px))
    assert got is not None
    w, h, fmt, out = got
    assert (w, h, fmt) == (3, 2, "PPM")
    np.testing.assert_array_equal(out, px)


def test_decode_pgm_p5_with_comments():
    data = b"P5 # comment\n# another comment\n 8\n8 # trailing\n255\n" + (
        GRAD8.tobytes()
    )
    got = decode_image_numpy(data)
    assert got is not None
    w, h, fmt, out = got
    assert (w, h, fmt) == (8, 8, "PGM")
    np.testing.assert_array_equal(out, GRAD8)


def test_decode_bmp_both_orientations():
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    for bottom_up in (True, False):
        got = decode_image_numpy(make_bmp(px, bottom_up=bottom_up))
        assert got is not None
        w, h, fmt, out = got
        assert (w, h, fmt) == (2, 2, "BMP")
        np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"#P6 3 2 255 not an image",  # the _phash_payload guard prefix
        b"hello world this is text",
        b"P6 3 2 255",  # truncated raster
        b"P6 0 0 255 ",  # degenerate dims
        b"BM" + b"\x00" * 60,  # BMP magic, garbage header
        b"P5 2 2 65535 " + b"\x00" * 8,  # 16-bit maxval unsupported
    ],
)
def test_decoder_rejects_non_images(junk):
    assert decode_image_numpy(junk) is None


def test_decode_images_real_branch(spark):
    rows = [
        (1, encode_ppm(np.zeros((4, 6, 3), dtype=np.uint8))),
        (2, make_bmp(np.zeros((2, 2, 3), dtype=np.uint8))),
        (3, b"#P6 not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           decode_images(df, "payload", "media_id").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (6, 4, "PPM")
    assert (got[2]["width"], got[2]["height"], got[2]["format"]) == (2, 2, "BMP")
    assert got[3]["format"] == "FAKE"  # guard prefix keeps fakes fake


def test_image_phash_real_pixels_exact(spark):
    """aHash of a real grayscale gradient, expected bits derived by hand:
    8×8 values 0..63 → bit p set iff pixel ≥ 32 (rows 4-7), so bands are
    (0, 0, 0xffff, 0xffff). A 16×16 image of constant 2×2 blocks with the
    same block values must produce the identical hash through the
    area-mean downsample."""
    grad16 = np.kron(GRAD8, np.ones((2, 2), dtype=np.uint8))
    rows = [
        (1, b"P5 8 8 255 " + GRAD8.tobytes()),
        (2, b"P5 16 16 255 " + grad16.tobytes()),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           image_phash(df, "payload", "media_id").collect()}
    for i in (1, 2):
        assert [got[i][f"b{j}"] for j in range(4)] == [0, 0, 0xFFFF, 0xFFFF]
        assert got[i]["phash"] == "00000000ffffffff"


def _filtered_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG writer applying a GIVEN filter type per scanline
    (forward-filters per RFC 2083 §6) — exercises the decoder's unfilter
    paths, which a filter-0 round-trip alone would not."""
    import zlib

    a = np.asarray(px, np.uint8)
    h, w = a.shape[:2]
    ch = 1 if a.ndim == 2 else a.shape[2]
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int64)
    body = bytearray()
    for y, f in zip(range(h), filters):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * ch, np.int64)
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        body += b"%c" % f + (enc % 256).astype(np.uint8).tobytes()
    import struct

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body))) + chunk(b"IEND", b"")
    )


def test_decode_png_roundtrip_all_color_types():
    from iniz_exporters_spark.multimodal.binary import encode_png

    rng = np.random.default_rng(3)
    for shape in ((5, 7), (5, 7, 3), (5, 7, 4)):
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_image_numpy(encode_png(px))
        assert got is not None
        w, h, fmt, out = got
        assert (w, h, fmt) == (7, 5, "PNG")
        np.testing.assert_array_equal(out, px)


def test_decode_png_every_filter_type():
    """Each scanline forward-filtered with a different type (0-4) must
    unfilter back to the original pixels."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    got = decode_image_numpy(_filtered_png(px, [0, 1, 2, 3, 4]))
    assert got is not None
    np.testing.assert_array_equal(got[3], px)
    gray = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    got = decode_image_numpy(_filtered_png(gray, [4, 3, 2, 1, 0]))
    assert got is not None
    np.testing.assert_array_equal(got[3], gray)


def test_decode_png_rejects_unsupported():
    from iniz_exporters_spark.multimodal.binary import encode_png

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_image_numpy(good[:20]) is None  # truncated chunk walk
    # flip bit depth to 16 inside IHDR (offset 8+8+8 = byte 24)
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    assert decode_image_numpy(bytes(bad_depth)) is None
    # corrupt the DEFLATE stream itself (IDAT payload starts at byte 41:
    # sig 8 + IHDR chunk 25 + IDAT length/type 8); chunk CRCs are
    # deliberately not validated, so corrupt inside the payload
    bad_idat = bytearray(good)
    bad_idat[43] ^= 0xFF
    assert decode_image_numpy(bytes(bad_idat)) is None


def test_image_phash_real_png_pixels(spark):
    """image_phash over REAL PNG payloads, no Pillow: the stdlib zlib
    decode path must produce the same hand-derived aHash as the PGM path
    (same gradient pixels, different container)."""
    from iniz_exporters_spark.multimodal.binary import encode_png

    rgb = np.repeat(GRAD8[:, :, None], 3, axis=2)
    rgba = np.dstack([rgb, np.full((8, 8), 255, np.uint8)])
    rows = [
        (1, encode_png(GRAD8)),
        (2, encode_png(rgb)),
        (3, encode_png(rgba)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r["media_id"]: r for r in
            decode_images(df, "payload", "media_id").collect()}
    for i in (1, 2, 3):
        assert (meta[i]["width"], meta[i]["height"], meta[i]["format"]) == (
            8, 8, "PNG",
        )
    got = {r["media_id"]: r for r in
           image_phash(df, "payload", "media_id").collect()}
    for i in (1, 2, 3):
        assert got[i]["phash"] == "00000000ffffffff"


def test_image_phash_rgb_luma(spark):
    """BT.601 luma ordering on a real color image: green rows read brighter
    than the mean, blue rows darker (587 vs 114 weights)."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :, 2] = 200  # top: blue (luma 22)
    px[4:, :, 1] = 200  # bottom: green (luma 117)
    df = spark.createDataFrame(
        [(1, encode_ppm(px))], "media_id long, payload binary"
    )
    got = image_phash(df, "payload", "media_id").collect()[0]
    assert [got[f"b{j}"] for j in range(4)] == [0, 0, 0xFFFF, 0xFFFF]


def test_resize_images_real_roundtrip(spark):
    """Real path: decode → nearest-neighbor resample → P6 re-encode. The
    output payload is a decodable PPM with the target dims and the exact
    center-sample pixels."""
    px = np.array(
        [[[10, 10, 10], [20, 20, 20], [30, 30, 30], [40, 40, 40]],
         [[50, 50, 50], [60, 60, 60], [70, 70, 70], [80, 80, 80]]],
        dtype=np.uint8,
    )
    df = spark.createDataFrame(
        [(1, encode_ppm(px))], "media_id long, payload binary"
    )
    out = resize_images(df, "payload", "media_id", width=2, height=1).collect()
    dec = decode_image_numpy(bytes(out[0]["resized"]))
    assert dec is not None
    w, h, fmt, arr = dec
    assert (w, h, fmt) == (2, 1, "PPM")
    # center-of-pixel mapping: x centers 0.5,1.5 of 4 → cols 1,3; y → row 0|1
    np.testing.assert_array_equal(arr, px[1:2, [1, 3]])


def test_phash_partition_invariance_real(spark):
    imgs = [
        (i, encode_ppm((np.arange(64, dtype=np.uint8).reshape(8, 8) + i)))
        for i in range(6)
    ]
    df = spark.createDataFrame(imgs, "media_id long, payload binary")
    a = {r["media_id"]: r["phash"] for r in
         image_phash(df, "payload", "media_id").collect()}
    b = {r["media_id"]: r["phash"] for r in
         image_phash(df.repartition(5), "payload", "media_id").collect()}
    assert a == b and len(a) == 6


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM real codec
# ---------------------------------------------------------------------------


def _make_wav(
    samples, rate=8000, bits=16, channels=1, extra_chunk=False
) -> bytes:
    """Hand-rolled PCM WAV encoder (test-side ground truth)."""
    import struct

    if bits == 16:
        body = b"".join(
            struct.pack("<h", max(-32768, min(32767, int(round(s * 32767)))))
            for s in samples
            for _ in range(1)
        )
        if channels == 2:
            body = b"".join(
                struct.pack("<hh", v, v)
                for v in struct.unpack(f"<{len(samples)}h", body)
            )
    else:
        body = bytes(
            max(0, min(255, int(round(s * 127)) + 128)) for s in samples
        )
        if channels == 2:
            body = bytes(b for v in body for b in (v, v))
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # a LIST chunk between fmt and data must be skipped
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_sine_features():
    import math as m

    import numpy as np

    from iniz_exporters_spark.multimodal.binary import (
        _wav_feature_vector,
        decode_wav_numpy,
    )

    rate, freq, dur = 8000, 440, 0.5
    n = int(rate * dur)
    sine = [m.sin(2 * m.pi * freq * i / rate) for i in range(n)]
    dec = decode_wav_numpy(_make_wav(sine, rate=rate))
    assert dec is not None
    got_rate, got_ch, x = dec
    assert (got_rate, got_ch, len(x)) == (rate, 1, n)
    assert np.max(np.abs(x - np.array(sine))) < 1e-3  # 16-bit quantization
    f = _wav_feature_vector(got_rate, got_ch, x)
    assert abs(f[0] - dur) < 1e-9  # duration
    assert f[1] == rate and f[2] == 1
    assert abs(f[3] - 1 / m.sqrt(2)) < 1e-2  # sine RMS = A/sqrt(2)
    # zero-crossing rate of a sine = 2*freq/rate
    assert abs(f[6] - 2 * freq / rate) < 1e-2


def test_wav_decode_8bit_stereo_and_chunk_walk():
    dec = None
    from iniz_exporters_spark.multimodal.binary import decode_wav_numpy

    wav = _make_wav(
        [0.0, 0.5, -0.5, 1.0], rate=4000, bits=8, channels=2,
        extra_chunk=True,
    )
    dec = decode_wav_numpy(wav)
    assert dec is not None
    rate, ch, x = dec
    assert (rate, ch, len(x)) == (4000, 2, 4)
    assert abs(x[1] - 0.5) < 0.02 and abs(x[2] + 0.5) < 0.02


def test_wav_decode_rejects_non_wav():
    from iniz_exporters_spark.multimodal.binary import decode_wav_numpy

    assert decode_wav_numpy(b"") is None
    assert decode_wav_numpy(b"#not audio at all") is None
    assert decode_wav_numpy(b"RIFF\x00\x00\x00\x00AVI ") is None
    # fmt chunk but float PCM (format 3) -> unsupported, clean None
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    assert decode_wav_numpy(bad) is None


def test_audio_features_real_branch_in_spark(spark):
    import math as m

    from iniz_exporters_spark.multimodal.binary import audio_features

    rate = 8000
    sine = [m.sin(2 * m.pi * 100 * i / rate) for i in range(800)]
    rows = [
        (1, bytearray(_make_wav(sine, rate=rate))),
        (2, bytearray(b"not a wav, hits the marked fake")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {
        r["id"]: r["features"]
        for r in audio_features(df, "payload", "id").collect()
    }
    assert abs(out[1][0] - 0.1) < 1e-9  # real branch: 800/8000 s
    assert out[1][1] == rate
    assert abs(out[1][3] - 1 / m.sqrt(2)) < 1e-2
    assert len(out[2]) == 8 and out[2][0] > 1.0  # fake branch: byte means
    assert out[3] == [0.0] * 8
