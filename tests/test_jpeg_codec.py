"""Baseline JPEG codec contracts (pure numpy/stdlib, no Pillow):
round-trips through the real entropy-coded path, subsampling, restart
markers, rejection of non-baseline flavors, and the Spark mapInPandas
real-codec branch over JPEG payloads."""

import numpy as np
import pytest

from iniz_exporters_spark.multimodal.binary import decode_image_numpy
from iniz_exporters_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def test_gray_flat_roundtrip_exact():
    """A flat field quantizes to a pure DC block — decode must be exact."""
    px = np.full((16, 24), 128, np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got is not None
    w, h, fmt, out = got
    assert (w, h, fmt) == (24, 16, "JPEG")
    np.testing.assert_array_equal(out, px)


def test_gray_gradient_low_error():
    px = np.linspace(0, 255, 17 * 23).reshape(17, 23).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got is not None
    out = got[3]
    assert out.shape == px.shape
    rmse = float(np.sqrt(((out.astype(float) - px) ** 2).mean()))
    assert rmse < 3.0  # lossy, but must track the signal


def test_color_roundtrip_and_subsampling():
    # the color boundary sits at row 16 — an MCU boundary even for 4:2:0
    # (16x16 MCUs), so no block straddles the edge and both halves must
    # survive within quantization error
    px = np.zeros((32, 16, 3), np.uint8)
    px[:16] = [200, 30, 40]
    px[16:] = [10, 180, 90]
    for subsample in (False, True):
        got = decode_jpeg(encode_jpeg(px, subsample=subsample))
        assert got is not None
        w, h, fmt, out = got
        assert (w, h, out.shape) == (16, 32, (32, 16, 3))
        err_top = np.abs(out[:16].astype(int) - px[:16].astype(int)).max()
        err_bot = np.abs(out[16:].astype(int) - px[16:].astype(int)).max()
        assert err_top <= 6 and err_bot <= 6


def test_odd_dimensions_with_420():
    """4:2:0 with odd width/height exercises the padding + upsample-crop
    path; a flat image must come back (nearly) exact at full size."""
    px = np.zeros((17, 19, 3), np.uint8)
    px[...] = [100, 150, 50]
    got = decode_jpeg(encode_jpeg(px, subsample=True))
    assert got is not None
    assert got[3].shape == (17, 19, 3)
    assert np.abs(got[3].astype(int) - px.astype(int)).max() <= 2


def test_restart_markers():
    px = np.arange(32 * 40 * 3, dtype=np.uint8).reshape(32, 40, 3)
    plain = decode_jpeg(encode_jpeg(px))
    rst = decode_jpeg(encode_jpeg(px, restart_interval=2))
    assert plain is not None and rst is not None
    # restart markers change the byte stream but not the decoded pixels
    np.testing.assert_array_equal(plain[3], rst[3])


def test_rejects_non_baseline_and_garbage():
    good = encode_jpeg(np.full((8, 8), 99, np.uint8))
    # flip SOF0 (C0) to SOF2 (C2) without touching the scan: the baseline
    # scan header (Ss=0, Se=63) is illegal for a progressive frame (T.81
    # B.2.3 requires Se=0 when Ss=0), so this corrupt stream must still be
    # rejected even though SOF2 itself is now supported
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    assert decode_jpeg(good[:20]) is None  # truncated mid-segment
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no scan
    assert decode_jpeg(b"not a jpeg at all") is None


def test_dispatch_through_decode_image_numpy():
    px = np.full((10, 12), 64, np.uint8)
    got = decode_image_numpy(encode_jpeg(px))
    assert got is not None
    assert got[:3] == (12, 10, "JPEG")


def test_image_phash_real_jpeg_pixels(spark):
    """image_phash over real JPEG payloads, no Pillow: the same gradient
    that hand-derives to 00000000ffffffff in PGM/PNG must hash identically
    through the lossy JPEG path (aHash thresholds at the mean, so the
    small quantization error cannot flip any bit of this pattern)."""
    from iniz_exporters_spark.multimodal.binary import image_phash

    grad = np.kron(
        np.arange(64, dtype=np.uint8).reshape(8, 8),
        np.ones((2, 2), dtype=np.uint8),
    )
    rgb = np.repeat(grad[:, :, None], 3, axis=2)
    rows = [(1, encode_jpeg(grad)), (2, encode_jpeg(rgb))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           image_phash(df, "payload", "media_id").collect()}
    for i in (1, 2):
        assert got[i]["phash"] == "00000000ffffffff"


def test_marker_walk_tolerates_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2 allows 0xFF padding before any marker, and TEM/stray
    RSTn standalone markers between segments; such streams must still
    reach the scan instead of silently falling through to the fake path
    (ADVICE r5 #4)."""
    import numpy as np

    from iniz_exporters_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    px = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    data = encode_jpeg(px)
    assert decode_jpeg(data) is not None

    # inject a fill byte + TEM + RST4 right after SOI
    doctored = data[:2] + b"\xff" + b"\xff\x01" + b"\xff\xd4" + data[2:]
    dec = decode_jpeg(doctored)
    assert dec is not None
    base = decode_jpeg(data)
    assert np.array_equal(dec[3], base[3])


# ---------------------------------------------------------------------------
# Progressive (SOF2) round-trips — T.81 Annex G. The encoder emits a real
# multi-scan script (DC Al=1 → per-component AC bands 1-5 / 6-63 at Al=1 →
# DC refinement → full-band AC refinement to Al=0), so spectral selection,
# successive approximation, EOB runs, ZRL, and correction bits all execute.
# ---------------------------------------------------------------------------


def _scan_headers(data):
    """(Ss, Se, Ah, Al, ncomps) per SOS in stream order."""
    out, pos = [], 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if m == 0xDA:
            seg = data[pos + 4 : pos + 2 + ln]
            ns = seg[0]
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            out.append((ss, se, ahal >> 4, ahal & 15, ns))
            # skip entropy data to the next marker
            p = pos + 2 + ln
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            pos = p
            continue
        pos += 2 + ln
    return out


def test_progressive_stream_is_genuinely_multiscan():
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    px = np.zeros((32, 16, 3), np.uint8)
    px[:16] = [200, 30, 40]
    px[16:] = [10, 180, 90]
    data = encode_jpeg_progressive(px)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    scans = _scan_headers(data)
    assert len(scans) == 11  # 1 DC + 6 AC-first + 1 DC-refine + 3 AC-refine
    assert (0, 0, 0, 1, 3) in scans  # interleaved DC first at Al=1
    assert (1, 5, 0, 1, 1) in scans  # spectral selection, low band
    assert (6, 63, 0, 1, 1) in scans  # spectral selection, high band
    assert (0, 0, 1, 0, 3) in scans  # DC successive-approximation refine
    assert (1, 63, 1, 0, 1) in scans  # AC refinement scan


def test_progressive_gray_flat_exact():
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    px = np.full((16, 24), 128, np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(px))
    assert got is not None
    w, h, fmt, out = got
    assert (w, h, fmt) == (24, 16, "JPEG")
    np.testing.assert_array_equal(out, px)


def test_progressive_matches_baseline_decode_exactly():
    """Same quantized coefficients reach the same IDCT: the progressive
    multi-scan reconstruction must be pixel-identical to the baseline
    encoding of the same image — any entropy/refinement bug shows up as a
    coefficient (hence pixel) difference."""
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = [
        np.linspace(0, 255, 17 * 23).reshape(17, 23).astype(np.uint8),
        rng.integers(0, 256, (40, 56)).astype(np.uint8),
        rng.integers(0, 256, (24, 40, 3)).astype(np.uint8),
    ]
    # sparse high-frequency content: long zero runs exercise ZRL + EOBn
    sparse = np.zeros((32, 48), np.uint8)
    sparse[::7, ::11] = 255
    cases.append(sparse)
    for px in cases:
        prog = decode_jpeg(encode_jpeg_progressive(px))
        base = decode_jpeg(encode_jpeg(px))
        assert prog is not None and base is not None
        np.testing.assert_array_equal(prog[3], base[3])


def test_progressive_subsampled_odd_dims():
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    px = np.zeros((17, 19, 3), np.uint8)
    px[...] = [100, 150, 50]
    got = decode_jpeg(encode_jpeg_progressive(px, subsample=True))
    assert got is not None
    assert got[3].shape == (17, 19, 3)
    assert np.abs(got[3].astype(int) - px.astype(int)).max() <= 2


def test_progressive_restart_markers():
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg_progressive(px, subsample=True))
    rst = decode_jpeg(
        encode_jpeg_progressive(px, subsample=True, restart_interval=2)
    )
    assert plain is not None and rst is not None
    np.testing.assert_array_equal(plain[3], rst[3])


def test_progressive_dispatch_through_decode_image_numpy():
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    px = np.full((10, 12), 64, np.uint8)
    got = decode_image_numpy(encode_jpeg_progressive(px))
    assert got is not None
    assert got[:3] == (12, 10, "JPEG")


def test_progressive_corrupt_streams_never_raise():
    """decode_jpeg's contract is None-on-failure: byte mutations anywhere
    in a progressive stream (headers, scan scripts, entropy data) must
    never escape as an exception. Deterministic mutation sweep."""
    from iniz_exporters_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    streams = [
        bytearray(encode_jpeg_progressive(px, subsample=True)),
        # the baseline DC path has its own predictor accumulation — a
        # restart-interval stream mutated at the Huffman tables produced
        # an int32 OverflowError the progressive sweep never reached (r9)
        bytearray(encode_jpeg(px, subsample=True, restart_interval=2)),
    ]
    for data in streams:
        assert decode_jpeg(bytes(data)) is not None
        for pos in range(2, len(data), max(1, len(data) // 200)):
            for flip in (0xFF, 0x01, 0x80):
                mutated = bytes(data[:pos]) + bytes(
                    [data[pos] ^ flip]
                ) + bytes(data[pos + 1 :])
                decode_jpeg(mutated)  # must not raise; None/result both fine
        # truncations at every marker-ish boundary
        for cut in range(2, len(data), max(1, len(data) // 100)):
            decode_jpeg(bytes(data[:cut]))


def test_corrupt_sampling_factor_returns_none():
    """Pinned fuzz finding (r9): a SOF sampling factor of 0 must be
    rejected at parse (T.81 B.2.2 allows 1..4), not divide-by-zero in the
    upsampler."""
    good = encode_jpeg(np.full((8, 8, 3), 9, np.uint8), subsample=True)
    i = good.index(b"\xff\xc0")
    # SOF0: marker(2) + length(2), then payload [prec, h:2, w:2, nc,
    # (cid, hv, tq)...] — the first component's H/V byte is payload[7]
    hv_at = i + 4 + 7
    assert good[hv_at] == 0x22  # 4:2:0 luma: hs=2, vs=2
    bad = bytearray(good)
    bad[hv_at] = 0x20  # hs=2, vs=0
    assert decode_jpeg(bytes(bad)) is None
    bad[hv_at] = 0x52  # hs=5: out of spec too
    assert decode_jpeg(bytes(bad)) is None


def test_decode_bomb_rejected_before_allocation():
    """A ~100-byte stream claiming 65535x65535 must return None fast,
    without attempting the multi-GB plane/coefficient allocation."""
    import time

    good = encode_jpeg(np.full((8, 8), 7, np.uint8))
    # SOF0 payload: [precision, h(2), w(2), nc, ...] — rewrite h/w
    i = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[i + 5 : i + 9] = (65535).to_bytes(2, "big") * 2
    t0 = time.perf_counter()
    assert decode_jpeg(bytes(bomb)) is None
    assert time.perf_counter() - t0 < 1.0
    # progressive flavor of the same claim
    bomb[i + 1] = 0xC2
    t0 = time.perf_counter()
    assert decode_jpeg(bytes(bomb)) is None
    assert time.perf_counter() - t0 < 1.0


def test_baseline_and_progressive_share_one_quantize_path():
    """Regression (hypothesis falsifying example, r8): the baseline
    encoder used a per-block matmul FDCT while the progressive encoder
    used a whole-plane einsum — different float contraction order, and a
    DC landing exactly on a .5 quantization boundary rounded differently
    (banker's rounding), so 'progressive == baseline' was off by one
    quant step (uniform ±2 gray block). Both encoders must entropy-code
    the SAME _quantize_blocks output."""
    import numpy as np

    from iniz_exporters_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 1)).astype(np.uint8)
    prog = decode_jpeg(encode_jpeg_progressive(px))
    base = decode_jpeg(encode_jpeg(px))
    np.testing.assert_array_equal(prog[3], base[3])


def test_programming_errors_escape_decode_jpeg(monkeypatch):
    """decode_jpeg swallows only data-shaped errors (ValueError/KeyError/
    IndexError/EOFError). A NameError from an internal helper — the exact
    class of bug that hid the r7 progressive dead code behind a blanket
    ``except Exception`` — must PROPAGATE, not degrade to None."""
    from iniz_exporters_spark.multimodal import jpeg as J

    good = encode_jpeg(np.full((8, 8), 7, np.uint8))
    assert decode_jpeg(good) is not None

    def boom(*a, **k):
        raise NameError("regression: undefined internal helper")

    monkeypatch.setattr(J, "_decode_scan", boom)
    with pytest.raises(NameError):
        J.decode_jpeg(good)

    # TypeError (wrong internal call signature) must escape too
    def boom_type(*a, **k):
        raise TypeError("regression: bad internal call")

    monkeypatch.setattr(J, "_decode_scan", boom_type)
    with pytest.raises(TypeError):
        J.decode_jpeg(good)
