"""Property-based tests (hypothesis) for the pure-Python kernels: codec
round-trips and the BPE driver trainer vs a brute-force reference. These
run without a SparkSession, so they shrink fast and cover input space the
example tests can't."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iniz_exporters_spark.multimodal.binary import (
    decode_image_numpy,
    decode_wav_numpy,
    encode_ppm,
)
from iniz_exporters_spark.operators.lm import (
    _bpe_learn_driver,
    _merge_word_syms,
)

# ---------------------------------------------------------------------------
# Image codec round-trip
# ---------------------------------------------------------------------------


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_any_shape(w, h, gray, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    dec = decode_image_numpy(encode_ppm(px))
    assert dec is not None
    gw, gh, fmt, got = dec
    assert (gw, gh) == (w, h)
    assert fmt == ("PGM" if gray else "PPM")
    assert np.array_equal(got, px)


@given(data=st.binary(max_size=256))
@settings(max_examples=100, deadline=None)
def test_image_decoder_never_raises_on_garbage(data):
    # arbitrary bytes: either a clean decode or a clean None, never a throw
    dec = decode_image_numpy(data)
    if dec is not None:
        w, h, fmt, px = dec
        assert w > 0 and h > 0


# ---------------------------------------------------------------------------
# WAV codec round-trip
# ---------------------------------------------------------------------------


def _pcm16_wav(samples_i16: np.ndarray, rate: int, ch: int) -> bytes:
    import struct

    body = samples_i16.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 28 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


@given(
    n=st.integers(0, 200),
    rate=st.integers(1, 48000),
    ch=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_pcm16(n, rate, ch, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(-32768, 32768, (n, ch), dtype=np.int64)
    dec = decode_wav_numpy(_pcm16_wav(frames.reshape(-1), rate, ch))
    assert dec is not None
    got_rate, got_ch, x = dec
    assert (got_rate, got_ch, len(x)) == (rate, ch, n)
    want = frames.astype(np.float64).mean(axis=1) / 32768.0
    assert np.allclose(x, want, atol=0)


@given(data=st.binary(max_size=256))
@settings(max_examples=100, deadline=None)
def test_wav_decoder_never_raises_on_garbage(data):
    dec = decode_wav_numpy(data)
    if dec is not None:
        rate, ch, x = dec
        assert rate >= 1 and ch >= 1


# ---------------------------------------------------------------------------
# BPE driver trainer vs brute-force recount reference
# ---------------------------------------------------------------------------


def _bpe_reference(rows, k):
    """Recount-from-scratch reference: the distributed loop's semantics in
    plain Python (pair counts over the whole vocab each round, pick by
    (cnt desc, a asc, b asc), exhaustive left-to-right apply)."""
    words = [(list(w), f) for w, f in rows]
    merges = []
    for _ in range(k):
        cnt = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        a, b = min(cnt, key=lambda p: (-cnt[p], p[0], p[1]))
        merges.append((a, b))
        words = [(_merge_word_syms(s, a, b), f) for s, f in words]
    return merges


@given(
    vocab=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=8),
            st.integers(1, 9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 12),
)
@settings(max_examples=200, deadline=None)
def test_bpe_incremental_matches_recount_reference(vocab, k):
    assert _bpe_learn_driver(list(vocab), k) == _bpe_reference(vocab, k)


# ---------------------------------------------------------------------------
# Round-5 codec properties (PNG lossless, JPEG flat-field exactness)
# ---------------------------------------------------------------------------


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_lossless_property(h, w, ch, seed):
    """PNG is lossless: encode->decode must return the exact array for
    every shape and color type."""
    import numpy as np

    from iniz_exporters_spark.multimodal.binary import (
        decode_image_numpy,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_image_numpy(encode_png(px))
    assert got is not None
    gw, gh, fmt, out = got
    assert (gw, gh, fmt) == (w, h, "PNG")
    np.testing.assert_array_equal(out, px)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    val=st.integers(0, 255),
    color=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_flat_field_near_exact_property(h, w, val, color):
    """A flat field is pure DC energy: baseline JPEG round-trip must
    reconstruct it within +/-1 (DC quantizer step 16 with exact-integer
    level shift; chroma rounding can move one LSB)."""
    import numpy as np

    from iniz_exporters_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    shape = (h, w, 3) if color else (h, w)
    px = np.full(shape, val, np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got is not None
    gw, gh, fmt, out = got
    assert (gw, gh) == (w, h)
    assert np.abs(out.astype(int) - int(val)).max() <= 1


@given(data=st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_jpeg_decoder_never_crashes_on_garbage(data):
    """Arbitrary bytes (with or without an SOI prefix) must decode to
    None or a valid array — never raise."""
    from iniz_exporters_spark.multimodal.jpeg import decode_jpeg

    for payload in (data, b"\xff\xd8" + data):
        got = decode_jpeg(payload)
        assert got is None or len(got) == 4


# ---------------------------------------------------------------------------
# Progressive JPEG property: for ANY image, the multi-scan progressive
# reconstruction must be pixel-identical to the baseline encoding of the
# same image (both paths quantize to the same coefficients; only the
# entropy layout differs). Hypothesis shrinks entropy-layer bugs (EOB-run,
# ZRL, correction-bit) down to minimal images.
# ---------------------------------------------------------------------------


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    gray=st.booleans(),
    subsample=st.booleans(),
    rst=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_progressive_always_matches_baseline_decode(
    w, h, gray, subsample, rst, seed
):
    from iniz_exporters_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, shape).astype(np.uint8)
    sub = subsample and not gray
    prog = decode_jpeg(encode_jpeg_progressive(px, subsample=sub,
                                               restart_interval=rst))
    base = decode_jpeg(encode_jpeg(px, subsample=sub, restart_interval=rst))
    assert prog is not None and base is not None
    np.testing.assert_array_equal(prog[3], base[3])
