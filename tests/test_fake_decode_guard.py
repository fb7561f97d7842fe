"""Fake-decode honesty guard (VERDICT r5 #8).

When the clean-room baseline-JPEG decoder returns None (progressive /
arithmetic / 12-bit streams) and Pillow is absent, payloads fall through
to the deterministic fake. That fallback must be impossible to mistake
for a real decode in any oracle-checked path:

* ``decode_images`` tags fake rows with ``format = 'FAKE'`` — pinned here
  for a real progressive-JPEG stream.
* The oracle-checked phash queries feed '#'-prefixed payloads
  (``queries._phash_payload``) that can NEVER parse as an image, so their
  fake-path replay is the intended contract, not an accident — pinned by
  asserting the real codec rejects them.
"""

import numpy as np
import pytest

from iniz_exporters_spark.multimodal import jpeg
from iniz_exporters_spark.multimodal.binary import (
    decode_image_numpy,
    decode_images,
)


def _progressive_jpeg_bytes() -> bytes:
    """Minimal stream with JPEG magic and a progressive SOF2 frame header
    — exactly the shape the baseline decoder must refuse."""
    soi = b"\xff\xd8"
    # SOF2 (progressive), len=11, 8-bit, 8x8, 1 component
    sof2 = b"\xff\xc2" + b"\x00\x0b" + b"\x08" + b"\x00\x08\x00\x08" + b"\x01\x01\x11\x00"
    eoi = b"\xff\xd9"
    return soi + sof2 + eoi


def test_baseline_decoder_refuses_progressive():
    assert jpeg.decode_jpeg(_progressive_jpeg_bytes()) is None


def test_progressive_fallback_is_marked_fake(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: fallback would be a real decode")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, bytearray(_progressive_jpeg_bytes()))], "doc_id long, payload binary"
    )
    rows = decode_images(df, "payload", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["format"] == "FAKE", (
        "a non-baseline JPEG that cannot be really decoded must surface "
        "as FAKE, never as plausible real metadata"
    )


def test_phash_payloads_never_reach_real_codec():
    """queries._phash_payload prefixes '#': no real decoder may accept it,
    so the oracle's replay of the FAKE pixel path is provably the only
    path those payloads can take."""
    payload = b"#" + b"some document text" * 3
    assert decode_image_numpy(payload) is None
    assert jpeg.decode_jpeg(payload) is None


def test_real_codec_still_decodes_real_payloads():
    """The guard must not be satisfied vacuously — a genuine PGM payload
    takes the real path and reports its true format."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pgm = b"P5\n8 8\n255\n" + px.tobytes()
    dec = decode_image_numpy(pgm)
    assert dec is not None and dec[0] == 8 and dec[1] == 8
