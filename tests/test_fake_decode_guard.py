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


def test_pil_data_errors_fall_back_to_fake(spark, monkeypatch):
    """A PIL decode failure on hostile bytes degrades to the marked FAKE
    row — same contract as the no-PIL environment. The fake PIL classes
    are defined inside the tests so cloudpickle ships them by value (the
    test module is not importable on executors)."""
    from iniz_exporters_spark.multimodal import binary as B

    class _FakePilDataError:
        @staticmethod
        def open(fp):
            raise OSError("cannot identify image file")

    monkeypatch.setattr(B, "_try_import_pil", lambda: _FakePilDataError)
    df = spark.createDataFrame(
        [(1, bytearray(_progressive_jpeg_bytes()))],
        "doc_id long, payload binary",
    )
    rows = B.decode_images(df, "payload", "doc_id").collect()
    assert len(rows) == 1 and rows[0]["format"] == "FAKE"


def test_pil_programming_errors_escape_decode_kernel(spark, monkeypatch):
    """A NameError inside the PIL branch must FAIL the job loudly (it
    surfaces wrapped in Spark's PythonException), never degrade to FAKE —
    the r7 dead-code mechanism, pinned shut for binary.py's codec
    branches like it already is for decode_jpeg."""
    from iniz_exporters_spark.multimodal import binary as B

    class _FakePilCodeBug:
        @staticmethod
        def open(fp):
            raise NameError(
                "regression: undefined helper inside decode branch"
            )

    monkeypatch.setattr(B, "_try_import_pil", lambda: _FakePilCodeBug)
    df = spark.createDataFrame(
        [(1, bytearray(_progressive_jpeg_bytes()))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception) as exc:
        B.decode_images(df, "payload", "doc_id").collect()
    assert "NameError" in str(exc.value)


def test_binary_module_has_no_blanket_except():
    """Source lint: every codec fallback in multimodal/binary.py catches
    CODEC_DATA_ERRORS, never bare ``except Exception:`` — all four decode
    branches (images, frames, resize, phash) share the pinned tuple."""
    import iniz_exporters_spark.multimodal.binary as B

    src = open(B.__file__.replace(".pyc", ".py")).read()
    assert "except Exception:" not in src
    assert src.count("except CODEC_DATA_ERRORS:") >= 4


def test_codec_guards_mutate_only_local_state():
    """Source lint (VERDICT r10 #2 companion to the blanket-except ban):
    inside any ``try`` whose handler catches ``CODEC_DATA_ERRORS``, the
    only statements allowed are codec calls and their local result
    bindings — mutating an accumulator that outlives the guard
    (``ids.append(...)``, ``frames.extend(...)``) is exactly the r10
    failure mode where a mid-stream decode error emitted partial rows
    beside the deterministic fake. CODEC_DATA_ERRORS deliberately keeps
    KeyError/IndexError, so this pin is what stops repo-side code from
    drifting back inside the guard."""
    import ast

    import iniz_exporters_spark.multimodal.binary as B

    tree = ast.parse(open(B.__file__.replace(".pyc", ".py")).read())
    MUTATORS = {"append", "extend", "insert", "update", "add"}

    def catches_codec_errors(handler):
        t = handler.type
        return isinstance(t, ast.Name) and t.id == "CODEC_DATA_ERRORS"

    violations = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Try):
            continue
        if not any(catches_codec_errors(h) for h in node.handlers):
            continue
        local = set()
        for st in ast.walk(ast.Module(body=node.body, type_ignores=[])):
            if isinstance(st, ast.Assign):
                for tgt in st.targets:
                    for n in ast.walk(tgt):
                        if isinstance(n, ast.Name):
                            local.add(n.id)
            elif isinstance(st, (ast.For, ast.withitem)):
                tgt = (
                    st.target
                    if isinstance(st, ast.For)
                    else st.optional_vars
                )
                if tgt is not None:
                    for n in ast.walk(tgt):
                        if isinstance(n, ast.Name):
                            local.add(n.id)
        for st in ast.walk(ast.Module(body=node.body, type_ignores=[])):
            if (
                isinstance(st, ast.Call)
                and isinstance(st.func, ast.Attribute)
                and st.func.attr in MUTATORS
                and isinstance(st.func.value, ast.Name)
                and st.func.value.id not in local
            ):
                violations.append(
                    f"line {st.lineno}: {st.func.value.id}."
                    f"{st.func.attr}(...) mutates non-guard-local state "
                    "inside a CODEC_DATA_ERRORS try block"
                )
    assert violations == [], (
        "repo-side accumulator mutation drifted back inside a codec "
        f"guard: {violations}"
    )
