"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Design (SURVEY §7 phase 5): media payloads travel as ``BinaryType`` columns
with a sibling metadata struct; per-item decode/feature work runs in
``mapInPandas`` so each Arrow batch crosses the JVM↔Python boundary once
(never row-at-a-time pickling). Partitioning guidance at 100 TB: media rows
are large — size ``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) so
a partition's batch of decoded frames fits executor memory, and keep the
metadata-only projections (which Catalyst prunes to, because the decode is
isolated in its own select) on the fast path.

The actual codec work (Pillow/ffmpeg/torchaudio) is NOT available in this
container, so ``decode_images``/``extract_frames`` run a clearly-marked
deterministic fake when the libraries are missing — the Spark-side plumbing
(schema, batch iteration, UDF signature) is real and tested either way.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iniz_exporters_spark.session import spread_for_kernel
from iniz_exporters_spark.pinning import pin

IMAGE_META_SCHEMA = (
    "width int, height int, format string, byte_len long, checksum bigint"
)


def binary_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Cheap JVM-side metadata: byte length + polynomial checksum of the
    first 64 bytes (no Python at all — stays in codegen)."""
    b = F.col(binary_col)
    # Fold over the ACTUAL bytes: hex() the 64-byte prefix and parse two hex
    # chars per byte with conv(). Casting binary→string would UTF-8-decode
    # the payload (invalid bytes → U+FFFD, multi-byte sequences collapse) and
    # diverge from decode_images' Python byte checksum on real media.
    head = F.expr(
        f"CASE WHEN octet_length({binary_col}) = 0 THEN 0L ELSE "
        f"aggregate(transform(sequence(1, least(octet_length({binary_col}), 64)),"
        f" i -> cast(conv(substring(hex(substring({binary_col}, 1, 64)),"
        " 2*i - 1, 2), 16, 10) as int)),"
        " 0L, (acc, c) -> (acc * 31 + c) % 1000000007) END"
    )
    return df.withColumn("byte_len", F.octet_length(b)).withColumn(
        "bin_checksum", head
    )


# Data-shaped decode failures from the optional codec libs: Pillow raises
# UnidentifiedImageError (an OSError), plain OSError, ValueError,
# SyntaxError ("not a PNG file"), struct.error and EOFError on hostile or
# truncated payloads; PyAV's FFmpegError derives from OSError in the
# versions this code targets. Programming errors (NameError, TypeError,
# AttributeError) must PROPAGATE — a blanket ``except Exception`` around
# these never-executed-in-CI branches is exactly the mechanism that hid a
# dead decode path for a full round (see multimodal/jpeg.py r7/r9 notes).
import struct as _struct

CODEC_DATA_ERRORS = (
    OSError,
    ValueError,
    SyntaxError,
    KeyError,
    IndexError,
    EOFError,
    _struct.error,
)
try:
    # Pillow's DecompressionBombError subclasses Exception DIRECTLY (not
    # OSError): a hostile oversized image is data-shaped and must degrade
    # to the FAKE row, not abort the job. Appended only when PIL exists.
    from PIL.Image import DecompressionBombError as _PilBombError

    CODEC_DATA_ERRORS = CODEC_DATA_ERRORS + (_PilBombError,)
except ImportError:
    pass


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reverse PNG per-scanline filtering (types 0-4, RFC 2083 §6).

    Sub is a per-channel-lane prefix sum mod 256 (vectorized); None/Up are
    pure numpy; Average and Paeth carry a left-pixel dependency so they
    fall back to a per-byte loop — fine for the test/utility scale this
    stdlib path serves (production images with heavy Paeth filtering
    should go through the Pillow branch).
    """
    import numpy as np

    stride = w * ch
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-ch]
            rec = (
                row.reshape(w, ch).cumsum(0, dtype=np.uint64) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = ((row + prev) % 256).astype(np.uint8)
        elif f in (3, 4):  # Average / Paeth: sequential left dependency
            rec = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if f == 3:
                    rec[i] = (row[i] + (a + b) // 2) % 256
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                    rec[i] = (row[i] + pred) % 256
        else:
            return None
        out[y] = rec
        prev = rec.astype(np.uint16)
    return out


def _decode_png(data: bytes):
    """Pure-stdlib PNG decoder: 8-bit non-interlaced grayscale / RGB /
    RGBA (color types 0, 2, 6). DEFLATE via ``zlib``; chunk walk and
    scanline unfiltering per the public PNG spec (RFC 2083). Returns
    ``(w, h, "PNG", pixels)`` or None for any other PNG flavor (caller
    falls through to Pillow / the marked fake)."""
    import zlib

    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        if pos + 12 + ln > len(data):
            return None
        if typ == b"IHDR":
            ihdr = data[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    if ctype not in (0, 2, 6) or w <= 0 or h <= 0:
        return None
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    if len(raw) != h * (1 + w * ch):
        return None
    px = _png_unfilter(raw, h, w, ch)
    if px is None:
        return None
    return w, h, "PNG", px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)


def encode_png(px) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) for uint8 gray/RGB/RGBA
    arrays — the round-trip partner of ``_decode_png``."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(px, np.uint8)
    if a.ndim == 2:
        h, w, ch, ctype = a.shape[0], a.shape[1], 1, 0
    else:
        h, w, ch = a.shape
        ctype = {1: 0, 3: 2, 4: 6}[ch]
    body = b"".join(
        b"\x00" + a.reshape(h, w * ch)[y].tobytes() for y in range(h)
    )

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def decode_image_numpy(data: bytes):
    """Dependency-free REAL decoder for four public image formats —
    binary PPM (``P6``), binary PGM (``P5``), uncompressed 24-bit BMP
    (``BITMAPINFOHEADER``, BI_RGB), and 8-bit non-interlaced PNG
    (gray/RGB/RGBA, DEFLATE via the Python stdlib ``zlib``) — so the
    real-codec branch executes even without Pillow in the environment.

    Returns ``(width, height, fmt, pixels)`` where ``pixels`` is an
    ``(h, w, 3)`` uint8 RGB array (P6/BMP), ``(h, w, 3|4)`` for PNG
    color types 2/6, or ``(h, w)`` grayscale (P5 / PNG type 0), or
    ``None`` when ``data`` is not one of these formats (caller falls
    through to Pillow / the marked fake). Format specs: Netpbm (public
    domain), Windows BMP v3, PNG RFC 2083 — all public.
    """
    import numpy as np

    if len(data) >= 8 and data[:8] == _PNG_SIG:
        return _decode_png(data)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        from iniz_exporters_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(data)
    if len(data) < 2:
        return None
    magic = data[:2]
    if magic in (b"P5", b"P6"):
        # Netpbm header: magic, width, height, maxval as whitespace-
        # separated ASCII tokens; '#' comments run to end-of-line; exactly
        # one whitespace byte separates the maxval from the raster.
        pos, tokens = 2, []
        while len(tokens) < 3 and pos < len(data):
            c = data[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = data.find(b"\n", pos)
                if nl < 0:
                    return None
                pos = nl + 1
            else:
                end = pos
                while end < len(data) and not data[end : end + 1].isspace():
                    end += 1
                tokens.append(data[pos:end])
                pos = end
        if len(tokens) < 3:
            return None
        try:
            w, h, maxval = (int(t) for t in tokens)
        except ValueError:
            return None
        if w <= 0 or h <= 0 or not 0 < maxval < 256:
            return None
        pos += 1  # the single whitespace byte after maxval
        ch = 3 if magic == b"P6" else 1
        if len(data) - pos < w * h * ch:
            return None  # truncated raster
        raster = np.frombuffer(data, np.uint8, count=w * h * ch, offset=pos)
        if ch == 1:
            return w, h, "PGM", raster.reshape(h, w)
        return w, h, "PPM", raster.reshape(h, w, 3)
    if magic == b"BM" and len(data) >= 54:
        off = int.from_bytes(data[10:14], "little")
        hdr = int.from_bytes(data[14:18], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if hdr < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None  # only uncompressed 24-bit BI_RGB
        bottom_up, ah = h > 0, abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        if off + stride * ah > len(data):
            return None
        rows = np.frombuffer(
            data, np.uint8, count=stride * ah, offset=off
        ).reshape(ah, stride)
        px = rows[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]  # BGR → RGB
        if bottom_up:
            px = px[::-1]
        return w, ah, "BMP", np.ascontiguousarray(px)
    return None


def encode_ppm(px) -> bytes:
    """Binary PPM (P6) / PGM (P5) encoder for uint8 pixel arrays —
    the round-trip partner of ``decode_image_numpy``."""
    import numpy as np

    a = np.asarray(px, np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _gray_f64(px):
    """ITU-R BT.601 integer luma for RGB arrays; identity for grayscale."""
    import numpy as np

    a = np.asarray(px, np.int64)
    if a.ndim == 2:
        return a.astype(np.float64)
    return (
        (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    ).astype(np.float64)


def _block_mean(gray, gh: int, gw: int):
    """Area-average a 2-D array down to (gh, gw) — the resize used by the
    real phash path (deterministic, library-free)."""
    import numpy as np

    h, w = gray.shape
    ys = (np.arange(gh + 1) * h) // gh
    xs = (np.arange(gw + 1) * w) // gw
    col = np.add.reduceat(gray, ys[:-1], axis=0)
    cell = np.add.reduceat(col, xs[:-1], axis=1)
    area = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return cell / area


def _resize_nearest(px, width: int, height: int):
    """Nearest-neighbor resample (center-of-pixel mapping)."""
    import numpy as np

    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height), h - 1).astype(
        np.int64
    )
    xs = np.minimum(((np.arange(width) + 0.5) * w / width), w - 1).astype(
        np.int64
    )
    return px[ys][:, xs]


def decode_images(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """(id, width, height, format, byte_len, checksum) via mapInPandas.

    Decode order: the dependency-free real codec (PPM/PGM/BMP,
    ``decode_image_numpy``) first — so those formats decode identically in
    every environment — then Pillow for everything else if installed, then
    a deterministic fake that derives plausible metadata from the byte
    content (clearly marked — do NOT ship the fake to production).
    """
    pil = _try_import_pil()

    def batches(it: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in it:
            ids, ws, hs, fmts, lens, sums = [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                ids.append(i)
                lens.append(len(data))
                csum = 0
                for b in data[:64]:
                    csum = (csum * 31 + b) % 1_000_000_007
                sums.append(csum)
                dec = decode_image_numpy(data) if data else None
                if dec is not None:
                    w, h, fmt, _ = dec
                    ws.append(w)
                    hs.append(h)
                    fmts.append(fmt)
                    continue
                if pil is not None and data:
                    # Only the codec calls sit inside the guard (ADVICE r9):
                    # a repo-side append/lookup bug must propagate, not
                    # degrade to the FAKE row. width/height/format accessors
                    # stay guarded — Pillow parses headers lazily.
                    meta = None
                    try:
                        img = pil.open(io.BytesIO(data))
                        meta = (img.width, img.height, img.format or "UNKNOWN")
                    except CODEC_DATA_ERRORS:
                        meta = None
                    if meta is not None:
                        ws.append(meta[0])
                        hs.append(meta[1])
                        fmts.append(meta[2])
                        continue
                # DETERMINISTIC FAKE (no codec libs in this environment):
                # metadata derived from byte stats so tests are stable.
                ws.append((csum % 64) + 1)
                hs.append((csum % 48) + 1)
                fmts.append("FAKE")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "format": fmts,
                    "byte_len": lens,
                    "checksum": sums,
                }
            )

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches, schema=f"{id_col} long, {IMAGE_META_SCHEMA}"
    )


def _try_import_av():
    try:
        import av  # noqa: F401

        return av
    except ImportError:
        return None


def extract_frames(
    df: DataFrame, binary_col: str, id_col: str, every_n: int = 10
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame,
    ``(id, frame_idx, frame binary)``, via mapInPandas (row-expanding — a
    single Arrow input batch may yield many frame rows).

    With PyAV/ffmpeg bindings present the real demux/decode path samples
    every ``every_n``-th frame and re-encodes it. Without them (this
    container) a DETERMINISTIC FAKE treats the payload as a stream of
    fixed-size 16-byte "frames" and samples every ``every_n``-th one, so
    the row-expansion shape, frame indexing, and binary output column are
    exercised with stable inputs — do NOT ship the fake to production.

    100-TB note: frame extraction multiplies row count and payload bytes;
    run it AFTER metadata-level filtering and with
    ``spark.sql.files.maxPartitionBytes`` sized down so a partition's
    decoded frames fit executor memory (see module docstring).
    """
    av = _try_import_av()
    FAKE_FRAME_BYTES = 16

    def batches(it: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                if av is not None and data:
                    # Decode into a LOCAL buffer so (a) only codec calls are
                    # guarded (ADVICE r9 — repo-side bugs must propagate) and
                    # (b) a mid-stream decode error discards the partial
                    # frame list instead of emitting it alongside the fake.
                    decoded = None
                    try:
                        with av.open(io.BytesIO(data)) as container:
                            decoded = []
                            for n, frame in enumerate(container.decode(video=0)):
                                if n % every_n:
                                    continue
                                buf = io.BytesIO()
                                frame.to_image().save(buf, format="PNG")
                                decoded.append((n, buf.getvalue()))
                    except CODEC_DATA_ERRORS:
                        decoded = None  # fall through: deterministic fake
                    if decoded is not None:
                        for n, frame_bytes in decoded:
                            ids.append(i)
                            idxs.append(n)
                            frames.append(frame_bytes)
                        continue
                # DETERMINISTIC FAKE (no ffmpeg bindings in this
                # environment): fixed-size byte windows stand in for frames.
                n_frames = (len(data) + FAKE_FRAME_BYTES - 1) // FAKE_FRAME_BYTES
                for n in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(n)
                    frames.append(
                        data[n * FAKE_FRAME_BYTES:(n + 1) * FAKE_FRAME_BYTES]
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """(id, resized binary, width, height) via mapInPandas.

    PPM/PGM/BMP payloads take the dependency-free real path: numpy decode,
    nearest-neighbor resample, P6/P5 re-encode (``decode_image_numpy`` /
    ``encode_ppm``). Other formats re-encode via Pillow when present;
    otherwise the deterministic fake passes the payload through and tags
    the target dims — the Arrow batch shape, output schema, and partition
    behavior are identical either way, which is what the pipeline plumbing
    tests pin down.
    """
    pil = _try_import_pil()

    def batches(it: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                dec = decode_image_numpy(data) if data else None
                if dec is not None:
                    data = encode_ppm(_resize_nearest(dec[3], width, height))
                elif pil is not None and data:
                    try:
                        img = pil.open(io.BytesIO(data)).resize((width, height))
                        buf = io.BytesIO()
                        img.save(buf, format=img.format or "PNG")
                        data = buf.getvalue()
                    except CODEC_DATA_ERRORS:
                        pass  # fall through: pass-through fake
                ids.append(i)
                payloads.append(data)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches, schema=f"{id_col} long, resized binary, width int, height int"
    )


PHASH_GRID = 8  # 8×8 grayscale → 64-bit aHash, emitted as 4×16-bit bands


def image_phash(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image payload:
    ``(id, b0..b3, phash)`` — 64 bits as four 16-bit bands plus the hex
    string. Bit p is 1 iff grayscale pixel p exceeds the image mean; the
    compare is integer-exact (``64·pixel > sum``) so no float reaches a bit
    decision on either path.

    Real-pixel path: PPM/PGM/BMP payloads decode via the dependency-free
    numpy codec (``decode_image_numpy``) — BT.601 integer luma, area-mean
    downsample to the ``PHASH_GRID``² grid — in ANY environment; other
    formats decode via Pillow when present (grayscale ``convert('L')``,
    resize). Payloads that are neither take the DETERMINISTIC FAKE: pixel
    p = byte (p mod n) of the payload — SQL-replayable, so the whole hash
    is oracle-checkable; do NOT ship the fake to production. (The registry
    queries feeding synthetic text payloads prefix them with '#' so they
    provably never parse as an image — see queries._phash_payload.)

    The banded layout is the LSH handle: two images within Hamming
    distance 3 must share a band (pigeonhole over 4 bands), which is what
    ``phash_neardup`` buckets on — same shape as MinHash-LSH band-joins.
    """
    pil = _try_import_pil()

    def batches(it: Iterator) -> Iterator:
        import io

        import numpy as np
        import pandas as pd

        g2 = PHASH_GRID * PHASH_GRID
        for pdf in it:
            ids, b0, b1, b2, b3, hexes = [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                if not data:
                    continue
                px = None
                dec = decode_image_numpy(data)
                if dec is not None:
                    px = _block_mean(
                        _gray_f64(dec[3]), PHASH_GRID, PHASH_GRID
                    ).ravel()
                elif pil is not None:
                    try:
                        img = (
                            pil.open(io.BytesIO(data))
                            .convert("L")
                            .resize((PHASH_GRID, PHASH_GRID))
                        )
                        px = np.asarray(img, dtype=np.int64).ravel()
                    except CODEC_DATA_ERRORS:
                        px = None
                if px is None:
                    # DETERMINISTIC FAKE (no codec libs): repeat the payload
                    # bytes to fill the grid.
                    arr = np.frombuffer(data, np.uint8).astype(np.int64)
                    px = arr[np.arange(g2) % len(arr)]
                # px is int64 on the fake/PIL paths, float64 block means on
                # the numpy real path; the compare is deterministic either
                # way (no rounding applied before the bit decision).
                total = px.sum()
                bits = (g2 * px > total).astype(np.int64)
                bs = [
                    int((bits[16 * j:16 * j + 16] << np.arange(16)).sum())
                    for j in range(4)
                ]
                ids.append(i)
                b0.append(bs[0])
                b1.append(bs[1])
                b2.append(bs[2])
                b3.append(bs[3])
                hexes.append("%04x%04x%04x%04x" % tuple(bs))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "b0": b0,
                    "b1": b1,
                    "b2": b2,
                    "b3": b3,
                    "phash": hexes,
                }
            )

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches,
        schema=f"{id_col} long, b0 int, b1 int, b2 int, b3 int, phash string",
    )


def phash_neardup(
    hashes: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image pairs from an ``image_phash`` frame:
    ``(id_a < id_b, hamming)`` with popcount Hamming distance ≤
    ``max_hamming``, candidates restricted to pairs sharing at least one
    16-bit band (banded LSH, exactly the MinHash-LSH shape in
    operators/dedup.py).

    Recall contract: ``max_hamming`` ≤ 3 is EXACT by pigeonhole (≤ 3
    differing bits cannot touch all 4 bands); larger radii are best-effort
    like any LSH. Scale shape: only (id, band_idx, band_value, 4 band ints)
    rows shuffle — never payloads; each band-value bucket joins within
    itself, and the verify step is a codegen'd popcount, not Python.
    """
    # Pin the fingerprint frame before the band self-join: both join sides
    # read it, and without the pin the upstream hashing kernel (a full
    # payload decode for image/audio callers) is evaluated once PER SIDE —
    # the multi-consumer double-evaluation the p01/p03 localCheckpoint
    # convention exists for. Lazy (eager=False): materializes on first use
    # inside the caller's own job, no extra construction-time job.
    hashes = hashes.transform(pin)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.col(f"b{j}").alias("v")
            )
            for j in range(4)
        ]
    )
    exploded = hashes.select(
        F.col(id_col).alias("id"),
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(bands).alias("band"),
    ).select(
        "id", "b0", "b1", "b2", "b3",
        F.col("band.j").alias("j"), F.col("band.v").alias("v"),
    )
    left = exploded.select(
        F.col("id").alias("id_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
        "j", "v",
    )
    right = exploded.select(
        F.col("id").alias("id_b"),
        *[F.col(f"b{j}").alias(f"c{j}") for j in range(4)],
        "j", "v",
    )
    cand = (
        left.join(right, ["j", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("j", "v")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}")))
        for j in range(4)
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


AUDIO_FEATURE_DIM = 8


def decode_wav_numpy(data: bytes):
    """Dependency-free REAL decoder for RIFF/WAVE PCM audio (the public
    Microsoft/IBM WAVE spec): linear PCM, 8-bit unsigned or 16-bit signed
    little-endian, any channel count.

    Returns ``(sample_rate, n_channels, samples)`` where ``samples`` is a
    float64 array of channel-averaged samples normalized to [-1, 1], or
    ``None`` when ``data`` is not a PCM WAV this decoder handles (caller
    falls through to the marked fake). Chunk-walks the RIFF container, so
    extra chunks (LIST, fact, ...) between fmt and data are fine.
    """
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = (
                int.from_bytes(body[0:2], "little"),  # audio format
                int.from_bytes(body[2:4], "little"),  # channels
                int.from_bytes(body[4:8], "little"),  # sample rate
                int.from_bytes(body[14:16], "little"),  # bits per sample
            )
        elif cid == b"data":
            if fmt is None:
                return None
            afmt, ch, rate, bits = fmt
            if afmt != 1 or ch < 1 or rate < 1 or bits not in (8, 16):
                return None
            if bits == 16:
                n = len(body) // (2 * ch) * ch
                if n == 0:
                    return rate, ch, np.zeros(0)
                raw = np.frombuffer(body, "<i2", count=n).astype(np.float64)
                x = raw.reshape(-1, ch).mean(axis=1) / 32768.0
            else:
                n = len(body) // ch * ch
                if n == 0:
                    return rate, ch, np.zeros(0)
                raw = np.frombuffer(body, np.uint8, count=n).astype(np.float64)
                x = (raw.reshape(-1, ch).mean(axis=1) - 128.0) / 128.0
            return rate, ch, x
        pos += 8 + csz + (csz & 1)  # RIFF chunks pad to even offsets
    return None


def _wav_feature_vector(rate: int, ch: int, x) -> list:
    """8-dim signal descriptor from real samples: duration, rate, channels,
    RMS, mean |x|, peak |x|, zero-crossing rate, high-band energy ratio
    (first-difference energy over signal energy — a library-free spectral
    tilt proxy). Deterministic float64 math."""
    import numpy as np

    n = len(x)
    if n == 0:
        return [0.0, float(rate), float(ch), 0.0, 0.0, 0.0, 0.0, 0.0]
    energy = float(np.sum(x * x))
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    diff = np.diff(x)
    return [
        n / rate,
        float(rate),
        float(ch),
        math.sqrt(energy / n),
        float(np.mean(np.abs(x))),
        float(np.max(np.abs(x))),
        zc / n,
        float(np.sum(diff * diff)) / energy if energy > 0 else 0.0,
    ]


def audio_features(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """(id, features array<double>) — fixed-dim feature vector per audio
    payload via mapInPandas.

    Decode order mirrors ``decode_images``: the dependency-free real codec
    first (RIFF/WAVE PCM, ``decode_wav_numpy`` — real signal features from
    real samples), then for everything else a DETERMINISTIC FAKE that
    derives an 8-dim vector from byte-window means so downstream
    similarity/dedup operators (which only see an ``array<double>``
    column) are exercised with stable inputs (clearly marked — do NOT
    ship the fake to production; swap in torchaudio/librosa for
    compressed formats).
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                ids.append(i)
                dec = decode_wav_numpy(raw)
                if dec is not None:
                    feats.append(_wav_feature_vector(*dec))
                    continue
                # DETERMINISTIC FAKE (no codec libs in this environment)
                data = np.frombuffer(raw, np.uint8)
                if len(data) == 0:
                    feats.append([0.0] * AUDIO_FEATURE_DIM)
                else:
                    chunks = np.array_split(
                        data.astype(np.float64), AUDIO_FEATURE_DIM
                    )
                    feats.append(
                        [float(c.mean()) if len(c) else 0.0 for c in chunks]
                    )
            yield pd.DataFrame({id_col: ids, "features": feats})

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches, schema=f"{id_col} long, features array<double>"
    )


def encode_wav_pcm8(data: bytes, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: 8-bit unsigned mono linear PCM at
    ``rate`` Hz with ``data`` as the raw sample bytes (the public
    Microsoft/IBM WAVE container spec — the exact format
    ``decode_wav_numpy`` round-trips). Used to synthesize deterministic
    audio payloads from text bytes so the REAL decode path is exercised
    end-to-end without codec libraries."""
    import struct

    n = len(data)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", n) + data + (b"\x00" if n & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


#: audio_fingerprint geometry: 64 energy windows x 4 samples = 256
#: virtual samples (cyclic extension of the decoded signal), packed into
#: four 16-bit bands so the fingerprint frame is drop-in compatible with
#: ``phash_neardup``'s banded-LSH join.
AUDIO_FP_WINDOWS = 64
AUDIO_FP_SPW = 4


def audio_fingerprint(
    df: DataFrame, binary_col: str, id_col: str
) -> DataFrame:
    """(id, b0..b3) — 64-bit band-energy audio fingerprint per payload
    via mapInPandas (the Haitsma–Kalker / Shazam-family shape: coarse
    spectral/temporal energy pattern -> robust hash -> banded LSH).

    Bit w is set when window w's energy exceeds the mean window energy
    (64 * e_w > total, integer-exact under 8-bit PCM since every sample
    is a dyadic rational k/128). Windows cover 256 VIRTUAL samples — the
    decoded signal cyclically extended (sample q = x[q mod n]) — so
    short payloads still produce a full-width fingerprint, mirroring
    ``image_phash``'s pixel sampling. Decode order mirrors
    ``audio_features``: the REAL RIFF/WAVE codec first, then a
    deterministic fake (raw bytes as 8-bit PCM samples) for anything
    else. Empty payloads yield an all-zero fingerprint.
    """
    nv = AUDIO_FP_WINDOWS * AUDIO_FP_SPW

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        idx = np.arange(nv)

        def fp(x) -> list:
            n = len(x)
            if n == 0:
                return [0, 0, 0, 0]
            s = x[idx % n]
            e = (s.reshape(AUDIO_FP_WINDOWS, AUDIO_FP_SPW) ** 2).sum(axis=1)
            bits = AUDIO_FP_WINDOWS * e > e.sum()
            out = []
            for j in range(4):
                v = 0
                for k in range(16):
                    if bits[16 * j + k]:
                        v |= 1 << k
                out.append(v)
            return out

        for pdf in it:
            ids, b0, b1, b2, b3 = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                dec = decode_wav_numpy(raw)
                if dec is not None:
                    x = dec[2]
                else:
                    # DETERMINISTIC FAKE (mirrors audio_features): raw
                    # bytes as 8-bit unsigned PCM samples
                    x = (
                        np.frombuffer(raw, np.uint8).astype(np.float64)
                        - 128.0
                    ) / 128.0
                v = fp(x)
                ids.append(i)
                b0.append(v[0])
                b1.append(v[1])
                b2.append(v[2])
                b3.append(v[3])
            yield pd.DataFrame(
                {id_col: ids, "b0": b0, "b1": b1, "b2": b2, "b3": b3}
            )

    return spread_for_kernel(df.select(id_col, binary_col)).mapInPandas(
        batches, schema=f"{id_col} long, b0 int, b1 int, b2 int, b3 int"
    )
