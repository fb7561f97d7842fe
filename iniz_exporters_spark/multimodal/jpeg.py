"""Dependency-free baseline + progressive JPEG codec (numpy only).

Clean-room implementation from the public ITU-T T.81 spec + JFIF notes:
baseline sequential DCT (SOF0) and progressive DCT (SOF2 — spectral
selection AND successive approximation, per T.81 Annex G), 8-bit
precision, grayscale or YCbCr, arbitrary sampling factors up to 2x2,
restart markers. Arithmetic-coded, 12-bit and hierarchical modes return
``None`` (the caller falls through to Pillow or the marked fake). The
matching minimal encoders (baseline and progressive) exist so tests can
round-trip real compressed payloads without any imaging library in the
container.

Used by ``multimodal.binary.decode_image_numpy`` for payloads starting
with the SOI marker. Like the PNG path, this serves the in-container
real-codec branch; production piles of photographic JPEG should still
prefer the Pillow branch when that library is present (its SIMD decode
is faster and implements fancy upsampling).
"""

from __future__ import annotations

import numpy as np

# Zig-zag scan order (T.81 figure A.6 — public spec constant).
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Example quantization tables, T.81 Annex K.1 (public spec constants).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Typical Huffman tables, T.81 Annex K.3 (public spec constants):
# (BITS counts per code length 1..16, HUFFVAL symbol list).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis C with C[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    FDCT(f) = C @ f @ C.T, IDCT(F) = C.T @ F @ C."""
    C = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            C[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_matrix()

# Largest pixel count decode will allocate for (≈100 MP — beyond any sane
# training-corpus image; a corrupt SOF claiming more is rejected before the
# plane/coefficient stores are allocated).
MAX_DECODE_PIXELS = 100_000_000


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol map from a T.81 (BITS, HUFFVAL) spec."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) map for the encoder."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at (and reports) RST/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False  # real marker: stop feeding bits
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError("entropy stream exhausted")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self) -> None:
        """Byte-align and consume an expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if (
            self.marker is None
            and self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.marker = self.data[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # consume FF Dn
            self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value.

    For 8-bit precision the magnitude category is at most 11 (T.81 F.1.2.1
    for DC, F.1.2.2 gives AC ≤ 10); a corrupt Huffman table can otherwise
    hand back a symbol that reads an absurd bit count and overflows the
    int32 coefficient store downstream (fuzz-found OverflowError)."""
    if t == 0:
        return 0
    if t > 11:
        raise ValueError("magnitude category out of range")
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# Data-shaped failures only: malformed/truncated/hostile bytes surface as
# these from the parser (bounds, dict lookups, struct unpacks, explicit
# ValueError raises). Programming errors (NameError, TypeError,
# AttributeError, UnboundLocalError...) MUST propagate — a blanket
# ``except Exception`` here hid a NameError-dead progressive path for a
# full round (VERDICT r7/r8: the r7 dead-code incident's exact mechanism).
_DATA_ERRORS = (ValueError, KeyError, IndexError, EOFError)


def decode_jpeg(data: bytes):
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG. Returns
    ``(w, h, "JPEG", pixels)`` with pixels ``(h, w)`` uint8 for grayscale
    or ``(h, w, 3)`` RGB, or ``None`` for unsupported flavors
    (arithmetic / 12-bit / hierarchical) or data-level parse failure.
    Programming errors inside the decoder propagate (see _DATA_ERRORS)."""
    try:
        return _decode_jpeg_strict(data)
    except _DATA_ERRORS:
        return None


def _decode_jpeg_strict(data: bytes):
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hsamp, vsamp, tq)]
    restart_interval = 0
    progressive = False
    coef = None  # per-component zigzag coefficient stores (progressive)
    scans_done = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — skip them instead of misreading the next 0xFF as a
        # marker code (ADVICE r5 #4)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            if progressive and scans_done:
                return _finalize_progressive(frame, coef, qts)
            return None  # reached EOI before any decodable scan
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # TEM / stray RSTn / mid-stream SOI: standalone, length-less
            # per T.81 — skip rather than misparse the next two bytes as
            # a segment length (ADVICE r6 #3 added 0xD8)
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec == 0:
                    qt = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    qt = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qts[tq] = qt
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                tbl = _canonical_codes(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if seg[0] != 8:
                return None  # only 8-bit precision
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            # Decode-bomb guard: the pixel/coefficient stores are allocated
            # from the CLAIMED dims before any entropy byte is read, so a
            # tiny corrupt stream claiming 65535x65535 would try a ~17-34 GB
            # numpy alloc inside an executor. Cap pixels, and require the
            # payload to be at least plausibly large enough for the claim
            # (~1 bit per 8x8 block is far below any real JPEG).
            if h * w > MAX_DECODE_PIXELS:
                return None
            if len(data) < (h * w) // (64 * 8):
                return None
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                hs, vs = hv >> 4, hv & 15
                # T.81 B.2.2: sampling factors are 1..4; 0 would divide by
                # zero in upsampling (fuzz-found) and >4 is out of spec
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("invalid sampling factor")
                comps.append((cid, hs, vs, seg[8 + 3 * ci]))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic: unsupported
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                tda = seg[2 + 2 * si]
                scan.append((cs, tda >> 4, tda & 15))
            if not progressive:
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan, qts,
                    dc_tables, ac_tables, restart_interval,
                )
            # progressive: Ss/Se band + Ah/Al successive-approximation
            # bits follow the component list (T.81 B.2.3)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if coef is None:
                coef = _alloc_coef(frame)
            pos = _decode_progressive_scan(
                data, pos + 2 + seg_len, frame, coef, scan,
                ss, se, ah, al, dc_tables, ac_tables, restart_interval,
            )
            scans_done += 1
            continue
        pos += 2 + seg_len
    return None


def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y) or None for unsupported shapes."""
    h, w, comps = frame
    if h <= 0 or w <= 0 or len(comps) not in (1, 3):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _comp_block_dims(frame, ci):
    """Non-interleaved block grid (bh, bw) of component ``ci``: blocks of
    the component's true sample dims, NOT the MCU-padded grid
    (T.81 A.2.2 — single-component scans traverse ceil(x_i/8) columns)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, hs, vs, _ = comps[ci]
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _planes_to_image(comps, planes, hmax, vmax, h, w):
    """Upsample component planes (sample replication) and convert to the
    decoder's output contract: grayscale (h, w) or RGB (h, w, 3) uint8."""
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        up = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )
        full.append(up[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, "JPEG", out
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return w, h, "JPEG", rgb.astype(np.uint8)


def _decode_scan(data, pos, frame, scan, qts, dc_tables, ac_tables, dri):
    h, w, comps = frame
    geom = _frame_geometry(frame)
    if geom is None:
        return None
    hmax, vmax, _, _ = geom
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {cs: (td, ta) for cs, td, ta in scan}

    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), np.float64))

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                br.align_and_skip_rst()
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = by_id[cid]
                dct, act = dc_tables[td], ac_tables[ta]
                qt = qts[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, np.int32)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.receive(t), t)
                        preds[ci] += diff
                        # legit accumulated DC is within ±2047 (category
                        # ≤ 11); corrupt streams can drift the predictor
                        # past the int32 store (fuzz-found)
                        if abs(preds[ci]) > (1 << 15):
                            raise ValueError("DC predictor out of range")
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coeffs[k] = _extend(br.receive(s), s)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = coeffs * qt
                        px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1

    return _planes_to_image(comps, planes, hmax, vmax, h, w)


# ---------------------------------------------------------------------------
# Progressive decode (T.81 Annex G): coefficients accumulate across scans in
# per-component zigzag-order stores; each scan covers a spectral band
# (Ss..Se) at a successive-approximation bit position (Ah/Al); EOI triggers
# dequantize + IDCT over the accumulated stores.
# ---------------------------------------------------------------------------


def _alloc_coef(frame):
    """Per-component coefficient stores, zigzag order, MCU-padded grid
    (interleaved DC scans traverse the padded grid incl. dummy blocks)."""
    geom = _frame_geometry(frame)
    if geom is None:
        raise ValueError("unsupported frame geometry")
    hmax, vmax, mcus_x, mcus_y = geom
    _, _, comps = frame
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
        for cid, hs, vs, tq in comps
    ]


def _refine_nonzero(br, blk, k, p1, m1):
    """Append one successive-approximation bit to a known-nonzero
    coefficient (T.81 G.1.2.3 correction bits)."""
    c = int(blk[k])
    if br.read_bit() and (c & p1) == 0:
        blk[k] = c + (p1 if c >= 0 else m1)


def _ac_first_block(br, blk, ss, se, al, act, eobrun):
    """First AC scan for one block (Ah=0): run-length + EOB-run coding of
    the band at bit position Al (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC coefficient index outside band")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ss, se, al, act, eobrun):
    """Refinement AC scan for one block (Ah=Al+1): newly-nonzero
    coefficients arrive as ±2^Al; already-nonzero ones receive one
    correction bit each, including inside EOB runs (T.81 G.1.2.3)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of blocks ending here
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # ZRL: r==15 skips 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("refinement scan size must be 1")
                val = p1 if br.read_bit() else m1
            # advance past r zero-history coefficients, handing one
            # correction bit to each nonzero-history coefficient passed
            while k <= se:
                if int(blk[k]) != 0:
                    _refine_nonzero(br, blk, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refined coefficient outside band")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB-covered: correction bits only
            if int(blk[k]) != 0:
                _refine_nonzero(br, blk, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, coef, scan, ss, se, ah, al,
    dc_tables, ac_tables, dri,
):
    """Decode one progressive scan into the coefficient stores; returns the
    offset of the next marker after the scan's entropy-coded data."""
    h, w, comps = frame
    geom = _frame_geometry(frame)
    if geom is None:
        raise ValueError("unsupported frame geometry")
    hmax, vmax, mcus_x, mcus_y = geom
    idx = {c[0]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        scomps = [(idx[cs], td) for cs, td, ta in scan]
        preds = [0] * len(scomps)
        if len(scomps) > 1:  # interleaved: MCU order over the padded grid
            n = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and n and n % dri == 0:
                        br.align_and_skip_rst()
                        preds = [0] * len(scomps)
                    for si, (ci, td) in enumerate(scomps):
                        _, hs, vs, _ = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = coef[ci][my * vs + by, mx * hs + bx]
                                if ah == 0:
                                    t = _huff_decode(br, dc_tables[td])
                                    preds[si] += _extend(br.receive(t), t)
                                    if abs(preds[si]) > (1 << 15):
                                        raise ValueError(
                                            "DC predictor out of range"
                                        )
                                    blk[0] = preds[si] << al
                                elif br.read_bit():
                                    blk[0] = int(blk[0]) | (1 << al)
                    n += 1
        else:  # single-component scans are non-interleaved (T.81 A.2.2)
            ci, td = scomps[0]
            bh, bw = _comp_block_dims(frame, ci)
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and n and n % dri == 0:
                        br.align_and_skip_rst()
                        preds = [0]
                    blk = coef[ci][by, bx]
                    if ah == 0:
                        t = _huff_decode(br, dc_tables[td])
                        preds[0] += _extend(br.receive(t), t)
                        if abs(preds[0]) > (1 << 15):
                            raise ValueError("DC predictor out of range")
                        blk[0] = preds[0] << al
                    elif br.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
                    n += 1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs, td, ta = scan[0]
        ci = idx[cs]
        act = ac_tables[ta]
        bh, bw = _comp_block_dims(frame, ci)
        eobrun = 0
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and n and n % dri == 0:
                    br.align_and_skip_rst()
                    eobrun = 0
                blk = coef[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, blk, ss, se, al, act, eobrun)
                else:
                    eobrun = _ac_refine_block(br, blk, ss, se, al, act, eobrun)
                n += 1
    # skip to the next real marker (the reader never consumes markers;
    # trailing pad bits of the final byte may be unread)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            break
        p += 1
    return p


def _finalize_progressive(frame, coef, qts):
    """Dequantize + IDCT the accumulated coefficient stores (all scans
    applied) into the decoder's standard output tuple."""
    h, w, comps = frame
    geom = _frame_geometry(frame)
    if geom is None:
        return None
    hmax, vmax, _, _ = geom
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        zz = coef[ci].astype(np.float64) * qts[tq].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz  # zigzag position k -> natural index
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        px = np.einsum("ua,ijab,bv->ijuv", _C.T, blocks, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_image(comps, planes, hmax, vmax, h, w)


# ---------------------------------------------------------------------------
# Minimal encoder (tests' round-trip partner): baseline, standard Annex K
# tables, 4:4:4 or 4:2:0, optional restart interval.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(size t, t-bit code) for a signed DCT value (T.81 F.1.2.1)."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw, zz, dc_codes, ac_codes, pred):
    # zz: one already-quantized zigzag block from _quantize_blocks — the
    # SAME kernel the progressive encoder uses. The two encoders must
    # share one FDCT/quantize path: a per-block matmul and the
    # whole-plane einsum contract in different float orders, and a DC
    # landing exactly on a .5 quantization boundary then rounds
    # differently, making "progressive == baseline" round-trips off by
    # one quant step (caught by the hypothesis property test).
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff) if diff else (0, 0)
    c, ln = dc_codes[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(int(zz[k]))
        c, ln = ac_codes[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _prep_planes(a: np.ndarray, subsample: bool):
    """Shared encoder front half: RGB→YCbCr, optional 4:2:0 subsample,
    edge-replication pad to the MCU grid. Returns
    (gray, h, w, samp, qsel, padded_planes, mcus_x, mcus_y)."""
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even dims, then 2x2 box average
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                out = np.empty((ph, pw))
                out[:h, :w] = p
                out[h:, :w] = p[h - 1 :, :]
                out[:, w:] = out[:, w - 1 : w]
                return out
            cbp, crp = pad(cb), pad(cr)
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for (hs, vs), p in zip(samp, planes):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        q = np.empty((th, tw))
        ph, pw = p.shape
        q[:ph, :pw] = p
        if ph < th:
            q[ph:, :pw] = p[ph - 1 :, :]
        if pw < tw:
            q[:, pw:] = q[:, pw - 1 : pw]
        padded.append(q)
    return gray, h, w, samp, qsel, padded, mcus_x, mcus_y


def encode_jpeg(px, subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder for uint8 grayscale ``(h, w)`` or RGB
    ``(h, w, 3)`` arrays: standard Annex K quant + Huffman tables,
    4:4:4 by default or 4:2:0 with ``subsample=True``, optional restart
    markers. The decoder's round-trip partner for tests."""
    a = np.asarray(px, np.uint8)
    gray, h, w, samp, qsel, padded, mcus_x, mcus_y = _prep_planes(
        a, subsample
    )
    qts = [QT_LUMA, QT_CHROMA]
    dc_specs = [HUFF_DC_LUMA, HUFF_DC_CHROMA]
    ac_specs = [HUFF_AC_LUMA, HUFF_AC_CHROMA]
    dc_codes = [_encode_codes(*s) for s in dc_specs]
    ac_codes = [_encode_codes(*s) for s in ac_specs]
    coefs = [
        _quantize_blocks(p, qts[qsel[ci]]) for ci, p in enumerate(padded)
    ]

    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(padded)
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            bw,
                            coefs[ci][my * vs + by, mx * hs + bx],
                            dc_codes[qsel[ci]],
                            ac_codes[qsel[ci]],
                            preds[ci],
                        )
            mcu_index += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += seg(0xC0, sof)
    for tc, specs in ((0, dc_specs), (1, ac_specs)):
        for th, (bits, vals) in enumerate(specs[: 1 if gray else 2]):
            out += seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (qsel[ci] << 4) | qsel[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G): multi-scan SOF2 streams with spectral
# selection + successive approximation, the decoder's round-trip partner.
# The AC scans use a deliberately simple flat Huffman table (every symbol
# 0x00..0xFE at 8 bits, canonical, 0xFF codeword unused) because the Annex K
# example tables lack the EOBn symbols (0x10..0xE0) progressive AC coding
# needs; the table ships in the stream's DHT so any decoder can read it.
# ---------------------------------------------------------------------------

_HUFF_AC_FLAT = ([0] * 7 + [255] + [0] * 8, list(range(0xFF)))


def _quantize_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize an MCU-padded plane into (bh, bw, 64) int32 blocks
    in zigzag order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    fdct = np.einsum("ua,ijab,bv->ijuv", _C, blocks - 128.0, _C.T)
    q = np.round(fdct / qt.reshape(8, 8).astype(np.float64))
    return q.reshape(bh, bw, 64)[:, :, ZIGZAG].astype(np.int32)


def _emit_rst(bw: _BitWriter, rst: int) -> int:
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
    return rst + 1


def _emit_dc_first(bw, coefs, scomps, comps, mcus_x, mcus_y, al, dc_codes, dri):
    """First DC scan (Ah=0): interleaved MCU order when ns>1, else the
    component's non-interleaved block grid; DPCM over coef>>Al."""
    preds = [0] * len(scomps)
    n, rst = 0, 0

    def one(si, blk):
        v = int(blk[0]) >> al
        diff = v - preds[si]
        preds[si] = v
        t, code = _magnitude(diff) if diff else (0, 0)
        c, ln = dc_codes[scomps[si][1]][t]
        bw.write(c, ln)
        if t:
            bw.write(code, t)

    if len(scomps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and n and n % dri == 0:
                    rst = _emit_rst(bw, rst)
                    preds[:] = [0] * len(scomps)
                for si, (ci, _) in enumerate(scomps):
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            one(si, coefs[ci][my * vs + by, mx * hs + bx])
                n += 1
    else:
        ci = scomps[0][0]
        bh, bwn = coefs[ci].shape[:2]
        for by in range(bh):
            for bx in range(bwn):
                if dri and n and n % dri == 0:
                    rst = _emit_rst(bw, rst)
                    preds[:] = [0]
                one(0, coefs[ci][by, bx])
                n += 1


def _emit_dc_refine(bw, coefs, scomps, comps, mcus_x, mcus_y, al, dri):
    """DC refinement scan (Ah=Al+1): one raw bit per block — bit Al of the
    coefficient's two's-complement value."""
    n, rst = 0, 0
    if len(scomps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and n and n % dri == 0:
                    rst = _emit_rst(bw, rst)
                for ci, _ in scomps:
                    _, hs, vs, _ = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                            bw.write((v >> al) & 1, 1)
                n += 1
    else:
        ci = scomps[0][0]
        bh, bwn = coefs[ci].shape[:2]
        for by in range(bh):
            for bx in range(bwn):
                if dri and n and n % dri == 0:
                    rst = _emit_rst(bw, rst)
                v = int(coefs[ci][by, bx, 0])
                bw.write((v >> al) & 1, 1)
                n += 1


class _EobState:
    """EOB-run + buffered-correction-bit state shared across the blocks of
    one AC scan (flushed at restarts and scan end)."""

    def __init__(self, bw, ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.run = 0
        self.pend: list[int] = []

    def flush(self):
        if self.run > 0:
            r = self.run.bit_length() - 1
            c, ln = self.ac[r << 4]
            self.bw.write(c, ln)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.pend:
            self.bw.write(b, 1)
        self.pend = []

    def add(self, corr_bits):
        self.run += 1
        self.pend.extend(corr_bits)
        if self.run == 0x7FFF:
            self.flush()


def _emit_ac_first(bw, blocks, bh, bwn, ss, se, al, ac_codes, dri):
    """First AC scan (Ah=0): run-length + EOB-run coding of the band's
    point-transformed (|v|>>Al, signed) coefficients."""
    eob = _EobState(bw, ac_codes)
    n, rst = 0, 0
    for by in range(bh):
        for bx in range(bwn):
            if dri and n and n % dri == 0:
                eob.flush()
                rst = _emit_rst(bw, rst)
            zz = blocks[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                eob.flush()
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    run -= 16
                sz, code = _magnitude(t if v > 0 else -t)
                c, ln = ac_codes[(run << 4) | sz]
                bw.write(c, ln)
                bw.write(code, sz)
                run = 0
            if run > 0:
                eob.add(())
            n += 1
    eob.flush()


def _emit_ac_refine(bw, blocks, bh, bwn, ss, se, al, ac_codes, dri):
    """Refinement AC scan (Ah=Al+1): newly-nonzero coefficients coded as
    (run, size=1) + sign bit; already-nonzero ones contribute buffered
    correction bits; trailing zeros fold into cross-block EOB runs."""
    eob = _EobState(bw, ac_codes)
    n, rst = 0, 0
    for by in range(bh):
        for bx in range(bwn):
            if dri and n and n % dri == 0:
                eob.flush()
                rst = _emit_rst(bw, rst)
            zz = blocks[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob_k = 0  # band index of the last newly-nonzero coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob_k = ss + i
            r = 0
            corr: list[int] = []  # this block's buffered correction bits
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    eob.flush()
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    r -= 16
                    for b in corr:
                        bw.write(b, 1)
                    corr = []
                if t > 1:  # history coefficient: next magnitude bit
                    corr.append(t & 1)
                    continue
                eob.flush()
                c, ln = ac_codes[(r << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if int(zz[k]) > 0 else 0, 1)
                for b in corr:
                    bw.write(b, 1)
                corr = []
                r = 0
            if r > 0 or corr:
                eob.add(corr)
            n += 1
    eob.flush()


def encode_jpeg_progressive(
    px, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) JPEG encoder for uint8 grayscale ``(h, w)`` or
    RGB ``(h, w, 3)`` arrays. Emits a genuinely multi-scan stream
    exercising both Annex G dimensions: DC first at Al=1 then a DC
    refinement to Al=0, and per-component AC scans split spectrally
    (1..5, 6..63) at Al=1 followed by a full-band refinement to Al=0 —
    so the decoder's EOB-run, ZRL, and correction-bit paths all run."""
    a = np.asarray(px, np.uint8)
    gray, h, w, samp, qsel, padded, mcus_x, mcus_y = _prep_planes(
        a, subsample
    )
    qts = [QT_LUMA, QT_CHROMA]
    coefs = [
        _quantize_blocks(p, qts[qsel[ci]]) for ci, p in enumerate(padded)
    ]
    frame = (
        h,
        w,
        [
            (ci + 1, samp[ci][0], samp[ci][1], qsel[ci])
            for ci in range(len(padded))
        ],
    )

    dc_specs = [HUFF_DC_LUMA, HUFF_DC_CHROMA]
    dc_codes = [_encode_codes(*s) for s in dc_specs]
    ac_codes = _encode_codes(*_HUFF_AC_FLAT)

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(payload) + 2).to_bytes(2, "big")
            + payload
        )

    nc = len(padded)
    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += seg(0xC2, sof)
    for th, (bits, vals) in enumerate(dc_specs[: 1 if gray else 2]):
        out += seg(0xC4, bytes([th]) + bytes(bits) + bytes(vals))
    bits, vals = _HUFF_AC_FLAT
    out += seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    all_comps = list(range(nc))

    def sos_header(comp_ids, ss, se, ah, al, ac_scan):
        hdr = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ac_scan else qsel[ci]
            ta = 0 if ac_scan else 0
            hdr += bytes([ci + 1, (td << 4) | ta])
        return hdr + bytes([ss, se, (ah << 4) | al])

    def emit_scan(comp_ids, ss, se, ah, al):
        bw = _BitWriter()
        scomps = [(ci, qsel[ci]) for ci in comp_ids]
        if ss == 0:
            if ah == 0:
                _emit_dc_first(
                    bw, coefs, scomps, frame[2], mcus_x, mcus_y, al,
                    dc_codes, restart_interval,
                )
            else:
                _emit_dc_refine(
                    bw, coefs, scomps, frame[2], mcus_x, mcus_y, al,
                    restart_interval,
                )
            out_hdr = sos_header(comp_ids, ss, se, ah, al, ac_scan=False)
        else:
            (ci,) = comp_ids
            bh, bwn = _comp_block_dims(frame, ci)
            if ah == 0:
                _emit_ac_first(
                    bw, coefs[ci], bh, bwn, ss, se, al, ac_codes,
                    restart_interval,
                )
            else:
                _emit_ac_refine(
                    bw, coefs[ci], bh, bwn, ss, se, al, ac_codes,
                    restart_interval,
                )
            out_hdr = sos_header(comp_ids, ss, se, ah, al, ac_scan=True)
        bw.flush()
        out.extend(seg(0xDA, out_hdr))
        out.extend(bw.out)

    # scan script: spectral selection AND successive approximation
    emit_scan(all_comps, 0, 0, 0, 1)          # DC first, Al=1
    for ci in all_comps:
        emit_scan([ci], 1, 5, 0, 1)           # low AC band, Al=1
    for ci in all_comps:
        emit_scan([ci], 6, 63, 0, 1)          # high AC band, Al=1
    emit_scan(all_comps, 0, 0, 1, 0)          # DC refinement to Al=0
    for ci in all_comps:
        emit_scan([ci], 1, 63, 1, 0)          # AC refinement to Al=0
    out += b"\xff\xd9"
    return bytes(out)
