"""Third-implementation cross-checks for the round-14 batch
(queries/p13.py, seated in the r14 driver window).

Same contract as the r6-r13 files: plain-Python recomputation,
independent of both engines, so each query enters its driver window
already triple-verified (Spark plan, DuckDB oracle, this replica).
Deliberately different algorithms where possible — the audio near-dup
replica enumerates ALL O(n²) pairs instead of replaying the banded-LSH
candidate generation (recall at Hamming <= 3 is exact by pigeonhole,
so the two must agree exactly), and the alignment replica sweeps the
grid per-document instead of via the Hamming histogram.

NOT marked slow: this is the CURRENT round's replica file and must run
on the mid-round fast path while p13 code is still moving; it joins the
slow set when the round closes (the r15 builder marks it).
"""

import re
from collections import defaultdict

import duckdb

from iniz_exporters_spark.queries import REGISTRY
from iniz_exporters_spark.queries.p12 import _ANN_TARGET_BUCKET
from iniz_exporters_spark.queries.p13 import (
    _ALIGN_GRID,
    _AQ_MAX_HIBAND,
    _AQ_MIN_DUR,
    _AQ_RMS_HI,
    _AQ_RMS_LO,
    _AUD_HAM,
    _XL_MOD,
    _XL_TAU,
)

SF_SMALL = "/root/testdata/sf0.001"


def _docs():
    return (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    )


def _embs():
    return (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, label, embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
        )
        .fetchall()
    )


def _toks(text: str) -> list:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


def _simhash32(text: str) -> int:
    hs = [_poly(t) for t in _toks(text)]
    sig = 0
    for b in range(32):
        votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if hs and votes > 0:
            sig |= 1 << b
    return sig


def _img32(text: str) -> int:
    payload = ("#" + text).encode("utf-8")
    n = len(payload)
    px = [payload[q % n] for q in range(64)]
    total = sum(px)
    v = 0
    for k in range(32):  # low two 16-bit bands = bits 0..31
        if 64 * px[k] > total:
            v |= 1 << k
    return v


def _samples(text: str) -> list:
    return [b - 128 for b in text.encode("utf-8")]


def _audio_fp64(text: str) -> int:
    s = _samples(text)
    n = len(s)
    sv = [s[q % n] for q in range(256)]
    en = [sum(sv[4 * w + j] ** 2 for j in range(4)) for w in range(64)]
    total = sum(en)
    v = 0
    for w in range(64):
        if 64 * en[w] > total:
            v |= 1 << w
    return v


def test_imagetext_alignment_matches_bruteforce(spark):
    got = {
        r["threshold"]: r
        for r in REGISTRY["imagetext_alignment_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    coses = []
    for _doc_id, text in _docs():
        if not text:
            continue
        hd = bin(_img32(text) ^ _simhash32(text)).count("1")
        coses.append((16 - hd) / 16.0)
    assert set(got) == set(float(t) for t in _ALIGN_GRID)
    for t in _ALIGN_GRID:
        kept = [c for c in coses if c >= t]
        r = got[float(t)]
        assert r["n_total"] == len(coses)
        assert r["n_kept"] == len(kept)
        assert abs(r["keep_share"] - len(kept) / len(coses)) <= 5e-7
        if kept:
            assert abs(r["mean_cos_kept"] - sum(kept) / len(kept)) <= 5e-7
        else:
            assert r["mean_cos_kept"] is None


def test_audio_neardup_matches_allpairs_bruteforce(spark):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in REGISTRY["audio_neardup_q"].fn(spark, SF_SMALL).collect()
    }
    fps = [
        (doc_id, _audio_fp64(text)) for doc_id, text in _docs() if text
    ]
    # ALL pairs, no banding: pigeonhole over four 16-bit bands makes
    # banded recall EXACT at Hamming <= 3, so the sets must be equal.
    exp = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            a, fa = fps[i]
            b, fb = fps[j]
            hd = bin(fa ^ fb).count("1")
            if hd <= _AUD_HAM:
                exp[(min(a, b), max(a, b))] = hd
    assert got == exp


def test_crosslingual_decontam_matches_bruteforce(spark):
    got = {
        r["vec_id"]: r
        for r in REGISTRY["crosslingual_decontam_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    rows = _embs()
    n = len(rows)
    bits = 4 + max(0, (max(n // _ANN_TARGET_BUCKET, 1)).bit_length() - 1)

    def bucket(v):
        return sum(1 << d for d in range(bits) if v[d] >= 0)

    suite, train = [], []
    for vec_id, label, emb in rows:
        v = [float(x) for x in emb]
        (suite if _poly(f"xl:{vec_id}") % _XL_MOD == 0 else train).append(
            (vec_id, label, v, bucket(v))
        )
    exp = {}
    for vec_id, label, v, bk in train:
        best = None  # (neg rounded cos, sid, slabel)
        nv = sum(x * x for x in v) ** 0.5
        for sid, slabel, sv, sbk in suite:
            if sbk != bk or slabel == label:
                continue
            nn = nv * sum(x * x for x in sv) ** 0.5
            cos = (
                round(sum(a * b for a, b in zip(v, sv)) / nn, 6)
                if nn
                else None
            )
            key = (
                (-cos, sid, slabel) if cos is not None else (2.0, sid, slabel)
            )
            if best is None or key < best:
                best = key
        if best is not None:
            exp[vec_id] = (label,) + best
    assert set(got) == set(exp)
    for vec_id, (label, negc, sid, slabel) in exp.items():
        r = got[vec_id]
        assert r["label"] == label
        cos = None if negc == 2.0 else -negc
        if cos is None:
            assert r["max_cos"] is None and not r["contaminated"]
            continue
        assert abs(r["max_cos"] - cos) <= 2e-6
        # id assertions only off rounding ties (replica rounds via
        # repr-round, engines via decimal quantize)
        if abs(r["max_cos"] - cos) == 0:
            assert r["nn_suite_id"] == sid
            assert r["nn_suite_label"] == slabel
        if abs(cos - _XL_TAU) > 1e-6:
            assert r["contaminated"] == (cos >= _XL_TAU)


def test_audio_quality_filter_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["audio_quality_filter_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    exp = {}
    for doc_id, text in _docs():
        if not text:
            continue
        s = _samples(text)
        n = len(s)
        x = [v / 128.0 for v in s]
        energy = sum(v * v for v in x)
        dur = n / 8000.0
        rms = (energy / n) ** 0.5
        mean_abs = sum(abs(v) for v in x) / n
        peak = max(abs(v) for v in x)
        zcr = (
            sum(1 for i in range(1, n) if (x[i] < 0) != (x[i - 1] < 0)) / n
        )
        d2 = sum((x[i] - x[i - 1]) ** 2 for i in range(1, n))
        hiband = d2 / energy if energy else 0.0
        kept = (
            dur >= _AQ_MIN_DUR
            and _AQ_RMS_LO <= rms <= _AQ_RMS_HI
            and hiband <= _AQ_MAX_HIBAND
        )
        exp[doc_id] = (dur, rms, mean_abs, peak, zcr, hiband, kept)
    assert set(got) == set(exp)
    # 5.1e-7, not 5e-7: an exactly-dyadic feature (rms 0.3515625 at this
    # scale) quantizes half-up to a 6-dp value a hair over 5e-7 away in
    # float repr — the displayed value is correct, the replica is unrounded
    for doc_id, (dur, rms, mean_abs, peak, zcr, hiband, kept) in exp.items():
        r = got[doc_id]
        assert abs(r["duration_sec"] - dur) <= 5.1e-7
        assert abs(r["rms"] - rms) <= 5.1e-7
        assert abs(r["mean_abs"] - mean_abs) <= 5.1e-7
        assert abs(r["peak"] - peak) <= 5.1e-7
        assert abs(r["zcr"] - zcr) <= 5.1e-7
        assert abs(r["hiband"] - hiband) <= 5.1e-7
        # gate values sit well away from the thresholds at this scale,
        # so the float replica's keep decision is unambiguous
        assert r["kept"] == kept


def test_crossmodal_hard_negatives_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["crossmodal_hard_negatives_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    docs = [(d, t) for d, t in _docs() if t]
    n = len(docs)
    bits = 4 + max(0, (max(n // _ANN_TARGET_BUCKET, 1)).bit_length() - 1)
    mask = (1 << bits) - 1
    imgs = {d: _img32(t) for d, t in docs}
    sigs = {d: _simhash32(t) for d, t in docs}
    by_bucket = defaultdict(list)
    for d in sigs:
        by_bucket[sigs[d] & mask].append(d)
    assert set(got) == set(imgs)
    for d, img in imgs.items():
        own_hd = bin(img ^ sigs[d]).count("1")
        r = got[d]
        assert abs(r["own_cos"] - (16 - own_hd) / 16.0) <= 5e-7
        cands = [
            (bin(img ^ sigs[o]).count("1"), o)
            for o in by_bucket[img & mask]
            if o != d
        ]
        if not cands:
            assert r["neg_doc"] is None
            assert r["neg_cos"] is None and r["margin"] is None
            continue
        hd, neg = min(cands)
        assert r["neg_doc"] == neg
        assert abs(r["neg_cos"] - (16 - hd) / 16.0) <= 5e-7
        assert (
            abs(r["margin"] - ((16 - own_hd) / 16.0 - (16 - hd) / 16.0))
            <= 1e-6
        )
