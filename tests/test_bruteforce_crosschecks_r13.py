"""Third-implementation cross-checks for the round-13 batch
(queries/p12.py, seated in the r13 driver window).

Same contract as the r6-r12 files: plain-Python recomputation,
independent of both engines, so each query enters its driver window
already triple-verified (Spark plan, DuckDB oracle, this replica).
Deliberately different algorithms where possible — e.g. the dirty-token
replica marks per-seed coverage sets instead of replaying the
gaps-and-islands interval union.

Marked slow at r14 open (the scheduled hand-off): p12 code is frozen
and driver-green, so this joins the historical replica set on the slow
path alongside the r6-r12 files.
"""

import re
from collections import defaultdict

import duckdb
import pytest

pytestmark = pytest.mark.slow

from iniz_exporters_spark.queries import REGISTRY
from iniz_exporters_spark.queries.p01 import BPE_ISH
from iniz_exporters_spark.queries.p12 import _EM_PREFIX, _MMD_HAM, _MMD_K
from iniz_exporters_spark.queries.p11 import _ESD_SEED, _ESDC_K

SF_SMALL = "/root/testdata/sf0.001"


def _docs():
    return (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
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


def test_extractable_memorization_matches_bruteforce(spark):
    got = {
        r["dup_level"]: r
        for r in REGISTRY["extractable_memorization_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    per = defaultdict(lambda: [0, set()])  # gram -> [occ, conts]
    for _doc_id, text, _lang in _docs():
        ts = _toks(text)
        for i in range(len(ts) - _EM_PREFIX):
            g = " ".join(ts[i : i + _EM_PREFIX])
            per[g][0] += 1
            per[g][1].add(ts[i + _EM_PREFIX])
    lvl = defaultdict(lambda: [0, 0, 0])  # level -> [prefixes, det, occ]
    for occ, conts in per.values():
        L = occ.bit_length() - 1
        lvl[L][0] += 1
        lvl[L][1] += 1 if len(conts) == 1 else 0
        lvl[L][2] += occ
    assert set(got) == set(lvl)
    for L, (np_, nd, no) in lvl.items():
        r = got[L]
        assert r["n_prefixes"] == np_
        assert r["n_deterministic"] == nd
        assert r["n_occurrences"] == no
        assert abs(r["extractable_rate"] - nd / np_) < 1e-12


def test_tokenizer_parity_matches_bruteforce(spark):
    got = {
        r["lang"]: r
        for r in REGISTRY["tokenizer_parity_q"].fn(spark, SF_SMALL).collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])  # lang -> [docs, bpe, bytes]
    for _doc_id, text, lang in _docs():
        agg[lang][0] += 1
        agg[lang][1] += len(re.findall(BPE_ISH, text))
        agg[lang][2] += len(text.encode("utf-8"))
    assert set(got) == set(agg)
    en_rate = agg["en"][1] / agg["en"][2]
    for lang, (nd, nb, nby) in agg.items():
        r = got[lang]
        assert r["n_docs"] == nd
        assert r["n_bpe_tokens"] == nb
        assert r["n_bytes"] == nby
        # outputs are rounded to 6 dp through the decimal quantize
        assert abs(r["tokens_per_kb"] - nb * 1000.0 / nby) <= 5e-7
        assert abs(r["premium_vs_en"] - (nb / nby) / en_rate) <= 5e-7


def _phash_bands(text: str) -> tuple:
    payload = ("#" + text).encode("utf-8")
    n = len(payload)
    px = [payload[q % n] for q in range(64)]
    total = sum(px)
    bands = []
    for j in range(4):
        v = 0
        for k in range(16 * j, 16 * j + 16):
            if 64 * px[k] > total:
                v |= 1 << (k - 16 * j)
        bands.append(v)
    return tuple(bands)


def test_multimodal_decontam_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["multimodal_decontam_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    rows = [
        (doc_id, _phash_bands(text), _poly(f"mmd:{doc_id}"))
        for doc_id, text, _lang in _docs()
        if len(text.encode("utf-8")) > 0
    ]
    suite = sorted(rows, key=lambda r: (r[2], r[0]))[:_MMD_K]
    suite_ids = {r[0] for r in suite}
    train = [r for r in rows if r[0] not in suite_ids]
    assert len(got) == len(train)
    for doc_id, bands, _h in train:
        best = min(
            (
                (
                    sum(
                        bin(a ^ b).count("1")
                        for a, b in zip(bands, sbands)
                    ),
                    sid,
                )
                for sid, sbands, _sh in suite
            )
        )
        r = got[doc_id]
        assert r["hamming"] == best[0]
        assert r["nn_suite_doc"] == best[1]
        assert r["contaminated"] == (best[0] <= _MMD_HAM)


_STOPS = {"the", "a", "of", "to", "and", "in", "is", "it", "on", "for"}


def _gopher_keep(ts: list) -> bool:
    n = len(ts)
    sl = sum(len(w) for w in ts)
    st = sum(1 for w in ts if w in _STOPS)
    return 50 <= n <= 100000 and 3 * n <= sl <= 10 * n and st >= 2


def _c4_keep(doc_id: int, ts: list) -> bool:
    lw = 7 + doc_id % 5
    n_lines = (len(ts) + lw - 1) // lw
    lines = []
    for i in range(n_lines):
        line = " ".join(ts[i * lw : (i + 1) * lw])
        if doc_id % 41 == 0 and i == 0:
            line += " lorem ipsum"
        if doc_id % 37 == 0 and i == 1 % n_lines:
            line += " {"
        if doc_id % 29 == 0 and i == 2 % n_lines:
            line += " javascript"
        if (doc_id + i) % 3 != 0:
            line += "."
        lines.append(line)
    kept = sum(
        1
        for l in lines
        if l[-1:] in (".", "!", "?")
        and len(l.split(" ")) >= 5
        and "javascript" not in l
    )
    lorem = any("lorem ipsum" in l for l in lines)
    brace = any("{" in l for l in lines)
    return kept >= 3 and not lorem and not brace


def test_filter_agreement_matches_bruteforce(spark):
    (r,) = REGISTRY["filter_agreement_q"].fn(spark, SF_SMALL).collect()
    bb = gb = cb = nn = 0
    for doc_id, text, _lang in _docs():
        ts = _toks(text)
        g, c = _gopher_keep(ts), _c4_keep(doc_id, ts)
        if g and c:
            bb += 1
        elif g:
            gb += 1
        elif c:
            cb += 1
        else:
            nn += 1
    n = bb + gb + cb + nn
    assert r["n_docs"] == n
    assert r["both_keep"] == bb
    assert r["only_gopher"] == gb
    assert r["only_c4"] == cb
    assert r["neither"] == nn
    po = (bb + nn) / n
    pe = ((bb + gb) / n) * ((bb + cb) / n) + ((cb + nn) / n) * (
        (gb + nn) / n
    )
    assert abs(r["observed_agreement"] - po) < 1e-12
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) <= 5e-7
    # the gate corpus must exercise BOTH disagreement cells (otherwise
    # kappa degenerates and the audit tests nothing)
    assert gb + cb > 0 and bb + nn > 0


def test_eval_dirty_tokens_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["eval_dirty_tokens_q"].fn(spark, SF_SMALL).collect()
    }
    docs = {doc_id: _toks(text) for doc_id, text, _lang in _docs()}
    order = sorted(docs, key=lambda d: (_poly(f"esd:{d}"), d))
    suite = set(order[:_ESDC_K])
    train_grams = set()
    for doc_id, ts in docs.items():
        if doc_id in suite:
            continue
        for i in range(len(ts) - _ESD_SEED + 1):
            train_grams.add(" ".join(ts[i : i + _ESD_SEED]))
    assert set(got) == suite
    flagged = 0
    for doc_id in suite:
        ts = docs[doc_id]
        # independent algorithm: union of per-seed coverage sets, no
        # gaps-and-islands — every matched seed at i dirties i..i+7
        dirty = set()
        for i in range(len(ts) - _ESD_SEED + 1):
            if " ".join(ts[i : i + _ESD_SEED]) in train_grams:
                dirty.update(range(i, i + _ESD_SEED))
        r = got[doc_id]
        assert r["n_tokens"] == len(ts)
        assert r["dirty_tokens"] == len(dirty)
        share = len(dirty) / len(ts) if ts else 0.0
        assert abs(r["dirty_share"] - share) < 1e-12
        assert r["heavily_contaminated"] == (
            len(ts) > 0 and 10 * len(dirty) >= len(ts)
        )
        flagged += r["heavily_contaminated"]
    # calibrated constant: flags must be MIXED at the gate scale
    assert 0 < flagged < _ESDC_K


def test_cross_source_dup_matrix_matches_bruteforce(spark):
    got = {
        (r["src_a"], r["src_b"]): r
        for r in REGISTRY["cross_source_dup_matrix_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    per_src = defaultdict(set)
    rows = (
        duckdb.connect()
        .execute(
            f"SELECT source, text FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        .fetchall()
    )
    for source, text in rows:
        ts = _toks(text)
        for i in range(len(ts) - _ESD_SEED + 1):
            per_src[source].add(" ".join(ts[i : i + _ESD_SEED]))
    srcs = sorted(per_src)
    expected = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expected[(a, b)] = shared
    assert set(got) == set(expected)
    for (a, b), shared in expected.items():
        r = got[(a, b)]
        na, nb = len(per_src[a]), len(per_src[b])
        assert r["n_grams_a"] == na and r["n_grams_b"] == nb
        assert r["n_shared"] == shared
        assert abs(r["jaccard"] - shared / (na + nb - shared)) < 1e-12
        assert abs(r["containment_a"] - shared / na) < 1e-12
        assert abs(r["containment_b"] - shared / nb) < 1e-12


def test_boilerplate_fraction_matches_bruteforce(spark):
    from iniz_exporters_spark.queries.p12 import _BP_DF

    got = {
        r["doc_id"]: r
        for r in REGISTRY["boilerplate_fraction_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    docs = {d: _toks(t) for d, t, _l in _docs()}
    gram_docs = defaultdict(set)
    for d, ts in docs.items():
        for i in range(len(ts) - _ESD_SEED + 1):
            gram_docs[" ".join(ts[i : i + _ESD_SEED])].add(d)
    bp = {g for g, ds in gram_docs.items() if len(ds) >= _BP_DF}
    assert set(got) == set(docs)
    flagged = 0
    for d, ts in docs.items():
        # independent algorithm: per-seed coverage sets, no islands
        cover = set()
        for i in range(len(ts) - _ESD_SEED + 1):
            if " ".join(ts[i : i + _ESD_SEED]) in bp:
                cover.update(range(i, i + _ESD_SEED))
        r = got[d]
        assert r["n_tokens"] == len(ts)
        assert r["boilerplate_tokens"] == len(cover)
        share = len(cover) / len(ts) if ts else 0.0
        assert abs(r["boilerplate_share"] - share) < 1e-12
        assert r["mostly_boilerplate"] == (
            len(ts) > 0 and 2 * len(cover) >= len(ts)
        )
        flagged += r["mostly_boilerplate"]
    assert 0 < flagged < len(docs)  # calibrated: mixed flags


def test_knn_loo_ann_matches_bruteforce(spark):
    got = {
        r["label"]: r
        for r in REGISTRY["knn_loo_ann_q"].fn(spark, SF_SMALL).collect()
    }
    rows = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, label, embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet')"
        )
        .fetchall()
    )
    from iniz_exporters_spark.queries.p12 import _ANN_TARGET_BUCKET

    vecs = [(vid, lab, [float(x) for x in v]) for vid, lab, v in rows]
    bits = 4 + max(
        0, max(len(vecs) // _ANN_TARGET_BUCKET, 1).bit_length() - 1
    )
    by_bucket = defaultdict(list)
    for vid, lab, v in vecs:
        b = sum(1 << d for d in range(bits) if v[d] >= 0)
        by_bucket[b].append((vid, lab, v))
    per_label = defaultdict(lambda: [0, 0])
    for b, members in by_bucket.items():
        for vid, lab, v in members:
            cands = []
            for cid, clab, cv in members:
                if cid == vid:
                    continue
                d2 = round(sum((a - q) * (a - q) for a, q in zip(cv, v)), 6)
                cands.append((d2, cid, clab))
            if not cands:
                continue
            cands.sort()
            votes = defaultdict(int)
            for _d2, _cid, clab in cands[:5]:
                votes[clab] += 1
            pred = min(votes, key=lambda L: (-votes[L], L))
            per_label[lab][0] += 1
            per_label[lab][1] += 1 if pred == lab else 0
    assert set(got) == set(per_label)
    for lab, (nv, nc) in per_label.items():
        r = got[lab]
        assert r["n_vectors"] == nv
        assert r["n_correct"] == nc
        assert abs(r["accuracy"] - round(nc / nv, 6)) < 1e-9


def test_doc_memorization_risk_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["doc_memorization_risk_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    docs = {d: _toks(t) for d, t, _l in _docs()}
    per = defaultdict(lambda: [0, set()])
    for d, ts in docs.items():
        for i in range(len(ts) - _ESD_SEED):
            g = " ".join(ts[i : i + _ESD_SEED])
            per[g][0] += 1
            per[g][1].add(ts[i + _ESD_SEED])
    assert set(got) == set(docs)
    flagged = 0
    for d, ts in docs.items():
        np_ = max(len(ts) - _ESD_SEED, 0)
        nr = sum(
            1
            for i in range(len(ts) - _ESD_SEED)
            if per[" ".join(ts[i : i + _ESD_SEED])][0] >= 2
            and len(per[" ".join(ts[i : i + _ESD_SEED])][1]) == 1
        )
        r = got[d]
        assert r["n_prompts"] == np_
        assert r["n_risky"] == nr
        share = nr / np_ if np_ else 0.0
        assert abs(r["risk_share"] - share) < 1e-12
        assert r["at_risk"] == (np_ > 0 and 5 * nr >= np_)
        flagged += r["at_risk"]
    assert 0 < flagged < len(docs)  # calibrated: mixed flags


def test_quality_psi_drift_matches_bruteforce(spark):
    import math

    got = {
        r["source"]: r
        for r in REGISTRY["quality_psi_drift_q"].fn(spark, SF_SMALL).collect()
    }
    rows = (
        duckdb.connect()
        .execute(
            f"SELECT source, text FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        .fetchall()
    )

    def prob(text):
        raw = 0.0
        for t in _toks(text):
            idx = _poly(t) % 64
            raw += ((idx * 37 + 11) % 21 - 10) / 10.0
        p = 1.0 / (1.0 + math.exp(-raw / 8.0))
        # decimal(28,12) quantize then 4-dp round, as both engines do
        from decimal import Decimal, ROUND_HALF_UP

        return float(
            Decimal(repr(p))
            .quantize(Decimal("1." + "0" * 12))
            .quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )

    counts = defaultdict(lambda: [0] * 10)
    for source, text in rows:
        b = min(int(prob(text) * 10), 9)
        counts[source][b] += 1
    total = [0] * 10
    for source in counts:
        for b in range(10):
            total[b] += counts[source][b]
    nt = sum(total)
    assert set(got) == set(counts)
    for source, cs in counts.items():
        ns = sum(cs)
        psi = 0.0
        for b in range(10):
            ps = (cs[b] + 0.5) / (ns + 5.0)
            qs = (total[b] + 0.5) / (nt + 5.0)
            psi += (ps - qs) * math.log(ps / qs)
        r = got[source]
        assert r["n_docs"] == ns
        assert abs(r["psi"] - psi) <= 5e-7  # 6-dp rounded output
        expect_tier = (
            "shifted" if r["psi"] >= 0.25
            else "moderate" if r["psi"] >= 0.1 else "stable"
        )
        assert r["tier"] == expect_tier
