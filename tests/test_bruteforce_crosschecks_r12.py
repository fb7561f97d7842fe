"""Third-implementation cross-checks for the round-11 session-3 additions
(queued for the r12 driver window).

Same contract as the r6-r11 files: plain-Python recomputation, independent
of both engines, so each query enters its driver window already
triple-verified (Spark plan, DuckDB oracle, this replica).
"""

import re

import duckdb

from iniz_exporters_spark.queries import REGISTRY

import pytest
# Historical-round replica (VERDICT r12 #7): covers code frozen since its
# round; runs in the full close-gate suite but is excluded from the
# mid-round fast path (pytest -m 'not slow').
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.001"


def _rows(sql):
    return duckdb.connect().execute(sql).fetchall()


def _docs():
    return _rows(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    )


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


def _luhn_valid(cc: str) -> bool:
    total = 0
    for i, ch in enumerate(cc, start=1):
        d = ord(ch) - 48
        if (17 - i) % 2 == 0:
            d = 2 * d
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_pii_risk_score_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["pii_risk_score_q"].fn(spark, SF_SMALL).collect()
    }
    pats = {
        "n_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "n_ssn": r"\b\d{3}-\d{2}-\d{4}\b",
        "n_phone": r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        "n_ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    }
    assert len(got) == 500
    seen_tiers, seen_valid = set(), set()
    for doc_id, text, _src in _docs():
        t = text
        if doc_id % 3 == 0:
            t += f" reach user{doc_id}@mail.example.org"
        if doc_id % 4 == 1:
            t += (
                f" ssn {doc_id % 900 + 100:03d}-"
                f"{doc_id % 89 + 10:02d}-{doc_id % 9000 + 1000:04d}"
            )
        if doc_id % 5 == 2:
            t += f" call 555-867-{doc_id % 10000:04d}"
        if doc_id % 6 == 3:
            t += f" from 10.{doc_id % 200}.0.1"
        if doc_id % 2 == 0:
            t += f" card 4{((doc_id % 10**9) * 2654435761) % 10**15:015d}"
        counts = {k: len(re.findall(p, t)) for k, p in pats.items()}
        m = re.search(r"\b(\d{16})\b", t)
        cc = m.group(1) if m else ""
        has_cc = 1 if len(cc) == 16 else 0
        valid = 1 if (has_cc and _luhn_valid(cc)) else 0
        n_kinds = sum(1 for v in counts.values() if v > 0) + has_cc
        base = (
            3 * counts["n_email"]
            + 5 * counts["n_ssn"]
            + 2 * counts["n_phone"]
            + counts["n_ipv4"]
            + (8 if valid else (1 if has_cc else 0))
        )
        risk = base * (2 if n_kinds >= 2 else 1)
        tier = (
            "none"
            if base == 0
            else ("low" if risk < 8 else ("medium" if risk < 20 else "high"))
        )
        row = got[doc_id]
        for k, v in counts.items():
            assert row[k] == v, (doc_id, k)
        assert row["has_cc"] == has_cc
        assert row["cc_luhn_valid"] == valid
        assert row["n_kinds"] == n_kinds
        assert row["risk_score"] == risk
        assert row["risk_tier"] == tier
        seen_tiers.add(tier)
        if has_cc:
            seen_valid.add(valid)
    # the spike must exercise the full surface: all four tiers and BOTH
    # Luhn branches
    assert seen_tiers == {"none", "low", "medium", "high"}
    assert seen_valid == {0, 1}


def test_script_mix_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["script_mix_q"].fn(spark, SF_SMALL).collect()
    }
    classes = {
        "n_latin": r"[A-Za-z]",
        "n_cyrillic": "[Ѐ-ӿ]",
        "n_greek": "[Ͱ-Ͽ]",
        "n_cjk": "[一-鿿]",
        "n_replacement": "�",
        "n_control": "[\x01-\x08\x0b\x0c\x0e-\x1f]",
    }
    seen_mixed, seen_moji = set(), set()
    for doc_id, text, _src in _docs():
        t = text
        if doc_id % 4 == 1:
            t += " привет мир"
        if doc_id % 4 == 2:
            t += " αλφα βητα"
        if doc_id % 4 == 3:
            t += " 数据清洗"
        if doc_id % 10 == 0:
            t += " ��"
        if doc_id % 7 == 0:
            t += "\x07"
        counts = {k: len(re.findall(p, t)) for k, p in classes.items()}
        n_scripts = sum(
            1
            for k in ("n_latin", "n_cyrillic", "n_greek", "n_cjk")
            if counts[k] > 0
        )
        mixed = 1 if n_scripts >= 2 else 0
        moji = 1 if (counts["n_replacement"] or counts["n_control"]) else 0
        row = got[doc_id]
        for k, v in counts.items():
            assert row[k] == v, (doc_id, k)
        assert row["n_scripts"] == n_scripts
        assert row["mixed_script"] == mixed
        assert row["mojibake"] == moji
        seen_mixed.add(mixed)
        seen_moji.add(moji)
    assert seen_mixed == {0, 1} and seen_moji == {0, 1}


def test_host_blocklist_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["host_blocklist_q"].fn(spark, SF_SMALL).collect()
    }
    rules = [
        "src1.example.com",
        "cdn.src2.example.com",
        "example.net",
        "www.src4.example.com",
    ]
    seen_blocked = set()
    for doc_id, _text, src in _docs():
        if doc_id % 3 == 0:
            host = f"{src}.example.com"
        elif doc_id % 3 == 1:
            host = f"cdn.{src}.example.com"
        else:
            host = f"www.mirror-{src}.example.net"
        parts = host.split(".")
        suffixes = {".".join(parts[i:]) for i in range(len(parts))}
        matches = sorted(
            (r for r in rules if r in suffixes),
            key=lambda r: (-len(r), r),
        )
        row = got[doc_id]
        assert row["host"] == host
        if matches:
            assert row["blocked"] == 1
            assert row["matched_rule"] == matches[0]
            assert row["rule_labels"] == len(matches[0].split("."))
        else:
            assert row["blocked"] == 0
            assert row["matched_rule"] == ""
            assert row["rule_labels"] == 0
        seen_blocked.add(row["blocked"])
    assert seen_blocked == {0, 1}


def test_host_mirror_q_matches_bruteforce(spark):
    got = {
        r["host"]: r
        for r in REGISTRY["host_mirror_q"].fn(spark, SF_SMALL).collect()
    }
    by_fp = {}
    host_docs = {}
    for doc_id, text, src in _docs():
        host = f"{src}-h{doc_id % 7}.example.com"
        toks = sorted(
            {t for t in re.split(r"[^a-z0-9]+", text.lower()) if t}
        )
        fp = _poly(" ".join(toks))
        by_fp.setdefault(fp, set()).add(host)
        host_docs.setdefault(host, []).append(fp)
    assert set(got) == set(host_docs)
    any_mirrored = False
    for host, fps in host_docs.items():
        n_docs = len(fps)
        n_mirrored = sum(1 for fp in fps if len(by_fp[fp]) >= 2)
        partners = set()
        for fp in set(fps):
            partners |= by_fp[fp] - {host}
        row = got[host]
        assert row["n_docs"] == n_docs
        assert row["n_mirrored_docs"] == n_mirrored
        assert row["n_mirror_partners"] == len(partners)
        assert abs(row["mirror_rate"] - n_mirrored / n_docs) < 5e-7
        any_mirrored = any_mirrored or n_mirrored > 0
    # the synthetic corpus must actually contain cross-host mirrors
    assert any_mirrored


def test_theta_forecast_q_matches_bruteforce(spark):
    got = {
        r["pri"]: r
        for r in REGISTRY["theta_forecast_q"].fn(spark, SF_SMALL).collect()
    }
    daily = _rows(
        f"""SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
            FROM read_parquet('{SF_SMALL}/orders.parquet')
            GROUP BY o_orderpriority, day ORDER BY o_orderpriority, day"""
    )
    series = {}
    for pri, _day, rev in daily:
        series.setdefault(pri, []).append(rev)
    assert set(got) == set(series)
    for pri, v in series.items():
        n = len(v)
        st = n * (n + 1) // 2
        st2 = n * (n + 1) * (2 * n + 1) // 6
        sy = sum(v)  # fp noise here stays far below the 5e-7 gate
        sty = sum(y * t for t, y in enumerate(v, start=1))
        b = (n * sty - st * sy) / (n * st2 - st * st)
        a = (sy - b * st) / n
        s = 2 * v[0] - (a + b)
        for t in range(2, n + 1):
            s = (s + (2 * v[t - 1] - (a + b * t))) / 2
        row = got[pri]
        assert row["n_days"] == n
        assert abs(row["slope"] - b) < 5e-7
        assert abs(row["intercept"] - a) < 5e-6
        assert abs(row["ses_level"] - s) < 5e-6
        assert abs(
            row["forecast_7d"] - (0.5 * (a + b * (n + 7)) + 0.5 * s)
        ) < 5e-6


def test_mmr_rerank_q_matches_bruteforce(spark):
    got = sorted(
        (
            (r["query_id"], r["pick_order"], r["neighbor_id"],
             r["relevance"], r["diversity_penalty"], r["mmr_score"])
            for r in REGISTRY["mmr_rerank_q"].fn(spark, SF_SMALL).collect()
        )
    )
    vecs = dict(
        _rows(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet')"
        )
    )
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(d / (na * nb), 4)

    LAM, MU, K, P = 0.7, 0.3, 20, 5
    expect = []
    for qid in sorted(v for v in vecs if v < 8):
        scored = sorted(
            ((cos(vecs[qid], vecs[c]), c) for c in vecs if c != qid),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        cands = [(c, s) for s, c in scored]
        selected = []
        for pick_order in range(1, P + 1):
            best = None
            for c, qsim in cands:
                if any(c == s for s, _, _ in selected):
                    continue
                pen = max(
                    (cos(vecs[c], vecs[s]) for s, _, _ in selected),
                    default=0.0,
                )
                sc = LAM * qsim - MU * pen
                key = (-sc, c)
                if best is None or key < best[0]:
                    best = (key, c, qsim, pen, sc)
            _, c, qsim, pen, sc = best
            selected.append((c, pen, sc))
            expect.append(
                (qid, pick_order, c, qsim, round(pen, 6), round(sc, 6))
            )
    expect.sort()
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3], (g, e)
        for gi, ei in zip(g[3:], e[3:]):
            assert abs(gi - ei) < 5e-7, (g, e)
    # diversity must actually bite: some pick differs from the pure-cos
    # top-5 order (a nonzero penalty changed a selection)
    assert any(e[4] > 0 for e in expect)


def test_wilcoxon_signed_rank_q_matches_bruteforce(spark):
    row = REGISTRY["wilcoxon_signed_rank_q"].fn(spark, SF_SMALL).collect()[0]
    per = _rows(
        f"""SELECT o_custkey,
            SUM(CASE WHEN year(o_orderdate) <= 1994
                THEN o_totalprice::DECIMAL(18,4) ELSE 0 END) AS x,
            SUM(CASE WHEN year(o_orderdate) >= 1995
                THEN o_totalprice::DECIMAL(18,4) ELSE 0 END) AS y
            FROM read_parquet('{SF_SMALL}/orders.parquet')
            GROUP BY o_custkey"""
    )
    diffs = [y - x for _c, x, y in per]
    n_zero = sum(1 for d in diffs if d == 0)
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    # classical midranks over |d| (exact Decimal keys — no fp in ranking)
    by_abs = sorted(abs(d) for d in nz)
    first = {}
    for i, v in enumerate(by_abs, start=1):
        first.setdefault(v, []).append(i)
    midrank = {v: sum(ix) / len(ix) for v, ix in first.items()}
    w_plus = sum(midrank[abs(d)] for d in nz if d > 0)
    tie3 = sum(
        len(ix) ** 3 - len(ix) for ix in first.values() if len(ix) > 1
    )
    import math

    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    )
    assert row["n_pairs"] == n
    assert row["n_zero_dropped"] == n_zero
    assert abs(row["w_plus"] - w_plus) < 1e-9
    assert abs(row["w_minus"] - (n * (n + 1) / 2 - w_plus)) < 1e-9
    assert row["tie_correction"] == tie3
    assert abs(row["z_score"] - z) < 5e-7


def test_nf4_quantize_q_matches_bruteforce(spark):
    got = {
        r["label"]: r
        for r in REGISTRY["nf4_quantize_q"].fn(spark, SF_SMALL).collect()
    }
    from iniz_exporters_spark.queries.p10 import (
        _NF4_LEVELS,
        _NF4_MIDPOINTS,
    )

    rows = _rows(
        f"SELECT label, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    )

    def nearest(x):
        for m, lvl in zip(_NF4_MIDPOINTS, _NF4_LEVELS):
            if x <= m:
                return lvl
        return _NF4_LEVELS[-1]

    import math

    per_label = {}
    for label, emb in rows:
        v = [float(x) for x in emb]
        am = max(abs(x) for x in v)
        w = [0.0 if am == 0 else nearest(x / am) * am for x in v]
        mse = round(sum((a - b) ** 2 for a, b in zip(v, w)) / len(v), 12)
        na = math.sqrt(sum(x * x for x in v))
        nb = math.sqrt(sum(x * x for x in w))
        cos = round(sum(a * b for a, b in zip(v, w)) / (na * nb), 6)
        per_label.setdefault(label, []).append((mse, cos))
    assert set(got) == set(per_label)
    for label, pairs in per_label.items():
        row = got[label]
        n = len(pairs)
        assert row["n_vectors"] == n
        assert abs(row["avg_mse"] - sum(m for m, _ in pairs) / n) < 1e-8
        assert abs(row["worst_mse"] - max(m for m, _ in pairs)) < 1e-11
        assert abs(row["avg_cos"] - sum(c for _, c in pairs) / n) < 5e-6
        # quantization must be lossy but faithful: positive error, high
        # cosine (every vector has >16 distinct magnitudes at d=64)
        assert row["avg_mse"] > 0 and row["avg_cos"] > 0.9


def test_c4_rules_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["c4_rules_q"].fn(spark, SF_SMALL).collect()
    }
    seen_kept = set()
    for doc_id, text, _src in _docs():
        toks = [
            t for t in re.split(r"[^a-z0-9]+", text.lower()) if t
        ]
        lw = 7 + doc_id % 5
        n_lines = (len(toks) + lw - 1) // lw
        lines = []
        for i in range(n_lines):
            body = " ".join(toks[i * lw : (i + 1) * lw])
            if doc_id % 41 == 0 and i == 0:
                body += " lorem ipsum"
            if doc_id % 37 == 0 and i == 1 % n_lines:
                body += " {"
            if doc_id % 29 == 0 and i == 2 % n_lines:
                body += " javascript"
            if (doc_id + i) % 3 != 0:
                body += "."
            lines.append(body)
        term = lambda l: l[-1:] in (".", "!", "?")  # noqa: E731
        words = lambda l: len(l.split(" "))  # noqa: E731
        kept = [
            l for l in lines
            if term(l) and words(l) >= 5 and "javascript" not in l
        ]
        has_lorem = int(any("lorem ipsum" in l for l in lines))
        has_brace = int(any("{" in l for l in lines))
        row = got[doc_id]
        assert row["n_lines"] == n_lines
        assert row["n_kept_lines"] == len(kept)
        assert row["n_unpunct_lines"] == sum(
            1 for l in lines if not term(l)
        )
        assert row["n_short_lines"] == sum(
            1 for l in lines if words(l) < 5
        )
        assert row["n_js_lines"] == sum(
            1 for l in lines if "javascript" in l
        )
        assert row["has_lorem"] == has_lorem
        assert row["has_brace"] == has_brace
        dk = int(len(kept) >= 3 and not has_lorem and not has_brace)
        assert row["doc_kept"] == dk
        seen_kept.add(dk)
    assert seen_kept == {0, 1}


def test_unimax_alloc_q_matches_bruteforce(spark):
    got = {
        r["source"]: r
        for r in REGISTRY["unimax_alloc_q"].fn(spark, SF_SMALL).collect()
    }
    per = {}
    for _doc_id, text, src in _docs():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        per[src] = per.get(src, 0) + len(toks)
    caps = {
        s: (n, 1 + int(s[3:]) % 3, n * (1 + int(s[3:]) % 3))
        for s, n in per.items()
    }
    total = sum(n for n, _, _ in caps.values())
    budget = 6 * total // 5
    order = sorted(caps, key=lambda s: (caps[s][2], s))
    n = len(order)
    # waterfill: largest saturated prefix k
    pref, k, pk = 0, 0, 0
    running = 0
    for i, s in enumerate(order, start=1):
        running += caps[s][2]
        if caps[s][2] * (n - i) <= budget - running:
            k, pk = i, running
    level = (budget - pk) / (n - k) if k < n else None
    saturated = set(order[:k])
    assert set(got) == set(caps)
    assert {got[s]["saturated"] for s in got} == {0, 1}
    for s, (ntok, ecap, ctok) in caps.items():
        row = got[s]
        assert row["n_tokens"] == ntok
        assert row["epoch_cap"] == ecap
        assert row["cap_tokens"] == ctok
        assert row["budget_tokens"] == budget
        alloc = ctok if s in saturated else level
        assert row["saturated"] == int(s in saturated)
        assert abs(row["alloc_tokens"] - alloc) < 0.01
        assert abs(row["epochs"] - alloc / ntok) < 5e-6
    # conservation: allocations must exhaust the budget
    assert abs(sum(r["alloc_tokens"] for r in got.values()) - budget) < 1


def test_pipeline_waterfall_q_matches_bruteforce(spark):
    """Stage-count waterfall replayed independently (same scoring /
    dedup logic as the r8 pipeline replica, reduced to counts)."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP as RH
    from decimal import Decimal

    def _shingles(text):
        t = text or ""
        if not t:
            return set()
        if len(t) <= 5:
            return {_poly(t)}
        return {_poly(t[i : i + 5]) for i in range(len(t) - 4)}

    def _bands(hs, num_perm=16, rows=4):
        M = 1_000_000_007
        sigs = [
            min(
                ((1000003 * j + 1) * h + (7919 * j + 12345)) % M
                for h in hs
            )
            for j in range(num_perm)
        ]
        out = []
        for b in range(num_perm // rows):
            block = sigs[b * rows : (b + 1) * rows]
            acc = block[0]
            for v in block[1:]:
                acc = (acc * 31 + v) % M
            out.append((b, acc))
        return out

    EN = {"the", "a", "and", "of", "to", "in", "is", "it"}
    ES = {"el", "la", "de", "que", "y", "los", "en", "un"}
    DE = {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"}
    FR = {"le", "la", "de", "et", "est", "les", "des", "une"}
    c0 = cq = cl = 0
    passers = {}
    for doc_id, text, _src in _docs():
        c0 += 1
        t = text or ""
        n = len(t)
        low = t.lower()
        n_punct = sum(
            1 for c in low
            if not (c.isdigit() or "a" <= c <= "z" or c == " ")
        )
        toks = [x for x in re.split(r"[^a-z0-9]+", low) if x]
        stop_ratio = (
            sum(1 for w in toks if w in EN) / len(toks) if toks else 0.0
        )
        raw = (
            0.4 * (1 - (n_punct / n if n else 0))
            + 0.3 * min(stop_ratio * 5, 1.0)
            + 0.3 * min(n / 500, 1.0)
        )
        quality = float(Decimal(repr(raw)).quantize(Decimal("1e-4"), RH))
        if quality < 0.5:
            continue
        cq += 1
        counts = [sum(1 for w in toks if w in ws) for ws in (EN, ES, DE, FR)]
        if not (max(counts) > 0 and counts[0] == max(counts)):
            continue
        cl += 1
        passers.setdefault(t, doc_id)
    ce = len(passers)
    # near-dup drop among exact survivors
    shingles = {}
    for t, d in passers.items():
        shingles[d] = _shingles(t)
    buckets = defaultdict(list)
    for d, hs in shingles.items():
        if hs:
            for key in _bands(hs):
                buckets[key].append(d)
    dropped = set()
    for ds in buckets.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                ha, hb = shingles[a], shingles[b]
                inter = len(ha & hb)
                if round(inter / (len(ha) + len(hb) - inter), 4) >= 0.7:
                    dropped.add(b)
    expect = {
        "1_quality": (c0, cq),
        "2_language": (cq, cl),
        "3_exact_dedup": (cl, ce),
        "4_near_dedup": (ce, ce - len(dropped)),
    }
    got = {
        r["stage"]: r
        for r in REGISTRY["pipeline_waterfall_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expect)
    for stage, (n_in, n_out) in expect.items():
        row = got[stage]
        assert (row["n_in"], row["n_out"]) == (n_in, n_out), stage
        assert row["n_dropped"] == n_in - n_out
        assert abs(
            row["drop_rate"] - (n_in - n_out) / n_in
        ) < 5e-7
    # monotone waterfall, and the corpus must exercise real drops
    # somewhere (exact dedup legitimately drops 0 at sf0.001 — the
    # corpus has no byte-identical duplicates below sf0.1)
    assert all(n_in >= n_out for n_in, n_out in expect.values())
    assert sum(n_in - n_out for n_in, n_out in expect.values()) > 0


def test_fairness_parity_q_matches_bruteforce(spark):
    got = {
        r["segment"]: r
        for r in REGISTRY["fairness_parity_q"].fn(spark, SF_SMALL).collect()
    }
    per = _rows(
        f"""SELECT o_custkey, COUNT(*)::BIGINT,
            SUM(o_totalprice::DECIMAL(18,4))
            FROM read_parquet('{SF_SMALL}/orders.parquet')
            GROUP BY o_custkey"""
    )
    seg = dict(
        _rows(
            f"SELECT c_custkey, c_mktsegment FROM "
            f"read_parquet('{SF_SMALL}/customer.parquet')"
        )
    )
    nc = len(per)
    so = sum(n for _c, n, _s in per)
    ss = sum(s for _c, _n, s in per)
    groups = {}
    for c, n, s in per:
        label = 1 if s * nc > ss else 0
        pred = 1 if n * nc > so else 0
        g = groups.setdefault(seg[c], [0, 0, 0, 0, 0])
        g[0] += 1
        g[1] += pred
        g[2] += label
        g[3] += 1 if (pred and label) else 0
        g[4] += 1 if (pred and not label) else 0
    o = [sum(g[i] for g in groups.values()) for i in range(5)]
    assert set(got) == set(groups)
    for s_name, (n, npred, npos, ntp, nfp) in groups.items():
        row = got[s_name]
        assert row["n_customers"] == n
        assert abs(row["base_rate"] - npos / n) < 5e-7
        assert abs(row["selection_rate"] - npred / n) < 5e-7
        if npos:
            assert abs(row["tpr"] - ntp / npos) < 5e-7
        if n - npos:
            assert abs(row["fpr"] - nfp / (n - npos)) < 5e-7
        assert abs(row["dp_gap"] - abs(npred / n - o[1] / o[0])) < 5e-7
        if npos and o[2]:
            assert abs(
                row["eo_gap"] - abs(ntp / npos - o[3] / o[2])
            ) < 5e-7
    # the audit must observe a real disparity somewhere
    assert any(r["dp_gap"] > 0 for r in got.values())


def _shingles5(text):
    t = text or ""
    if not t:
        return set()
    if len(t) <= 5:
        return {_poly(t)}
    return {_poly(t[i : i + 5]) for i in range(len(t) - 4)}


def _band_keys(hs, num_perm=16, rows=4):
    M = 1_000_000_007
    sigs = [
        min(((1000003 * j + 1) * h + (7919 * j + 12345)) % M for h in hs)
        for j in range(num_perm)
    ]
    out = []
    for b in range(num_perm // rows):
        block = sigs[b * rows : (b + 1) * rows]
        acc = block[0]
        for v in block[1:]:
            acc = (acc * 31 + v) % M
        out.append((b, acc))
    return out


def test_lsh_scurve_q_matches_bruteforce(spark):
    got = {
        r["jbin"]: r
        for r in REGISTRY["lsh_scurve_q"].fn(spark, SF_SMALL).collect()
    }
    sample = [
        (d, t) for d, t, _s in _docs() if d % 10 == 0
    ]
    hs = {d: _shingles5(t) for d, t in sample}
    from collections import defaultdict

    buckets = defaultdict(set)
    for d in hs:
        for key in _band_keys(hs[d]):
            buckets[key].add(d)
    cands = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cands.add((a, b))
    bins = defaultdict(lambda: [0, 0, 0.0])
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(hs[a] & hs[b])
            union = len(hs[a]) + len(hs[b]) - inter
            jb = (10 * inter) // union
            jd = inter / union
            p = round(1 - (1 - jd**4) ** 4, 12)
            bins[jb][0] += 1
            bins[jb][1] += 1 if (a, b) in cands else 0
            bins[jb][2] += p
    assert set(got) == set(bins)
    for jb, (n, ncand, psum) in bins.items():
        row = got[jb]
        assert row["n_pairs"] == n
        assert row["n_candidates"] == ncand
        assert abs(row["empirical_rate"] - ncand / n) < 5e-7
        assert abs(row["theoretical_rate"] - psum / n) < 5e-6
    # the audit must span both curve regimes: some bin ~0, and
    # candidates must actually occur somewhere
    assert any(r["n_candidates"] > 0 for r in got.values())


def test_kcenter_coreset_q_matches_bruteforce(spark):
    got = sorted(
        (r["pick_order"], r["vec_id"], r["radius"])
        for r in REGISTRY["kcenter_coreset_q"].fn(spark, SF_SMALL).collect()
    )
    vecs = dict(
        _rows(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet')"
        )
    )

    def d2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return round(s, 6)

    selected = [min(vecs)]
    expect = [(1, selected[0], 0.0)]
    mind = {
        v: d2(vecs[v], vecs[selected[0]]) for v in vecs if v != selected[0]
    }
    for t in range(2, 6):
        pick = min(mind, key=lambda v: (-mind[v], v))
        expect.append((t, pick, mind[pick]))
        pv = vecs[pick]
        del mind[pick]
        for v in mind:
            nd = d2(vecs[v], pv)
            if nd < mind[v]:
                mind[v] = nd
    for g, e in zip(got, sorted(expect)):
        assert g[:2] == e[:2]
        assert abs(g[2] - e[2]) < 5e-7
    # radii must be non-increasing after the seed (Gonzalez invariant)
    radii = [r for _t, _v, r in sorted(expect)[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def _bow_fp(text):
    toks = sorted({t for t in re.split(r"[^a-z0-9]+", text.lower()) if t})
    return _poly(" ".join(toks))


def test_dup_growth_curve_q_matches_bruteforce(spark):
    got = {
        r["prefix_quartile"]: r
        for r in REGISTRY["dup_growth_curve_q"].fn(spark, SF_SMALL).collect()
    }
    docs = _docs()
    first = {}
    dup = {}
    for doc_id, text, _src in docs:
        fp = _bow_fp(text)
        dup[doc_id] = 1 if fp in first else 0
        first.setdefault(fp, doc_id)
    n = max(d for d, _t, _s in docs) + 1
    expect = {}
    for q in (1, 2, 3, 4):
        cutoff_docs = [
            d for d, _t, _s in docs
            if (q == 4) or (d * 4 < q * n)
        ]
        nd = len(cutoff_docs)
        du = sum(dup[d] for d in cutoff_docs)
        expect[q] = (nd, du)
    assert set(got) == set(expect)
    for q, (nd, du) in expect.items():
        row = got[q]
        assert row["n_docs"] == nd
        assert row["n_dups"] == du
        assert abs(row["dup_rate"] - du / nd) < 5e-7
    # rates must be monotone data or at least well-formed: cumulative
    # doc counts strictly increase
    assert [got[q]["n_docs"] for q in (1, 2, 3, 4)] == sorted(
        got[q]["n_docs"] for q in (1, 2, 3, 4)
    )


def test_softdedup_weights_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["softdedup_weights_q"].fn(spark, SF_SMALL).collect()
    }
    groups = {}
    for doc_id, text, _src in _docs():
        groups.setdefault(_bow_fp(text), []).append(doc_id)
    n_groups = len(groups)
    total_w = 0.0
    for members in groups.values():
        g = len(members)
        owner = min(members)
        for d in members:
            row = got[d]
            assert row["group_size"] == g
            assert row["group_owner"] == owner
            assert row["is_owner"] == (1 if d == owner else 0)
            assert abs(row["sample_weight"] - 1.0 / g) < 5e-7
            total_w += 1.0 / g
    # conservation law: expected effective corpus == number of groups
    assert abs(total_w - n_groups) < 1e-6
    # the corpus must contain at least one multi-member group
    assert any(len(m) > 1 for m in groups.values())


def test_rouge_n_eval_q_matches_bruteforce(spark):
    got = {
        (r["id_a"], r["id_b"]): r
        for r in REGISTRY["rouge_n_eval_q"].fn(spark, SF_SMALL).collect()
    }
    from collections import Counter, defaultdict

    by_src = defaultdict(list)
    toks = {}
    for doc_id, text, src in _docs():
        by_src[src].append(doc_id)
        toks[doc_id] = [
            t for t in re.split(r"[^a-z0-9]+", text.lower()) if t
        ]

    def bigrams(ts):
        return Counter(
            f"{a} {b}" for a, b in zip(ts, ts[1:])
        )

    expect = {}
    for src, ids in by_src.items():
        ids.sort()
        for a, b in zip(ids, ids[1:]):
            ga, gb = bigrams(toks[a]), bigrams(toks[b])
            na, nb = sum(ga.values()), sum(gb.values())
            ov = sum((ga & gb).values())
            expect[(a, b)] = (ov, na, nb)
    assert set(got) == set(expect)
    any_overlap = False
    for k, (ov, na, nb) in expect.items():
        row = got[k]
        assert row["n_overlap"] == ov
        assert row["n_grams_a"] == na
        assert row["n_grams_b"] == nb
        assert abs(row["rouge2_recall"] - (ov / nb if nb else 0)) < 5e-7
        assert abs(
            row["rouge2_precision"] - (ov / na if na else 0)
        ) < 5e-7
        assert abs(row["rouge2_f1"] - 2 * ov / (na + nb)) < 5e-7
        any_overlap = any_overlap or ov > 0
    assert any_overlap


def test_truncation_loss_q_matches_bruteforce(spark):
    got = {
        r["max_len"]: r
        for r in REGISTRY["truncation_loss_q"].fn(spark, SF_SMALL).collect()
    }
    lens = [
        len([t for t in re.split(r"[^a-z0-9]+", text.lower()) if t])
        for _d, text, _s in _docs()
    ]
    for L in (16, 24, 32, 48, 64):
        row = got[L]
        assert row["n_docs"] == len(lens)
        assert row["n_truncated"] == sum(1 for n in lens if n > L)
        assert row["n_tokens"] == sum(lens)
        kept = sum(min(n, L) for n in lens)
        assert row["n_kept"] == kept
        assert abs(row["kept_frac"] - kept / sum(lens)) < 5e-7
    # the grid must span both regimes: heavy truncation at the small L
    # and most-tokens-survive at the large L (corpus docs run 10-99
    # tokens, so 64 keeps ~86%)
    assert got[16]["kept_frac"] < 0.5 and got[64]["kept_frac"] > 0.8


def test_span_corruption_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["span_corruption_q"].fn(spark, SF_SMALL).collect()
    }
    rates = []
    for doc_id, text, _src in _docs():
        ntok = len(
            [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        )
        spans = []
        for pos in range(ntok):
            h = _poly(f"{doc_id}:{pos}")
            if h % 20 == 0:
                spans.append((pos, min(pos + 2 + h % 3, ntok)))
        merged = []
        for s, e in sorted(spans):
            if merged and s <= merged[-1][1]:
                merged[-1] = (
                    merged[-1][0], max(merged[-1][1], e)
                )
            else:
                merged.append((s, e))
        masked = sum(e - s for s, e in merged)
        row = got[doc_id]
        assert row["n_tokens"] == ntok
        assert row["n_spans"] == len(merged)
        assert row["n_masked"] == masked
        assert abs(
            row["mask_rate"] - (masked / ntok if ntok else 0)
        ) < 5e-7
        if ntok:
            rates.append(masked / ntok)
    # the hash schedule must land near its design point (~15% masked,
    # 5% starts x mean length 3) in aggregate
    mean_rate = sum(rates) / len(rates)
    assert 0.08 < mean_rate < 0.22, mean_rate


def test_mahalanobis_outliers_q_matches_bruteforce(spark):
    got = {
        r["vec_id"]: r
        for r in REGISTRY["mahalanobis_outliers_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    rows = _rows(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    )
    vecs = {
        v: [
            float(x) * (3.0 if v % 97 == 0 else 1.0) for x in emb
        ]
        for v, emb in rows
    }
    d = len(next(iter(vecs.values())))
    n = len(vecs)
    mu = [sum(vecs[v][i] for v in vecs) / n for i in range(d)]
    var = [
        sum(vecs[v][i] ** 2 for v in vecs) / n - mu[i] ** 2
        for i in range(d)
    ]
    flagged = set()
    for v, x in vecs.items():
        md2 = sum(
            round((x[i] - mu[i]) ** 2 / var[i], 9) for i in range(d)
        )
        row = got[v]
        assert abs(row["md2"] - md2) < 5e-5, v
        assert row["is_outlier"] == (1 if md2 > 2 * d else 0)
        if row["is_outlier"]:
            flagged.add(v)
    # the detector must recover exactly the spiked ~1% (vec_id % 97)
    assert flagged == {v for v in vecs if v % 97 == 0} and flagged


# ---------------------------------------------------------------------------
# Round-12 batch (queries/p11.py)
# ---------------------------------------------------------------------------

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list:
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def test_exact_substring_dedup_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["exact_substring_dedup_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    docs = {doc_id: _toks(text) for doc_id, text, _ in _docs()}
    K, T = 8, 50
    seeds = {}  # gram -> [(doc, pos)]
    for doc_id, ts in docs.items():
        for i in range(len(ts) - K + 1):
            seeds.setdefault(" ".join(ts[i : i + K]), []).append(
                (doc_id, i + 1)
            )
    pair_pos = {}  # (da, db, diag) -> set of pa
    for occ in seeds.values():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    pair_pos.setdefault((da, db, pa - pb), set()).add(pa)
    spans = []  # (da, db, sa, diag, length)
    for (da, db, diag), pas in pair_pos.items():
        run = []
        for pa in sorted(pas) + [None]:
            if run and (pa is None or pa != run[-1] + 1):
                spans.append((da, db, run[0], diag, len(run) + K - 1))
                run = []
            if pa is not None:
                run.append(pa)
    per = {d: {"p": set(), "n": 0, "m": 0, "iv": set()} for d in docs}
    for da, db, sa, diag, ln in spans:
        for doc, start in ((da, sa), (db, sa - diag)):
            st = per[doc]
            st["p"].add(db if doc == da else da)
            st["n"] += 1
            st["m"] = max(st["m"], ln)
            if ln >= T:
                st["iv"].add((start, start + ln - 1))
    assert len(got) == len(docs)
    for doc_id, ts in docs.items():
        st, row = per[doc_id], got[doc_id]
        cut, last_end = 0, -1
        for s, e in sorted(st["iv"]):
            if s > last_end:
                cut += e - s + 1
                last_end = e
            elif e > last_end:
                cut += e - last_end
                last_end = e
        assert row["n_tokens"] == len(ts)
        assert row["n_partners"] == len(st["p"])
        assert row["n_spans"] == st["n"]
        assert row["max_span_tokens"] == st["m"]
        assert row["cut_tokens"] == cut, doc_id
        assert row["kept_tokens"] == len(ts) - cut


def test_quality_calibration_curve_q_matches_bruteforce(spark):
    import math

    got = {
        r["bucket"]: r
        for r in REGISTRY["quality_calibration_curve_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    buckets = {}
    for _doc_id, text, _ in _docs():
        ts = _toks(text)
        raw = 0.0
        for t in ts:
            idx = _poly(t) % 64
            raw += ((idx * 37 + 11) % 21 - 10) / 10.0
        prob = float(
            Decimal(repr(1.0 / (1.0 + math.exp(-raw / 8.0)))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        gold = 1 if len(ts) >= 40 and 10 * len(set(ts)) >= 4 * len(ts) else 0
        b = min(int(prob * 10), 9)
        buckets.setdefault(b, []).append((prob, gold))
    assert set(got) == set(buckets)
    for b, rows in buckets.items():
        r = got[b]
        n = len(rows)
        mp = sum(p for p, _ in rows) / n
        gr = sum(g for _, g in rows) / n
        assert r["n_docs"] == n
        assert abs(r["mean_prob"] - mp) < 1e-9
        assert abs(r["gold_rate"] - gr) < 1e-12
        assert abs(r["abs_gap"] - abs(mp - gr)) < 1e-9


def test_seq_packing_q_matches_bruteforce(spark):
    got = {
        r["seq_id"]: r
        for r in REGISTRY["seq_packing_q"].fn(spark, SF_SMALL).collect()
    }
    L = 128
    cum = 0
    per = {}
    for _doc_id, text, _ in _docs():  # doc_id order
        n = len(_toks(text))
        if n == 0:
            continue
        s, e = cum, cum + n
        cum = e
        for q in range(s // L, (e - 1) // L + 1):
            st = per.setdefault(q, {"d": 0, "st": 0, "f": 0})
            st["d"] += 1
            st["st"] += 1 if s >= q * L else 0
            st["f"] += min(e, (q + 1) * L) - max(s, q * L)
    assert set(got) == set(per)
    for q, st in per.items():
        r = got[q]
        assert (r["n_docs"], r["n_starts"], r["fill_tokens"]) == (
            st["d"],
            st["st"],
            st["f"],
        )
        assert r["pad_tokens"] == L - st["f"]
        # only the final sequence may pad
        if q != max(per):
            assert r["pad_tokens"] == 0


def test_embedding_decontam_q_matches_bruteforce(spark):
    got = {
        r["vec_id"]: r
        for r in REGISTRY["embedding_decontam_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    vecs = _rows(
        f"SELECT vec_id, label, embedding::DOUBLE[] FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    )
    ranked = sorted(vecs, key=lambda r: (_poly(f"dec:{r[0]}"), r[0]))
    test_ids = {vid for vid, _l, _v in ranked[:32]}
    test = [(vid, v) for vid, _l, v in vecs if vid in test_ids]
    train = [
        (vid, lab, v) for vid, lab, v in vecs if vid not in test_ids
    ]
    assert len(got) == len(train)

    def cos(a, b):
        dot = nx = ny = 0.0
        for x, y in zip(a, b):
            dot += x * y
            nx += x * x
            ny += y * y
        return dot / (nx**0.5 * ny**0.5)

    for vid, lab, v in train:
        best = min(
            ((-round(cos(v, qv), 6), tid) for tid, qv in test),
        )
        r = got[vid]
        assert r["label"] == lab
        assert r["nn_test_id"] == best[1]
        assert abs(r["max_cos"] - (-best[0])) < 2e-6
        assert r["contaminated"] == (r["max_cos"] >= 0.40)


def test_exact_substring_decontam_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["exact_substring_decontam_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    docs = {doc_id: _toks(text) for doc_id, text, _ in _docs()}
    suite = set(
        sorted(docs, key=lambda d: (_poly(f"esd:{d}"), d))[:25]
    )
    K = 8
    seeds = {}
    for doc_id, ts in docs.items():
        for i in range(len(ts) - K + 1):
            seeds.setdefault(" ".join(ts[i : i + K]), []).append(
                (doc_id, i + 1)
            )
    pair_pos = {}  # (test_doc, train_doc, diag) -> set of test pos
    for occ in seeds.values():
        for td, pa in occ:
            if td not in suite:
                continue
            for dd, pb in occ:
                if dd in suite:
                    continue
                pair_pos.setdefault((td, dd, pa - pb), set()).add(pa)
    per = {d: {"p": set(), "n": 0, "m": 0} for d in suite}
    for (td, dd, _diag), pas in pair_pos.items():
        run = []
        for pa in sorted(pas) + [None]:
            if run and (pa is None or pa != run[-1] + 1):
                st = per[td]
                st["p"].add(dd)
                st["n"] += 1
                st["m"] = max(st["m"], len(run) + K - 1)
                run = []
            if pa is not None:
                run.append(pa)
    assert set(got) == suite
    for td in suite:
        st, row = per[td], got[td]
        assert row["n_tokens"] == len(docs[td])
        assert row["n_train_partners"] == len(st["p"])
        assert row["n_spans"] == st["n"]
        assert row["max_overlap_tokens"] == st["m"]
        assert row["contaminated"] == (st["m"] >= 40)


def test_quality_threshold_sweep_q_matches_bruteforce(spark):
    import math

    got = {
        r["tau_x10"]: r
        for r in REGISTRY["quality_threshold_sweep_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    rows = []
    for _doc_id, text, _ in _docs():
        ts = _toks(text)
        raw = sum(
            ((_poly(t) % 64 * 37 + 11) % 21 - 10) / 10.0 for t in ts
        )
        prob = float(
            Decimal(repr(1.0 / (1.0 + math.exp(-raw / 8.0)))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        gold = 1 if len(ts) >= 40 and 10 * len(set(ts)) >= 4 * len(ts) else 0
        rows.append((prob, gold))
    n_total = len(rows)
    n_gold = sum(g for _, g in rows)
    assert set(got) == set(range(1, 10))
    for tau in range(1, 10):
        k = sum(1 for p, _ in rows if p >= tau / 10)
        g = sum(1 for p, gl in rows if p >= tau / 10 and gl == 1)
        r = got[tau]
        assert r["n_keep"] == k
        assert abs(r["keep_rate"] - k / n_total) < 1e-12
        if k:
            assert abs(r["precision_gold"] - g / k) < 1e-12
        else:
            assert r["precision_gold"] is None
        assert abs(r["recall_gold"] - g / n_gold) < 1e-12


def test_data_constrained_epochs_q_matches_bruteforce(spark):
    import math

    got = {
        (r["source"], r["epochs"]): r
        for r in REGISTRY["data_constrained_epochs_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    owners = {}  # gram -> (doc_id, ci, source, clen)
    per_doc = []
    for doc_id, text, src in _docs():
        ts = _toks(text)
        for ci in range(1, (len(ts) + 19) // 20 + 1):
            chunk = ts[20 * (ci - 1) : 20 * ci]
            g = " ".join(chunk)
            key = (doc_id, ci)
            if g not in owners or key < owners[g][:2]:
                owners[g] = (doc_id, ci, src, len(chunk))
    uniq = {}
    for _doc, _ci, src, clen in owners.values():
        uniq[src] = uniq.get(src, 0) + clen
    assert len(got) == len(uniq) * 8
    for src, u in uniq.items():
        for e in range(1, 9):
            r = got[(src, e)]
            d = 1.0 - math.exp(-(e - 1) / 15.4)
            eff = u * (1.0 + 15.4 * d)
            assert r["uniq_tokens"] == u
            assert r["raw_tokens"] == u * e
            assert abs(r["effective_tokens"] - eff) < 1e-6
            assert abs(r["repeat_value"] - eff / (u * e)) < 1e-12
    # conservation: one epoch is worth exactly the unique budget
    for src, u in uniq.items():
        assert got[(src, 1)]["effective_tokens"] == float(u)
