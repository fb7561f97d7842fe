"""Third-implementation cross-checks for the round-8 driver window.

Same contract as the r6/r7 files: plain-Python/numpy recomputation,
independent of both engines, for r8-window analytics without an existing
check — landed two rounds early so every window enters its driver round
already triple-verified.
"""

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pytest

from iniz_exporters_spark.queries import REGISTRY

# Historical-round replica (VERDICT r12 #7): covers code frozen since its
# round; runs in the full close-gate suite but is excluded from the
# mid-round fast path (pytest -m 'not slow').
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT user_id, ts, event_id, CAST(value AS DOUBLE), event_type "
        f"FROM read_parquet('{SF_SMALL}/events.parquet') "
        f"ORDER BY user_id, ts, event_id"
    ).fetchall()


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _tok(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _us(delta) -> int:
    return (
        delta.days * 86_400_000_000
        + delta.seconds * 1_000_000
        + delta.microseconds
    )


def test_running_balance_resets_q_matches_bruteforce(spark):
    """Signup-reset running balances replayed with a plain loop."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, v, etype in _events():
        streams[u].append((v, etype))
    expect = {}
    for u, rows in streams.items():
        island, bal, max_bal = 0, Decimal(0), None
        islands: set[int] = set()  # only islands that hold actual rows
        for v, etype in rows:
            if etype == "signup":
                island += 1
                bal = Decimal(0)
            else:
                bal += Decimal(repr(v)).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP
                )
            islands.add(island)
            max_bal = bal if max_bal is None else max(max_bal, bal)
        expect[u] = (len(islands), round(float(max_bal), 4), len(rows))
    got = {
        r["user_id"]: (r["n_islands"], r["max_balance"], r["n_events"])
        for r in REGISTRY["running_balance_resets_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expect)
    for u, (ni, mb, ne) in got.items():
        eni, emb, ene = expect[u]
        assert (ni, ne) == (eni, ene)
        assert mb == pytest.approx(emb, abs=1e-4)


def test_readability_q_matches_bruteforce(spark):
    """Flesch + LIX from independent sentence/word/syllable counting."""
    import re

    expect = {}
    for doc_id, text, _ in _docs():
        sents = [
            s for s in (
                x.strip(" ") for x in re.split(r"[.!?]+", text or "")
            ) if s
        ]
        toks = _tok(text)
        n_sents = max(len(sents), 1)
        n_words = max(len(toks), 1)
        n_long = sum(1 for t in toks if len(t) > 6)
        n_syll = max(
            sum(len(re.findall(r"[aeiouy]+", t)) for t in toks), 1
        )
        flesch = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (
            n_syll / n_words
        )
        lix = n_words / n_sents + 100.0 * n_long / n_words
        expect[doc_id] = (flesch, lix)
    rows = REGISTRY["readability_q"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in rows} == set(expect)
    for r in rows:
        fl, lx = expect[r["doc_id"]]
        assert r["flesch"] == pytest.approx(fl, abs=2e-4)
        assert r["lix"] == pytest.approx(lx, abs=2e-4)


def test_js_divergence_q_matches_bruteforce(spark):
    """Jensen-Shannon divergence between source-half token
    distributions, from raw counts."""
    ca: Counter = Counter()
    cb: Counter = Counter()
    for _, text, source in _docs():
        half = int(source[3:]) % 2
        for w in _tok(text):
            (ca if half == 0 else cb)[w] += 1
    vocab = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in vocab:
        pa, pb = ca[w] / na, cb[w] / nb
        mid = (pa + pb) / 2
        if pa > 0:
            js += 0.5 * pa * math.log(pa / mid)
        if pb > 0:
            js += 0.5 * pb * math.log(pb / mid)
    row = REGISTRY["js_divergence_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_types"] == len(vocab)
    assert row["js_div"] == pytest.approx(js, abs=2e-6)
    assert 0.0 <= row["js_div"] <= math.log(2) + 1e-9


def test_id_gaps_q_matches_bruteforce(spark):
    """Gap list from a plain sorted scan of the surviving keys."""
    con = duckdb.connect()
    ids = sorted(
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT o_orderkey FROM "
            f"read_parquet('{SF_SMALL}/orders.parquet') "
            f"WHERE o_orderkey % 97 <> 13"
        ).fetchall()
    )
    expect = [
        (prev + 1, cur - 1, cur - prev - 1)
        for prev, cur in zip(ids, ids[1:])
        if cur - prev > 1
    ]
    got = [
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in REGISTRY["id_gaps_q"].fn(spark, SF_SMALL).collect()
    ]
    assert sorted(got) == expect


def test_twa_q_matches_bruteforce(spark):
    """Time-weighted average from the definition: value held until the
    next event, weighted by microsecond hold time."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, v, _ in _events():
        streams[u].append((ts, v))
    expect = {}
    for u, rows in streams.items():
        ivs = [
            (Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP),
             _us(rows[i + 1][0] - ts))
            for i, (ts, v) in enumerate(rows[:-1])
        ]
        ivs = [(v, h) for v, h in ivs if h > 0]
        if not ivs:
            continue
        span = sum(h for _, h in ivs)
        twa = float(sum(v * h for v, h in ivs)) / span
        expect[u] = (len(ivs), span, twa)
    got = REGISTRY["twa_q"].fn(spark, SF_SMALL).collect()
    assert {r["user_id"] for r in got} == set(expect)
    for r in got:
        n, span, twa = expect[r["user_id"]]
        assert (r["n_intervals"], r["span_us"]) == (n, span)
        assert r["twa"] == pytest.approx(twa, abs=2e-6)


def test_dup_payment_q_matches_bruteforce(spark):
    """Duplicate-payment flags: same customer + price band within 365
    days of the previous order in that band."""
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE), "
        f"o_orderdate FROM read_parquet('{SF_SMALL}/orders.parquet')"
    ).fetchall()
    bands: dict = defaultdict(list)
    for k, c, p, d in orders:
        bands[(c, int(p // 10000))].append((d, k))
    expect = {}
    for (c, band), lst in bands.items():
        lst.sort()
        for (pd_, pk), (d, k) in zip(lst, lst[1:]):
            days = (d - pd_).days
            if days <= 365:
                expect[k] = (pk, c, band, days)
    got = REGISTRY["dup_payment_q"].fn(spark, SF_SMALL).collect()
    assert {r["o_orderkey"] for r in got} == set(expect)
    for r in got:
        pk, c, band, days = expect[r["o_orderkey"]]
        assert (
            r["prev_key"], r["o_custkey"], r["price_band"], r["days_apart"]
        ) == (pk, c, band, days)


def test_parent_share_q_matches_bruteforce(spark):
    """Region/nation revenue shares from exact decimal sums."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_regionkey, c.c_nationkey,
               CAST(o.o_totalprice AS DOUBLE)
        FROM read_parquet('{SF_SMALL}/orders.parquet') o
        JOIN read_parquet('{SF_SMALL}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{SF_SMALL}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        """
    ).fetchall()
    rev: dict = defaultdict(Decimal)
    for rg, nat, p in rows:
        rev[(rg, nat)] += Decimal(repr(p)).quantize(
            Decimal("1e-4"), ROUND_HALF_UP
        )
    by_region: dict = defaultdict(Decimal)
    for (rg, _), v in rev.items():
        by_region[rg] += v
    total = sum(by_region.values())
    got = REGISTRY["parent_share_q"].fn(spark, SF_SMALL).collect()
    assert {(r["region"], r["nation"]) for r in got} == set(rev)
    for r in got:
        v = rev[(r["region"], r["nation"])]
        assert r["revenue"] == pytest.approx(float(v), abs=0.01)
        assert r["share_of_region"] == pytest.approx(
            float(v / by_region[r["region"]]), abs=2e-6
        )
        assert r["region_share_of_total"] == pytest.approx(
            float(by_region[r["region"]] / total), abs=2e-6
        )


def test_daily_bands_q_matches_bruteforce(spark):
    """Daily p10/p50/p90 value bands via numpy linear interpolation."""
    daily: dict = defaultdict(list)
    for _, ts, _, v, etype in _events():
        if etype == "view":
            daily[ts.date()].append(v)
    got = REGISTRY["daily_bands_q"].fn(spark, SF_SMALL).collect()
    assert {r["day"] for r in got} == set(daily)
    for r in got:
        vals = np.array(daily[r["day"]])
        assert r["n"] == len(vals)
        for col, q in (("p10", 10), ("p50", 50), ("p90", 90)):
            assert r[col] == pytest.approx(
                float(np.percentile(vals, q)), abs=2e-6
            )


def test_debounce_q_matches_bruteforce(spark):
    """Sub-6h repeat counts per (user, event_type) from a plain pass."""
    streams: dict = defaultdict(list)
    for u, ts, eid, _, etype in _events():
        streams[(u, etype)].append(ts)
    expect = {}
    for key, tss in streams.items():
        n_db = sum(
            1
            for prev, cur in zip(tss, tss[1:])
            if _us(cur - prev) < 21_600_000_000
        )
        if n_db > 0:
            expect[key] = (len(tss), n_db)
    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["n_debounced"])
        for r in REGISTRY["debounce_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_session_gap_stats_q_matches_bruteforce(spark):
    """Inter-event gap distribution stats from a plain pass + numpy
    percentiles."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, _, _, _ in _events():
        streams[u].append(ts)
    gaps = [
        _us(cur - prev) / 1e6
        for tss in streams.values()
        for prev, cur in zip(tss, tss[1:])
    ]
    g = np.array(gaps)
    row = REGISTRY["session_gap_stats_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_gaps"] == len(g)
    assert row["mean_gap_s"] == pytest.approx(float(g.mean()), abs=2e-6)
    assert row["p50_gap_s"] == pytest.approx(
        float(np.percentile(g, 50)), abs=2e-6
    )
    assert row["p90_gap_s"] == pytest.approx(
        float(np.percentile(g, 90)), abs=2e-6
    )
    assert row["pct_over_30m"] == pytest.approx(
        float((g > 1800).mean()), abs=2e-6
    )


def test_flags_rollup_q_matches_bruteforce(spark):
    """Bitmask rollups from a plain pass."""
    FLAG = {"view": 1, "click": 2, "signup": 4, "purchase": 8}
    ever: dict = defaultdict(int)
    always: dict = {}
    n_ev: Counter = Counter()
    for u, _, _, _, etype in _events():
        f = FLAG.get(etype, 16)
        ever[u] |= f
        always[u] = always.get(u, f) & f
        n_ev[u] += 1
    got = REGISTRY["flags_rollup_q"].fn(spark, SF_SMALL).collect()
    assert {r["user_id"] for r in got} == set(ever)
    for r in got:
        u = r["user_id"]
        assert (
            r["ever_mask"], r["always_mask"], r["n_events"],
            r["has_purchased"],
        ) == (ever[u], always[u], n_ev[u], bool(ever[u] & 8))


def _r8_poly(s: str) -> int:
    codes = [ord(c) for c in s]
    if not codes:
        return 0
    h = codes[0]
    for c in codes[1:]:
        h = (h * 31 + c) % 1_000_000_007
    return h


def test_fair_interleave_q_matches_bruteforce(spark):
    """Round-robin interleave from the definition: per-source rank by
    content hash, global (rank, source, doc) order, first 40."""
    by_src: dict = defaultdict(list)
    for doc_id, _, source in _docs():
        by_src[source].append((_r8_poly(f"fi:{doc_id}"), doc_id))
    expect = []
    for source, lst in by_src.items():
        lst.sort()
        for rk, (_, doc_id) in enumerate(lst, 1):
            expect.append((rk, source, doc_id))
    expect.sort()
    expect = [(d, s, rk) for rk, s, d in expect[:40]]
    got = [
        (r["doc_id"], r["source"], r["rk"])
        for r in REGISTRY["fair_interleave_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_calendar_features_q_matches_bruteforce(spark):
    """Calendar feature derivation from datetime first principles."""
    import calendar as cal
    from datetime import date

    days = sorted({ts.date() for _, ts, _, _, _ in _events()})
    anchor = date(2024, 1, 1)
    got = REGISTRY["calendar_features_q"].fn(spark, SF_SMALL).collect()
    assert {r["day"] for r in got} == set(days)
    for r in got:
        d = r["day"]
        idx = (d - anchor).days
        assert r["day_idx"] == idx
        assert r["dow"] == idx % 7
        assert r["week"] == idx // 7
        assert r["month"] == d.month
        assert r["is_month_end"] == (
            d.day == cal.monthrange(d.year, d.month)[1]
        )
        assert r["dow_sin"] == pytest.approx(
            math.sin(2 * math.pi * (idx % 7) / 7), abs=1e-6
        )
        assert r["dow_cos"] == pytest.approx(
            math.cos(2 * math.pi * (idx % 7) / 7), abs=1e-6
        )


def test_skipgram_pairs_q_matches_bruteforce(spark):
    """Subsampled skip-gram pairs replayed with an independent loop:
    Mikolov keep-prob sqrt(1e-3 N / f) via the deterministic position
    hash, window +-2, top-30 pair counts."""
    import re

    docs = _docs()
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", (txt or "").lower()) if t]
        for d, txt, _ in docs
    }
    freq: Counter = Counter(w for ts in toks.values() for w in ts)
    N = sum(freq.values())
    pairs: Counter = Counter()
    for d, ts in toks.items():
        for i, center in enumerate(ts, 1):
            keep_p = min(1.0, math.sqrt(0.001 * N / freq[center]))
            if (_r8_poly(f"{d}:{i}") % 100000) / 100000 >= keep_p:
                continue
            for o in (-2, -1, 1, 2):
                j = i + o
                if 1 <= j <= len(ts):
                    pairs[(center, ts[j - 1])] += 1
    expect = sorted(
        ((n, c, x) for (c, x), n in pairs.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:30]
    expect = [(c, x, n) for n, c, x in expect]
    got = [
        (r["center"], r["context"], r["n_pairs"])
        for r in REGISTRY["skipgram_pairs_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_lang_confusion_q_matches_bruteforce(spark):
    """Stopword-vote language ID confusion matrix from first
    principles, including the en>es>de>fr argmax precedence."""
    import re

    LISTS = {
        "en": {"the", "a", "and", "of", "to", "in", "is", "it"},
        "es": {"el", "la", "de", "que", "y", "los", "en", "un"},
        "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"},
        "fr": {"le", "la", "de", "et", "est", "les", "des", "une"},
    }
    cm: Counter = Counter()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    for _, text, lang in rows:
        ts = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
        scores = {
            c: sum(1 for t in ts if t in ws) for c, ws in LISTS.items()
        }
        best = max(scores.values())
        if best == 0:
            pred = "und"
        else:
            pred = next(
                c for c in ("en", "es", "de", "fr") if scores[c] == best
            )
        cm[(lang, pred)] += 1
    support: Counter = Counter()
    correct: Counter = Counter()
    predicted: Counter = Counter()
    for (t, p), n in cm.items():
        support[t] += n
        predicted[p] += n
        if t == p:
            correct[t] += n
    got = REGISTRY["lang_confusion_q"].fn(spark, SF_SMALL).collect()
    assert {r["lang"] for r in got} == set(support)
    for r in got:
        c = r["lang"]
        assert (r["support"], r["n_correct"], r["n_predicted"]) == (
            support[c], correct[c], predicted[c],
        )
        prec = correct[c] / predicted[c] if predicted[c] else 0.0
        rec = correct[c] / support[c]
        f1 = (
            2 * prec * rec / (prec + rec)
            if predicted[c] and correct[c]
            else 0.0
        )
        assert r["precision"] == pytest.approx(prec, abs=1e-6)
        assert r["recall"] == pytest.approx(rec, abs=1e-6)
        assert r["f1"] == pytest.approx(f1, abs=1e-6)


def test_burstiness_q_matches_bruteforce(spark):
    """Goh-Barabasi burstiness per event type from per-user gap lists."""
    streams: dict = defaultdict(list)
    for u, ts, _, _, etype in _events():
        streams[(u, etype)].append(ts)
    gaps: dict = defaultdict(list)
    for (u, etype), tss in streams.items():
        for prev, cur in zip(tss, tss[1:]):
            gaps[etype].append(_us(cur - prev) / 1e6)
    got = REGISTRY["burstiness_q"].fn(spark, SF_SMALL).collect()
    assert {r["event_type"] for r in got} == set(gaps)
    for r in got:
        g = np.array(gaps[r["event_type"]])
        mean, sd = float(g.mean()), float(g.std())  # population
        assert r["n_gaps"] == len(g)
        assert r["mean_gap_s"] == pytest.approx(mean, abs=2e-6)
        assert r["sd_gap_s"] == pytest.approx(sd, abs=2e-6)
        assert r["burstiness"] == pytest.approx(
            (sd - mean) / (sd + mean), abs=2e-6
        )


def test_dp_counts_q_matches_bruteforce(spark):
    """Deterministic two-sided-geometric DP noise replayed from the
    definition (inverse-CDF on the segment hash, eps=1)."""
    con = duckdb.connect()
    segs = Counter(
        r[0]
        for r in con.execute(
            f"SELECT c_mktsegment FROM "
            f"read_parquet('{SF_SMALL}/customer.parquet')"
        ).fetchall()
    )
    got = REGISTRY["dp_counts_q"].fn(spark, SF_SMALL).collect()
    assert {r["seg"] for r in got} == set(segs)
    for r in got:
        seg = r["seg"]
        uu = ((_r8_poly(f"dp:{seg}") % 999983) + 0.5) / 999983
        if uu < 0.5:
            noise = math.floor(math.log(2 * uu) / -1.0)
        else:
            noise = -math.floor(math.log(2 * (1 - uu)) / -1.0)
        assert r["true_count"] == segs[seg]
        assert r["noise"] == noise
        assert r["released_count"] == max(segs[seg] + noise, 0)
        assert r["epsilon"] == 1.0


def test_source_similarity_q_matches_bruteforce(spark):
    """Vocabulary-profile cosine between sources over the global
    top-200 tokens, from raw counts."""
    tok_counts: Counter = Counter()
    prof: dict = defaultdict(Counter)
    for _, text, source in _docs():
        for w in _tok(text):
            tok_counts[w] += 1
            prof[source][w] += 1
    top = {
        w
        for w, _ in sorted(
            tok_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:200]
    }
    p = {s: {w: c for w, c in ws.items() if w in top} for s, ws in prof.items()}
    norms = {s: sum(c * c for c in ws.values()) for s, ws in p.items()}
    pairs = []
    srcs = sorted(p)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            dot = sum(p[sa][w] * p[sb].get(w, 0) for w in p[sa])
            if norms[sa] and norms[sb]:
                pairs.append(
                    (sa, sb, dot / math.sqrt(norms[sa] * norms[sb]))
                )
    pairs.sort(key=lambda t: (-round(t[2], 6), t[0], t[1]))
    expect = [(sa, sb) for sa, sb, _ in pairs[:30]]
    got = REGISTRY["source_similarity_q"].fn(spark, SF_SMALL).collect()
    assert [(r["sa"], r["sb"]) for r in got] == expect
    want = {(sa, sb): c for sa, sb, c in pairs}
    for r in got:
        assert r["cosine"] == pytest.approx(
            want[(r["sa"], r["sb"])], abs=1e-6
        )


def test_phrase_search_q_matches_bruteforce(spark):
    """Phrase occurrences of the global top bigram from a plain scan."""
    toks = {d: _tok(t) for d, t, _ in _docs()}
    big: Counter = Counter()
    for ts in toks.values():
        for w1, w2 in zip(ts, ts[1:]):
            big[(w1, w2)] += 1
    (w1, w2), _ = min(
        big.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )
    expect = {}
    for d, ts in toks.items():
        hits = [
            i + 1
            for i in range(len(ts) - 1)
            if ts[i] == w1 and ts[i + 1] == w2
        ]
        if hits:
            expect[d] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_position"])
        for r in REGISTRY["phrase_search_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_q_matches_bruteforce(spark):
    """Sorted-neighborhood blocking stats with an independent
    Levenshtein DP."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT c_custkey, c_name FROM "
        f"read_parquet('{SF_SMALL}/customer.parquet')"
    ).fetchall()
    blocks: dict = defaultdict(list)
    for k, name in rows:
        blocks[name[9:15]].append((name, k))
    levs = []
    for blk in blocks.values():
        blk.sort()
        for i, (na, _) in enumerate(blk):
            for j in range(i + 1, min(i + 3, len(blk))):
                levs.append(_lev(na, blk[j][0]))
    row = REGISTRY["sorted_neighborhood_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_candidates"] == len(levs)
    assert row["n_matches"] == sum(1 for v in levs if v <= 2)
    assert row["min_lev"] == min(levs)
    assert row["max_lev"] == max(levs)


def test_record_linkage_q_matches_bruteforce(spark):
    """Blocked entity-resolution pairs with an independent Levenshtein
    DP and similarity threshold."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_partkey, p_name FROM "
        f"read_parquet('{SF_SMALL}/part.parquet')"
    ).fetchall()
    blocks: dict = defaultdict(list)
    for k, name in rows:
        parts = name.split(" ")
        bk = (parts[1] if len(parts) > 1 else "") + "|" + name[:1]
        blocks[bk].append((k, name))
    expect = {}
    for blk in blocks.values():
        blk.sort()
        for i, (ka, na) in enumerate(blk):
            for kb, nb in blk[i + 1 :]:
                lv = _lev(na, nb)
                sim = 1.0 - lv / max(len(na), len(nb))
                if lv <= 4 and sim >= 0.5:
                    expect[(ka, kb)] = (lv, sim)
    got = REGISTRY["record_linkage_q"].fn(spark, SF_SMALL).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == set(expect)
    for r in got:
        lv, sim = expect[(r["id_a"], r["id_b"])]
        assert r["lev"] == lv
        assert r["sim"] == pytest.approx(sim, abs=1e-4)


def test_basket_nb_fit_q_matches_bruteforce(spark):
    """Negative-binomial method-of-moments fit of basket sizes."""
    con = duckdb.connect()
    sizes = [
        r[0]
        for r in con.execute(
            f"SELECT COUNT(*) FROM "
            f"read_parquet('{SF_SMALL}/lineitem.parquet') "
            f"GROUP BY l_orderkey"
        ).fetchall()
    ]
    n = len(sizes)
    mean = sum(sizes) / n
    var = sum((s - mean) ** 2 for s in sizes) / (n - 1)
    row = REGISTRY["basket_nb_fit_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_baskets"] == n
    assert row["mean_size"] == pytest.approx(mean, abs=1e-6)
    assert row["var_size"] == pytest.approx(var, abs=1e-6)
    want_r = mean * mean / (var - mean) if var > mean else 0.0
    assert row["nb_r"] == pytest.approx(want_r, abs=1e-5)


def test_lm_perplexity_q_matches_bruteforce(spark):
    """CCNet-style interpolated bigram/unigram perplexity + per-lang
    terciles replayed from first principles (incl. ANSI NTILE sizing)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    toks = {d: _tok(t) for d, t, _ in rows}
    lang = {d: lg for d, _, lg in rows}
    uni: Counter = Counter(w for ts in toks.values() for w in ts)
    N, V = sum(uni.values()), len(uni)
    c12: Counter = Counter()
    c1: Counter = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    ppl = {}
    for d, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        lp = Decimal(0)
        for a, b in pairs:
            term = math.log2(
                0.7 * (c12[(a, b)] + 1) / (c1[a] + V)
                + 0.3 * (uni[b] + 1) / (N + V)
            )
            lp += Decimal(repr(term)).quantize(
                Decimal("1e-12"), ROUND_HALF_UP
            )
        lp6 = float(
            lp.quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        ppl[d] = (len(pairs), round(2.0 ** (-lp6 / len(pairs)), 2))
    # per-lang NTILE(3) over (ppl asc, doc_id asc)
    bylang: dict = defaultdict(list)
    for d, (nb, p) in ppl.items():
        bylang[lang[d]].append((p, d))
    bucket = {}
    for lst in bylang.values():
        lst.sort()
        n = len(lst)
        q, r = divmod(n, 3)
        pos = 0
        for b in range(1, 4):
            size = q + (1 if b <= r else 0)
            for _, d in lst[pos : pos + size]:
                bucket[d] = b
            pos += size
    got = REGISTRY["lm_perplexity_q"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in got} == set(ppl)
    for r in got:
        nb, p = ppl[r["doc_id"]]
        assert (r["lang"], r["n_bigrams"]) == (lang[r["doc_id"]], nb)
        assert r["ppl"] == pytest.approx(p, abs=0.02)
        assert r["bucket"] == bucket[r["doc_id"]]


def test_feature_hash_q_matches_bruteforce(spark):
    """Hashing-trick vectors replayed with the independent poly hash."""
    got = REGISTRY["feature_hash_q"].fn(spark, SF_SMALL).collect()
    toks = {d: _tok(t) for d, t, _ in _docs()}
    assert {r["doc_id"] for r in got} == set(toks)
    for r in got:
        ts = toks[r["doc_id"]]
        vec = [0] * 64
        for w in ts:
            vec[_r8_poly(w) % 64] += 1
        assert r["vec"] == ";".join(str(v) for v in vec)
        assert r["nnz"] == sum(1 for v in vec if v)
        assert r["n_tokens"] == len(ts)


def test_nc_classifier_q_matches_bruteforce(spark):
    """Nearest-centroid classifier replayed in numpy: per-label means of
    even ids (6-dp quantized), rounded-d2 argmin with lowest-label tie."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    from decimal import ROUND_HALF_UP as RH

    cents = {}
    for lab in sorted({r[1] for r in rows}):
        tr = np.array(
            [r[2] for r in rows if r[1] == lab and r[0] % 2 == 0],
            dtype=np.float64,
        )
        cents[lab] = np.array(
            [
                float(Decimal(repr(v)).quantize(Decimal("1e-6"), RH))
                for v in tr.mean(0)
            ]
        )
    n_eval: Counter = Counter()
    n_corr: Counter = Counter()
    for vid, lab, v in rows:
        if vid % 2 == 0:
            continue
        x = np.array(v, dtype=np.float64)
        best = min(
            (round(float(((x - c) ** 2).sum()), 6), L)
            for L, c in cents.items()
        )[1]
        n_eval[lab] += 1
        if best == lab:
            n_corr[lab] += 1
    got = REGISTRY["nc_classifier_q"].fn(spark, SF_SMALL).collect()
    assert {r["true_label"] for r in got} == set(n_eval)
    for r in got:
        L = r["true_label"]
        assert (r["n_eval"], r["n_correct"]) == (n_eval[L], n_corr[L])
        assert r["accuracy"] == pytest.approx(
            n_corr[L] / n_eval[L], abs=1e-6
        )


def test_stratified_split_q_matches_bruteforce(spark):
    """Per-stratum 10% eval split sizes from the content-hash ranking."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, lang, COUNT(*) FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    expect = {
        (s, lg): (n, math.ceil(0.1 * n)) for s, lg, n in rows
    }
    got = {
        (r["source"], r["lang"]): (r["n_total"], r["n_eval"])
        for r in REGISTRY["stratified_split_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_margin_ratio_pairs_q_matches_bruteforce(spark):
    """Margin-ratio mining replayed in numpy (rounded cosines, top-4
    neighborhood averages, per-src argmax with margin > 1)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    ).fetchall()
    src = [(i, np.array(v)) for i, L, v in rows if L == 0 and i % 3 == 0]
    tgt = [(i, np.array(v)) for i, L, v in rows if L == 1]
    cos = {}
    for x, xv in src:
        for y, yv in tgt:
            cos[(x, y)] = round(
                float(
                    xv @ yv / (np.linalg.norm(xv) * np.linalg.norm(yv))
                ),
                4,
            )
    def avg4(keyed):
        out = {}
        for k, lst in keyed.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            top = [c for c, _ in lst[:4]]
            out[k] = round(sum(top) / len(top), 6)
        return out

    byx: dict = defaultdict(list)
    byy: dict = defaultdict(list)
    for (x, y), c in cos.items():
        byx[x].append((c, y))
        byy[y].append((c, x))
    ax, ay = avg4(byx), avg4(byy)
    expect = {}
    for x, _ in src:
        cands = sorted(
            ((round(cos[(x, y)] / (0.5 * (ax[x] + ay[y])), 6), -y, y)
             for y, _ in tgt),
            reverse=True,
        )
        m, _, y = cands[0]
        if m > 1.0:
            expect[x] = (y, cos[(x, y)], m)
    got = REGISTRY["margin_ratio_pairs_q"].fn(spark, SF_SMALL).collect()
    assert {r["src_id"] for r in got} == set(expect)
    for r in got:
        y, c, m = expect[r["src_id"]]
        assert r["tgt_id"] == y
        assert r["cos"] == pytest.approx(c, abs=1.1e-4)
        assert r["margin"] == pytest.approx(m, abs=1e-3)


def test_dataset_card_q_matches_bruteforce(spark):
    """ROLLUP dataset card replayed with plain grouping at all three
    grains."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, lang, n_chars, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    recs = [
        (s, lg, nc, len(t.split(" ")), _r8_poly(t))
        for s, lg, nc, t in rows
    ]

    def card(sel):
        chars = [nc for _, _, nc, _, _ in sel]
        return (
            len(sel),
            sum(chars),
            sum(nt for _, _, _, nt, _ in sel),
            len({h for _, _, _, _, h in sel}),
            1.0 - len({h for _, _, _, _, h in sel}) / len(sel),
            float(np.percentile(chars, 50)),
            float(np.percentile(chars, 90)),
        )

    expect = {("<all>", "<all>"): card(recs)}
    for s in {r[0] for r in recs}:
        sel = [r for r in recs if r[0] == s]
        expect[(s, "<all>")] = card(sel)
        for lg in {r[1] for r in sel}:
            expect[(s, lg)] = card([r for r in sel if r[1] == lg])
    got = REGISTRY["dataset_card_q"].fn(spark, SF_SMALL).collect()
    assert {(r["source"], r["lang"]) for r in got} == set(expect)
    for r in got:
        n, tc, tt, nd, dr, p50, p90 = expect[(r["source"], r["lang"])]
        assert (
            r["n_docs"], r["total_chars"], r["total_tokens"],
            r["n_distinct_texts"],
        ) == (n, tc, tt, nd)
        assert r["dup_rate"] == pytest.approx(dr, abs=1e-6)
        assert r["p50_chars"] == pytest.approx(p50, abs=1e-6)
        assert r["p90_chars"] == pytest.approx(p90, abs=1e-6)


def test_dedup_cluster_stats_q_matches_bruteforce(spark):
    """Template-hash cluster size histogram from plain counting."""
    sizes: Counter = Counter()
    for _, text, _ in _docs():
        ts = _tok(text)
        if len(ts) >= 8:
            sizes[_r8_poly(" ".join(ts[:8]))] += 1
    hist: Counter = Counter(sizes.values())
    got = REGISTRY["dedup_cluster_stats_q"].fn(spark, SF_SMALL).collect()
    assert {r["cluster_size"] for r in got} == set(hist)
    for r in got:
        sz = r["cluster_size"]
        assert r["n_clusters"] == hist[sz]
        assert r["n_docs"] == hist[sz] * sz
        assert r["n_dropped_if_deduped"] == hist[sz] * (sz - 1)


def test_label_propagation_q_matches_bruteforce(spark):
    """Two synchronous label-propagation rounds replayed with dicts
    (round 1 degenerates to min-neighbor on a simple graph; round 2
    votes over neighbors' round-1 labels with (count desc, label) ties)."""
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet') a
        JOIN read_parquet('{SF_SMALL}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    nbrs: dict = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    l1 = {n: min(ms) for n, ms in nbrs.items()}  # all pair counts are 1
    l2 = {}
    for n, ms in nbrs.items():
        votes: Counter = Counter(l1[m] for m in ms)
        l2[n] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    comm: Counter = Counter(l2.values())
    expect = sorted(
        ((n, c) for c, n in comm.items()), key=lambda t: (-t[0], t[1])
    )[:25]
    got = [
        (r["n_members"], r["community"])
        for r in REGISTRY["label_propagation_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_star_components_q_matches_bruteforce(spark):
    """Connected components of the per-customer order chains via an
    independent union-find."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_orderdate, o_orderkey FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet') "
        f"WHERE o_custkey % 100 = 0 ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    chains: dict = defaultdict(list)
    for c, _, k in rows:
        chains[c].append(k)
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ks in chains.values():
        for k in ks:
            parent[k] = k
        for a, b in zip(ks, ks[1:]):
            parent[find(a)] = find(b)
    comp: dict = defaultdict(list)
    for ks in chains.values():
        if len(ks) < 2:
            continue  # no edges: node never enters the reach set
        for k in ks:
            comp[find(k)].append(k)
    expect = {min(ms): len(ms) for ms in comp.values()}
    got = {
        r["component"]: r["chain_len"]
        for r in REGISTRY["star_components_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_ccnet_bucket_q_matches_bruteforce(spark):
    """CCNet perplexity tertiles replayed: space-split unigram LM,
    12-dp-quantized log-probs, per-source ANSI NTILE(3)."""
    vocab: Counter = Counter()
    docs = []
    for doc_id, text, source in _docs():
        if text == "":
            continue
        ws = text.split(" ")
        docs.append((doc_id, source, ws))
        vocab.update(ws)
    n_total = sum(vocab.values())
    logp = {
        w: Decimal(repr(round(math.log(c / n_total), 12)))
        for w, c in vocab.items()
    }
    per_doc = []
    for doc_id, source, ws in docs:
        s = sum(logp[w] for w in ws)
        ppl = round(math.exp(-float(s) / len(ws)), 6)
        per_doc.append((source, ppl, doc_id))
    bysrc: dict = defaultdict(list)
    for source, ppl, doc_id in per_doc:
        bysrc[source].append((ppl, doc_id))
    agg: dict = defaultdict(lambda: [0, Decimal(0)])
    for source, lst in bysrc.items():
        lst.sort()
        n = len(lst)
        q, r = divmod(n, 3)
        pos = 0
        for t, name in ((1, "head"), (2, "middle"), (3, "tail")):
            size = q + (1 if t <= r else 0)
            for ppl, _ in lst[pos : pos + size]:
                cell = agg[(source, name)]
                cell[0] += 1
                cell[1] += Decimal(repr(ppl))
            pos += size
    got = REGISTRY["ccnet_bucket_q"].fn(spark, SF_SMALL).collect()
    assert {(r["source"], r["bucket"]) for r in got} == {
        k for k, v in agg.items() if v[0]
    }
    for r in got:
        n, s = agg[(r["source"], r["bucket"])]
        assert r["n_docs"] == n
        assert r["mean_ppl"] == pytest.approx(float(s) / n, abs=2e-6)


def test_rake_keywords_q_matches_bruteforce(spark):
    """RAKE top-3 phrases replayed with plain loops: stopword-split
    phrases, per-doc word deg/freq scores, phrase score = sum of member
    word scores, ties to phrase asc."""
    STOPS = {
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "on", "for", "with", "as", "at", "by", "be", "are", "was",
        "this", "that", "from",
    }
    expect = {}
    for doc_id, text, _ in _docs():
        ts = _tok(text)
        phrases: dict = defaultdict(list)  # grp -> [(i, tok)]
        grp = 0
        for i, tok in enumerate(ts, 1):
            if tok in STOPS:
                grp += 1
            else:
                phrases[grp].append(tok)
        if not phrases:
            continue
        freq: Counter = Counter()
        deg: Counter = Counter()
        for words in phrases.values():
            for wd in words:
                freq[wd] += 1
                deg[wd] += len(words)
        scored: dict = {}
        for words in phrases.values():
            phrase = " ".join(words)
            score = round(
                float(
                    sum(
                        Decimal(repr(deg[wd] / freq[wd])).quantize(
                            Decimal("1e-12"), ROUND_HALF_UP
                        )
                        for wd in words
                    )
                ),
                6,
            )
            scored[phrase] = max(scored.get(phrase, score), score)
        top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expect[doc_id] = [
            (p, s, rk) for rk, (p, s) in enumerate(top, 1)
        ]
    got: dict = defaultdict(list)
    for r in REGISTRY["rake_keywords_q"].fn(spark, SF_SMALL).collect():
        got[r["doc_id"]].append((r["rank"], r["phrase"], r["score"]))
    assert set(got) == set(expect)
    for d, lst in got.items():
        lst.sort()
        for (rk, p, s), (ep, es, erk) in zip(lst, expect[d]):
            assert (rk, p) == (erk, ep)
            assert s == pytest.approx(es, abs=2e-6)


def test_compaction_plan_q_matches_bruteforce(spark):
    """First-fit-by-size compaction binning replayed with a running
    sum over the sorted synthetic file list."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet') WHERE o_orderkey % 7 = 3"
    ).fetchall()
    files = sorted(
        (
            int(math.floor(p * 100)) % 134217728,
            f"part-{k:09d}",
        )
        for k, p in rows
    )
    files.sort(key=lambda t: (-t[0], t[1]))
    bins: dict = defaultdict(lambda: [0, 0, None])
    cum = 0
    for b, f in files:
        cum += b
        bn = (cum - 1) // 268435456
        cell = bins[bn]
        cell[0] += 1
        cell[1] += b
        cell[2] = f if cell[2] is None else min(cell[2], f)
    got = REGISTRY["compaction_plan_q"].fn(spark, SF_SMALL).collect()
    assert {r["bin"] for r in got} == set(bins)
    for r in got:
        n, bb, ff = bins[r["bin"]]
        assert (r["n_files"], r["bin_bytes"], r["first_file"]) == (n, bb, ff)


def test_try_parse_q_matches_bruteforce(spark):
    """TRY_CAST quarantine counters replayed with Python parsing over
    the synthesized corruptions."""
    import json as J

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, props, ts FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    ).fetchall()
    n_rows, bad_ints, bad_dates, k_sum = 0, 0, 0, 0
    for eid, props, ts in rows:
        n_rows += 1
        k = J.loads(props).get("k") if props else None
        k_raw = (str(k) + "x") if eid % 7 == 3 else str(k)
        try:
            k_sum += int(k_raw)
        except (TypeError, ValueError):
            bad_ints += 1
        if eid % 11 == 5:
            bad_dates += 1  # 'not-a-date' never parses
    row = REGISTRY["try_parse_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_rows"] == n_rows
    assert row["bad_ints"] == bad_ints
    assert row["bad_dates"] == bad_dates
    assert row["k_sum"] == k_sum


def test_doc_cosine_sparse_q_matches_bruteforce(spark):
    """Sparse TF-IDF top-20 pair cosines replayed with dict arithmetic;
    candidates restricted to rare-token (df*10 <= N) co-occurrence
    exactly as the engines define them."""
    toks = {d: _tok(t) for d, t, _ in _docs()}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    nd = len(tf)
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    w = {
        d: {t: n * math.log(nd / df[t]) for t, n in c.items()}
        for d, c in tf.items()
    }
    norms = {d: sum(v * v for v in ws.values()) for d, ws in w.items()}
    rare = {t for t, c in df.items() if c * 10 <= nd}
    bytok: dict = defaultdict(list)
    for d, c in tf.items():
        for t in c:
            if t in rare:
                bytok[t].append(d)
    cand = set()
    for ds in bytok.values():
        ds.sort()
        for i, da in enumerate(ds):
            for db in ds[i + 1 :]:
                cand.add((da, db))
    scored = []
    for da, db in cand:
        dot = sum(
            wa * w[db][t] for t, wa in w[da].items() if t in w[db]
        )
        scored.append((da, db, dot / math.sqrt(norms[da] * norms[db])))
    scored.sort(key=lambda t: (-t[2], t[0], t[1]))
    got = REGISTRY["doc_cosine_sparse_q"].fn(spark, SF_SMALL).collect()
    assert [(r["da"], r["db"]) for r in got] == [
        (da, db) for da, db, _ in scored[:20]
    ]
    want = {(da, db): c for da, db, c in scored}
    for r in got:
        assert r["cosine"] == pytest.approx(
            want[(r["da"], r["db"])], abs=2e-6
        )


def _mh_shingles(text: str) -> set:
    t = text or ""
    if not t:
        return set()
    if len(t) <= 5:
        return {_r8_poly(t)}
    return {_r8_poly(t[i : i + 5]) for i in range(len(t) - 4)}


def _mh_bands(hs: set, num_perm: int = 16, rows: int = 4) -> list:
    """(band, bucket) keys: minhash_j = min((1000003j+1)h + (7919j+12345)
    mod p); bucket = first-element-seeded 31-fold over the band's
    signatures in j order."""
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


def test_lsh_precision_eval_q_matches_bruteforce(spark):
    """Band-candidate precision replayed end to end: independent shingle
    hashing, minhash permutations, band buckets, exact Jaccard verify."""
    shingles = {d: _mh_shingles(t) for d, t, _ in _docs()}
    buckets: dict = defaultdict(list)
    for d, hs in shingles.items():
        if not hs:
            continue
        for key in _mh_bands(hs):
            buckets[key].append(d)
    cand = set()
    for ds in buckets.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    n_true = 0
    for a, b in cand:
        ha, hb = shingles[a], shingles[b]
        inter = len(ha & hb)
        j = round(inter / (len(ha) + len(hb) - inter), 4)
        if j >= 0.7:
            n_true += 1
    row = REGISTRY["lsh_precision_eval_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_candidates"] == len(cand)
    assert row["n_true"] == n_true
    assert row["precision_at_07"] == pytest.approx(
        n_true / len(cand), abs=1e-6
    )


def test_incremental_neardup_q_matches_bruteforce(spark):
    """Batch-vs-corpus near-dup flags replayed with the same independent
    MinHash/band machinery (batch = doc_id%20==7, threshold 0.6)."""
    shingles = {d: _mh_shingles(t) for d, t, _ in _docs()}
    batch_b: dict = defaultdict(list)
    corpus_b: dict = defaultdict(list)
    for d, hs in shingles.items():
        if not hs:
            continue
        tgt = batch_b if d % 20 == 7 else corpus_b
        for key in _mh_bands(hs):
            tgt[key].append(d)
    cand = {
        (bd, cd)
        for key, bds in batch_b.items()
        for bd in bds
        for cd in corpus_b.get(key, ())
    }
    expect = {}
    for bd, cd in cand:
        ha, hb = shingles[bd], shingles[cd]
        inter = len(ha & hb)
        j = round(inter / (len(ha) + len(hb) - inter), 4)
        if j >= 0.6:
            expect[(bd, cd)] = j
    got = {
        (r["batch_id"], r["corpus_id"]): r["jaccard"]
        for r in REGISTRY["incremental_neardup_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expect)
    for k, v in got.items():
        assert v == pytest.approx(expect[k], abs=1e-4)


def test_hll_intersect_q_exact_values_match_bruteforce(spark):
    """The checked (exact) values of the sketch-algebra query: set sizes
    and exact intersection from plain Python sets; the bound flag must
    hold."""
    viewers, buyers = set(), set()
    for u, _, _, _, etype in _events():
        if etype == "view":
            viewers.add(u)
        elif etype == "purchase":
            buyers.add(u)
    row = REGISTRY["hll_intersect_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_a"] == len(viewers)
    assert row["n_b"] == len(buyers)
    assert row["exact_inter"] == len(viewers & buyers)
    assert row["est_within_bound"] is True


def test_canonical_longest_q_matches_bruteforce(spark):
    """The full headline dedup-apply pipeline replayed independently:
    fake-path phash bits, 4x16 band buckets, Hamming<=3 verify,
    union-find components, longest-doc canonical (ties lowest id)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    bandsets: dict = {}
    words: dict = {}
    nchars: dict = {}
    for doc_id, text, nc in rows:
        payload = b"#" + (text or "").encode("utf-8")
        px = [payload[p % len(payload)] for p in range(64)]
        total = sum(px)
        bits = [1 if 64 * v > total else 0 for v in px]
        bands = [
            sum(bits[16 * j + k] << k for k in range(16)) for j in range(4)
        ]
        word = sum(b << (16 * j) for j, b in enumerate(bands))
        bandsets[doc_id] = bands
        words[doc_id] = word
        nchars[doc_id] = nc
    buckets: dict = defaultdict(list)
    for d, bands in bandsets.items():
        for j, v in enumerate(bands):
            buckets[(j, v)].append(d)
    pairs = set()
    for ds in buckets.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                if bin(words[a] ^ words[b]).count("1") <= 3:
                    pairs.add((a, b))
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = defaultdict(list)
    for d in parent:
        comp[find(d)].append(d)
    expect = {}
    for rep, members in comp.items():
        best = min(members, key=lambda d: (-nchars[d], d))
        for d in members:
            expect[d] = (rep, nchars[d], d == best)
    got = {
        r["doc_id"]: (r["component"], r["n_chars"], r["is_canonical"])
        for r in REGISTRY["canonical_longest_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect
    assert expect, "fixture must contain at least one near-dup cluster"


def test_span_dedup_trim_matches_bruteforce(spark):
    """Lee-et-al span-removal accounting replayed with plain sets:
    5-token span hashes, cross-document flags (>=2 distinct docs),
    per-doc covered-position union."""
    toks = {d: _tok(t) for d, t, _ in _docs()}
    span_docs: dict = defaultdict(set)
    doc_spans: dict = defaultdict(list)
    for d, ts in toks.items():
        for i in range(len(ts) - 4):
            h = _r8_poly(" ".join(ts[i : i + 5]))
            span_docs[h].add(d)
            doc_spans[d].append((i, h))
    flagged = {h for h, ds in span_docs.items() if len(ds) >= 2}
    expect = {}
    for d, ts in toks.items():
        covered: set = set()
        for i, h in doc_spans[d]:
            if h in flagged:
                covered.update(range(i, i + 5))
        expect[d] = (len(ts), len(covered), len(ts) - len(covered))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_covered"], r["n_kept"])
        for r in REGISTRY["span_dedup_trim"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect
    assert any(c for _, c, _ in expect.values()), (
        "fixture must contain at least one flagged span"
    )


def test_pipeline_clean_corpus_matches_bruteforce(spark):
    """The full cleaning pipeline replayed independently: quality score,
    stopword language vote (en precedence), exact dedup keep-min,
    MinHash/band near-dup removal (drop higher id), whitespace token
    counts."""
    import re
    from decimal import ROUND_HALF_UP as RH

    EN = {"the", "a", "and", "of", "to", "in", "is", "it"}
    ES = {"el", "la", "de", "que", "y", "los", "en", "un"}
    DE = {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"}
    FR = {"le", "la", "de", "et", "est", "les", "des", "une"}
    survivors = {}
    for doc_id, text, _ in _docs():
        t = text or ""
        n = len(t)
        low = t.lower()
        n_punct = sum(1 for c in low if not (c.isdigit() or "a" <= c <= "z" or c == " "))
        toks = _tok(t)
        stop_ratio = (
            sum(1 for w in toks if w in EN) / len(toks) if toks else 0.0
        )
        raw = (
            0.4 * (1 - (n_punct / n if n else 0))
            + 0.3 * min(stop_ratio * 5, 1.0)
            + 0.3 * min(n / 500, 1.0)
        )
        quality = float(
            Decimal(repr(raw)).quantize(Decimal("1e-4"), RH)
        )
        counts = [
            sum(1 for w in toks if w in ws) for ws in (EN, ES, DE, FR)
        ]
        is_en = max(counts) > 0 and counts[0] == max(counts)
        if quality >= 0.5 and is_en:
            survivors[doc_id] = (t, quality)
    # exact dedup: keep min doc_id per text
    by_text: dict = {}
    for d in sorted(survivors):
        by_text.setdefault(survivors[d][0], d)
    exact = {d: survivors[d] for d in by_text.values()}
    # near-dup removal: drop the higher id of any pair with J >= 0.7
    shingles = {d: _mh_shingles(t) for d, (t, _) in exact.items()}
    buckets: dict = defaultdict(list)
    for d, hs in shingles.items():
        if not hs:
            continue
        for key in _mh_bands(hs):
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
    expect = {}
    for d, (t, q) in exact.items():
        if d in dropped:
            continue
        toks_ws = [x for x in re.split(r"\s+", t.strip()) if x]
        expect[d] = (q, len(toks_ws))
    got = {
        r["doc_id"]: (r["quality"], r["n_tokens"])
        for r in REGISTRY["pipeline_clean_corpus"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expect)
    for d, (q, nt) in got.items():
        eq, ent = expect[d]
        assert nt == ent
        assert q == pytest.approx(eq, abs=1.1e-4)
    assert expect


def test_knn_bruteforce_matches_numpy(spark):
    """Exact top-5 cosine neighbors for the 10 query vectors replayed
    with numpy (rounded-cosine ranking, id tiebreak)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    expect = {}
    for qi, q in enumerate(ids):
        if q >= 10:
            continue
        cos = (X @ X[qi]) / (norms * norms[qi])
        scored = sorted(
            (round(float(cos[ci]), 4), -c, c)
            for ci, c in enumerate(ids)
            if c != q
        )
        top = [(c, s) for s, _, c in reversed(scored[-5:])]
        expect[q] = top
    got: dict = defaultdict(list)
    for r in REGISTRY["knn_bruteforce"].fn(spark, SF_SMALL).collect():
        got[r["query_id"]].append((r["rn"], r["neighbor_id"], r["cos"]))
    assert set(got) == set(expect)
    for q, lst in got.items():
        lst.sort()
        assert [n for _, n, _ in lst] == [n for n, _ in expect[q]]
        for (_, _, c), (_, ec) in zip(lst, expect[q]):
            assert c == pytest.approx(ec, abs=1.1e-4)


def test_asof_join_matches_bruteforce(spark):
    """Per purchase, the latest click at or before it (left join)."""
    clicks: dict = defaultdict(list)
    purchases = []
    for u, ts, eid, _, etype in _events():
        if etype == "click":
            clicks[u].append((ts, eid))
        elif etype == "purchase":
            purchases.append((u, ts, eid))
    expect = {}
    for u, ts, eid in purchases:
        cand = [(cts, cid) for cts, cid in clicks.get(u, ()) if cts <= ts]
        expect[eid] = (u, max(cand) if cand else None)
    got = REGISTRY["asof_join"].fn(spark, SF_SMALL).collect()
    assert {r["purchase_id"] for r in got} == set(expect)
    for r in got:
        u, best = expect[r["purchase_id"]]
        assert r["user_id"] == u
        if best is None:
            assert r["click_id"] is None and r["click_ts"] is None
        else:
            assert (r["click_ts"], r["click_id"]) == best


def test_session_window_matches_bruteforce(spark):
    """30-minute-gap sessionization replayed with a plain scan: new
    session when the gap >= 30 min; session stats per (user, session)."""
    from decimal import ROUND_HALF_UP as RH

    streams: dict = defaultdict(list)
    for u, ts, eid, v, _ in _events():
        streams[u].append((ts, v))
    expect: dict = {}
    for u, rows in streams.items():
        sess = []
        for ts, v in rows:
            if not sess or _us(ts - sess[-1][-1][0]) >= 30 * 60 * 1_000_000:
                sess.append([])
            sess[-1].append((ts, v))
        for s in sess:
            total = sum(
                (Decimal(repr(v)).quantize(Decimal("1e-4"), RH) for _, v in s),
                Decimal(0),
            )
            expect[(u, s[0][0])] = (len(s), round(float(total), 2))
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in REGISTRY["session_window"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for k, (n, sv) in got.items():
        en, esv = expect[k]
        assert n == en
        assert sv == pytest.approx(esv, abs=0.01)


def test_bpe_learn64_matches_bruteforce(spark):
    """64 BPE merge rounds replayed with the textbook algorithm over the
    frequency-weighted word vocabulary: pair counts weighted by word
    freq, (count desc, pair asc) selection, left-to-right
    non-overlapping merge application."""
    vocab: Counter = Counter()
    for _, text, _ in _docs():
        vocab.update(_tok(text))
    segs = {w: list(w) for w in vocab}
    expect = []
    for _ in range(64):
        counts: Counter = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append(pair)
        a, b = pair
        for w in vocab:
            s = segs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    got = sorted(
        (r["rank"], r["a"], r["b"])
        for r in REGISTRY["bpe_learn64"].fn(spark, SF_SMALL).collect()
    )
    assert got == [(i + 1, a, b) for i, (a, b) in enumerate(expect)]


def test_wilson_ci_q_matches_bruteforce(spark):
    """Wilson intervals recomputed from the closed form over plain-loop
    per-user step flags."""
    flags: dict = defaultdict(lambda: [0, 0, 0])
    for u, _ts, _eid, _v, etype in _events():
        if etype == "view":
            flags[u][0] = 1
        elif etype == "click":
            flags[u][1] = 1
        elif etype == "purchase":
            flags[u][2] = 1
    n1 = sum(f[0] for f in flags.values())
    k1 = sum(f[0] * f[1] for f in flags.values())
    n2 = sum(f[1] for f in flags.values())
    k2 = sum(f[1] * f[2] for f in flags.values())

    def wilson(k, n):
        p = k / n
        root = math.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
        lo = (p + 1.9208 / n - 1.96 * root) / (1 + 3.8416 / n)
        hi = (p + 1.9208 / n + 1.96 * root) / (1 + 3.8416 / n)
        return p, lo, hi

    expect = {
        "view->click": (n1, k1, *wilson(k1, n1)),
        "click->purchase": (n2, k2, *wilson(k2, n2)),
    }
    rows = REGISTRY["wilson_ci_q"].fn(spark, SF_SMALL).collect()
    assert {r["step"] for r in rows} == set(expect)
    for r in rows:
        n, k, rate, lo, hi = expect[r["step"]]
        assert (r["n"], r["k"]) == (n, k)
        assert r["rate"] == pytest.approx(rate, abs=2e-6)
        assert r["wilson_lo"] == pytest.approx(lo, abs=2e-6)
        assert r["wilson_hi"] == pytest.approx(hi, abs=2e-6)


# ---------------------------------------------------------------------------
# Round-8 additions (registered + windowed this round): OHLC bars,
# tokenizer fertility, bigram coverage curve.
# ---------------------------------------------------------------------------


def test_ohlc_bars_q_matches_bruteforce(spark):
    """Daily OHLC recomputed with plain loops: open/close by explicit
    (epoch_us, event_id) ordering, volume summed in Decimal(6dp)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS us, event_id,
               CAST(value AS DOUBLE) AS v
        FROM read_parquet('{SF_SMALL}/events.parquet')
        WHERE event_type = 'purchase'
        """
    ).fetchall()
    acc = defaultdict(list)
    for day, us, eid, v in rows:
        acc[day].append((us, eid, v))
    got = {
        r["day"]: r
        for r in REGISTRY["ohlc_bars_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(acc)
    for day, evs in acc.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        r = got[day]
        assert r["open_value"] == evs[0][2]
        assert r["close_value"] == evs[-1][2]
        assert r["high_value"] == max(vals)
        assert r["low_value"] == min(vals)
        assert r["n_events"] == len(evs)
        vol = sum(
            Decimal(repr(v)).quantize(Decimal("1e-6")) for v in vals
        )
        assert r["volume"] == pytest.approx(float(vol), abs=1e-9)


def test_tokenizer_fertility_q_matches_bruteforce(spark):
    """Fertility/compression per language recomputed with Python re over
    the same BPE-ish pattern the engine uses."""
    import re

    from iniz_exporters_spark.queries import BPE_ISH

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    pat = re.compile(BPE_ISH)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, bpe, ws, chars
    for lang, text in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += len(pat.findall(text or ""))
        a[2] += len((text or "").split())
        a[3] += len(text or "")
    got = {
        r["lang"]: r
        for r in REGISTRY["tokenizer_fertility_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, bpe, ws, chars) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["n_bpe_tokens"], r["n_ws_tokens"]) == (
            nd, bpe, ws,
        )
        assert r["fertility"] == pytest.approx(bpe / ws, abs=1e-6)
        assert r["chars_per_token"] == pytest.approx(
            chars / bpe, abs=1e-6
        )


def test_ngram_coverage_q_matches_bruteforce(spark):
    """Coverage curve recomputed from a Counter of word bigrams with
    (count desc, bigram asc) ranking."""
    cnt = Counter()
    for _, text, _ in _docs():
        toks = _tok(text)
        for i in range(len(toks) - 1):
            cnt[toks[i] + " " + toks[i + 1]] += 1
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r["k"]: r
        for r in REGISTRY["ngram_coverage_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == {10, 50, 100, 500}
    for k in (10, 50, 100, 500):
        used = min(k, len(ranked))
        cum = sum(c for _, c in ranked[:used])
        assert got[k]["vocab_used"] == used
        assert got[k]["coverage"] == pytest.approx(cum / total, abs=1e-6)


def test_pq_adc_topk_matches_bruteforce(spark):
    """Full PQ pipeline recomputed with plain Python: codebook init = the
    k lowest-id vectors sliced per subspace; one Lloyd round (assign with
    6-dp-rounded sequential-fold distances, tie -> smaller cid; means
    re-quantized to 6 dp decimal); final assignment; ADC = sum of the four
    unrounded subspace LUT distances, rounded to 6 dp; top-5 per query by
    (adc, vec_id). Mirrors operators/clustering.pq_model semantics."""
    M, SUBDIM, K = 4, 16, 4

    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding::DOUBLE[] FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    )

    def rnd6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
        )

    def sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    ids = sorted(vecs)
    sub = {
        j: {i: vecs[i][j * SUBDIM : (j + 1) * SUBDIM] for i in ids}
        for j in range(M)
    }
    books = {j: [sub[j][i] for i in ids[:K]] for j in range(M)}

    def assign(j, books_j):
        out = {}
        for i in ids:
            best = min(
                range(K),
                key=lambda c: (rnd6(sqdist(sub[j][i], books_j[c])), c),
            )
            out[i] = best
        return out

    # one Lloyd round: assign -> decimal-quantized means -> reassign
    for j in range(M):
        a0 = assign(j, books[j])
        new = []
        for c in range(K):
            members = [sub[j][i] for i in ids if a0[i] == c]
            assert members, "empty cluster would raise in pq_model"
            new.append(
                [
                    float(
                        Decimal(repr(math.fsum(col) / len(members))).quantize(
                            Decimal("1e-6"), rounding=ROUND_HALF_UP
                        )
                    )
                    for col in zip(*members)
                ]
            )
        books[j] = new
    codes = {j: assign(j, books[j]) for j in range(M)}

    expect = {}
    for qid in (i for i in ids if i < 3):
        luts = {
            j: [sqdist(sub[j][qid], books[j][c]) for c in range(K)]
            for j in range(M)
        }
        scored = [
            (rnd6(math.fsum(luts[j][codes[j][i]] for j in range(M))), i)
            for i in ids
            if i != qid
        ]
        scored.sort()
        expect[qid] = scored[:5]

    got = defaultdict(dict)
    for r in REGISTRY["pq_adc_topk"].fn(spark, SF_SMALL).collect():
        got[r["query_id"]][r["rn"]] = (r["adc_dist"], r["neighbor_id"])
    assert set(got) == set(expect)
    for qid, top in expect.items():
        assert sorted(got[qid]) == [1, 2, 3, 4, 5]
        for rn, (dist, nid) in enumerate(top, 1):
            gd, gn = got[qid][rn]
            assert gn == nid, (qid, rn, gn, nid)
            assert gd == pytest.approx(dist, abs=1e-6)


# ---------------------------------------------------------------------------
# Session-2 additions: rank statistics, survival, diversity.
# ---------------------------------------------------------------------------


def _avg_ranks(values):
    """value -> tie-averaged rank (1-based), plain sort + ties loop."""
    svals = sorted(values)
    ranks, i = {}, 0
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        ranks[svals[i]] = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        i = j
    return ranks


def test_mann_whitney_q_matches_bruteforce(spark):
    """Rank-sum U and tie-corrected z replayed with a plain sort."""
    vals1, vals2 = [], []
    for _, _, _, v, etype in _events():
        if etype == "purchase":
            vals1.append(v)
        elif etype == "click":
            vals2.append(v)
    pooled = vals1 + vals2
    ranks = _avg_ranks(pooled)
    n1, n2 = len(vals1), len(vals2)
    r1 = sum(ranks[v] for v in vals1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    cnt = Counter(pooled)
    ties = sum(c * c * c - c for c in cnt.values())
    n = n1 + n2
    mu = n1 * n2 / 2.0
    sig2 = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
    z = (u1 - mu) / math.sqrt(sig2)
    row = REGISTRY["mann_whitney_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u_stat"] == pytest.approx(u1, abs=1e-9)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


def test_spearman_corr_q_matches_bruteforce(spark):
    """Spearman rho (tie-averaged ranks + Pearson) replayed in numpy."""
    import re

    xs, ys = [], []
    for _, text, _ in _docs():
        xs.append(len(text))
        t = (text or "").strip()
        ys.append(len([w for w in re.split(r"\s+", t) if w]) if t else 0)
    rx_map, ry_map = _avg_ranks(xs), _avg_ranks(ys)
    rx = np.array([rx_map[v] for v in xs])
    ry = np.array([ry_map[v] for v in ys])
    rho = np.corrcoef(rx, ry)[0, 1]
    row = REGISTRY["spearman_corr_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_rows"] == len(xs)
    assert row["spearman_rho"] == pytest.approx(rho, abs=2e-6)


def test_km_survival_q_matches_bruteforce(spark):
    """Kaplan-Meier curve replayed with a per-user loop."""
    su, la, pu = {}, {}, {}
    for u, ts, _, _, etype in _events():
        if etype == "signup" and (u not in su or ts < su[u]):
            su[u] = ts
        if u not in la or ts > la[u]:
            la[u] = ts
    for u, ts, _, _, etype in _events():
        if etype == "purchase" and u in su and ts >= su[u]:
            if u not in pu or ts < pu[u]:
                pu[u] = ts
    durs = []  # (duration_days, observed)
    for u, t0 in su.items():
        end = pu.get(u, la[u])
        durs.append(((end.date() - t0.date()).days, u in pu))
    expect = {}
    surv, at_risk = 1.0, len(durs)
    for t in sorted({d for d, _ in durs}):
        d_t = sum(1 for d, obs in durs if d == t and obs)
        m_t = sum(1 for d, _ in durs if d == t)
        if d_t > 0:
            surv *= (at_risk - d_t) / at_risk
            expect[t] = (at_risk, d_t, surv)
        at_risk -= m_t
    got = {
        r["duration_days"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in REGISTRY["km_survival_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for t, (nr, ne, s) in expect.items():
        assert got[t][0] == nr and got[t][1] == ne
        assert got[t][2] == pytest.approx(s, abs=2e-6)


def test_distinct_ngram_diversity_q_matches_bruteforce(spark):
    """Per-source distinct-1/distinct-2 replayed with Counters."""
    uni, big, ndocs = defaultdict(list), defaultdict(list), Counter()
    for _, text, source in _docs():
        toks = _tok(text)
        ndocs[source] += 1
        uni[source].extend(toks)
        big[source].extend(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    got = {
        r["source"]: r
        for r in REGISTRY["distinct_ngram_diversity_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(ndocs)
    for src, r in got.items():
        u, b = uni[src], big[src]
        assert r["n_docs"] == ndocs[src]
        assert r["u_total"] == len(u)
        assert r["u_distinct"] == len(set(u))
        assert r["distinct_1"] == pytest.approx(
            len(set(u)) / len(u), abs=2e-6
        )
        assert r["b_total"] == len(b)
        assert r["b_distinct"] == len(set(b))
        assert r["distinct_2"] == pytest.approx(
            len(set(b)) / len(b), abs=2e-6
        )
