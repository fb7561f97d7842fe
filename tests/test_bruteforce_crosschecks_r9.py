"""Third-implementation cross-checks for the round-9 window batch.

Same contract as the r6/r7/r8 files: plain-Python/numpy recomputation,
independent of both engines, so each query enters its driver window
already triple-verified (Spark plan, DuckDB oracle, this replica).
"""

import math
import re
from collections import Counter, defaultdict
from decimal import Decimal

import duckdb
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
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def test_good_turing_q_matches_bruteforce(spark):
    """Trigram freq-of-freqs + smoothed r* replayed with Counters."""
    grams = Counter()
    for _, text, _ in _docs():
        toks = _tok(text)
        grams.update(
            f"{a} {b} {c}" for a, b, c in zip(toks, toks[1:], toks[2:])
        )
    ff = Counter(grams.values())
    n_tokens = sum(r * n for r, n in ff.items())
    got = {
        r["r"]: r
        for r in REGISTRY["good_turing_q"].fn(spark, SF_SMALL).collect()
    }
    expect_rs = {r for r in ff if r <= 5}
    assert set(got) == expect_rs
    for r in expect_rs:
        row = got[r]
        assert row["n_r"] == ff[r]
        assert row["r_star"] == pytest.approx(
            (r + 1) * ff.get(r + 1, 0) / ff[r], abs=2e-6
        )
        assert row["mass"] == pytest.approx(
            ff[r] * r / n_tokens, abs=2e-6
        )
        assert row["p0_unseen_mass"] == pytest.approx(
            ff[1] / n_tokens, abs=2e-6
        )


def test_hill_tail_index_q_matches_bruteforce(spark):
    """Hill estimator replayed with a plain sort."""
    lens = sorted(
        ((len(t), d) for d, t, _ in _docs()),
        key=lambda p: (-p[0], p[1]),
    )[:200]
    xs = [x for x, _ in lens]
    x_k, k = min(xs), len(xs)
    sum_ln = sum(math.log(x / x_k) for x in xs if x > x_k)
    alpha = (k - 1) / sum_ln
    row = REGISTRY["hill_tail_index_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["k"] == k and row["x_k"] == x_k
    assert row["hill_alpha"] == pytest.approx(alpha, abs=2e-6)


def test_mann_kendall_q_matches_bruteforce(spark):
    """S statistic, tie correction, and z replayed with loops."""
    daily = defaultdict(Decimal)
    for _, ts, _, v, etype in _events():
        if etype == "purchase":
            daily[ts.date()] += Decimal(str(v)).quantize(
                Decimal("0.000001")
            )
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    s = sum(
        (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1.0) / math.sqrt(var)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(var)
    else:
        z = 0.0
    row = REGISTRY["mann_kendall_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n and row["s_stat"] == s
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


def test_trimmed_mean_q_matches_bruteforce(spark):
    """10%-trimmed mean replayed with a plain sort per type."""
    groups = defaultdict(list)
    for _, _, eid, v, etype in _events():
        groups[etype].append((v, eid))
    got = {
        r["event_type"]: r
        for r in REGISTRY["trimmed_mean_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(groups)
    for etype, rows in groups.items():
        rows.sort()
        n = len(rows)
        g = n // 10
        kept = [v for v, _ in rows[g : n - g]]
        r = got[etype]
        assert r["n"] == n
        assert r["n_kept"] == len(kept)
        assert r["trimmed_mean"] == pytest.approx(
            sum(kept) / len(kept), abs=2e-6
        )


_STOPS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "de", "et", "est", "les", "des", "une"),
}


def _pred_lang(toks):
    c = {k: sum(1 for t in toks if t in v) for k, v in _STOPS.items()}
    best = max(c.values())
    if best == 0:
        return "und"
    for k in ("en", "es", "de", "fr"):  # tie priority matches the engine
        if c[k] == best:
            return k


def test_cohens_kappa_q_matches_bruteforce(spark):
    """Confusion matrix, marginals, kappa replayed with dicts."""
    cm = Counter()
    con = duckdb.connect()
    for lang, text in con.execute(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall():
        cm[(lang, _pred_lang(_tok(text)))] += 1
    n = sum(cm.values())
    diag = sum(c for (a, p), c in cm.items() if a == p)
    rt, ct = Counter(), Counter()
    for (a, p), c in cm.items():
        rt[a] += c
        ct[p] += c
    labels = set(rt) | set(ct)
    pe = sum(rt.get(l, 0) * ct.get(l, 0) for l in labels) / (n * n)
    po = diag / n
    kappa = (po - pe) / (1 - pe)
    row = REGISTRY["cohens_kappa_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_docs"] == n
    assert row["observed_agreement"] == pytest.approx(po, abs=2e-6)
    assert row["expected_agreement"] == pytest.approx(pe, abs=2e-6)
    assert row["kappa"] == pytest.approx(kappa, abs=2e-6)


def _poly(s):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


def test_mcnemar_q_matches_bruteforce(spark):
    """Both filters and the discordant-cell chi2 replayed in python."""
    n11 = n10 = n01 = n00 = 0
    for _, text, _ in _docs():
        toks = _tok(text)
        n = len(text)
        n_punct = len(re.sub(r"[a-z0-9 ]", "", text.lower()))
        # heuristic score (functions/text.quality_score)
        stop = sum(1 for t in toks if t in _STOPS["en"])
        s = (
            0.4 * (1 - (n_punct / n if n else 0))
            + 0.3 * min((stop / len(toks) if toks else 0) * 5, 1.0)
            + 0.3 * min(n / 500, 1.0)
        )
        a = round(s, 4) >= 0.6
        raw = sum(
            ((((_poly(t) % 64) * 37 + 11) % 21) - 10) / 10.0 for t in toks
        )
        b = round(1.0 / (1.0 + math.exp(-raw / 8.0)), 4) >= 0.5
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    chi2 = (
        0.0
        if n10 + n01 == 0
        else (abs(n10 - n01) - 1.0) ** 2 / (n10 + n01)
    )
    row = REGISTRY["mcnemar_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    assert row["mcnemar_chi2"] == pytest.approx(chi2, abs=2e-6)


def test_brown_forsythe_q_matches_bruteforce(spark):
    """Median-deviation W statistic replayed with plain sorts."""
    groups = defaultdict(list)
    for _, _, eid, v, etype in _events():
        groups[etype].append((round(v * 1e6), eid))  # micro-units
    z = {}
    for etype, rows in groups.items():
        rows.sort(key=lambda p: (p[0] / 1e6, p[1]))
        vals = [v for v, _ in rows]
        n = len(vals)
        med2 = vals[(n + 1) // 2 - 1] + vals[(n + 2) // 2 - 1]
        z[etype] = [abs(2 * v - med2) for v in vals]
    ngs = {g: len(v) for g, v in z.items()}
    s1 = {g: sum(v) for g, v in z.items()}
    s2 = {g: sum(x * x for x in v) for g, v in z.items()}
    n_total, k = sum(ngs.values()), len(ngs)
    grand = sum(s1.values()) / n_total
    ssb = sum(
        ngs[g] * (s1[g] / ngs[g] - grand) ** 2 for g in ngs
    )
    ssw = sum(s2[g] - ngs[g] * (s1[g] / ngs[g]) ** 2 for g in ngs)
    w = ((n_total - k) / (k - 1)) * ssb / ssw
    row = REGISTRY["brown_forsythe_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_total"] == n_total and row["k"] == k
    assert row["bf_stat"] == pytest.approx(w, rel=2e-6)


def test_simpson_diversity_q_matches_bruteforce(spark):
    """Inverse-Simpson and Shannon effective source counts per lang."""
    counts = defaultdict(Counter)
    con = duckdb.connect()
    for lang, source in con.execute(
        f"SELECT lang, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall():
        counts[lang][source] += 1
    got = {
        r["lang"]: r
        for r in REGISTRY["simpson_diversity_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(counts)
    for lang, cc in counts.items():
        n = sum(cc.values())
        inv_simpson = n * n / sum(c * c for c in cc.values())
        shannon = -sum(
            (c / n) * math.log(c / n) for c in cc.values()
        )
        r = got[lang]
        assert r["n_docs"] == n and r["n_sources"] == len(cc)
        assert r["inv_simpson"] == pytest.approx(inv_simpson, abs=2e-6)
        assert r["shannon_effective"] == pytest.approx(
            math.exp(shannon), abs=2e-6
        )


def test_cliffs_delta_q_matches_bruteforce(spark):
    """Effect size replayed with the O(n²) pair definition — the query
    derives it from rank sums; the replica counts actual pairs."""
    xs, ys = [], []
    for _, _, _, v, etype in _events():
        if etype == "purchase":
            xs.append(v)
        elif etype == "click":
            ys.append(v)
    gt = sum(1 for x in xs for y in ys if x > y)
    lt = sum(1 for x in xs for y in ys if x < y)
    delta = (gt - lt) / (len(xs) * len(ys))
    row = REGISTRY["cliffs_delta_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n1"] == len(xs) and row["n2"] == len(ys)
    assert row["cliffs_delta"] == pytest.approx(delta, abs=2e-6)


def test_odds_ratio_q_matches_bruteforce(spark):
    """2×2 cells shared with the mcnemar replica; Haldane-corrected OR
    and Wald CI recomputed directly."""
    n = {"n11": 0, "n10": 0, "n01": 0, "n00": 0}
    for _, text, _ in _docs():
        toks = _tok(text)
        ln_ = len(text)
        n_punct = len(re.sub(r"[a-z0-9 ]", "", text.lower()))
        stop = sum(1 for t in toks if t in _STOPS["en"])
        s = (
            0.4 * (1 - (n_punct / ln_ if ln_ else 0))
            + 0.3 * min((stop / len(toks) if toks else 0) * 5, 1.0)
            + 0.3 * min(ln_ / 500, 1.0)
        )
        a = round(s, 4) >= 0.6
        raw = sum(
            ((((_poly(t) % 64) * 37 + 11) % 21) - 10) / 10.0 for t in toks
        )
        b = round(1.0 / (1.0 + math.exp(-raw / 8.0)), 4) >= 0.5
        key = f"n{int(a)}{int(b)}"
        n[key] += 1
    h = {k: v + 0.5 for k, v in n.items()}
    orr = h["n11"] * h["n00"] / (h["n10"] * h["n01"])
    se = math.sqrt(sum(1.0 / v for v in h.values()))
    row = REGISTRY["odds_ratio_q"].fn(spark, SF_SMALL).collect()[0]
    for k in n:
        assert row[k] == n[k]
    assert row["odds_ratio"] == pytest.approx(orr, rel=2e-6)
    assert row["log_or_ci_lo"] == pytest.approx(
        math.log(orr) - 1.96 * se, abs=2e-6
    )
    assert row["log_or_ci_hi"] == pytest.approx(
        math.log(orr) + 1.96 * se, abs=2e-6
    )


def _daily_purchase_means():
    daily = defaultdict(list)
    for _, ts, _, v, etype in _events():
        if etype == "purchase":
            daily[ts.date()].append(Decimal(str(v)))
    # decimal-quantized mean, matching the engines' DECIMAL(18,6) cast
    out = []
    for d in sorted(daily):
        vals = daily[d]
        s = sum(v.quantize(Decimal("0.000001")) for v in vals)
        out.append(float((s / len(vals)).quantize(Decimal("0.000001"))))
    return out


def test_ljung_box_q_matches_bruteforce(spark):
    """Q statistic over lags 1..7 replayed with plain lists."""
    xs = _daily_purchase_means()
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    q = 0.0
    for k in range(1, 8):
        num = sum(
            (xs[i] - mean) * (xs[i + k] - mean) for i in range(n - k)
        )
        r = num / den
        q += r * r / (n - k)
    q *= n * (n + 2)
    row = REGISTRY["ljung_box_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["lb_q"] == pytest.approx(q, rel=2e-6)


def test_theil_u_q_matches_bruteforce(spark):
    """Conditional entropy / uncertainty coefficient via Counters."""
    c = Counter()
    con = duckdb.connect()
    for lang, source in con.execute(
        f"SELECT lang, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall():
        c[(lang, source)] += 1
    n = sum(c.values())
    cl, cs = Counter(), Counter()
    for (l, s), v in c.items():
        cl[l] += v
        cs[s] += v
    h_lang = -sum((v / n) * math.log(v / n) for v in cl.values())
    h_cond = -sum(
        (v / n) * math.log(v / cs[s]) for (l, s), v in c.items()
    )
    u = (h_lang - h_cond) / h_lang
    row = REGISTRY["theil_u_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_docs"] == n
    assert row["h_lang"] == pytest.approx(h_lang, abs=2e-6)
    assert row["h_lang_given_src"] == pytest.approx(h_cond, abs=2e-6)
    assert row["theil_u"] == pytest.approx(u, abs=2e-6)


def test_markov_entropy_rate_q_matches_bruteforce(spark):
    """Entropy rate of the event-type chain via per-user sequences."""
    seqs = defaultdict(list)
    for u, ts, eid, _, etype in _events():
        seqs[u].append((ts, eid, etype))
    trans = Counter()
    for u, rows in seqs.items():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            trans[(a, b)] += 1
    nt = sum(trans.values())
    nsrc = Counter()
    for (a, _), v in trans.items():
        nsrc[a] += v
    h = -sum(
        (v / nt) * math.log(v / nsrc[a]) for (a, b), v in trans.items()
    )
    row = (
        REGISTRY["markov_entropy_rate_q"].fn(spark, SF_SMALL).collect()[0]
    )
    assert row["n_transitions"] == nt
    assert row["entropy_rate_nats"] == pytest.approx(h, abs=2e-6)


def test_matryoshka_fidelity_q_matches_bruteforce(spark):
    """Prefix-vs-full cosine fidelity replayed in numpy."""
    import numpy as np

    con = duckdb.connect()
    vecs = {
        vid: np.array(v, dtype=np.float64)
        for vid, v in con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet') "
            f"WHERE vec_id < 200"
        ).fetchall()
    }
    cf, cp = [], []

    def cos(a, b):
        # same left-to-right fold order as both engines
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / math.sqrt(na * nb)

    for i in range(100):
        a, b = vecs[i], vecs[i + 100]
        cf.append(round(cos(a, b) * 10000))
        cp.append(round(cos(a[:32], b[:32]) * 10000))
    n = len(cf)
    import numpy as np

    cfa, cpa = np.array(cf, float), np.array(cp, float)
    corr = np.corrcoef(cfa, cpa)[0, 1]
    gap = np.abs(cfa - cpa).mean() / 10000.0
    row = (
        REGISTRY["matryoshka_fidelity_q"].fn(spark, SF_SMALL).collect()[0]
    )
    assert row["n_pairs"] == n
    assert row["cos_corr"] == pytest.approx(corr, abs=2e-5)
    assert row["mean_abs_gap"] == pytest.approx(gap, abs=2e-5)


def test_weighted_jaccard_q_matches_bruteforce(spark):
    """Min/max token-mass overlap replayed with Counters."""
    vec = defaultdict(Counter)
    for _, text, source in _docs():
        vec[source].update(_tok(text))
    pairs = {}
    srcs = sorted(vec)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            smin = sum(
                min(vec[sa][t], vec[sb][t]) for t in vec[sa] if t in vec[sb]
            )
            smax = (
                sum(vec[sa].values()) + sum(vec[sb].values()) - smin
            )
            pairs[(sa, sb)] = smin / smax
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        ((r["sa"], r["sb"]), r["weighted_jaccard"])
        for r in REGISTRY["weighted_jaccard_q"]
        .fn(spark, SF_SMALL)
        .collect()
    ]
    assert [k for k, _ in got] == [k for k, _ in top]
    for (k, v), (_, want) in zip(got, top):
        assert v == pytest.approx(want, abs=2e-6)


def test_yule_k_q_matches_bruteforce(spark):
    """Yule's K from frequency-of-frequencies via Counters."""
    toks = Counter()
    for _, text, _ in _docs():
        toks.update(_tok(text))
    n = sum(toks.values())
    sr2 = sum(c * c for c in toks.values())
    k = 10000.0 * (sr2 - n) / (n * n)
    row = REGISTRY["yule_k_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_tokens"] == n and row["vocab"] == len(toks)
    assert row["yule_k"] == pytest.approx(k, abs=2e-6)


def test_kruskal_wallis_q_matches_bruteforce(spark):
    """Tie-corrected H replayed with a plain midrank sort."""
    vals = [(v, et) for _, _, _, v, et in _events()]
    ordered = sorted(vals, key=lambda p: p[0])
    ranks, i = {}, 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][0] == ordered[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks[ordered[i][0]] = mid
        i = j
    n = len(vals)
    groups = defaultdict(list)
    for v, et in vals:
        groups[et].append(ranks[v])
    sr = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
    h = 12.0 * sr / (n * (n + 1)) - 3 * (n + 1)
    tie = sum(
        t**3 - t for t in Counter(v for v, _ in vals).values() if t > 1
    )
    h /= 1.0 - tie / (n**3 - n)
    row = REGISTRY["kruskal_wallis_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["k_groups"] == len(groups) and row["n_total"] == n
    assert row["dof"] == len(groups) - 1
    assert row["h_stat"] == pytest.approx(h, abs=2e-6)


def test_kendall_tau_q_matches_bruteforce(spark):
    """Tau-b replayed with an O(days²) double loop."""
    days = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, et in _events():
        if et == "purchase":
            d = days[ts.date()]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    pts = [tuple(days[d]) for d in sorted(days)]
    nc = nd = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = (pts[j][0] > pts[i][0]) - (pts[j][0] < pts[i][0])
            dy = (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    n = len(pts)
    tx2 = sum(
        t * (t - 1) for t in Counter(p[0] for p in pts).values() if t > 1
    )
    ty2 = sum(
        t * (t - 1) for t in Counter(p[1] for p in pts).values() if t > 1
    )
    tau = (
        2.0
        * (nc - nd)
        / math.sqrt((n * (n - 1) - tx2) * (n * (n - 1) - ty2))
    )
    row = REGISTRY["kendall_tau_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["concordant"] == nc and row["discordant"] == nd
    assert row["tau_b"] == pytest.approx(tau, abs=2e-6)


def test_isotropy_q_matches_bruteforce(spark):
    """Mean pairwise cosine replayed as a LITERAL O(n²) double loop —
    independent of the sum-vector identity the query uses."""
    con = duckdb.connect()
    vecs = [
        r[0]
        for r in con.execute(
            f"SELECT embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    ]
    units = []
    for v in vecs:
        nrm = math.sqrt(sum(float(x) * float(x) for x in v))
        if nrm > 0:
            units.append([float(x) / nrm for x in v])
    n = len(units)
    tot = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            tot += sum(a * b for a, b in zip(units[i], units[j]))
    mean_cos = 2.0 * tot / (n * (n - 1))
    sums = [sum(u[k] for u in units) for k in range(64)]
    mrn = math.sqrt(sum(s * s for s in sums)) / n
    row = REGISTRY["isotropy_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_vecs"] == n
    assert row["mean_pairwise_cos"] == pytest.approx(mean_cos, abs=2e-6)
    assert row["mean_resultant_norm"] == pytest.approx(mrn, abs=2e-6)


def test_cramers_v_q_matches_bruteforce(spark):
    """Chi² + V replayed with Counters over the full r×c grid."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderpriority, o_orderstatus FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet')"
    ).fetchall()
    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(ra), len(cb)) - 1)))
    row = REGISTRY["cramers_v_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_rows"] == n
    assert row["r_levels"] == len(ra) and row["c_levels"] == len(cb)
    assert row["chi2_stat"] == pytest.approx(chi2, abs=2e-6)
    assert row["cramers_v"] == pytest.approx(v, abs=2e-6)


def _daily(et, agg="sum"):
    """Exact daily aggregate of event value for one event type."""
    days = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        if t == et:
            d = days[ts.date()]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    out = []
    for day in sorted(days):
        s, c = days[day]
        out.append((s, c) if agg == "pairs" else s)
    return out


def _q6(x):
    """Mirror Spark's double→DECIMAL(18,6) cast: BigDecimal.valueOf uses
    the double's SHORTEST decimal repr (Double.toString), then HALF_UP —
    not the exact binary expansion (62.69125 stored as 62.6912499…97
    still rounds UP at the printed tie)."""
    from decimal import ROUND_HALF_UP

    v = Decimal(repr(float(x))) if isinstance(x, float) else Decimal(x)
    return v.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _r4(x):
    """Mirror F.round(double, 4): HALF_UP on the shortest repr."""
    from decimal import ROUND_HALF_UP

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )


def test_page_hinkley_q_matches_bruteforce(spark):
    """PH statistic replayed with a running Decimal loop."""
    ms = [
        # engine shape: SUM(decimal) → double, / count in double, → dec6
        _q6(float(s) / c)
        for s, c in _daily("error", agg="pairs")
    ]
    cum = Decimal(0)
    run_sum = Decimal(0)
    ph, mins, sig = [], [], []
    run_min = None
    for t, m in enumerate(ms, start=1):
        run_sum += m
        rm = _q6(float(run_sum) / t)
        cum += m - rm
        ph.append(cum)
        run_min = cum if run_min is None else min(run_min, cum)
        sig.append(cum - run_min)
    peak = max(sig)
    rows = sorted(
        REGISTRY["page_hinkley_q"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == len(ms)
    for i, r in enumerate(rows):
        assert r["daily_mean"] == pytest.approx(_r4(ms[i]), abs=1e-9)
        assert r["ph_stat"] == pytest.approx(_r4(ph[i]), abs=1e-9)
        assert r["signal"] == pytest.approx(_r4(sig[i]), abs=1e-9)
        assert r["is_alarm_peak"] == (sig[i] == peak)


def test_sample_entropy_q_matches_bruteforce(spark):
    """SampEn(m=2, r=0.2σ) replayed with a double loop."""
    xs = [float(x) for x in _daily("purchase")]
    n = len(xs)
    mean = sum(xs) / n
    r = 0.2 * math.sqrt(sum(x * x for x in xs) / n - mean * mean)
    b_count = a_count = 0
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if abs(xs[i] - xs[j]) <= r and abs(xs[i + 1] - xs[j + 1]) <= r:
                b_count += 1
                if (
                    i + 2 < n
                    and j + 2 < n
                    and abs(xs[i + 2] - xs[j + 2]) <= r
                ):
                    a_count += 1
    row = REGISTRY["sample_entropy_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["b_count"] == b_count and row["a_count"] == a_count
    if a_count > 0 and b_count > 0:
        assert row["sampen"] == pytest.approx(
            -math.log(a_count / b_count), abs=2e-6
        )
    else:
        assert row["sampen"] is None


def test_hurst_exponent_q_matches_bruteforce(spark):
    """R/S slope replayed with plain loops (Decimal quantization
    mirrored at each stage the query quantizes)."""
    xs = _daily("purchase")
    pts = []
    for bn in (5, 10, 15, 30):
        rs_vals = []
        for start in range(0, len(xs) - bn + 1, bn):
            blk = xs[start : start + bn]
            m = _q6(float(sum(blk)) / bn)
            cum, cds = Decimal(0), []
            for x in blk:
                cum += x - m
                cds.append(cum)
            ssq = sum(float(x - m) ** 2 for x in blk)
            if ssq > 0:
                rs_vals.append(
                    _q6(float(max(cds) - min(cds)) / math.sqrt(ssq / bn))
                )
        if rs_vals:
            a_rs = _q6(float(sum(rs_vals)) / len(rs_vals))
            pts.append((math.log(bn), math.log(float(a_rs))))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    row = REGISTRY["hurst_exponent_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_scales"] == k
    assert row["hurst"] == pytest.approx(slope, abs=2e-6)


def test_neighbor_jaccard_q_matches_bruteforce(spark):
    """Jaccard link prediction replayed with set algebra."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    orders = defaultdict(set)
    for o, p in rows:
        orders[o].add(p)
    nbr = defaultdict(set)
    for o, ps in orders.items():
        for p in sorted(ps)[:64]:
            nbr[p].add(o)
    pairs = {}
    for o, ps in orders.items():
        capped = sorted(ps)[:64]
        for i, pa in enumerate(capped):
            for pb in capped[i + 1 :]:
                key = (pa, pb)
                if key not in pairs:
                    common = len(nbr[pa] & nbr[pb])
                    union = len(nbr[pa] | nbr[pb])
                    pairs[key] = (common, union, common / union)
    top = sorted(
        pairs.items(), key=lambda kv: (-kv[1][2], kv[0])
    )[:30]
    got = REGISTRY["neighbor_jaccard_q"].fn(spark, SF_SMALL).collect()
    assert [(r["pa"], r["pb"]) for r in got] == [k for k, _ in top]
    for r, (k, (common, union, jac)) in zip(got, top):
        assert r["n_common"] == common and r["n_union"] == union
        assert r["jaccard"] == pytest.approx(jac, abs=2e-6)


def _doc_scores():
    """(y, s) pairs mirroring the roc_auc_q scorer: y = lang=='en',
    s = round(mean token length, 4) — the derivation all three
    classifier-eval replicas share."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    out = []
    for lang, text in rows:
        toks = _tok(text)
        if not toks:
            continue
        s = float(
            Decimal(repr(sum(len(t) for t in toks) / len(toks))).quantize(
                Decimal("0.0001"), rounding=__import__("decimal").ROUND_HALF_UP
            )
        )
        out.append((1 if lang == "en" else 0, s))
    return out


def test_average_precision_q_matches_bruteforce(spark):
    """Tie-aware AP replayed by walking distinct scores high->low."""
    scored = _doc_scores()
    by_s = defaultdict(lambda: [0, 0])
    for y, s in scored:
        by_s[s][0] += y
        by_s[s][1] += 1 - y
    p_tot = sum(np for np, _ in by_s.values())
    n_tot = sum(nn for _, nn in by_s.values())
    cum_p = cum_n = 0
    ap = 0.0
    for s in sorted(by_s, reverse=True):
        np_, nn_ = by_s[s]
        cum_p += np_
        cum_n += nn_
        ap += np_ * cum_p / (cum_p + cum_n)
    ap /= p_tot
    row = REGISTRY["average_precision_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_pos"] == p_tot and row["n_neg"] == n_tot
    assert row["avg_precision"] == pytest.approx(ap, abs=2e-6)
    assert row["prevalence"] == pytest.approx(
        p_tot / (p_tot + n_tot), abs=2e-6
    )


def test_matthews_corr_q_matches_bruteforce(spark):
    """Confusion cells + MCC replayed with plain counters."""
    tp = fp = fn = tn = 0
    for y, s in _doc_scores():
        yhat = 1 if s >= 4.5 else 0
        if y and yhat:
            tp += 1
        elif yhat:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    row = REGISTRY["matthews_corr_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["mcc"] == pytest.approx(mcc, abs=2e-6)


def _balances():
    con = duckdb.connect()
    return con.execute(
        f"SELECT c_nationkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) "
        f"FROM read_parquet('{SF_SMALL}/customer.parquet')"
    ).fetchall()


def test_anova_f_q_matches_bruteforce(spark):
    """One-way ANOVA replayed from per-group moment sums."""
    groups = defaultdict(list)
    for _, seg, bal in _balances():
        groups[seg].append(bal)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(
        len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values()
    )
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in groups.values()
    )
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    row = REGISTRY["anova_f_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_tot"] == n and row["k_groups"] == k
    assert row["f_stat"] == pytest.approx(f_stat, rel=1e-5)
    assert row["eta_squared"] == pytest.approx(ssb / (ssb + ssw), abs=2e-6)


def test_t_closeness_q_matches_bruteforce(spark):
    """Per-class ordered EMD replayed with cumulative shares."""
    def band(b):
        return 0 if b < 0 else 1 if b < 3000 else 2 if b < 7000 else 3

    cls = defaultdict(lambda: [0, 0, 0, 0])
    glob = [0, 0, 0, 0]
    for nat, seg, bal in _balances():
        cls[(nat, seg)][band(bal)] += 1
        glob[band(bal)] += 1
    n_tot = sum(glob)
    rows = REGISTRY["t_closeness_q"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(cls)
    for r in rows:
        counts = cls[(r["c_nationkey"], r["c_mktsegment"])]
        nc = sum(counts)
        emd = 0.0
        cc = cg = 0
        for i in range(3):
            cc += counts[i]
            cg += glob[i]
            emd += abs(cc / nc - cg / n_tot)
        emd /= 3
        assert r["group_size"] == nc
        assert r["emd"] == pytest.approx(emd, abs=2e-6)
        assert r["t_violation"] == (emd > 0.2)


def test_hubness_q_matches_bruteforce(spark):
    """5-NN k-occurrence skewness replayed with a full numpy scan."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    kocc = Counter()
    for qi in range(n):
        d2 = np.round(((mat - mat[qi]) ** 2).sum(axis=1), 6)
        order = sorted(
            (float(d2[ci]), ids[ci]) for ci in range(n) if ci != qi
        )[:5]
        kocc.update(cid for _, cid in order)
    devs = [kocc.get(v, 0) - 5 for v in ids]
    m2 = sum(d * d for d in devs) / n
    m3 = sum(d * d * d for d in devs) / n
    row = REGISTRY["hubness_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_points"] == n
    assert row["max_kocc"] == max(kocc.values())
    assert row["n_antihubs"] == sum(
        1 for v in ids if kocc.get(v, 0) == 0
    )
    assert row["skewness"] == pytest.approx(m3 / m2**1.5, abs=2e-4)


def test_lift_gain_q_matches_bruteforce(spark):
    """Decile table replayed with a plain sort + ANSI NTILE split."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    scored = []
    for doc_id, lang, text in rows:
        toks = _tok(text)
        if not toks:
            continue
        s = _r4(sum(len(t) for t in toks) / len(toks))
        scored.append((-s, doc_id, 1 if lang == "en" else 0))
    scored.sort()
    n = len(scored)
    q, r = divmod(n, 10)
    sizes = [q + 1 if i < r else q for i in range(10)]
    deciles, pos = [], 0
    p_tot = sum(y for _, _, y in scored)
    idx = 0
    for d, size in enumerate(sizes, start=1):
        block = scored[idx : idx + size]
        idx += size
        np_ = sum(y for _, _, y in block)
        pos += np_
        deciles.append((d, size, np_, pos))
    got = sorted(
        REGISTRY["lift_gain_q"].fn(spark, SF_SMALL).collect(),
        key=lambda row: row["decile"],
    )
    assert len(got) == 10
    for (d, size, np_, cum), row in zip(deciles, got):
        assert row["decile"] == d and row["n_docs"] == size
        assert row["n_pos"] == np_
        assert row["cum_gain"] == pytest.approx(cum / p_tot, abs=2e-6)
        assert row["lift"] == pytest.approx(
            (np_ / size) / (p_tot / n), abs=2e-6
        )


def test_brier_decomposition_q_matches_bruteforce(spark):
    """Murphy decomposition replayed per distinct forecast value."""
    pairs = [(y, s / 10) for y, s in _doc_scores()]
    n = len(pairs)
    ybar = sum(y for y, _ in pairs) / n
    by_p = defaultdict(lambda: [0, 0])
    for y, p in pairs:
        by_p[p][0] += 1
        by_p[p][1] += y
    brier = sum((p - y) ** 2 for y, p in pairs) / n
    rel = sum(nk * (p - pk / nk) ** 2 for p, (nk, pk) in by_p.items()) / n
    res = (
        sum(nk * (pk / nk - ybar) ** 2 for _, (nk, pk) in by_p.items())
        / n
    )
    row = (
        REGISTRY["brier_decomposition_q"].fn(spark, SF_SMALL).collect()[0]
    )
    assert row["n"] == n
    assert row["brier"] == pytest.approx(brier, abs=2e-6)
    assert row["reliability"] == pytest.approx(rel, abs=2e-6)
    assert row["resolution"] == pytest.approx(res, abs=2e-6)
    assert row["uncertainty"] == pytest.approx(
        ybar * (1 - ybar), abs=2e-6
    )
    # Murphy identity holds exactly at distinct-value binning
    assert brier == pytest.approx(
        rel - res + ybar * (1 - ybar), abs=1e-9
    )


def test_friedman_q_matches_bruteforce(spark):
    """Friedman chi2 replayed with per-day rank loops."""
    by_day_type = defaultdict(dict)
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    for (day, t), (s, c) in agg.items():
        by_day_type[day][t] = _q6(float(s) / c)
    rank_sum = Counter()
    n_blocks = len(by_day_type)
    k = len({t for d in by_day_type.values() for t in d})
    for day, ms in by_day_type.items():
        for r, (m, t) in enumerate(
            sorted((m, t) for t, m in ms.items()), start=1
        ):
            rank_sum[t] += r
    chi2 = 12.0 * sum(s * s for s in rank_sum.values()) / (
        n_blocks * k * (k + 1)
    ) - 3.0 * n_blocks * (k + 1)
    row = REGISTRY["friedman_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_blocks"] == n_blocks
    assert row["k_treatments"] == k
    assert row["friedman_chi2"] == pytest.approx(chi2, abs=2e-6)


def test_runs_test_q_matches_bruteforce(spark):
    """Runs count + z replayed with a sign loop."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    signs = []
    for a, b in zip(ms, ms[1:]):
        if b != a:
            signs.append(1 if b > a else -1)
    n_runs = sum(
        1
        for i, sg in enumerate(signs)
        if i == 0 or sg != signs[i - 1]
    )
    n_up = sum(1 for s in signs if s == 1)
    n_down = len(signs) - n_up
    mu = 2.0 * n_up * n_down / (n_up + n_down) + 1
    var = (
        2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
        / ((n_up + n_down) ** 2 * (n_up + n_down - 1))
    )
    row = REGISTRY["runs_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_runs"] == n_runs
    assert row["n_up"] == n_up and row["n_down"] == n_down
    assert row["z_stat"] == pytest.approx(
        (n_runs - mu) / math.sqrt(var), abs=2e-6
    )


def test_dickey_fuller_q_matches_bruteforce(spark):
    """DF regression replayed with closed-form OLS on floats."""
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    xs = ms[:-1]
    dys = [b - a for a, b in zip(ms, ms[1:])]
    n = len(xs)
    sx, sy = sum(xs), sum(dys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, dys))
    syy = sum(y * y for y in dys)
    cxx = sxx - sx * sx / n
    cxy = sxy - sx * sy / n
    cyy = syy - sy * sy / n
    beta = cxy / cxx
    se = math.sqrt(((cyy - cxy * cxy / cxx) / (n - 2)) / cxx)
    row = REGISTRY["dickey_fuller_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_obs"] == n
    assert row["beta"] == pytest.approx(beta, abs=2e-6)
    assert row["df_stat"] == pytest.approx(beta / se, rel=1e-4)


def test_isotonic_calibration_q_matches_bruteforce(spark):
    """PAVA replayed with the classic sequential pooling algorithm —
    independently of the query's minimax formulation."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    by_bin = defaultdict(lambda: [0, 0])
    for lang, text in rows:
        toks = _tok(text)
        if not toks:
            continue
        b = (100 * sum(len(t) for t in toks)) // len(toks) / 1000.0
        by_bin[b][0] += 1
        by_bin[b][1] += 1 if lang == "en" else 0
    bins = sorted(by_bin.items())
    # classic PAVA: pool adjacent violators left to right, tracking how
    # many BINS each block covers so fits expand back positionally
    blocks = []  # [n, pos, n_bins]
    for _, (n, pos) in bins:
        blocks.append([n, pos, 1])
        while (
            len(blocks) > 1
            and blocks[-2][1] * blocks[-1][0]
            >= blocks[-1][1] * blocks[-2][0]
        ):
            n2, p2, c2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2] += c2
    iso = {}
    it = iter(bins)
    for n, pos, n_bins in blocks:
        for _ in range(n_bins):
            p, _counts = next(it)
            iso[p] = pos / n
    got = {
        r["p_bin"]: r
        for r in REGISTRY["isotonic_calibration_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == {p for p, _ in bins}
    prev = -1.0
    for p, (n, pos) in bins:
        r = got[p]
        assert r["n_k"] == n and r["pos_k"] == pos
        assert r["iso_p"] == pytest.approx(iso[p], abs=2e-6)
        assert r["iso_p"] >= prev - 1e-12  # monotone
        prev = r["iso_p"]


def test_cronbach_alpha_q_matches_bruteforce(spark):
    """Alpha replayed from zero-filled per-user item scores."""
    scores = defaultdict(lambda: defaultdict(Decimal))
    types = set()
    for uid, _, _, v, t in _events():
        scores[uid][t] += Decimal(str(v)).quantize(Decimal("0.000001"))
        types.add(t)
    types = sorted(types)
    k = len(types)
    users = sorted(scores)
    n = len(users)

    def pvar(xs):
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs) / len(xs)

    item_vars = [
        pvar([float(scores[u].get(t, Decimal(0))) for u in users])
        for t in types
    ]
    tot_var = pvar(
        [float(sum(scores[u].values())) for u in users]
    )
    alpha = k / (k - 1) * (1 - sum(item_vars) / tot_var)
    row = REGISTRY["cronbach_alpha_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n and row["k_items"] == k
    assert row["alpha"] == pytest.approx(alpha, abs=2e-6)


def _poly(s):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


def test_permutation_test_q_matches_bruteforce(spark):
    """Randomization p-value replayed with the same hash coins."""
    tot = defaultdict(Decimal)
    for uid, _, _, v, t in _events():
        if t == "purchase":
            tot[uid] += Decimal(str(v)).quantize(Decimal("0.000001"))

    def diff(assign):
        g0 = [float(v) for u, v in tot.items() if assign(u) == 0]
        g1 = [float(v) for u, v in tot.items() if assign(u) == 1]
        return sum(g0) / len(g0) - sum(g1) / len(g1)

    d_obs = diff(lambda u: u % 2)
    n_ext = sum(
        1
        for b in range(64)
        if abs(diff(lambda u: _poly(f"perm:{u}:{b}") % 2)) >= abs(d_obs)
    )
    row = REGISTRY["permutation_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == len(tot)
    assert row["obs_diff"] == pytest.approx(d_obs, abs=2e-6)
    assert row["n_extreme"] == n_ext
    assert row["p_value"] == pytest.approx((1 + n_ext) / 65, abs=2e-6)


def test_bh_fdr_q_matches_bruteforce(spark):
    """BH step-up replayed with math.erfc as the tail oracle."""
    nats = defaultdict(list)
    for nat, _, bal in _balances():
        nats[nat].append(bal)
    allb = [b for v in nats.values() for b in v]
    mu = sum(allb) / len(allb)
    sd = math.sqrt(sum((b - mu) ** 2 for b in allb) / len(allb))
    fam = []
    for nat, v in nats.items():
        az = abs((sum(v) / len(v) - mu) / (sd / math.sqrt(len(v))))
        fam.append((nat, len(v), az, math.erfc(az / math.sqrt(2))))
    fam.sort(key=lambda r: (r[3], r[0]))
    m = len(fam)
    kstar = max(
        (i for i, r in enumerate(fam, 1) if r[3] <= 0.05 * i / m),
        default=0,
    )
    got = {
        r["c_nationkey"]: r
        for r in REGISTRY["bh_fdr_q"].fn(spark, SF_SMALL).collect()
    }
    assert len(got) == m
    for i, (nat, n, az, p) in enumerate(fam, 1):
        r = got[nat]
        assert r["n_customers"] == n
        assert r["abs_z"] == pytest.approx(az, abs=2e-4)
        # A&S 7.1.26 carries |eps| <= 1.5e-7 vs true erfc, and the
        # output is 6-dp rounded (±5e-7) — bound is the sum of both
        assert r["p_value"] == pytest.approx(p, abs=1e-6)
        assert r["bh_rank"] == i
        assert r["discovery"] == (i <= kstar)


def test_granger_q_matches_bruteforce(spark):
    """Granger F replayed with numpy least squares."""
    import numpy as np

    days = defaultdict(lambda: defaultdict(lambda: [Decimal(0), 0]))
    for _, ts, _, v, t in _events():
        if t in ("purchase", "click"):
            d = days[ts.date()][t]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    ys, xs = [], []
    for day in sorted(days):
        p, c = days[day]["purchase"], days[day]["click"]
        ys.append(float(_q6(float(p[0]) / p[1])))
        xs.append(float(_q6(float(c[0]) / c[1])))
    w = np.array(ys[1:])
    z1 = np.array(ys[:-1])
    z2 = np.array(xs[:-1])
    n = len(w)
    Xu = np.column_stack([np.ones(n), z1, z2])
    Xr = np.column_stack([np.ones(n), z1])
    bu, *_ = np.linalg.lstsq(Xu, w, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, w, rcond=None)
    rss_u = float(((w - Xu @ bu) ** 2).sum())
    rss_r = float(((w - Xr @ br) ** 2).sum())
    f = (rss_r - rss_u) * (n - 3) / rss_u
    row = REGISTRY["granger_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_obs"] == n
    assert row["beta_y_lag"] == pytest.approx(bu[1], abs=2e-5)
    assert row["beta_x_lag"] == pytest.approx(bu[2], abs=2e-5)
    # f_stat is 6-dp rounded, so tiny F values need an abs floor
    assert row["f_stat"] == pytest.approx(f, rel=1e-4, abs=1e-6)


def _purchase_totals():
    tot = defaultdict(Decimal)
    for uid, _, _, v, t in _events():
        if t == "purchase":
            tot[uid] += Decimal(str(v)).quantize(Decimal("0.000001"))
    return {u: float(v) for u, v in tot.items()}


def test_welch_ttest_q_matches_bruteforce(spark):
    """Welch t / df / Cohen's d replayed with plain moments."""
    tot = _purchase_totals()
    g0 = [v for u, v in tot.items() if u % 2 == 0]
    g1 = [v for u, v in tot.items() if u % 2 == 1]

    def mean_var(xs):
        mu = sum(xs) / len(xs)
        return mu, sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)

    m0, v0 = mean_var(g0)
    m1, v1 = mean_var(g1)
    n0, n1 = len(g0), len(g1)
    se2 = v0 / n0 + v1 / n1
    dfw = se2**2 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
    pooled = math.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2))
    row = REGISTRY["welch_ttest_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert row["mean_diff"] == pytest.approx(m0 - m1, abs=2e-6)
    assert row["t_stat"] == pytest.approx(
        (m0 - m1) / math.sqrt(se2), abs=2e-5
    )
    # welch_df is 4-dp rounded in the query output
    assert row["welch_df"] == pytest.approx(dfw, abs=1e-4)
    assert row["cohens_d"] == pytest.approx((m0 - m1) / pooled, abs=2e-5)


def test_seasonal_strength_q_matches_bruteforce(spark):
    """Hyndman strengths replayed from a dict-based STL-lite."""
    import datetime

    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "view"}
    )
    m = {}
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        if t == "view":
            d = agg[ts.date()]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    for day, (s, c) in agg.items():
        m[day] = _q6(float(s) / c)
    trend = {}
    for i, day in enumerate(days):
        win = [m[d] for d in days[max(0, i - 3) : i + 4]]
        trend[day] = _q6(float(sum(win)) / len(win))
    base = datetime.date(2024, 1, 1)
    seas_groups = defaultdict(list)
    for day in days:
        seas_groups[(day - base).days % 7].append(m[day] - trend[day])
    seasonal = {
        dow: _q6(float(sum(v)) / len(v)) for dow, v in seas_groups.items()
    }

    def pvar(xs):
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs) / len(xs)

    r = [
        float(m[d] - trend[d] - seasonal[(d - base).days % 7])
        for d in days
    ]
    sr = [float(m[d] - trend[d]) for d in days]
    tr = [float(m[d] - seasonal[(d - base).days % 7]) for d in days]
    row = REGISTRY["seasonal_strength_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == len(days)
    assert row["seasonal_strength"] == pytest.approx(
        max(0.0, 1 - pvar(r) / pvar(sr)), abs=2e-6
    )
    assert row["trend_strength"] == pytest.approx(
        max(0.0, 1 - pvar(r) / pvar(tr)), abs=2e-6
    )


def test_sprt_q_matches_bruteforce(spark):
    """SPRT walk replayed user by user."""
    conv = defaultdict(int)
    for uid, _, _, _, t in _events():
        if t == "purchase":
            conv[uid] = 1
        conv.setdefault(uid, 0)
    la, lb = math.log(0.6 / 0.5), math.log(0.4 / 0.5)
    thr = math.log(19.0)
    llr, n1 = 0.0, 0
    first_h1 = first_h0 = None
    users = sorted(conv)
    for t_, u in enumerate(users, start=1):
        n1 += conv[u]
        llr = n1 * la + (t_ - n1) * lb
        if first_h1 is None and llr >= thr:
            first_h1 = t_
        if first_h0 is None and llr <= -thr:
            first_h0 = t_
    row = REGISTRY["sprt_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_trials"] == len(users)
    assert row["n_success"] == n1
    assert row["final_llr"] == pytest.approx(llr, abs=2e-6)
    assert row["first_accept_h1_t"] == first_h1
    assert row["first_accept_h0_t"] == first_h0


def test_component_density_q_matches_bruteforce(spark):
    """Shape census replayed with an actual union-find over the
    chain edges — independently of both the star contraction and the
    oracle's structural shortcut."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_orderkey, o_orderdate FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet') "
        f"WHERE o_custkey % 100 = 0 ORDER BY o_custkey, o_orderdate, "
        f"o_orderkey"
    ).fetchall()
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    edges = []
    prev_c = prev_k = None
    for c, k, _ in rows:
        parent.setdefault(k, k)
        if c == prev_c:
            edges.append((prev_k, k))
            ra, rb = find(prev_k), find(k)
            if ra != rb:
                parent[ra] = rb
        prev_c, prev_k = c, k
    comp_nodes = Counter()
    comp_edges = Counter()
    touched = {v for e in edges for v in e}
    for v in touched:
        comp_nodes[find(v)] += 1
    for a, b in edges:
        comp_edges[find(a)] += 1
    shapes = Counter(
        (comp_nodes[c], comp_edges[c]) for c in comp_nodes
    )
    got = {
        (r["n_nodes"], r["n_edges"]): r
        for r in REGISTRY["component_density_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(shapes)
    for (n, e_), cnt in shapes.items():
        r = got[(n, e_)]
        assert r["n_components"] == cnt
        assert r["density"] == pytest.approx(
            2 * e_ / (n * (n - 1)), abs=2e-6
        )
        assert r["is_tree"] == (e_ == n - 1)


def test_power_analysis_q_matches_bruteforce(spark):
    """Sample-size formula replayed from plain moments."""
    tot = list(_purchase_totals().values())
    n = len(tot)
    mu = sum(tot) / n
    var_s = sum((x - mu) ** 2 for x in tot) / (n - 1)
    za, zb = 1.959963985, 0.8416212336
    n_arm = math.ceil(
        round(2 * (za + zb) ** 2 * var_s / (0.05 * mu) ** 2, 6)
    )
    row = REGISTRY["power_analysis_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_observed"] == n
    assert row["mean_total"] == pytest.approx(mu, abs=2e-6)
    assert row["sd_total"] == pytest.approx(math.sqrt(var_s), abs=2e-5)
    assert row["mde_abs"] == pytest.approx(0.05 * mu, abs=2e-6)
    assert row["n_per_arm"] == n_arm


def test_acf_q_matches_bruteforce(spark):
    """Correlogram replayed with quantized-deviation loops."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    ybar = _q6(float(sum(ms)) / len(ms))
    dev = [float(m - ybar) for m in ms]
    ss = sum(d * d for d in dev)
    got = {
        r["lag"]: r
        for r in REGISTRY["acf_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        num = sum(a * b for a, b in zip(dev, dev[k:]))
        r = got[k]
        assert r["n_pairs"] == len(dev) - k
        assert r["acf"] == pytest.approx(num / ss, abs=2e-6)


def test_theil_index_q_matches_bruteforce(spark):
    """Theil decomposition replayed from raw rows."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT c.c_nationkey, o.o_totalprice FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet') o JOIN "
        f"read_parquet('{SF_SMALL}/customer.parquet') c "
        f"ON c.c_custkey = o.o_custkey"
    ).fetchall()
    xs = [x for _, x in rows]
    n = len(xs)
    mu = sum(xs) / n
    t_total = sum(x / mu * math.log(x / mu) for x in xs) / n
    groups = defaultdict(list)
    for nat, x in rows:
        groups[nat].append(x)
    s_tot = sum(xs)
    t_between = sum(
        (sum(v) / s_tot) * math.log((sum(v) / len(v)) / mu)
        for v in groups.values()
    )
    row = REGISTRY["theil_index_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_orders"] == n
    assert row["theil_total"] == pytest.approx(t_total, abs=2e-6)
    assert row["theil_between"] == pytest.approx(t_between, abs=2e-6)
    assert row["theil_within"] == pytest.approx(
        t_total - t_between, abs=2e-6
    )


def test_moran_i_q_matches_bruteforce(spark):
    """Moran's I replayed over the same-region adjacency."""
    con = duckdb.connect()
    nm = dict(
        con.execute(
            f"SELECT c_nationkey, AVG(c_acctbal) FROM "
            f"read_parquet('{SF_SMALL}/customer.parquet') GROUP BY 1"
        ).fetchall()
    )
    reg = dict(
        con.execute(
            f"SELECT n_nationkey, n_regionkey FROM "
            f"read_parquet('{SF_SMALL}/nation.parquet')"
        ).fetchall()
    )
    nats = sorted(nm)
    mbar = sum(nm.values()) / len(nm)
    z = {a: nm[a] - mbar for a in nats}
    links = [
        (a, b)
        for a in nats
        for b in nats
        if a != b and reg[a] == reg[b]
    ]
    cross = sum(z[a] * z[b] for a, b in links)
    ss = sum(v * v for v in z.values())
    row = REGISTRY["moran_i_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_nations"] == len(nats)
    assert row["n_links"] == len(links)
    assert row["moran_i"] == pytest.approx(
        len(nats) / len(links) * cross / ss, abs=2e-5
    )


def test_tukey_hsd_q_matches_bruteforce(spark):
    """Tukey-Kramer pairs replayed with plain moments."""
    groups = defaultdict(list)
    for _, seg, bal in _balances():
        groups[seg].append(bal)
    n_tot = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in groups.values()
    )
    msw = ssw / (n_tot - k)
    got = {
        (r["seg_a"], r["seg_b"]): r
        for r in REGISTRY["tukey_hsd_q"].fn(spark, SF_SMALL).collect()
    }
    segs = sorted(groups)
    assert len(got) == k * (k - 1) // 2
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            va, vb = groups[a], groups[b]
            diff = sum(va) / len(va) - sum(vb) / len(vb)
            crit = (
                3.858
                / math.sqrt(2)
                * math.sqrt(msw * (1 / len(va) + 1 / len(vb)))
            )
            r = got[(a, b)]
            assert r["mean_diff"] == pytest.approx(diff, abs=2e-5)
            assert r["hsd_critical"] == pytest.approx(crit, abs=2e-5)
            assert r["significant"] == (abs(diff) > crit)


def test_fuzzy_cmeans_q_matches_bruteforce(spark):
    """FCM trajectory replayed with a plain loop (float sums — the
    engines' quantized sums agree with these to ~1e-9 at this n)."""
    xs = [bal for _, _, bal in _balances()]
    c1, c2 = 0.0, 8000.0
    for _ in range(3):
        s1 = s1w = s2 = s2w = 0.0
        for x in xs:
            d1 = (x - c1) ** 2
            d2 = (x - c2) ** 2
            u1 = d2 / (d1 + d2)
            s1w += u1 * u1
            s1 += u1 * u1 * x
            s2w += (1 - u1) ** 2
            s2 += (1 - u1) ** 2 * x
        c1, c2 = s1 / s1w, s2 / s2w
    row = REGISTRY["fuzzy_cmeans_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_points"] == len(xs)
    assert row["centroid_lo"] == pytest.approx(min(c1, c2), abs=1e-3)
    assert row["centroid_hi"] == pytest.approx(max(c1, c2), abs=1e-3)


def test_collocation_llr_q_matches_bruteforce(spark):
    """Dunning G2 top-30 replayed with Counters."""
    bg = Counter()
    for _, text, _ in _docs():
        toks = _tok(text)
        bg.update(zip(toks, toks[1:]))
    n = sum(bg.values())
    c1 = Counter()
    c2 = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        c2[b] += c

    def g2(a, b):
        o11 = bg[(a, b)]
        o12 = c1[a] - o11
        o21 = c2[b] - o11
        o22 = n - c1[a] - c2[b] + o11
        s = 0.0
        for o, e in (
            (o11, c1[a] * c2[b]),
            (o12, c1[a] * (n - c2[b])),
            (o21, (n - c1[a]) * c2[b]),
            (o22, (n - c1[a]) * (n - c2[b])),
        ):
            if o > 0:
                s += o * math.log(o * n / e)
        return 2 * s

    scored = sorted(
        ((round(g2(a, b), 4), a, b) for (a, b) in bg),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:30]
    rows = REGISTRY["collocation_llr_q"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 30
    for (llr, a, b), r in zip(scored, rows):
        assert (r["w1"], r["w2"]) == (a, b)
        assert r["n_cooc"] == bg[(a, b)]
        assert r["llr"] == pytest.approx(llr, abs=2e-4)


def test_drawdown_q_matches_bruteforce(spark):
    """Max drawdown replayed with a running-peak loop."""
    revs = _daily("purchase")
    mu = _q6(float(sum(revs)) / len(revs))
    pnl = [r - mu for r in revs]
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    equity = peak = Decimal(0)
    first = True
    draws = []
    for day, r in zip(days, pnl):
        equity += r
        peak = equity if first else max(peak, equity)
        first = False
        draws.append((peak - equity, day))
    best = max(d for d, _ in draws)
    trough = min(day for d, day in draws if d == best)
    row = REGISTRY["drawdown_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["max_drawdown"] == pytest.approx(float(best), abs=5e-3)
    assert row["trough_day"] == trough
    assert row["final_peak_equity"] == pytest.approx(
        float(peak), abs=5e-3
    )


def _lineitems():
    con = duckdb.connect()
    return con.execute(
        f"SELECT l_partkey, l_suppkey, CAST(l_extendedprice AS DOUBLE),"
        f" CAST(l_quantity AS DOUBLE), l_shipdate FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()


def test_herfindahl_q_matches_bruteforce(spark):
    """HHI replayed from supplier revenue dicts."""
    con = duckdb.connect()
    nat = dict(
        con.execute(
            f"SELECT s_suppkey, s_nationkey FROM "
            f"read_parquet('{SF_SMALL}/supplier.parquet')"
        ).fetchall()
    )
    rev = defaultdict(float)
    for pk, sk, ep, q, d in _lineitems():
        rev[(nat[sk], sk)] += ep
    by_nat = defaultdict(dict)
    for (na, sk), r in rev.items():
        by_nat[na][sk] = r
    got = {
        r["nationkey"]: r
        for r in REGISTRY["herfindahl_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_nat)
    for na, d in by_nat.items():
        tot = sum(d.values())
        hhi = sum((v / tot) ** 2 for v in d.values())
        r = got[na]
        assert r["n_suppliers"] == len(d)
        assert r["hhi"] == pytest.approx(hhi, abs=2e-6)
        assert r["effective_n"] == pytest.approx(1 / hhi, abs=2e-4)


def test_abc_analysis_q_matches_bruteforce(spark):
    """Pareto classes replayed with a plain sorted cumsum."""
    rev = defaultdict(Decimal)
    for pk, _, ep, _, _ in _lineitems():
        rev[pk] += Decimal(str(ep)).quantize(Decimal("0.0001"))
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = float(sum(v for _, v in rev.items()) * 10000)
    cum = 0
    shares = Counter()
    counts = Counter()
    for pk, r in items:
        cum += int(r * 10000)
        cls = "A" if cum <= 0.80 * tot else "B" if cum <= 0.95 * tot else "C"
        counts[cls] += 1
        shares[cls] += int(r * 10000)
    got = {
        r["abc"]: r
        for r in REGISTRY["abc_analysis_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(counts)
    for cls in counts:
        assert got[cls]["n_parts"] == counts[cls]
        assert got[cls]["revenue_share"] == pytest.approx(
            shares[cls] / tot, abs=2e-6
        )


def test_price_index_q_matches_bruteforce(spark):
    """Laspeyres/Paasche/Fisher replayed from period dicts."""
    per = {1995: defaultdict(lambda: [0.0, 0.0]),
           2001: defaultdict(lambda: [0.0, 0.0])}
    for pk, _, ep, q, d in _lineitems():
        y = d.year
        if y in per:
            per[y][pk][0] += ep
            per[y][pk][1] += q
    common = set(per[1995]) & set(per[2001])
    p1q0 = p0q0 = p1q1 = p0q1 = 0.0
    for pk in common:
        r0, q0 = per[1995][pk]
        r1, q1 = per[2001][pk]
        p0, p1 = r0 / q0, r1 / q1
        p1q0 += p1 * q0
        p0q0 += p0 * q0
        p1q1 += p1 * q1
        p0q1 += p0 * q1
    row = REGISTRY["price_index_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_common_parts"] == len(common)
    assert row["laspeyres"] == pytest.approx(p1q0 / p0q0, abs=2e-5)
    assert row["paasche"] == pytest.approx(p1q1 / p0q1, abs=2e-5)
    assert row["fisher"] == pytest.approx(
        math.sqrt(p1q0 / p0q0 * p1q1 / p0q1), abs=2e-5
    )


def _cohort_cents():
    """Integer-cent purchase totals split by user parity."""
    tot = defaultdict(Decimal)
    for uid, _, _, v, t in _events():
        if t == "purchase":
            tot[uid] += Decimal(str(v)).quantize(Decimal("0.01"))
    xs = [int(v * 100) for u, v in tot.items() if u % 2 == 0]
    ys = [int(v * 100) for u, v in tot.items() if u % 2 == 1]
    return xs, ys


def test_energy_distance_q_matches_bruteforce(spark):
    """E-statistic replayed with the O(n^2) pairwise loops the query
    is designed to avoid."""
    xs, ys = _cohort_cents()
    nx, ny = len(xs), len(ys)
    exy = sum(abs(x - y) for x in xs for y in ys) / (nx * ny) / 100
    exx = sum(abs(a - b) for a in xs for b in xs) / (nx * nx) / 100
    eyy = sum(abs(a - b) for a in ys for b in ys) / (ny * ny) / 100
    row = REGISTRY["energy_distance_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_x"], row["n_y"]) == (nx, ny)
    assert row["e_xy"] == pytest.approx(exy, abs=2e-6)
    assert row["e_xx"] == pytest.approx(exx, abs=2e-6)
    assert row["e_yy"] == pytest.approx(eyy, abs=2e-6)
    assert row["energy_dist"] == pytest.approx(
        math.sqrt(max(0.0, 2 * exy - exx - eyy)), abs=2e-6
    )


def test_wasserstein_q_matches_bruteforce(spark):
    """W1 replayed with scipy-style sorted-quantile integration."""
    xs, ys = _cohort_cents()
    allv = sorted(set(xs) | set(ys))
    import bisect

    xs_s, ys_s = sorted(xs), sorted(ys)
    w1 = 0.0
    for a, b in zip(allv, allv[1:]):
        fx = bisect.bisect_right(xs_s, a) / len(xs)
        fy = bisect.bisect_right(ys_s, a) / len(ys)
        w1 += abs(fx - fy) * (b - a)
    row = REGISTRY["wasserstein_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_x"], row["n_y"]) == (len(xs), len(ys))
    assert row["wasserstein_1"] == pytest.approx(w1 / 100, abs=2e-6)


def test_cvar_q_matches_bruteforce(spark):
    """VaR/CVaR replayed with a plain sort of daily losses."""
    revs = _daily("purchase")
    mu = _q6(float(sum(revs)) / len(revs))
    losses = sorted((float(mu - r) for r in revs), reverse=True)
    n = len(losses)
    k = math.ceil(0.05 * n)
    row = REGISTRY["cvar_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["var_95"] == pytest.approx(losses[k - 1], abs=5e-3)
    assert row["cvar_95"] == pytest.approx(
        sum(losses[:k]) / k, abs=5e-3
    )


def test_newsvendor_q_matches_bruteforce(spark):
    """q* and expected costs replayed with a sorted demand list."""
    demand = sorted(
        Counter(
            ts.date() for _, ts, _, _, t in _events() if t == "purchase"
        ).values()
    )
    n = len(demand)
    q = demand[math.ceil(0.8 * n) - 1]
    over = sum(max(q - d, 0) for d in demand) / n
    under = sum(max(d - q, 0) for d in demand) / n
    row = REGISTRY["newsvendor_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["q_star"] == q
    assert row["expected_overage"] == pytest.approx(over, abs=2e-4)
    assert row["expected_underage"] == pytest.approx(under, abs=2e-4)


def test_ltv_cohort_q_matches_bruteforce(spark):
    """Cohort LTV curve replayed with dicts."""
    import datetime

    base = datetime.date(2024, 1, 1)
    first = {}
    for uid, ts, _, _, _ in _events():
        d = ts.date()
        if uid not in first or d < first[uid]:
            first[uid] = d
    cohort = {u: (d - base).days // 7 for u, d in first.items()}
    sizes = Counter(cohort.values())
    rev = defaultdict(Decimal)
    for uid, ts, _, v, t in _events():
        if t == "purchase":
            age = (ts.date() - base).days // 7 - cohort[uid]
            rev[(cohort[uid], age)] += Decimal(str(v)).quantize(
                Decimal("0.000001")
            )
    rows = REGISTRY["ltv_cohort_q"].fn(spark, SF_SMALL).collect()
    got = {(r["cohort"], r["age_weeks"]): r for r in rows}
    assert set(got) == set(rev)
    for c in sorted(sizes):
        cum = Decimal(0)
        for age in sorted(a for (cc, a) in rev if cc == c):
            cum += rev[(c, age)]
            r = got[(c, age)]
            assert r["cohort_size"] == sizes[c]
            assert r["cum_ltv_per_user"] == pytest.approx(
                float(cum) / sizes[c], abs=2e-4
            )


def test_xi_correlation_q_matches_bruteforce(spark):
    """Chatterjee's xi replayed with plain sorts."""
    agg = defaultdict(lambda: [None, None])
    for uid, _, _, v, t in _events():
        if t == "click":
            agg[uid][0] = (agg[uid][0] or Decimal(0)) + Decimal(
                str(v)
            ).quantize(Decimal("0.000001"))
        elif t == "purchase":
            agg[uid][1] = (agg[uid][1] or Decimal(0)) + Decimal(
                str(v)
            ).quantize(Decimal("0.000001"))
    pts = [
        (uid, x, y) for uid, (x, y) in agg.items()
        if x is not None and y is not None
    ]
    n = len(pts)
    by_y = sorted(pts, key=lambda p: (p[2], p[0]))
    rank = {uid: i + 1 for i, (uid, _, _) in enumerate(by_y)}
    by_x = sorted(pts, key=lambda p: (p[1], p[0]))
    rs = [rank[uid] for uid, _, _ in by_x]
    xi = 1 - 3 * sum(
        abs(b - a) for a, b in zip(rs, rs[1:])
    ) / (n * n - 1)
    row = REGISTRY["xi_correlation_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert row["xi"] == pytest.approx(xi, abs=2e-6)


def test_partial_corr_q_matches_bruteforce(spark):
    """Partial correlation replayed with numpy."""
    import numpy as np

    agg = defaultdict(lambda: [0.0, 0.0, 0.0])
    for uid, _, _, v, t in _events():
        i = {"click": 0, "purchase": 1, "view": 2}.get(t)
        if i is not None:
            agg[uid][i] += v
    m = np.array(list(agg.values()))
    r = np.corrcoef(m.T)
    rxy, rxz, ryz = r[0, 1], r[0, 2], r[1, 2]
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    row = REGISTRY["partial_corr_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == len(agg)
    assert row["r_xy"] == pytest.approx(rxy, abs=2e-5)
    assert row["r_xz"] == pytest.approx(rxz, abs=2e-5)
    assert row["r_yz"] == pytest.approx(ryz, abs=2e-5)
    assert row["partial_r"] == pytest.approx(part, abs=2e-5)


def test_multi_touch_attribution_q_matches_bruteforce(spark):
    """U-shaped credits replayed with per-purchase loops."""
    import datetime

    by_user = defaultdict(list)
    for uid, ts, eid, _, t in _events():
        by_user[uid].append((ts, eid, t))
    credit = defaultdict(float)
    touches = Counter()
    for uid, evs in by_user.items():
        evs.sort()
        for pts, pid, pt in evs:
            if pt != "purchase":
                continue
            window = [
                (ts, eid, t)
                for ts, eid, t in evs
                if t != "purchase"
                and ts < pts
                and ts >= pts - datetime.timedelta(days=3)
            ]
            m = len(window)
            for k, (_, _, ch) in enumerate(sorted(window), start=1):
                touches[ch] += 1
                if m == 1:
                    credit[ch] += 1.0
                elif m == 2:
                    credit[ch] += 0.5
                elif k in (1, m):
                    credit[ch] += 0.4
                else:
                    credit[ch] += 0.2 / (m - 2)
    got = {
        r["channel"]: r
        for r in REGISTRY["multi_touch_attribution_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(touches)
    for ch in touches:
        assert got[ch]["n_touches"] == touches[ch]
        assert got[ch]["total_credit"] == pytest.approx(
            credit[ch], abs=2e-3
        )


def test_hodges_lehmann_q_matches_bruteforce(spark):
    """Pseudo-median replayed with an explicit Walsh list."""
    revs = _daily("purchase")
    mu = _q6(float(sum(revs)) / len(revs))
    v = [r - mu for r in revs]
    walsh = sorted(
        (a + b) / 2 for i, a in enumerate(v) for b in v[i:]
    )
    n = len(walsh)
    if n % 2 == 1:
        hl = float(walsh[n // 2])
    else:
        hl = float(walsh[n // 2 - 1] + walsh[n // 2]) / 2
    row = REGISTRY["hodges_lehmann_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_walsh"] == n
    assert row["hodges_lehmann"] == pytest.approx(hl, abs=2e-4)


def test_log_rank_test_q_matches_bruteforce(spark):
    """Log-rank O/E/V replayed with per-time loops."""
    first_signup = {}
    last_any = {}
    first_purchase = {}
    for uid, ts, _, _, t in _events():
        if t == "signup":
            if uid not in first_signup or ts < first_signup[uid]:
                first_signup[uid] = ts
        if uid not in last_any or ts > last_any[uid]:
            last_any[uid] = ts
    for uid, ts, _, _, t in _events():
        if (
            t == "purchase"
            and uid in first_signup
            and ts >= first_signup[uid]
        ):
            if uid not in first_purchase or ts < first_purchase[uid]:
                first_purchase[uid] = ts
    subj = []
    for uid, t0 in first_signup.items():
        if uid in first_purchase:
            dur = (first_purchase[uid].date() - t0.date()).days
            obs = 1
        else:
            dur = (last_any[uid].date() - t0.date()).days
            obs = 0
        subj.append((uid % 2, dur, obs))
    times = sorted({d for _, d, o in subj if o == 1})
    o0 = e0 = v = 0.0
    for t in times:
        at_risk = [(g, d, o) for g, d, o in subj if d >= t]
        n = len(at_risk)
        n0 = sum(1 for g, _, _ in at_risk if g == 0)
        d = sum(1 for _, dd, o in at_risk if dd == t and o == 1)
        d0 = sum(
            1 for g, dd, o in at_risk if g == 0 and dd == t and o == 1
        )
        o0 += d0
        e0 += d * n0 / n
        if n > 1:
            v += d * (n0 / n) * (1 - n0 / n) * (n - d) / (n - 1)
    row = REGISTRY["log_rank_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["observed_g0"] == o0
    assert row["expected_g0"] == pytest.approx(e0, abs=2e-4)
    assert row["logrank_z"] == pytest.approx(
        (o0 - e0) / math.sqrt(v), abs=2e-5
    )
    assert row["logrank_chi2"] == pytest.approx(
        (o0 - e0) ** 2 / v, abs=2e-5
    )


def _km_table():
    """(duration, observed) per signup user, mirroring km_survival_q."""
    first_signup, last_any, first_purchase = {}, {}, {}
    for uid, ts, _, _, t in _events():
        if t == "signup" and (
            uid not in first_signup or ts < first_signup[uid]
        ):
            first_signup[uid] = ts
        if uid not in last_any or ts > last_any[uid]:
            last_any[uid] = ts
    for uid, ts, _, _, t in _events():
        if (
            t == "purchase"
            and uid in first_signup
            and ts >= first_signup[uid]
            and (uid not in first_purchase or ts < first_purchase[uid])
        ):
            first_purchase[uid] = ts
    out = []
    for uid, t0 in first_signup.items():
        if uid in first_purchase:
            out.append(
                ((first_purchase[uid].date() - t0.date()).days, 1)
            )
        else:
            out.append(((last_any[uid].date() - t0.date()).days, 0))
    return out


def test_km_greenwood_q_matches_bruteforce(spark):
    """KM + Greenwood band replayed with a sequential loop."""
    subj = _km_table()
    times = sorted({d for d, o in subj if o == 1})
    s = 1.0
    gv = 0.0
    expect = {}
    for t in times:
        n = sum(1 for d, _ in subj if d >= t)
        d = sum(1 for dd, o in subj if dd == t and o == 1)
        if n > d:
            s *= (n - d) / n
            gv += d / (n * (n - d))
            half = 1.96 * s * math.sqrt(gv)
            expect[t] = (s, max(0.0, s - half), min(1.0, s + half))
    got = {
        r["duration_days"]: r
        for r in REGISTRY["km_greenwood_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for t, (sv, lo, hi) in expect.items():
        r = got[t]
        assert r["survival"] == pytest.approx(sv, abs=2e-6)
        assert r["ci_lo"] == pytest.approx(lo, abs=2e-6)
        assert r["ci_hi"] == pytest.approx(hi, abs=2e-6)


def test_seasonal_esd_q_matches_bruteforce(spark):
    """Seasonal-ESD flags replayed with the dict STL + MAD."""
    import datetime

    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        if t == "view":
            d = agg[ts.date()]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    days = sorted(agg)
    m = {d: _q6(float(s) / c) for d, (s, c) in agg.items()}
    trend = {}
    for i, day in enumerate(days):
        win = [m[d] for d in days[max(0, i - 3) : i + 4]]
        trend[day] = _q6(float(sum(win)) / len(win))
    base = datetime.date(2024, 1, 1)
    sg = defaultdict(list)
    for d in days:
        sg[(d - base).days % 7].append(m[d] - trend[d])
    seasonal = {k: _q6(float(sum(v)) / len(v)) for k, v in sg.items()}
    resid = {
        d: m[d] - trend[d] - seasonal[(d - base).days % 7] for d in days
    }

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    med = lower_median(resid.values())
    mad = lower_median([abs(r - med) for r in resid.values()])
    sig = 1.4826 * float(mad)
    expect = {
        d: float(r) for d, r in resid.items() if abs(float(r)) > 3 * sig
    }
    got = {
        r["day"]: r
        for r in REGISTRY["seasonal_esd_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for d, r0 in expect.items():
        assert got[d]["residual"] == pytest.approx(r0, abs=2e-4)
        assert got[d]["esd_score"] == pytest.approx(r0 / sig, abs=2e-3)


def test_knn_loo_accuracy_q_matches_bruteforce(spark):
    """LOO 5-NN vote replayed with numpy distances."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    labels = {r[0]: r[1] for r in rows}
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    n = len(ids)
    per_label = defaultdict(lambda: [0, 0])
    for qi in range(n):
        d2 = np.round(((mat - mat[qi]) ** 2).sum(axis=1), 6)
        nn5 = sorted(
            (float(d2[ci]), ids[ci]) for ci in range(n) if ci != qi
        )[:5]
        votes = Counter(labels[cid] for _, cid in nn5)
        best = max(votes.values())
        pred = min(l for l, v in votes.items() if v == best)
        t = labels[ids[qi]]
        per_label[t][0] += 1
        per_label[t][1] += 1 if pred == t else 0
    got = {
        r["label"]: r
        for r in REGISTRY["knn_loo_accuracy_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(per_label)
    for lab, (nv, nc) in per_label.items():
        assert got[lab]["n_vectors"] == nv
        assert got[lab]["n_correct"] == nc
        assert got[lab]["accuracy"] == pytest.approx(nc / nv, abs=2e-6)


def test_conformal_interval_q_matches_bruteforce(spark):
    """Split-conformal replayed with the same hash folds."""
    tot = _purchase_totals()
    folds = {u: _poly(f"conf:{u}") % 10 for u in tot}
    train = [tot[u] for u in tot if folds[u] < 4]
    cal = sorted(
        (abs(tot[u] - sum(train) / len(train)), u)
        for u in tot
        if 4 <= folds[u] < 7
    )
    mu = sum(train) / len(train)
    n_cal = len(cal)
    k = min(n_cal, math.ceil(0.9 * (n_cal + 1)))
    q = cal[k - 1][0]
    test = [tot[u] for u in tot if folds[u] >= 7]
    cov = sum(1 for y in test if abs(y - mu) <= q) / len(test)
    row = (
        REGISTRY["conformal_interval_q"].fn(spark, SF_SMALL).collect()[0]
    )
    assert row["n_train"] == len(train)
    assert row["n_cal"] == n_cal and row["n_test"] == len(test)
    assert row["point_pred"] == pytest.approx(mu, abs=2e-4)
    assert row["q_hat"] == pytest.approx(q, abs=2e-4)
    assert row["test_coverage"] == pytest.approx(cov, abs=2e-6)


def test_array_hof_breadth_matches_bruteforce(spark):
    """Every higher-order scalar replayed with python list ops."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_orderkey, CAST(l_quantity AS BIGINT) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    orders = defaultdict(list)
    for ok, q in rows:
        orders[ok].append(q)
    agg = defaultdict(lambda: [0] * 9)
    for ok, qs in orders.items():
        qs = sorted(qs)
        b = ok % 97
        a = agg[b]
        a[0] += len(qs)
        a[1] += sum(x * x for x in qs)
        a[2] += sum(1 for x in qs if x > 25)
        a[3] += 1 if any(x % 2 == 0 for x in qs) else 0
        a[4] += 1 if all(x > 0 for x in qs) else 0
        fh = qs[0]
        for x in qs[1:]:
            fh = (fh * 31 + x) % 1000003
        a[5] += fh
        a[6] += sum(qs[:2])
        a[7] += len(set(qs))
        a[8] += sum(x * (i + 1) for i, x in enumerate(qs))
    got = {
        r["bucket"]: r
        for r in REGISTRY["array_hof_breadth"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(agg)
    cols = [
        "items", "sum_sq", "n_large", "n_has_even", "n_all_positive",
        "fold_hash_sum", "head2_sum", "n_distinct", "weighted_sum",
    ]
    for b, vals in agg.items():
        for c, v in zip(cols, vals):
            assert got[b][c] == v, (b, c)


def test_grid_dbscan_q_matches_bruteforce(spark):
    """Grid clusters replayed with a BFS over core cells."""
    import numpy as np

    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    ).fetchall()
    cells = Counter()
    for (v,) in vecs:
        cells[(math.floor(v[0] / 0.1), math.floor(v[1] / 0.1))] += 1
    core = {}
    for (cx, cy), c in cells.items():
        nb = sum(
            cells.get((cx + dx, cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        if nb >= 8:
            core[(cx, cy)] = c
    seen = set()
    clusters = {}
    for start in core:
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            cx, cy = stack.pop()
            comp.append((cx, cy))
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
        cid = min((cx + 1000) * 100000 + cy + 1000 for cx, cy in comp)
        clusters[cid] = (
            len(comp), sum(core[c] for c in comp)
        )
    got = {
        r["cluster"]: (r["n_cells"], r["n_points"])
        for r in REGISTRY["grid_dbscan_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == clusters


def test_did_q_matches_bruteforce(spark):
    """2x2 DiD replayed with cell loops."""
    import datetime

    cut = datetime.datetime(2024, 1, 16)
    cells = defaultdict(lambda: [Decimal(0), 0])
    for uid, ts, _, v, t in _events():
        if t == "purchase":
            c = cells[(uid % 2, 1 if ts >= cut else 0)]
            c[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            c[1] += 1
    mean = {k: float(s) / n for k, (s, n) in cells.items()}
    td = mean[(1, 1)] - mean[(1, 0)]
    cd = mean[(0, 1)] - mean[(0, 0)]
    row = REGISTRY["did_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_events"] == sum(n for _, n in cells.values())
    assert row["treated_delta"] == pytest.approx(td, abs=2e-5)
    assert row["control_delta"] == pytest.approx(cd, abs=2e-5)
    assert row["did_estimate"] == pytest.approx(td - cd, abs=2e-5)


def test_funnel_significance_q_matches_bruteforce(spark):
    """Per-step two-proportion z replayed with flag dicts."""
    flags = defaultdict(lambda: [0, 0, 0, 0])
    order = {"signup": 0, "view": 1, "click": 2, "purchase": 3}
    for uid, _, _, _, t in _events():
        if t in order:
            flags[uid][order[t]] = 1
    expect = {}
    for name, i, j in [
        ("view_of_signup", 0, 1),
        ("click_of_view", 1, 2),
        ("purchase_of_click", 2, 3),
    ]:
        stats = {0: [0, 0], 1: [0, 0]}
        for uid, f in flags.items():
            g = uid % 2
            if f[i]:
                stats[g][0] += 1
                if f[j]:
                    stats[g][1] += 1
        (n0, c0), (n1, c1) = stats[0], stats[1]
        r0 = c0 / n0 if n0 else None
        r1 = c1 / n1 if n1 else None
        z = None
        if n0 and n1:
            pool = (c0 + c1) / (n0 + n1)
            var = pool * (1 - pool) * (1 / n0 + 1 / n1)
            if var > 0:
                z = (r0 - r1) / math.sqrt(var)
        expect[name] = (r0, r1, z)
    got = {
        r["step"]: r
        for r in REGISTRY["funnel_significance_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expect)
    for name, (r0, r1, z) in expect.items():
        r = got[name]
        for col, v in [("rate_g0", r0), ("rate_g1", r1), ("z_stat", z)]:
            if v is None:
                assert r[col] is None
            else:
                assert r[col] == pytest.approx(v, abs=2e-5)


def test_join_cardinality_audit_q_matches_bruteforce(spark):
    """Estimate vs actual replayed with Counters."""
    con = duckdb.connect()
    okeys = [
        r[0]
        for r in con.execute(
            f"SELECT o_orderkey FROM "
            f"read_parquet('{SF_SMALL}/orders.parquet')"
        ).fetchall()
    ]
    lkeys = [
        r[0]
        for r in con.execute(
            f"SELECT l_orderkey FROM "
            f"read_parquet('{SF_SMALL}/lineitem.parquet')"
        ).fetchall()
    ]
    rb = defaultdict(list)
    sb = defaultdict(list)
    for k in okeys:
        rb[k % 16].append(k)
    for k in lkeys:
        sb[k % 16].append(k)
    got = {
        r["bucket"]: r
        for r in REGISTRY["join_cardinality_audit_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    for b in got:
        n_r, ndv_r = len(rb[b]), len(set(rb[b]))
        n_s, ndv_s = len(sb[b]), len(set(sb[b]))
        ocount = Counter(rb[b])
        actual = sum(ocount[k] for k in sb[b] if k in ocount)
        est = n_r * n_s / max(ndv_r, ndv_s)
        r = got[b]
        assert (r["n_orders"], r["n_lineitems"]) == (n_r, n_s)
        assert r["estimated"] == pytest.approx(est, abs=5e-2)
        assert r["actual"] == actual
        assert r["q_error"] == pytest.approx(
            max(est / actual, actual / est), abs=2e-4
        )


def test_quantile_normalize_q_matches_bruteforce(spark):
    """Quantile normalization replayed with per-source sorts."""
    by_src = defaultdict(list)
    con = duckdb.connect()
    for doc_id, n_chars, src in con.execute(
        f"SELECT doc_id, n_chars, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall():
        by_src[src].append((n_chars, doc_id))
    ranked = {}
    for src, items in by_src.items():
        items.sort()
        for r, (nc, did) in enumerate(items, start=1):
            ranked[(src, r)] = nc
    max_r = max(r for _, r in ranked)
    prof = {}
    for r in range(1, max_r + 1):
        vals = [v for (s, rr), v in ranked.items() if rr == r]
        prof[r] = float(
            Decimal(repr(sum(vals) / len(vals))).quantize(
                Decimal("0.000001"),
                rounding=__import__("decimal").ROUND_HALF_UP,
            )
        )
    agg = defaultdict(lambda: [0, 0.0])
    for (src, r), _ in ranked.items():
        n_src = len(by_src[src])
        dec = (r - 1) * 10 // n_src
        a = agg[(src, dec)]
        a[0] += 1
        a[1] += prof[r]
    got = {
        (r["source"], r["decile"]): r
        for r in REGISTRY["quantile_normalize_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(agg)
    for key, (n, s) in agg.items():
        assert got[key]["n_docs"] == n
        assert got[key]["mean_normalized"] == pytest.approx(
            s / n, abs=2e-4
        )


def test_trend_break_q_matches_bruteforce(spark):
    """Breakpoint search replayed with a float OLS loop."""
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    n = len(ms)

    def sse(pts):
        k = len(pts)
        sx = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(t * t for t, _ in pts)
        sxy = sum(t * y for t, y in pts)
        syy = sum(y * y for _, y in pts)
        cxx = sxx - sx * sx / k
        cxy = sxy - sx * sy / k
        cyy = syy - sy * sy / k
        return cyy - (cxy * cxy / cxx if cxx > 0 else 0.0)

    best = None
    pts = list(enumerate(ms, start=1))
    for split in range(3, n - 2):
        tot = round(sse(pts[:split]) + sse(pts[split:]), 6)
        if best is None or tot < best[1]:
            best = (split, tot)
    row = REGISTRY["trend_break_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["break_t"] == best[0]
    assert row["total_sse"] == pytest.approx(best[1], abs=2e-4)


def test_abc_xyz_q_matches_bruteforce(spark):
    """3x3 census replayed with dict passes."""
    rev = defaultdict(Decimal)
    wk = defaultdict(lambda: defaultdict(Decimal))
    for pk, _, ep, q, d in _lineitems():
        rev[pk] += Decimal(str(ep)).quantize(Decimal("0.0001"))
        import datetime

        w = (d.date() - datetime.date(1995, 1, 1)).days // 7
        wk[pk][w] += Decimal(str(q)).quantize(Decimal("0.0001"))
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = float(sum(rev.values()) * 10000)
    cum = 0
    abc = {}
    for pk, r in items:
        cum += int(r * 10000)
        abc[pk] = (
            "A" if cum <= 0.8 * tot else "B" if cum <= 0.95 * tot else "C"
        )
    census = Counter()
    for pk in rev:
        qs = [float(v) for v in wk[pk].values()]
        k = len(qs)
        if k < 2:
            x = "Z"
        else:
            mu = sum(qs) / k
            sd = math.sqrt(max(sum(q * q for q in qs) / k - mu * mu, 0))
            cvv = sd / mu
            x = "X" if cvv < 0.5 else "Y" if cvv < 1.0 else "Z"
        census[(abc[pk], x)] += 1
    got = {
        (r["abc"], r["xyz"]): r["n_parts"]
        for r in REGISTRY["abc_xyz_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == dict(census)


def test_haar_energy_q_matches_bruteforce(spark):
    """Band energies replayed with an explicit Haar loop."""
    revs = [float(r) for r in _daily("purchase")]
    expect = {}
    for k in range(1, 6):
        half = 1 << (k - 1)
        width = 1 << k
        nblk = set()
        energy = 0.0
        for blk in range(0, (len(revs) + width - 1) // width + 1):
            seg = revs[blk * width : (blk + 1) * width]
            if not seg:
                continue
            nblk.add(blk)
            left = sum(seg[:half])
            right = sum(seg[half:])
            energy += (left - right) ** 2
        expect[k] = (len(nblk), energy / (1 << k))
    got = {
        r["level"]: r
        for r in REGISTRY["haar_energy_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for k, (nb, en) in expect.items():
        assert got[k]["n_blocks"] == nb
        assert got[k]["band_energy"] == pytest.approx(en, rel=1e-6)


def test_longest_streak_q_matches_bruteforce(spark):
    """Longest increasing run replayed with a scan."""
    revs = _daily("purchase")
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    best_len, best_start = 1, days[0]
    cur_len, cur_start = 1, days[0]
    for i in range(1, len(revs)):
        if revs[i] > revs[i - 1]:
            cur_len += 1
        else:
            cur_len, cur_start = 1, days[i]
        if cur_len > best_len:
            best_len, best_start = cur_len, cur_start
    row = REGISTRY["longest_streak_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["streak_len"] == best_len
    assert row["start_day"] == best_start


def test_welford_merge_q_matches_bruteforce(spark):
    """Both variance paths replayed directly from raw balances."""
    xs = [bal for _, _, bal in _balances()]
    n = len(xs)
    mu = sum(xs) / n
    var = sum((x - mu) ** 2 for x in xs) / (n - 1)
    row = REGISTRY["welford_merge_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_rows"] == n
    assert row["var_direct"] == pytest.approx(var, rel=1e-6)
    assert row["var_merged"] == pytest.approx(var, rel=1e-6)
    assert row["merge_agrees"] is True


def test_rmst_q_matches_bruteforce(spark):
    """KM step integral replayed sequentially."""
    subj = _km_table()
    times = sorted({d for d, o in subj if o == 1 and d < 14})
    s = 1.0
    curve = []
    for t in times:
        n = sum(1 for d, _ in subj if d >= t)
        d = sum(1 for dd, o in subj if dd == t and o == 1)
        if n > d:
            s *= (n - d) / n
        curve.append((t, s))
    rmst = curve[0][0] if curve else 14.0
    for (t, sv), (t_next, _) in zip(curve, curve[1:] + [(14, None)]):
        rmst += sv * (min(t_next, 14) - t)
    row = REGISTRY["rmst_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_steps"] == len(curve)
    assert row["rmst_14d"] == pytest.approx(rmst, abs=2e-4)


def test_dunn_test_q_matches_bruteforce(spark):
    """Dunn pairwise z + BH replayed with midranks."""
    groups = defaultdict(list)
    allx = []
    for _, seg, bal in _balances():
        groups[seg].append(bal)
        allx.append(bal)
    allx.sort()
    rank_of = {}
    i = 0
    while i < len(allx):
        j = i
        while j < len(allx) and allx[j] == allx[i]:
            j += 1
        mid = (i + 1 + j) / 2
        rank_of[allx[i]] = mid
        i = j
    nn = len(allx)
    mr = {
        s: sum(rank_of[x] for x in v) / len(v)
        for s, v in groups.items()
    }
    segs = sorted(groups)
    fam = []
    for ii, a in enumerate(segs):
        for b in segs[ii + 1 :]:
            az = abs(mr[a] - mr[b]) / math.sqrt(
                nn * (nn + 1) / 12 * (1 / len(groups[a]) + 1 / len(groups[b]))
            )
            fam.append((a, b, az, math.erfc(az / math.sqrt(2))))
    fam_sorted = sorted(fam, key=lambda r: (r[3], r[0], r[1]))
    m = len(fam)
    kstar = max(
        (i for i, r in enumerate(fam_sorted, 1) if r[3] <= 0.05 * i / m),
        default=0,
    )
    sig = {
        (r[0], r[1]): i <= kstar
        for i, r in enumerate(fam_sorted, 1)
    }
    got = {
        (r["seg_a"], r["seg_b"]): r
        for r in REGISTRY["dunn_test_q"].fn(spark, SF_SMALL).collect()
    }
    assert len(got) == m
    for a, b, az, p in fam:
        r = got[(a, b)]
        assert r["abs_z"] == pytest.approx(az, abs=2e-4)
        assert r["p_value"] == pytest.approx(p, abs=1e-6)
        assert r["significant"] == sig[(a, b)]


def test_ransac_trend_q_matches_bruteforce(spark):
    """Exhaustive consensus search replayed with loops."""
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    pts = list(enumerate(ms, start=1))
    best = None
    for ii, (ti, yi) in enumerate(pts):
        for tj, yj in pts[ii + 1 :]:
            slope = (yj - yi) / (tj - ti)
            icpt = yi - slope * ti
            inl = sum(
                1 for t, y in pts if abs(y - (slope * t + icpt)) <= 50.0
            )
            key = (-inl, ti, tj)
            if best is None or key < best[0]:
                best = (key, slope, icpt)
    (negin, i, j), slope, icpt = best
    row = REGISTRY["ransac_trend_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["i"], row["j"]) == (i, j)
    assert row["n_inliers"] == -negin
    assert row["slope"] == pytest.approx(slope, abs=2e-6)
    assert row["intercept"] == pytest.approx(icpt, abs=2e-4)


def test_bradley_terry_q_matches_bruteforce(spark):
    """MM iterations replayed with dict arithmetic."""
    dt = defaultdict(dict)
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    for (day, t), (s, c) in agg.items():
        dt[day][t] = _q6(float(s) / c)
    wins = Counter()
    for day, ms in dt.items():
        for ti in ms:
            for tj in ms:
                if ti != tj and ms[ti] > ms[tj]:
                    wins[(ti, tj)] += 1
    types = sorted({t for d in dt.values() for t in d})
    pi = {t: 1.0 for t in types}
    for _ in range(3):
        new = {}
        for ti in types:
            w_i = sum(wins.get((ti, tj), 0) for tj in types if tj != ti)
            den = sum(
                (wins.get((ti, tj), 0) + wins.get((tj, ti), 0))
                / (pi[ti] + pi[tj])
                for tj in types
                if tj != ti
            )
            new[ti] = w_i / den
        pi = new
    tot = sum(pi.values())
    got = {
        r["event_type"]: r["strength"]
        for r in REGISTRY["bradley_terry_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(types)
    for t in types:
        assert got[t] == pytest.approx(pi[t] / tot, abs=2e-6)


def test_geometric_median_q_matches_bruteforce(spark):
    """Weiszfeld trajectory replayed with numpy."""
    import numpy as np

    con = duckdb.connect()
    pts = np.array(
        [
            (v[0], v[1])
            for (v,) in con.execute(
                f"SELECT embedding FROM "
                f"read_parquet('{SF_SMALL}/embeddings.parquet')"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    c = pts.mean(axis=0)
    for _ in range(3):
        d = np.sqrt(((pts - c) ** 2).sum(axis=1))
        mask = d > 0
        w = 1 / d[mask]
        c = (pts[mask] * w[:, None]).sum(axis=0) / w.sum()
    row = REGISTRY["geometric_median_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_points"] == len(pts)
    assert row["median_x"] == pytest.approx(c[0], abs=2e-5)
    assert row["median_y"] == pytest.approx(c[1], abs=2e-5)


def test_regression_diagnostics_q_matches_bruteforce(spark):
    """Leverage / studentized / Cook's D replayed with float OLS."""
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    n = len(ms)
    ts_ = list(range(1, n + 1))
    sx, sy = sum(ts_), sum(ms)
    sxx = sum(t * t for t in ts_)
    sxy = sum(t * y for t, y in zip(ts_, ms))
    syy = sum(y * y for y in ms)
    cxx = sxx - sx * sx / n
    cxy = sxy - sx * sy / n
    cyy = syy - sy * sy / n
    b = cxy / cxx
    a = sy / n - b * sx / n
    s2 = (cyy - cxy * cxy / cxx) / (n - 2)
    xbar = sx / n
    got = {
        r["day"]: r
        for r in REGISTRY["regression_diagnostics_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(days)
    for t, y, day in zip(ts_, ms, days):
        e = y - (a + b * t)
        h = 1 / n + (t - xbar) ** 2 / cxx
        stud = e / math.sqrt(s2 * (1 - h))
        cd = stud * stud * h / (2 * (1 - h))
        r = got[day]
        assert r["residual"] == pytest.approx(e, abs=2e-4)
        assert r["leverage"] == pytest.approx(h, abs=2e-6)
        assert r["studentized"] == pytest.approx(stud, abs=2e-4)
        assert r["cooks_d"] == pytest.approx(cd, abs=2e-6)
        assert r["influential"] == (cd > 4 / n)


def test_boxcox_q_matches_bruteforce(spark):
    """Profile LL grid replayed with float loops."""
    con = duckdb.connect()
    xs = [
        r[0]
        for r in con.execute(
            f"SELECT o_totalprice FROM "
            f"read_parquet('{SF_SMALL}/orders.parquet')"
        ).fetchall()
    ]
    n = len(xs)
    slnx = sum(math.log(x) for x in xs)
    lls = {}
    for l in (-1.0, -0.5, 0.0, 0.5, 1.0):
        ys = [
            math.log(x) if l == 0 else (x**l - 1) / l for x in xs
        ]
        mu = sum(ys) / n
        var = sum((y - mu) ** 2 for y in ys) / n
        lls[l] = -n / 2 * math.log(var) + (l - 1) * slnx
    best = max(lls.values())
    got = {
        r["lambda"]: r
        for r in REGISTRY["boxcox_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(lls)
    for l, ll in lls.items():
        assert got[l]["profile_ll"] == pytest.approx(ll, rel=1e-6)
        assert got[l]["is_best"] == (ll == best)


def test_youden_j_q_matches_bruteforce(spark):
    """Best threshold replayed from the sorted score table."""
    scored = _doc_scores()
    by_s = defaultdict(lambda: [0, 0])
    for y, s in scored:
        by_s[s][0] += y
        by_s[s][1] += 1 - y
    p_tot = sum(v[0] for v in by_s.values())
    n_tot = sum(v[1] for v in by_s.values())
    tp = fp = 0
    best = None
    for s in sorted(by_s, reverse=True):
        tp += by_s[s][0]
        fp += by_s[s][1]
        j = tp / p_tot - fp / n_tot
        key = (-j, s)
        if best is None or key < best[0]:
            best = (key, s, tp / p_tot, fp / n_tot)
    _, s, tpr, fpr = best
    row = REGISTRY["youden_j_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["threshold"] == pytest.approx(s, abs=1e-9)
    assert row["tpr"] == pytest.approx(tpr, abs=2e-6)
    assert row["fpr"] == pytest.approx(fpr, abs=2e-6)
    assert row["youden_j"] == pytest.approx(tpr - fpr, abs=2e-6)


def test_ece_q_matches_bruteforce(spark):
    """10-bin ECE replayed with integer bin keys."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    bins = defaultdict(lambda: [0, 0, 0])
    for lang, text in rows:
        toks = _tok(text)
        if not toks:
            continue
        p_mil = 100 * sum(len(t) for t in toks) // len(toks)
        b = min(p_mil // 100, 9)
        bins[b][0] += 1
        bins[b][1] += 1 if lang == "en" else 0
        bins[b][2] += p_mil
    n = sum(v[0] for v in bins.values())
    ece = sum(
        nk / n * abs(pos / nk - conf / nk / 1000)
        for nk, pos, conf in bins.values()
    )
    row = REGISTRY["ece_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_docs"] == n
    assert row["n_bins"] == len(bins)
    assert row["ece"] == pytest.approx(ece, abs=2e-6)


def test_lorenz_curve_q_matches_bruteforce(spark):
    """Cumulative decile shares replayed with a plain sort."""
    bals = sorted(
        (
            Decimal(str(b)).quantize(Decimal("0.000001")),
            ck,
        )
        for ck, _, b in [
            (r[0], None, r[1])
            for r in duckdb.connect()
            .execute(
                f"SELECT c_custkey, c_acctbal FROM "
                f"read_parquet('{SF_SMALL}/customer.parquet')"
            )
            .fetchall()
        ]
    )
    lo = min(b for b, _ in bals)
    ws = [(b - lo, ck) for b, ck in bals]
    n = len(ws)
    q, r = divmod(n, 10)
    sizes = [q + 1 if i < r else q for i in range(10)]
    tot = float(sum(w for w, _ in ws))
    idx = 0
    cum = Decimal(0)
    expect = {}
    for d, size in enumerate(sizes, start=1):
        block = ws[idx : idx + size]
        idx += size
        cum += sum(w for w, _ in block)
        expect[d] = (size, float(cum) / tot)
    got = {
        r["decile"]: r
        for r in REGISTRY["lorenz_curve_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for d, (size, share) in expect.items():
        assert got[d]["n_customers"] == size
        assert got[d]["cum_share"] == pytest.approx(share, abs=2e-6)


def test_bandit_replay_q_matches_bruteforce(spark):
    """Replay estimator replayed with running-mean dicts."""
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    days = sorted({d for d, _ in agg})
    arms = sorted({a for _, a in agg})
    r = {
        (d, a): float(s) / c for (d, a), (s, c) in agg.items()
    }
    prior = defaultdict(lambda: [0.0, 0])
    greedy, uniform, n_days = [], [], 0
    for d in days:
        avail = [
            a for a in arms if (d, a) in r and prior[a][1] > 0
        ]
        if avail:
            n_days += 1
            # tie-break toward alphabetical arm like the query
            best_mean = max(prior[a][0] / prior[a][1] for a in avail)
            pick = min(
                a
                for a in avail
                if prior[a][0] / prior[a][1] == best_mean
            )
            greedy.append(r[(d, pick)])
            uniform.extend(r[(d, a)] for a in avail)
        for a in arms:
            if (d, a) in r:
                prior[a][0] += r[(d, a)]
                prior[a][1] += 1
    row = REGISTRY["bandit_replay_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days_played"] == n_days
    assert row["greedy_value"] == pytest.approx(
        sum(greedy) / n_days, abs=2e-5
    )
    assert row["uniform_value"] == pytest.approx(
        sum(uniform) / len(uniform), abs=2e-5
    )


def test_sinkhorn_plan_q_matches_bruteforce(spark):
    """Three Sinkhorn scalings replayed with numpy."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding[1], embedding[2] FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    ).fetchall()
    cents = defaultdict(lambda: [0.0, 0.0, 0])
    for vid, lab, x, y in rows:
        c = cents[(vid % 2, lab)]
        c[0] += x
        c[1] += y
        c[2] += 1
    la = sorted(l for g, l in cents if g == 0)
    lb = sorted(l for g, l in cents if g == 1)
    n0 = sum(cents[(0, l)][2] for l in la)
    n1 = sum(cents[(1, l)][2] for l in lb)
    mu = np.array([cents[(0, l)][2] / n0 for l in la])
    nu = np.array([cents[(1, l)][2] / n1 for l in lb])
    K = np.zeros((len(la), len(lb)))
    for i, l0 in enumerate(la):
        c0 = cents[(0, l0)]
        p0 = (c0[0] / c0[2], c0[1] / c0[2])
        for j, l1 in enumerate(lb):
            c1 = cents[(1, l1)]
            p1 = (c1[0] / c1[2], c1[1] / c1[2])
            K[i, j] = math.exp(
                -((p0[0] - p1[0]) ** 2 + (p0[1] - p1[1]) ** 2) / 0.5
            )
    u = mu / K.sum(axis=1)
    for _ in range(2):
        v = nu / (K.T @ u)
        u = mu / (K @ v)
    v = nu / (K.T @ u)
    plan = u[:, None] * K * v[None, :]
    got = {
        (r["label_from"], r["label_to"]): r["mass"]
        for r in REGISTRY["sinkhorn_plan_q"].fn(spark, SF_SMALL).collect()
    }
    expect = {
        (la[i], lb[j]): round(plan[i, j], 6)
        for i in range(len(la))
        for j in range(len(lb))
        if round(plan[i, j], 6) > 0
    }
    assert set(got) == set(expect)
    for k, m in expect.items():
        assert got[k] == pytest.approx(m, abs=2e-6)


def test_edge_support_q_matches_bruteforce(spark):
    """Triangle support histogram replayed with set intersections."""
    op = defaultdict(set)
    for pk, _, _, _, _ in []:
        pass
    con = duckdb.connect()
    for o, p in con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall():
        op[o].add(p)
    pair_orders = Counter()
    for o, ps in op.items():
        ps = sorted(ps)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pair_orders[(u, v)] += 1
    edges = {e for e, c in pair_orders.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    hist = Counter(
        len(adj[u] & adj[v]) for u, v in edges
    )
    got = {
        r["support"]: r
        for r in REGISTRY["edge_support_q"].fn(spark, SF_SMALL).collect()
    }
    assert {k: v["n_edges"] for k, v in got.items()} == dict(hist)
    for s, r in got.items():
        assert r["in_3truss"] == (s >= 1)


def test_mutual_knn_q_matches_bruteforce(spark):
    """Mutual 5-NN stats replayed with numpy."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    knn = {}
    for qi in range(n):
        d2 = np.round(((mat - mat[qi]) ** 2).sum(axis=1), 6)
        knn[ids[qi]] = {
            cid
            for _, cid in sorted(
                (float(d2[ci]), ids[ci])
                for ci in range(n)
                if ci != qi
            )[:5]
        }
    mutual = {
        (a, b)
        for a in ids
        for b in knn[a]
        if a < b and a in knn[b]
    }
    deg = Counter()
    for a, b in mutual:
        deg[a] += 1
        deg[b] += 1
    row = REGISTRY["mutual_knn_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_mutual_edges"] == len(mutual)
    assert row["mutual_rate"] == pytest.approx(
        2 * len(mutual) / (5 * n), abs=2e-6
    )
    assert row["n_connected_points"] == len(deg)
    assert row["max_degree"] == max(deg.values())


def test_pacf_q_matches_bruteforce(spark):
    """Durbin-Levinson on brute-force ACF values."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    ybar = _q6(float(sum(ms)) / len(ms))
    dev = [float(m - ybar) for m in ms]
    ss = sum(d * d for d in dev)
    r = [
        sum(a * b for a, b in zip(dev, dev[k:])) / ss
        for k in (1, 2, 3)
    ]
    phi11 = r[0]
    phi22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    phi21 = r[0] * (1 - phi22)
    phi33 = (r[2] - phi21 * r[1] - phi22 * r[0]) / (
        1 - phi21 * r[0] - phi22 * r[1]
    )
    row = REGISTRY["pacf_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["pacf_1"] == pytest.approx(phi11, abs=2e-6)
    assert row["pacf_2"] == pytest.approx(phi22, abs=2e-6)
    assert row["pacf_3"] == pytest.approx(phi33, abs=2e-6)


def test_allan_variance_q_matches_bruteforce(spark):
    """AVAR per tau replayed with block loops on exact sums."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    got = {
        r["tau_days"]: r
        for r in REGISTRY["allan_variance_q"].fn(spark, SF_SMALL).collect()
    }
    for tau in (1, 2, 4, 8):
        sums = []
        for blk in range(len(ms) // tau):
            seg = ms[blk * tau : (blk + 1) * tau]
            if len(seg) == tau:
                sums.append(sum(seg))
        diffs = [float(b - a) for a, b in zip(sums, sums[1:])]
        avar = sum(d * d for d in diffs) / (2 * len(diffs) * tau * tau)
        r = got[tau]
        assert r["n_pairs"] == len(diffs)
        assert r["allan_var"] == pytest.approx(avar, rel=1e-6)


def test_turning_points_q_matches_bruteforce(spark):
    """Turning-point count + z replayed with a scan."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    n = len(ms)
    t = sum(
        1
        for i in range(1, n - 1)
        if (ms[i] > ms[i - 1] and ms[i] > ms[i + 1])
        or (ms[i] < ms[i - 1] and ms[i] < ms[i + 1])
    )
    z = (t - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    row = REGISTRY["turning_points_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["n_turning"] == t
    assert row["z_stat"] == pytest.approx(z, abs=2e-6)


def test_records_test_q_matches_bruteforce(spark):
    """Record count vs harmonic expectation replayed."""
    ms = [
        _q6(float(s) / c) for s, c in _daily("purchase", agg="pairs")
    ]
    n = len(ms)
    best = None
    recs = 0
    for m in ms:
        if best is None or m > best:
            recs += 1
            best = m
    h1 = sum(1 / k for k in range(1, n + 1))
    h2 = sum(1 / k**2 for k in range(1, n + 1))
    row = REGISTRY["records_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["n_records"] == recs
    assert row["expected"] == pytest.approx(h1, abs=2e-6)
    assert row["z_stat"] == pytest.approx(
        (recs - h1) / math.sqrt(h1 - h2), abs=2e-5
    )


def test_pot_evt_q_matches_bruteforce(spark):
    """GPD moment fit replayed from the sorted loss tail."""
    revs = _daily("purchase")
    mu = _q6(float(sum(revs)) / len(revs))
    losses = sorted((float(mu - r) for r in revs), reverse=True)
    thr = losses[4]
    exc = [x - thr for x in losses[:4]]
    m1 = sum(exc) / len(exc)
    m2 = sum(x * x for x in exc) / len(exc)
    var = m2 - m1 * m1
    row = REGISTRY["pot_evt_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_excesses"] == 4
    assert row["threshold"] == pytest.approx(thr, abs=5e-3)
    assert row["gpd_shape"] == pytest.approx(
        (1 - m1 * m1 / var) / 2, abs=2e-5
    )
    assert row["gpd_scale"] == pytest.approx(
        m1 * (m1 * m1 / var + 1) / 2, abs=2e-3
    )


def test_poissonness_q_matches_bruteforce(spark):
    """Dispersion index replayed with Counters."""
    dc = Counter()
    for _, ts, _, _, t in _events():
        dc[(t, ts.date())] += 1
    types = sorted({t for t, _ in dc})
    got = {
        r["event_type"]: r
        for r in REGISTRY["poissonness_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(types)
    for t in types:
        cs = [c for (tt, _), c in dc.items() if tt == t]
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        r = got[t]
        assert r["n_days"] == n
        assert r["mean_daily"] == pytest.approx(mean, abs=2e-4)
        assert r["dispersion_index"] == pytest.approx(
            var / mean, abs=2e-5
        )
        assert r["overdispersed"] == (var / mean > 1.5)


def test_tost_q_matches_bruteforce(spark):
    """Two one-sided tests replayed from plain moments."""
    tot = _purchase_totals()
    g0 = [v for u, v in tot.items() if u % 2 == 0]
    g1 = [v for u, v in tot.items() if u % 2 == 1]

    def mean_var(xs):
        mu = sum(xs) / len(xs)
        return mu, sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)

    m0, v0 = mean_var(g0)
    m1, v1 = mean_var(g1)
    grand = sum(g0) + sum(g1)
    grand /= len(g0) + len(g1)
    margin = 0.1 * grand
    se = math.sqrt(v0 / len(g0) + v1 / len(g1))
    tl = (m0 - m1 + margin) / se
    tu = (margin - (m0 - m1)) / se
    row = REGISTRY["tost_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["mean_diff"] == pytest.approx(m0 - m1, abs=2e-4)
    assert row["margin"] == pytest.approx(margin, abs=2e-4)
    assert row["t_lower"] == pytest.approx(tl, abs=2e-4)
    assert row["t_upper"] == pytest.approx(tu, abs=2e-4)
    assert row["equivalent"] == (tl > 1.645 and tu > 1.645)


def test_smd_balance_q_matches_bruteforce(spark):
    """SMD table replayed from per-user count dicts."""
    counts = defaultdict(Counter)
    users = set()
    for uid, _, _, _, t in _events():
        users.add(uid)
        counts[uid][t] += 1
    got = {
        r["covariate"]: r
        for r in REGISTRY["smd_balance_q"].fn(spark, SF_SMALL).collect()
    }
    for cov in ("view", "click", "signup", "error"):
        g = {0: [], 1: []}
        for u in users:
            g[u % 2].append(counts[u].get(cov, 0))

        def mv(xs):
            mu = sum(xs) / len(xs)
            return mu, sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)

        m0, v0 = mv(g[0])
        m1, v1 = mv(g[1])
        smd = (m1 - m0) / math.sqrt((v1 + v0) / 2)
        r = got[cov]
        assert r["mean_diff"] == pytest.approx(m1 - m0, abs=2e-6)
        assert r["smd"] == pytest.approx(smd, abs=2e-6)
        assert r["balanced"] == (abs(smd) < 0.1)


def test_process_capability_q_matches_bruteforce(spark):
    """Cp/Cpk replayed with float moments."""
    revs = [float(r) for r in _daily("purchase")]
    n = len(revs)
    mu = sum(revs) / n
    s = math.sqrt(sum((x - mu) ** 2 for x in revs) / (n - 1))
    lsl, usl = 0.75 * mu, 1.25 * mu
    oos = sum(1 for x in revs if x < lsl or x > usl)
    row = REGISTRY["process_capability_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["cp"] == pytest.approx((usl - lsl) / (6 * s), abs=2e-4)
    assert row["cpk"] == pytest.approx(
        min(usl - mu, mu - lsl) / (3 * s), abs=2e-4
    )
    assert row["n_out_of_spec"] == oos


def test_ewma_control_q_matches_bruteforce(spark):
    """EWMA recursion + limits replayed day by day."""
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    n = len(ms)
    mu0 = sum(ms) / n
    s = math.sqrt(sum((x - mu0) ** 2 for x in ms) / (n - 1))
    z = mu0
    got = {
        r["day"]: r
        for r in REGISTRY["ewma_control_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(days)
    for t, (day, m) in enumerate(zip(days, ms), start=1):
        z = 0.2 * m + 0.8 * z
        half = 3 * s * math.sqrt(0.2 / 1.8 * (1 - 0.8 ** (2 * t)))
        r = got[day]
        assert r["ewma"] == pytest.approx(z, abs=2e-3)
        assert r["ucl"] == pytest.approx(mu0 + half, abs=2e-3)
        assert r["lcl"] == pytest.approx(mu0 - half, abs=2e-3)
        assert r["violation"] == (z > mu0 + half or z < mu0 - half)


def test_variance_components_q_matches_bruteforce(spark):
    """Two-way decomposition replayed with mean dicts."""
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    cell = {k: float(_q6(float(s) / c)) for k, (s, c) in agg.items()}
    days = sorted({d for d, _ in cell})
    types = sorted({t for _, t in cell})
    n, k = len(days), len(types)
    g = sum(cell.values()) / len(cell)
    rm = {
        d: sum(cell[(d, t)] for t in types if (d, t) in cell)
        / sum(1 for t in types if (d, t) in cell)
        for d in days
    }
    cm = {
        t: sum(cell[(d, t)] for d in days if (d, t) in cell)
        / sum(1 for d in days if (d, t) in cell)
        for t in types
    }
    ssr = sum((v - g) ** 2 for v in rm.values())
    ssc = sum((v - g) ** 2 for v in cm.values())
    sse = sum(
        (cell[(d, t)] - rm[d] - cm[t] + g) ** 2
        for (d, t) in cell
    )
    ms_day = ssr * k / (n - 1)
    ms_type = ssc * n / (k - 1)
    ms_e = sse / ((n - 1) * (k - 1))
    row = (
        REGISTRY["variance_components_q"].fn(spark, SF_SMALL).collect()[0]
    )
    assert (row["n_days"], row["k_types"]) == (n, k)
    assert row["ms_day"] == pytest.approx(ms_day, rel=1e-5)
    assert row["ms_type"] == pytest.approx(ms_type, rel=1e-5)
    assert row["ms_resid"] == pytest.approx(ms_e, rel=1e-5)
    assert row["var_day"] == pytest.approx(
        max(0.0, (ms_day - ms_e) / k), abs=2e-5
    )
    assert row["var_type"] == pytest.approx(
        max(0.0, (ms_type - ms_e) / n), abs=2e-5
    )


def test_empirical_bayes_q_matches_bruteforce(spark):
    """Beta-binomial shrinkage replayed with dict moments."""
    nat = defaultdict(lambda: [0, 0])
    con = duckdb.connect()
    for natk, bal in con.execute(
        f"SELECT c_nationkey, c_acctbal FROM "
        f"read_parquet('{SF_SMALL}/customer.parquet')"
    ).fetchall():
        nat[natk][0] += 1
        nat[natk][1] += 1 if bal < 0 else 0
    rates = [x / n for n, x in nat.values()]
    m = sum(x for _, x in nat.values()) / sum(n for n, _ in nat.values())
    v = max(
        sum(r * r for r in rates) / len(rates)
        - (sum(rates) / len(rates)) ** 2,
        1e-9,
    )
    strength = m * (1 - m) / v - 1
    alpha, beta = m * strength, (1 - m) * strength
    got = {
        r["nationkey"]: r
        for r in REGISTRY["empirical_bayes_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(nat)
    for k, (n, x) in nat.items():
        r = got[k]
        assert r["n_customers"] == n
        assert r["raw_rate"] == pytest.approx(x / n, abs=2e-6)
        assert r["shrunk_rate"] == pytest.approx(
            (x + alpha) / (n + alpha + beta), abs=2e-5
        )


def test_ipw_ate_q_matches_bruteforce(spark):
    """Stratified IPW replayed with an explicit NTILE split."""
    acts = defaultdict(int)
    ys = defaultdict(Decimal)
    for uid, _, _, v, t in _events():
        acts[uid] += 1
        if t == "purchase":
            ys[uid] += Decimal(str(v)).quantize(Decimal("0.000001"))
    users = sorted(acts, key=lambda u: (acts[u], u))
    n = len(users)
    q, r = divmod(n, 5)
    sizes = [q + 1 if i < r else q for i in range(5)]
    idx = 0
    total = 0.0
    used_users = used = excluded = 0
    for size in sizes:
        block = users[idx : idx + size]
        idx += size
        n1 = sum(1 for u in block if u % 2 == 1)
        if n1 == 0 or n1 == size:
            excluded += 1
            continue
        used += 1
        used_users += size
        e_s = n1 / size
        y1 = sum(float(ys.get(u, 0)) for u in block if u % 2 == 1)
        y0 = sum(float(ys.get(u, 0)) for u in block if u % 2 == 0)
        total += y1 / e_s - y0 / (1 - e_s)
    row = REGISTRY["ipw_ate_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users_used"] == used_users
    assert row["n_strata_used"] == used
    assert row["n_strata_excluded"] == excluded
    assert row["ipw_ate"] == pytest.approx(total / used_users, abs=2e-4)


def test_clustering_null_q_matches_bruteforce(spark):
    """Config-model null vs observed transitivity replayed with sets."""
    con = duckdb.connect()
    op = defaultdict(set)
    for o, p in con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall():
        op[o].add(p)
    pair_orders = Counter()
    for o, ps in op.items():
        ps = sorted(ps)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pair_orders[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), c in pair_orders.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    nn = len(nodes)
    ks = [len(adj[u]) for u in nodes]
    k1 = sum(ks) / nn
    k2 = sum(k * k for k in ks) / nn
    tri = (
        sum(
            1
            for u in nodes
            for v in adj[u]
            for w in adj[v]
            if w in adj[u]
        )
        // 6
    )
    wedges = sum(k * (k - 1) for k in ks) / 2
    row = REGISTRY["clustering_null_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_nodes"] == nn
    assert row["n_triangles"] == tri
    assert row["observed_clustering"] == pytest.approx(
        3 * tri / wedges, abs=2e-6
    )
    assert row["null_clustering"] == pytest.approx(
        (k2 - k1) ** 2 / (nn * k1**3), abs=2e-6
    )


def test_rolling_beta_q_matches_bruteforce(spark):
    """Trailing-week slope replayed with float windows."""
    days = defaultdict(lambda: defaultdict(lambda: [Decimal(0), 0]))
    for _, ts, _, v, t in _events():
        if t in ("purchase", "click"):
            d = days[ts.date()][t]
            d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
            d[1] += 1
    series = []
    for day in sorted(days):
        p, c = days[day]["purchase"], days[day]["click"]
        series.append(
            (
                day,
                float(_q6(float(c[0]) / c[1])),
                float(_q6(float(p[0]) / p[1])),
            )
        )
    got = {
        r["day"]: r
        for r in REGISTRY["rolling_beta_q"].fn(spark, SF_SMALL).collect()
    }
    expect = {}
    for i in range(6, len(series)):
        win = series[i - 6 : i + 1]
        xs = [x for _, x, _ in win]
        ys_ = [y for _, _, y in win]
        k = 7
        sx, sy = sum(xs), sum(ys_)
        sxy = sum(x * y for x, y in zip(xs, ys_))
        sxx = sum(x * x for x in xs)
        expect[series[i][0]] = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    assert set(got) == set(expect)
    for d, b in expect.items():
        assert got[d]["beta"] == pytest.approx(b, abs=2e-4)


def test_mantel_haenszel_q_matches_bruteforce(spark):
    """MH pooled OR replayed with explicit strata."""
    acts = defaultdict(int)
    conv = defaultdict(int)
    for uid, _, _, _, t in _events():
        acts[uid] += 1
        if t == "purchase":
            conv[uid] = 1
    users = sorted(acts, key=lambda u: (acts[u], u))
    n = len(users)
    q, r = divmod(n, 4)
    sizes = [q + 1 if i < r else q for i in range(4)]
    idx = 0
    num = den = 0.0
    for size in sizes:
        block = users[idx : idx + size]
        idx += size
        a = sum(1 for u in block if u % 2 == 1 and conv.get(u, 0))
        b = sum(1 for u in block if u % 2 == 1 and not conv.get(u, 0))
        c = sum(1 for u in block if u % 2 == 0 and conv.get(u, 0))
        d = sum(1 for u in block if u % 2 == 0 and not conv.get(u, 0))
        num += a * d / size
        den += b * c / size
    row = REGISTRY["mantel_haenszel_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_strata"] == 4
    assert row["n_users"] == n
    if den == 0:
        assert row["or_mh"] is None
    else:
        assert row["or_mh"] == pytest.approx(num / den, abs=2e-4)


def test_shift_share_q_matches_bruteforce(spark):
    """Shift-share decomposition replayed with dicts."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT s.s_nationkey, p.p_brand, year(l.l_shipdate),"
        f" CAST(l.l_extendedprice AS DOUBLE) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet') l JOIN "
        f"read_parquet('{SF_SMALL}/supplier.parquet') s "
        f"ON s.s_suppkey = l.l_suppkey JOIN "
        f"read_parquet('{SF_SMALL}/part.parquet') p "
        f"ON p.p_partkey = l.l_partkey "
        f"WHERE year(l.l_shipdate) IN (1995, 2001)"
    ).fetchall()
    nb = defaultdict(lambda: [0.0, 0.0])
    for nat, brand, y, ep in rows:
        nb[(nat, brand)][0 if y == 1995 else 1] += ep
    t0 = sum(v[0] for v in nb.values())
    t1 = sum(v[1] for v in nb.values())
    g = t1 / t0
    br = defaultdict(lambda: [0.0, 0.0])
    for (nat, brand), (r0, r1) in nb.items():
        br[brand][0] += r0
        br[brand][1] += r1
    per_nat = defaultdict(lambda: [0.0, 0.0, 0.0])
    for (nat, brand), (r0, r1) in nb.items():
        b0, b1 = br[brand]
        per_nat[nat][0] += r1 - r0
        per_nat[nat][1] += r0 * (g - 1)
        per_nat[nat][2] += r0 * (b1 / b0 - g)
    got = {
        r["nationkey"]: r
        for r in REGISTRY["shift_share_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(per_nat)
    for nat, (gr, na, mx) in per_nat.items():
        r = got[nat]
        assert r["total_growth"] == pytest.approx(gr, abs=0.1)
        assert r["national_effect"] == pytest.approx(na, abs=0.1)
        assert r["industry_mix"] == pytest.approx(mx, abs=0.1)
        assert r["competitive_shift"] == pytest.approx(
            gr - na - mx, abs=0.1
        )


def test_enrichment_q_matches_bruteforce(spark):
    """Hypergeometric z replayed with an explicit decile cut."""
    rev = defaultdict(Decimal)
    brand_of = {}
    con = duckdb.connect()
    for pk, brand, ep in con.execute(
        f"SELECT l.l_partkey, p.p_brand, l.l_extendedprice FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet') l JOIN "
        f"read_parquet('{SF_SMALL}/part.parquet') p "
        f"ON p.p_partkey = l.l_partkey"
    ).fetchall():
        rev[pk] += Decimal(str(ep)).quantize(Decimal("0.0001"))
        brand_of[pk] = brand
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    nn = len(items)
    q, r = divmod(nn, 10)
    k_top = q + (1 if r > 0 else 0)
    top = {pk for pk, _ in items[:k_top]}
    cells = defaultdict(lambda: [0, 0])
    for pk in rev:
        cells[brand_of[pk]][0] += 1
        if pk in top:
            cells[brand_of[pk]][1] += 1
    got = {
        r["brand"]: r
        for r in REGISTRY["enrichment_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(cells)
    for brand, (m, x) in cells.items():
        frac = k_top / nn
        mu = m * frac
        var = mu * (1 - frac) * (nn - m) / (nn - 1)
        rr = got[brand]
        assert rr["n_parts"] == m and rr["n_top_decile"] == x
        assert rr["excess"] == pytest.approx(x - mu, abs=2e-3)
        assert rr["z_enrichment"] == pytest.approx(
            (x - mu - 0.5) / math.sqrt(var), abs=2e-3
        )


def test_littles_law_q_matches_bruteforce(spark):
    """L = lambda W replayed with a per-user session scan."""
    import datetime

    by_user = defaultdict(list)
    all_ts = []
    for uid, ts, eid, _, _ in _events():
        by_user[uid].append((ts, eid))
        all_ts.append(ts)
    horizon = int(max(all_ts).timestamp()) - int(
        min(all_ts).timestamp()
    )
    durs = []
    for uid, evs in by_user.items():
        evs.sort()
        start = prev = evs[0][0]
        for ts, _ in evs[1:]:
            if int(ts.timestamp()) - int(prev.timestamp()) > 1800:
                durs.append(
                    int(prev.timestamp()) - int(start.timestamp())
                )
                start = ts
            prev = ts
        durs.append(int(prev.timestamp()) - int(start.timestamp()))
    n = len(durs)
    l_avg = sum(durs) / horizon
    lam = n / horizon
    w = sum(durs) / n
    row = REGISTRY["littles_law_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_sessions"] == n
    assert row["l_avg"] == pytest.approx(l_avg, abs=2e-6)
    assert row["lambda_per_day"] == pytest.approx(
        lam * 86400, abs=2e-4
    )
    assert row["w_mean_sec"] == pytest.approx(w, abs=2e-3)
    assert row["l_over_lambda_w"] == pytest.approx(1.0, abs=1e-9)


def test_shift_function_q_matches_bruteforce(spark):
    """Decile shift function replayed with per-group NTILE cuts."""
    tot = _purchase_totals()
    got = {
        r["decile"]: r
        for r in REGISTRY["shift_function_q"].fn(spark, SF_SMALL).collect()
    }
    qs = {}
    for g in (0, 1):
        vals = sorted(
            (v, u) for u, v in tot.items() if u % 2 == g
        )
        n = len(vals)
        q, r = divmod(n, 10)
        idx = 0
        for d in range(1, 11):
            size = q + 1 if d <= r else q
            block = vals[idx : idx + size]
            idx += size
            if block:
                qs[(g, d)] = block[-1][0]
    for d in range(1, 11):
        if (0, d) in qs and (1, d) in qs:
            rr = got[d]
            assert rr["q_g0"] == pytest.approx(qs[(0, d)], abs=5e-3)
            assert rr["q_g1"] == pytest.approx(qs[(1, d)], abs=5e-3)
            assert rr["shift"] == pytest.approx(
                qs[(1, d)] - qs[(0, d)], abs=5e-3
            )


def test_attributable_risk_q_matches_bruteforce(spark):
    """2x2 risk panel replayed with counters."""
    conv = defaultdict(int)
    for uid, _, _, _, t in _events():
        conv.setdefault(uid, 0)
        if t == "purchase":
            conv[uid] = 1
    a = sum(1 for u, c in conv.items() if u % 2 == 1 and c)
    n1 = sum(1 for u in conv if u % 2 == 1)
    c = sum(1 for u, cc in conv.items() if u % 2 == 0 and cc)
    n0 = sum(1 for u in conv if u % 2 == 0)
    r1, r0 = a / n1, c / n0
    row = REGISTRY["attributable_risk_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["risk_exposed"] == pytest.approx(r1, abs=2e-6)
    assert row["risk_unexposed"] == pytest.approx(r0, abs=2e-6)
    assert row["risk_difference"] == pytest.approx(r1 - r0, abs=2e-6)
    assert row["risk_ratio"] == pytest.approx(r1 / r0, abs=2e-5)
    assert row["attributable_fraction"] == pytest.approx(
        1 - r0 / r1, abs=2e-5
    )


def test_mediation_q_matches_bruteforce(spark):
    """Product-of-coefficients mediation replayed with numpy OLS."""
    import numpy as np

    agg = defaultdict(lambda: [Decimal(0), Decimal(0)])
    users = set()
    for uid, _, _, v, t in _events():
        users.add(uid)
        if t == "click":
            agg[uid][0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        elif t == "purchase":
            agg[uid][1] += Decimal(str(v)).quantize(Decimal("0.000001"))
    rows = [
        (u % 2, float(agg[u][0]), float(agg[u][1])) for u in sorted(users)
    ]
    x = np.array([r[0] for r in rows], dtype=float)
    mm = np.array([r[1] for r in rows])
    y = np.array([r[2] for r in rows])
    n = len(rows)
    a = np.polyfit(x, mm, 1)[0]
    X = np.column_stack([np.ones(n), x, mm])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    cprime, b = coef[1], coef[2]
    total = np.polyfit(x, y, 1)[0]
    row = REGISTRY["mediation_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert row["a_path"] == pytest.approx(a, abs=2e-4)
    assert row["b_path"] == pytest.approx(b, abs=2e-5)
    assert row["direct_c_prime"] == pytest.approx(cprime, abs=2e-4)
    assert row["indirect_ab"] == pytest.approx(a * b, abs=2e-4)
    assert row["total_c"] == pytest.approx(total, abs=2e-4)
    # OLS identity: total = direct + indirect
    assert row["total_c"] == pytest.approx(
        row["direct_c_prime"] + row["indirect_ab"], abs=5e-6
    )


def test_rdd_q_matches_bruteforce(spark):
    """Local linear RDD replayed with side fits."""
    acts = defaultdict(int)
    ys = defaultdict(Decimal)
    for uid, _, _, v, t in _events():
        acts[uid] += 1
        if t == "purchase":
            ys[uid] += Decimal(str(v)).quantize(Decimal("0.000001"))
    users = sorted(acts, key=lambda u: (acts[u], u))
    cut = acts[users[(len(users) + 1) // 2 - 1]]
    sides = {True: [], False: []}
    for u in users:
        r = acts[u] - cut
        if abs(r) <= 10:
            sides[r >= 0].append((r, float(ys.get(u, 0))))

    def icpt(pts):
        k = len(pts)
        sx = sum(r for r, _ in pts)
        sy = sum(v for _, v in pts)
        sxx = sum(r * r for r, _ in pts)
        sxy = sum(r * v for r, v in pts)
        slope = (sxy - sx * sy / k) / (sxx - sx * sx / k)
        return sy / k - slope * sx / k

    row = REGISTRY["rdd_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["cutoff_activity"] == cut
    assert row["n_right"] == len(sides[True])
    assert row["n_left"] == len(sides[False])
    assert row["rdd_effect"] == pytest.approx(
        icpt(sides[True]) - icpt(sides[False]), abs=2e-3
    )


def test_chow_test_q_matches_bruteforce(spark):
    """Chow F replayed with three plain OLS fits."""
    import datetime

    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    cut = datetime.date(2024, 1, 16)

    def sse(pts):
        k = len(pts)
        sx = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(t * t for t, _ in pts)
        sxy = sum(t * y for t, y in pts)
        syy = sum(y * y for _, y in pts)
        return (syy - sy * sy / k) - (sxy - sx * sy / k) ** 2 / (
            sxx - sx * sx / k
        )

    pts = list(enumerate(ms, start=1))
    pre = [(t, y) for (t, y), d in zip(pts, days) if d < cut]
    post = [(t, y) for (t, y), d in zip(pts, days) if d >= cut]
    sp, s1, s2 = sse(pts), sse(pre), sse(post)
    f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (len(pts) - 4))
    row = REGISTRY["chow_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == len(pts)
    assert row["sse_pooled"] == pytest.approx(sp, abs=2e-3)
    assert row["sse_split"] == pytest.approx(s1 + s2, abs=2e-3)
    assert row["chow_f"] == pytest.approx(f, abs=2e-4)


def test_xbar_r_q_matches_bruteforce(spark):
    """Shewhart pair replayed with weekly blocks."""
    revs = [float(r) for r in _daily("purchase")]
    subs = []
    for wk in range(len(revs) // 7):
        seg = revs[wk * 7 : (wk + 1) * 7]
        if len(seg) == 7:
            subs.append(
                (wk, sum(seg) / 7, max(seg) - min(seg))
            )
    xbb = sum(x for _, x, _ in subs) / len(subs)
    rbar = sum(r for _, _, r in subs) / len(subs)
    got = {
        r["week"]: r
        for r in REGISTRY["xbar_r_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == {wk for wk, _, _ in subs}
    for wk, xb, r in subs:
        g = got[wk]
        assert g["xbar"] == pytest.approx(xb, abs=5e-3)
        assert g["r"] == pytest.approx(r, abs=5e-3)
        assert g["xbar_violation"] == (
            xb > xbb + 0.419 * rbar or xb < xbb - 0.419 * rbar
        )
        assert g["r_violation"] == (
            r > 1.924 * rbar or r < 0.076 * rbar
        )


def test_box_counting_q_matches_bruteforce(spark):
    """Box dimension replayed with set-of-cells counts."""
    con = duckdb.connect()
    pts = [
        (v[0], v[1])
        for (v,) in con.execute(
            f"SELECT embedding FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet')"
        ).fetchall()
    ]
    xs, ys_ = [], []
    finest = None
    for s in (0.05, 0.1, 0.2, 0.4):
        boxes = len(
            {
                (math.floor(x / s), math.floor(y / s))
                for x, y in pts
            }
        )
        if s == 0.05:
            finest = boxes
        xs.append(math.log(1 / s))
        ys_.append(math.log(boxes))
    k = len(xs)
    sx, sy = sum(xs), sum(ys_)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys_))
    slope = (sxy - sx * sy / k) / (sxx - sx * sx / k)
    row = REGISTRY["box_counting_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["boxes_finest"] == finest
    assert row["box_dimension"] == pytest.approx(slope, abs=2e-4)


def test_capture_recapture_q_matches_bruteforce(spark):
    """Lincoln-Petersen / Chapman replayed with sets."""
    import datetime

    cut = datetime.datetime(2024, 1, 16)
    w1, w2 = set(), set()
    for uid, ts, _, _, _ in _events():
        (w1 if ts < cut else w2).add(uid)
    n1, n2, m = len(w1), len(w2), len(w1 & w2)
    row = REGISTRY["capture_recapture_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_window1"], row["n_window2"]) == (n1, n2)
    assert row["n_both"] == m
    assert row["n_seen_total"] == len(w1 | w2)
    assert row["lincoln_petersen"] == pytest.approx(
        n1 * n2 / m, abs=2e-3
    )
    assert row["chapman"] == pytest.approx(
        (n1 + 1) * (n2 + 1) / (m + 1) - 1, abs=2e-3
    )


def test_chao1_q_matches_bruteforce(spark):
    """Chao1 richness replayed with Counters."""
    vocab = Counter()
    for _, text, _ in _docs():
        vocab.update(_tok(text))
    s_obs = len(vocab)
    ff = Counter(vocab.values())
    f1, f2 = ff.get(1, 0), ff.get(2, 0)
    chao = s_obs + f1 * (f1 - 1) / (2 * (f2 + 1))
    row = REGISTRY["chao1_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["s_observed"] == s_obs
    assert (row["singletons"], row["doubletons"]) == (f1, f2)
    assert row["chao1"] == pytest.approx(chao, abs=2e-3)
    assert row["coverage"] == pytest.approx(s_obs / chao, abs=2e-6)


def test_gini_split_q_matches_bruteforce(spark):
    """Best stump replayed with a sorted scan."""
    pts = sorted(
        (math.floor(bal), 1 if seg in ("AUTOMOBILE", "BUILDING") else 0)
        for _, seg, bal in _balances()
    )
    from itertools import groupby

    grid = [
        (v, len(list(g)))
        for v, g in groupby(pts, key=lambda p: p[0])
    ]
    nt = len(pts)
    pt = sum(y for _, y in pts)
    best = None
    nl = pl = 0
    pos_at = defaultdict(int)
    for v, y in pts:
        pos_at[v] += y
    cnt_at = Counter(v for v, _ in pts)
    for v in sorted(cnt_at):
        nl += cnt_at[v]
        pl += pos_at[v]
        if nl >= nt:
            continue
        nr, pr = nt - nl, pt - pl
        gl = 1 - (pl / nl) ** 2 - (1 - pl / nl) ** 2
        gr = 1 - (pr / nr) ** 2 - (1 - pr / nr) ** 2
        after = nl / nt * gl + nr / nt * gr
        key = (after, v)
        if best is None or key < best[0]:
            best = (key, nl, nr)
    (after, v), nl, nr = best
    before = 1 - (pt / nt) ** 2 - (1 - pt / nt) ** 2
    row = REGISTRY["gini_split_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["split_at"] == v
    assert (row["n_left"], row["n_right"]) == (nl, nr)
    assert row["gini_before"] == pytest.approx(before, abs=2e-6)
    assert row["gini_after"] == pytest.approx(after, abs=2e-6)
    assert row["impurity_decrease"] == pytest.approx(
        before - after, abs=2e-6
    )


def test_kendall_w_q_matches_bruteforce(spark):
    """W replayed from friedman-style rank sums."""
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    by_day = defaultdict(dict)
    for (day, t), (s, c) in agg.items():
        by_day[day][t] = _q6(float(s) / c)
    rank_sum = Counter()
    n = len(by_day)
    k = len({t for d in by_day.values() for t in d})
    for day, ms in by_day.items():
        for r, (m, t) in enumerate(
            sorted((m, t) for t, m in ms.items()), start=1
        ):
            rank_sum[t] += r
    chi2 = 12.0 * sum(s * s for s in rank_sum.values()) / (
        n * k * (k + 1)
    ) - 3.0 * n * (k + 1)
    row = REGISTRY["kendall_w_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_days"], row["k_types"]) == (n, k)
    assert row["kendall_w"] == pytest.approx(
        chi2 / (n * (k - 1)), abs=2e-6
    )


def test_vif_q_matches_bruteforce(spark):
    """VIFs replayed with numpy correlation."""
    import numpy as np

    agg = defaultdict(lambda: [0.0, 0.0, 0.0])
    for uid, _, _, v, t in _events():
        i = {"click": 0, "view": 1, "signup": 2}.get(t)
        agg[uid]  # ensure user exists
        if i is not None:
            agg[uid][i] += v
    m = np.array(list(agg.values()))
    r = np.corrcoef(m.T)

    def vif(i, j, k):
        r2 = (
            r[i, j] ** 2 + r[i, k] ** 2 - 2 * r[i, j] * r[i, k] * r[j, k]
        ) / (1 - r[j, k] ** 2)
        return 1 / (1 - r2)

    row = REGISTRY["vif_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == len(agg)
    assert row["vif_click"] == pytest.approx(vif(0, 1, 2), abs=2e-3)
    assert row["vif_view"] == pytest.approx(vif(1, 0, 2), abs=2e-3)
    assert row["vif_signup"] == pytest.approx(vif(2, 0, 1), abs=2e-3)


def test_risk_adjusted_q_matches_bruteforce(spark):
    """Sharpe/Sortino/Calmar replayed from the demeaned P&L."""
    revs = _daily("purchase")
    mu = _q6(float(sum(revs)) / len(revs))
    ps = [float(r - mu) for r in revs]
    n = len(ps)
    mean = sum(ps) / n
    sd = math.sqrt(
        (sum(p * p for p in ps) - sum(ps) ** 2 / n) / (n - 1)
    )
    dsd = math.sqrt(sum(p * p for p in ps if p < 0) / n)
    equity = peak = 0.0
    first = True
    mdd = None
    for p in ps:
        equity += p
        peak = equity if first else max(peak, equity)
        first = False
        d = peak - equity
        mdd = d if mdd is None else max(mdd, d)
    row = REGISTRY["risk_adjusted_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_days"] == n
    assert row["sharpe_ann"] == pytest.approx(
        mean / sd * math.sqrt(365), abs=2e-4
    )
    assert row["sortino_ann"] == pytest.approx(
        mean / dsd * math.sqrt(365), abs=2e-4
    )
    assert row["calmar"] == pytest.approx(
        mean * 365 / mdd, abs=2e-3
    )


def test_weekday_effect_q_matches_bruteforce(spark):
    """Day-of-week ANOVA F replayed with group loops."""
    import datetime

    base = datetime.date(2024, 1, 1)
    days = sorted(
        {ts.date() for _, ts, _, _, t in _events() if t == "purchase"}
    )
    ms = [
        float(_q6(float(s) / c))
        for s, c in _daily("purchase", agg="pairs")
    ]
    groups = defaultdict(list)
    for d, m in zip(days, ms):
        groups[(d - base).days % 7].append(m)
    n = len(ms)
    k = len(groups)
    grand = sum(ms) / n
    ssb = sum(
        len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values()
    )
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = REGISTRY["weekday_effect_q"].fn(spark, SF_SMALL).collect()[0]
    assert (row["n_days"], row["k_weekdays"]) == (n, k)
    assert row["f_stat"] == pytest.approx(f, rel=1e-4)


def test_median_polish_q_matches_bruteforce(spark):
    """Two median-polish sweeps replayed with dicts."""
    import datetime

    base = datetime.date(2024, 1, 1)
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[((ts.date() - base).days % 7, t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    cell = {k: _q6(float(s) / c) for k, (s, c) in agg.items()}

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    v = dict(cell)
    for _ in range(2):
        rows = defaultdict(list)
        for (dow, et), val in v.items():
            rows[dow].append(val)
        rmed = {dow: lower_median(vs) for dow, vs in rows.items()}
        v = {(d, e): val - rmed[d] for (d, e), val in v.items()}
        cols = defaultdict(list)
        for (dow, et), val in v.items():
            cols[et].append(val)
        cmed = {et: lower_median(vs) for et, vs in cols.items()}
        v = {(d, e): val - cmed[e] for (d, e), val in v.items()}
    avs = [abs(x) for x in v.values()]
    row = REGISTRY["median_polish_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_cells"] == len(v)
    assert row["max_abs_residual"] == pytest.approx(
        float(max(avs)), abs=2e-4
    )
    assert row["median_abs_residual"] == pytest.approx(
        float(lower_median(avs)), abs=2e-4
    )


def test_oaxaca_blinder_q_matches_bruteforce(spark):
    """Two-fold decomposition replayed with pooled-slope OLS."""
    agg = defaultdict(lambda: [Decimal(0), Decimal(0)])
    users = set()
    for uid, _, _, v, t in _events():
        users.add(uid)
        if t == "click":
            agg[uid][0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        elif t == "purchase":
            agg[uid][1] += Decimal(str(v)).quantize(Decimal("0.000001"))
    rows = [
        (u % 2, float(agg[u][0]), float(agg[u][1]))
        for u in sorted(users)
    ]
    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    sxy = sum(x * y for _, x, y in rows)
    b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    g1 = [(x, y) for g, x, y in rows if g == 1]
    g0 = [(x, y) for g, x, y in rows if g == 0]
    gap = sum(y for _, y in g1) / len(g1) - sum(y for _, y in g0) / len(
        g0
    )
    xgap = sum(x for x, _ in g1) / len(g1) - sum(
        x for x, _ in g0
    ) / len(g0)
    row = REGISTRY["oaxaca_blinder_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert row["total_gap"] == pytest.approx(gap, abs=2e-4)
    assert row["explained"] == pytest.approx(b * xgap, abs=2e-4)
    assert row["unexplained"] == pytest.approx(gap - b * xgap, abs=2e-4)


def test_knee_point_q_matches_bruteforce(spark):
    """Pareto knee replayed with a sorted cumulative scan."""
    rev = defaultdict(Decimal)
    for pk, _, ep, _, _ in _lineitems():
        rev[pk] += Decimal(str(ep)).quantize(Decimal("0.0001"))
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    t = float(sum(v for _, v in items) * 10000)
    n = len(items)
    cum = 0
    best = None
    for rk, (pk, r) in enumerate(items, start=1):
        cum += int(r * 10000)
        lift = cum / t - rk / n
        key = (-lift, rk)
        if best is None or key < best[0]:
            best = (key, rk, cum / t)
    (neg, rk0), rk, share = best
    row = REGISTRY["knee_point_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["knee_rank"] == rk
    assert row["rank_share"] == pytest.approx(rk / n, abs=2e-6)
    assert row["revenue_share"] == pytest.approx(share, abs=2e-6)
    assert row["max_chord_gap"] == pytest.approx(-neg, abs=2e-6)


def test_cochran_q_test_matches_bruteforce(spark):
    """Cochran's Q replayed with flag dicts (NULL when every block
    is all-or-nothing, as at this scale's 15 users)."""
    flags = defaultdict(lambda: [0, 0, 0])
    for uid, _, _, _, t in _events():
        i = {"view": 0, "click": 1, "purchase": 2}.get(t)
        flags[uid]
        if i is not None:
            flags[uid][i] = 1
    n = len(flags)
    c = [sum(f[i] for f in flags.values()) for i in range(3)]
    sr = sum(sum(f) for f in flags.values())
    sr2 = sum(sum(f) ** 2 for f in flags.values())
    den = 3 * sr - sr2
    row = REGISTRY["cochran_q_test"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert (row["n_view"], row["n_click"], row["n_purchase"]) == tuple(c)
    if den == 0:
        assert row["cochran_q"] is None
    else:
        cbar = sr / 3
        q = 6 * sum((ci - cbar) ** 2 for ci in c) / den
        assert row["cochran_q"] == pytest.approx(q, abs=2e-5)


def test_robust_shape_q_matches_bruteforce(spark):
    """Bowley/Moors replayed with explicit NTILE octiles."""
    tot = _purchase_totals()
    got = {
        r["cohort"]: r
        for r in REGISTRY["robust_shape_q"].fn(spark, SF_SMALL).collect()
    }
    for g in (0, 1):
        vals = sorted((v, u) for u, v in tot.items() if u % 2 == g)
        n = len(vals)
        q, r = divmod(n, 8)
        e = {}
        idx = 0
        for o in range(1, 9):
            size = q + 1 if o <= r else q
            block = vals[idx : idx + size]
            idx += size
            if block:
                e[o] = block[-1][0]
        iqr = e[6] - e[2]
        bow = (e[6] + e[2] - 2 * e[4]) / iqr
        moors = ((e[7] - e[5]) + (e[3] - e[1])) / iqr
        rr = got[g]
        assert rr["bowley_skewness"] == pytest.approx(bow, abs=2e-5)
        assert rr["moors_kurtosis"] == pytest.approx(moors, abs=2e-5)


def test_audience_stability_q_matches_bruteforce(spark):
    """Weekly audience Jaccard replayed with sets."""
    import datetime

    base = datetime.date(2024, 1, 1)
    aud = defaultdict(set)
    for uid, ts, _, _, t in _events():
        aud[(t, (ts.date() - base).days // 7)].add(uid)
    got = {
        (r["event_type"], r["week_from"]): r
        for r in REGISTRY["audience_stability_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    expect = {}
    for (t, w), s in aud.items():
        nxt = aud.get((t, w + 1))
        if nxt:
            inter = s & nxt
            if inter:
                expect[(t, w)] = (
                    len(inter),
                    len(inter) / len(s | nxt),
                )
    assert set(got) == set(expect)
    for k, (nc, j) in expect.items():
        assert got[k]["n_common"] == nc
        assert got[k]["jaccard"] == pytest.approx(j, abs=2e-6)


def test_median_test_q_matches_bruteforce(spark):
    """Mood's median cells replayed with a plain sort."""
    rows = _balances()
    vals = sorted((b, ck) for ck, _, b in rows)
    med = vals[(len(vals) + 1) // 2 - 1][0]
    cells = defaultdict(lambda: [0, 0])
    for ck, seg, b in rows:
        cells[seg][0] += 1
        if b > med:
            cells[seg][1] += 1
    p = sum(a for _, a in cells.values()) / sum(
        n for n, _ in cells.values()
    )
    got = {
        r["segment"]: r
        for r in REGISTRY["median_test_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(cells)
    for seg, (n, above) in cells.items():
        r = got[seg]
        assert r["n_customers"] == n and r["n_above"] == above
        assert r["expected_above"] == pytest.approx(n * p, abs=2e-3)
        chi = (above - n * p) ** 2 / (n * p) + (
            (n - above) - n * (1 - p)
        ) ** 2 / (n * (1 - p))
        assert r["chi2_contribution"] == pytest.approx(chi, abs=2e-5)


def test_winsor_effect_q_matches_bruteforce(spark):
    """Winsorized moments replayed with a plain sort + clamp."""
    tot = _purchase_totals()
    vals = sorted((v, u) for u, v in tot.items())
    n = len(vals)
    lo = vals[max(math.ceil(0.05 * n), 1) - 1][0]
    hi = vals[math.ceil(0.95 * n) - 1][0]
    ys = [v for v, _ in vals]
    yw = [min(max(v, lo), hi) for v in ys]

    def mv(xs):
        mu = sum(xs) / n
        return mu, math.sqrt(
            sum((x - mu) ** 2 for x in xs) / (n - 1)
        )

    mr, sr = mv(ys)
    mw, sw = mv(yw)
    row = REGISTRY["winsor_effect_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert row["mean_raw"] == pytest.approx(mr, abs=2e-3)
    assert row["mean_winsor"] == pytest.approx(mw, abs=2e-3)
    assert row["sd_raw"] == pytest.approx(sr, abs=2e-3)
    assert row["sd_winsor"] == pytest.approx(sw, abs=2e-3)
    assert row["sd_reduction"] == pytest.approx(1 - sw / sr, abs=2e-5)


def test_simpson_paradox_q_matches_bruteforce(spark):
    """Pooled vs per-quartile rate differences replayed."""
    acts = defaultdict(int)
    conv = defaultdict(int)
    for uid, _, _, _, t in _events():
        acts[uid] += 1
        if t == "purchase":
            conv[uid] = 1
    users = sorted(acts, key=lambda u: (acts[u], u))
    n = len(users)
    q, r = divmod(n, 4)
    sizes = [q + 1 if i < r else q for i in range(4)]
    strata = {}
    idx = 0
    for s, size in enumerate(sizes, start=1):
        for u in users[idx : idx + size]:
            strata[u] = s
        idx += size

    def diff(members):
        c1 = sum(conv.get(u, 0) for u in members if u % 2 == 1)
        n1 = sum(1 for u in members if u % 2 == 1)
        c0 = sum(conv.get(u, 0) for u in members if u % 2 == 0)
        n0 = sum(1 for u in members if u % 2 == 0)
        rd = None
        if n1 and n0:
            rd = c1 / n1 - c0 / n0
        return rd, c1 + c0, n1 + n0

    got = {
        r["stratum"]: r
        for r in REGISTRY["simpson_paradox_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == {-1, 1, 2, 3, 4}
    for s in (-1, 1, 2, 3, 4):
        members = (
            users if s == -1 else [u for u in users if strata[u] == s]
        )
        rd, nc, nu = diff(members)
        row = got[s]
        assert row["n_conversions"] == nc and row["n_users"] == nu
        if rd is None:
            assert row["rate_diff"] is None
        else:
            assert row["rate_diff"] == pytest.approx(rd, abs=2e-6)


def test_u_chart_q_matches_bruteforce(spark):
    """u-chart replayed with per-day counters."""
    users = defaultdict(set)
    errs = Counter()
    for uid, ts, _, _, t in _events():
        users[ts.date()].add(uid)
        if t == "error":
            errs[ts.date()] += 1
    ubar = sum(errs.values()) / sum(len(v) for v in users.values())
    got = {
        r["day"]: r
        for r in REGISTRY["u_chart_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(users)
    for day, us in users.items():
        n = len(us)
        rate = errs.get(day, 0) / n
        ucl = ubar + 3 * math.sqrt(ubar / n)
        r = got[day]
        assert r["n_users"] == n
        assert r["n_errors"] == errs.get(day, 0)
        assert r["u_rate"] == pytest.approx(rate, abs=2e-6)
        assert r["ucl"] == pytest.approx(ucl, abs=2e-6)
        assert r["violation"] == (rate > ucl)


def test_copeland_q_matches_bruteforce(spark):
    """Copeland standings replayed with duel loops."""
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _, ts, _, v, t in _events():
        d = agg[(ts.date(), t)]
        d[0] += Decimal(str(v)).quantize(Decimal("0.000001"))
        d[1] += 1
    by_day = defaultdict(dict)
    for (day, t), (s, c) in agg.items():
        by_day[day][t] = _q6(float(s) / c)
    types = sorted({t for d in by_day.values() for t in d})
    score = Counter()
    won = Counter()
    for ti in types:
        for tj in types:
            if ti == tj:
                continue
            w = n = 0
            for day, ms in by_day.items():
                if ti in ms and tj in ms:
                    n += 1
                    if ms[ti] > ms[tj]:
                        w += 1
            won[ti] += w
            if 2 * w > n:
                score[ti] += 1
            elif 2 * w < n:
                score[ti] -= 1
    got = {
        r["event_type"]: r
        for r in REGISTRY["copeland_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(types)
    for t in types:
        assert got[t]["copeland_score"] == score[t]
        assert got[t]["days_won"] == won[t]
