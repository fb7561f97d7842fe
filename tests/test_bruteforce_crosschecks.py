"""Third-implementation cross-checks for complex analytic queries.

The DuckDB-oracle gate proves Spark and the oracle AGREE — but both are
written from the same design, so a shared misconception passes the gate
(round 4's clustering_coeff_q wedge-closure bug did exactly that).
These tests recompute the metric a THIRD way — plain Python over the raw
parquet, written independently from the definition — and require the
registered query to match. Small scale (sf0.001) keeps brute force
tractable; the point is algorithmic independence, not speed.
"""

import itertools
import math

import duckdb
import pytest

from iniz_exporters_spark.queries import REGISTRY

# Historical-round replica (VERDICT r12 #7): covers code frozen since its
# round; runs in the full close-gate suite but is excluded from the
# mid-round fast path (pytest -m 'not slow').
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.001"


def _copurchase_edges():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet') a
        JOIN read_parquet('{SF_SMALL}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()


def test_adamic_adar_q_matches_bruteforce(spark):
    """Adamic-Adar from the definition: for every part pair, sum
    1/ln(|order|) over shared orders with >= 2 distinct parts."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT l_orderkey, l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet')
        """
    ).fetchall()
    orders: dict[int, set[int]] = {}
    for o, p in rows:
        orders.setdefault(o, set()).add(p)
    from collections import defaultdict
    from decimal import Decimal, ROUND_HALF_UP

    score: dict = defaultdict(lambda: [0, Decimal(0)])
    for parts in orders.values():
        if len(parts) < 2:
            continue
        w = Decimal(repr(1.0 / math.log(len(parts)))).quantize(
            Decimal("1e-12")
        )
        for pa, pb in itertools.combinations(sorted(parts), 2):
            score[(pa, pb)][0] += 1
            score[(pa, pb)][1] += w
    expect = sorted(
        ((pa, pb, n, w) for (pa, pb), (n, w) in score.items()),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:30]
    expect = [(pa, pb, n, float(round(w, 6))) for pa, pb, n, w in expect]
    got = [
        (r["pa"], r["pb"], r["n_common"], r["aa_score"])
        for r in REGISTRY["adamic_adar_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


def test_kcore_q_matches_true_kcore(spark):
    """The bounded-round peel must equal the TRUE k-core (peel to
    fixpoint) on the shipped dataset — the convergence clause of the
    operator's contract, checked against an independent peeling."""
    edges = _copurchase_edges()
    k = 80
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        doomed = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(doomed)
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    expect = {(n, len(nb)) for n, nb in adj.items()}
    got = {
        (r["node"], r["degree"])
        for r in REGISTRY["kcore_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_roc_auc_q_matches_bruteforce(spark):
    """AUC recomputed as the normalized Mann-Whitney U from per-document
    (label, score) pairs with midrank tie handling — no grouped-count
    shortcut shared with the engine implementations."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT lang, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    pairs = []
    for lang, text in docs:
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            continue
        s = round(sum(len(t) for t in toks) / len(toks), 4)
        pairs.append((1 if lang == "en" else 0, s))
    # midrank U statistic
    pairs.sort(key=lambda x: x[1])
    n = len(pairs)
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][1] == pairs[i][1]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = mid
        i = j
    n_pos = sum(y for y, _ in pairs)
    n_neg = n - n_pos
    rank_sum_pos = sum(r for (y, _), r in zip(pairs, ranks) if y == 1)
    auc = (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    r = REGISTRY["roc_auc_q"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (n_pos, n_neg)
    assert r["auc"] == pytest.approx(auc, abs=5e-6)


def test_gini_q_matches_bruteforce(spark):
    """Per-source Gini from the classic sorted formula
    G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n with (n_chars, doc_id) order."""
    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT source, doc_id, n_chars
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        """
    ).fetchall()
    by_src: dict[str, list] = {}
    for src, did, nc in docs:
        by_src.setdefault(src, []).append((nc, did))
    expect = {}
    for src, items in by_src.items():
        items.sort()
        n = len(items)
        tot = sum(nc for nc, _ in items)
        weighted = sum((i + 1) * nc for i, (nc, _) in enumerate(items))
        gini = 2.0 * weighted / (n * tot) - (n + 1.0) / n
        expect[src] = (n, tot, round(gini, 6))
    got = {
        r["source"]: (r["n_docs"], r["total_chars"], r["gini"])
        for r in REGISTRY["gini_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for src in expect:
        assert got[src][0] == expect[src][0]
        assert got[src][1] == expect[src][1]
        assert got[src][2] == pytest.approx(expect[src][2], abs=2e-6)


def test_exact_median_q_matches_bruteforce(spark):
    """The distributed exact median (lo/hi order statistics) against a
    plain Python sort of the raw column."""
    con = duckdb.connect()
    vals = sorted(
        float(v)
        for (v,) in con.execute(
            f"""
            SELECT l_extendedprice
            FROM read_parquet('{SF_SMALL}/lineitem.parquet')
            """
        ).fetchall()
    )
    n = len(vals)
    want_lo = vals[(n + 1) // 2 - 1]
    want_hi = vals[(n + 2) // 2 - 1]
    r = REGISTRY["exact_median_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n"] == n
    assert r["median_lo"] == pytest.approx(want_lo, abs=1e-6)
    assert r["median_hi"] == pytest.approx(want_hi, abs=1e-6)


def test_modularity_q_matches_bruteforce(spark):
    """Newman modularity recomputed from the definition
    Q = sum_c (e_c/m - (d_c/2m)^2) with dict counting over the
    brand-labeled co-purchase graph."""
    con = duckdb.connect()
    edges = _copurchase_edges()
    brand = dict(
        con.execute(
            f"""
            SELECT p_partkey, p_brand
            FROM read_parquet('{SF_SMALL}/part.parquet')
            """
        ).fetchall()
    )
    from collections import Counter

    m = len(edges)
    intra: Counter = Counter()
    deg: Counter = Counter()
    for a, b in edges:
        ca, cb = brand[a], brand[b]
        deg[ca] += 1
        deg[cb] += 1
        if ca == cb:
            intra[ca] += 1
    q = sum(
        intra.get(c, 0) / m - (d / (2.0 * m)) ** 2 for c, d in deg.items()
    )
    r = REGISTRY["modularity_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_edges"] == m
    assert r["n_communities"] == len(deg)
    assert r["modularity"] == pytest.approx(q, abs=2e-6)


def test_assortativity_q_matches_bruteforce(spark):
    """Degree assortativity as the plain Pearson correlation over the
    symmetrized (deg(u), deg(v)) endpoint pairs."""
    edges = _copurchase_edges()
    from collections import Counter

    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    r = REGISTRY["assortativity_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_edges"] == len(edges)
    assert r["assortativity"] == pytest.approx(want, abs=2e-6)


def test_hits_q_matches_bruteforce(spark):
    """The 1.5-step HITS contract (authority init by degree, L1
    normalization between steps) replayed with dict loops instead of
    joins; top-20 identity and 8-dp authorities must match."""
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT l_suppkey, l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet')
        """
    ).fetchall()
    from collections import defaultdict

    by_hub = defaultdict(list)
    by_auth = defaultdict(list)
    for h, a in edges:
        by_hub[h].append(a)
        by_auth[a].append(h)
    z = float(len(edges))
    a1 = {a: len(hs) / z for a, hs in by_auth.items()}
    h1 = {h: sum(a1[a] for a in as_) for h, as_ in by_hub.items()}
    zh = sum(h1.values())
    h1 = {h: v / zh for h, v in h1.items()}
    a2 = {a: sum(h1[h] for h in hs) for a, hs in by_auth.items()}
    za = sum(a2.values())
    expect = {a: v / za for a, v in a2.items()}
    got = [
        (r["part"], r["authority"])
        for r in REGISTRY["hits_q"].fn(spark, SF_SMALL).collect()
    ]
    # authorities tie heavily at this scale, so top-20 IDENTITY depends
    # on sub-8dp noise; check every returned value against the brute
    # force and that the returned multiset IS the top-20 of all scores
    for p, v in got:
        assert v == pytest.approx(expect[p], abs=5e-8), p
    want_top = sorted(expect.values(), reverse=True)[:20]
    for (pg, vg), ve in zip(got, want_top):
        assert vg == pytest.approx(ve, abs=5e-8)


def test_woe_iv_q_matches_bruteforce(spark):
    """Weight-of-evidence per acctbal bin from the definition
    ln((pos_i/P)/(neg_i/N)) with plain Python binning."""
    con = duckdb.connect()
    bals = [
        float(v)
        for (v,) in con.execute(
            f"SELECT c_acctbal FROM read_parquet('{SF_SMALL}/customer.parquet')"
        ).fetchall()
    ]
    bins: dict[int, list] = {}
    for v in bals:
        b = min(max(math.floor((v + 1000) / 875), 0), 7)
        y = 1 if v < 0 else 0
        bins.setdefault(b, [0, 0])
        bins[b][y == 0] += 0  # keep structure explicit
        if y:
            bins[b][0] += 1
        else:
            bins[b][1] += 1
    P = sum(p for p, _ in bins.values())
    N = sum(n for _, n in bins.values())
    got = {
        r["bin"]: r for r in REGISTRY["woe_iv_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(bins)
    for b, (pos, neg) in bins.items():
        assert (got[b]["n_pos"], got[b]["n_neg"]) == (pos, neg)
        if pos > 0 and neg > 0:
            woe = math.log((pos / P) / (neg / N))
            iv = (pos / P - neg / N) * woe
        else:
            woe = iv = 0.0
        assert got[b]["woe"] == pytest.approx(woe, abs=2e-6)
        assert got[b]["iv_term"] == pytest.approx(iv, abs=2e-6)


def test_cusum_changepoint_q_matches_bruteforce(spark):
    """CUSUM trace recomputed with a running Python sum over the
    6-dp-quantized daily means; the flagged day is the |cusum| argmax."""
    from decimal import Decimal

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ts AS DATE) AS day, value
        FROM read_parquet('{SF_SMALL}/events.parquet')
        WHERE event_type = 'error'
        """
    ).fetchall()
    acc: dict = {}
    for day, v in rows:
        acc.setdefault(day, []).append(Decimal(repr(v)).quantize(
            Decimal("1e-6")
        ))
    days = sorted(acc)
    means = {
        d: (sum(acc[d]) / len(acc[d])).quantize(Decimal("1e-6"))
        for d in days
    }
    mu = (sum(means.values()) / len(days)).quantize(Decimal("1e-6"))
    cusum, trace = Decimal(0), {}
    for d in days:
        cusum += means[d] - mu
        trace[d] = cusum
    peak = max(abs(v) for v in trace.values())
    got = {
        r["day"]: r
        for r in REGISTRY["cusum_changepoint_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(days)
    for d in days:
        assert got[d]["daily_mean"] == pytest.approx(
            float(means[d]), abs=1e-4
        )
        assert got[d]["cusum"] == pytest.approx(float(trace[d]), abs=1e-3)
        assert got[d]["is_changepoint"] == (abs(trace[d]) == peak)
        # Sign-aware: the driver hashes stringified cells, so the rounded
        # doubles must never be IEEE -0.0 (Spark/DuckDB disagree on the
        # sign of a rounded-to-zero value — the r7 red row).
        for col in ("daily_mean", "cusum"):
            v = got[d][col]
            assert not (v == 0.0 and math.copysign(1.0, v) < 0), (d, col)


def test_theil_sen_q_matches_bruteforce(spark):
    """Median-of-pairwise-slopes over daily click means, slopes
    enumerated with plain loops and the median taken by sorting."""
    from decimal import Decimal

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ts AS DATE) AS day, value
        FROM read_parquet('{SF_SMALL}/events.parquet')
        WHERE event_type = 'click'
        """
    ).fetchall()
    import datetime

    acc: dict = {}
    for day, v in rows:
        acc.setdefault(day, []).append(Decimal(repr(v)).quantize(
            Decimal("1e-6")
        ))
    x0 = datetime.date(2024, 1, 1)
    pts = sorted(
        ((d - x0).days, (sum(vs) / len(vs)).quantize(Decimal("1e-6")))
        for d, vs in acc.items()
    )
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            xa, ma = pts[i]
            xb, mb = pts[j]
            slopes.append(float(mb - ma) / (xb - xa))
    slopes.sort()
    n = len(slopes)
    mid = (
        slopes[(n - 1) // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2.0
    )
    r = REGISTRY["theil_sen_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_pairs"] == n
    assert r["theil_sen_slope"] == pytest.approx(mid, abs=2e-6)


def test_ks_test_q_matches_bruteforce(spark):
    """Two-sample KS statistic from the definition: sup over all
    observed values of |CDF_a - CDF_b|, computed from raw sorted
    samples rather than grouped cumulative windows."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lang, n_chars
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        WHERE lang IN ('en', 'zh')
        """
    ).fetchall()
    a = sorted(v for lg, v in rows if lg == "en")
    b = sorted(v for lg, v in rows if lg == "zh")
    import bisect

    points = sorted(set(a) | set(b))
    ks = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in points
    )
    r = REGISTRY["ks_test_q"].fn(spark, SF_SMALL).collect()[0]
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["ks_stat"] == pytest.approx(ks, abs=2e-6)


def test_benford_audit_q_matches_bruteforce(spark):
    """Leading-digit frequencies recounted with plain string slicing and
    the Benford expectation log10(1 + 1/d)."""
    con = duckdb.connect()
    vals = [
        float(v)
        for (v,) in con.execute(
            f"""
            SELECT o_totalprice
            FROM read_parquet('{SF_SMALL}/orders.parquet')
            WHERE o_totalprice >= 1
            """
        ).fetchall()
    ]
    from collections import Counter

    counts = Counter(int(str(int(math.floor(v)))[0]) for v in vals)
    total = sum(counts.values())
    got = {
        r["digit"]: r
        for r in REGISTRY["benford_audit_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(counts)
    for d, n in counts.items():
        assert got[d]["n"] == n
        assert got[d]["frac"] == pytest.approx(n / total, abs=1e-9)
        assert got[d]["benford"] == pytest.approx(
            math.log10(1 + 1.0 / d), abs=1e-9
        )


def test_chi2_independence_q_matches_bruteforce(spark):
    """Pearson chi-square over the FULL lang x source grid including
    structurally-zero cells (each contributes its expected count) — the
    textbook statistic an observed-cells-only sum would understate."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lang, source
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        """
    ).fetchall()
    from collections import Counter

    obs = Counter(rows)
    langs = sorted({lg for lg, _ in rows})
    sources = sorted({s for _, s in rows})
    row_tot = Counter(lg for lg, _ in rows)
    col_tot = Counter(s for _, s in rows)
    n = len(rows)
    chi2 = 0.0
    for lg in langs:
        for s in sources:
            e = row_tot[lg] * col_tot[s] / n
            o = obs.get((lg, s), 0)
            chi2 += (o - e) ** 2 / e
    r = REGISTRY["chi2_independence_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_docs"] == n
    assert r["dof"] == (len(langs) - 1) * (len(sources) - 1)
    assert r["chi2"] == pytest.approx(chi2, abs=2e-6)


def test_mi_feature_q_matches_bruteforce(spark):
    """MI(token presence; lang) per top-20 document-frequency token from
    the definition sum over the 2 x |langs| table, dict-counted."""
    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT doc_id, lang, text
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        """
    ).fetchall()
    from collections import Counter

    n = len(docs)
    lang_tot = Counter(lg for _, lg, _ in docs)
    df: Counter = Counter()
    joint: Counter = Counter()
    for _, lg, text in docs:
        toks = {t for t in text.split(" ") if t}
        for t in toks:
            df[t] += 1
            joint[(t, lg)] += 1
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {}
    for tok, d in top:
        mi = 0.0
        for lg, nl in lang_tot.items():
            c11 = joint.get((tok, lg), 0)
            c01 = nl - c11
            for c, marg in ((c11, d), (c01, n - d)):
                if c > 0 and marg > 0:
                    mi += (c / n) * math.log2(c * n / (marg * nl))
        expect[tok] = (d, mi)
    got = {
        r["tok"]: (r["df"], r["mi"])
        for r in REGISTRY["mi_feature_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for tok, (d, mi) in expect.items():
        assert got[tok][0] == d
        assert got[tok][1] == pytest.approx(mi, abs=2e-6), tok


def test_correlation_matrix_q_matches_bruteforce(spark):
    """Pearson correlations recomputed with numpy over the raw columns."""
    import numpy as np

    con = duckdb.connect()
    q, p, dsc = map(
        np.array,
        zip(
            *con.execute(
                f"""
                SELECT l_quantity, l_extendedprice, l_discount
                FROM read_parquet('{SF_SMALL}/lineitem.parquet')
                """
            ).fetchall()
        ),
    )
    r = REGISTRY["correlation_matrix_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n"] == len(q)
    assert r["corr_qty_price"] == pytest.approx(
        float(np.corrcoef(q, p)[0, 1]), abs=2e-6
    )
    assert r["corr_qty_disc"] == pytest.approx(
        float(np.corrcoef(q, dsc)[0, 1]), abs=2e-6
    )
    assert r["corr_price_disc"] == pytest.approx(
        float(np.corrcoef(p, dsc)[0, 1]), abs=2e-6
    )


def test_twonn_dim_q_matches_bruteforce(spark):
    """TwoNN intrinsic-dimension MLE recomputed with numpy: exact 1st/2nd
    neighbor distances per probe (6-dp-rounded d2 with id tiebreaks, the
    documented contract), dim = n / sum(0.5 * ln(d2/d1))."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT vec_id, embedding
        FROM read_parquet('{SF_SMALL}/embeddings.parquet')
        ORDER BY vec_id
        """
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    probes = ids < 50
    lrs = []
    for qi in np.where(probes)[0]:
        d2 = np.round(((V - V[qi]) ** 2).sum(axis=1), 6)
        order = sorted(
            (float(d2[j]), int(ids[j]))
            for j in range(len(ids))
            if j != qi
        )
        d1, dd2 = order[0][0], order[1][0]
        if d1 > 0:
            lrs.append(0.5 * math.log(dd2 / d1))
    want = len(lrs) / sum(lrs)
    r = REGISTRY["twonn_dim_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_probes"] == len(lrs)
    assert r["intrinsic_dim"] == pytest.approx(want, abs=5e-4)


def test_zipf_fit_q_matches_bruteforce(spark):
    """Zipf OLS over the top-1000 (freq desc, tok asc) ranks recomputed
    with plain Python sums on ln(rank)/ln(freq)."""
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM read_parquet('{SF_SMALL}/documents.parquet')"
        ).fetchall()
    ]
    from collections import Counter

    freq: Counter = Counter()
    for text in texts:
        for tok in text.split(" "):
            if tok:
                freq[tok] += 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(f) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = REGISTRY["zipf_fit_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_ranks"] == n
    assert r["slope"] == pytest.approx(slope, abs=2e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=2e-6)
    assert r["r2"] == pytest.approx(r2, abs=2e-6)


def test_heaps_law_q_matches_bruteforce(spark):
    """Vocabulary-growth curve rebuilt with a running Python set over
    doc_id-bucketed token streams."""
    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT doc_id, text
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        ORDER BY doc_id
        """
    ).fetchall()
    nd = max(d for d, _ in docs) + 1
    cum_tokens: dict[int, int] = {}
    first_bucket: dict[str, int] = {}
    for did, text in docs:
        b = did * 10 // nd
        toks = [t for t in text.split(" ") if t]
        cum_tokens[b] = cum_tokens.get(b, 0) + len(toks)
        for t in toks:
            if t not in first_bucket or first_bucket[t] > b:
                first_bucket[t] = b
    from collections import Counter

    new_types = Counter(first_bucket.values())
    buckets = sorted(cum_tokens)
    ct = cs = 0
    expect = []
    for b in buckets:
        ct += cum_tokens[b]
        cs += new_types.get(b, 0)
        expect.append((b, ct, cs))
    got = sorted(
        (r["bucket"], r["cum_tokens"], r["cum_types"])
        for r in REGISTRY["heaps_law_q"].fn(spark, SF_SMALL).collect()
    )
    assert got == expect


def test_interval_concurrency_q_matches_bruteforce(spark):
    """Per-month peak of concurrently-open [orderdate, shipdate]
    intervals via a dict-based day sweep (the O(days) analogue of the
    engines' boundary-delta prefix sum)."""
    import datetime

    con = duckdb.connect()
    ivs = con.execute(
        f"""
        SELECT CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)
        FROM read_parquet('{SF_SMALL}/lineitem.parquet') l
        JOIN read_parquet('{SF_SMALL}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    from collections import Counter

    delta: Counter = Counter()
    for s, e in ivs:
        delta[s] += 1
        delta[e + datetime.timedelta(days=1)] -= 1
    days = sorted(delta)
    open_n = 0
    peak: dict[int, int] = {}
    nb: Counter = Counter()
    for d in days:
        open_n += delta[d]
        ym = d.year * 100 + d.month
        peak[ym] = max(peak.get(ym, -(10 ** 9)), open_n)
        nb[ym] += 1
    got = {
        r["ym"]: (r["peak_open"], r["n_boundary_days"])
        for r in REGISTRY["interval_concurrency_q"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert got == {ym: (peak[ym], nb[ym]) for ym in peak}


def test_k_anonymity_q_matches_bruteforce(spark):
    """Quasi-identifier group sizes, sensitive-value diversity, and the
    k/l flags recounted with plain dicts."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c_nationkey, c_mktsegment, c_acctbal
        FROM read_parquet('{SF_SMALL}/customer.parquet')
        """
    ).fetchall()
    groups: dict = {}
    for nk, seg, bal in rows:
        g = groups.setdefault((nk, seg), [0, set()])
        g[0] += 1
        g[1].add("neg" if bal < 0 else "nonneg")
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): (
            r["group_size"],
            r["n_distinct_sensitive"],
            r["k_violation"],
            r["l1_leak"],
        )
        for r in REGISTRY["k_anonymity_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(groups)
    for key, (n, sens) in groups.items():
        assert got[key] == (n, len(sens), n < 25, len(sens) <= 1)


def test_rich_club_q_matches_bruteforce(spark):
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) recomputed
    with set filtering over the co-purchase graph for k in {2, 4, 8}."""
    edges = _copurchase_edges()
    from collections import Counter

    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    expect = {}
    for k in (2, 4, 8):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        phi = 2.0 * ek / (nk * (nk - 1)) if nk >= 2 else 0.0
        expect[k] = (nk, ek, round(phi, 6))
    got = {
        r["k"]: (r["n_club"], r["club_edges"], r["phi"])
        for r in REGISTRY["rich_club_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == expect[k][1]
        assert got[k][2] == pytest.approx(expect[k][2], abs=2e-6)


def test_entropy_ldiversity_q_matches_bruteforce(spark):
    """Per quasi-identifier cell: Shannon entropy of the sensitive
    attribute recomputed with dict counting."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
        FROM read_parquet('{SF_SMALL}/customer.parquet') c
        JOIN read_parquet('{SF_SMALL}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    from collections import Counter

    cells: dict = {}
    for nk, seg, pri in rows:
        cells.setdefault((nk, seg), Counter())[pri] += 1
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in REGISTRY["entropy_ldiversity_q"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(cells)
    for key, cnts in cells.items():
        n = sum(cnts.values())
        ent = -sum((c / n) * math.log(c / n) for c in cnts.values())
        r = got[key]
        assert r["n_orders"] == n
        assert r["n_priorities"] == len(cnts)
        assert r["entropy"] == pytest.approx(ent, abs=2e-6), key


def test_association_rules_q_matches_bruteforce(spark):
    """Support/confidence/lift recomputed with dict counting over
    distinct (order, part) pairs; the returned top-30 must be a valid
    lift-ordered head of the full rule set with matching metrics."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT l_orderkey, l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet')
        """
    ).fetchall()
    from collections import Counter

    orders: dict[int, set[int]] = {}
    part_cnt: Counter = Counter()
    for o, p in rows:
        orders.setdefault(o, set()).add(p)
        part_cnt[p] += 1
    n_orders = len(orders)
    cab: Counter = Counter()
    for parts in orders.values():
        for pa in parts:
            for pb in parts:
                if pa != pb:
                    cab[(pa, pb)] += 1
    rules = {}
    for (pa, pb), c in cab.items():
        if c >= 3:
            conf = c / part_cnt[pa]
            lift = conf / (part_cnt[pb] / n_orders)
            rules[(pa, pb)] = (c, c / n_orders, conf, lift)
    expect = sorted(
        ((pa, pb, *m) for (pa, pb), m in rules.items()),
        key=lambda r: (-r[5], r[0], r[1]),
    )[:30]
    got = [
        (r["pa"], r["pb"], r["n_both"], r["support"], r["confidence"],
         r["lift"])
        for r in REGISTRY["association_rules_q"].fn(spark, SF_SMALL).collect()
    ]
    assert [(g[0], g[1], g[2]) for g in got] == [
        (e[0], e[1], e[2]) for e in expect
    ]
    for g, e in zip(got, expect):
        assert g[3] == pytest.approx(e[3], abs=2e-6)
        assert g[4] == pytest.approx(e[4], abs=2e-6)
        assert g[5] == pytest.approx(e[5], abs=2e-6)


def test_token_pmi_q_matches_bruteforce(spark):
    """PMI over top-50 document-frequency tokens recounted with sets."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    from collections import Counter

    presence: dict[str, set] = {}
    all_docs = set()
    for did, text in docs:
        toks = {t for t in text.split(" ") if t}
        if toks:
            all_docs.add(did)
        for t in toks:
            presence.setdefault(t, set()).add(did)
    top = sorted(
        presence.items(), key=lambda kv: (-len(kv[1]), kv[0])
    )[:50]
    n_docs = len(all_docs)
    expect = {}
    for i, (ta, da) in enumerate(top):
        for tb, db in top[i + 1:]:
            a, b = (ta, tb) if ta < tb else (tb, ta)
            c = len(presence[a] & presence[b])
            if c >= 10:
                pmi = math.log(
                    c * n_docs / (len(presence[a]) * len(presence[b]))
                )
                expect[(a, b)] = (c, pmi)
    got = {
        (r["tok_a"], r["tok_b"]): (r["pair_count"], r["pmi"])
        for r in REGISTRY["token_pmi_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for key, (c, pmi) in expect.items():
        assert got[key][0] == c
        assert got[key][1] == pytest.approx(pmi, abs=2e-6), key


def test_dau_wau_stickiness_matches_bruteforce(spark):
    """DAU/WAU per day rebuilt with date loops and set unions over the
    trailing 7-day window."""
    import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT CAST(ts AS DATE), user_id
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchall()
    by_day: dict = {}
    for d, u in rows:
        by_day.setdefault(d, set()).add(u)
    got = {
        r["day"]: r
        for r in REGISTRY["dau_wau_stickiness"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_day)
    for d, users in by_day.items():
        window = set()
        for k in range(7):
            window |= by_day.get(d - datetime.timedelta(days=k), set())
        assert got[d]["dau"] == len(users)
        assert got[d]["wau"] == len(window)
        assert got[d]["stickiness"] == pytest.approx(
            len(users) / len(window), abs=2e-6
        )


def test_funnel_stages_matches_bruteforce(spark):
    """Funnel stage via Python regex over per-user event sequences
    ordered by (ts, event_id)."""
    import re

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, ts, event_id, event_type
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchall()
    by_user: dict = {}
    for uid, ts, eid, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        seq = ">".join(et for _, _, et in evs)
        if re.search("view.*click.*purchase", seq):
            st = 3
        elif re.search("view.*click", seq):
            st = 2
        elif re.search("view", seq):
            st = 1
        else:
            st = 0
        expect[uid] = (st, len(evs))
    got = {
        r["user_id"]: (r["funnel_stage"], r["n_events"])
        for r in REGISTRY["funnel_stages"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_cohort_retention_q_matches_bruteforce(spark):
    """Weekly cohort retention grid rebuilt with Python date math:
    cohort = ISO week of first event, offset = whole weeks since."""
    import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, CAST(ts AS DATE)
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchall()

    def week_start(d: "datetime.date") -> "datetime.date":
        return d - datetime.timedelta(days=d.weekday())

    first: dict = {}
    active: set = set()
    for uid, d in rows:
        w = week_start(d)
        active.add((uid, w))
        if uid not in first or first[uid] > w:
            first[uid] = w
    from collections import Counter

    grid: Counter = Counter()
    for uid, w in active:
        grid[(first[uid], (w - first[uid]).days // 7)] += 1
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in REGISTRY["cohort_retention_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == dict(grid)


def test_time_to_convert_q_matches_bruteforce(spark):
    """Signup-to-first-purchase latency per user with plain min() scans;
    non-converting signups keep a NULL latency."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, ts, event_type
        FROM read_parquet('{SF_SMALL}/events.parquet')
        WHERE event_type IN ('signup', 'purchase')
        """
    ).fetchall()
    signup: dict = {}
    for uid, ts, et in rows:
        if et == "signup" and (uid not in signup or signup[uid] > ts):
            signup[uid] = ts
    conv: dict = {}
    for uid, ts, et in rows:
        if (
            et == "purchase"
            and uid in signup
            and ts >= signup[uid]
            and (uid not in conv or conv[uid] > ts)
        ):
            conv[uid] = ts
    # date_diff('second') counts second-BOUNDARY crossings (truncate
    # each timestamp to seconds, then subtract) — not floor(duration)
    expect = {
        uid: (
            int(
                (
                    conv[uid].replace(microsecond=0)
                    - s.replace(microsecond=0)
                ).total_seconds()
            )
            if uid in conv
            else None
        )
        for uid, s in signup.items()
    }
    got = {
        r["user_id"]: r["convert_secs"]
        for r in REGISTRY["time_to_convert_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_markov_transitions_q_matches_bruteforce(spark):
    """Per-source transition probabilities recounted from per-user
    (ts, event_id)-sorted sequences."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, ts, event_id, event_type
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchall()
    from collections import Counter

    by_user: dict = {}
    for uid, ts, eid, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    trans: Counter = Counter()
    src_tot: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
            src_tot[a] += 1
    got = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in REGISTRY["markov_transitions_q"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(trans)
    for key, n in trans.items():
        assert got[key][0] == n
        assert got[key][1] == pytest.approx(
            n / src_tot[key[0]], abs=1e-9
        )


def test_rfm_segment_q_matches_bruteforce(spark):
    """Recency/frequency/monetary per customer plus NTILE(4) scores with
    Python quartile assignment (the SQL NTILE fill rule: first
    n mod 4 tiles get the extra rows)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, o_orderdate, o_totalprice
        FROM read_parquet('{SF_SMALL}/orders.parquet')
        """
    ).fetchall()
    maxd = max(d for _, d, _ in rows)
    from collections import defaultdict
    from decimal import Decimal

    agg: dict = defaultdict(lambda: [None, 0, Decimal(0)])
    for ck, d, tp in rows:
        a = agg[ck]
        a[0] = d if a[0] is None or a[0] < d else a[0]
        a[1] += 1
        a[2] += Decimal(repr(tp)).quantize(Decimal("1e-4"))
    rfm = {
        ck: ((maxd - last).days, freq, float(round(mon, 2)))
        for ck, (last, freq, mon) in agg.items()
    }

    def ntile4(keys):
        n = len(keys)
        base, extra = divmod(n, 4)
        out, i = {}, 0
        for tile in range(1, 5):
            size = base + (1 if tile <= extra else 0)
            for ck in keys[i : i + size]:
                out[ck] = tile
            i += size
        return out

    r_score = ntile4(sorted(rfm, key=lambda c: (rfm[c][0], c)))
    f_score = ntile4(sorted(rfm, key=lambda c: (-rfm[c][1], c)))
    m_score = ntile4(sorted(rfm, key=lambda c: (-agg[c][2], c)))
    got = {
        r["custkey"]: r
        for r in REGISTRY["rfm_segment_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(rfm)
    for ck, (rec, freq, mon) in rfm.items():
        g = got[ck]
        assert (g["recency_days"], g["frequency"]) == (rec, freq)
        assert g["monetary"] == pytest.approx(mon, abs=1e-6)
        assert (g["r_score"], g["f_score"], g["m_score"]) == (
            r_score[ck], f_score[ck], m_score[ck],
        ), ck


def test_cuped_q_matches_bruteforce(spark):
    """CUPED adjustment recomputed with plain Python: theta from global
    covariate moments, adjusted means per hash arm."""
    import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, ts, value
        FROM read_parquet('{SF_SMALL}/events.parquet')
        """
    ).fetchall()
    from collections import defaultdict
    from decimal import Decimal

    cut = datetime.datetime(2024, 1, 16)
    xs: dict = defaultdict(Decimal)
    ys: dict = defaultdict(Decimal)
    for uid, ts, v in rows:
        d = Decimal(repr(v)).quantize(Decimal("1e-6"))
        if ts < cut:
            xs[uid] += d
        else:
            ys[uid] += d
    users = sorted(set(xs) | set(ys))
    n = len(users)
    x = {u: float(xs[u]) for u in users}
    y = {u: float(ys[u]) for u in users}
    sx = sum(x.values())
    sy = sum(y.values())
    sxx = sum(v * v for v in x.values())
    sxy = sum(x[u] * y[u] for u in users)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mx = sx / n
    got = {
        r["arm"]: r for r in REGISTRY["cuped_q"].fn(spark, SF_SMALL).collect()
    }
    for arm in (0, 1):
        members = [u for u in users if u % 2 == arm]
        raw = sum(y[u] for u in members) / len(members)
        adj = sum(y[u] - theta * (x[u] - mx) for u in members) / len(members)
        assert got[arm]["n_users"] == len(members)
        assert got[arm]["raw_mean"] == pytest.approx(raw, abs=2e-6)
        assert got[arm]["cuped_mean"] == pytest.approx(adj, abs=2e-6)


def _poly_hash_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    return h


def test_pareto_frontier_q_matches_bruteforce(spark):
    """Running-maximum frontier of daily max order totals recomputed
    with a plain loop over date-sorted days."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_orderdate, o_totalprice
        FROM read_parquet('{SF_SMALL}/orders.parquet')
        """
    ).fetchall()
    import datetime

    daily: dict = {}
    for d, tp in rows:
        if isinstance(d, datetime.datetime):
            d = d.date()
        daily[d] = max(daily.get(d, float("-inf")), float(tp))
    best = float("-inf")
    expect = []
    for d in sorted(daily):
        if daily[d] > best:
            expect.append((d, round(daily[d], 2)))
            best = daily[d]
    got = sorted(
        (r["day"], r["day_max"])
        for r in REGISTRY["pareto_frontier_q"].fn(spark, SF_SMALL).collect()
    )
    assert got == expect


def test_grid_density_q_matches_bruteforce(spark):
    """Per-point 3x3-neighborhood density over the 0.1-cell grid of the
    first two embedding dims, recounted with dict cells."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT vec_id, embedding[1], embedding[2]
        FROM read_parquet('{SF_SMALL}/embeddings.parquet')
        """
    ).fetchall()
    from collections import Counter

    cell = {}
    counts: Counter = Counter()
    for vid, x, y in rows:
        cx, cy = math.floor(float(x) / 0.1), math.floor(float(y) / 0.1)
        cell[vid] = (cx, cy)
        counts[(cx, cy)] += 1
    got = {
        r["vec_id"]: r
        for r in REGISTRY["grid_density_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(cell)
    for vid, (cx, cy) in cell.items():
        nbr = sum(
            counts.get((cx + dx, cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        r = got[vid]
        assert (r["cx"], r["cy"]) == (cx, cy)
        assert r["nbr_count"] == nbr
        assert r["is_core"] == (nbr >= 8)


def test_stratified_alloc_q_matches_bruteforce(spark):
    """Largest-remainder (Hamilton) allocation of 300 samples across
    market segments plus hash-ranked take, replicated with dict math."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c_mktsegment, c_custkey
        FROM read_parquet('{SF_SMALL}/customer.parquet')
        """
    ).fetchall()
    from collections import Counter

    strata: dict = {}
    for seg, ck in rows:
        strata.setdefault(seg, []).append(ck)
    N = len(rows)
    base = {s: 300 * len(v) // N for s, v in strata.items()}
    rem = {s: (300 * len(v)) % N for s, v in strata.items()}
    extras = 300 - sum(base.values())
    order = sorted(strata, key=lambda s: (-rem[s], s))
    alloc = {
        s: base[s] + (1 if i < extras else 0) for i, s in enumerate(order)
    }
    got = {
        r["stratum"]: r
        for r in REGISTRY["stratified_alloc_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(strata)
    for s, keys in strata.items():
        ranked = sorted(keys, key=lambda k: (_poly_hash_py(str(k)), k))
        taken = ranked[: alloc[s]]
        r = got[s]
        assert r["n_stratum"] == len(keys)
        assert r["n_alloc"] == alloc[s]
        assert r["n_taken"] == len(taken)
        assert r["key_sum"] == sum(taken), s


def _quantile_type7(sorted_vals, p: float) -> float:
    """NumPy/DuckDB/Spark 'linear' (type-7) interpolated quantile."""
    n = len(sorted_vals)
    h = p * (n - 1)
    lo = math.floor(h)
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + (h - lo) * (sorted_vals[hi] - sorted_vals[lo])


def test_target_encode_loo_q_matches_bruteforce(spark):
    """Leave-one-out target encoding per customer: (group_sum - own) /
    (n - 1) with decimal sums — the off-by-one formula recomputed row by
    row."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM read_parquet('{SF_SMALL}/customer.parquet')
        """
    ).fetchall()
    from collections import defaultdict
    from decimal import Decimal

    s: dict = defaultdict(Decimal)
    n: dict = defaultdict(int)
    bal = {}
    for ck, nk, b in rows:
        d = Decimal(repr(b)).quantize(Decimal("1e-4"))
        s[nk] += d
        n[nk] += 1
        bal[ck] = (nk, d)
    got = {
        r["c_custkey"]: r
        for r in REGISTRY["target_encode_loo_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(bal)
    for ck, (nk, d) in bal.items():
        want = float((s[nk] - d) / (n[nk] - 1)) if n[nk] > 1 else 0.0
        assert got[ck]["c_nationkey"] == nk
        # compare against the UNROUNDED exact value: the engine's 4-dp
        # HALF_UP and Python's round-half-even diverge exactly at .5
        # boundaries, so the rounded values can differ by one last digit
        assert got[ck]["nation_loo_mean"] == pytest.approx(
            want, abs=5.1e-5
        ), ck


def test_mad_outliers_q_matches_bruteforce(spark):
    """Median absolute deviation per source with type-7 medians and the
    3*MAD outlier rule, recomputed with sorted lists."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT source, n_chars
        FROM read_parquet('{SF_SMALL}/documents.parquet')
        """
    ).fetchall()
    by_src: dict = {}
    for src, nc in rows:
        by_src.setdefault(src, []).append(nc)
    got = {
        r["source"]: r
        for r in REGISTRY["mad_outliers_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_src)
    for src, vals in by_src.items():
        med = _quantile_type7(sorted(vals), 0.5)
        devs = sorted(abs(v - med) for v in vals)
        mad = _quantile_type7(devs, 0.5)
        n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
        r = got[src]
        assert r["n_docs"] == len(vals)
        assert r["med"] == pytest.approx(med, abs=1e-9)
        assert r["mad"] == pytest.approx(mad, abs=1e-9)
        assert r["n_outliers"] == n_out, src


def test_winsorize_prices_matches_bruteforce(spark):
    """Winsorized mean per return flag: clamp to the decimal-pinned
    [p05, p95] band and average with decimal sums."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT l_returnflag, l_extendedprice
        FROM read_parquet('{SF_SMALL}/lineitem.parquet')
        """
    ).fetchall()
    from decimal import Decimal

    by_flag: dict = {}
    for fl, p in rows:
        by_flag.setdefault(fl, []).append(float(p))
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["winsorize_prices"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_flag)
    for fl, vals in by_flag.items():
        sv = sorted(vals)
        lo = Decimal(repr(_quantile_type7(sv, 0.05))).quantize(
            Decimal("1e-4")
        )
        hi = Decimal(repr(_quantile_type7(sv, 0.95))).quantize(
            Decimal("1e-4")
        )
        total = sum(
            min(max(Decimal(repr(v)).quantize(Decimal("1e-4")), lo), hi)
            for v in vals
        )
        r = got[fl]
        assert r["n"] == len(vals)
        assert r["lo"] == pytest.approx(float(lo), abs=1e-6)
        assert r["hi"] == pytest.approx(float(hi), abs=1e-6)
        assert r["mean_winsorized"] == pytest.approx(
            round(float(total) / len(vals), 2), abs=1e-2
        )


def test_forecast_eval_q_matches_bruteforce(spark):
    """Seasonal-naive (lag-7) forecast errors recomputed with a plain
    dict of 6-dp daily means: MAE, MAPE, sMAPE."""
    import datetime

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ts AS DATE), value
        FROM read_parquet('{SF_SMALL}/events.parquet')
        WHERE event_type = 'purchase'
        """
    ).fetchall()
    from decimal import Decimal

    acc: dict = {}
    for d, v in rows:
        acc.setdefault(d, []).append(Decimal(repr(v)).quantize(
            Decimal("1e-6")
        ))
    days = sorted(acc)
    m = {
        d: float((sum(acc[d]) / len(acc[d])).quantize(Decimal("1e-6")))
        for d in days
    }
    # LAG(m, 7) is seven ROWS back in day order, not calendar-7-days
    pairs = [
        (m[days[i]], m[days[i - 7]]) for i in range(7, len(days))
    ]
    mae = sum(abs(y - yh) for y, yh in pairs) / len(pairs)
    mape = sum(abs(y - yh) / y for y, yh in pairs) / len(pairs)
    smape = sum(
        2 * abs(y - yh) / (abs(y) + abs(yh)) for y, yh in pairs
    ) / len(pairs)
    r = REGISTRY["forecast_eval_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_eval_days"] == len(pairs)
    assert r["mae"] == pytest.approx(mae, abs=2e-6)
    assert r["mape"] == pytest.approx(mape, abs=2e-6)
    assert r["smape"] == pytest.approx(smape, abs=2e-6)


def test_anomaly_zscore_matches_bruteforce(spark):
    """Daily-count z-scores per event type with Python mean/sample-sd."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)
        FROM read_parquet('{SF_SMALL}/events.parquet')
        GROUP BY event_type, day
        """
    ).fetchall()
    by_type: dict = {}
    for et, d, n in rows:
        by_type.setdefault(et, {})[d] = n
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["zscore"])
        for r in REGISTRY["anomaly_zscore"].fn(spark, SF_SMALL).collect()
    }
    import statistics

    expect_keys = {(et, d) for et, days in by_type.items() for d in days}
    assert set(got) == expect_keys
    for et, days in by_type.items():
        vals = list(days.values())
        mu = statistics.fmean(vals)
        sd = statistics.stdev(vals)
        for d, n in days.items():
            assert got[(et, d)][0] == n
            assert got[(et, d)][1] == pytest.approx(
                (n - mu) / sd, abs=2e-6
            ), (et, d)
