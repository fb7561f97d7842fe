"""Third-implementation cross-checks for the round-7 driver window.

Continues the class (see tests/test_bruteforce_crosschecks.py): plain
Python / numpy recomputation, independent of both the Spark plan and the
DuckDB oracle, for r7-window analytics that did not yet have one —
landed a round EARLY so shared-design bugs are caught before those
queries' first driver rows.
"""

import math
from collections import defaultdict
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


def _q6(x: float) -> float:
    """Quantize to 6 dp half-up (Spark/DuckDB decimal cast+round)."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT user_id, ts, event_id, CAST(value AS DOUBLE), event_type "
        f"FROM read_parquet('{SF_SMALL}/events.parquet') "
        f"ORDER BY user_id, ts, event_id"
    ).fetchall()


def _embs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = [r[2] for r in rows]
    return ids, X, labels


def _bf_docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _bf_tok(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _bf_poly(s: str) -> int:
    codes = [ord(c) for c in s]
    if not codes:
        return 0
    h = codes[0]
    for c in codes[1:]:
        h = (h * 31 + c) % 1_000_000_007
    return h


def test_ewma_q_matches_bruteforce(spark):
    """Truncated-horizon EWMA from the definition: left fold
    acc*0.7 + x*0.3 over the trailing 8 observations, seeded at 0."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, v, _ in _events():
        streams[u].append((ts, eid, v))
    expect = {}
    for u, rows in streams.items():
        vals = [v for _, _, v in rows]
        for i, (ts, eid, _) in enumerate(rows):
            acc = 0.0
            for x in vals[max(0, i - 7) : i + 1]:
                acc = acc * 0.7 + x * 0.3
            expect[(u, eid)] = acc
    got = REGISTRY["ewma_q"].fn(spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for r in got:
        assert r["ewma"] == pytest.approx(
            expect[(r["user_id"], r["event_id"])], abs=1e-9
        )


def test_rolling_autocorr_q_matches_bruteforce(spark):
    """Lag-1 rolling correlation from the definition: Pearson over the
    trailing 16-row frame of (x, lag(x)) pairs, NULL when n<3 or a
    variance term is non-positive."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, v, _ in _events():
        x = float(
            Decimal(repr(v)).quantize(Decimal("1e-4"), ROUND_HALF_UP)
        )
        streams[u].append((eid, x))
    expect = {}
    for u, rows in streams.items():
        xs = [x for _, x in rows]
        for i, (eid, _) in enumerate(rows):
            pairs = [
                (xs[j], xs[j - 1])
                for j in range(max(0, i - 15), i + 1)
                if j >= 1
            ]
            n = len(pairs)
            if n < 3:
                expect[(u, eid)] = None
                continue
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxx = sum(p[0] ** 2 for p in pairs)
            syy = sum(p[1] ** 2 for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            expect[(u, eid)] = (
                (n * sxy - sx * sy) / math.sqrt(den) if den > 0 else None
            )
    got = REGISTRY["rolling_autocorr_q"].fn(spark, SF_SMALL).collect()
    assert len(got) == len(expect)
    for r in got:
        want = expect[(r["user_id"], r["event_id"])]
        if want is None:
            assert r["corr"] is None
        else:
            assert r["corr"] == pytest.approx(want, abs=1e-6)


def test_stl_decompose_q_matches_bruteforce(spark):
    """Additive decomposition from the definition: daily mean → ±3-day
    moving-average trend → day-of-week mean seasonal → residual."""
    from datetime import date

    daily: dict = defaultdict(list)
    for _, ts, _, v, etype in _events():
        if etype == "view":
            daily[ts.date()].append(v)
    days = sorted(daily)
    anchor = date(2024, 1, 1)
    m = {d: _q6(sum(vs) / len(vs)) for d, vs in daily.items()}
    trend = {}
    for i, d in enumerate(days):
        wnd = days[max(0, i - 3) : i + 4]
        trend[d] = _q6(sum(m[x] for x in wnd) / len(wnd))
    bydow: dict = defaultdict(list)
    for d in days:
        bydow[(d - anchor).days % 7].append(m[d] - trend[d])
    seasonal = {
        dow: _q6(sum(vs) / len(vs)) for dow, vs in bydow.items()
    }
    got = REGISTRY["stl_decompose_q"].fn(spark, SF_SMALL).collect()
    assert len(got) == len(days)
    for r in got:
        d = r["day"]
        s = seasonal[(d - anchor).days % 7]
        assert r["daily_mean"] == pytest.approx(m[d], abs=2e-4)
        assert r["trend"] == pytest.approx(trend[d], abs=2e-4)
        assert r["seasonal"] == pytest.approx(s, abs=2e-4)
        assert r["residual"] == pytest.approx(
            m[d] - trend[d] - s, abs=3e-4
        )


def test_maxsim_q_matches_bruteforce(spark):
    """ColBERT-style MaxSim from the definition: per (query-passage,
    doc-passage, query-token) best rounded cosine, summed per doc,
    top-5 per query."""
    ids, X, _ = _embs()
    pid = {i: i // 10 for i in ids}
    vec = dict(zip(ids, X))
    qtoks = [(i, vec[i]) for i in ids if pid[i] < 2]
    docs: dict = defaultdict(list)
    for i in ids:
        if pid[i] >= 2:
            docs[pid[i]].append(vec[i])
    scored: dict = {}
    for qid in {pid[i] for i, _ in qtoks}:
        toks = [v for i, v in qtoks if pid[i] == qid]
        for did, dvs in docs.items():
            total = Decimal(0)
            for t in toks:
                best = max(
                    round(
                        float(
                            t @ d / (np.linalg.norm(t) * np.linalg.norm(d))
                        ),
                        4,
                    )
                    for d in dvs
                )
                total += Decimal(repr(best))
            scored[(qid, did)] = round(float(total), 4)
    topk = defaultdict(list)
    for (qid, did), s in scored.items():
        topk[qid].append((did, s))
    expect = {}
    for qid, lst in topk.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        expect[qid] = lst[:5]
    got = REGISTRY["maxsim_q"].fn(spark, SF_SMALL).collect()
    byq = defaultdict(list)
    for r in got:
        byq[r["qid"]].append((r["rn"], r["did"], r["maxsim"]))
    assert set(byq) == set(expect)
    for qid, lst in byq.items():
        lst.sort()
        assert [(d, s) for _, d, s in lst] == [
            (d, pytest.approx(s, abs=1.1e-4)) for d, s in expect[qid]
        ]


def test_degree_powerlaw_q_matches_bruteforce(spark):
    """Hill tail-index estimator from the definition over the
    co-purchase degree distribution (dmin=2)."""
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM read_parquet('{SF_SMALL}/lineitem.parquet') a
        JOIN read_parquet('{SF_SMALL}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    deg: dict = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    tail = [d for d in deg.values() if d >= 2]
    logsum = sum(math.log(d / 2.0) for d in tail)
    row = REGISTRY["degree_powerlaw_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_tail"] == len(tail)
    assert row["d_max"] == max(tail)
    if logsum > 0:
        assert row["alpha_hill"] == pytest.approx(
            1.0 + len(tail) / logsum, abs=1e-5
        )
    else:
        assert row["alpha_hill"] is None


def test_event_paths_q_matches_bruteforce(spark):
    """Length-3 event-type path counts from the definition (per-user
    stream order by ts, event_id), top 20."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, _, etype in _events():
        streams[u].append(etype)
    counts: dict = defaultdict(int)
    for seq in streams.values():
        for i in range(len(seq) - 2):
            counts[(seq[i], seq[i + 1], seq[i + 2])] += 1
    expect = sorted(
        ((n, e1, e2, e3) for (e1, e2, e3), n in counts.items()),
        key=lambda t: (-t[0], t[1], t[2], t[3]),
    )[:20]
    got = [
        (r["n"], r["e1"], r["e2"], r["e3"])
        for r in REGISTRY["event_paths_q"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expect


def _km_model_numpy():
    """Replicate the shared 2-round Lloyd model: 4 lowest-id init, one
    assign (rounded d2, first-min tiebreak) + decimal-rounded mean
    recompute, then the eval-frame distances."""
    ids, X, labels = _embs()
    C = X[:4].copy()  # ids are sorted ascending

    d2 = np.round(
        (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :],
        6,
    )
    assign = d2.argmin(1)
    C2 = np.empty_like(C)
    for c in range(4):
        members = X[assign == c]
        assert len(members), "cluster emptied in brute-force replica"
        C2[c] = [_q6(v) for v in members.mean(0)]
    # eval distances: sequential zip_with fold then round 6
    D = np.round(
        ((X[:, None, :] - C2[None, :, :]) ** 2).sum(2), 6
    )
    own = D.argmin(1)
    d_own = D[np.arange(len(X)), own]
    d_other = np.where(
        np.eye(4, dtype=bool)[own], np.inf, D
    ).min(1)
    return ids, X, labels, C2, own, d_own, d_other


def test_silhouette_q_matches_bruteforce(spark):
    """Centroid-based silhouette recomputed from the replica model."""
    _, X, _, _, own, d_own, d_other = _km_model_numpy()
    da, db = np.sqrt(d_own), np.sqrt(d_other)
    denom = np.maximum(da, db)
    s = np.where(denom > 0, (db - da) / np.where(denom > 0, denom, 1), 0.0)
    expect_n = {c: int((own == c).sum()) for c in range(4)}
    expect_s = {c: float(s[own == c].mean()) for c in range(4)}
    rows = REGISTRY["silhouette_q"].fn(spark, SF_SMALL).collect()
    assert {r["cluster"]: r["n"] for r in rows} == expect_n
    for r in rows:
        assert r["mean_silhouette"] == pytest.approx(
            expect_s[r["cluster"]], abs=2e-6
        )


def test_calinski_harabasz_q_matches_bruteforce(spark):
    """CH index recomputed from the replica model: W from own-centroid
    distances, B from cluster sizes x centroid-to-global-mean distances."""
    _, X, _, C2, own, d_own, _ = _km_model_numpy()
    n = len(X)
    wss = float(d_own.sum())
    g = np.array([_q6(v) for v in X.mean(0)])
    bss = sum(
        int((own == c).sum()) * round(float(((C2[c] - g) ** 2).sum()), 6)
        for c in range(4)
    )
    row = REGISTRY["calinski_harabasz_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n"] == n
    assert row["wss"] == pytest.approx(wss, abs=2e-4)
    assert row["bss"] == pytest.approx(bss, abs=2e-4)
    assert row["ch_index"] == pytest.approx(
        (bss / 3) / (wss / (n - 4)), abs=2e-5
    )


def test_attribution_q_matches_bruteforce(spark):
    """Last-touch attribution from the definition: per purchase, the
    latest strictly-earlier non-purchase event of the same user within
    7 days, ties to the larger event_id."""
    streams: dict[int, list] = defaultdict(list)
    for u, ts, eid, _, etype in _events():
        streams[u].append((ts, eid, etype))
    expect = {}
    for u, rows in streams.items():
        for ts, eid, etype in rows:
            if etype != "purchase":
                continue
            cands = [
                (ts2, eid2, et2)
                for ts2, eid2, et2 in rows
                if et2 != "purchase"
                and ts2 < ts
                and (ts - ts2).total_seconds() <= 7 * 86400
            ]
            if cands:
                bts, beid, bet = max(cands)
                us = int(round((ts - bts).total_seconds() * 1_000_000))
                expect[eid] = (u, beid, bet, us)
            else:
                expect[eid] = (u, None, None, None)
    got = REGISTRY["attribution_q"].fn(spark, SF_SMALL).collect()
    assert {r["event_id"] for r in got} == set(expect)
    for r in got:
        u, beid, bet, us = expect[r["event_id"]]
        assert (r["user_id"], r["src_event_id"], r["src_type"]) == (
            u, beid, bet,
        )
        assert r["us_before"] == us


def test_leakage_check_q_matches_bruteforce(spark):
    """Train/test user-span leakage counts from first principles."""
    from datetime import datetime

    cut = datetime(2024, 1, 16)
    spans: dict[int, list] = {}
    for u, ts, _, _, _ in _events():
        lo, hi = spans.get(u, (ts, ts)) or (ts, ts)
        spans[u] = (min(lo, ts), max(hi, ts))
    n = len(spans)
    train_only = sum(1 for lo, hi in spans.values() if hi < cut)
    test_only = sum(1 for lo, hi in spans.values() if lo >= cut)
    spanning = sum(
        1 for lo, hi in spans.values() if lo < cut and hi >= cut
    )
    row = REGISTRY["leakage_check_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_users"] == n
    assert row["train_only"] == train_only
    assert row["test_only"] == test_only
    assert row["spanning"] == spanning
    assert row["leak_rate"] == pytest.approx(spanning / n, abs=1e-6)


def test_sentence_stats_q_matches_bruteforce(spark):
    """Sentence segmentation stats from the definition: split on
    [.!?]+ runs, trim SPACES (the engines' trim), drop empties."""
    import re

    expect = {}
    for doc_id, text, _ in _bf_docs():
        sents = [
            s.strip(" ") for s in re.split(r"[.!?]+", text or "")
        ]
        sents = [s for s in sents if s]
        lens = [len(s) for s in sents]
        expect[doc_id] = (
            len(sents),
            max(lens) if lens else 0,
            sum(lens) / max(len(sents), 1),
        )
    rows = REGISTRY["sentence_stats_q"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in rows} == set(expect)
    for r in rows:
        n, mx, mean = expect[r["doc_id"]]
        assert r["n_sentences"] == n
        assert r["max_sentence_chars"] == mx
        assert r["mean_sentence_chars"] == pytest.approx(mean, abs=1e-4)


def test_lexical_stats_q_matches_bruteforce(spark):
    """Per-source type/token counts, hapax ratio, and Church-Gale
    burstiness (mean cf/df per type) from raw counts."""
    from collections import Counter

    cf: dict = defaultdict(Counter)
    dfc: dict = defaultdict(lambda: defaultdict(set))
    for doc_id, text, source in _bf_docs():
        for w in _bf_tok(text):
            cf[source][w] += 1
            dfc[source][w].add(doc_id)
    rows = REGISTRY["lexical_stats_q"].fn(spark, SF_SMALL).collect()
    assert {r["source"] for r in rows} == set(cf)
    for r in rows:
        s = r["source"]
        types = len(cf[s])
        assert r["n_types"] == types
        assert r["n_tokens"] == sum(cf[s].values())
        hapax = sum(1 for c in cf[s].values() if c == 1)
        assert r["hapax_ratio"] == pytest.approx(hapax / types, abs=1e-6)
        burst = sum(c / len(dfc[s][w]) for w, c in cf[s].items()) / types
        assert r["mean_burstiness"] == pytest.approx(burst, abs=2e-6)


def test_template_prefix_q_matches_bruteforce(spark):
    """Shared-8-token-prefix groups recomputed with an independent
    poly-hash implementation."""
    groups: dict = defaultdict(list)
    for doc_id, text, source in _bf_docs():
        toks = _bf_tok(text)
        if len(toks) < 8:
            continue
        groups[_bf_poly(" ".join(toks[:8]))].append((doc_id, source))
    expect = {
        h: (
            len(ms),
            len({s for _, s in ms}),
            min(d for d, _ in ms),
        )
        for h, ms in groups.items()
        if len(ms) >= 2
    }
    rows = REGISTRY["template_prefix_q"].fn(spark, SF_SMALL).collect()
    got = {
        r["prefix_hash"]: (r["n_docs"], r["n_sources"], r["sample_doc"])
        for r in rows
    }
    assert got == expect


def test_kneser_ney_q_matches_bruteforce(spark):
    """Interpolated Kneser-Ney top-30 replayed from raw bigram counts:
    P(w2|w1) = (c-0.75)/c(w1.) + 0.75*N1+(w1,.)/c(w1.) * N1+(.,w2)/T."""
    from collections import Counter

    docs = _bf_docs()
    c12: Counter = Counter()
    for _, text, _ in docs:
        ts = _bf_tok(text)
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1fwd: Counter = Counter()
    n1bwd: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1fwd[a] += 1
        n1bwd[b] += 1
    T = len(c12)
    scored = sorted(
        (
            (-c, a, b,
             (c - 0.75) / c1[a] + 0.75 * n1fwd[a] / c1[a] * (n1bwd[b] / T))
            for (a, b), c in c12.items()
        )
    )[:30]
    got = REGISTRY["kneser_ney_q"].fn(spark, SF_SMALL).collect()
    assert [(r["w1"], r["w2"], r["c"]) for r in got] == [
        (a, b, -nc) for nc, a, b, _ in scored
    ]
    for r, (_, _, _, pkn) in zip(got, scored):
        assert r["pkn"] == pytest.approx(pkn, abs=2e-6)


def test_bloom_prune_join_q_matches_bruteforce(spark):
    """Bloom semi-join reduction replayed with an independent hash
    implementation: two positions per dim key, fact rows surviving iff
    both positions set, exact join for the matched set."""
    from decimal import ROUND_HALF_UP as RH

    con = duckdb.connect()
    dim = [
        r[0]
        for r in con.execute(
            f"SELECT s_suppkey FROM "
            f"read_parquet('{SF_SMALL}/supplier.parquet') "
            f"WHERE s_nationkey = 3"
        ).fetchall()
    ]
    M = 1_000_000_007

    def pos2(key: int):
        h = _bf_poly(str(key))
        return h % 4096, ((h * 1000003 + 12345) % M) % 4096

    bits = set()
    for k in dim:
        p1, p2 = pos2(k)
        bits.add(p1)
        bits.add(p2)
    fact = con.execute(
        f"SELECT l_suppkey, CAST(l_extendedprice AS DOUBLE) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    dimset = set(dim)
    n_cand = n_matched = 0
    rev = Decimal(0)
    for k, p in fact:
        p1, p2 = pos2(k)
        if p1 in bits and p2 in bits:
            n_cand += 1
            if k in dimset:
                n_matched += 1
                rev += Decimal(repr(p)).quantize(Decimal("1e-4"), RH)
    row = REGISTRY["bloom_prune_join_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_candidates"] == n_cand
    assert row["n_matched"] == n_matched
    assert row["revenue"] == pytest.approx(float(rev), abs=0.01)
    # the filter must never drop a true match (no false negatives)
    assert n_matched == sum(1 for k, _ in fact if k in dimset)


def test_poisson_bootstrap_q_matches_bruteforce(spark):
    """Deterministic Poisson(1) bootstrap replayed from the definition:
    per (doc, replica) weight = inverse-CDF thresholds on the
    content-keyed uniform poly(doc_id:b) % 10000 / 10000; replica mean =
    integer-sum ratio; per-source mean/min/max over the 32 replicas."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, n_chars FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    thresholds = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340]

    def pois_w(u: float) -> int:
        for w, t in enumerate(thresholds):
            if u < t:
                return w
        return 5

    sums: dict = defaultdict(lambda: [0, 0])  # (source, b) -> [sum_wx, sum_w]
    for doc_id, source, n_chars in docs:
        for b in range(32):
            u = (_bf_poly(f"{doc_id}:{b}") % 10000) / 10000
            w = pois_w(u)
            cell = sums[(source, b)]
            cell[0] += w * n_chars
            cell[1] += w
    means: dict = defaultdict(list)
    for (source, _b), (swx, sw) in sums.items():
        if sw > 0:
            means[source].append(swx / sw)
    rows = REGISTRY["poisson_bootstrap_q"].fn(spark, SF_SMALL).collect()
    assert {r["source"] for r in rows} == set(means)
    for r in rows:
        ms = means[r["source"]]
        assert r["n_replicas"] == len(ms)
        assert r["boot_mean"] == pytest.approx(sum(ms) / len(ms), abs=2e-4)
        assert r["boot_lo"] == pytest.approx(min(ms), abs=2e-4)
        assert r["boot_hi"] == pytest.approx(max(ms), abs=2e-4)


def test_clustering_coeff_q_matches_bruteforce(spark):
    """Local clustering coefficient from the definition: co-purchase
    adjacency sets, per-node triangle counts by common-neighbor
    intersection, coeff = 2T / (d(d-1))."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    baskets: dict = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    adj: dict = defaultdict(set)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                adj[a].add(b)
                adj[b].add(a)
    tri: dict = defaultdict(int)
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    expect = sorted(
        (
            (n, len(adj[n]), tri.get(n, 0))
            for n in adj
        ),
        key=lambda x: (-x[2], x[0]),
    )[:30]
    got = REGISTRY["clustering_coeff_q"].fn(spark, SF_SMALL).collect()
    assert [(r["node"], r["degree"], r["n_triangles"]) for r in got] == [
        (n, d, t) for n, d, t in expect
    ]
    for r, (n, d, t) in zip(got, expect):
        want = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        assert r["coeff"] == pytest.approx(want, abs=2e-6)


def test_cluster_nmi_q_matches_bruteforce(spark):
    """NMI + purity recomputed from the replica k-means model's
    assignments against the ground-truth labels."""
    _, _, labels, _, own, _, _ = _km_model_numpy()
    n = len(labels)
    cells: dict = defaultdict(int)
    for c, lb in zip(own, labels):
        cells[(int(c), lb)] += 1
    nc: dict = defaultdict(int)
    nl: dict = defaultdict(int)
    for (c, lb), v in cells.items():
        nc[c] += v
        nl[lb] += v
    mi = sum(
        (v / n) * math.log(v * n / (nc[c] * nl[lb]))
        for (c, lb), v in cells.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in nc.values())
    hl = -sum((v / n) * math.log(v / n) for v in nl.values())
    purity = (
        sum(
            max(v for (c2, _), v in cells.items() if c2 == c)
            for c in nc
        )
        / n
    )
    row = REGISTRY["cluster_nmi_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n"] == n
    assert row["nmi"] == pytest.approx(mi / math.sqrt(hc * hl), abs=2e-6)
    assert row["purity"] == pytest.approx(purity, abs=2e-6)
