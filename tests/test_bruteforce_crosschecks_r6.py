"""Third-implementation cross-checks for the round-6 driver window.

Same contract as tests/test_bruteforce_crosschecks.py: the DuckDB-oracle
gate proves Spark and the oracle AGREE, but both are written from the
same design, so a shared misconception passes the gate (round 4's
triangle bug, round 5's chi-square bug). Each test here recomputes the
metric a THIRD way — plain Python / numpy over the raw parquet, written
independently from the definition — and requires the registered query to
match, BEFORE these queries get their first driver row (VERDICT r5 #6).
"""

import itertools
import math
from collections import Counter, defaultdict

import duckdb
import pytest

from iniz_exporters_spark.queries import REGISTRY

# Historical-round replica (VERDICT r12 #7): covers code frozen since its
# round; runs in the full close-gate suite but is excluded from the
# mid-round fast path (pytest -m 'not slow').
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.001"

M = 1_000_000_007


def _tok(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _poly(s: str) -> int:
    """list_reduce poly hash: first char code seeds the accumulator."""
    if not s:
        return 0
    codes = [ord(c) for c in s]
    h = codes[0]
    for c in codes[1:]:
        h = (h * 31 + c) % M
    return h


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def test_triangle_count_q_matches_bruteforce(spark):
    """Triangles from the definition: adjacency-set intersection per edge,
    divided by 3 — no degree orientation, no wedge join."""
    con = duckdb.connect()
    edges = set(
        con.execute(
            f"""
            SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM read_parquet('{SF_SMALL}/lineitem.parquet') a
            JOIN read_parquet('{SF_SMALL}/lineitem.parquet') b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            """
        ).fetchall()
    )
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri3 = sum(len(adj[a] & adj[b]) for a, b in edges)
    assert tri3 % 3 == 0
    n_tri = tri3 // 3
    n_wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))
    row = REGISTRY["triangle_count_q"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == n_wedges
    assert row["n_triangles"] == n_tri
    assert row["clustering"] == pytest.approx(
        3.0 * n_tri / n_wedges if n_wedges else 0.0, abs=1e-4
    )


def test_ivm_merge_counts_matches_bruteforce(spark):
    """Apply the synthetic changelog with a plain dict: upserts for
    key%5==0, deletes for key%10==0 (later seq wins), inserts for
    key%1000==1 shifted by 10M; count surviving orders per customer."""
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_orderkey, o_custkey FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet')"
    ).fetchall()
    table = {k: c for k, c in orders}
    for k, c in orders:
        if k % 5 == 0:
            table[k] = c  # upsert (same values here)
    for k, _ in orders:
        if k % 10 == 0:
            table.pop(k, None)  # delete wins at seq 2
    for k, c in orders:
        if k % 1000 == 1:
            table[k + 10_000_000] = c
    expect = Counter(table.values())
    got = {
        r["o_custkey"]: r["n_orders"]
        for r in REGISTRY["ivm_merge_counts"].fn(spark, SF_SMALL).collect()
    }
    assert got == dict(expect)


def test_char_entropy_q_matches_bruteforce(spark):
    """Shannon entropy from the definition: -sum p log2 p over character
    frequencies."""
    expect = {}
    for doc_id, text, _ in _docs():
        if not text:
            continue
        n = len(text)
        ent = -sum(
            (c / n) * math.log2(c / n) for c in Counter(text).values()
        )
        expect[doc_id] = (n, ent)
    rows = REGISTRY["char_entropy_q"].fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in rows} == set(expect)
    for r in rows:
        n, ent = expect[r["doc_id"]]
        assert r["n_chars"] == n
        assert r["char_entropy"] == pytest.approx(ent, abs=2e-6)


def test_bigram_logprob_q_matches_bruteforce(spark):
    """Add-1 bigram LM scored from first principles: global pair/unigram
    counts, vocab from ALL docs, per-doc sum log2((c12+1)/(c1+V))."""
    docs = _docs()
    toks = {d: _tok(t) for d, t, _ in docs}
    vocab = {w for ts in toks.values() for w in ts}
    c12: Counter = Counter()
    c1: Counter = Counter()
    for ts in toks.values():
        for w1, w2 in zip(ts, ts[1:]):
            c12[(w1, w2)] += 1
            c1[w1] += 1
    V = len(vocab)
    rows = REGISTRY["bigram_logprob_q"].fn(spark, SF_SMALL).collect()
    expect_ids = {d for d, ts in toks.items() if len(ts) >= 2}
    assert {r["doc_id"] for r in rows} == expect_ids
    for r in rows:
        ts = toks[r["doc_id"]]
        pairs = list(zip(ts, ts[1:]))
        lp = sum(
            math.log2((c12[p] + 1) / (c1[p[0]] + V)) for p in pairs
        )
        assert r["n_bigrams"] == len(pairs)
        assert r["logprob"] == pytest.approx(lp, abs=2e-6)


def test_dsir_weights_q_matches_bruteforce(spark):
    """DSIR importance weights from the definition: add-1 token
    log-ratios between target (src0-2) and pool distributions, averaged
    over each pool doc's token INSTANCES."""
    docs = _docs()
    tgt = {"src0", "src1", "src2"}
    pool_toks = {d: _tok(t) for d, t, s in docs if s not in tgt}
    tgt_toks = [w for d, t, s in docs if s in tgt for w in _tok(t)]
    cp: Counter = Counter(w for ts in pool_toks.values() for w in ts)
    ct: Counter = Counter(tgt_toks)
    vocab = set(cp) | set(ct)
    n_pool, n_tgt, V = sum(cp.values()), sum(ct.values()), len(vocab)
    lr = {
        w: math.log((ct[w] + 1) / (n_tgt + V))
        - math.log((cp[w] + 1) / (n_pool + V))
        for w in vocab
    }
    rows = REGISTRY["dsir_weights_q"].fn(spark, SF_SMALL).collect()
    expect_ids = {d for d, ts in pool_toks.items() if ts}
    assert {r["doc_id"] for r in rows} == expect_ids
    for r in rows:
        ts = pool_toks[r["doc_id"]]
        assert r["n_tokens"] == len(ts)
        assert r["avg_logratio"] == pytest.approx(
            sum(lr[w] for w in ts) / len(ts), abs=2e-6
        )


def test_containment_pairs_q_matches_bruteforce(spark):
    """Asymmetric containment |A∩B|/|A| over distinct 5-char shingle-hash
    sets, probes doc_id%25==11, threshold 0.8."""
    shingles = {}
    for doc_id, text, _ in _docs():
        t = text or ""
        if len(t) <= 5:
            hs = {_poly(t)} if t else set()
        else:
            hs = {_poly(t[i : i + 5]) for i in range(len(t) - 4)}
        shingles[doc_id] = hs
    expect = {}
    for pid, phs in shingles.items():
        if pid % 25 != 11 or not phs:
            continue
        for hid, hhs in shingles.items():
            if hid % 25 == 11:
                continue
            shared = len(phs & hhs)
            if shared * 5 >= 4 * len(phs):
                expect[(pid, hid)] = shared / len(phs)
    rows = REGISTRY["containment_pairs_q"].fn(spark, SF_SMALL).collect()
    got = {(r["probe_id"], r["host_id"]): r["containment"] for r in rows}
    assert set(got) == set(expect)
    for k, v in got.items():
        assert v == pytest.approx(expect[k], abs=1e-4)


def test_quantile_bins_matches_bruteforce(spark):
    """Exact NTILE(10) decile bins recomputed by sorting the customer
    dimension in Python — pins the distributed global_ntile path end to
    end (VERDICT r5 #7)."""
    con = duckdb.connect()
    custs = con.execute(
        f"SELECT c_acctbal, c_custkey FROM "
        f"read_parquet('{SF_SMALL}/customer.parquet') "
        f"ORDER BY c_acctbal, c_custkey"
    ).fetchall()
    n = len(custs)
    q, r = divmod(n, 10)
    bins: dict[int, list[float]] = defaultdict(list)
    pos = 0
    for b in range(1, 11):
        size = q + (1 if b <= r else 0)
        for bal, _ in custs[pos : pos + size]:
            bins[b].append(float(bal))
        pos += size
    rows = REGISTRY["quantile_bins"].fn(spark, SF_SMALL).collect()
    assert {r2["bin"] for r2 in rows} == set(bins)
    for r2 in rows:
        vals = bins[r2["bin"]]
        assert r2["n"] == len(vals)
        assert float(r2["lo"]) == pytest.approx(min(vals), abs=1e-6)
        assert float(r2["hi"]) == pytest.approx(max(vals), abs=1e-6)


def test_embedding_covariance_q_matches_numpy(spark):
    """Population covariance of the first 8 dims recomputed with numpy
    (two-pass, mean-centered) — independent of both engines' one-pass
    decimal-moment formulation."""
    import numpy as np

    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    ).fetchall()
    X = np.array([v[0][:8] for v in vecs], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    C = (Xc.T @ Xc) / len(X)  # population
    rows = REGISTRY["embedding_covariance_q"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 36  # upper triangle of 8x8
    for r in rows:
        assert r["cov"] == pytest.approx(C[r["i"], r["j"]], abs=2e-6)


def test_pca_project_check_contract_and_trace(spark):
    """The PCA contract booleans must hold and the reported trace must
    equal numpy's covariance trace."""
    import numpy as np

    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet')"
    ).fetchall()
    X = np.array([v[0][:8] for v in vecs], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    trace = float(np.trace((Xc.T @ Xc) / len(X)))
    rows = REGISTRY["pca_project_check"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["ordered_ok"] and r["var_ok"] and r["eigsum_ok"]
        assert r["trace_r"] == pytest.approx(trace, abs=2e-6)


def test_exact_median_in_approx_quantile_check_matches_python(spark):
    """exact_p50 recomputed with Python's interpolated median per
    returnflag; approx_ok must be True everywhere (the documented 2%
    bound contract)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    groups: dict[str, list[float]] = defaultdict(list)
    for rf, p in rows:
        groups[rf].append(p)

    def median_cont(vals: list[float]) -> float:
        vals = sorted(vals)
        n = len(vals)
        mid = (n - 1) / 2
        lo, hi = vals[int(mid)], vals[int(mid + 0.5)]
        return (lo + hi) / 2

    got = REGISTRY["approx_quantile_check"].fn(spark, SF_SMALL).collect()
    assert {r["l_returnflag"] for r in got} == set(groups)
    for r in got:
        assert r["approx_ok"] is True
        assert r["exact_p50"] == pytest.approx(
            median_cont(groups[r["l_returnflag"]]), abs=0.02
        )


def test_embedding_dim_stats_and_whitened_norm_match_numpy(spark):
    """Per-dimension mean/std and the whitened (z-scored) L2 norm
    recomputed with numpy population statistics."""
    import numpy as np

    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMALL}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in data]
    X = np.array([r[1] for r in data], dtype=np.float64)
    mean, std = X.mean(axis=0), X.std(axis=0)  # population

    stats = REGISTRY["embedding_dim_stats"].fn(spark, SF_SMALL).collect()
    assert len(stats) == X.shape[1]
    for r in stats:
        assert r["n"] == len(ids)
        assert r["mean"] == pytest.approx(mean[r["pos"]], abs=2e-4)
        assert r["std"] == pytest.approx(std[r["pos"]], abs=2e-4)

    wn = np.sqrt((((X - mean) / std) ** 2).sum(axis=1))
    expect = dict(zip(ids, wn))
    rows = REGISTRY["whitened_norm_q"].fn(spark, SF_SMALL).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert r["whitened_norm"] == pytest.approx(
            expect[r["vec_id"]], abs=2e-4
        )
