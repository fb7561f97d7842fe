"""Third-implementation cross-checks for the round-10 additions.

Same contract as the r6-r9 files: plain-Python recomputation, independent
of both engines, so each query enters its driver window already
triple-verified (Spark plan, DuckDB oracle, this replica).
"""

import re
from collections import Counter

import duckdb

from iniz_exporters_spark.queries import REGISTRY

import pytest
# Historical-round replica (VERDICT r12 #7): covers code frozen since its
# round; runs in the full close-gate suite but is excluded from the
# mid-round fast path (pytest -m 'not slow').
pytestmark = pytest.mark.slow
from iniz_exporters_spark.queries.p09 import _GOPHER_STOPS as _STOPS_TUPLE

SF_SMALL = "/root/testdata/sf0.001"

# import the canonical list so the replica can't silently diverge from
# the query's stoplist
_GOPHER_STOPS = set(_STOPS_TUPLE)


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def test_gopher_rules_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["gopher_rules_q"].fn(spark, SF_SMALL).collect()
    }
    seen = 0
    for doc_id, text in _docs():
        toks = _tok(text)
        seen += 1
        n, sum_len = len(toks), sum(len(t) for t in toks)
        n_stop = sum(1 for t in toks if t in _GOPHER_STOPS)
        n_uniq = len(set(toks))
        # emit-every-doc rule (ADVICE r10): zero-token docs appear with
        # n_words=0, NULL ratios, and every flag false
        row = got[doc_id]
        assert row["n_words"] == n
        assert row["mean_word_len"] == (round(sum_len / n, 6) if n else None)
        assert row["stop_frac"] == (round(n_stop / n, 6) if n else None)
        assert row["uniq_frac"] == (round(n_uniq / n, 6) if n else None)
        assert row["word_count_ok"] == (50 <= n <= 100000)
        assert row["mean_len_ok"] == (n > 0 and 3 * n <= sum_len <= 10 * n)
        assert row["stop_ok"] == (n_stop >= 2)
        assert row["passes_all"] == (
            row["word_count_ok"] and row["mean_len_ok"] and row["stop_ok"]
        )
    assert len(got) == seen
    # the rules must discriminate on this corpus, not rubber-stamp it
    assert {r["passes_all"] for r in got.values()} == {True, False}


def test_rep_ngram_fractions_q_matches_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["rep_ngram_fractions_q"].fn(spark, SF_SMALL).collect()
    }
    for doc_id, text in _docs():
        toks = _tok(text)
        row = got[doc_id]
        assert row["n_tokens"] == len(toks)
        c2 = Counter(zip(toks, toks[1:]))
        c3 = Counter(zip(toks, toks[1:], toks[2:]))
        top2 = max(c2.values()) if c2 else 0
        top3 = max(c3.values()) if c3 else 0
        assert row["top2_count"] == top2
        assert row["top3_count"] == top3
        if toks:
            assert row["top2_frac"] == round(2 * top2 / len(toks), 6)
            assert row["top3_frac"] == round(3 * top3 / len(toks), 6)


def test_token_ngram_decontam_q_matches_bruteforce(spark):
    train_grams = set()
    test_grams = {}
    for doc_id, text in _docs():
        toks = _tok(text)
        grams = {
            " ".join(toks[i : i + 13]) for i in range(len(toks) - 12)
        }
        if doc_id % 50 == 0:
            test_grams[doc_id] = grams
        else:
            train_grams |= grams
    got = {
        r["doc_id"]: r
        for r in REGISTRY["token_ngram_decontam_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(test_grams)
    for doc_id, grams in test_grams.items():
        row = got[doc_id]
        hits = len(grams & train_grams)
        assert row["n_grams"] == len(grams)
        assert row["n_hits"] == hits
        assert row["is_contaminated"] == (hits > 0)


def test_split_doc_boundary_q_matches_bruteforce(spark):
    sufs, pres = {}, {}
    all_ids = []
    for doc_id, text in _docs():
        toks = _tok(text)
        all_ids.append(doc_id)
        if len(toks) >= 3:
            sufs[doc_id] = " ".join(toks[-3:])
            pres[doc_id] = " ".join(toks[:3])
    got = {
        r["doc_id"]: r
        for r in REGISTRY["split_doc_boundary_q"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(all_ids)
    link_total = 0
    for doc_id in all_ids:
        n_cont = sum(
            1
            for other, p in pres.items()
            if other != doc_id and sufs.get(doc_id) == p
        ) if doc_id in sufs else 0
        n_pred = sum(
            1
            for other, s in sufs.items()
            if other != doc_id and pres.get(doc_id) == s
        ) if doc_id in pres else 0
        row = got[doc_id]
        assert row["n_continuations"] == n_cont
        assert row["n_predecessors"] == n_pred
        assert row["has_boundary_link"] == (n_cont + n_pred > 0)
        link_total += n_cont
    assert link_total > 0  # the probe found 8 at sf0.001; keep it honest


def test_mixture_domain_weights_q_matches_bruteforce(spark):
    from decimal import Decimal

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    docs, toks = {}, {}
    for source, text in rows:
        docs[source] = docs.get(source, 0) + 1
        toks[source] = toks.get(source, 0) + len(_tok(text))
    total = sum(toks.values())
    w_raw = {
        s: Decimal(str(round((t / total) ** 0.3, 12))).quantize(
            Decimal("1.000000000000")
        )
        for s, t in toks.items()
    }
    wsum = sum(w_raw.values())
    got = {
        r["source"]: r
        for r in REGISTRY["mixture_domain_weights_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(docs)
    for s in docs:
        row = got[s]
        assert row["n_docs"] == docs[s]
        assert row["n_tokens"] == toks[s]
        assert row["token_share"] == round(toks[s] / total, 6)
        assert row["mix_weight"] == round(float(w_raw[s]) / float(wsum), 6)
    # small domains upweighted relative to token share
    shares = {s: toks[s] / total for s in toks}
    small = min(shares, key=shares.get)
    assert got[small]["mix_weight"] > got[small]["token_share"]
