"""Edge-input guards for the p12 batch (hostile-input probe, the same
review discipline as test_p10/p11_edge_guards): the synthetic corpus
never produces zero-token documents, so the oracle gate alone cannot
regress-test them — a hostile punctuation-only doc injects through the
Catalog seam instead.

Probe findings for this batch: no live defect — every query absorbs
the zero-token doc by construction (the memorization/dirty-token seed
builders filter on token count BEFORE exploding; tokenizer parity
counts zero tokens but nonzero bytes; the C4/Gopher composition emits
the doc with keep=0 per the emit-every-doc rule; the phash payload is
non-empty by the '#' prefix so the image path always hashes). These
tests pin that behavior.
"""

import pytest
import re

import pyspark.sql.functions as F

from iniz_exporters_spark.catalog import Catalog
from iniz_exporters_spark.queries import REGISTRY
from iniz_exporters_spark.queries.p11 import _ESDC_K
from iniz_exporters_spark.queries.p12 import _MMD_K

SF_SMALL = "/root/testdata/sf0.001"

# punctuation-only text: zero regex tokens, nonzero bytes; lang 'en' so
# it lands in the parity baseline group
_HOSTILE_DOC = (1_000_000_000, "!!! ??? ...", "en", "src0", 11)


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1000000007
    return h


def _with_hostile_doc(spark, monkeypatch):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "documents":
            extra = spark.createDataFrame([_HOSTILE_DOC], df.schema)
            return df.unionByName(extra)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)


def test_extractable_memorization_ignores_zero_token_doc(
    spark, monkeypatch
):
    base = {
        r["dup_level"]: tuple(r)
        for r in REGISTRY["extractable_memorization_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    hostile = {
        r["dup_level"]: tuple(r)
        for r in REGISTRY["extractable_memorization_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    # zero tokens -> zero prefixes: the curve is unchanged
    assert hostile == base


def test_tokenizer_parity_counts_bytes_of_token_free_doc(
    spark, monkeypatch
):
    base = {
        r["lang"]: r
        for r in REGISTRY["tokenizer_parity_q"].fn(spark, SF_SMALL).collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    hostile = {
        r["lang"]: r
        for r in REGISTRY["tokenizer_parity_q"].fn(spark, SF_SMALL).collect()
    }
    assert hostile["en"]["n_docs"] == base["en"]["n_docs"] + 1
    # BPE-ish tokens ARE produced for punctuation runs ( ?[^A-Za-z0-9\s']+
    # arm) — byte and token counts must both move, and no premium is NULL
    assert hostile["en"]["n_bytes"] == base["en"]["n_bytes"] + 11
    assert hostile["en"]["n_bpe_tokens"] > base["en"]["n_bpe_tokens"]
    assert all(r["premium_vs_en"] is not None for r in hostile.values())


def test_multimodal_decontam_hashes_punctuation_payload(
    spark, monkeypatch
):
    _with_hostile_doc(spark, monkeypatch)
    rows = (
        REGISTRY["multimodal_decontam_q"].fn(spark, SF_SMALL).collect()
    )
    n_docs = 500 + 1
    assert len(rows) == n_docs - _MMD_K
    assert all(0 <= r["hamming"] <= 64 for r in rows)


def test_filter_agreement_counts_zero_token_doc_as_neither(
    spark, monkeypatch
):
    (base,) = REGISTRY["filter_agreement_q"].fn(spark, SF_SMALL).collect()
    _with_hostile_doc(spark, monkeypatch)
    (hostile,) = (
        REGISTRY["filter_agreement_q"].fn(spark, SF_SMALL).collect()
    )
    assert hostile["n_docs"] == base["n_docs"] + 1
    assert hostile["neither"] == base["neither"] + 1
    assert (
        hostile["both_keep"]
        + hostile["only_gopher"]
        + hostile["only_c4"]
        + hostile["neither"]
        == hostile["n_docs"]
    )


def test_eval_dirty_tokens_absorbs_zero_token_doc(spark, monkeypatch):
    # where does the hostile id hash-rank for the 'esd:' suite key?
    import duckdb

    ids = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        .fetchall()
    ] + [_HOSTILE_DOC[0]]
    order = sorted(ids, key=lambda d: (_poly(f"esd:{d}"), d))
    in_suite = _HOSTILE_DOC[0] in set(order[:_ESDC_K])

    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["eval_dirty_tokens_q"].fn(spark, SF_SMALL).collect()
    }
    assert len(rows) == _ESDC_K
    if in_suite:
        r = rows[_HOSTILE_DOC[0]]
        assert r["n_tokens"] == 0
        assert r["dirty_tokens"] == 0
        assert r["dirty_share"] == 0.0
        assert r["heavily_contaminated"] is False
    else:
        assert _HOSTILE_DOC[0] not in rows
    # invariants hold for every suite row either way
    for r in rows.values():
        assert 0 <= r["dirty_tokens"] <= max(r["n_tokens"], 0)
        assert 0.0 <= r["dirty_share"] <= 1.0


@pytest.mark.slow  # r15 gate budget: covered by a cheaper fast sibling; runs at round close (--runslow)
def test_cross_source_matrix_ignores_zero_token_doc(spark, monkeypatch):
    base = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in REGISTRY["cross_source_dup_matrix_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    hostile = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in REGISTRY["cross_source_dup_matrix_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    # zero tokens -> zero grams: the matrix is unchanged
    assert hostile == base


def test_boilerplate_fraction_emits_zero_token_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["boilerplate_fraction_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    # emit-every-doc rule: the hostile doc appears, all-zero, unflagged
    r = rows[_HOSTILE_DOC[0]]
    assert r["n_tokens"] == 0
    assert r["boilerplate_tokens"] == 0
    assert r["boilerplate_share"] == 0.0
    assert r["mostly_boilerplate"] is False


_HOSTILE_VEC = (999_000_001, [0.0] * 64, 3)


def _with_hostile_vec(spark, monkeypatch):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "embeddings":
            extra = spark.createDataFrame(
                [(_HOSTILE_VEC[0], [float(x) for x in _HOSTILE_VEC[1]],
                  _HOSTILE_VEC[2])],
                df.schema,
            )
            return df.unionByName(extra)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)


def test_knn_loo_ann_absorbs_zero_vector(spark, monkeypatch):
    """A zero vector has sign-bucket 15 under >=0 hyperplanes (every
    dimension counts as non-negative); it must join its bucket and
    vote like any other row — no error, label counts shift by one."""
    base = {
        r["label"]: r["n_vectors"]
        for r in REGISTRY["knn_loo_ann_q"].fn(spark, SF_SMALL).collect()
    }
    _with_hostile_vec(spark, monkeypatch)
    hostile = {
        r["label"]: r["n_vectors"]
        for r in REGISTRY["knn_loo_ann_q"].fn(spark, SF_SMALL).collect()
    }
    assert sum(hostile.values()) == sum(base.values()) + 1
    assert hostile[_HOSTILE_VEC[2]] == base.get(_HOSTILE_VEC[2], 0) + 1


def test_doc_memorization_risk_emits_zero_token_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["doc_memorization_risk_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    r = rows[_HOSTILE_DOC[0]]
    assert r["n_prompts"] == 0
    assert r["n_risky"] == 0
    assert r["risk_share"] == 0.0
    assert r["at_risk"] is False


def test_quality_psi_counts_zero_token_doc(spark, monkeypatch):
    """A zero-token doc scores sigmoid(0) = 0.5 -> bucket 5; PSI stays
    finite (Jeffreys smoothing) and the source's n_docs increments."""
    (base,) = [
        r
        for r in REGISTRY["quality_psi_drift_q"].fn(spark, SF_SMALL).collect()
        if r["source"] == _HOSTILE_DOC[3]
    ]
    _with_hostile_doc(spark, monkeypatch)
    (hostile,) = [
        r
        for r in REGISTRY["quality_psi_drift_q"].fn(spark, SF_SMALL).collect()
        if r["source"] == _HOSTILE_DOC[3]
    ]
    assert hostile["n_docs"] == base["n_docs"] + 1
    assert hostile["psi"] is not None
    assert hostile["tier"] in ("stable", "moderate", "shifted")
