"""Edge-input guards for the p11 batch (hostile-input probe, the same
review discipline as test_p10_edge_guards): the synthetic corpus never
produces zero-token documents or zero embedding vectors, so the oracle
gate alone cannot regress-test them — hostile rows inject through the
Catalog seam instead.

Found live by the probe: `embedding_decontam_q`'s cosine divided by a
zero norm product, which is a DIVIDE_BY_ZERO *error* under Spark ANSI
mode (not a quiet NaN). The guard makes a zero vector's cosine NULL in
both engines, ranks NULLS LAST explicitly (the engines' DESC defaults
differ), and COALESCEs the contamination flag to false.
"""

import pyspark.sql.functions as F

from iniz_exporters_spark.catalog import Catalog
from iniz_exporters_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"

_HOSTILE_DOC = (1_000_000_000, "!!! ??? ...", "en", "src0", 11)
# 999000000 content-hash-ranks ~500th of 501 → stays TRAIN-side;
# 1000000000 ranks 10th → enters the 32-vector SUITE. Both zero-vector
# placements are exercised below.
_HOSTILE_VEC_ID = 999_000_000
_HOSTILE_SUITE_VEC_ID = 1_000_000_000


def _with_hostile_doc(spark, monkeypatch):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "documents":
            extra = spark.createDataFrame([_HOSTILE_DOC], df.schema)
            return df.unionByName(extra)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)


def _with_zero_vector(spark, monkeypatch, vec_id):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "embeddings":
            z = spark.createDataFrame(
                [(vec_id, [0.0] * 64, 3)],
                "vec_id long, embedding array<double>, label int",
            ).select(
                "vec_id",
                F.col("embedding").cast(
                    df.schema["embedding"].dataType
                ),
                F.col("label").cast(df.schema["label"].dataType),
            )
            return df.unionByName(z)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)


def test_exact_substring_dedup_q_zero_token_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["exact_substring_dedup_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    row = rows[_HOSTILE_DOC[0]]
    # the gramless doc must still be EMITTED, with an all-zero row
    assert (
        row["n_tokens"],
        row["n_partners"],
        row["n_spans"],
        row["max_span_tokens"],
        row["cut_tokens"],
        row["kept_tokens"],
    ) == (0, 0, 0, 0, 0, 0)


def test_seq_packing_q_zero_token_doc_adds_nothing(spark, monkeypatch):
    baseline = {
        r["seq_id"]: tuple(r)
        for r in REGISTRY["seq_packing_q"].fn(spark, SF_SMALL).collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    hostile = {
        r["seq_id"]: tuple(r)
        for r in REGISTRY["seq_packing_q"].fn(spark, SF_SMALL).collect()
    }
    # a zero-token doc occupies no sequence and shifts no offsets
    assert hostile == baseline


def test_quality_queries_zero_token_doc_scores_half(spark, monkeypatch):
    """A zero-token doc has raw score 0 → sigmoid 0.5 → bucket 5 and
    gold 0; both quality queries must absorb it without error."""
    base = {
        r["bucket"]: r["n_docs"]
        for r in REGISTRY["quality_calibration_curve_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["bucket"]: r
        for r in REGISTRY["quality_calibration_curve_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert rows[5]["n_docs"] == base.get(5, 0) + 1
    sweep = {
        r["tau_x10"]: r
        for r in REGISTRY["quality_threshold_sweep_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    # prob 0.5 is kept at tau 0.5 (>=) and dropped at 0.6
    assert sweep[5]["n_keep"] == sweep[6]["n_keep"] + rows[5]["n_docs"]


def test_embedding_decontam_q_zero_train_vector(spark, monkeypatch):
    """ANSI divide-by-zero regression (the probe's live find): a zero
    TRAIN vector must produce max_cos NULL / contaminated false / the
    smallest-suite-id tiebreak — never a DIVIDE_BY_ZERO job abort."""
    _with_zero_vector(spark, monkeypatch, _HOSTILE_VEC_ID)
    rows = {
        r["vec_id"]: r
        for r in REGISTRY["embedding_decontam_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    row = rows[_HOSTILE_VEC_ID]
    assert row["max_cos"] is None
    assert row["contaminated"] is False
    # all 32 cosines are NULL, so NULLS LAST leaves only the test_id
    # tiebreak: the row must pick the smallest suite id
    suite_ids = {r["nn_test_id"] for r in rows.values()}
    assert row["nn_test_id"] == min(suite_ids)


def test_embedding_decontam_q_zero_suite_vector(spark, monkeypatch):
    """A zero vector that hash-ranks INTO the suite: every train row
    scores one NULL cosine among its 32 candidates — NULLS LAST keeps
    the zero suite vector out of every top-1 and nothing aborts."""
    _with_zero_vector(spark, monkeypatch, _HOSTILE_SUITE_VEC_ID)
    rows = REGISTRY["embedding_decontam_q"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 469  # 501 vectors − 32 suite
    assert all(r["nn_test_id"] != _HOSTILE_SUITE_VEC_ID for r in rows)
    assert all(r["max_cos"] is not None for r in rows)


def test_data_constrained_epochs_q_zero_token_doc(spark, monkeypatch):
    """A zero-token doc contributes no chunks: every source's unique
    budget — and therefore the whole 160-row grid — is unchanged."""
    baseline = {
        (r["source"], r["epochs"]): tuple(r)
        for r in REGISTRY["data_constrained_epochs_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    _with_hostile_doc(spark, monkeypatch)
    hostile = {
        (r["source"], r["epochs"]): tuple(r)
        for r in REGISTRY["data_constrained_epochs_q"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert hostile == baseline


def test_exact_substring_decontam_q_gramless_suite_doc(spark, monkeypatch):
    """The suite is hash-selected, so a hostile doc cannot be forced in
    cheaply — instead assert the query is total over the real suite and
    every row respects the flag contract."""
    _with_hostile_doc(spark, monkeypatch)
    rows = REGISTRY["exact_substring_decontam_q"].fn(
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["contaminated"] == (r["max_overlap_tokens"] >= 40)
        assert r["n_spans"] >= r["n_train_partners"] >= 0
