"""Edge-input guards for the p10 batch (review fixes, DETERMINISM rule
14 class): Spark's ``sequence(a, b)`` DESCENDS when b < a, so zero-token
documents and single-day groups used to fabricate phantom elements (or
raise under ANSI) where DuckDB's ``range`` yields empty. The synthetic
corpus never produces these inputs (min 10 tokens per doc, ~2.4k days
per priority), so the oracle gate alone cannot regress-test them — this
file injects the hostile rows through the Catalog seam instead.
"""

import pyspark.sql.functions as F

from iniz_exporters_spark.catalog import Catalog
from iniz_exporters_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"

# doc_id chosen so every spike residue class fires on the zero-token
# doc: 0 % k == 0 for all k (email, card, lorem, brace, javascript,
# replacement, control) — the worst case for the guards.
_HOSTILE_DOC = (1_000_000_000, "!!! ??? ...", "en", "src0", 11)


def _with_hostile_doc(spark, monkeypatch):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "documents":
            extra = spark.createDataFrame(
                [_HOSTILE_DOC], df.schema
            )
            return df.unionByName(extra)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)


def test_c4_rules_q_zero_token_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["c4_rules_q"].fn(spark, SF_SMALL).collect()
    }
    row = rows[_HOSTILE_DOC[0]]
    assert row["n_lines"] == 0
    assert row["n_kept_lines"] == 0
    assert row["n_unpunct_lines"] == 0
    assert row["n_short_lines"] == 0
    assert row["doc_kept"] == 0


def test_span_corruption_q_zero_token_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["span_corruption_q"].fn(spark, SF_SMALL).collect()
    }
    row = rows[_HOSTILE_DOC[0]]
    assert row["n_tokens"] == 0
    assert row["n_spans"] == 0
    assert row["n_masked"] == 0
    assert row["mask_rate"] is None  # 0-token doc: rate is undefined


def test_rouge_n_eval_q_emits_pair_with_gramless_doc(spark, monkeypatch):
    _with_hostile_doc(spark, monkeypatch)
    rows = REGISTRY["rouge_n_eval_q"].fn(spark, SF_SMALL).collect()
    hit = [r for r in rows if r["id_b"] == _HOSTILE_DOC[0]]
    # the hostile doc is last in its source, so it appears as id_b of
    # exactly one pair — which must be EMITTED with zero grams and NULL
    # recall (rule 11), not silently dropped
    assert len(hit) == 1
    row = hit[0]
    assert row["n_grams_b"] == 0
    assert row["n_overlap"] == 0
    assert row["rouge2_recall"] is None


def test_theta_forecast_q_single_day_priority(spark, monkeypatch):
    orig = Catalog._read_parquet

    def patched(self, table):
        df = orig(self, table)
        if table == "orders":
            # a brand-new priority with EXACTLY one order date: the SES
            # fold must run over an empty tail (rule 14 guard), not
            # index past the 1-element series
            extra = df.limit(1).select(
                F.col("o_orderkey") + 10_000_000,
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                F.lit("9-SINGLETON").alias("o_orderpriority"),
            ).toDF(*df.columns)
            return df.unionByName(extra)
        return df

    monkeypatch.setattr(Catalog, "_read_parquet", patched)
    rows = {
        r["pri"]: r
        for r in REGISTRY["theta_forecast_q"].fn(spark, SF_SMALL).collect()
    }
    row = rows["9-SINGLETON"]
    assert row["n_days"] == 1  # and, critically, the query did not raise
    # the n=1 fit is undefined: NULL slope/forecast (rule 8), not a crash
    assert row["slope"] is None and row["forecast_7d"] is None
