"""Plan pins for the r14 OPTIMIZATION round (OPTIMIZATION_r14.md).

Each pin guards one de-duplication of work: a multi-consumer frame that
used to be re-evaluated once per consumer is now localCheckpoint-pinned,
so the consuming plan must read ``Scan ExistingRDD`` and the expensive
subtree (Arrow kernel / parquet scan / seed-join pipeline) must appear
at most once — a revert silently reintroduces 2-4x the work at 100 TB.
"""

import pytest

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "name",
    ["phash_neardup", "audio_neardup_q", "simhash_neardup_q"],
)
def test_banded_neardup_kernel_evaluates_once(spark, name):
    # the fingerprint/signature kernel is pinned before the band
    # self-join: both sides must read the checkpointed RDD and no
    # kernel stage may survive in the consuming plan
    plan = _plan(spark, name)
    assert "Scan ExistingRDD" in plan, plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, (
        f"{name}: a kernel stage survived in the consuming plan — the "
        "payload hash runs once per join side again:\n" + plan
    )


def test_neardup_pairs_bucket_kernel_evaluates_once(spark):
    # hs AND the bucket frame are pinned: the candidate self-join must
    # not re-run the band-fold kernel per side
    plan = _plan(spark, "neardup_pairs")
    assert plan.count("MapInPandas") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_adamic_adar_baskets_evaluate_once(spark):
    # the capped-basket frame is pinned; without it the scan + distinct
    # + cap window ran three times (osize + both self-join sides)
    plan = _plan(spark, "adamic_adar_q")
    assert "Scan parquet" not in plan, (
        "adamic_adar_q re-reads lineitem inside the pair plan — the "
        "basket pin is gone:\n" + plan
    )


def test_exact_substring_spans_evaluate_once(spark):
    # spans is pinned; role = spans ∪ swapped(spans) feeds two
    # consumers, so an unpinned tree holds FOUR copies of the
    # seed-join pipeline (r14-opt audit: 17 Exchanges -> 7)
    plan = _plan(spark, "exact_substring_dedup_q")
    n_exchanges = plan.count("+- Exchange")
    assert n_exchanges <= 9, (
        f"exact_substring_dedup_q plan holds {n_exchanges} exchanges — "
        "the spans pin is gone (expected <= 9):\n" + plan
    )


@pytest.mark.parametrize("name", ["minhash_estimate_q", "lsh_scurve_q"])
def test_handrolled_lsh_kernels_evaluate_once(spark, name):
    # the hand-rolled shingle->bucket->candidate compositions pin every
    # kernel frame before its self-join / double-read (the neardup_pairs
    # #4 pattern): no kernel stage may survive in the consuming plan
    plan = _plan(spark, name)
    assert plan.count("MapInPandas") == 0, (
        f"{name}: a kernel stage survived — a signature/bucket pass "
        "runs once per join side again:\n" + plan
    )
    assert "Scan ExistingRDD" in plan, plan


def test_text_stats_carry_text_passthrough(spark):
    # carry_text=True must emit the input text column UNTOUCHED beside
    # the stats columns, and the stats values must be identical to the
    # carry_text=False output (the r14-opt join-removal depends on both)
    import pyspark.sql.functions as F

    from iniz_exporters_spark.catalog import Catalog
    from iniz_exporters_spark.functions.text import text_stats

    d = Catalog(spark, SF).documents
    carried = text_stats(d, "doc_id", "text", carry_text=True)
    assert carried.columns == [
        "doc_id", "quality_raw", "lang_pred", "n_tokens", "text",
    ]
    got_text = {
        r.doc_id: r.text for r in carried.select("doc_id", "text").collect()
    }
    want_text = {
        r.doc_id: r.text for r in d.select("doc_id", "text").collect()
    }
    assert got_text == want_text
    got_stats = sorted(
        map(str, carried.drop("text").collect())
    )
    want_stats = sorted(
        map(str, text_stats(d, "doc_id", "text").collect())
    )
    assert got_stats == want_stats


def test_pipeline_waterfall_kernel_evaluates_once(spark):
    # scored (the text_stats kernel output) is pinned and text rides the
    # kernel instead of a re-attach join: the final plan must hold NO
    # surviving MapInPandas (an unpinned tree evaluated the kernel three
    # times: counts agg + dedup_exact's keep-agg and semi-join) and no
    # join back to the documents scan
    plan = _plan(spark, "pipeline_waterfall_q")
    assert plan.count("MapInPandas") == 0, plan
    assert "Scan parquet" not in plan, (
        "pipeline_waterfall_q re-reads documents — the carry_text "
        "join-removal or the scored pin is gone:\n" + plan
    )


def test_association_rules_part_counts_evaluate_once(spark):
    # cnt (per-part counts over the capped baskets) is pinned: both
    # lift-join sides must read the checkpointed RDD — an unpinned tree
    # runs the groupBy(p) aggregate once PER SIDE (a second full pass
    # over the baskets at 100 TB), which reappears in the plan as a
    # HashAggregate keyed on a `p#` column
    import re

    plan = _plan(spark, "association_rules_q")
    p_aggs = [
        m
        for m in re.findall(r"Keys \[1\]: \[(\w+)#\d+", plan)
        if m == "p"
    ]
    assert p_aggs == [], (
        "association_rules_q re-aggregates per-part counts in-plan — "
        "the cnt pin is gone:\n" + plan
    )


def test_span_dedup_tokenize_evaluates_once(spark):
    # toks is pinned: the n_tokens leg must read the checkpointed RDD
    # instead of re-running scan + spread + tokenize over the corpus
    plan = _plan(spark, "span_dedup_trim")
    assert "Scan parquet" not in plan, (
        "span_dedup_trim re-reads documents inside the final plan — "
        "the toks pin is gone:\n" + plan
    )


def test_knn_loo_ann_bucketed_frame_evaluates_once(spark):
    # r14-opt: the bucket self-equi-join (which needed the pinned frame
    # to avoid scanning the embeddings once per side) became the
    # per-bucket kernel with a SINGLE consumer, so the plan now shows
    # the one real parquet scan instead of a checkpointed RDD — count
    # unique scan OPERATOR IDs (formatted explain lists each node twice:
    # tree + details section).
    import re

    plan = _plan(spark, "knn_loo_ann_q")
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) <= 1, (
        "knn_loo_ann_q scans the embeddings twice — the single-pass "
        "bucket-kernel shape is gone:\n" + plan
    )


def test_boilerplate_coverage_is_single_window(spark):
    # the interval-union leg is the lag identity (one window, one
    # groupBy); the generic islands dance would reintroduce a second
    # window + distinct exchange
    plan = _plan(spark, "boilerplate_fraction_q")
    assert plan.count("(Window") + plan.count("- Window") <= 1, plan


def test_bucket_loo_sqdist_matches_hof_fold(spark):
    # the per-bucket kernel must reproduce the bucket-equi-join +
    # zip_with/aggregate d2 fold BITWISE (it accumulates (x-y)^2
    # sequentially over dims, the same single-rounded op sequence), so
    # the caller's F.round and the downstream top-5 vote are unchanged
    import pyspark.sql.functions as F

    from iniz_exporters_spark.catalog import Catalog
    from iniz_exporters_spark.operators.similarity import (
        bucket_loo_sqdist_pairs,
        sign_bucket,
    )

    e = Catalog(spark, SF).embeddings.select(
        "vec_id",
        "label",
        F.col("embedding"),
        sign_bucket(F.col("embedding"), bits=4).alias("bucket"),
    )
    got = {
        (r.qid, r.cid): (r.true_label, r.cand_label, r.d2)
        for r in bucket_loo_sqdist_pairs(
            e, "bucket", "vec_id", "label", "embedding"
        ).collect()
    }
    ed = e.withColumn(
        "v", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = ed.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        "bucket",
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    expect = {
        (r.qid, r.cid): (r.true_label, r.cand_label, r.d2)
        for r in ed.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            F.col("label").alias("cand_label"),
            F.col("vec_id").alias("cid"),
            d2.alias("d2"),
        )
        .collect()
    }
    assert got == expect


def test_scored_vs_fixed_queries_matches_hof_cosine(spark):
    # the vectorized kernel must produce the exact rounded cosines the
    # HOF expression path produced (dot-then-divide + round)
    import pyspark.sql.functions as F

    from iniz_exporters_spark.catalog import Catalog
    from iniz_exporters_spark.operators.similarity import (
        cosine,
        scored_vs_fixed_queries,
    )

    e = Catalog(spark, SF).embeddings
    q = e.filter(F.col("vec_id") < 5)
    got = {
        (r.neighbor_id, r.query_id): r.cos
        for r in scored_vs_fixed_queries(e, q).collect()
    }
    expect = {
        (r.neighbor_id, r.query_id): r.cos
        for r in e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
        )
        .crossJoin(
            F.broadcast(
                q.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("__qv"),
                )
            )
        )
        .select(
            "neighbor_id",
            "query_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 4).alias("cos"),
        )
        .collect()
    }
    assert got == expect
