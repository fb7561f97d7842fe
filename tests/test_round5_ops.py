"""Invariant/bound contracts for the round-5 batch-V registry queries
(star components, CCNet perplexity buckets, margin pair mining, dataset
card, dedup cluster stats) — every registry entry lands with a local
contract in addition to its oracle row (round-4 convention)."""

import pyspark.sql.functions as F

from iniz_exporters_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def test_star_components_q_matches_propagation(spark):
    """The registered star-contraction query must label the chain graph
    identically to min-label propagation over the same edges."""
    from iniz_exporters_spark.catalog import Catalog
    from iniz_exporters_spark.plans.graph import connected_components
    from pyspark.sql import Window

    o = Catalog(spark, SF_SMALL).orders.filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        o.select(
            F.col("o_orderkey").alias("dst"),
            F.lag("o_orderkey").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .select("src", "dst")
    )
    prop = {
        (r["component"], r["chain_len"])
        for r in connected_components(edges, method="propagation")
        .groupBy("component")
        .agg(F.count("*").alias("chain_len"))
        .collect()
    }
    got = {
        (r["component"], r["chain_len"])
        for r in REGISTRY["star_components_q"].fn(spark, SF_SMALL).collect()
    }
    assert got == prop
    # every chain is one component per customer: sizes are >= 2 (an edge
    # exists) and total node count equals the sum of chain lengths
    assert all(n >= 2 for _, n in got)


def test_ccnet_bucket_q_partitions_and_orders(spark):
    """Tertiles partition each source and mean perplexity must be
    monotone head <= middle <= tail (the bucketing's entire point)."""
    from iniz_exporters_spark.catalog import Catalog

    rows = REGISTRY["ccnet_bucket_q"].fn(spark, SF_SMALL).collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r["source"], {})[r["bucket"]] = r
    n_docs = (
        Catalog(spark, SF_SMALL)
        .documents.filter(F.col("text") != "")
        .groupBy("source")
        .count()
        .collect()
    )
    expected = {r["source"]: r["count"] for r in n_docs}
    for src, buckets in per_source.items():
        assert set(buckets) == {"head", "middle", "tail"}
        assert sum(b["n_docs"] for b in buckets.values()) == expected[src]
        assert (
            buckets["head"]["mean_ppl"]
            <= buckets["middle"]["mean_ppl"]
            <= buckets["tail"]["mean_ppl"]
        )


def test_margin_ratio_pairs_q_contract(spark):
    """One best pair per source vector, margin strictly > 1 (the ratio
    criterion), cosine within [-1, 1]."""
    rows = REGISTRY["margin_ratio_pairs_q"].fn(spark, SF_SMALL).collect()
    assert rows, "sampled source set must mine at least one pair"
    srcs = [r["src_id"] for r in rows]
    assert len(srcs) == len(set(srcs))
    for r in rows:
        assert r["margin"] > 1.0
        assert -1.0 <= r["cos"] <= 1.0


def test_dataset_card_q_rollup_consistency(spark):
    """The <all> grand-total row must equal the sum of per-source rows,
    and each per-source row the sum of its (source, lang) rows; dup_rate
    stays in [0, 1) and quantiles are ordered p50 <= p90."""
    rows = REGISTRY["dataset_card_q"].fn(spark, SF_SMALL).collect()
    grand = [r for r in rows if r["source"] == "<all>" and r["lang"] == "<all>"]
    assert len(grand) == 1
    per_source = [
        r for r in rows if r["source"] != "<all>" and r["lang"] == "<all>"
    ]
    leaves = [
        r for r in rows if r["source"] != "<all>" and r["lang"] != "<all>"
    ]
    assert grand[0]["n_docs"] == sum(r["n_docs"] for r in per_source)
    assert grand[0]["total_tokens"] == sum(r["total_tokens"] for r in per_source)
    for s in per_source:
        mine = [r for r in leaves if r["source"] == s["source"]]
        assert s["n_docs"] == sum(r["n_docs"] for r in mine)
        assert s["total_chars"] == sum(r["total_chars"] for r in mine)
    for r in rows:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["p50_chars"] <= r["p90_chars"]
        assert r["n_distinct_texts"] <= r["n_docs"]


def test_dedup_cluster_stats_q_mass_conservation(spark):
    """Cluster histogram must conserve document mass: sum over rows of
    n_docs equals the number of docs with >= 8 tokens, and per row
    n_docs = cluster_size * n_clusters, dropped = n_docs - n_clusters."""
    from iniz_exporters_spark.catalog import Catalog

    rows = REGISTRY["dedup_cluster_stats_q"].fn(spark, SF_SMALL).collect()
    d = Catalog(spark, SF_SMALL).documents
    eligible = d.filter(F.size(F.split("text", " ")) >= 8).count()
    assert sum(r["n_docs"] for r in rows) == eligible
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_dropped_if_deduped"] == r["n_docs"] - r["n_clusters"]


def test_lsh_precision_eval_q_bounds(spark):
    """Precision is n_true / n_candidates within [0, 1]; the candidate
    set must contain every pair that neardup_pairs reports at the
    production threshold (candidates ⊇ verified near-dups)."""
    from iniz_exporters_spark.operators.dedup import neardup_pairs
    from iniz_exporters_spark.catalog import Catalog

    r = REGISTRY["lsh_precision_eval_q"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_candidates"] >= r["n_true"] >= 0
    assert abs(
        r["precision_at_07"] - round(r["n_true"] / r["n_candidates"], 6)
    ) < 1e-9
    d = Catalog(spark, SF_SMALL).documents
    n_prod = neardup_pairs(
        d, "doc_id", "text", threshold=0.7, num_perm=16, rows_per_band=4, k=5
    ).count()
    assert r["n_true"] == n_prod


def test_stratified_split_q_proportional(spark):
    """Every stratum gets exactly ceil(10%) eval rows — the guarantee a
    global hash split cannot make for small strata."""
    import math

    rows = REGISTRY["stratified_split_q"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_eval"] == math.ceil(0.1 * r["n_total"])


def test_session_gap_stats_q_sanity(spark):
    """Gap count = events - distinct users (one LAG null per user);
    quantiles ordered; share over 30 min within [0, 1]."""
    from iniz_exporters_spark.catalog import Catalog

    r = REGISTRY["session_gap_stats_q"].fn(spark, SF_SMALL).collect()[0]
    ev = Catalog(spark, SF_SMALL).events
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert r["n_gaps"] == n_events - n_users
    assert 0 <= r["p50_gap_s"] <= r["p90_gap_s"]
    assert 0.0 <= r["pct_over_30m"] <= 1.0


def test_locations_export_q_contract(spark):
    """End-to-end locations row: ordering by location_id, dynamic pivot
    schema discovered (sorted attributes then sorted tags), parent names
    resolved across the child-before-parent id, ':' value intact."""
    df = REGISTRY["locations_export_q"].fn(spark, "unused")
    assert df.columns == [
        "UUID", "Void/Retire", "Name", "Description", "Parent",
        "Attribute|Beds", "Attribute|Code", "Attribute|URL",
        "Tag|Lab Location", "Tag|Login Location", "Tag|Visit Location",
    ]
    rows = [r.asDict() for r in df.collect()]
    assert [r["UUID"] for r in rows] == [
        "uuid-ward", "uuid-hq", "uuid-old", "uuid-clinic", "uuid-lab",
        "uuid-remote",
    ]
    by = {r["UUID"]: r for r in rows}
    assert by["uuid-ward"]["Parent"] == "Clinic"  # child id < parent id
    assert by["uuid-clinic"]["Attribute|URL"] == "http://x:8080"
    assert by["uuid-old"]["Void/Retire"] == 1
    assert by["uuid-lab"]["Tag|Lab Location"] == "TRUE"
    assert by["uuid-remote"]["Parent"] is None


def test_concept_set_q_contract(spark):
    """Set-creator row: first CSV row is the set, members get 1-based
    Sort Weight in input order, empty Void/Retire becomes NULL."""
    rows = [
        r.asDict()
        for r in REGISTRY["concept_set_q"].fn(spark, "unused").collect()
    ]
    assert [(r["Member"], r["Sort Weight"]) for r in rows] == [
        ("m01", 1), ("m02", 2), ("m03", 3), ("m04", 4),
    ]
    assert all(r["Concept"] == "set-uuid" for r in rows)
    assert all(r["Member Type"] == "CONCEPT-SET" for r in rows)
    assert all(r["Void/Retire"] is None for r in rows)


def test_ordertypes_export_q_contract(spark):
    """Order-types row: reference header spellings, pk ordering, parent
    uuid resolution, retired row kept with its flag."""
    df = REGISTRY["ordertypes_export_q"].fn(spark, "unused")
    assert df.columns == [
        "Uuid", "Void/Retire", "Name", "Description", "Java class name",
        "Parent",
    ]
    rows = [r.asDict() for r in df.collect()]
    assert [r["Uuid"] for r in rows] == [
        "uuid-drug", "uuid-test", "uuid-lab", "uuid-rad",
    ]
    assert rows[2]["Parent"] == "uuid-test"
    assert rows[3]["Void/Retire"] == 1
    assert rows[0]["Parent"] is None


def test_lang_confusion_q_contract(spark):
    """Per-class rows: support sums to the corpus size, n_correct <=
    min(support, n_predicted), precision/recall/f1 within [0, 1] and
    f1 is the harmonic mean of the emitted precision/recall."""
    from iniz_exporters_spark.catalog import Catalog

    rows = REGISTRY["lang_confusion_q"].fn(spark, SF_SMALL).collect()
    n_docs = Catalog(spark, SF_SMALL).documents.count()
    assert sum(r["support"] for r in rows) == n_docs
    for r in rows:
        assert r["n_correct"] <= min(r["support"], r["n_predicted"] or 0) \
            or r["n_correct"] == 0
        for m in ("precision", "recall", "f1"):
            assert 0.0 <= r[m] <= 1.0
        if r["precision"] > 0 and r["recall"] > 0:
            h = 2 * r["precision"] * r["recall"] / (
                r["precision"] + r["recall"]
            )
            assert abs(r["f1"] - h) < 2e-6


def test_burstiness_q_bounds(spark):
    """B = (sd-mean)/(sd+mean) lies in [-1, 1); gap counts sum to
    events minus distinct (user, type) streams."""
    from iniz_exporters_spark.catalog import Catalog

    rows = REGISTRY["burstiness_q"].fn(spark, SF_SMALL).collect()
    ev = Catalog(spark, SF_SMALL).events
    n_events = ev.count()
    n_streams = ev.select("user_id", "event_type").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_events - n_streams
    for r in rows:
        assert -1.0 <= r["burstiness"] < 1.0
        assert r["mean_gap_s"] > 0 and r["sd_gap_s"] >= 0
