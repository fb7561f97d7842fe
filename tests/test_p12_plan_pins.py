"""Physical-plan pins for the round-13 batch (queries/p12.py).

The scale claims in the docstrings are pinned structurally so a
refactor cannot silently regress them:
  * no p12 query plans a CartesianProduct — multimodal decontamination's
    cross join must stay a BroadcastNestedLoopJoin over the fixed-size
    image suite;
  * multimodal_decontam_q BROADCASTS the suite side;
  * eval_dirty_tokens_q's seed-match join is a BROADCAST hash join of
    the suite's seeds (the corpus seed stream must never shuffle on the
    gram key);
  * tokenizer_parity_q stays a one-aggregation plan: its only exchanges
    are the lang agg and the single-partition window spread (≤ 3 with
    AQE reads), never a per-doc shuffle.

Runs at sf0.001. Mostly plan-build only — but NOT job-free:
eval_dirty_tokens_q runs an eager suite count via localCheckpoint
machinery inside fn(), same as the p11 substring queries.
"""

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

BATCH = [
    "extractable_memorization_q",
    "tokenizer_parity_q",
    "multimodal_decontam_q",
    "filter_agreement_q",
    "eval_dirty_tokens_q",
    # second wave
    "cross_source_dup_matrix_q",
    "boilerplate_fraction_q",
]


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_p12_batch(spark):
    offenders = [
        name for name in BATCH if "CartesianProduct" in _plan(spark, name)
    ]
    assert offenders == [], (
        "p12 queries planning a CartesianProduct (a cross join lost its "
        f"broadcast hint): {offenders}"
    )


def test_multimodal_decontam_broadcasts_the_suite(spark):
    plan = _plan(spark, "multimodal_decontam_q")
    assert "BroadcastExchange" in plan, (
        "multimodal_decontam_q must broadcast the fixed-size image "
        "suite; a shuffled cross join here is the corpus-scale failure "
        "mode"
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_eval_dirty_tokens_seed_join_broadcasts(spark):
    plan = _plan(spark, "eval_dirty_tokens_q")
    assert "BroadcastHashJoin" in plan, (
        "the suite-seed match join must broadcast the suite seeds; a "
        "SortMergeJoin would shuffle the whole corpus seed stream on "
        "the gram key"
    )


def test_tokenizer_parity_is_one_aggregation(spark):
    plan = _plan(spark, "tokenizer_parity_q")
    assert plan.count("Exchange") <= 3, (
        "tokenizer_parity_q is documented as one lang aggregation plus "
        "the bounded single-partition window spread but its plan "
        f"contains {plan.count('Exchange')} Exchanges"
    )


def test_cross_source_pair_explode_never_joins_grams(spark):
    """The pair stage must come from the per-gram collect_set explode,
    bounded by the source count — a gram-key SELF-join here would fan
    out quadratically on high-frequency grams."""
    plan = _plan(spark, "cross_source_dup_matrix_q")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_df_join_shares_gram_exchange(spark):
    """The df aggregate and the hit join both key on the gram; the plan
    must hash/sort-merge on it, never nested-loop over seeds."""
    plan = _plan(spark, "boilerplate_fraction_q")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_knn_loo_ann_never_broadcasts_the_corpus(spark):
    """The whole point of the ANN variant: candidates come from ONE
    shuffle on the bucket key, never a broadcast of corpus data into a
    nested-loop — that is the exact query's capped plan, not this one's.
    r14-opt: the bucket self-equi-join became the family's per-bucket
    kernel (groupBy bucket + applyInPandas, the ann_bucketed shape), so
    the pin now asserts the grouped-kernel stage and that the ONLY
    hash exchange keys on the bucket."""
    plan = _plan(spark, "knn_loo_ann_q")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, plan
    # below the kernel (later lines = deeper in the single-branch
    # subtree) the only hash exchange must key on the bucket: corpus
    # vectors shuffle exactly once, on the bucket id
    below_kernel = plan[plan.rindex("FlatMapGroupsInPandas"):]
    rogue = [
        ln for ln in below_kernel.splitlines()
        if "Exchange hashpartitioning" in ln and "bucket" not in ln
    ]
    assert rogue == [], (
        "a non-bucket hash exchange appeared below the kernel — corpus "
        f"vectors are shuffling on something else: {rogue}"
    )


def test_doc_memorization_risk_gram_join_is_equi(spark):
    plan = _plan(spark, "doc_memorization_risk_q")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quality_psi_grid_joins_broadcast(spark):
    """The PSI grid joins are metadata-scale (sources x 10 buckets) and
    must all broadcast — a shuffled join here would be planning the
    per-doc scan into the grid stage."""
    plan = _plan(spark, "quality_psi_drift_q")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
