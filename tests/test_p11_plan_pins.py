"""Physical-plan pins for the round-12 batch (queries/p11.py).

The scale claims in the docstrings are pinned structurally so a
refactor cannot silently regress them:
  * no p11 query plans a CartesianProduct — decontamination's cross
    join must stay a BroadcastNestedLoopJoin over the fixed-size suite;
  * the two quality queries are single-scan aggregations: exactly ONE
    Exchange each (the 10-key groupBy / the one-row conditional agg);
  * embedding decontamination BROADCASTS the suite side;
  * the exact-substring seed self-join is an equi-join on the gram
    (SortMergeJoin/ShuffledHashJoin), never a nested-loop over seeds.

Runs at sf0.001 so the whole file is cheap. Mostly plan-build only —
but NOT job-free: exact_substring_dedup_q / exact_substring_decontam_q
run an eager localCheckpoint() inside fn(), which executes their seed
stage at plan-build time (ADVICE r12 docstring correction).
"""

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

BATCH = [
    "exact_substring_dedup_q",
    "quality_calibration_curve_q",
    "seq_packing_q",
    "embedding_decontam_q",
    "exact_substring_decontam_q",
    "quality_threshold_sweep_q",
    # seventh round-12 registration (ADVICE r12): its
    # crossJoin(broadcast(grid)) must stay a broadcast nested loop over
    # the 8-row literal grid, covered by the no-CartesianProduct pin.
    "data_constrained_epochs_q",
]


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_p11_batch(spark):
    offenders = [
        name for name in BATCH if "CartesianProduct" in _plan(spark, name)
    ]
    assert offenders == [], (
        "p11 queries planning a CartesianProduct (a cross join lost its "
        f"broadcast hint): {offenders}"
    )


def test_quality_queries_single_exchange(spark):
    for name in ("quality_calibration_curve_q", "quality_threshold_sweep_q"):
        plan = _plan(spark, name)
        assert plan.count("Exchange") <= 1, (
            f"{name} is documented as one scan + one aggregation exchange "
            f"but its plan contains {plan.count('Exchange')} Exchanges"
        )


def test_embedding_decontam_broadcasts_the_suite(spark):
    plan = _plan(spark, "embedding_decontam_q")
    assert "BroadcastExchange" in plan, (
        "embedding_decontam_q must broadcast the fixed-size suite; a "
        "shuffled cross join here is the corpus-scale failure mode"
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_exact_substring_seed_join_is_equi_join(spark):
    plan = _plan(spark, "exact_substring_dedup_q")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), (
        "the seed self-join must hash/sort-merge on the gram key; "
        "anything else iterates seeds quadratically"
    )
