"""Physical-plan pins for the round-14 batch (queries/p13.py).

The scale claims in the docstrings are pinned structurally so a
refactor cannot silently regress them:
  * no p13 query plans a CartesianProduct — every candidate stage is a
    bucket/band equi-join;
  * imagetext_alignment_q's threshold sweep runs on the <=33-row
    Hamming HISTOGRAM, never an exploded corpus (the explode sits
    ABOVE the first aggregate in the plan);
  * audio_quality_filter_q is shuffle-free — a pure chained-kernel map
    pipeline (zero Exchanges);
  * crosslingual_decontam_q / crossmodal_hard_negatives_q never
    broadcast corpus-scale data — their candidate joins shuffle on the
    adaptive bucket key (no BroadcastExchange feeding the bucket join
    at production shape; AQE may still locally broadcast at sf0.001,
    so the pin asserts the logical shape: no CartesianProduct and a
    bucket-key join present).

Runs at sf0.001; plan-build plus the driver-side counts the adaptive
queries perform inside fn().
"""

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

BATCH = [
    "imagetext_alignment_q",
    "audio_neardup_q",
    "crosslingual_decontam_q",
    "audio_quality_filter_q",
    "crossmodal_hard_negatives_q",
]


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_p13_batch(spark):
    offenders = [
        name for name in BATCH if "CartesianProduct" in _plan(spark, name)
    ]
    assert offenders == [], (
        "p13 queries planning a CartesianProduct (a candidate stage "
        f"lost its equi-join keys): {offenders}"
    )


def test_alignment_sweep_runs_on_the_histogram(spark):
    plan = _plan(spark, "imagetext_alignment_q")
    # the explode (Generate) of the threshold grid must sit ABOVE the
    # first HashAggregate (the hd histogram) — corpus rows are never
    # multiplied by the grid
    gen = plan.find("Generate")
    agg = plan.rfind("HashAggregate")
    assert gen != -1 and agg != -1
    assert gen < agg, (
        "the threshold-grid Generate must consume the Hamming "
        "histogram (aggregate BELOW it in the plan tree), not the "
        "per-document rows"
    )


def test_audio_quality_filter_is_shuffle_free(spark):
    plan = _plan(spark, "audio_quality_filter_q")
    # the only permitted Exchange is spread_for_kernel's round-robin
    # (a no-op pass-through at production scale); any hash/range
    # exchange means a real shuffle crept into the map pipeline
    rogue = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert rogue == [], (
        "audio_quality_filter_q is documented as a pure map pipeline "
        f"(chained Arrow kernels, no shuffle) but plans: {rogue}"
    )


def test_bucket_joins_are_equi_joins_on_the_bucket_key(spark):
    for name in ("crosslingual_decontam_q", "crossmodal_hard_negatives_q"):
        plan = _plan(spark, name)
        assert "bucket" in plan, f"{name}: bucket key missing from plan"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: candidate stage degraded to a nested-loop join — "
            "the bucket equi-join is the scale contract"
        )


def test_audio_neardup_shuffles_only_fingerprint_rows(spark):
    # the banded-LSH stage must key on (band index, band value): no
    # exchange may partition on the payload column — payloads stop at
    # the fingerprint kernel and only (id, band ints) rows shuffle
    plan = _plan(spark, "audio_neardup_q")
    offenders = [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "payload" in ln
    ]
    assert offenders == [], (
        f"audio payloads reached an exchange: {offenders}"
    )
    assert "CartesianProduct" not in plan


def test_crossmodal_kernels_evaluate_once(spark):
    # im/ts each feed TWO plan branches (own-pair join + bucketed
    # candidates); the localCheckpoint on each kernel output is what
    # keeps the payload-synthesis + phash/simhash kernels single-
    # evaluation. Pin: both branches read checkpointed RDD scans and
    # the Arrow kernel stages (ArrowEvalPython / MapInArrow) appear in
    # NEITHER consuming branch of the executed plan.
    plan = _plan(spark, "crossmodal_hard_negatives_q")
    scans = plan.count("Scan ExistingRDD")
    assert scans >= 2, (
        "expected both kernel outputs (im phash32, ts simhash) to be "
        f"checkpointed (>=2 ExistingRDD scans), found {scans} — a "
        "revert re-runs the kernels once per consuming branch"
    )
    assert "ArrowEvalPython" not in plan and "MapInArrow" not in plan, (
        "an Arrow kernel stage survived INSIDE the consuming plan — "
        "kernel work is no longer single-evaluation"
    )
