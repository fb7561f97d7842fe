"""Physical-plan pins for the round-11 session-3 batch (queries/p10.py).

The plan-audit findings that made these queries fast are pinned so a
refactor cannot silently regress them:
  * the three curation maps (PII risk, script mix, C4 rules) are
    ZERO-exchange per-row pipelines — any Exchange appearing means a
    shuffle crept into a linear corpus scan;
  * no query in the batch plans a CartesianProduct (every cross join is
    an explicit broadcast of a metadata-scale side);
  * host_blocklist's wildcard match stays an equi-join against a
    BROADCAST rule table (the suffix-chain design), never a rule-by-rule
    scan.

Plan-build only (no job execution) at sf0.001, so the whole file is
cheap.
"""

import pytest

from iniz_exporters_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


ZERO_EXCHANGE = ["pii_risk_score_q", "script_mix_q", "c4_rules_q"]

BATCH = [
    "pii_risk_score_q", "script_mix_q", "host_blocklist_q",
    "host_mirror_q", "theta_forecast_q", "mmr_rerank_q",
    "wilcoxon_signed_rank_q", "nf4_quantize_q", "c4_rules_q",
    "unimax_alloc_q", "pipeline_waterfall_q", "fairness_parity_q",
    "lsh_scurve_q", "kcenter_coreset_q", "dup_growth_curve_q",
    "softdedup_weights_q",
]


def test_curation_maps_plan_zero_exchanges(spark):
    for name in ZERO_EXCHANGE:
        plan = _plan(spark, name)
        assert "Exchange" not in plan, (
            f"{name} is documented as a zero-shuffle per-row map but its "
            "plan contains an Exchange"
        )


@pytest.mark.slow  # r15 gate budget: covered by a cheaper fast sibling; runs at round close (--runslow)
def test_no_cartesian_product_in_p10_batch(spark):
    offenders = [
        name for name in BATCH if "CartesianProduct" in _plan(spark, name)
    ]
    assert offenders == [], (
        "p10 queries planning a CartesianProduct (a cross join lost its "
        f"broadcast hint): {offenders}"
    )


def test_host_blocklist_broadcasts_the_rule_table(spark):
    plan = _plan(spark, "host_blocklist_q")
    assert "BroadcastExchange" in plan, (
        "host_blocklist_q's rule table must broadcast — the suffix-chain "
        "design turns wildcard matching into a small-side equi-join"
    )
