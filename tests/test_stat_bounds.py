"""Mathematical-invariant checks for the round-4 statistics layer.

The DuckDB oracle gate proves Spark and DuckDB AGREE — it cannot catch a
bug replicated identically in both formulations. These tests pin the
statistics' defining bounds and identities instead: values that no
correct implementation can violate regardless of data.
"""

import math

from iniz_exporters_spark.queries import REGISTRY

from conftest import SF_SMALL


def rows(name, spark):
    return REGISTRY[name].fn(spark, SF_SMALL).collect()


def test_gini_bounds(spark):
    for r in rows("gini_q", spark):
        assert 0.0 <= r["gini"] < 1.0, r
        assert r["n_docs"] > 0 and r["total_chars"] > 0


def test_roc_auc_bounds(spark):
    (r,) = rows("roc_auc_q", spark)
    assert 0.0 <= r["auc"] <= 1.0, r
    assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_chi2_nonnegative_and_dof(spark):
    (r,) = rows("chi2_independence_q", spark)
    assert r["chi2"] >= 0.0, r
    assert r["dof"] > 0


def test_ks_stat_bounds(spark):
    (r,) = rows("ks_test_q", spark)
    assert 0.0 <= r["ks_stat"] <= 1.0, r


def test_silhouette_bounds(spark):
    got = rows("silhouette_q", spark)
    assert len(got) == 4
    for r in got:
        assert -1.0 <= r["mean_silhouette"] <= 1.0, r


def test_nmi_and_purity_bounds(spark):
    (r,) = rows("cluster_nmi_q", spark)
    assert 0.0 <= r["nmi"] <= 1.0 + 1e-9, r
    assert 0.0 < r["purity"] <= 1.0, r


def test_kneser_ney_probabilities(spark):
    got = rows("kneser_ney_q", spark)
    assert got, "no bigrams at test SF"
    for r in got:
        assert 0.0 < r["pkn"] <= 1.0 + 1e-9, r


def test_zipf_slope_negative(spark):
    (r,) = rows("zipf_fit_q", spark)
    # frequency is non-increasing in rank by construction -> slope <= 0
    assert r["slope"] < 0.0, r
    assert 0.0 <= r["r2"] <= 1.0 + 1e-9, r


def test_heaps_curve_monotone(spark):
    got = sorted(rows("heaps_law_q", spark), key=lambda r: r["bucket"])
    toks = [r["cum_tokens"] for r in got]
    types = [r["cum_types"] for r in got]
    assert toks == sorted(toks) and types == sorted(types)
    # vocabulary can never outgrow the token stream
    assert all(ty <= tk for ty, tk in zip(types, toks))


def test_poisson_bootstrap_brackets_mean(spark):
    for r in rows("poisson_bootstrap_q", spark):
        assert r["boot_lo"] <= r["boot_mean"] <= r["boot_hi"], r
        assert r["n_replicas"] == 32, r


def test_association_rules_identities(spark):
    for r in rows("association_rules_q", spark):
        assert 0.0 < r["support"] <= 1.0, r
        assert 0.0 < r["confidence"] <= 1.0, r
        assert r["lift"] > 0.0, r


def test_rfm_scores_in_quartile_range(spark):
    for r in rows("rfm_segment_q", spark):
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 4, r


def test_correlations_bounded(spark):
    (r,) = rows("correlation_matrix_q", spark)
    for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc"):
        assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9, r


def test_hits_authority_normalized(spark):
    got = rows("hits_q", spark)
    assert got and all(r["authority"] > 0 for r in got)
    # top-20 of an L1-normalized score vector sums to at most 1
    assert sum(r["authority"] for r in got) <= 1.0 + 1e-6


def test_stl_decomposition_identity(spark):
    for r in rows("stl_decompose_q", spark):
        # additive identity holds to output rounding
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert math.isclose(recon, r["daily_mean"], abs_tol=2e-4), r


def test_cusum_final_near_zero(spark):
    got = sorted(rows("cusum_changepoint_q", spark), key=lambda r: r["day"])
    # sum of deviations from the mean telescopes to ~0 on the last day
    assert abs(got[-1]["cusum"]) < 1e-2, got[-1]
    assert sum(1 for r in got if r["is_changepoint"]) >= 1


def test_entropy_ldiversity_bounds(spark):
    for r in rows("entropy_ldiversity_q", spark):
        assert r["entropy"] >= 0.0, r
        # entropy over p priorities is at most ln(p)
        assert r["entropy"] <= math.log(r["n_priorities"]) + 1e-9, r


def test_woe_iv_terms_nonnegative_iv(spark):
    got = rows("woe_iv_q", spark)
    assert got
    for r in got:
        # each IV term (p_pos - p_neg) * ln(p_pos/p_neg) is >= 0
        assert r["iv_term"] >= -1e-12, r


def test_forecast_errors_nonnegative(spark):
    (r,) = rows("forecast_eval_q", spark)
    assert r["mae"] >= 0 and r["mape"] >= 0, r
    assert 0.0 <= r["smape"] <= 2.0, r


def test_cuped_preserves_overall_mean(spark):
    got = rows("cuped_q", spark)
    assert len(got) == 2
    # CUPED is mean-preserving over the population: the user-weighted
    # average of adjusted means equals that of raw means (E[x - mx] = 0)
    n = sum(r["n_users"] for r in got)
    raw = sum(r["raw_mean"] * r["n_users"] for r in got) / n
    adj = sum(r["cuped_mean"] * r["n_users"] for r in got) / n
    assert math.isclose(raw, adj, abs_tol=1e-3), (raw, adj)


def test_leakage_partition(spark):
    (r,) = rows("leakage_check_q", spark)
    assert (
        r["train_only"] + r["test_only"] + r["spanning"] == r["n_users"]
    ), r
    assert 0.0 <= r["leak_rate"] <= 1.0, r
