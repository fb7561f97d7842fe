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


# ---------------------------------------------------------------------------
# Batches L-O invariants.
# ---------------------------------------------------------------------------


def test_modularity_bounds(spark):
    (r,) = rows("modularity_q", spark)
    assert -0.5 <= r["modularity"] <= 1.0, r
    assert r["n_edges"] > 0 and r["n_communities"] > 0


def test_assortativity_bounds(spark):
    (r,) = rows("assortativity_q", spark)
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9, r


def test_lexical_ratios(spark):
    for r in rows("lexical_stats_q", spark):
        assert 0.0 <= r["hapax_ratio"] <= 1.0, r
        # burstiness cf/df >= 1 for every type, so the mean is too
        assert r["mean_burstiness"] >= 1.0, r
        assert r["n_types"] <= r["n_tokens"], r


def test_twonn_dim_positive(spark):
    (r,) = rows("twonn_dim_q", spark)
    assert r["intrinsic_dim"] > 0, r
    assert r["n_probes"] > 0


def test_dp_release_nonnegative(spark):
    got = rows("dp_counts_q", spark)
    assert got
    for r in got:
        assert r["released_count"] >= 0, r
        assert r["released_count"] == max(r["true_count"] + r["noise"], 0), r


def test_theil_sen_finite(spark):
    (r,) = rows("theil_sen_q", spark)
    assert math.isfinite(r["theil_sen_slope"]), r
    assert r["n_pairs"] > 0


def test_source_similarity_bounds(spark):
    got = rows("source_similarity_q", spark)
    assert got
    for r in got:
        assert 0.0 <= r["cosine"] <= 1.0 + 1e-9, r  # counts are nonneg


def test_exact_median_ordering(spark):
    (r,) = rows("exact_median_q", spark)
    assert r["median_lo"] <= r["median_hi"], r
    assert r["n"] > 0


def test_label_propagation_conservation(spark):
    got = rows("label_propagation_q", spark)
    assert got
    assert all(r["n_members"] > 0 for r in got)


def test_nc_classifier_accuracy_bounds(spark):
    got = rows("nc_classifier_q", spark)
    assert got
    for r in got:
        assert 0.0 <= r["accuracy"] <= 1.0, r
        assert r["n_correct"] <= r["n_eval"], r


def test_skipgram_pairs_positive(spark):
    got = rows("skipgram_pairs_q", spark)
    assert got
    assert all(r["n_pairs"] > 0 for r in got)


def test_doc_cosine_sparse_bounds(spark):
    got = rows("doc_cosine_sparse_q", spark)
    assert got, "candidate generation found no pairs at test SF"
    # tf-idf weights are nonnegative (df <= nd), so cosine in [0, 1]
    for r in got:
        assert -1e-9 <= r["cosine"] <= 1.0 + 1e-9, r


def test_running_balance_islands(spark):
    for r in rows("running_balance_resets_q", spark):
        assert 1 <= r["n_islands"] <= r["n_events"] + 1, r


def test_readability_finite(spark):
    for r in rows("readability_q", spark):
        assert math.isfinite(r["flesch"]) and math.isfinite(r["lix"]), r
        assert r["lix"] > 0, r


# ---------------------------------------------------------------------------
# Batches P-U invariants.
# ---------------------------------------------------------------------------


def test_js_divergence_bounds(spark):
    (r,) = rows("js_divergence_q", spark)
    assert 0.0 <= r["js_div"] <= math.log(2) + 1e-9, r


def test_daily_bands_ordering(spark):
    for r in rows("daily_bands_q", spark):
        assert r["p10"] <= r["p50"] <= r["p90"], r


def test_calendar_features_ranges(spark):
    for r in rows("calendar_features_q", spark):
        assert 0 <= r["dow"] <= 6, r
        assert abs(r["dow_sin"] ** 2 + r["dow_cos"] ** 2 - 1.0) < 1e-5, r


def test_try_parse_counts(spark):
    (r,) = rows("try_parse_q", spark)
    # every 7th event corrupts the int, every 11th the date — counts
    # must be within one of n/7 and n/11
    assert abs(r["bad_ints"] - r["n_rows"] / 7) <= 1, r
    assert abs(r["bad_dates"] - r["n_rows"] / 11) <= 1, r


def test_flags_rollup_masks(spark):
    for r in rows("flags_rollup_q", spark):
        # AND-mask can only keep bits the OR-mask has
        assert r["always_mask"] & r["ever_mask"] == r["always_mask"], r
        assert r["has_purchased"] == bool(r["ever_mask"] & 8), r


def test_phrase_search_positive(spark):
    got = rows("phrase_search_q", spark)
    assert got and all(r["n_occurrences"] > 0 for r in got)


def test_debounce_counts(spark):
    for r in rows("debounce_q", spark):
        assert 0 < r["n_debounced"] < r["n_events"], r


def test_fair_interleave_fairness(spark):
    got = rows("fair_interleave_q", spark)
    assert len(got) == 40
    # strict fairness: with 20 sources, the first 20 picks are all rank-1
    ranks = sorted(r["rk"] for r in got)
    assert ranks[0] == 1 and ranks[-1] <= 3, ranks


def test_parent_share_sums(spark):
    got = rows("parent_share_q", spark)
    by_region = {}
    total = 0.0
    seen_regions = set()
    for r in got:
        by_region.setdefault(r["region"], 0.0)
        by_region[r["region"]] += r["share_of_region"]
        if r["region"] not in seen_regions:
            seen_regions.add(r["region"])
            total += r["region_share_of_total"]
    for reg, s in by_region.items():
        assert abs(s - 1.0) < 1e-4, (reg, s)
    assert abs(total - 1.0) < 1e-4, total


def test_id_gaps_match_synthesized_deletions(spark):
    got = rows("id_gaps_q", spark)
    assert got
    for r in got:
        # all synthesized gaps are single deleted keys with id % 97 == 13
        assert r["gap_len"] == 1 and r["gap_start"] % 97 == 13, r


def test_wilson_interval_brackets_rate(spark):
    for r in rows("wilson_ci_q", spark):
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0, r


def test_nb_fit_overdispersion(spark):
    (r,) = rows("basket_nb_fit_q", spark)
    assert r["mean_size"] > 0 and r["var_size"] > 0, r
    if r["var_size"] > r["mean_size"]:
        assert r["nb_r"] > 0, r


def test_rich_club_density_bounds(spark):
    for r in rows("rich_club_q", spark):
        assert 0.0 <= r["phi"] <= 1.0, r


def test_sorted_neighborhood_counts(spark):
    (r,) = rows("sorted_neighborhood_q", spark)
    assert r["n_matches"] <= r["n_candidates"], r
    assert r["min_lev"] >= 1, r  # no exact duplicate names


def test_twa_within_value_range(spark):
    got = rows("twa_q", spark)
    assert got
    for r in got:
        assert r["span_us"] > 0 and r["n_intervals"] > 0, r


def test_hll_intersect_bound_holds(spark):
    (r,) = rows("hll_intersect_q", spark)
    assert r["est_within_bound"] is True, r
    assert r["exact_inter"] <= min(r["n_a"], r["n_b"]), r
