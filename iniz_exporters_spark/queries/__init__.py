"""Query registry: every implemented operator as a (Spark fn, oracle SQL) pair.

This is the engine's correctness surface. Each entry demonstrates one operator
family from SURVEY.md §2 (or the §7 extension surface) as an idiomatic Spark
DataFrame plan, paired with ANSI SQL that DuckDB runs on the same parquet
tables. The driver hash-compares both at sf0.01.

Conventions that make cross-engine hash-equality deterministic — the full
playbook, with the incident behind each rule and the new-operator
checklist, is /root/repo/DETERMINISM.md. Highlights:
  * Every computed column is aliased identically in Spark and SQL.
  * Double aggregations go through exact DECIMAL sums (order-independent),
    then one final ROUND(CAST(.. AS DOUBLE), n) — fp-addition-order noise
    can never reach the compared value. Squared terms: Spark decimal(16,6)
    factors / DuckDB ≥ (19,6) (DETERMINISM.md rule 2).
  * Bin/bucket keys are pure integer arithmetic, never ROUND(double).
  * Columns that can round to zero from below get `+ 0.0` on both engines
    (signed-zero string divergence).
  * Data-dependent denominators are NULLIF-guarded on both engines.
  * LIMIT queries order by a unique tiebreaker so the row *set* is stable.
  * Timestamps are UTC in both engines (session.py pins the session tz);
    oracle epochs are floored to whole seconds.
"""

from iniz_exporters_spark.queries._base import (
    REGISTRY, QuerySpec, register, _dec, _money,
)
from iniz_exporters_spark.queries.p01 import (
    BPE_ISH, _EDGES_ORACLE, _SQL_FINGERPRINT, _SQL_NORM_TEXT,
    _SQL_POLY, _SQL_SHINGLE_SET, _SQL_SIMHASH_CTE, _SQL_TOKENS,
    _derived_edges, _sql_minhash_sigs, ann_bucketed_q, anti_join_exclude,
    any_nonempty_cols, approx_distinct_check, array_norm_embeddings, asof_query,
    audit_stopchar, band_lookup_prices, bpe_token_count, cast_discriminator,
    chain_join, conditional_agg, cube_agg, datetime_breadth,
    dedup_exact_q, distinct_count, doc_fingerprint_q, embedding_cosine_neardup_q,
    fanout_regroup, filter_eq, filter_like, graph_reachability,
    graph_topo_levels, group_concat_distinct, group_concat_ordered, grouping_sets_agg,
    histogram_bins, intersect_except_custs, interval_join_events, ivf_flat_topk_q,
    join_dim_broadcast, json_extract_props, knn_bruteforce_q, lang_id_q,
    latest_per_key, left_join_const_conjunct, levenshtein_nations, minhash_estimate_q,
    minhash_signatures_q, minmax_by_agg, neardup_pairs_q, ngram_jaccard_pairs_q,
    null_handling_funcs, order_limit, percentile_agg, pipeline_clean_corpus,
    pivot_dynamic_langs, pivot_static, proj_alias, q1_pricing_summary,
    q4_exists_priority, quality_score_q, regexp_first_word, rollup_agg,
    salted_skew_join_q, sample_poly_hash, scalar_funcs, self_join_pairs,
    semi_join_customers, seq_rank, session_window, simhash_neardup_q,
    simhash_q, sliding_window, stats_agg_family, string_funcs_breadth,
    token_count_q, tpch_q10, tpch_q11, tpch_q12,
    tpch_q13, tpch_q14, tpch_q15, tpch_q16,
    tpch_q17, tpch_q18, tpch_q19, tpch_q2,
    tpch_q20, tpch_q21, tpch_q22, tpch_q3,
    tpch_q4, tpch_q5, tpch_q6, tpch_q7,
    tpch_q8, tpch_q9, tumbling_window, union_distinct,
    unpivot_part_metrics, window_lag_gaps, window_moving_avg, window_range_frame,
    window_rank_family, window_topk,
)
from iniz_exporters_spark.queries.p02 import (
    _BM25_ALL_TERMS, _BM25_QUERIES, _BM25_Q_VALUES, _BM25_TERMS,
    _BPE_MERGES, _GOPHER_STOP_SQL, _KM_DIST, _MIX_RATES,
    _MM_EVERY_N, _MM_FB, _PHASH_BANDS_CTE, _PII_SPIKE_SQL,
    _PR_STEP, _SQL_QW, _SQL_TOK_ROWS, _WS_CLASS,
    _band_sql, _bpe_apply_sql, _bpe_learn_sql, _jl_sql,
    _negative_samples_sql, _phash_band_sql, _phash_payload, _pii_redact_sql, _pq_subspace_sql,
    _synth_url, _zorder16, analyze_table_stats, anomaly_zscore,
    approx_quantile_check, array_set_ops, bigram_logprob_query, bm25_score_q,
    bm25_search_topk, bpe_apply_q, bpe_learn64, bpe_learn_q,
    bpe_merge_pairs_q, canonical_longest_q, cdc_apply_changes, char_entropy_q,
    chunk_tokens_q, cohort_retention_q, connected_components_q, contamination_overlap,
    corpus_diff_q, dau_wau_stickiness, dedup_rate_by_source, dq_expectations,
    dup_spans_q, embedding_dim_stats, full_outer_reconcile, funnel_stages,
    gopher_filter_q, hard_negatives_q, host_cap_sample, host_rate_sample_q,
    image_phash_q, int8_quantize_check, inverted_index_q, ivf_multiprobe_topk,
    ivm_merge_counts, jl_project_q, kmeans_assignments, lang_mix_by_source,
    mad_outliers_q, map_funcs, mixture_sample_q, multimodal_frame_stats,
    negative_samples_q, normalize_nfc_q, nullsafe_join_nations, oov_rate_q,
    pack_sequences_q, pagerank_top, phash_neardup_q, pii_redact_q,
    posexplode_embeddings, pq_codes, quality_calibration_q, quality_classifier,
    quantile_bins, rank_dense_rank, regression_per_group, repetition_ratio,
    resample_interpolate_q, reservoir_per_group_q, rollup_reuse_daily, rrf_fuse_q,
    scd2_intervals, semdedup_keep, sessionize_events, skew_profile_q,
    span_dedup_trim_q, span_novelty_q, tfidf_top_terms_q, time_to_convert_q,
    token_pmi_q, token_psi_q, train_test_split, unigram_logprob,
    url_canonicalize_q, url_parts_q, vocab_topk, weighted_sample_q,
    whitened_norm_q, window_distinct_running, window_fill_forward, winsorize_prices_q,
    zorder_layout,
)
from iniz_exporters_spark.queries.p03 import (
    BASKET_CAP, _COV_SQL_EX, _KM_PRELUDE, _capped_baskets,
    _dsum, _km_eval_frame, _pq_lut_sql, adamic_adar_q,
    ann_recall_check, attribution_q, benford_audit_q, bloom_prune_join_q,
    calinski_harabasz_q, centroid_drift_q, chi2_independence_q, clustering_coeff_q,
    cms_error_check, compaction_plan_q, containment_pairs_q, cusum_changepoint_q,
    decontaminated_split_q, degree_powerlaw_q, dsir_weights_q, embedding_covariance_q,
    entropy_ldiversity_q, event_paths_q, ewma_q, feature_hash_q,
    gini_q, grid_density_q, hash_split_q, heaps_law_q,
    hll_error_check, incremental_neardup_q, interval_concurrency_q, k_anonymity_q,
    kcore_q, kneser_ney_q, ks_test_q, length_batches_q,
    lm_perplexity_q, markov_transitions_q, maxsim_q, mi_feature_q,
    mix_temperature_q, pareto_frontier_q, pca_project_check, poisson_bootstrap_q,
    pq_adc_topk_q, rake_keywords_q, record_linkage_q, retrieval_eval_q,
    roc_auc_q, rolling_autocorr_q, sentence_stats_q, shuffle_order_topk,
    silhouette_q, stl_decompose_q, stratified_alloc_q, template_prefix_q,
    triangle_count_q, zipf_fit_q,
)
from iniz_exporters_spark.queries.p04 import (
    _CE, _CONCEPT_FIXTURE_DIR, _CONCEPT_FIXTURE_TABLES, _FIXTURES_ROOT,
    _longest_chain_level, association_rules_q, assortativity_q, basket_nb_fit_q,
    calendar_features_q, ccnet_bucket_q, cluster_nmi_q, concepts_export_q,
    correlation_matrix_q, cuped_q, daily_bands_q, debounce_q,
    doc_cosine_sparse_q, dp_counts_q, dup_payment_q, exact_median_q,
    fair_interleave_q, flags_rollup_q, forecast_eval_q, hits_q,
    hll_intersect_q, id_gaps_q, js_divergence_q, label_propagation_q,
    leakage_check_q, lexical_stats_q, margin_ratio_pairs_q, modularity_q,
    nc_classifier_q, parent_share_q, phrase_search_q, readability_q,
    rfm_segment_q, rich_club_q, running_balance_resets_q, skipgram_pairs_q,
    sorted_neighborhood_q, source_similarity_q, star_components_q, target_encode_loo_q,
    theil_sen_q, try_parse_q, twa_q, twonn_dim_q,
    wilson_ci_q, woe_iv_q,
)
from iniz_exporters_spark.queries.p05 import (
    _LOC_FIXTURE_DIR, _OT_FIXTURE, _SET_FIXTURE_CSV, average_precision_q,
    brown_forsythe_q, burstiness_q, cliffs_delta_q, cohens_kappa_q,
    concept_set_q, cramers_v_q, dataset_card_q, dedup_cluster_stats_q,
    distinct_ngram_diversity_q, good_turing_q, hill_tail_index_q, hurst_exponent_q,
    isotropy_q, kendall_tau_q, km_survival_q, kruskal_wallis_q,
    lang_confusion_q, ljung_box_q, locations_export_q, lsh_precision_eval_q,
    mann_kendall_q, mann_whitney_q, markov_entropy_rate_q, matryoshka_fidelity_q,
    matthews_corr_q, mcnemar_q, neighbor_jaccard_q, ngram_coverage_q,
    odds_ratio_q, ohlc_bars_q, ordertypes_export_q, page_hinkley_q,
    sample_entropy_q, session_gap_stats_q, simpson_diversity_q, spearman_corr_q,
    stratified_split_q, theil_u_q, tokenizer_fertility_q, trimmed_mean_q,
    weighted_jaccard_q, yule_k_q,
)
from iniz_exporters_spark.queries.p06 import (
    _fcm_oracle, abc_analysis_q, acf_q, anova_f_q,
    bh_fdr_q, brier_decomposition_q, collocation_llr_q, component_density_q,
    cronbach_alpha_q, cvar_q, dickey_fuller_q, drawdown_q,
    energy_distance_q, friedman_q, fuzzy_cmeans_q, granger_q,
    herfindahl_q, hubness_q, isotonic_calibration_q, lift_gain_q,
    ltv_cohort_q, moran_i_q, newsvendor_q, partial_corr_q,
    permutation_test_q, power_analysis_q, price_index_q, runs_test_q,
    seasonal_strength_q, sprt_q, t_closeness_q, theil_index_q,
    tukey_hsd_q, wasserstein_q, welch_ttest_q, xi_correlation_q,
)
from iniz_exporters_spark.queries.p07 import (
    abc_xyz_q, array_hof_breadth, bandit_replay_q, boxcox_q,
    bradley_terry_q, conformal_interval_q, did_q, dunn_test_q,
    ece_q, edge_support_q, funnel_significance_q, geometric_median_q,
    grid_dbscan_q, haar_energy_q, hodges_lehmann_q, join_cardinality_audit_q,
    km_greenwood_q, knn_loo_accuracy_q, log_rank_test_q, longest_streak_q,
    lorenz_curve_q, multi_touch_attribution_q, mutual_knn_q, quantile_normalize_q,
    ransac_trend_q, regression_diagnostics_q, rmst_q, seasonal_esd_q,
    sinkhorn_plan_q, trend_break_q, welford_merge_q, youden_j_q,
)
from iniz_exporters_spark.queries.p08 import (
    allan_variance_q, attributable_risk_q, box_counting_q, capture_recapture_q,
    chao1_q, chow_test_q, clustering_null_q, empirical_bayes_q,
    enrichment_q, ewma_control_q, gini_split_q, ipw_ate_q,
    kendall_w_q, littles_law_q, mantel_haenszel_q, median_polish_q,
    mediation_q, oaxaca_blinder_q, pacf_q, poissonness_q,
    pot_evt_q, process_capability_q, rdd_q, records_test_q,
    risk_adjusted_q, rolling_beta_q, shift_function_q, shift_share_q,
    smd_balance_q, tost_q, turning_points_q, variance_components_q,
    vif_q, weekday_effect_q, xbar_r_q,
)
from iniz_exporters_spark.queries.p09 import (
    _BLOOM_M, _GOPHER_STOPS, _SQL_STOPS,
    asof_nearest_q, audience_stability_q, bff_dedup_q,
    binary_quantize_recall_q,
    bloom_fpr_check_q, chunk_dedup_q, cochran_q_test,
    copeland_q, croston_q, gopher_rules_q, gumbel_pwm_q, holt_linear_q,
    knee_point_q, lateness_audit_q, mattr_q, median_test_q,
    mixture_domain_weights_q,
    rep_ngram_fractions_q, robust_shape_q, simpson_paradox_q,
    split_doc_boundary_q, token_ngram_decontam_q, u_chart_q,
    winnowing_fingerprints_q, winsor_effect_q,
)
from iniz_exporters_spark.queries.p10 import (
    _BLOCK_RULES, _HOST_SYNTH_SQL, _MIRROR_FP_SQL, _MIRROR_HOST_SQL,
    _MMR_K_CAND, _MMR_K_PICK, _MMR_LAMBDA, _NF4_LEVELS,
    _NF4_MIDPOINTS, _PII_RISK_SPIKE_SQL, _SCRIPT_CLASSES,
    _SCRIPT_SPIKE_SQL, _SQL_LUHN, _mmr_sql, _nf4_case_sql, _nf4_nearest,
    c4_rule_flags, c4_rules_q, dup_growth_curve_q, fairness_parity_q,
    host_blocklist_q, host_mirror_q, softdedup_weights_q,
    _KC_PICKS, _SQL_D2, _TRUNC_GRID, _kcenter_sql,
    kcenter_coreset_q, lsh_scurve_q, mahalanobis_outliers_q,
    mmr_rerank_q, nf4_quantize_q,
    pii_risk_score_q, pii_risk_scores,
    pipeline_waterfall_q, rouge_n_eval_q, script_mix_flags, script_mix_q,
    span_corruption_q,
    theta_forecast_q, truncation_loss_q, unimax_alloc_q,
    wilcoxon_signed_rank_q,
)
from iniz_exporters_spark.queries.p11 import (
    _DECON_K, _DECON_TAU, _ESD_OCC_CAP, _ESD_SEED, _ESD_TRIM,
    _ESDC_FLAG, _ESDC_K,
    _PACK_LEN, _QTS_TAUS, _qts_case_sql,
    _DCE_CHUNK, _DCE_DECAY, _DCE_EPOCHS, _DCE_RSTAR, _dce_grid_sql,
    data_constrained_epochs_q,
    embedding_decontam_q, exact_substring_decontam_q,
    exact_substring_dedup_q,
    quality_calibration_curve_q, quality_threshold_sweep_q,
    seq_packing_q,
)
from iniz_exporters_spark.queries.p12 import (
    _ANN_BITS_SQL, _ANN_TARGET_BUCKET, _BP_DF, _EM_PREFIX, _MMD_HAM,
    _MMD_K, _ann_bits,
    _PSI_SQL_PROB, _SQL_C4_FULL, _SQL_GOPHER_FULL,
    boilerplate_fraction_q, cross_source_dup_matrix_q,
    doc_memorization_risk_q, eval_dirty_tokens_q,
    extractable_memorization_q, filter_agreement_q, knn_loo_ann_q,
    multimodal_decontam_q, quality_psi_drift_q, tokenizer_parity_q,
)
from iniz_exporters_spark.queries.p13 import (
    _ALIGN_GRID, _AQ_MAX_HIBAND, _AQ_MIN_DUR, _AQ_RMS_HI, _AQ_RMS_LO,
    _AUD_HAM, _SQL_ALIGN_GRID, _SQL_AUDIO_FP_CTE, _SQL_WAV_SAMPLES_CTE,
    _XL_MOD, _XL_TAU, _aud_band_sql, _wav_payload,
    audio_neardup_q, audio_quality_filter_q,
    crosslingual_decontam_q, crossmodal_hard_negatives_q,
    imagetext_alignment_q,
)
