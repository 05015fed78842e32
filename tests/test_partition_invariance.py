"""Empirical reduction-order invariance: the engine's central numeric
discipline (quantize each term, THEN integer-sum, THEN one fixed-order
double close — portable.py) claims results are independent of how Spark
partitions the reduction. This suite PROVES it for the reduction-heavy
queries by running each one under three different
``spark.sql.shuffle.partitions`` settings (1 / 7 / 32 — one merges
everything in a single task, one forces uneven merge trees) and
comparing FLOAT-HEX canonical output. A raw double SUM across rows
would flake here first — this is the cross-partitioning counterpart of
the cross-engine bit-exact sweep, and the empirical backstop for the
round-8 headroom/order-free rewrites (ANOVA, logreg, whiten, GMM,
calibration)."""

from __future__ import annotations

import pytest

from project_etl_spark.registry import load_all

REGISTRY = load_all()

#: reduction-heavy queries: corpus-scaled sums, window reduces, iterative
#: algebra — the surface where merge order could leak into values
INVARIANCE_QUERIES = [
    "agg_anova_oneway", "agg_welch_ttest", "agg_spearman_rank",
    "agg_corr_regr", "ext_logreg_train_step", "ext_embedding_whiten",
    "ext_kmeans_update_step", "ext_gmm_em_step",
    "ext_quality_calibration_bins", "ext_bradley_terry_step",
    "agg_hdr_latency_quantiles", "ext_sketch_shard_merge_audit",
    "ext_psi_drift", "ext_kl_unigram_domains", "ext_corpus_entropy",
    "agg_revenue_hhi", "ext_chi2_independence", "ext_cramers_v",
    "agg_mutual_information", "ext_unigram_logprob",
    "ext_quality_threshold_sweep", "ext_token_weighted_resample",
    "ext_source_length_quantiles", "win_rsi",
    # round-9 additions
    "ext_kneser_ney_bigram", "ext_self_bleu_adjacent",
    "agg_changepoint_binseg", "ext_script_mix",
    "ext_cluster_size_powerlaw", "win_hurst_exponent",
    "agg_retention_halflife", "ext_hnsw_layer_plan",
    "agg_lorenz_curve", "ext_ngram_entropy_rate", "ext_filter_agreement",
    "composite_market_share", "ext_type_token_ratio",
    "ext_cosine_pair_histogram", "ext_adaboost_stump_step",
    "ext_winsorized_stats", "ext_naive_bayes_step",
    "ext_brier_decomposition", "ext_cuped_adjust",
    "ext_gumbel_topk_sample", "ext_ldiversity_audit",
    "agg_process_capability", "ext_fellegi_sunter_weights",
    "ext_sprt_monitor", "win_page_hinkley",
    # round-10 additions
    "composite_min_cost_supplier", "composite_waiting_orders",
    "composite_small_quantity_revenue", "composite_top_supplier",
    "composite_lapsed_rich_customers", "composite_priority_checking",
    "composite_shipmode_priority", "composite_customer_distribution",
    "composite_parts_supplier_census", "composite_dominant_supplier",
    "composite_forecast_revenue", "composite_nation_volume",
    "composite_product_profit", "composite_value_concentration",
    "ext_dp_histogram", "ext_blocking_quality",
    "ext_kruskal_wallis", "ext_tcloseness_audit",
    "ext_ridge_normal_equations", "ext_ips_offpolicy_eval",
    "ext_adamic_adar", "ext_degree_assortativity",
    "win_kalman_local_level", "ext_colbert_maxsim", "ext_brown_forsythe",
    "ext_hill_tail_index", "ext_theil_decomposition",
    "ext_mcnemar_filters", "ext_neyman_allocation", "ext_dp_laplace_mean",
    "ext_propensity_strata_att", "win_garch_volatility",
    "win_crosscorr_lagged", "ext_shapley_attribution",
    "ext_rank_biased_overlap", "ext_holm_stepdown", "ext_cochran_q",
    "agg_survival_nelson_aalen", "ext_linkage_em_step",
    "ext_tukey_hsd", "ext_grubbs_outlier", "ext_mantel_haenszel",
    "ext_borda_rank_aggregation", "ext_raking_ipf",
    "ext_isotonic_calibration_pav", "ext_newman_modularity",
    "ext_davies_bouldin", "win_periodogram", "agg_price_index_fisher",
    "ext_weighted_kappa", "win_unit_root_adf", "ext_mmd_linear",
    "ext_token_infogain", "ext_successive_halving",
    "ext_doubly_robust_ate", "ext_spiegelhalter_z",
    "agg_logrank_test", "ext_did_estimator", "ext_rdd_lite",
    "ext_balance_smd", "ext_auc_delong_variance",
    "ext_good_turing", "ext_chao1_richness", "agg_negbin_dispersion",
    "win_pacf_durbin", "ext_cronbach_alpha", "ext_jackknife_variance",
    # round-11 additions (the statistics/eval/forecast closes — all
    # integer-reduce + fixed-order-close discipline, proven here under
    # 1/7/32 shuffle partitions like their siblings)
    "win_ljung_box", "ext_friedman_kendall_w", "ext_krippendorff_alpha",
    "ext_hosmer_lemeshow", "ext_cochran_armitage", "ext_map_mrr_eval",
    "ext_page_trend", "ext_gwet_ac1", "ext_matthews_mcc",
    "ext_cliffs_delta", "ext_fdr_by", "ext_levene_mean",
    "ext_dunn_posthoc", "ext_icc_oneway", "ext_mood_median",
    "ext_cvm_two_sample", "ext_wilcoxon_signed_rank",
    "ext_forecast_naive_benchmarks", "ext_jonckheere_terpstra",
    # round-12 additions
    "ext_adamic_adar_capped", "ext_bartlett_test", "ext_theils_u",
    "ext_goodman_kruskal_lambda", "ext_somers_d", "ext_durbin_watson",
    "ext_pettitt_test", "ext_err_eval", "ext_local_clustering",
    "ext_diebold_mariano", "ext_kuiper_test", "ext_bowker_test",
    "ext_hodges_lehmann", "win_holt_winters", "ext_sign_test",
    "ext_jarque_bera", "ext_fdr_bky", "ext_quade_test",
    # round-12 second wave
    "ext_stuart_maxwell", "ext_partial_correlation",
    "ext_delta_method_ratio", "agg_atkinson_index", "ext_fisher_exact",
    "ext_dagostino_k2", "ext_anderson_darling", "ext_ansari_bradley",
    "ext_conover_squared_ranks",
    # round-12 fifth wave (serial/stationarity closes on the day table —
    # integer-reduce + fixed-order-close discipline like their siblings)
    "ext_cox_stuart", "ext_bartels_rank", "ext_kpss_test",
    "ext_breusch_godfrey", "ext_engle_arch_lm", "ext_newey_west_slope",
    "ext_chow_test", "ext_white_test", "ext_granger_lag1",
    "ext_rbp_eval", "ext_bpref_eval", "ext_spatial_autocorr",
    "ext_getis_ord_hotspots",
    "ext_brunner_munzel", "ext_gamma_concordance", "ext_ols_influence",
    "ext_vif_panel", "ext_lilliefors",
    "ext_distance_correlation", "ext_chapman_dedup_estimate",
    "ext_hoeffding_d",
]


def _canon(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple((r[i].hex() if isinstance(r[i], float) else str(r[i]))
              for i in order)
        for r in [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_invariant_to_shuffle_partitioning(name, spark, sf_dir):
    spec = REGISTRY[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = _canon(spec.builder(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert results["1"] == results["7"] == results["32"], (
        f"{name}: output depends on shuffle partitioning — a "
        f"reduction-order leak (raw double SUM?)")


#: timestamp-heavy queries: epoch arithmetic, day bucketing, windows over
#: event time — the surface a non-UTC caller session would corrupt if
#: builders did not self-pin UTC (every builder calls
#: ensure_deterministic, which re-pins it; this proves the pin works)
TZ_SENSITIVE_QUERIES = [
    "agg_hdr_latency_quantiles", "agg_sessionize_events",
    "agg_funnel_windowed", "agg_ohlc_resample", "win_time_weighted_avg",
    "agg_seasonality_profile", "win_rsi", "agg_slo_burn_rate",
    "fn_datetime", "agg_interpurchase_time",
    # round-10 composites with date intervals / year extraction
    "composite_priority_checking", "composite_waiting_orders",
    "composite_nation_volume", "composite_product_profit",
    "composite_market_share",
    # round-10 wave 6: NTZ->timestamp epoch-day bucketing / year extraction
    "win_periodogram", "agg_price_index_fisher",
    # round-10 wave 7: epoch-day bucketing of the events series
    "win_unit_root_adf",
    # round-10 wave 8: hour-of-day covariate, timestamp-literal period
    # split, per-user duration bucketing
    "ext_balance_smd", "ext_did_estimator", "agg_logrank_test",
    # round-10 wave 9: epoch-day bucketing of the events series
    "agg_negbin_dispersion", "win_pacf_durbin",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE_QUERIES)
def test_result_invariant_to_caller_session_timezone(name, spark, sf_dir):
    """Asia/Kolkata (a half-hour offset — the sharpest probe for day and
    window bucketing) set by the CALLER before the builder runs: output
    must equal the UTC run because every builder re-pins UTC itself.
    A regression here breaks every events/timestamp query against the
    driver's oracle."""
    spec = REGISTRY[name]
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    utc = _canon(spec.builder(spark, sf_dir))
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        hostile = _canon(spec.builder(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert hostile == utc, (
        f"{name}: output depends on the caller's session timezone — "
        f"ensure_deterministic's UTC pin is not reaching this builder")


#: scan-reduce queries whose map-side combine tree changes with the
#: input-split size
SPLIT_SENSITIVE_QUERIES = [
    "agg_anova_oneway", "ext_corpus_entropy", "agg_welch_ttest",
    "ext_logreg_train_step", "ext_gmm_em_step", "agg_revenue_hhi",
    "ext_embedding_whiten", "agg_groupby_stats",
]


@pytest.mark.parametrize("name", SPLIT_SENSITIVE_QUERIES)
def test_result_invariant_to_input_split_size(name, spark, sf_dir):
    """64 KiB vs 128 MiB maxPartitionBytes: tiny splits multiply the
    scan tasks and reshape the partial-aggregation merge tree — the
    input-side counterpart of the shuffle-partitions test."""
    spec = REGISTRY[name]
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        tiny = _canon(spec.builder(spark, sf_dir))
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
        normal = _canon(spec.builder(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
    assert tiny == normal, (
        f"{name}: output depends on input split size — a map-side "
        f"reduction-order leak")


#: join-heavy queries where AQE rewrites the physical plan at runtime
#: (skew-join splitting, partition coalescing, broadcast demotion)
AQE_SENSITIVE_QUERIES = [
    "join_inner_equi", "join_skew_salted", "join_range_interval",
    "ext_dedup_near_lsh_verified", "join_dynamic_partition_pruning",
    "ext_simhash_hamming_join", "composite_large_volume_customer",
]


@pytest.mark.parametrize("name", AQE_SENSITIVE_QUERIES)
def test_result_invariant_to_aqe(name, spark, sf_dir):
    """AQE on vs off: adaptive execution replans joins and coalesces
    partitions at runtime — values must not care. (AQE is ON in the
    engine defaults; this pins that nothing accidentally depends on
    the adaptive plan shape, so a deploy that disables it for
    debugging still matches the oracle.)"""
    spec = REGISTRY[name]
    before = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = _canon(spec.builder(spark, sf_dir))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = _canon(spec.builder(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
    assert off == on, f"{name}: output depends on AQE plan rewrites"
