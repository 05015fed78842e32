"""Operator library — one module per SURVEY.md §2 family.

Importing ``load()`` registers every declared query in
``project_etl_spark.registry.REGISTRY``.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "llm_dedup",
    "llm_curation",
    "llm_similarity",
    "llm_text",
    "llm_multimodal",
    "udfs",
    "streaming_twins",
    "functions",
    "sql_surface",
    "sql_dialect",
    "windows",
    "streaming_live",
    "pydatasource",
    "scans",
    "filters",
    "joins",
    "aggregates",
    "composite",
    "sorts",
    "setops",
)

# The external verification sweep checks queries in registration order with
# a ~50-entry per-round budget. Window policy (rotated every round): the
# ENTIRE never-driver-checked backlog goes first, oldest evidence debt
# leading, so each round's ~50-slot window is 100% first-time evidence.
# Rounds 1-9 cumulatively hash-checked 379 of the 431 queries registered
# at r9 (zero failures ever; CORRECTNESS_r09 cleared the first 50 names
# of the round-9 backlog, and those names now rotate BEHIND this tuple in
# registration order). The never-driver-checked backlog is now 118 names:
# the 53-name round-8/9 tail leads (oldest evidence debt first), then the
# 65 round-10 additions (14 TPC-H-shape composites, the privacy/DP pair,
# the stats battery, the counterfactual family incl. doubly-robust, the
# graph pair + modularity, MaxSim, the Kalman/GARCH recursions, CCF,
# Shapley, RBO, Holm, Cochran Q, Nelson-Aalen, the linkage EM step,
# Tukey HSD, Grubbs, Mantel-Haenszel, Borda, IPF raking, PAV isotonic,
# Davies-Bouldin, the periodogram, Fisher indices, weighted kappa, the
# ADF gate, linear MMD, token infogain, successive halving,
# Spiegelhalter Z, log-rank, DiD, RDD, SMD balance, DeLong AUC,
# Good-Turing, Chao1, the negbin census, Durbin-Levinson PACF,
# Cronbach alpha, the source jackknife) — the r10 ~50-slot window
# clears the first 50,
# leaving ~68 for r11's window. Every name is ALSO FLOAT-HEX bit-exact
# locally at sf0.1 (full-registry sweep each round, ORACLE_SF01_r{N}.json,
# pinned at-HEAD by tests/test_docs_sync).
#
# Post-backlog state (this rotation EXECUTES the r10 re-verification
# plan): the second block promotes 10 plan-complex queries (index
# lifecycle, stream-stream joins, recursion, CC closure) for a second
# driver pass so future windows re-verify the riskiest plans first once
# first-time evidence is exhausted. After CORRECTNESS_r10 lands, rotate
# again: drop its 50 names, keep the remaining backlog + this block.
_SWEEP_FIRST = (
    "win_rolling_correlation", "ext_lsh_scurve_design",
    "ext_audio_gain_normalize", "agg_anova_oneway",
    "agg_mann_kendall_trend", "ext_group_kfold", "agg_interpurchase_time",
    "sql_session_variables", "agg_segment_migration", "fn_luhn_checksum",
    # round-8 additions append BELOW (never-checked, newest debt)
    "agg_hdr_latency_quantiles", "ext_bradley_terry_step", "win_rsi",
    "ext_sketch_shard_merge_audit", "stream_hdr_buckets",
    "sink_dedup_index_retract", "ext_quality_threshold_sweep",
    "ext_token_weighted_resample", "ext_source_length_quantiles",
    "stream_session_event_timeout",
    # round-9 additions append BELOW (never-checked, newest debt)
    "ext_lsh_band_sweep_indexed", "ext_kneser_ney_bigram",
    "ext_self_bleu_adjacent", "agg_changepoint_binseg", "ext_script_mix",
    "sql_unpivot_native", "join_hint_sort_merge", "ext_hnsw_layer_plan",
    "ext_cluster_size_powerlaw", "ext_uncertainty_sample",
    "agg_retention_halflife", "win_hurst_exponent", "agg_lorenz_curve",
    "ext_ngram_entropy_rate", "ext_filter_agreement",
    "scan_partition_pruned", "fn_string_format", "ext_image_entropy",
    "composite_market_share", "ext_type_token_ratio",
    "ext_cosine_pair_histogram", "ext_audio_spectral_flatness",
    "ext_adaboost_stump_step", "ext_winsorized_stats",
    "ext_naive_bayes_step", "ext_brier_decomposition", "ext_cuped_adjust",
    "ext_gumbel_topk_sample", "ext_ldiversity_audit",
    "agg_process_capability", "ext_fellegi_sunter_weights",
    "ext_sprt_monitor", "win_page_hinkley",
    # round-10 additions append BELOW (never-checked, newest debt)
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
    # re-verification block (already driver-green once; promoted for a
    # second pass of the most plan-complex queries once the backlog
    # above is exhausted)
    "sink_dedup_index", "sink_dedup_index_merge",
    "ext_dedup_incremental_indexed", "stream_stream_join",
    "stream_stream_join_outer", "stream_stream_join_full_outer",
    "sql_recursive_cte", "ext_dedup_connected_components",
    "ext_lsh_band_sweep",
)


def load() -> None:
    from project_etl_spark.registry import REGISTRY

    for m in _MODULES:
        import_module(f"{__name__}.{m}")
    missing = [n for n in _SWEEP_FIRST if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_SWEEP_FIRST names unknown queries: {missing}")
    front = set(_SWEEP_FIRST)
    tail = [n for n in REGISTRY if n not in front]
    ordered = {n: REGISTRY[n] for n in (*_SWEEP_FIRST, *tail)}
    REGISTRY.clear()
    REGISTRY.update(ordered)
