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
# Rounds 1-4 cumulatively hash-checked 180 of the 294 currently registered
# queries (zero failures; a 181st checked query was retired for its
# verified twin). The names below are everything that has never
# appeared in any CORRECTNESS artifact — ~50 clear this round, the
# remainder (round-5 additions included) front-load round 6. The
# round-4-checked 50 rotate BEHIND the backlog (they keep registration
# order there). New queries added in-round append to the END of this
# tuple: they are also never-checked, but the older debt outranks them.
_SWEEP_FIRST = (
    "fn_try_safe", "reshape_scd2", "win_interpolate_linear",
    "fn_sql_udf", "join_hint_shuffle_hash", "ext_repetition_score",
    "fn_variant_parse", "ext_chunk_overlap", "ext_domain_mix_temperature",
    "fn_string_collation", "agg_boolean_bitwise", "udtf_python_native",
    "sql_parameterized", "stream_stream_join", "agg_bitmap_distinct",
    "source_python_datasource_stream", "scan_csv_stats",
    "stream_session_live", "sink_cluster_zorder", "stream_sliding_live",
    "ext_dedup_url_canonical", "sink_sized_files", "fn_higher_order",
    "ext_matryoshka_truncate", "join_asof_tolerance",
    "composite_large_volume_customer", "ext_pmi_collocations",
    "scan_text_roundtrip", "win_first_last_nth", "ext_ann_recall_report",
    "fn_regex", "composite_returned_item", "stream_stream_join_outer",
    "composite_promo_revenue", "ext_bpe_merge_step", "stream_complete_mode",
    "fn_crypto_tokenize", "win_ewma", "agg_listagg_mode",
    "agg_weighted_median", "ext_skyline_pareto", "agg_mutual_information",
    "agg_cohort_retention", "ext_pack_efficiency", "ext_gini_concentration",
    "join_geo_grid_neighbors", "set_symmetric_diff",
    "ext_dedup_soft_downweight", "ext_dedup_containment",
    "ext_dedup_incremental", "ext_template_dedup",
    "ext_dedup_threshold_curve", "ext_mmr_diversify", "ext_cluster_purity",
    "ext_tokenizer_fertility", "ext_tokenizer_coverage",
    "ext_langid_confusion", "ext_bigram_logprob",
    "ext_token_budget_allocator", "ext_shard_skew_report",
    "ext_quality_ensemble", "ext_hits_bipartite", "ext_image_phash_dct",
    "ext_audio_vad_segments", "fn_interval_arithmetic", "agg_event_funnel",
    "scan_state_store", "scan_state_metadata", "stream_update_mode",
    "agg_observe_metrics",
    # round-5 additions (never checked, but newer than the debt above)
    "ext_domain_cap", "ext_cross_shard_dupes", "ext_dedup_bloom_gate",
    "ext_hard_negatives", "ext_heavy_hitters_cms",
    "stream_chained_window_agg", "scan_xml_roundtrip",
    "ext_knn_graph_lsh", "stream_stream_join_full_outer",
    "ext_label_spread_knn", "sql_lateral_column_alias",
    "sink_python_datasource", "sink_stream_python_datasource",
    # round-5 late additions (newest debt, behind everything above)
    "sql_group_by_all", "ext_js_divergence", "ext_curriculum_order",
    "ext_ndcg_eval", "ext_unicode_normalize", "ext_embedding_whiten",
    "ext_quality_calibration_bins", "ext_logreg_train_step",
    "ext_vocab_coverage_curve", "ext_feature_hash_embed",
    "ext_kmeans_update_step", "agg_theta_sketch_intersect",
    "ext_epoch_shuffle_audit", "reshape_transpose",
    "agg_ohlc_resample", "sort_limit_offset", "udf_cogroup_merge",
    "ext_benford_anomaly", "ext_otsu_threshold", "ext_vocab_growth_heaps",
    "ext_preference_pair_audit", "ext_wilson_ci", "ext_burstiness",
    "ext_readability_flesch", "agg_crosstab_stat",
    "ext_data_tests", "ext_psi_drift", "udf_apply_in_arrow",
    "ext_cdc_chunking", "ext_chi2_independence", "agg_attribution_last_touch",
    "agg_market_basket_lift", "ext_stylometry_delta",
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
