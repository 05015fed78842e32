"""Physical-plan audits (the 100 TB posture, SURVEY.md §4): these assertions
pin the plan *shapes* that matter at scale — pushdown reaching the parquet
scan, dimensions broadcasting, top-k compiling to TakeOrderedAndProject, and
(critically) no nested-loop fallback in the bucketized non-equi joins.
"""

from __future__ import annotations

import pytest

from project_etl_spark.registry import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].builder(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_parquet")
    assert "PushedFilters: [IsNotNull(r_regionkey), GreaterThanOrEqual(r_regionkey,0)]" in plan
    # column pruning: only the two projected columns reach the reader
    assert "r_name" in plan.split("ReadSchema")[1].splitlines()[0]


def test_flagship_filter_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "agg_groupby_stats")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].splitlines()[0]
    assert "HashAggregate" in plan


def test_broadcast_join_no_shuffle_of_fact(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_dim")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, "topk_limit")
    assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, "sort_multikey")


@pytest.mark.parametrize("name", ["join_range_interval", "join_theta"])
def test_bucketized_joins_avoid_nested_loop(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_asof_join_is_single_window_not_join(spark, sf_dir):
    """The as-of helper must be the linear union+window plan, not a range
    join (no join operator over the big sides at all)."""
    plan = plan_of(spark, sf_dir, "join_asof")
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti")


def test_exact_sums_stay_partial_final(spark, sf_dir):
    """The quantized-sum pattern must not break two-phase aggregation."""
    plan = plan_of(spark, sf_dir, "agg_groupby_stats")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # formatted mode marks codegen stages with a '*' prefix
    plan = plan_of(spark, sf_dir, "project_derived")
    assert "* Project" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key: no Exchange over either input."""
    df = REGISTRY["join_bucketed_colocated"].builder(spark, sf_dir)
    import contextlib, io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    # the scans feeding the join must carry 'Bucketed: true' and no Exchange
    assert "Bucketed: true" in plan
    pre_agg = plan.split("HashAggregate")[0]
    assert "Exchange" not in pre_agg


def test_disjunctive_predicates_push_to_both_scans(spark, sf_dir):
    """Q19 shape: the OR-of-brackets must reach BOTH parquet readers as
    pushed filters (quantity envelope on lineitem, brand/size on part),
    not evaluate post-join over unfiltered scans."""
    plan = plan_of(spark, sf_dir, "composite_disjunctive_predicates")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity" in ln and "Or(" in ln for ln in pushed)
    assert any("p_brand" in ln and "Or(" in ln for ln in pushed)


def test_observe_metrics(spark, sf_dir):
    from project_etl_spark.io import table
    from project_etl_spark.operators.composite import observed_counts
    df, obs = observed_counts(table(spark, sf_dir, "orders"))
    n = df.count()
    assert obs.get["n_rows"] == n


# Queries allowed to contain a nested-loop/cartesian operator because one
# side is constant-bounded (16x16 grid generation, single-row config cross,
# the one-row broadcast query-vector dimension from query_vector(), or the
# k=4-row broadcast centroid side of the k-means assignment step).
_BOUNDED_NLJ_OK = {"join_cross_grid", "ext_sim_search_topk", "ext_ann_ivf_topk",
                   "ext_kmeans_assign", "ext_semdedup", "ext_bm25_topk",
                   # 1-row scalar cross joins (corpus totals / vertex count,
                   # the date-span bounds row feeding the spine sequence)
                   "ext_dsir_weights", "ext_pagerank_iter",
                   "win_interpolate_linear", "ext_pmi_collocations",
                   "ext_ann_recall_report",
                   # inherits bm25's stats cross + the query-vector cross
                   "ext_hybrid_retrieval_rrf",
                   # 1-row scalar crosses (count x count summaries)
                   "ext_dedup_method_census", "ext_lsh_band_sweep",
                   # 12-row candidate set: query-vector cross + bounded
                   # pairwise-sims cross
                   "ext_mmr_diversify",
                   # 3-row broadcast threshold side joined by inequality
                   "ext_dedup_threshold_curve",
                   # inherits kmeans_assign's broadcast 4-centroid cross
                   "ext_cluster_purity", "ext_kmeans_update_step",
                   # broadcast ~5-row query-vector side (vec_id % 100 == 0)
                   "ext_hard_negatives",
                   # 1-row corpus-token-total cross (the out-of-support
                   # JS tail is closed-form, so no vocab-dense join exists)
                   "ext_js_divergence",
                   # 1-row theta crosses + <=511-row union-sample side
                   "agg_theta_sketch_intersect",
                   # 3-row quantile-target side: correlated scalar reads
                   # against the ~120-row bucket table and the value grid
                   "agg_hdr_latency_quantiles",
                   # 1-row agreement/global-p95 crosses over the 4-shard
                   # bucket table
                   "ext_sketch_shard_merge_audit",
                   # k-row group table x 1-row total cross (KW close);
                   # bounded 55-row seg x bin grid; 1-row weight-vector
                   # cross feeding the ridge scoring pass
                   "ext_kruskal_wallis", "ext_tcloseness_audit",
                   "ext_ridge_normal_equations",
                   # 1-row total/threshold crosses over the bounded
                   # distinct-value / k-group tables
                   "ext_hill_tail_index", "ext_theil_decomposition",
                   # 1-row treated-total cross over the 4-stratum table
                   "ext_propensity_strata_att",
                   # bounded literal-grid crosses: 7-row lag grid over
                   # the day table, 16-row coalition grid over the
                   # user-journey table, 100-row depth grid with the
                   # <= overlap join over two 100-row prefixes
                   "win_crosscorr_lagged", "ext_shapley_attribution",
                   "ext_rank_biased_overlap",
                   # 1-row normalization crosses (k, sum-of-ratings) over
                   # the k-row source table
                   "ext_bradley_terry_step",
                   # 9-row threshold side crossed with the <=1000-row
                   # permille-bin table
                   "ext_quality_threshold_sweep",
                   # 1-row (W, sum-w2) totals cross feeding the pick algebra
                   "ext_token_weighted_resample",
                   # 2-row quantile-target side per source: correlated
                   # scalar reads against per-source bucket/value grids
                   "ext_source_length_quantiles",
                   # broadcast 8-row checkpoint side joined by inequality,
                   # plus two 1-row scalar crosses (bounds, beta)
                   "ext_vocab_growth_heaps",
                   # round-11 stats closes: 1-row totals/c0/median/harmonic
                   # crosses over bounded day/group/rank tables (Ljung-Box
                   # lag grid x day table; Friedman/Dunn k-row group x
                   # 1-row total; BY's 1-row H_m; Levene's 5-row group x
                   # 1-row total; Mood's 1-row pooled-median broadcast;
                   # JT's 5-row group side crossed with the bounded
                   # distinct-value grid)
                   "win_ljung_box", "ext_friedman_kendall_w",
                   "ext_dunn_posthoc", "ext_fdr_by", "ext_levene_mean",
                   "ext_mood_median", "ext_jonckheere_terpstra",
                   # 1-row corpus-doc-count cross feeding the VMR algebra
                   "ext_burstiness",
                   # 1-row degrees-of-freedom cross over the 6-cell table
                   "ext_chi2_independence",
                   # 1-row vocab-size cross onto the <=n_langs class table,
                   # plus the <=n_langs-row broadcast class fan-out per
                   # eval doc (one score row per class)
                   "ext_naive_bayes_step",
                   # 1-row basket-count cross + broadcast 12-word top list
                   "agg_market_basket_lift", "ext_stylometry_delta",
                   # 1-row corpus-stats cross (norm mean/var; vocab totals)
                   "ext_norm_outliers", "ext_kl_unigram_domains",
                   # 32-row replicate fan-out / 1-row moment+count crosses
                   "ext_bootstrap_ci", "agg_spearman_rank",
                   # 1-row revenue-total cross over the per-supplier reduce
                   "agg_abc_pareto",
                   # 1-row corpus-totals cross over the distinct-score reduce
                   "ext_gains_lift_table",
                   # 1-row traffic-total cross over the 168-cell grid
                   "agg_seasonality_profile",
                   # 1-row total/max-date crosses over dimension reduces
                   "ext_quota_sample", "ext_session_paths",
                   "agg_rfm_segments",
                   # 1-row stats/mean crosses over key/day reduces
                   "ext_join_skew_audit", "win_cusum_change",
                   # inherits kmeans' broadcast 4-centroid cross
                   "ext_silhouette_simplified",
                   # 1-row vertex-count cross over the bounded word graph
                   "ext_keyword_textrank",
                   # 5-row removal dimension joined by inequality onto the
                   # constant-bounded transition matrix
                   "agg_markov_attribution",
                   # inequality self-join over the ~30-row daily reduce
                   # (Mann-Kendall also crosses its two 1-row summaries)
                   "win_theil_sen", "agg_mann_kendall_trend",
                   # 1-row conformal-quantile cross over per-source reduces
                   "ext_conformal_interval",
                   # 3-row k-dimension + 1-row total crosses over the QI grid
                   "ext_kanonymity_census",
                   # 1-row funnel-entry cross over the 3-row stage census
                   "agg_funnel_windowed",
                   # inherits kmeans' broadcast per-label centroid cross
                   "ext_centroid_classifier_eval",
                   # 1-row decile-boundary cross over the counting pass
                   "agg_histogram_equidepth",
                   # 1-row median cross over the gap-band census
                   "agg_interpurchase_time",
                   # 1-row timeline-midpoint cross over the order feed
                   "agg_segment_migration",
                   # 1-row wmin/cohort-size crosses over the week reduce
                   "agg_retention_halflife",
                   # 1-row total cross over the <=6-row level census
                   "ext_hnsw_layer_plan",
                   # constant 3-row window-size dimension over the day
                   # reduce (bounded fan-out by design)
                   "win_hurst_exponent",
                   # 1-row balance-cutoff cross (Q22's uncorrelated scalar
                   # AVG subquery) over the customer scan
                   "composite_lapsed_rich_customers",
                   # 1-row regional-total cross (Q11's global-share HAVING)
                   # over the part-cardinality value relation
                   "composite_value_concentration",
                   # 1-row pooled-MSE cross over the 5-group moment table
                   "ext_tukey_hsd",
                   # inherits kmeans' broadcast 4-centroid cross
                   "ext_davies_bouldin",
                   # 1-row margin-target crosses over the 25-cell grid (x4
                   # unrolled IPF iterations)
                   "ext_raking_ipf",
                   # j <= i <= k inequality triple join over the <=16-row
                   # bin table (the PAV minimax grid)
                   "ext_isotonic_calibration_pav",
                   # 1-row edge-total cross over the |sources| community
                   # table
                   "ext_newman_modularity",
                   # 6-row literal period grid + 1-row mean cross over the
                   # bounded day reduce
                   "win_periodogram",
                   # 3x3 grade-margin grid + 1-row total cross
                   "ext_weighted_kappa",
                   # 1-row doc/label-totals cross over the token reduce
                   "ext_token_infogain",
                   # 1-row totals/AUC crosses over the distinct-score
                   # dimension (DeLong structural components)
                   "ext_auc_delong_variance",
                   # 1-row totals cross + singleton-mass scalar subquery
                   # over the count-of-counts table
                   "ext_good_turing",
                   # 3-row lag grid + scalar mean/variance subqueries
                   # over the bounded day table
                   "win_pacf_durbin",
                   # 1-row totals cross over the |sources| group table
                   "ext_jackknife_variance",
                   # round-12 stats closes: 1-row totals/coefficient
                   # crosses over bounded contingency/day tables (Theil U's
                   # MI/entropy scalar crosses; lambda's modal-margin
                   # scalar subqueries; DW's 1-row OLS-coefficient cross +
                   # residual-sum scalar subqueries; Pettitt's 1-row n
                   # cross over the day table)
                   "ext_theils_u", "ext_goodman_kruskal_lambda",
                   "ext_durbin_watson", "ext_pettitt_test",
                   # HL's (distinct-value x distinct-value) difference
                   # grid is a bounded ON TRUE join by design
                   "ext_hodges_lehmann",
                   # 1-row close of scalar subqueries over the bounded
                   # block/treatment tables
                   "ext_quade_test",
                   # round-12 second wave: 1-row marginal/total crosses over
                   # bounded value grids (AD/Ansari tot cross, Conover pool
                   # cross, Fisher's 1-row margins + observed-logp crosses
                   # and its bounded support-range join)
                   "ext_anderson_darling", "ext_ansari_bradley",
                   "ext_conover_squared_ranks", "ext_fisher_exact",
                   # round-12 fifth wave: 1-row OLS-coefficient /
                   # moment / count crosses over the calendar-bounded
                   # day table, plus the 5-row Bartlett lag grid
                   # (KPSS / Newey-West) — all constant-bounded
                   "ext_cox_stuart", "ext_bartels_rank", "ext_kpss_test",
                   "ext_breusch_godfrey", "ext_engle_arch_lm",
                   "ext_newey_west_slope", "ext_chow_test",
                   "ext_white_test", "ext_granger_lag1",
                   # 10-row literal RBP weight grid; bpref's 1-row
                   # per-query count sides; the spatial pair's 8/9-row
                   # literal offset crosses + 1-row moment crosses over
                   # the geography-bounded cell table
                   "ext_rbp_eval", "ext_bpref_eval",
                   "ext_spatial_autocorr", "ext_getis_ord_hotspots",
                   # seventh wave: 1-row totals/moment crosses over the
                   # bounded value-grid / day / correlation frames
                   "ext_brunner_munzel", "ext_ols_influence",
                   "ext_vif_panel", "ext_lilliefors",
                   # Chapman's 1-row cross of the three pair counts
                   "ext_chapman_dedup_estimate"}

_SKIP_SWEEP = {  # live streaming builders run queries, not a single plan
    "scan_binary_frames", "sink_parquet_partitioned", "source_stream_files",
    "sink_stream_foreachBatch", "stream_watermark_late", "stream_dedup",
    "stream_stateful_counter", "stream_file_sink_exactly_once",
    "stream_session_live", "stream_sliding_live",
    "source_python_datasource_stream", "stream_python_datasource_partitioned",
    "stream_stateful_counter_rocksdb", "stream_complete_mode",
    "stream_update_mode", "scan_state_store", "scan_state_metadata",
    "stream_static_join", "source_stream_rate", "stream_merge_upsert",
    "catalog_table_lifecycle", "ext_coreset_kcenter",
    # action-at-build like the streaming family: Observation metrics only
    # materialize when the observed query runs, so the builder drives it
    "agg_observe_metrics",
    # action-at-build: SET VAR executes its aggregate subquery eagerly
    "sql_session_variables",
    "stream_chained_window_agg", "stream_stream_join_full_outer",
    "stream_hdr_buckets", "stream_session_event_timeout",
    # action-at-build: the custom-format writers run their write jobs
    # inside the builder before returning the (lazy) read-back census
    "sink_python_datasource", "sink_stream_python_datasource",
    # action-at-build: the fragment-index build writes scratch parquet
    # inside the builder; the returned manifest/census reads it back
    "sink_dedup_index", "ext_dedup_census_indexed",
    "sink_dedup_index_merge", "ext_dedup_incremental_indexed",
    "sink_dedup_index_retract", "ext_lsh_band_sweep_indexed",
    # action-at-build: writes the lang-partitioned scratch layout the
    # pruned read-back then scans (dedicated plan test pins the pruning)
    "scan_partition_pruned",
}


def test_no_accidental_nested_loop_anywhere(spark, sf_dir):
    """Blanket sweep: no registered batch query may plan a cartesian or
    nested-loop join unless whitelisted as constant-bounded."""
    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        if name in _SKIP_SWEEP or name in _BOUNDED_NLJ_OK:
            continue
        plan = plan_of(spark, sf_dir, name)
        bad = [op for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
               if op in plan]
        if bad:
            offenders[name] = bad
    assert not offenders, f"nested-loop fallbacks: {offenders}"


def test_decontaminate_broadcasts_benchmark_ngrams(spark, sf_dir):
    """The benchmark 5-gram set is eval-sized, never corpus-sized: the
    contamination probe must be a broadcast hash join (map-side over the
    training n-grams), not a shuffle of the corpus."""
    plan = plan_of(spark, sf_dir, "ext_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_embedding_quantize_is_shuffle_free(spark, sf_dir):
    """int8 quantization is row-local array algebra: the plan must contain
    no Exchange at all — scan, project, done."""
    plan = plan_of(spark, sf_dir, "ext_embedding_quantize")
    assert "Exchange" not in plan


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """The point of Z-ordering: every z-bucket's (x, y) min/max envelope
    must be far tighter than the global 256x256 domain, in BOTH dimensions
    — that envelope is exactly what parquet footer stats would prune on."""
    rows = REGISTRY["sink_cluster_zorder"].builder(spark, sf_dir).collect()
    areas = [(r["max_x"] - r["min_x"]) * (r["max_y"] - r["min_y"])
             for r in rows]
    assert sum(areas) / len(areas) < 65025 / 20


def test_q18_composite_shapes(spark, sf_dir):
    """The HAVING set must broadcast into a semi join and the bounded
    top-k must compile to TakeOrderedAndProject — never a global sort or
    a shuffled semi join."""
    plan = plan_of(spark, sf_dir, "composite_large_volume_customer")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_pii_redact_is_shuffle_free(spark, sf_dir):
    """The PII scrub claims a pure map pass — its plan must contain no
    Exchange at all (concat/regex/md5 inside the scan stage)."""
    plan = plan_of(spark, sf_dir, "ext_pii_redact")
    assert "Exchange" not in plan


def test_orc_roundtrip_reads_orc(spark, sf_dir):
    """The aggregation must actually run off the ORC copy, not the source
    parquet (the format-interop claim)."""
    plan = plan_of(spark, sf_dir, "scan_orc_roundtrip")
    assert "orc" in plan.lower()
    assert "Scan parquet" not in plan


def test_bm25_is_take_ordered(spark, sf_dir):
    """Top-10 must compile to TakeOrderedAndProject, never a global sort."""
    plan = plan_of(spark, sf_dir, "ext_bm25_topk")
    assert "TakeOrderedAndProject" in plan


def test_merge_upsert_delta_side_broadcasts(spark, sf_dir):
    """The anti-join on the upsert key should broadcast the (small) delta
    key set rather than shuffling the base table."""
    plan = plan_of(spark, sf_dir, "sink_merge_upsert")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — runtime partition pruning from the filtered dim."""
    plan = plan_of(spark, sf_dir, "join_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower()


def test_lateral_decorrelates_to_window_group_limit(spark, sf_dir):
    """The correlated LATERAL (ORDER BY + LIMIT 2) must decorrelate to the
    same partial-top-k-then-join physical plan as a hand-written
    top-k-per-group — WindowGroupLimit before the shuffle, then a broadcast
    hash join; never a per-outer-row re-execution (no nested loop)."""
    plan = plan_of(spark, sf_dir, "join_lateral")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    """Scalar subquery / EXISTS / NOT EXISTS / IN must all lower to join
    operators (semi/anti/broadcast), not per-row subquery execution."""
    plan = plan_of(spark, sf_dir, "subquery_correlated")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_dsir_lambda_table_broadcasts(spark, sf_dir):
    """The 128-bucket log-ratio table must broadcast to the bigram stream
    (map-side weight join), never shuffle the corpus on the bucket."""
    plan = plan_of(spark, sf_dir, "ext_dsir_weights")
    assert "BroadcastHashJoin" in plan


def test_shard_manifest_windows_are_partitioned(spark, sf_dir):
    """The shard rank must be a salted (partitioned) window — a global
    single-partition sort would be the classic sharding bottleneck."""
    plan = plan_of(spark, sf_dir, "ext_shard_manifest")
    assert "hashpartitioning(g" in plan


def test_quality_logistic_is_shuffle_free(spark, sf_dir):
    """Classifier inference claims a pure map pass: no Exchange at all."""
    plan = plan_of(spark, sf_dir, "ext_quality_logistic")
    assert "Exchange" not in plan


def test_rrf_rankers_end_in_take_ordered(spark, sf_dir):
    """Both fused rankers must bound themselves with TakeOrderedAndProject
    before rank assignment — no ranker global-sorts its corpus."""
    plan = plan_of(spark, sf_dir, "ext_hybrid_retrieval_rrf")
    assert plan.count("TakeOrderedAndProject") >= 2


def test_argmax_is_one_aggregation_pass(spark, sf_dir):
    """max_by/min_by must stay a partial->final hash aggregate (no window,
    no sort)."""
    plan = plan_of(spark, sf_dir, "agg_argmax")
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan and "Sort" not in plan.replace("SortAggregate", "")


def test_shuffle_hash_hint_overrides_broadcast(spark, sf_dir):
    """The hint must actually flip the strategy: ShuffledHashJoin in the
    plan, and no broadcast of either join side."""
    plan = plan_of(spark, sf_dir, "join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_sort_merge_hint_overrides_broadcast(spark, sf_dir):
    """The MERGE hint must plan a SortMergeJoin — no broadcast and no
    shuffled-hash build side."""
    plan = plan_of(spark, sf_dir, "join_hint_sort_merge")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_partition_pruned_scan_prunes_at_plan_time(spark, sf_dir):
    """The lang='en' predicate must land in the scan's PartitionFilters
    (directory-level elimination), not as a post-scan Filter over all
    partitions."""
    from project_etl_spark.registry import load_all

    df = load_all()["scan_partition_pruned"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re as _re
    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan[:2000]


def test_winnowing_is_windows_only(spark, sf_dir):
    """Winnowing fingerprint selection is per-document local: two window
    passes over one doc_id partitioning, no join anywhere."""
    plan = plan_of(spark, sf_dir, "ext_winnowing")
    assert "Join" not in plan
    # formatted mode prints each node twice (tree + detail): count headers
    assert plan.count(") Exchange") <= 2  # doc_id partitioning + dedup


def test_chunk_overlap_is_shuffle_free(spark, sf_dir):
    """Chunking is derived row-locally from the token array — the chunk
    table must appear with NO exchange at all."""
    plan = plan_of(spark, sf_dir, "ext_chunk_overlap")
    assert "Exchange" not in plan and "Join" not in plan


def test_autocorr_is_single_aggregation_pass(spark, sf_dir):
    """The stack() melt must keep all three lags in ONE partial->final
    aggregate over one windowed lead pass — no per-lag union re-scan."""
    plan = plan_of(spark, sf_dir, "agg_autocorr")
    assert plan.count("Union") == 0
    assert plan.count(") Window") == 1


def test_scd2_reuses_one_window_sort(spark, sf_dir):
    """lag and lead run over the same (custkey, date, orderkey) sort: one
    shuffle, no self-join."""
    plan = plan_of(spark, sf_dir, "reshape_scd2")
    assert "Join" not in plan
    assert plan.count(") Exchange") == 1


def test_q10_composite_shapes(spark, sf_dir):
    """Returned-item revenue: date filter pushed to the orders scan,
    nation broadcast, bounded top-20 via TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "composite_returned_item")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # the date filter must reach SOME scan's PushedFilters line (the orders
    # scan; other scans also print PushedFilters, so check every segment)
    pushed = plan.split("PushedFilters")[1:]
    assert pushed and any("o_orderdate" in s.splitlines()[0] for s in pushed)


def test_q14_is_single_aggregation_pass(spark, sf_dir):
    """The promo/total ratio must be ONE conditional aggregation over one
    broadcast join — no second scan of lineitem, no shuffle join."""
    plan = plan_of(spark, sf_dir, "composite_promo_revenue")
    # formatted mode prints each node twice: count the node headers
    assert plan.count(") Scan parquet") == 2  # lineitem + part, once each
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_gate_probes_broadcast_filter(spark, sf_dir):
    """The Bloom probe must be a broadcast hash join against the <=2048-row
    filter table (map-pass over the delta), never a shuffle of the
    fingerprints or a nested loop."""
    plan = plan_of(spark, sf_dir, "ext_dedup_bloom_gate")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # filter probe + membership
    assert "struct<doc_id:bigint,text:string>" in plan  # pruned scan


def test_domain_cap_prunes_text_column(spark, sf_dir):
    """The cap census needs only (doc_id, source): the document TEXT must
    not be read — at 100 TB that pruning is the difference between a
    metadata-sized pass and a full-corpus scan."""
    plan = plan_of(spark, sf_dir, "ext_domain_cap")
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan
    assert "text" not in plan.split("ReadSchema")[1][:80]


def test_cms_reads_only_text(spark, sf_dir):
    """The sketch build/probe touches only the text column."""
    plan = plan_of(spark, sf_dir, "ext_heavy_hitters_cms")
    assert "ReadSchema: struct<text:string>" in plan


def test_calibration_bins_single_small_aggregation(spark, sf_dir):
    """Calibration claims scan-speed: features/sigmoid/rule are codegen in
    the scan stage, and the only exchange is the <=10-group bin agg."""
    plan = plan_of(spark, sf_dir, "ext_quality_calibration_bins")
    # formatted mode lists each node once in the tree and once in the
    # details; count detail headers "(n) Exchange"
    n_exchanges = sum(1 for ln in plan.splitlines()
                      if ln.startswith("(") and ln.endswith("Exchange"))
    assert n_exchanges == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_js_divergence_broadcasts_source_totals(spark, sf_dir):
    """Per-source totals (20 rows) and the corpus total (1 row) must ship
    as broadcasts; the only corpus-sized join is the token equi-join."""
    plan = plan_of(spark, sf_dir, "ext_js_divergence")
    assert "BroadcastHashJoin" in plan


def test_ndcg_panel_broadcasts_no_nlj(spark, sf_dir):
    """The eval panel's long form joins the corpus positions as a
    broadcast HASH join on the position key — never a nested loop."""
    plan = plan_of(spark, sf_dir, "ext_ndcg_eval")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_unicode_normalize_is_shuffle_free(spark, sf_dir):
    """NFC is a row-local Arrow-batched map pass: no Exchange at all, and
    the Python boundary is the vectorized eval operator."""
    plan = plan_of(spark, sf_dir, "ext_unicode_normalize")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_feature_hash_aggs_are_copartitioned(spark, sf_dir):
    """Signed-count and norm aggregations both key on doc_id; the final
    join must be hash (equi), not nested loop."""
    plan = plan_of(spark, sf_dir, "ext_feature_hash_embed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_whiten_joins_loading_table_broadcast(spark, sf_dir):
    """The 128-row loading table and the 2-row centering constants must
    broadcast; the corpus-side work is posexplode + hash aggregation."""
    plan = plan_of(spark, sf_dir, "ext_embedding_whiten")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

def test_limit_offset_is_bounded_topk(spark, sf_dir):
    """offset+limit over a sort must compile to TakeOrderedAndProject
    with both bounds — per-partition top-(offset+limit) then a driver
    merge — never a global sort."""
    plan = plan_of(spark, sf_dir, "sort_limit_offset")
    assert "TakeOrderedAndProject" in plan
    # formatted mode renders (limit=offset+limit=15, ..., offset=10) as
    # "Arguments: 15, [orderBy], [project], 10"
    assert "Arguments: 15," in plan
    assert plan.count("Exchange") == 0


def test_ohlc_is_single_aggregation(spark, sf_dir):
    """The OHLC bar is ONE hash/sort aggregation with map-side partial
    min_by/max_by — exactly one shuffle, and no window (a
    row_number-per-bucket formulation would sort every event)."""
    plan = plan_of(spark, sf_dir, "agg_ohlc_resample")
    # formatted mode prints each Exchange twice (tree node + detail
    # section), so ONE shuffle == exactly 2 occurrences
    assert plan.count("Exchange") == 2
    assert "partial_min_by" in plan and "partial_max_by" in plan
    assert "Window" not in plan


def test_cogroup_is_copartitioned(spark, sf_dir):
    """Cogroup must co-shuffle both sides on the key (two Exchanges, no
    broadcast side) into a single FlatMapCoGroupsInPandas, with the
    custkey sub-sampling predicate pushed into both scans."""
    plan = plan_of(spark, sf_dir, "udf_cogroup_merge")
    assert "FlatMapCoGroupsInPandas" in plan
    # formatted mode: each Exchange node details its distribution in an
    # "Arguments: hashpartitioning(...)" line — one per side
    assert plan.count("Arguments: hashpartitioning") == 2
    assert plan.count("% 50)") >= 2  # pushed to both scan stages


def test_otsu_reduces_before_sweeping(spark, sf_dir):
    """Otsu's threshold sweep must run over the 32-row histogram, not the
    corpus: a partial-agg histogram shuffle first, then single-partition
    windows; the scan reads only n_chars."""
    plan = plan_of(spark, sf_dir, "ext_otsu_threshold")
    assert "partial_count" in plan
    assert "Arguments: SinglePartition" in plan
    assert "ReadSchema: struct<n_chars:bigint>" in plan


def test_benford_reduces_before_windows(spark, sf_dir):
    """Benford audit: the fact table collapses to 27 (flag, digit) rows
    via a map-side-combinable count before any window touches it, and
    the scan reads only the two needed columns."""
    plan = plan_of(spark, sf_dir, "ext_benford_anomaly")
    assert "partial_count" in plan
    assert "ReadSchema: struct<l_extendedprice:double,l_returnflag:string>" in plan


def test_preference_audit_has_no_join(spark, sf_dir):
    """The pair merge must be ONE aggregation on pair_id (max_by/min_by
    recover both members) — no self-join of the scored docs."""
    plan = plan_of(spark, sf_dir, "ext_preference_pair_audit")
    assert "Join" not in plan
    assert "partial_max_by" in plan


def test_wilson_ci_single_shuffle(spark, sf_dir):
    """Pass/total counts reduce map-side; the interval algebra runs on
    |sources| rows — exactly one shuffle (2 formatted occurrences)."""
    plan = plan_of(spark, sf_dir, "ext_wilson_ci")
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan or "partial_sum" in plan


def test_data_tests_relationships_are_anti_joins(spark, sf_dir):
    """The dbt-style relationship tests must compile to hash anti joins
    (orphan scans), and the value tests to pushed codegen filters — no
    nested loops anywhere in the 8-leg union."""
    plan = plan_of(spark, sf_dir, "ext_data_tests")
    assert plan.count("Join type: LeftAnti") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_psi_reduces_to_bins_before_window(spark, sf_dir):
    """PSI must reduce the event stream to 16 (bin, cohort) counts with
    map-side partials before any window math."""
    plan = plan_of(spark, sf_dir, "ext_psi_drift")
    assert "partial_sum" in plan
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_attribution_is_single_window_no_join(spark, sf_dir):
    """Last-touch attribution must be the one-stream conditional running
    window, never a purchases x touches range join."""
    plan = plan_of(spark, sf_dir, "agg_attribution_last_touch")
    assert "Join" not in plan
    assert "last(" in plan or "RunningWindowFunction" in plan or "Window" in plan


def test_basket_pairs_dedup_before_self_join(spark, sf_dir):
    """The basket self-join must consume the DISTINCT (order, brand)
    table — fan-out bounded by basket size squared, never lineitem² —
    and the brand-frequency sides must broadcast."""
    plan = plan_of(spark, sf_dir, "agg_market_basket_lift")
    assert "partial_count" in plan  # distinct reduce before the pair join
    assert plan.count("BroadcastHashJoin") >= 2


def test_ips_stats_sides_broadcast(spark, sf_dir):
    """Off-policy eval must broadcast the 15-row (ctx, action) stats and
    the 3-row policy back over the fact scan — two scans of events,
    zero fact-sized shuffles, no nested loop."""
    plan = plan_of(spark, sf_dir, "ext_ips_offpolicy_eval")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kruskal_ranks_never_materialize_per_row(spark, sf_dir):
    """The KW rank algebra must reduce to DISTINCT length values before
    the midrank window — a per-row ranking window would shuffle the
    corpus to one partition."""
    plan = plan_of(spark, sf_dir, "ext_kruskal_wallis")
    # the (value, group) reduce comes first: map-side partial counts
    assert "partial_count" in plan or "partial_sum" in plan
    # only bounded-dimension exchanges after it: the window reads the
    # distinct-value table, not documents
    assert "Window" in plan


def test_ridge_moment_scan_prunes_to_two_columns(spark, sf_dir):
    """The Gram-moment pass must read only (text, n_chars) — feature
    algebra is scan-stage; weights close in-plan with a 1-row cross."""
    plan = plan_of(spark, sf_dir, "ext_ridge_normal_equations")
    assert "ReadSchema: struct<text:string,n_chars:bigint>" in plan
    assert "CartesianProduct" not in plan


def test_adamic_adar_wedges_via_middle_vertex_equijoin(spark, sf_dir):
    """Wedge enumeration must be an equi-join on the middle vertex over
    the checkpointed collision edge list — sum(deg^2) cost, never an
    all-pairs product; top-15 must TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "ext_adamic_adar")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_maxsim_single_corpus_pass_broadcast_query(spark, sf_dir):
    """Late interaction must be one corpus scan joined to the broadcast
    64-row query side — no corpus-x-corpus product, top-10 via
    TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "ext_colbert_maxsim")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", [
    "win_cusum_change", "agg_survival_km", "win_holt_linear",
    "agg_forecast_backtest", "win_kalman_local_level",
    "win_garch_volatility", "win_holt_winters",
])
def test_seqfold_family_is_one_linear_plan(spark, sf_dir, name):
    """Optimization round 12: the day-table recurrences are lowered to
    the single-job aggregate-HOF fold (seqfold.fold_states), so the
    executed plan must contain NO recursion loop (each UnionLoop level
    was a separately scheduled micro-job — ~30 per query of pure
    scheduling overhead) and exactly ONE parquet scan of the corpus
    (the recursion era needed an eager localCheckpoint to keep the
    loop from re-reducing the corpus; the fold consumes the day table
    once, so the whole query is one linear plan)."""
    import re

    plan = plan_of(spark, sf_dir, name)
    assert "UnionLoop" not in plan, name
    scans = re.findall(r"\(\d+\) Scan (\S+)", plan)
    assert scans == ["parquet"], (name, scans)
