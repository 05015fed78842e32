#!/usr/bin/env python
"""End-to-end statistical-inference session on the Spark engine — the
round-7 statistics/forecasting surface as one runnable script over the
synthetic corpus:

    python examples/stats_session.py [sf_dir]

Stages: cohort comparison (Welch + Mann-Whitney: parametric vs
rank-based on the same question) -> rank correlations (Spearman +
Kendall tau-b) -> agreement battery (Cohen's + Fleiss' kappa) ->
association effect sizes (chi-square -> Cramér's V) -> multiple-testing
control (per-source shift tests under BH-FDR) -> uncertainty bands
(split-conformal coverage audit) -> survival (Kaplan-Meier
time-to-conversion) -> time series (Bollinger / Holt / Theil-Sen /
STL-lite / runs test) -> attribution (last-touch vs Markov removal
effect) -> the round-10 battery (ANOVA + Brown-Forsythe + Kruskal-Wallis,
Hill/Theil tail census, Kalman/GARCH recursions, CCF, and the
counterfactual trio IPS / stratified ATT / Shapley) -> the round-11
close (Ljung-Box whiteness, blocked/ordered rank tests, the complete
agreement family, classifier scorecards, naive-forecast floors). Every
stage is a
registered, hash-checked query (one shared implementation; see
project_etl_spark/operators/).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from project_etl_spark.registry import load_all
from project_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("stats-session",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def run(name: str, n: int = 20, **kw) -> None:
        print(f"== {name} ==")
        reg[name].builder(spark, sf_dir).show(n, **kw)

    print(f"(statistical inference session over {sf_dir})\n")

    print("-- 1. Did the cohorts shift? parametric vs rank-based --")
    run("agg_welch_ttest", 5, vertical=True)
    run("ext_mann_whitney_u", 5, vertical=True)

    print("-- 2. Do the two ranking metrics agree? --")
    run("agg_spearman_rank", 5)
    run("ext_kendall_tau", 10)

    print("-- 3. Do the annotators agree beyond chance? --")
    run("ext_annotator_kappa", 3, vertical=True)
    run("ext_fleiss_kappa", 3, vertical=True)

    print("-- 4. Association strength, not just significance --")
    run("ext_cramers_v", 3, vertical=True)

    print("-- 5. Which sources shifted, after FDR correction? --")
    run("ext_fdr_bh", 25)

    print("-- 6. Distribution-free uncertainty bands + coverage --")
    run("ext_conformal_interval", 25)

    print("-- 7. Survival: conversion by day k, censoring-aware --")
    run("agg_survival_km", 35)

    print("-- 8. Time series: bands, forecast, robust trend, "
          "decomposition, randomness --")
    boll = reg["win_bollinger_bands"].builder(spark, sf_dir)
    print("== win_bollinger_bands (breaches only) ==")
    boll.where(F.col("breach") != 0).orderBy("day").show(10)
    run("win_holt_linear", 10)
    run("win_theil_sen", 3, vertical=True)
    stl = reg["win_stl_lite"].builder(spark, sf_dir)
    print("== win_stl_lite (5 largest |residual z|) ==")
    stl.orderBy(F.abs(F.col("resid_z_milli")).desc(), "day").show(5)
    run("agg_runs_test", 3, vertical=True)
    run("agg_seasonality_strength", 3, vertical=True)
    run("win_max_drawdown", 3, vertical=True)
    print("== win_rolling_correlation (5 most decoupled windows) ==")
    rc = reg["win_rolling_correlation"].builder(spark, sf_dir)
    rc.orderBy("corr_milli", "day").show(5)
    run("agg_forecast_backtest", 3, vertical=True)

    print("-- 9. Attribution: last-touch vs removal effect --")
    run("agg_attribution_last_touch", 10)
    run("agg_markov_attribution", 10)

    print("-- 10. Cohort economics --")
    run("agg_cohort_ltv", 12)
    run("agg_revenue_hhi", 3, vertical=True)

    print("-- 11. k-group omnibus + assumptions (round-10 battery) --")
    run("agg_anova_oneway", 3, vertical=True)
    run("ext_brown_forsythe", 3, vertical=True)
    run("ext_kruskal_wallis", 3, vertical=True)

    print("-- 12. Tail / inequality census --")
    run("ext_hill_tail_index", 3, vertical=True)
    run("ext_theil_decomposition", 3, vertical=True)

    print("-- 13. State-space filters (engine-native recursion) --")
    run("win_kalman_local_level", 8)
    run("win_garch_volatility", 8)
    run("win_crosscorr_lagged", 7)

    print("-- 14. Counterfactuals: reweight vs stratify vs allocate --")
    run("ext_ips_offpolicy_eval", 5)
    run("ext_propensity_strata_att", 5)
    run("ext_shapley_attribution", 5)

    print("-- 15. Multiple-testing control: FWER vs FDR on one battery --")
    run("ext_holm_stepdown", 8)
    run("ext_cochran_q", 3, vertical=True)

    print("-- 16. Survival: product vs hazard-sum estimator --")
    run("agg_survival_km", 8)
    run("agg_survival_nelson_aalen", 8)

    print("-- 17. Post-hoc drill-down + confounder control --")
    run("ext_tukey_hsd", 5)
    run("ext_grubbs_outlier", 5)
    run("ext_mantel_haenszel", 3, vertical=True)

    print("-- 18. Shape-constrained calibration + index numbers --")
    run("ext_isotonic_calibration_pav", 8)
    run("agg_price_index_fisher", 3, vertical=True)
    run("win_periodogram", 6)

    print("-- 19. Evaluation infrastructure (round-10 final wave) --")
    run("ext_weighted_kappa", 3, vertical=True)
    run("win_unit_root_adf", 3, vertical=True)
    run("ext_mmd_linear", 3, vertical=True)
    run("ext_spiegelhalter_z", 3, vertical=True)
    run("ext_doubly_robust_ate", 4)
    run("ext_successive_halving", 5)

    print("-- 20. Causal designs + survival comparison --")
    run("ext_balance_smd", 2)
    run("ext_did_estimator", 3, vertical=True)
    run("ext_rdd_lite", 3, vertical=True)
    run("agg_logrank_test", 3, vertical=True)
    run("ext_auc_delong_variance", 3, vertical=True)

    print("-- 21. Estimation theory: unseen mass, richness, reliability --")
    run("ext_good_turing", 5)
    run("ext_chao1_richness", 5)
    run("agg_negbin_dispersion", 5)
    run("win_pacf_durbin", 3, vertical=True)
    run("ext_cronbach_alpha", 3, vertical=True)
    run("ext_jackknife_variance", 3, vertical=True)

    print("-- 22. Round-11 closes: whiteness, blocked/ordered ranks --")
    run("win_ljung_box", 3, vertical=True)
    run("ext_friedman_kendall_w", 3, vertical=True)
    run("ext_page_trend", 3, vertical=True)
    run("ext_jonckheere_terpstra", 3, vertical=True)
    run("ext_dunn_posthoc", 10)
    run("ext_cliffs_delta", 3, vertical=True)
    run("ext_mood_median", 3, vertical=True)
    run("ext_cvm_two_sample", 3, vertical=True)
    run("ext_wilcoxon_signed_rank", 3, vertical=True)
    run("ext_levene_mean", 3, vertical=True)

    print("-- 23. Agreement family complete + classifier scorecards --")
    run("ext_krippendorff_alpha", 3, vertical=True)
    run("ext_gwet_ac1", 3, vertical=True)
    run("ext_icc_oneway", 3, vertical=True)
    run("ext_matthews_mcc", 3, vertical=True)
    run("ext_hosmer_lemeshow", 3, vertical=True)
    run("ext_cochran_armitage", 3, vertical=True)
    run("ext_fdr_by", 25)

    print("-- 24. Retrieval rank metrics + forecast floors --")
    run("ext_map_mrr_eval", 10)
    run("ext_err_eval", 10)
    run("ext_forecast_naive_benchmarks", 3, vertical=True)

    print("-- 25. Round-12 closes: dispersion, association, serial --")
    run("ext_bartlett_test", 3, vertical=True)
    run("ext_theils_u", 3, vertical=True)
    run("ext_goodman_kruskal_lambda", 3, vertical=True)
    run("ext_somers_d", 5)
    run("ext_durbin_watson", 3, vertical=True)
    run("ext_pettitt_test", 3, vertical=True)
    run("ext_diebold_mariano", 3, vertical=True)
    run("ext_kuiper_test", 3, vertical=True)
    run("ext_bowker_test", 3, vertical=True)
    run("ext_hodges_lehmann", 3, vertical=True)
    run("win_holt_winters", 10)
    run("ext_sign_test", 3, vertical=True)
    run("ext_jarque_bera", 5)
    run("ext_fdr_bky", 25)
    run("ext_quade_test", 3, vertical=True)

    print("-- 26. Graph resolution signals at scale --")
    run("ext_adamic_adar_capped", 15)
    run("ext_local_clustering", 15)

    print("-- 27. Exact inference + dispersion (round-12 second wave) --")
    run("ext_fisher_exact", 3, vertical=True)
    run("ext_stuart_maxwell", 3, vertical=True)
    run("ext_dagostino_k2", 3, vertical=True)
    run("ext_anderson_darling", 3, vertical=True)
    run("ext_ansari_bradley", 3, vertical=True)
    run("ext_conover_squared_ranks", 3, vertical=True)
    run("ext_partial_correlation", 3, vertical=True)
    run("ext_delta_method_ratio", 3, vertical=True)
    run("agg_atkinson_index", 3, vertical=True)

    print("-- 28. Serial correlation / stationarity (round-12 wave 5) --")
    run("ext_cox_stuart", 3, vertical=True)
    run("ext_bartels_rank", 3, vertical=True)
    run("ext_kpss_test", 3, vertical=True)
    run("ext_breusch_godfrey", 3, vertical=True)
    run("ext_engle_arch_lm", 3, vertical=True)
    run("ext_newey_west_slope", 3, vertical=True)
    run("ext_chow_test", 3, vertical=True)
    run("ext_white_test", 3, vertical=True)
    run("ext_granger_lag1", 3, vertical=True)

    print("-- 29. Retrieval robustness + spatial stats (wave 6) --")
    run("ext_rbp_eval", 10)
    run("ext_bpref_eval", 10)
    run("ext_spatial_autocorr", 3, vertical=True)
    run("ext_getis_ord_hotspots", 5)

    print("-- 30. Robust two-sample / influence / collinearity (wave 7) --")
    run("ext_brunner_munzel", 3, vertical=True)
    run("ext_gamma_concordance", 5)
    run("ext_ols_influence", 5)
    run("ext_vif_panel", 3, vertical=True)
    run("ext_lilliefors", 3, vertical=True)

    print("-- 31. Capstones: any-dependence + detector coverage (wave 8) --")
    run("ext_distance_correlation", 5)
    run("ext_hoeffding_d", 5)
    run("ext_chapman_dedup_estimate", 3, vertical=True)

    print("session complete: every stage above is a registered query "
          "hash-checked against DuckDB (see PARITY.md).")
    spark.stop()


if __name__ == "__main__":
    main()
