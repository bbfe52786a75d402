"""Auto-generated slow-test manifest (applied by conftest.py).

Tests listed here get `@pytest.mark.slow` at collection time and
are excluded from the smoke tier (`pytest -m "not slow"`).
Regenerate: `pytest --durations=0 -q` on the full suite, then list
every test whose call time exceeds ~2s. Module coverage in the
smoke tier is guaranteed by tests/test_smoke.py.
"""

SLOW_TESTS = {
    # round 5 additions (unmasked by the conftest numpy-import fix)
    "tests/test_hierarchical_extras.py::test_hierarchical_zero_inflated_gamma",  # 24.9s
    "tests/test_glm_extras.py::test_aggregated_regression_log",  # 19.9s
    # round 5: cold-cache timings (persistent compile cache disabled);
    # test_smoke.py entries deliberately STAY in the smoke tier — they
    # are the tier's intended end-to-end coverage
    "tests/test_mbsts.py::test_mbsts_positive_diagonal_identification",  # 37.8s
    "tests/test_time_sharded.py::test_sharded_filter_matches_single_device",  # 32.8s
    "tests/test_mbsts.py::test_mbsts_missing_observations",  # 32.8s
    "tests/test_frontends.py::test_mixed_data_imputer_frontend",  # 23.5s
    "tests/test_serialize_diag.py::test_bsts_prediction_errors_holdout",  # 22.6s
    "tests/test_rplots.py::test_bsts_plot_dispatch",  # 20.5s
    "tests/test_dynreg.py::test_dynreg_smoke_ragged",  # 18.4s
    "tests/test_time_sharded.py::test_sharded_smoother_matches_single_device",  # 29.4s
    # round 4 additions (statistical recover-truth tests)
    "tests/test_hmm.py::test_parallel_forward_filter_matches_sequential",
    "tests/test_hmm.py::test_gaussian_hmm_parallel_filter_option",
    "tests/test_bsts_marginal.py::test_tim_marginal_bench_scale_quantile_match",
    "tests/test_mbsts.py::test_factor_scale_identified_and_mixing",
    "tests/test_glm_stragglers.py::test_multinomial_probit_recovers_truth",
    "tests/test_glm_stragglers.py::test_multinomial_probit_choice_probs",
    "tests/test_glm_stragglers.py::test_hierarchical_poisson_regression_recovers_mu",
    "tests/test_glm_stragglers.py::test_hierarchical_poisson_regression_exposure",
    "tests/test_glm_stragglers.py::test_zero_inflated_gamma_regression",
    "tests/test_glm_stragglers.py::test_weighted_spike_slab",
    "tests/test_bsts_marginal.py::test_mtm_marginal_matches_conditional_posterior",
    "tests/test_bsts_marginal.py::test_slice_marginal_matches_mtm_marginal",
    "tests/test_bsts_marginal.py::test_mtm_marginal_covers_truth",
    "tests/test_bsts_marginal.py::test_grid_marginal_matches_conditional_posterior",
    "tests/test_bsts_marginal.py::test_tim_marginal_matches_conditional_posterior",
    "tests/test_priors_formula.py::test_student_prior_selects_student_model",
    "tests/test_bandits_hier_gp.py::test_logit_bandit_learns_weights",  # 180.2s
    "tests/test_bsts.py::test_marginal_sigma_slice_preserves_posterior",  # 100.3s
    "tests/test_holiday_state_models.py::test_regression_holiday_recovers_pattern[False]",  # 88.4s
    "tests/test_api.py::test_bsts_model_builder",  # 85.6s
    "tests/test_holiday_state_models.py::test_dynamic_regression_ar_tracks_coefficient",  # 75.8s
    "tests/test_state_models_tv.py::test_semilocal_trend_recovers_slope_mean",  # 69.3s
    "tests/test_holiday_state_models.py::test_regression_holiday_recovers_pattern[True]",  # 66.9s
    "tests/test_bsts.py::test_bsts_llt_seasonal_regression_full",  # 63.9s
    "tests/test_holiday_state_models.py::test_regression_holiday_from_holidays_and_predict",  # 63.9s
    "tests/test_holiday_state_models.py::test_general_seasonal_llt_growing_amplitude",  # 61.7s
    "tests/test_pallas_scan.py::test_pallas_filter_smoother_match_oracles",  # 59.4s
    "tests/test_pallas_scan.py::test_pallas_simulation_smoother_matches_and_vmaps",  # 55.2s
    "tests/test_pallas_scan.py::test_pallas_missing_observations",  # 54.9s
    "tests/test_cat_hmm_holdout.py::test_compare_bsts_models",  # 54.2s
    "tests/test_parallel_kalman.py::test_parallel_simulation_smoother_moments",  # 53.2s
    "tests/test_dirm_mixed_frequency.py::test_mixed_frequency_recovers_fine_series",  # 47.1s
    "tests/test_beta_binomial_e2e.py::test_beta_binomial_recovers_truth",  # 46.2s
    "tests/test_beta_binomial_e2e.py::test_beta_binomial_matches_quadrature",  # 42.0s
    "tests/test_dirm_mixed_frequency.py::test_dirm_from_ragged_and_loglik_predict",  # 39.3s
    "tests/test_state_models_tv.py::test_random_walk_holiday_effect",  # 37.1s
    "tests/test_factor_irt_pp.py::test_partial_credit_recovers",  # 36.8s
    "tests/test_bsts.py::test_bsts_local_level_recovers_level",  # 35.5s
    "tests/test_api.py::test_bsts_model_with_regression",  # 34.4s
    "tests/test_state_models_tv.py::test_dynamic_regression_tracks_coefficient",  # 33.7s
    "tests/test_mixed_impute.py::test_mixed_imputer_recovers_missing",  # 32.7s
    "tests/test_dirm_mixed_frequency.py::test_dirm_recovers_regression_and_level",  # 32.4s
    "tests/test_families.py::test_logit_bsts_recovers_latent_prob",  # 31.9s
    "tests/test_families.py::test_poisson_bsts_recovers_latent_rate",  # 31.5s
    "tests/test_api.py::test_lm_spike_end_to_end",  # 31.0s
    "tests/test_state_models_tv.py::test_student_llt_handles_level_outliers",  # 30.8s
    "tests/test_parallel_kalman.py::test_parallel_smoother_matches_sequential",  # 29.4s
    "tests/test_families.py::test_poisson_bsts_with_exposure",  # 27.8s
    "tests/test_bsts.py::test_bsts_ar_block",  # 27.7s
    "tests/test_bsts.py::test_bsts_prediction_shapes_and_sanity",  # 27.1s
    "tests/test_factor_irt_pp.py::test_2pl_recovers_abilities",  # 27.0s
    "tests/test_mixed_impute.py::test_mixed_imputer_error_correction",  # 26.8s
    "tests/test_families.py::test_logit_bsts_with_regression",  # 26.3s
    "tests/test_families.py::test_student_bsts_robust_to_outliers",  # 26.0s
    "tests/test_bsts.py::test_jury_stationarity_test",  # 24.1s
    "tests/test_spike_slab_sweep.py::test_sweep_logprob_matches_cholesky_all_masks",  # 23.8s
    "tests/test_cat_hmm_holdout.py::test_one_step_errors_white_noise",  # 23.0s
    "tests/test_cat_hmm_holdout.py::test_holdout_errors_are_one_step",  # 21.9s
    "tests/test_parallel_kalman.py::test_parallel_simulate_same_distribution",  # 21.8s
    "tests/test_parallel_kalman.py::test_parallel_filter_with_missing",  # 21.7s
    "tests/test_parallel_kalman.py::test_parallel_filter_matches_sequential",  # 21.1s
    "tests/test_parallel_kalman.py::test_parallel_smoother_missing",  # 20.5s
    "tests/test_families.py::test_predict_poisson",  # 20.4s
    "tests/test_glm_composites.py::test_student_recovers_truth",  # 20.3s
    "tests/test_hmm_em_nested.py::test_bsts_mle",  # 19.7s
    "tests/test_glm_breadth.py::test_zero_inflated_lognormal",  # 18.9s
    "tests/test_state_models_tv.py::test_tv_simulation_smoother_moments",  # 18.0s
    "tests/test_glm_composites.py::test_poisson_recovers_truth",  # 17.8s
    "tests/test_glm_composites.py::test_mlogit_recovers_truth",  # 17.7s
    "tests/test_dp_smc.py::test_dp_mvn_mixture_runs_and_separates",  # 17.6s
    "tests/test_bart.py::test_logit_bart_decision_boundary",  # 17.6s
    "tests/test_hmm.py::test_hmm_gibbs_recovers_truth",  # 17.6s
    "tests/test_state_models_tv.py::test_predict_with_dynamic_regression",  # 17.5s
    "tests/test_api.py::test_qreg_spike_api",  # 17.3s
    "tests/test_glm_composites.py::test_probit_recovers_truth",  # 17.3s
    "tests/test_hmm_em_nested.py::test_nested_hmm_recovers_structure",  # 17.1s
    "tests/test_mixtures.py::test_beta_binomial_mixture_recovers",  # 17.1s
    "tests/test_parallel_mesh.py::test_sharded_mcmc_matches_unsharded_statistics",  # 16.6s
    "tests/test_glm_breadth.py::test_loglinear_design_and_fit",  # 16.3s
    "tests/test_glm_breadth.py::test_zero_inflated_poisson",  # 16.2s
    "tests/test_bart.py::test_probit_bart",  # 16.1s
    "tests/test_linear_bandit_hgp_pp.py::test_poisson_cluster_process_recovers_rates",  # 16.0s
    "tests/test_factor_irt_pp.py::test_poisson_factor_recovers_classes",  # 16.0s
    "tests/test_dp_collapsed.py::test_split_merge_escapes_merged_mode",  # 15.7s
    "tests/test_glm_breadth.py::test_binomial_logit_trials",  # 15.4s
    "tests/test_scalar_zoo.py::test_mvt_em_and_gibbs",  # 15.2s
    "tests/test_api.py::test_logit_spike_end_to_end",  # 15.0s
    "tests/test_cat_hmm_holdout.py::test_categorical_hmm_recovers",  # 14.7s
    "tests/test_tp_ssvs.py::test_tp_ssvs_equivalence",  # 13.7s
    "tests/test_bart.py::test_poisson_bart",  # 13.4s
    "tests/test_spike_slab.py::test_log_model_prob_normalizes_against_enumeration",  # 13.2s
    "tests/test_kalman.py::test_simulation_smoother_moments",  # 12.9s
    "tests/test_dp_collapsed.py::test_collapsed_gibbs_recovers_clusters",  # 12.9s
    "tests/test_glm_composites.py::test_poisson_with_exposure",  # 12.6s
    "tests/test_spike_slab.py::test_spike_slab_recovers_sparse_truth",  # 12.5s
    "tests/test_mbsts.py::test_mbsts_with_regression",  # 12.3s
    "tests/test_mbsts.py::test_mbsts_predict_shapes",  # 11.6s
    "tests/test_glm_breadth.py::test_gamma_regression_recovers",  # 11.6s
    "tests/test_linear_bandit_hgp_pp.py::test_cosine_poisson_process",  # 11.1s
    "tests/test_linear_bandit_hgp_pp.py::test_hierarchical_gp_shares_strength",  # 11.1s
    "tests/test_graphical_nnet_impute.py::test_bayes_net_conjugate_learning",  # 11.1s
    "tests/test_beta_binomial_e2e.py::test_runs_jitted_end_to_end",  # 10.9s
    "tests/test_factor_irt_pp.py::test_multinomial_factor_separates",  # 10.9s
    "tests/test_dists_continuous.py::test_gig_general_lambda_exact",  # 10.8s
    "tests/test_bart.py::test_bart_fits_friedman",  # 10.7s
    "tests/test_bandits_hier_gp.py::test_gp_recovers_function",  # 10.6s
    "tests/test_hmm_em_nested.py::test_general_hmm_poisson_emissions",  # 10.5s
    "tests/test_graphical_nnet_impute.py::test_copula_imputer_recovers_correlation",  # 10.3s
    "tests/test_glm_composites.py::test_logit_recovers_truth",  # 10.3s
    "tests/test_glm_composites.py::test_student_outlier_robustness",  # 10.3s
    "tests/test_dp_collapsed.py::test_assignment_relabeler_beats_sort_by_mean",  # 10.2s
    "tests/test_mixtures.py::test_mixture_recovers_components",  # 9.9s
    "tests/test_bart.py::test_bart_predict_out_of_sample",  # 9.7s
    "tests/test_mixtures.py::test_mixture_loglik_increases_from_random",  # 9.6s
    "tests/test_linear_bandit_hgp_pp.py::test_linear_bandit_finds_best_arm",  # 9.5s
    "tests/test_mbsts.py::test_mv_simulation_smoother_moments",  # 9.5s
    "tests/test_timeseries_quantile.py::test_ar_spike_slab_prunes",  # 9.4s
    "tests/test_scalar_zoo.py::test_product_dirichlet_mle_and_gibbs",  # 9.2s
    "tests/test_numopt_extra.py::test_class_assigner_matches_target",  # 9.1s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_bigass_spike_slab",  # 9.1s
    "tests/test_timeseries_quantile.py::test_quantile_regression_median",  # 8.8s
    "tests/test_tim_lkj.py::test_lkj_concentration",  # 8.6s
    "tests/test_bandits_hier_gp.py::test_hierarchical_poisson_recovers",  # 8.5s
    "tests/test_graphical_nnet_impute.py::test_nnet_fits_nonlinear_function",  # 8.5s
    "tests/test_mbsts.py::test_mbsts_recovers_shared_factor",  # 8.4s
    "tests/test_zoo_numopt.py::test_markov_recovers_transition_matrix",  # 8.3s
    "tests/test_zoo_numopt.py::test_zi_gamma_recovers",  # 8.2s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_ordinal_logit_recovers",  # 8.2s
    "tests/test_factor_irt_pp.py::test_mmpp_recovers_states",  # 8.2s
    "tests/test_state_models_tv.py::test_tv_filter_matches_static_when_constant",  # 8.0s
    "tests/test_kalman.py::test_simulate_moments",  # 8.0s
    "tests/test_factor_irt_pp.py::test_weekly_cycle_recovers_profiles",  # 7.8s
    "tests/test_graphical_nnet_impute.py::test_copula_imputer_rmse_beats_mean_fill",  # 7.6s
    "tests/test_glm_breadth.py::test_multilevel_multinomial",  # 7.6s
    "tests/test_stats.py::test_bspline_partition_of_unity",  # 7.6s
    "tests/test_tim_lkj.py::test_lkj_uniform_marginals",  # 7.6s
    "tests/test_scalar_zoo.py::test_truncated_gamma_density_and_sim",  # 7.5s
    "tests/test_dp_smc.py::test_dp_gaussian_recovers_cluster_count",  # 7.5s
    "tests/test_tim_lkj.py::test_tim_kernel_protocol",  # 7.5s
    "tests/test_spike_slab_sweep.py::test_sweep_logprob_matches_with_forced_intercept_mean",  # 7.3s
    "tests/test_timeseries_quantile.py::test_ar_recovers_coefficients",  # 7.3s
    "tests/test_dp_smc.py::test_resamplers_are_unbiased",  # 6.8s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_adaptive_spike_slab",  # 6.8s
    "tests/test_zoo_numopt.py::test_zi_lognormal_recovers",  # 6.7s
    "tests/test_spike_slab_sweep.py::test_sweep_sampler_matches_enumeration",  # 6.5s
    "tests/test_zoo_numopt.py::test_zip_recovers_params",  # 6.5s
    "tests/test_timeseries_quantile.py::test_arma_mle",  # 6.3s
    "tests/test_bart.py::test_bart_trees_actually_grow",  # 6.2s
    "tests/test_timeseries_quantile.py::test_quantile_regression_tau90",  # 6.2s
    "tests/test_bandits_hier_gp.py::test_hierarchical_gamma_runs",  # 5.9s
    "tests/test_scalar_zoo.py::test_uniform_shrinkage_mle_and_posterior",  # 5.9s
    "tests/test_dists_continuous.py::test_gamma_quantile_extreme_shapes",  # 5.8s
    "tests/test_bandits_hier_gp.py::test_hierarchical_gaussian_shrinks",  # 5.8s
    "tests/test_kernels.py::test_diagnostics_sane",  # 5.7s
    "tests/test_tim_lkj.py::test_tim_samples_gaussian",  # 5.5s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_mvreg_recovers_coefficients",  # 5.5s
    "tests/test_timeseries_quantile.py::test_nonzero_mean_ar1",  # 5.5s
    "tests/test_nuts.py::test_nuts_standard_normal",  # 5.5s
    "tests/test_spike_slab_sweep.py::test_flip_deltas_match_direct",  # 5.5s
    "tests/test_chunked_driver.py::test_chunked_matches_monolithic",  # 5.3s
    "tests/test_tp_ssvs.py::test_tp_ssvs_respects_cap",  # 5.1s
    "tests/test_stats.py::test_bspline_matches_scipy",  # 5.0s
    "tests/test_hmm.py::test_backward_sample_matches_marginals",  # 4.9s
    "tests/test_hmm_em_nested.py::test_hmm_em_recovers_parameters",  # 4.9s
    "tests/test_pallas_scan.py::test_bsts_smoother_dispatch",  # 4.9s
    "tests/test_nuts.py::test_nuts_scaled_gaussian_mass_adaptation",  # 4.9s
    "tests/test_state_models_tv.py::test_tv_z_filter_is_regression",  # 4.7s
    "tests/test_glm_composites.py::test_logit_latent_is_logistic",  # 4.4s
    "tests/test_dists_truncated.py::test_trun_gamma_central",  # 4.4s
    "tests/test_drawlog.py::test_roundtrip_flat",  # 4.3s
    "tests/test_nuts.py::test_nuts_correlated_gaussian",  # 4.3s
    "tests/test_hmm_em_nested.py::test_pairwise_smoothed_consistency",  # 4.2s
    "tests/test_bandits_hier_gp.py::test_binomial_bandit_finds_best_arm",  # 4.1s
    "tests/test_nuts.py::test_nuts_pytree_position",  # 4.1s
    "tests/test_dists_truncated.py::test_trun_normal_central",  # 4.1s
    "tests/test_dp_smc.py::test_draw_sticks_posterior_mean",  # 4.0s
    "tests/test_glm_composites.py::test_mnl_utilities_marginal",  # 4.0s
    "tests/test_dp_smc.py::test_bootstrap_filter_loglik_matches_kalman",  # 4.0s
    "tests/test_zoo_numopt.py::test_laplace_approximation_gamma",  # 4.0s
    "tests/test_timeseries_quantile.py::test_arma_mcmc_runs",  # 3.8s
    "tests/test_spike_slab.py::test_empty_and_full_model_logprob_finite",  # 3.8s
    "tests/test_kernels.py::test_slice_kernel_standard_normal",  # 3.7s
    "tests/test_kalman.py::test_missing_observations",  # 3.6s
    "tests/test_scalar_zoo.py::test_lognormal_recovers_truth",  # 3.6s
    "tests/test_mbsts.py::test_mv_smoother_matches_scalar",  # 3.5s
    "tests/test_kernels.py::test_hmc_kernel_mvn",  # 3.5s
    "tests/test_graphical_nnet_impute.py::test_bayes_net_sample_and_loglik",  # 3.4s
    "tests/test_mixtures.py::test_regression_mixture_recovers",  # 3.4s
    "tests/test_kernels.py::test_slice_kernel_gamma_bounded",  # 3.4s
    "tests/test_timeseries_quantile.py::test_arma_loglik_matches_ar1_closed_form",  # 3.3s
    "tests/test_scalar_zoo.py::test_matrix_normal_flip_flop",  # 3.2s
    "tests/test_mbsts.py::test_mv_filter_matches_scalar",  # 3.2s
    "tests/test_numopt_extra.py::test_conjugate_gradient_quadratic_and_rosenbrock",  # 3.1s
    "tests/test_linalg.py::test_masked_mvn_suf_sample",  # 3.0s
    "tests/test_numopt_extra.py::test_simulated_annealing_multimodal",  # 3.0s
    "tests/test_factor_irt_pp.py::test_homogeneous_pp_conjugate",  # 3.0s
    "tests/test_kernels.py::test_rwm_kernel",  # 2.9s
    "tests/test_hmm.py::test_smoothed_marginals_match_brute_force",  # 2.8s
    "tests/test_dists_discrete.py::test_beta_binomial",  # 2.8s
    "tests/test_stats.py::test_roc_auc_matches_sklearn_formula",  # 2.7s
    "tests/test_stats.py::test_ks_matches_scipy",  # 2.6s
    "tests/test_dists_truncated.py::test_trun_gamma_tail",  # 2.6s
    "tests/test_dists_continuous.py::test_quantile_roundtrip[student_t10]",  # 2.6s
    "tests/test_bandits_hier_gp.py::test_gp_marginal_loglik_matches_direct",  # 2.6s
    "tests/test_chunked_driver.py::test_chunked_progress_and_checkpoint",  # 2.5s
    "tests/test_parallel_mesh.py::test_data_parallel_sufstats_match",  # 2.5s
    "tests/test_graphical_nnet_impute.py::test_bayes_net_marginal_exact",  # 2.5s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_screen_candidates",  # 2.5s
    "tests/test_hmm.py::test_forward_filter_matches_brute_force",  # 2.5s
    "tests/test_zoo_numopt.py::test_transformed_target_samples_gamma",  # 2.4s
    "tests/test_zoo_numopt.py::test_simplex_transform_roundtrip",  # 2.4s
    "tests/test_dp_smc.py::test_liu_west_learns_parameter",  # 2.4s
    "tests/test_spike_slab.py::test_regsuf_combine_matches_full",  # 2.3s
    "tests/test_dists_multivariate.py::test_wishart",  # 2.3s
    "tests/test_kernels.py::test_mala_kernel",  # 2.3s
    "tests/test_dists_multivariate.py::test_dirichlet",  # 2.2s
    "tests/test_zoo_numopt.py::test_integrate_normal_density",  # 2.2s
    "tests/test_mvreg_ordinal_adaptive_vi.py::test_advi_posterior_regression",  # 2.2s
    "tests/test_linalg.py::test_masked_cholesky_vmap_over_masks",  # 2.1s
    "tests/test_dists_multivariate.py::test_mvt",  # 2.1s
    "tests/test_kalman.py::test_smoother_matches_dense_conditional",  # 2.1s
    "tests/test_bart.py::test_assign_leaves_manual_tree",  # 2.0s
}
