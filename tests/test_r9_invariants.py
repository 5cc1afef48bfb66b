"""Mathematical invariants of the round-9 operators.

The DuckDB differential sweep proves Spark == DuckDB; these tests prove
both are RIGHT, by checking properties the statistics must satisfy on
any input — bounds, monotonicity, identities, ordering — that a shared
implementation bug would violate while still hash-matching.
"""

from __future__ import annotations

import os

import pytest

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def rows(spark, sf_dir, name):
    return SPECS[name].func(spark, sf_dir).collect()


# ---- wave 1: inferential statistics ------------------------------------


def test_kruskal_bounds_and_tie_correction_direction(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_kruskal")
    assert r.k_groups == 5 and r.n_total > 0
    assert r.h_stat >= 0
    # ties shrink Var(ranks): the correction DIVIDES by C <= 1
    assert r.h_corrected >= r.h_stat
    assert 0.0 <= r.p_value <= 1.0


def test_jarque_bera_matches_moments_operator(spark, sf_dir):
    # cross-operator identity: JB's skew/kurtosis must equal
    # q_agg_moments' (same power sums, independent implementations)
    jb = {r.event_type: r for r in rows(spark, sf_dir, "q_agg_jarque_bera")}
    mo = {r.event_type: r for r in rows(spark, sf_dir, "q_agg_moments")}
    assert set(jb) == set(mo)
    for et, r in jb.items():
        assert r.skewness == pytest.approx(mo[et].skewness, abs=2e-6)
        assert r.kurtosis_excess == pytest.approx(
            mo[et].excess_kurtosis, abs=2e-6
        )
        assert r.jb_stat >= 0 and 0.0 <= r.p_value <= 1.0
        # JB identity from its own emitted components
        want = r.n / 6.0 * (r.skewness**2 + r.kurtosis_excess**2 / 4.0)
        assert r.jb_stat == pytest.approx(want, rel=1e-3)


def test_tukey_hsd_all_pairs_ordered(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_tukey_hsd")
    assert len(got) == 10  # C(5,2)
    for r in got:
        assert r.g1 < r.g2
        assert r.q_stat >= 0
        assert r.significant == (r.q_stat > 3.858)


def test_hodges_lehmann_pair_count_identity(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_hodges_lehmann")
    assert r.n_pairs == r.n1 * r.n2
    # dime-quantized values live in [0, ~561] => shift within the range
    assert -600.0 <= r.hl_shift <= 600.0


def test_g_test_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_g_test")
    assert r.df == 24
    assert r.g_stat >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_ancova_f_nonnegative_and_adjustment_sane(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_ancova")
    assert len(got) == 5
    for r in got:
        # nested OLS: SSE_reduced >= SSE_full => F >= 0
        assert r.f_groups >= 0
        assert 0.0 <= r.adj_mean_value <= 600.0


def test_wilson_ci_orders_and_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_agg_wilson_ci"):
        assert 0.0 <= r.ci_lo <= r.rate <= r.ci_hi <= 1.0
        assert r.s <= r.n


def test_dunn_consistency_with_kruskal(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_dunn")
    assert len(got) == 10
    for r in got:
        assert r.g1 < r.g2
        assert r.significant == (abs(r.z_dunn) > 2.807)


def test_cmh_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_cmh_test")
    assert r.k_strata == 7
    assert r.or_mh > 0
    assert r.cmh_chi2 >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_capture_recapture_estimator_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_capture_recapture")
    assert r.m <= min(r.n1, r.n2)
    # Chapman estimate can never fall below either observed sample
    assert r.n_hat >= max(r.n1, r.n2) - 1e-6
    assert r.ci_lo <= r.n_hat <= r.ci_hi


def test_permutation_test_p_value_range(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_permutation_test")
    assert r.n_perms == 40
    # add-one smoothing: p in [1/(B+1), 1]
    assert 1.0 / 41 - 1e-9 <= r.p_value <= 1.0
    assert r.obs_diff_value >= 0


# ---- wave 2: timeseries diagnostics ------------------------------------


def test_seasonal_mk_variance_positive_trend_sign(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_seasonal_mk"):
        assert r.var18_total > 0
        want = (
            "increasing"
            if r.s_total > 0
            else ("decreasing" if r.s_total < 0 else "no trend")
        )
        assert r.trend == want


def test_ljung_box_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_ljung_box"):
        assert r.q_lb >= 0
        assert -1.0 <= r.r1 <= 1.0
        assert r.significant == (r.q_lb > 14.067)


def test_durbin_watson_range_and_rho_identity(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_durbin_watson"):
        assert 0.0 <= r.dw_stat <= 4.0
        assert r.rho_approx == pytest.approx(1.0 - r.dw_stat / 2.0, abs=2e-6)


def test_granger_f_nonnegative(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_timeseries_granger")
    # restricted model is nested in unrestricted => F >= 0
    assert r.f_stat >= 0
    assert r.n_obs >= 2


def test_runs_test_run_count_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_runs_test"):
        assert r.n_above > 0 and r.n_below > 0
        # runs count is between 2 (one switch) and the sequence length
        assert 1 <= r.n_runs <= r.n_above + r.n_below


def test_periodogram_share_and_period_range(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_periodogram"):
        assert 2 <= r.best_period <= 14
        assert 0.0 < r.power_share <= 1.0


def test_cointegration_flag_consistent(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_timeseries_cointegration")
    assert r.cointegrated == (r.adf_stat < -3.34)
    # a stationary-leaning residual has rho <= 0 when differenced
    assert -2.0 <= r.resid_rho <= 1.0


# ---- wave 3: experiments + eval + graph --------------------------------


def test_uplift_cells_and_z_sign(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_events_uplift"):
        assert r.conv_t <= r.n_t and r.conv_c <= r.n_c
        if r.z_score is not None and r.uplift != 0:
            assert (r.z_score > 0) == (r.uplift > 0)


def test_bass_root_consistency(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_events_bass")
    assert r.n_days >= 2 and r.m_users > 0
    if r.m_est is not None:
        # the fitted market size must be positive, and p + q decompose
        # the first-period hazard: a = p*m exactly
        assert r.m_est > 0
        assert r.coef_a == pytest.approx(r.p_est * r.m_est, rel=5e-3)


def test_brier_decomposition_identity(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_brier_decomp")
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0.0 <= r.uncertainty <= 0.25
    assert r.brier_binned == pytest.approx(
        r.reliability - r.resolution + r.uncertainty, abs=5e-6
    )
    # resolution can never exceed the outcome variance it explains
    assert r.resolution <= r.uncertainty + 1e-9


def test_kappa_identity_and_range(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_kappa")
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    assert r.kappa <= 1.0
    assert r.kappa == pytest.approx((r.po - r.pe) / (1.0 - r.pe), abs=5e-6)


def test_equalized_odds_gap_identity(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_equalized_odds")
    assert 0.0 <= r.tpr_gap <= 1.0 and 0.0 <= r.fpr_gap <= 1.0
    assert r.eo_gap == pytest.approx(max(r.tpr_gap, r.fpr_gap), abs=2e-6)


def test_reciprocity_range(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_graph_reciprocity")
    assert 0.0 <= r.reciprocity <= 1.0
    assert r.total_transitions > 0


def test_meta_i2_ranges(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_events_meta_i2")
    assert r.k_segments >= 1
    assert r.q_stat >= 0
    assert 0.0 <= r.i_squared < 1.0


# ---- waves 4/7/8: LLM-pipeline -----------------------------------------


def test_semantic_ivf_keep_lowest_id_per_cluster(spark, sf_dir):
    got = rows(spark, sf_dir, "q_dedup_semantic_ivf")
    assert got
    for r in got:
        assert r.kept == (r.n_dups == 0)
    # within every cell, the lowest vec_id can have no lower-id dup
    by_cell = {}
    for r in got:
        by_cell.setdefault(r.cell, []).append(r)
    for members in by_cell.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.kept


def test_rerank_ce_funnel_shape(spark, sf_dir):
    got = rows(spark, sf_dir, "q_sim_rerank_ce")
    per = {}
    for r in got:
        per.setdefault(r.probe_id, []).append(r)
        assert -1.0 <= r.ce_score <= 1.0  # mean of g(x) in (-1, 1)
        assert -1.0 <= r.cos_sim <= 1.0
    for rs in per.values():
        assert sorted(x.rnk for x in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 3


def test_matryoshka_bounds(spark, sf_dir):
    got = rows(spark, sf_dir, "q_embed_matryoshka")
    assert len(got) == 8
    for r in got:
        assert 0.0 <= r.overlap_at_10 <= 1.0
        # top1 surviving implies a nonzero overlap
        if r.top1_kept:
            assert r.overlap_at_10 >= 0.1 - 1e-9


def test_self_bleu_ranges(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_text_self_bleu")
    assert 0.0 <= r.micro_self_bleu2 <= 1.0
    assert 0.0 <= r.macro_self_bleu2 <= 1.0
    assert 0.0 <= r.pct_templated <= 1.0


def test_ngram_coverage_weighted_vs_distinct(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_text_ngram_coverage")
    assert 0.0 <= r.distinct_coverage <= 1.0
    assert 0.0 <= r.weighted_coverage <= 1.0
    # frequent bigrams are covered more often than rare ones, so the
    # occurrence-weighted coverage dominates the distinct coverage
    assert r.weighted_coverage >= r.distinct_coverage - 1e-6


def test_dsir_topk_sorted_and_finite(spark, sf_dir):
    got = rows(spark, sf_dir, "q_mix_dsir")
    assert len(got) == 20
    weights = [r.dsir_weight for r in got]
    assert weights == sorted(weights, reverse=True)
    for r in got:
        assert r.n_feats > 0


def test_multimodal_dup_clusters_canonical_labels(spark, sf_dir):
    got = rows(spark, sf_dir, "q_multimodal_dup_clusters")
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        assert all(m.cluster_size == len(members) for m in members)
        assert len(members) >= 2  # singletons never enter the pair graph


def test_spc_control_limit_geometry(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_spc_control"):
        assert r.lcl <= r.center <= r.ucl
        assert r.n_out_of_control <= r.n_days
        assert 1 <= r.max_run_one_side <= r.n_days


def test_power_analysis_monotone_in_mde(spark, sf_dir):
    got = rows(spark, sf_dir, "q_events_power_analysis")
    assert len(got) == 4
    # detecting a smaller lift always needs MORE samples
    ns = [r.n_per_arm for r in got]  # rows ordered by mde ascending
    assert ns == sorted(ns, reverse=True)
    for r in got:
        assert r.n_per_arm > 0 and 0.0 <= r.baseline_rate <= 1.0


# ---- fixture-cardinality pins backing hardcoded dfs (ADVICE r9) ---------
#
# q_agg_kruskal bakes the even-df chi-square survival at m=2 (df=4, i.e.
# k=5 groups), q_agg_g_test at m=12 (df=24 = (5-1)x(7-1)), and the
# Tukey/Dunn significance literals are the k=5 critical values. k and df
# are computed FROM data, so parity with the oracle holds at any
# cardinality — but the emitted p-value would silently ride the wrong df
# if a fixture ever shipped a different event_type/day-of-week domain.
# Pin the domain on EVERY fixture SF so a fixture change turns the stale
# hardcoded df into a visible failure, not a wrong p-value.


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_domains_back_hardcoded_dfs(spark, sf):
    path = f"/root/testdata/{sf}/events.parquet"
    if not os.path.isdir(path) and not os.path.exists(path):
        pytest.skip(f"{path} absent in this environment")
    ev = spark.read.parquet(path)
    k = ev.select("event_type").distinct().count()
    dw = ev.selectExpr("dayofweek(ts) AS dw").distinct().count()
    assert k == 5, "kruskal m=2 / tukey+dunn k=5 literals assume 5 groups"
    assert dw == 7, "g_test m=12 (df=24) assumes a full 7-day week"
