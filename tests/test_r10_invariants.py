"""Mathematical invariants of the round-10 operators.

Same charter as tests/test_r9_invariants.py: the DuckDB sweep proves
Spark == DuckDB; these prove both are RIGHT via properties any correct
implementation must satisfy on any input.
"""

from __future__ import annotations

import pytest

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def rows(spark, sf_dir, name):
    return SPECS[name].func(spark, sf_dir).collect()


# ---- wave 1: MinHash twin + LSH audit + multi-probe IVF ----------------


def test_minhash_estimates_are_sixteenths_in_range(spark, sf_dir):
    got = rows(spark, sf_dir, "q_dedup_minhash")
    for r in got:
        assert r.doc_a < r.doc_b
        assert 0.25 <= r.est_jaccard <= 1.0
        # agreement/16 — exact multiples of 2^-4 survive round(4) losslessly
        assert (r.est_jaccard * 16) == int(r.est_jaccard * 16)


def test_lsh_bucket_audit_accounting(spark, sf_dir):
    from mongodb_iceberg_sync_spark.operators.dedup import (
        MAX_LSH_BUCKET,
        N_BANDS,
    )

    got = rows(spark, sf_dir, "q_profile_lsh_buckets")
    assert [r.band_id for r in got] == list(range(N_BANDS))
    n_docs = {r.n_docs for r in got}
    assert len(n_docs) == 1  # every band bands the same doc set
    for r in got:
        assert 1 <= r.max_bucket <= r.n_docs
        assert r.n_buckets <= r.n_docs
        # every hot bucket holds at least cap+1 docs
        assert r.n_hot_docs >= r.n_hot_buckets * (MAX_LSH_BUCKET + 1)
        assert r.n_hot_docs <= r.n_docs
        if r.max_bucket <= MAX_LSH_BUCKET:
            assert r.n_hot_buckets == 0 == r.n_hot_docs


def test_multiprobe_ivf_recall_dominates_single_probe(spark, sf_dir):
    """The multi-probe recall invariant: a second probe can only ADD
    candidate pairs, so per-vector dup counts dominate single-probe's,
    and the primary cell assignment is identical."""
    single = {r.vec_id: r for r in rows(spark, sf_dir, "q_dedup_semantic_ivf")}
    multi = {r.vec_id: r for r in rows(spark, sf_dir, "q_dedup_semantic_ivf_mp")}
    assert set(single) == set(multi)
    gained = 0
    for vid, m in multi.items():
        s = single[vid]
        assert m.cell == s.cell  # top-1 probe unchanged
        assert m.cell2 is None or m.cell2 != m.cell
        assert m.n_dups >= s.n_dups
        assert m.kept == (m.n_dups == 0)
        gained += m.n_dups - s.n_dups
    assert gained >= 0


# ---- wave 2: nonparametric k-group inference ----------------------------


def test_mood_median_dichotomy_identity(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_mood_median")
    assert r.k_groups == 5 and r.n_total > 0
    assert r.chi2_stat >= 0
    assert 0.0 <= r.p_value <= 1.0
    # the pooled lower median must be an attainable cent value
    assert r.median_cents >= 0


def test_cochran_q_bounds(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_cochran_q")
    assert r.k_treatments == 5 and r.n_users > 0
    assert r.q_stat >= 0
    assert 0.0 <= r.p_value <= 1.0


def test_friedman_rank_sum_identity(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_friedman")
    assert r.k_groups == 5 and r.b_days > 0
    # chi2_F upper bound: perfect consistency gives b*(k-1) separation
    assert 0 <= r.chi2_f <= r.b_days * (r.k_groups - 1) + 1e-9
    # ties only INCREASE the corrected stat (cc <= 1)
    assert r.chi2_f_corrected >= r.chi2_f - 1e-9
    assert 0.0 <= r.p_value <= 1.0


def test_jonckheere_j_range(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_jonckheere")
    assert r.n_total > 0
    # 0 <= J <= total cross-group pair count < n^2/2
    assert 0 <= r.j_stat <= r.n_total * r.n_total / 2
    assert 0.0 <= r.p_value <= 1.0


def test_cliffs_delta_bounds_and_magnitude_labels(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_cliffs_delta")
    assert -1.0 <= r.cliffs_delta <= 1.0
    assert r.n_pairs == r.n_purchase * r.n_other
    lab = {"negligible": 0.0, "small": 0.147, "medium": 0.33, "large": 0.474}
    hi = {"negligible": 0.147, "small": 0.33, "medium": 0.474, "large": 1.0 + 1e-9}
    assert lab[r.magnitude] <= abs(r.cliffs_delta) <= hi[r.magnitude]


# ---- wave 3: scoring rules + retrieval ranking ---------------------------


def test_log_loss_dominates_baseline_relationship(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_log_loss")
    assert r.n_examples > 0
    assert r.log_loss > 0 and r.log_loss_baseline > 0
    # base-rate entropy is bounded by ln 2
    assert r.log_loss_baseline <= 0.6931472
    assert r.skill_score == pytest.approx(
        1.0 - r.log_loss / r.log_loss_baseline, abs=2e-6
    )


def test_spiegelhalter_z_two_sided_p(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_ml_spiegelhalter_z")
    assert r.n_examples > 0
    assert 0.0 <= r.p_value <= 1.0


def test_fbeta_family_ordering_vs_confusion(spark, sf_dir):
    got = {r.beta: r for r in rows(spark, sf_dir, "q_ml_fbeta")}
    assert set(got) == {0.5, 1.0, 2.0}
    (conf,) = rows(spark, sf_dir, "q_ml_confusion")
    # F1 must equal confusion's f1 (same operating point, same counts)
    assert got[1.0].fbeta == pytest.approx(conf.f1, abs=2e-6)
    for r in got.values():
        assert 0.0 <= r.fbeta <= 1.0
        assert (r.tp, r.fp, r.fn) == (got[1.0].tp, got[1.0].fp, got[1.0].fn)
    # F-beta is monotone between precision and recall: F0.5 and F2
    # bracket F1 (which side depends on precision vs recall)
    p = got[1.0].tp / (got[1.0].tp + got[1.0].fp)
    rec = got[1.0].tp / (got[1.0].tp + got[1.0].fn)
    if p > rec:
        assert got[0.5].fbeta >= got[1.0].fbeta >= got[2.0].fbeta
    elif p < rec:
        assert got[0.5].fbeta <= got[1.0].fbeta <= got[2.0].fbeta


def test_youden_optimal_dominates_fixed_point(spark, sf_dir):
    (best,) = rows(spark, sf_dir, "q_ml_youden_optimal")
    (mcc,) = rows(spark, sf_dir, "q_ml_mcc")
    # the swept optimum can never lose to the fixed operating point
    assert best.youden_j >= mcc.youden_j - 2e-6
    assert 0.0 <= best.tpr <= 1.0 and 0.0 <= best.fpr <= 1.0
    assert best.youden_j == pytest.approx(best.tpr - best.fpr, abs=2e-6)


def test_mrr_map_ndcg_cross_consistency(spark, sf_dir):
    mrr = {r.probe_id: r for r in rows(spark, sf_dir, "q_ml_mrr")}
    ap = {r.probe_id: r for r in rows(spark, sf_dir, "q_ml_map")}
    assert set(mrr) == set(ap)
    for pid, m in mrr.items():
        if m.first_rel_rank is not None:
            assert 1 <= m.first_rel_rank <= 10
            assert m.rr == pytest.approx(1.0 / m.first_rel_rank, abs=2e-6)
            # a probe with a relevant hit has positive AP, and
            # AP <= 1 always; precision@first_rel <= 1 bounds AP by rr
            # only when n_rel >= k — check the universal bounds instead
            assert 0.0 < ap[pid].ap_at_k <= 1.0
        else:
            assert m.rr == 0.0
            assert ap[pid].ap_at_k == 0.0


# ---- wave 4: timeseries diagnostics --------------------------------------


def test_pettitt_bounds(spark, sf_dir):
    got = rows(spark, sf_dir, "q_timeseries_pettitt")
    assert len(got) == 5
    for r in got:
        assert r.n_days >= 3
        # |U_t| is bounded by t(n-t) <= n^2/4 pairs
        assert 0 <= r.k_stat <= r.n_days * r.n_days / 4 + 1
        assert 0.0 <= r.p_value <= 1.0


def test_variance_ratio_positive(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_variance_ratio"):
        assert r.variance_ratio > 0
        assert 0.0 <= r.p_value <= 1.0


def test_turning_points_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_turning_points"):
        assert 0 <= r.n_turning_points <= r.n_days - 2
        assert r.expected == pytest.approx(2.0 * (r.n_days - 2) / 3.0, abs=1e-6)
        assert 0.0 <= r.p_value <= 1.0


def test_dickey_fuller_flag_consistency(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_dickey_fuller"):
        # 1% rejection implies 5% rejection (nested critical regions)
        assert (not r.stationary_1pct) or r.stationary_5pct
        assert r.stationary_1pct == (r.df_stat < -3.43)
        assert r.stationary_5pct == (r.df_stat < -2.86)
        # regression on differences of a mean-reverting-ish series:
        # gamma in (-2, 1) for any real series
        assert -2.0 < r.gamma < 1.0


def test_kpss_nonnegative_and_flag(spark, sf_dir):
    for r in rows(spark, sf_dir, "q_timeseries_kpss"):
        assert r.kpss_stat >= 0
        assert r.nonstationary_5pct == (r.kpss_stat > 0.463)


def test_permutation_entropy_bounds(spark, sf_dir):
    import math

    for r in rows(spark, sf_dir, "q_timeseries_permutation_entropy"):
        assert 1 <= r.n_patterns <= 13  # Fubini(3)
        assert r.n_windows == r.n_windows  # present
        assert 0.0 <= r.perm_entropy <= math.log(13.0) + 1e-9
        assert 0.0 <= r.perm_entropy_norm <= 1.0 + 1e-9
        # H <= ln(n_patterns) for any distribution over n_patterns cells
        assert r.perm_entropy <= math.log(r.n_patterns) + 1e-6


# ---- wave 5: corpus richness + link prediction + SRM ---------------------


def test_lexical_richness_spectrum_identities(spark, sf_dir):
    got = rows(spark, sf_dir, "q_text_lexical_richness")
    assert got
    for r in got:
        assert 1 <= r.vocab <= r.n_tokens
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert 0.0 <= r.sichel_s <= 1.0
        assert r.hapax_ratio + r.sichel_s <= 1.0 + 1e-9  # V1+V2 <= V
        assert r.yule_k >= 0
        # Guiraud: 1/sqrt(N) <= R <= sqrt(N)
        assert r.guiraud_r <= r.n_tokens**0.5 + 1e-9


def test_source_vocab_overlap_jaccard_bounds(spark, sf_dir):
    got = rows(spark, sf_dir, "q_text_source_vocab_overlap")
    assert got
    js = [r.jaccard for r in got]
    assert js == sorted(js, reverse=True)  # top-k ordering
    for r in got:
        assert r.src_a < r.src_b
        assert 0 < r.shared <= min(r.vocab_a, r.vocab_b)
        assert 0.0 < r.jaccard <= 1.0


def test_preferential_attachment_scores(spark, sf_dir):
    got = rows(spark, sf_dir, "q_graph_preferential_attachment")
    assert got
    scores = [r.pa_score for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        assert r.s1 < r.s2
        assert r.pa_score == r.deg1 * r.deg2


def test_rich_club_profile_monotone_membership(spark, sf_dir):
    got = rows(spark, sf_dir, "q_graph_rich_club")
    assert got
    prev_nodes = None
    for r in got:
        assert 0.0 <= r.phi <= 1.0
        assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2
        if prev_nodes is not None:
            assert r.n_nodes <= prev_nodes  # clubs shrink as k grows
        prev_nodes = r.n_nodes


def test_srm_consistent_with_ab_assign(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_events_srm")
    ab = {x.arm: x for x in rows(spark, sf_dir, "q_events_ab_assign")}
    # same md5 bucket rule => same user partition
    assert r.n_control == ab["control"].n_users
    assert r.n_treatment == ab["treatment"].n_users
    assert r.expected_each == (r.n_control + r.n_treatment) / 2
    assert 0.0 <= r.p_value <= 1.0
    assert r.srm_alarm == (r.p_value < 0.001) or r.p_value == 0.001


# ---- wave 6: ordinal association + shape + concentration ------------------


def test_gamma_somers_bounds_and_ordering(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_gamma_somers")
    assert r.concordant >= 0 and r.discordant >= 0
    assert -1.0 <= r.gamma <= 1.0
    assert -1.0 <= r.somers_dyx <= 1.0
    # |D| <= |gamma|: Somers adds Y-ties to the denominator
    assert abs(r.somers_dyx) <= abs(r.gamma) + 1e-9


def test_qq_table_monotone_quantiles(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_qq_table")
    assert [r.percentile for r in got] == list(range(10, 100, 10))
    qp = [r.q_purchase_cents for r in got]
    qo = [r.q_other_cents for r in got]
    assert qp == sorted(qp) and qo == sorted(qo)  # CDF inverses are monotone
    for r in got:
        assert r.diff_cents == r.q_purchase_cents - r.q_other_cents


def test_lorenz_users_accounting(spark, sf_dir):
    got = rows(spark, sf_dir, "q_events_lorenz_users")
    assert 1 <= len(got) <= 10
    assert sum(r.n_users for r in got) > 0
    # users ranked ascending by activity => the PER-USER average within
    # each decile is non-decreasing (raw decile shares can dip when the
    # integer split gives deciles unequal user counts)
    per_user = [r.n_events / r.n_users for r in got]
    assert all(b >= a - 1e-9 for a, b in zip(per_user, per_user[1:]))
    assert got[-1].cum_share == pytest.approx(1.0, abs=1e-6)
    cums = [r.cum_share for r in got]
    assert cums == sorted(cums)
    g = {r.gini_users for r in got}
    assert len(g) == 1
    assert 0.0 <= got[0].gini_users < 1.0


# ---- wave 7: CDF distance + robust location + ordered blocks + hit rate ---


def test_cvm_nonnegative_and_flag(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_cvm_test")
    assert r.n_purchase > 0 and r.n_other > 0
    assert r.cvm_stat >= 0
    assert r.significant_5pct == (r.cvm_stat > 0.461) or abs(
        r.cvm_stat - 0.461
    ) < 1e-6


def test_trimmed_mean_between_extremes(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_trimmed_mean")
    assert len(got) == 5
    for r in got:
        assert r.trimmed_each == r.n // 10
        # the trimmed mean lies inside the untrimmed value range
        assert 0.0 <= r.trimmed_mean <= 700.0


def test_page_trend_consistent_with_friedman(spark, sf_dir):
    (pg,) = rows(spark, sf_dir, "q_timeseries_page_trend")
    (fr,) = rows(spark, sf_dir, "q_agg_friedman")
    # same block design => same dimensions
    assert (pg.b_days, pg.k_groups) == (fr.b_days, fr.k_groups)
    # L bounds: k(k+1)/2 * b * min-rank-sum <= L <= with max ordering
    b, k = pg.b_days, pg.k_groups
    lmin = b * sum(j * (k + 1 - j) for j in range(1, k + 1))
    lmax = b * sum(j * j for j in range(1, k + 1))
    assert lmin - 1e-6 <= pg.page_l <= lmax + 1e-6
    assert 0.0 <= pg.p_value <= 1.0


def test_topk_accuracy_ladder_consistency(spark, sf_dir):
    got = {r.k: r for r in rows(spark, sf_dir, "q_ml_topk_accuracy")}
    assert set(got) == {1, 3, 5, 10}
    # hit rate is monotone in k
    rates = [got[k].hit_rate for k in (1, 3, 5, 10)]
    assert rates == sorted(rates)
    # consistency with MRR: a probe has a first_rel_rank <= k iff it
    # counts as a hit at k
    mrr = rows(spark, sf_dir, "q_ml_mrr")
    for k in (1, 3, 5, 10):
        n_hit = sum(
            1
            for m in mrr
            if m.first_rel_rank is not None and m.first_rel_rank <= k
        )
        assert got[k].n_hit == n_hit
        assert got[k].n_probes == len(mrr)


# ---- wave 8: CDF distances + median CI + dedup yield + journeys ----------


def test_kuiper_dominates_ks_directions(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_kuiper")
    assert 0.0 <= r.d_plus <= 1.0 and 0.0 <= r.d_minus <= 1.0
    assert r.kuiper_v == pytest.approx(r.d_plus + r.d_minus, abs=2e-6)
    # V >= the KS statistic (max of the two directed gaps)
    assert r.kuiper_v >= max(r.d_plus, r.d_minus) - 1e-9


def test_wasserstein_nonnegative_bounded(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_wasserstein")
    # W1 between distributions supported on [0, ~600] is in that range
    assert 0.0 <= r.wasserstein_1 <= 700.0


def test_median_ci_brackets_median(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_median_ci")
    assert len(got) == 5
    for r in got:
        assert r.ci_lo_cents <= r.median_cents <= r.ci_hi_cents


def test_cluster_sizes_reconcile_with_clusters(spark, sf_dir):
    hist = rows(spark, sf_dir, "q_dedup_cluster_sizes")
    cl = rows(spark, sf_dir, "q_dedup_clusters")
    assert sum(r.n_docs for r in hist) == len(cl)
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in hist)
    from collections import Counter

    sizes = Counter(r.cluster_size for r in cl)
    # each cluster of size s contributes s member rows
    expected = {s: n // s for s, n in sizes.items()}
    assert {r.cluster_size: r.n_clusters for r in hist} == expected


def test_journey_entropy_bounds_and_rate(spark, sf_dir):
    import math

    got = rows(spark, sf_dir, "q_events_journey_entropy")
    assert len(got) == 5
    rates = {r.entropy_rate for r in got}
    assert len(rates) == 1  # the chain-level scalar repeats per row
    hmax = math.log(5.0)
    for r in got:
        assert 0.0 <= r.state_entropy <= hmax + 1e-9
    # the rate is a convex combination of the state entropies
    lo = min(r.state_entropy for r in got)
    hi = max(r.state_entropy for r in got)
    assert lo - 1e-6 <= got[0].entropy_rate <= hi + 1e-6


# ---- wave 9: FWER control + SQL portability -------------------------------


def test_holm_nesting_vs_bonferroni_and_bh(spark, sf_dir):
    holm = {r.day_of_week: r for r in rows(spark, sf_dir, "q_agg_holm")}
    bh = {r.day_of_week: r for r in rows(spark, sf_dir, "q_agg_bh_fdr")}
    assert set(holm) == set(bh)
    for dw, h in holm.items():
        # identical underlying tests
        assert h.p_value == pytest.approx(bh[dw].p_value, abs=2e-6)
        # textbook rejection-set nesting: bonferroni <= holm <= bh
        # (same alpha=q=0.05)
        if h.bonferroni_rejected:
            assert h.holm_rejected
        if h.holm_rejected:
            assert bh[dw].rejected
        assert 0.0 <= h.holm_threshold <= 0.05 + 1e-9


def test_order_all_fully_sorted(spark, sf_dir):
    got = rows(spark, sf_dir, "q_sql_order_all")
    keys = [(r.event_type, r.dw, r.n, r.cents) for r in got]
    assert keys == sorted(keys)
    assert len(got) <= 35  # 5 types x 7 days


# ---- wave 10: dedup yield curve + corpus sizing ---------------------------


def test_threshold_curve_monotone_and_consistent_with_minhash(spark, sf_dir):
    curve = {r.agree_min: r for r in rows(spark, sf_dir, "q_dedup_threshold_curve")}
    assert set(curve) == {4, 6, 8, 10, 12, 14, 16}
    pairs = [curve[k].n_pairs for k in sorted(curve)]
    docs = [curve[k].n_docs_affected for k in sorted(curve)]
    # raising the threshold can only DROP pairs/docs
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    for r in curve.values():
        assert r.threshold == r.agree_min / 16
        assert r.n_docs_affected <= 2 * r.n_pairs
    # agreement >= 4/16 is exactly q_dedup_minhash's 0.25 cut
    mh = rows(spark, sf_dir, "q_dedup_minhash")
    assert curve[4].n_pairs == len(mh)


def test_length_profile_quantile_ordering(spark, sf_dir):
    got = rows(spark, sf_dir, "q_text_length_profile")
    assert got
    for r in got:
        assert (
            r.min_chars
            <= r.p25_chars
            <= r.p50_chars
            <= r.p75_chars
            <= r.p90_chars
            <= r.max_chars
        )
        assert r.min_chars <= r.mean_chars <= r.max_chars
        assert r.n_docs > 0


# ---- wave 11: Hilbert clustering ------------------------------------------


def _py_xy2d(x: int, y: int, n: int = 256) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_pure_python_xy2d(spark, sf_dir):
    got = rows(spark, sf_dir, "q_sort_hilbert")
    assert got
    hs = [r.h for r in got]
    assert hs == sorted(hs)
    for r in got:
        assert r.h == _py_xy2d(r.p_size & 255, r.p_partkey % 256)
        assert 0 <= r.h < 256 * 256


# ---- wave 12: AD distance + token-level dedup impact -----------------------


def test_ad_nonnegative_and_family_consistency(spark, sf_dir):
    (r,) = rows(spark, sf_dir, "q_agg_ad_test")
    assert r.n_purchase > 0 and r.n_other > 0
    assert r.ad_stat >= 0
    assert r.significant_5pct == (r.ad_stat > 2.492)


def test_dedup_impact_reconciles_with_exact_dedup(spark, sf_dir):
    got = rows(spark, sf_dir, "q_text_dedup_impact")
    assert got
    for r in got:
        assert 1 <= r.n_kept <= r.n_docs
        assert 0 < r.kept_tokens <= r.total_tokens
        assert 0.0 <= r.token_savings < 1.0
        if r.n_kept == r.n_docs:
            assert r.token_savings == 0.0
    # corpus-level doc counts must reconcile with q_dedup_exact
    ex = rows(spark, sf_dir, "q_dedup_exact")
    assert sum(r.n_docs for r in got) == sum(x.n_copies for x in ex)


# ---- wave 13: embedding drift ----------------------------------------------


def test_centroid_drift_bounds(spark, sf_dir):
    got = rows(spark, sf_dir, "q_embed_centroid_drift")
    assert got
    for r in got:
        assert r.n_a + r.n_b > 0
        assert -1.0 <= r.centroid_cos <= 1.0
        assert r.drift == pytest.approx(1.0 - r.centroid_cos, abs=2e-6)
        # cauchy-schwarz bound is the hard invariant; positivity is NOT
        # (at sf0.001 a label's halves hold 2-3 random vectors each and
        # can be mildly anti-correlated)
        assert 0.0 <= r.drift <= 2.0 + 1e-9


# ---- wave 14: EWMA control chart -------------------------------------------


def test_ewma_control_bounds(spark, sf_dir):
    got = rows(spark, sf_dir, "q_timeseries_ewma_control")
    assert len(got) == 5
    for r in got:
        assert 0 <= r.n_out_of_control <= r.n_days
        assert r.max_zscore >= 0
        # n_ooc and max_zscore must agree across the 3-sigma line
        assert (r.n_out_of_control > 0) == (r.max_zscore > 3.0)


# ---- wave 15: the distributed (Poisson) bootstrap --------------------------


def test_poisson_bootstrap_replicates(spark, sf_dir):
    got = rows(spark, sf_dir, "q_sample_poisson_bootstrap")
    assert [r.replicate for r in got] == list(range(10))
    ests = [r.est_mean for r in got]
    for r in got:
        # E[n_eff] = n; Poisson(1) keeps effective mass near the corpus
        assert r.n_eff > 0
        assert 0.0 < r.est_mean < 700.0
    # replicate means scatter around the plain mean within a sane band
    mu = sum(ests) / len(ests)
    assert all(abs(e - mu) / mu < 0.25 for e in ests)


# ---- wave 16: Theil decomposition ------------------------------------------


def test_theil_additivity_identity(spark, sf_dir):
    got = rows(spark, sf_dir, "q_agg_theil_decomp")
    assert len(got) == 5
    totals = {(r.theil_total, r.theil_between) for r in got}
    assert len(totals) == 1  # chain-level scalars repeat per row
    t_total = got[0].theil_total
    t_between = got[0].theil_between
    t_within = sum(r.within_contrib for r in got)
    # THE decomposition identity: T = T_between + T_within
    assert t_total == pytest.approx(t_between + t_within, abs=5e-5)
    assert t_total >= 0 and t_between >= 0
    for r in got:
        assert r.theil_g >= 0
        assert 0.0 < r.value_share < 1.0
    assert sum(r.value_share for r in got) == pytest.approx(1.0, abs=1e-5)
    # per-group theil must match q_agg_theil's (same quantization family)
    tg = {r.event_type: r.theil for r in rows(spark, sf_dir, "q_agg_theil")}
    for r in got:
        assert r.theil_g == pytest.approx(tg[r.event_type], abs=1e-4)


# ---- wave 17: BY-FDR + temperature mixing plan ------------------------------


def test_by_nests_inside_bh(spark, sf_dir):
    by = {r.day_of_week: r for r in rows(spark, sf_dir, "q_agg_benjamini_yekutieli")}
    bh = {r.day_of_week: r for r in rows(spark, sf_dir, "q_agg_bh_fdr")}
    assert set(by) == set(bh)
    for dw, b in by.items():
        assert b.p_value == pytest.approx(bh[dw].p_value, abs=2e-6)
        # BY divides thresholds by H_m > 1 => BY rejections nest in BH's
        assert b.by_threshold < bh[dw].bh_threshold
        if b.rejected:
            assert bh[dw].rejected


def test_temperature_plan_allocation(spark, sf_dir):
    got = rows(spark, sf_dir, "q_mix_temperature_plan")
    assert got
    assert sum(r.mix_weight for r in got) == pytest.approx(1.0, abs=1e-4)
    # tau < 1 flattens: the LARGEST source's mix weight is below its raw
    # token share, the smallest's above (the whole point of temperature)
    big = max(got, key=lambda r: r.tokens)
    small = min(got, key=lambda r: r.tokens)
    tot = sum(r.tokens for r in got)
    if big.tokens != small.tokens:
        assert big.mix_weight < big.tokens / tot + 1e-9
        assert small.mix_weight > small.tokens / tot - 1e-9
    for r in got:
        assert 0.0 < r.fraction_kept <= 1.0
        assert r.needs_upsampling == (r.quota_tokens > r.tokens) or abs(
            r.quota_tokens - r.tokens
        ) <= 1
