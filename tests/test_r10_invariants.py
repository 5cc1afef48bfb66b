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
