"""Mathematical invariants of the round-10 operators.

Same charter as tests/test_r9_invariants.py: the DuckDB sweep proves
Spark == DuckDB; these prove both are RIGHT via properties any correct
implementation must satisfy on any input.
"""

from __future__ import annotations

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
