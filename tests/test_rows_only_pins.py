"""Dedicated correctness pins for the no-oracle queries that lack a
specialized test elsewhere: an error bound for the HLL approximation,
recall for IVF ANN, exact expectations for the inferred union schema,
and a round-trip invariant for the partitioned sink."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.tables import load_table

SPECS = all_specs()


def test_agg_approx_within_rsd_bound(spark, sf_dir):
    # approx_count_distinct(rsd=0.02): HLL++ error is probabilistic but
    # 5x the target rsd is far beyond any plausible excursion
    approx = {
        r.l_returnflag: r.approx_parts
        for r in SPECS["q_agg_approx"].func(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) / n <= 0.10, (k, approx[k], n)


def test_sim_topk_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = [r[0] for r in SPECS["q_sim_topk"].func(spark, sf_dir).collect()]
    ivf = {r[0] for r in SPECS["q_sim_topk_ivf"].func(spark, sf_dir).collect()}
    # nprobe buckets cover a fraction of the space: demand recall@k >= 0.5
    hits = sum(1 for v in brute[: len(brute)] if v in ivf)
    assert hits / len(brute) >= 0.5, (hits, len(brute))


def test_schema_union_infers_expected_fields(spark, sf_dir):
    rows = {
        r.field_path: r.inferred_type
        for r in SPECS["q_schema_union"].func(spark, sf_dir).collect()
    }
    # BSON extended-JSON scalars map per the type table (SURVEY §1.2)
    assert rows["bson_id"] == "string(objectid)"
    assert rows["bson_ts"] == "timestamp"
    assert rows["bson_amt"].startswith("decimal")
    assert rows["bson_bin"] == "binary"
    assert "bson_mk" not in rows  # MinKey is dropped by design
    # k conflicts (int vs str across corpus shapes) → promoted to string
    assert rows["k"] == "string"
    assert rows["extra.b"] == "array<long>"


def test_sink_partitioned_round_trip_conserves_rows(spark, sf_dir):
    out = SPECS["q_sink_partitioned"].func(spark, sf_dir)
    total = out.agg(F.sum("n")).head()[0]
    assert total == load_table(spark, sf_dir, "events").count()
    # partition values must cover every month present in the source
    months = {r.m for r in out.select("m").distinct().collect()}
    src_months = {
        r.m
        for r in load_table(spark, sf_dir, "events")
        .select(F.month("ts").alias("m"))
        .distinct()
        .collect()
    }
    assert months == src_months


def test_embed_pca_matches_direct_numpy(spark, sf_dir):
    """q_embed_pca's distributed Gramian + literal-array projection must
    agree with a single-box numpy PCA (same centering, same
    sign-canonicalization) to float tolerance, and PC1 must explain at
    least as much projected variance as PC2."""
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    M = np.asarray([r.embedding for r in rows], dtype=np.float64)
    C = np.cov(M, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1]
    comps = []
    for idx in order[:2]:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    X = M - M.mean(axis=0)
    want_pc1 = X @ comps[0]
    want_pc2 = X @ comps[1]

    got = SPECS["q_embed_pca"].func(spark, sf_dir).collect()
    got_ids = np.array([r.vec_id for r in got])
    assert np.array_equal(got_ids, ids)
    pc1 = np.array([r.pc1 for r in got])
    pc2 = np.array([r.pc2 for r in got])
    # rounding in the operator is 6dp; allow that plus float noise
    assert np.max(np.abs(pc1 - want_pc1)) < 1e-5
    assert np.max(np.abs(pc2 - want_pc2)) < 1e-5
    assert pc1.var() >= pc2.var()


def test_countmin_fast_guarantee_and_twin_agreement(spark, sf_dir):
    # CMS guarantee: estimates never undercount; and the xxhash64 twin
    # must agree with the oracle-checked md5 variant on the probe-key
    # set and true counts (only bucket collisions may differ)
    fast = {
        r.l_partkey: (r.true_n, r.cms_est)
        for r in SPECS["q_agg_countmin_fast"].func(spark, sf_dir).collect()
    }
    slow = {
        r.l_partkey: (r.true_n, r.cms_est)
        for r in SPECS["q_agg_countmin"].func(spark, sf_dir).collect()
    }
    assert set(fast) == set(slow)
    for k, (true_n, est) in fast.items():
        assert est >= true_n, (k, true_n, est)
        assert slow[k][0] == true_n


def test_hll_union_error_bound(spark, sf_dir):
    """Per-source estimates AND the unioned total stay within the
    Datasketches HLL published error (lgK=12 → rse ≈ 1.04/sqrt(4096)
    ≈ 1.6%; allow 3 sigma ≈ 5%) of exact distinct counts; the union
    row must estimate the GLOBAL distinct, not the sum of parts."""
    rows = SPECS["q_agg_hll_union"].func(spark, sf_dir).collect()
    by_type = {r.event_type: r for r in rows}
    assert "__ALL__" in by_type
    for r in rows:
        if r.event_type == "__ALL__":
            continue
        assert abs(r.est_users - r.exact) <= max(0.05 * r.exact, 1), r
    ev = load_table(spark, sf_dir, "events")
    exact_all = ev.select("user_id").distinct().count()
    est_all = by_type["__ALL__"].est_users
    assert abs(est_all - exact_all) <= max(0.05 * exact_all, 1)
    # mergeability: the union estimates global distinct (users appear in
    # EVERY type here), not the 5x-inflated sum of per-type estimates
    assert est_all < sum(r.est_users for r in rows if r.event_type != "__ALL__")


def test_dedup_near_zero_fn_on_exact_duplicates(spark, tmp_path):
    # structural guarantee regardless of hash values: identical text ->
    # identical shingle set -> identical 16-minhash signature -> same
    # band hashes -> the pair MUST surface with est_jaccard 1.0 (unless
    # its band bucket tripped the degenerate-bucket cap, which these
    # 3-copy groups never do). The parquet fixtures ship no exact-dup
    # texts, so synthesize a corpus: 10 texts x 3 copies + 10 singles.
    rows = []
    doc_id = 0
    for g in range(10):
        text = f"alpha{g} beta{g} gamma{g} delta{g} epsilon{g} zeta{g}"
        for _ in range(3):
            rows.append((doc_id, text, "en", "syn", len(text)))
            doc_id += 1
    for g in range(10):
        text = f"solo{g} only{g} once{g} here{g} now{g}"
        rows.append((doc_id, text, "en", "syn", len(text)))
        doc_id += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "neardup_sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    expected = set()
    for g in range(10):
        ids = [g * 3, g * 3 + 1, g * 3 + 2]
        expected |= {(ids[0], ids[1]), (ids[0], ids[2]), (ids[1], ids[2])}
    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in SPECS["q_dedup_near"].func(spark, sf).collect()
    }
    missing = [p for p in expected if p not in got]
    assert missing == [], f"exact-dup pairs absent from LSH candidates: {missing[:5]}"
    for p in expected:
        assert got[p] == 1.0, (p, got[p])
    # singles share no shingles with anything: they must pair with nothing
    singles = set(range(30, 40))
    assert all(a not in singles and b not in singles for a, b in got), got


def test_dedup_simhash_matches_pure_python_reference(spark, sf_dir):
    # full differential for the numpy bit-fold kernel + banding + cap:
    # token hashes come from the same JVM xxhash64, the fold/band/cap/
    # verify pipeline is re-derived in plain Python, and the PAIR SETS
    # must match exactly
    from mongodb_iceberg_sync_spark.operators.dedup import MAX_LSH_BUCKET

    hashed = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.transform(F.split("text", " "), lambda tk: F.xxhash64(tk)).alias("th"),
        )
        .collect()
    )
    sims = {}
    for r in hashed:
        sums = [0] * 64
        for h in r.th:
            u = h & 0xFFFFFFFFFFFFFFFF
            for b in range(64):
                sums[b] += 1 if (u >> b) & 1 else -1
        v = 0
        for b in range(64):
            if sums[b] > 0:
                v |= 1 << b
        sims[r.doc_id] = v
    buckets = {}
    for doc_id, v in sims.items():
        for band in range(4):
            buckets.setdefault((band, (v >> (band * 16)) & 0xFFFF), []).append(doc_id)
    expected = set()
    for members in buckets.values():
        if len(members) > 2 * MAX_LSH_BUCKET:
            continue  # degenerate-bucket cap, mirrored from the operator
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                ham = bin(sims[a] ^ sims[b]).count("1")
                if ham <= 3:
                    expected.add((a, b, ham))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in SPECS["q_dedup_simhash"].func(spark, sf_dir).collect()
    }
    assert got == expected, (
        f"only-spark: {sorted(got - expected)[:5]} "
        f"only-ref: {sorted(expected - got)[:5]}"
    )
