"""Multimodal operator checks beyond the oracle gate: the feature
extractor's math is pinned against an independent pure-Python
computation on the same payload bytes (the query itself is rows-only —
byte entropy is not SQL-expressible in the oracle)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def _py_features(payload: bytes):
    counts = Counter(payload)
    n = len(payload)
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return {
        "n_bytes": n,
        "n_distinct_bytes": len(counts),
        "mean_byte": round(sum(payload) / n, 6),
        "entropy_bits": round(ent, 6),
    }


def test_features_match_pure_python(spark, sf_dir):
    out = {
        r.doc_id: r
        for r in SPECS["q_multimodal_features"].func(spark, sf_dir).collect()
    }
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 500 ORDER BY doc_id LIMIT 5"
    ).fetchall()
    assert texts, "fixture documents missing"
    for doc_id, text in texts:
        exp = _py_features(text.encode("utf-8"))
        got = out[doc_id]
        assert got.n_bytes == exp["n_bytes"]
        assert got.n_distinct_bytes == exp["n_distinct_bytes"]
        assert got.mean_byte == exp["mean_byte"]
        assert got.entropy_bits == exp["entropy_bits"]


def test_resize_halves_dims_and_decimates(spark, sf_dir):
    rows = SPECS["q_multimodal_resize"].func(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.new_width == r.width // 2
        assert r.new_height == r.height // 2
        assert r.doc_id % 3 == 1  # image rows only


def test_phash_matches_pure_python_reference(spark, sf_dir):
    """q_multimodal_phash == brute-force numpy reference: same
    signatures and the banded-LSH candidate set must contain every
    hamming<=6 pair that shares a band (no false negatives from the
    distributed banding)."""
    import numpy as np
    import duckdb

    from mongodb_iceberg_sync_spark.operators.multimodal import (
        _PHASH_BANDS,
        _PHASH_BITS,
        _PHASH_MAX_HAMMING,
    )
    from mongodb_iceberg_sync_spark.registry import all_specs

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    def ref_phash(text: str) -> int:
        a = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64)
        if len(a) < _PHASH_BITS:
            a = np.pad(a, (0, _PHASH_BITS - len(a)))
        n = (len(a) // _PHASH_BITS) * _PHASH_BITS
        buckets = a[:n].reshape(_PHASH_BITS, -1).mean(axis=1)
        bits = (buckets > buckets.mean()).astype(np.uint64)
        sig = 0
        for b in bits:
            sig = (sig << 1) | int(b)
        return sig

    sigs = {doc_id: ref_phash(text) for doc_id, text in rows}
    expected = set()
    ids = sorted(sigs)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            x = sigs[da] ^ sigs[db]
            if bin(x).count("1") > _PHASH_MAX_HAMMING:
                continue
            shares_band = any(
                (sigs[da] >> (16 * k)) & 0xFFFF == (sigs[db] >> (16 * k)) & 0xFFFF
                for k in range(_PHASH_BANDS)
            )
            if shares_band:
                expected.add((da, db, bin(x).count("1")))

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in all_specs()["q_multimodal_phash"].func(spark, sf_dir).collect()
    }
    assert got == expected
    # hamming<=6 over 4x16 bands: <=6 flipped bits cannot touch all 4
    # bands, so EVERY such pair shares a band — banding is lossless here
    for da, db, _h in expected:
        assert (da, db) in {(a, b) for a, b, _ in got}


def test_dup_clusters_match_pure_python_union_find(spark, sf_dir):
    """q_multimodal_dup_clusters == union-find over the pure-Python
    reference pair set (same signatures/banding/hamming as the phash
    reference test), with min-id canonical labels and exact sizes."""
    import duckdb
    import numpy as np

    from mongodb_iceberg_sync_spark.operators.multimodal import (
        _PHASH_BANDS,
        _PHASH_BITS,
        _PHASH_MAX_BUCKET,
        _PHASH_MAX_HAMMING,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    def ref_phash(text: str) -> int:
        a = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.float64)
        if len(a) < _PHASH_BITS:
            a = np.pad(a, (0, _PHASH_BITS - len(a)))
        n = (len(a) // _PHASH_BITS) * _PHASH_BITS
        buckets = a[:n].reshape(_PHASH_BITS, -1).mean(axis=1)
        bits = (buckets > buckets.mean()).astype(np.uint64)
        sig = 0
        for b in bits:
            sig = (sig << 1) | int(b)
        return sig

    sigs = {doc_id: ref_phash(text) for doc_id, text in rows}
    # mirror the operator's oversized-bucket valve: band rows in hot
    # (band,val) buckets never enter the candidate join
    buckets = Counter()
    for sig in sigs.values():
        for k in range(_PHASH_BANDS):
            buckets[(k, (sig >> (16 * k)) & 0xFFFF)] += 1
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = sorted(sigs)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            x = sigs[da] ^ sigs[db]
            if bin(x).count("1") > _PHASH_MAX_HAMMING:
                continue
            if any(
                (sigs[da] >> (16 * k)) & 0xFFFF == (sigs[db] >> (16 * k)) & 0xFFFF
                and buckets[(k, (sigs[da] >> (16 * k)) & 0xFFFF)]
                <= _PHASH_MAX_BUCKET
                for k in range(_PHASH_BANDS)
            ):
                union(da, db)

    members: dict[int, list[int]] = {}
    for node in list(parent):
        members.setdefault(find(node), []).append(node)
    expected = {
        node: (root, len(mem))
        for root, mem in members.items()
        for node in mem
    }

    got = SPECS["q_multimodal_dup_clusters"].func(spark, sf_dir).collect()
    got_map = {r.doc_id: (r.cluster_id, r.cluster_size) for r in got}
    assert got_map == expected


def test_dup_clusters_hot_bucket_valve(spark, tmp_path):
    """The r10 per-(band,val) bucket valve drops degenerate buckets from
    the candidate join entirely: a boilerplate blob repeated past
    _PHASH_MAX_BUCKET emits NO pairs, while a small distinct cluster in
    the same table is untouched (exactness below the cap)."""
    from mongodb_iceberg_sync_spark.operators.multimodal import (
        _PHASH_MAX_BUCKET,
        q_multimodal_dup_clusters,
    )

    # constant payload => aHash buckets all equal the mean => phash 0 for
    # every copy: one (band, 0) bucket of size cap+6 on all four bands
    boiler = [(i, "z" * 200) for i in range(_PHASH_MAX_BUCKET + 6)]
    # varied payload => nonzero phash, identical for both copies: a
    # 2-member bucket per band, far below the cap
    varied_text = "".join(chr(65 + (i * 7) % 26) * 3 for i in range(80))
    varied = [(10_000, varied_text), (10_001, varied_text)]
    docs = spark.createDataFrame(boiler + varied, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = q_multimodal_dup_clusters(spark, str(tmp_path)).collect()
    assert {(r.doc_id, r.cluster_id, r.cluster_size) for r in got} == {
        (10_000, 10_000, 2),
        (10_001, 10_000, 2),
    }
