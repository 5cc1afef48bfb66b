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
