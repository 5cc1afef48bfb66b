"""Bloom prefilter invariants: zero false negatives, bounded positives."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.operators.dedup import (
    bloom_candidates,
    q_dedup_bloom,
)
from mongodb_iceberg_sync_spark.operators._util import t


def test_no_false_negatives(spark, sf_dir):
    # every query doc whose exact text exists in the reference half
    # MUST be flagged — a bloom filter can lie positive, never negative
    docs = t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    qry = docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0))
    truly_present = {
        r["doc_id"]
        for r in qry.join(
            ref.select("text").distinct(), "text", "left_semi"
        ).collect()
    }
    flagged = {r["doc_id"] for r in q_dedup_bloom(spark, sf_dir).collect()}
    assert truly_present <= flagged
    # the doc_id%4==0 docs are literally in the reference
    assert all(d in flagged for d in truly_present if d % 4 == 0)


def test_false_positive_rate_bounded(spark, sf_dir):
    # with |ref| docs setting 5 bits each in 2^17 positions the fill
    # factor is tiny; novel docs should almost never hit all 5 bits
    docs = t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    novel = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" <novel-suffix>"))
    )
    n_novel = novel.count()
    fp = bloom_candidates(ref, novel).count()
    assert fp <= max(2, 0.05 * n_novel)


def test_synthetic_overlap_exact(spark):
    ref = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(100)], "doc_id long, text string"
    )
    qry = spark.createDataFrame(
        [(1000 + i, f"doc body {i}") for i in range(50)]
        + [(2000 + i, f"unseen body {i}") for i in range(50)],
        "doc_id long, text string",
    )
    flagged = {r["doc_id"] for r in bloom_candidates(ref, qry).collect()}
    assert set(range(1000, 1050)) <= flagged
