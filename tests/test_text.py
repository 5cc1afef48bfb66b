"""Text-analysis operator unit tests (tie-break pin for lang-ID)."""

from __future__ import annotations

from mongodb_iceberg_sync_spark.operators.text import lang_id_pred_col


def test_lang_id_tie_breaks_alphabetically_first(spark):
    # "de" is a stopword in the es, fr AND zh profiles (score 2 each,
    # en/de profiles score 0) -> tie must resolve to the alphabetically
    # FIRST language: es.
    df = spark.createDataFrame([("de de",)], ["text"])
    got = df.select(lang_id_pred_col("text").alias("p")).head()[0]
    assert got == "es"


def test_lang_id_clear_winner(spark):
    df = spark.createDataFrame([("the cat and the hat of doom",)], ["text"])
    got = df.select(lang_id_pred_col("text").alias("p")).head()[0]
    assert got == "en"


def test_lang_id_all_zero_scores_alphabetical(spark):
    # no profile matches anything -> all scores 0 -> alphabetically first
    df = spark.createDataFrame([("zzz qqq xyzzy",)], ["text"])
    got = df.select(lang_id_pred_col("text").alias("p")).head()[0]
    assert got == "de"  # alphabetically first of the five profiles


def test_compress_ratio_matches_direct_zlib(spark, sf_dir):
    """q_text_compress_ratio == per-row zlib reference (same library,
    same level — the kernel must not alter bytes on the way in)."""
    import zlib

    import duckdb

    from mongodb_iceberg_sync_spark.registry import all_specs

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expected = {
        doc_id: (len(text.encode()), len(zlib.compress(text.encode(), 6)))
        for doc_id, text in rows
    }
    got = all_specs()["q_text_compress_ratio"].func(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        raw, comp = expected[r.doc_id]
        assert (r.raw_bytes, r.compressed_bytes) == (raw, comp)
        assert r.flag_repetitive == (comp / raw < 0.35)
