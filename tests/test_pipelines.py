"""Declarative pipeline runner (pipelines.py): strict parse, step
semantics vs hand-built equivalents, determinism, and the lazy
single-plan composition property."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.pipelines import (
    PipelineConfig,
    StepConfig,
    apply_steps,
    build_pipeline,
    parse_pipeline,
    run_pipeline,
)
from mongodb_iceberg_sync_spark.sync.config import ConfigError
from mongodb_iceberg_sync_spark.tables import load_table

FULL = {
    "input": {"table": "documents"},
    "steps": [
        {"op": "normalize"},
        {"op": "quality_filter", "min_tokens": 20, "min_ttr": 0.3},
        {"op": "pii_redact"},
        {"op": "exact_dedup"},
        {"op": "split_assign"},
    ],
    "output": {"partition_by": ["split"]},
}


# -------------------------------------------------------------- parse


def test_parse_full_config():
    cfg = parse_pipeline(FULL)
    assert cfg.input_table == "documents"
    assert [s.op for s in cfg.steps] == [
        "normalize", "quality_filter", "pii_redact", "exact_dedup", "split_assign",
    ]
    assert cfg.output_partition_by == ("split",)


def test_parse_rejects_unknown_op():
    with pytest.raises(ConfigError, match=r"steps\[0\].op: unknown op"):
        parse_pipeline({"steps": [{"op": "frobnicate"}]})


def test_parse_rejects_unknown_param():
    with pytest.raises(ConfigError, match=r"steps\[0\].*unknown keys.*typo"):
        parse_pipeline({"steps": [{"op": "exact_dedup", "typo": 1}]})


def test_parse_rejects_unknown_top_key():
    with pytest.raises(ConfigError, match="unknown keys"):
        parse_pipeline({"steps": [{"op": "normalize"}], "stpes": []})


def test_parse_requires_steps():
    with pytest.raises(ConfigError, match="non-empty list"):
        parse_pipeline({"steps": []})


def test_parse_env_substitution(monkeypatch):
    monkeypatch.setenv("PIPE_MIN_TOKENS", "25")
    cfg = parse_pipeline(
        {"steps": [{"op": "quality_filter", "min_tokens": "${PIPE_MIN_TOKENS}"}]}
    )
    assert cfg.steps[0].params["min_tokens"] == "25"


# ---------------------------------------------------------- semantics


def test_steps_match_hand_built(spark, sf_dir):
    cfg = parse_pipeline(
        {"steps": [{"op": "quality_filter"}, {"op": "exact_dedup"}]}
    )
    got = build_pipeline(spark, sf_dir, cfg)

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    clean = docs.filter((F.size(toks) >= 20) & (ttr > 0.3))
    kept = clean.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exp = clean.join(kept.select("doc_id"), "doc_id")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in exp.collect()
    )
    assert set(got.columns) == set(docs.columns)


def test_chunk_dedup_drops_high_ratio_docs(spark, sf_dir):
    from mongodb_iceberg_sync_spark.operators.corpus import chunk_dup_stats

    docs = load_table(spark, sf_dir, "documents")
    cfg = PipelineConfig(
        input_table="documents",
        steps=(StepConfig("chunk_dedup", {"max_dup_ratio": 0.4}),),
    )
    got = {r.doc_id for r in apply_steps(docs, cfg).collect()}
    bad = {
        r.doc_id
        for r in chunk_dup_stats(docs).filter(F.col("dup_ratio") > 0.4).collect()
    }
    everyone = {r.doc_id for r in docs.collect()}
    assert got == everyone - bad and bad  # threshold actually bites


def test_temperature_sample_keeps_rare_sources_whole(spark):
    # skewed synthetic corpus: 90 docs from 'big', 10 from 'small' →
    # rate(small)=1 (max-normalized), rate(big)=sqrt(10/90)≈0.333
    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    cfg = PipelineConfig(
        input_table="documents",
        steps=(StepConfig("temperature_sample", {"alpha": 0.5}),),
    )
    out = apply_steps(docs, cfg)
    after = {
        r.source: r.c
        for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert after["small"] == 10  # rarest source kept whole
    assert 10 < after["big"] < 60  # dominant source ~1/3 downsampled
    assert set(out.columns) == set(docs.columns)


def test_pack_step_bounds_shards(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cfg = PipelineConfig(
        input_table="documents", steps=(StepConfig("pack", {"budget": 500}),)
    )
    out = apply_steps(docs, cfg)
    shard_tokens = (
        out.select("doc_id", "shard_id", F.size(F.split("text", " ")).alias("n"))
        .groupBy("shard_id")
        .agg(F.sum("n").alias("tot"), F.max("n").alias("mx"))
        .collect()
    )
    # a shard exceeds the budget only by (at most) its last doc's tokens
    assert all(r.tot < 500 + r.mx for r in shard_tokens)
    assert len(shard_tokens) > 1


def test_pipeline_is_deterministic(spark, sf_dir):
    cfg = parse_pipeline(FULL)
    a = build_pipeline(spark, sf_dir, cfg).orderBy("doc_id").collect()
    b = build_pipeline(spark, sf_dir, cfg).orderBy("doc_id").collect()
    assert a == b


def test_pipeline_is_one_lazy_plan(spark, sf_dir):
    """Steps compose into a single Catalyst plan: the documents scan
    appears once (no per-step materialization barriers) for a chain of
    map-side steps."""
    cfg = parse_pipeline(
        {"steps": [{"op": "normalize"}, {"op": "quality_filter"},
                   {"op": "pii_redact"}, {"op": "split_assign"},
                   {"op": "sample_hash", "hex_lt": "80"}]}
    )
    plan = build_pipeline(spark, sf_dir, cfg)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan  # pure map-side chain: zero shuffles


def test_run_pipeline_writes_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_out")
    cfg = parse_pipeline(FULL)
    df = run_pipeline(spark, sf_dir, cfg, out)
    assert df.count() > 0
    subdirs = {d.split("=")[0] for d in os.listdir(out) if "=" in d}
    assert subdirs == {"split"}


def test_compress_filter_step_matches_operator(spark, sf_dir):
    """The pipeline step must keep exactly the docs the operator does
    NOT flag as repetitive (same kernel, same threshold)."""
    import pyspark.sql.functions as F

    from mongodb_iceberg_sync_spark.pipelines import STEPS
    from mongodb_iceberg_sync_spark.registry import all_specs
    from mongodb_iceberg_sync_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = STEPS["compress_filter"][0](docs, {"min_ratio": 0.35})
    flagged = (
        all_specs()["q_text_compress_ratio"]
        .func(spark, sf_dir)
        .filter(F.col("flag_repetitive"))
        .select("doc_id")
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    flagged_ids = {r.doc_id for r in flagged.collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - flagged_ids
    assert kept.columns == docs.columns  # original columns survive
