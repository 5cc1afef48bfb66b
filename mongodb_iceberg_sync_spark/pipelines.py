"""Declarative training-data pipeline runner.

The reference's public surface is declarative YAML config → running
sync (`SyncConfig`, reference AppConfig.java:14-31, docs/design.md:
430-470); this module extends the same config-first contract to the
corpus-preparation surface: a JSON/dict pipeline spec → a composed
DataFrame plan. Example:

    {
      "input": {"table": "documents"},
      "steps": [
        {"op": "normalize"},
        {"op": "quality_filter", "min_tokens": 20, "min_ttr": 0.3},
        {"op": "pii_redact"},
        {"op": "exact_dedup"},
        {"op": "chunk_dedup", "max_dup_ratio": 0.5},
        {"op": "temperature_sample", "alpha": 0.5, "group_col": "source"},
        {"op": "sample_hash", "hex_lt": "80"},
        {"op": "split_assign"},
        {"op": "pack", "budget": 2048}
      ],
      "output": {"partition_by": ["shard_id"]}
    }

Design rules:
  * every step is a pure ``DataFrame → DataFrame`` transform built
    from the registered operator library — the SAME plan runs in batch
    and inside ``foreachBatch`` on a stream;
  * config validation is strict exactly like ``sync/config.py``
    (unknown ops and unknown params raise ``ConfigError`` with a
    path), and ``${ENV}`` substitution uses the same rules;
  * steps are lazily composed — the whole pipeline is ONE Catalyst
    plan, so filters from late steps can still push down through
    early projections, and nothing materializes between steps;
  * determinism: every sampling/split step keys off md5 content
    hashes (no RNG), so a pipeline re-run — or a task retry inside
    one — yields byte-identical output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sync.config import ConfigError, _reject_unknown, _substitute_env
from .tables import load_table

# ------------------------------------------------------------- steps


def _step_normalize(df: DataFrame, p: dict) -> DataFrame:
    col = p.get("col", "text")
    out = F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")
    return df.withColumn(col, out)


def _step_quality_filter(df: DataFrame, p: dict) -> DataFrame:
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    return df.filter(
        (F.size(toks) >= int(p.get("min_tokens", 20)))
        & (ttr > float(p.get("min_ttr", 0.3)))
    )


def _step_lang_filter(df: DataFrame, p: dict) -> DataFrame:
    langs = p.get("langs", ["en"])
    if not isinstance(langs, list) or not langs:
        raise ConfigError("steps.lang_filter.langs: non-empty list required")
    return df.filter(F.col("lang").isin(langs))


def _step_pii_redact(df: DataFrame, p: dict) -> DataFrame:
    from .operators.text import _PII_EMAIL, _PII_IP, _PII_PHONE

    col = p.get("col", "text")
    out = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(col), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return df.withColumn(col, out)


def _step_exact_dedup(df: DataFrame, p: dict) -> DataFrame:
    # keep the smallest doc_id per content hash: max_by(-doc_id) is a
    # hash aggregation (map-side partials), not a window
    cols = [c for c in df.columns]
    row = F.struct(*[F.col(c) for c in cols])
    return (
        df.groupBy(F.sha2(F.col(p.get("col", "text")), 256).alias("_h"))
        .agg(F.min_by(row, F.col("doc_id")).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def _step_chunk_dedup(df: DataFrame, p: dict) -> DataFrame:
    """Drop docs whose duplicated-chunk ratio exceeds the threshold
    (C4-style line dedup at document granularity)."""
    from .operators.corpus import chunk_dup_stats

    max_ratio = float(p.get("max_dup_ratio", 0.5))
    bad = chunk_dup_stats(df).filter(F.col("dup_ratio") > max_ratio).select("doc_id")
    return df.join(bad, "doc_id", "left_anti")


def _step_temperature_sample(df: DataFrame, p: dict) -> DataFrame:
    from .operators.corpus import md5_fraction, temperature_rates

    group_col = p.get("group_col", "source")
    rates = temperature_rates(df, group_col, alpha=float(p.get("alpha", 0.5)))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(md5_fraction(F.col("doc_id")) < F.col("rate"))
        .drop("rate")
    )


def _step_sample_hash(df: DataFrame, p: dict) -> DataFrame:
    hex_lt = str(p.get("hex_lt", "0d"))
    return df.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, len(hex_lt)) < hex_lt
    )


def _step_split_assign(df: DataFrame, p: dict) -> DataFrame:
    train = int(p.get("train_pct", 80))
    val = int(p.get("val_pct", 10))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100
    return df.withColumn(
        "split",
        F.when(h < train, "train").when(h < train + val, "val").otherwise("test"),
    )


def _step_compress_filter(df: DataFrame, p: dict) -> DataFrame:
    """Drop documents whose zlib compression ratio marks them as
    repetitive/templated (Gopher/Dolma rule; q_text_compress_ratio's
    kernel). Join back on doc_id so ONLY the ratio verdict crosses
    Python — the surviving rows keep their original columns."""
    from .operators.text import compress_ratio_batches

    min_ratio = float(p.get("min_ratio", 0.35))
    stats = df.select("doc_id", "text").mapInPandas(
        compress_ratio_batches(),
        "doc_id long, raw_bytes long, compressed_bytes long",
    )
    keep = stats.filter(
        F.col("compressed_bytes") / F.col("raw_bytes") >= min_ratio
    ).select("doc_id")
    return df.join(keep, "doc_id", "left_semi")


def _step_pack(df: DataFrame, p: dict) -> DataFrame:
    from .operators.pipeline import pack_shards

    shards = pack_shards(df, budget=int(p.get("budget", 2048)))
    return df.join(shards.select("doc_id", "shard_id"), "doc_id")


#: op name → (transform, allowed params). The param allowlist is the
#: strict-validation contract: a typo'd knob fails at parse time, not
#: silently at runtime (same philosophy as sync config's unknown-key
#: rejection, reference AppConfig strictness).
STEPS = {
    "normalize": (_step_normalize, {"col"}),
    "quality_filter": (_step_quality_filter, {"min_tokens", "min_ttr"}),
    "lang_filter": (_step_lang_filter, {"langs"}),
    "pii_redact": (_step_pii_redact, {"col"}),
    "exact_dedup": (_step_exact_dedup, {"col"}),
    "chunk_dedup": (_step_chunk_dedup, {"max_dup_ratio"}),
    "temperature_sample": (_step_temperature_sample, {"alpha", "group_col"}),
    "compress_filter": (_step_compress_filter, {"min_ratio"}),
    "sample_hash": (_step_sample_hash, {"hex_lt"}),
    "split_assign": (_step_split_assign, {"train_pct", "val_pct"}),
    "pack": (_step_pack, {"budget"}),
}

# ------------------------------------------------------------- config


@dataclass(frozen=True)
class StepConfig:
    op: str
    params: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineConfig:
    input_table: str
    steps: tuple[StepConfig, ...]
    output_partition_by: tuple[str, ...] = ()


def parse_pipeline(raw: dict) -> PipelineConfig:
    """Strictly validate a pipeline dict (with ``${ENV}`` substitution)."""
    raw = _substitute_env(raw, "pipeline")
    if not isinstance(raw, dict):
        raise ConfigError("pipeline: mapping required")
    _reject_unknown(raw, {"input", "steps", "output"}, "pipeline")
    inp = raw.get("input") or {}
    _reject_unknown(inp, {"table"}, "pipeline.input")
    table = inp.get("table", "documents")
    steps_raw = raw.get("steps")
    if not isinstance(steps_raw, list) or not steps_raw:
        raise ConfigError("pipeline.steps: non-empty list required")
    steps = []
    for i, s in enumerate(steps_raw):
        path = f"pipeline.steps[{i}]"
        if not isinstance(s, dict) or "op" not in s:
            raise ConfigError(f"{path}: mapping with 'op' required")
        op = s["op"]
        if op not in STEPS:
            raise ConfigError(
                f"{path}.op: unknown op {op!r} (known: {sorted(STEPS)})"
            )
        params = {k: v for k, v in s.items() if k != "op"}
        allowed = STEPS[op][1]
        _reject_unknown(params, allowed, path)
        steps.append(StepConfig(op=op, params=params))
    out = raw.get("output") or {}
    _reject_unknown(out, {"partition_by", "path"}, "pipeline.output")
    part = tuple(out.get("partition_by", ()))
    return PipelineConfig(
        input_table=table, steps=tuple(steps), output_partition_by=part
    )


# ------------------------------------------------------------- runner


def build_pipeline(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig
) -> DataFrame:
    """Compose the steps into one lazy DataFrame plan."""
    df = load_table(spark, sf_dir, cfg.input_table)
    return apply_steps(df, cfg)


def apply_steps(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Apply a parsed pipeline to an arbitrary DataFrame — this is the
    form a ``foreachBatch`` streaming corpus build calls per batch."""
    for step in cfg.steps:
        fn = STEPS[step.op][0]
        df = fn(df, step.params)
    return df


def run_pipeline(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig, out_path: str
) -> DataFrame:
    """Build and write the pipeline output; returns the read-back frame."""
    df = build_pipeline(spark, sf_dir, cfg)
    w = df.write.mode("overwrite")
    if cfg.output_partition_by:
        w = w.partitionBy(*cfg.output_partition_by)
    w.parquet(out_path)
    return spark.read.parquet(out_path)
