"""End-to-end training-data cleaning pipeline — operators composed.

Every operator in this engine is a pure `DataFrame → DataFrame`
function, so a production cleaning pipeline is literally function
composition; this module registers one such composition as a single
query so the WHOLE chain is exact-hash-checked against DuckDB, not
just its stages: deterministic content-hash sampling → C4-style
quality thresholds → exact dedup (keep smallest doc_id). The chain is
one scan, one shuffle (the dedup groupBy) — sampling and quality are
map-side predicates that Catalyst fuses into the scan filter.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_pipeline_clean",
    family="pipeline",
    oracle="""
    WITH sampled AS (
      SELECT doc_id, lang, source, text, n_chars
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
    ),
    scored AS (
      SELECT doc_id, lang, source, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             CAST(n_chars AS DOUBLE) AS chars
      FROM sampled
    ),
    filtered AS (
      SELECT doc_id, lang, source, text, n_tokens,
             round(0.5 * (n_distinct / n_tokens)
                   + 0.5 * least(chars / n_tokens / 8.0, 1.0), 6) AS quality_score
      FROM scored
      WHERE n_tokens >= 20 AND n_distinct / n_tokens > 0.3
    ),
    deduped AS (
      SELECT *, row_number() OVER (
               PARTITION BY sha256(text) ORDER BY doc_id
             ) AS rn
      FROM filtered
    )
    SELECT doc_id, lang, source, n_tokens, quality_score
    FROM deduped WHERE rn = 1
    """,
    doc="Composed cleaning pipeline over documents: ~25% deterministic "
    "md5-hash sample → quality thresholds (length + type-token ratio) "
    "→ exact dedup keeping the smallest doc_id per content hash. "
    "Hash-checked END TO END. Physical shape: sample + quality fuse "
    "into the scan as one conjunctive map-side predicate; the only "
    "shuffle is the dedup window on sha256(text) — at 100 TB the "
    "pipeline is one pass + one 64-byte-key shuffle over the ~25% "
    "survivors.",
)
def q_pipeline_clean(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # stage 1: deterministic content-hash sample (~25%) — see
    # operators.sampling for the reproducibility rationale
    sampled = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40"
    )
    # stage 2: C4-style quality thresholds (operators.text formulas)
    toks = F.split("text", " ")
    scored = sampled.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.col("n_chars").cast("double").alias("chars"),
    )
    ttr = F.col("n_distinct") / F.col("n_tokens")
    score = 0.5 * ttr + 0.5 * F.least(
        F.col("chars") / F.col("n_tokens") / 8.0, F.lit(1.0)
    )
    filtered = scored.filter((F.col("n_tokens") >= 20) & (ttr > 0.3)).select(
        "doc_id",
        "lang",
        "source",
        "text",
        "n_tokens",
        F.round(score, 6).alias("quality_score"),
    )
    # stage 3: exact dedup, keep smallest doc_id per content hash
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )
