"""Corpus-preparation operators for LLM training-data pipelines.

Four operations every web-scale corpus build runs between raw ingest and
tokenization, each expressed as a deterministic, oracle-checkable
DataFrame plan (no RNG, no engine-specific hash in any result column):

  * chunk-level exact dedup (the C4/RefinedWeb "line dedup" step),
  * temperature-based source-mixture resampling,
  * heavy-hitter detection (boilerplate mining),
  * deterministic train-order sharding ("corpus shuffle").

No reference analog — the reference (luketn/mongodb-iceberg-sync) is a
sync pipeline (docs/design.md describes ingest only); these belong to
the training-data surface this engine adds per the build brief.

Scale notes per-operator in the docstrings; none uses a global window,
a Python UDF, or a driver-side collect of per-row data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t

_CHUNK = 10  # tokens per "line" for chunk-level dedup


def chunk_dup_stats(docs, chunk: int = _CHUNK):
    """Per-doc duplicated-chunk stats (df-level core of q_dedup_chunks;
    also a pipeline step). Returns doc_id, n_chunks, n_dup_chunks,
    dup_ratio for docs with at least one duplicated chunk."""
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    n_chunks = F.ceil(F.size("l") / F.lit(float(chunk))).cast("int")
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(
                    " ", F.slice("l", (i - F.lit(1)) * chunk + 1, chunk)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    occ = F.row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    )
    dup = F.when(F.col("occ") > 1, 1).otherwise(0)
    return (
        chunks.withColumn("occ", occ)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup).alias("n_dup_chunks"),
            F.round(F.sum(dup) / F.count("*"), 6).alias("dup_ratio"),
        )
        .filter(F.col("n_dup_chunks") > 0)
    )


def temperature_rates(docs, group_col: str = "source", alpha: float = 0.5):
    """Per-group keep rates ∝ n^(alpha-1), max-normalized (df-level
    core of q_sample_temperature; also a pipeline step). Returns a
    tiny (group, rate) dim meant for broadcast."""
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n"))
    # scalars ride as 1-row broadcasts, not a global window (which
    # would funnel the dim through one partition and warn at scale)
    total = counts.agg(F.sum("n").alias("total"))
    raw = counts.crossJoin(F.broadcast(total)).withColumn(
        "raw", F.pow(F.col("n") / F.col("total"), alpha - 1.0)
    )
    max_raw = raw.agg(F.max("raw").alias("max_raw"))
    return (
        raw.crossJoin(F.broadcast(max_raw))
        .withColumn("rate", F.col("raw") / F.col("max_raw"))
        .select(group_col, "rate")
    )


def md5_fraction(col):
    """Deterministic uniform [0,1) value from md5 — the engine's
    cross-engine-reproducible stand-in for rand()."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("double")
        / 16777216.0
    )


@register(
    "q_dedup_chunks",
    family="dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             i - 1 AS chunk_idx,
             array_to_string(l[(i-1)*{_CHUNK}+1 : i*{_CHUNK}], ' ') AS chunk
      FROM toks,
           LATERAL unnest(range(1, CAST(ceil(len(l) / {_CHUNK}.0) AS BIGINT) + 1))
             AS u(i)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (
               PARTITION BY chunk ORDER BY doc_id, chunk_idx
             ) AS occ
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)               AS n_chunks,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                  AS n_dup_chunks,
           round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                                                  AS dup_ratio
    FROM ranked
    GROUP BY doc_id
    HAVING sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) > 0
    """,
    doc="Chunk-level exact dedup — the C4/RefinedWeb 'line dedup' pass: "
    "split every document into consecutive 10-token chunks, mark each "
    "chunk occurrence that is not the corpus-first (first = smallest "
    "(doc_id, chunk_idx)), and report per-doc duplicated-chunk ratios "
    "for docs with any duplicated chunk. Canonical corpus order makes "
    "the result deterministic and engine-independent. Scale: the "
    "per-chunk window partitions by chunk TEXT, so the shuffle key "
    "cardinality is the distinct-chunk count and each partition is the "
    "(tiny) occurrence list of one chunk — no global window, no skew "
    "beyond boilerplate chunks, which is exactly the data this pass "
    "exists to find. At 100 TB, shuffle a 16-byte chunk hash + 12-byte "
    "position instead of the chunk text (same plan shape).",
)
def q_dedup_chunks(spark, sf_dir):
    return chunk_dup_stats(t(spark, sf_dir, "documents"))


@register(
    "q_sample_temperature",
    family="sampling",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n) AS total FROM counts),
    rates AS (
      -- temperature alpha=0.5: weight per source ~ n^alpha, so the
      -- per-doc KEEP rate ~ n^(alpha-1), scaled so max rate = 1
      SELECT source,
             (n * 1.0 / (SELECT total FROM tot)) ^ (-0.5)
             / max((n * 1.0 / (SELECT total FROM tot)) ^ (-0.5)) OVER ()
             AS rate
      FROM counts
    )
    SELECT d.doc_id, d.source,
           round(r.rate, 6) AS keep_rate
    FROM documents d JOIN rates r USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
               AS DOUBLE) / 16777216.0 < r.rate
    """,
    doc="Temperature-based source-mixture resampling (alpha=0.5, the "
    "multilingual-LM rebalancing trick): a doc from source s is kept "
    "with rate ∝ count(s)^(alpha-1), normalized so the rarest source "
    "keeps everything — downweights dominant sources without dropping "
    "rare ones. Selection is by md5(doc_id) fraction, so the sample is "
    "deterministic across engines/retries and nests as rates move. "
    "Scale: per-source counts are a k-row aggregate broadcast back "
    "onto the fact scan — map-side join + map-side predicate; the only "
    "shuffle is the tiny source-count groupBy. At 100 TB this composes "
    "with partition pruning and never materializes the dropped rows.",
)
def q_sample_temperature(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    rates = temperature_rates(d, "source", alpha=0.5)
    return (
        d.join(F.broadcast(rates), "source")
        .filter(md5_fraction(F.col("doc_id")) < F.col("rate"))
        .select("doc_id", "source", F.round("rate", 6).alias("keep_rate"))
    )


@register(
    "q_agg_heavy_hitters",
    family="aggregates",
    oracle="""
    WITH grams AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS total FROM grams)
    SELECT token,
           CAST(count(*) AS BIGINT) AS freq,
           round(count(*) * 1.0 / (SELECT total FROM tot), 6) AS share
    FROM grams
    GROUP BY token
    HAVING count(*) > (SELECT total FROM tot) / 50
    """,
    doc="Heavy hitters: tokens with frequency > 1/50 of the corpus "
    "token stream — the exact-answer form of the Misra-Gries / "
    "count-min heavy-hitter query, used to mine boilerplate and "
    "stop-tokens before filtering. Scale: partial aggregation folds "
    "each token to one (token, count) per map task before the shuffle, "
    "so the exchange carries O(vocab) rows per task regardless of "
    "corpus size; the total-count scalar is a broadcast O(1) "
    "cross-join, not a driver collect. With a truly unbounded vocab "
    "(URLs, hashes) the Misra-Gries sketch variant drops in as an "
    "applyInPandas partial + merge — same output contract.",
)
def q_agg_heavy_hitters(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    grams = d.select(F.explode(F.split("text", " ")).alias("token"))
    counts = grams.groupBy("token").agg(F.count("*").alias("freq"))
    tot = counts.agg(F.sum("freq").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") > F.col("total") / 50)
        .select(
            "token",
            "freq",
            F.round(F.col("freq") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "q_shuffle_train",
    family="sampling",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 8
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM documents
    """,
    doc="Deterministic training-order shuffle: every doc gets a shard "
    "(md5 mod 8) and a position within its shard (md5 order) — the "
    "'global shuffle' step before sequence packing, reproducible "
    "across engines, runs, and task retries (df.orderBy(rand()) is "
    "none of those). Scale: one hash shuffle on the shard key, then a "
    "partition-LOCAL sort+row_number per shard — no global window, no "
    "single reducer; shard count scales with the cluster. The "
    "sibling two-pass global rank (q_sort_global_rank) turns "
    "(shard, pos_in_shard) into a single global sequence when a total "
    "order is required.",
)
def q_shuffle_train(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 8
    win = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("pos_in_shard", F.row_number().over(win).cast("long"))
        .drop("h")
    )


_MG_K = 256  # sketch width; error <= N/(K+1) per partition-merge keeps
#              every token with freq > N/50 alive in the summary


@register(
    "q_agg_heavy_hitters_sketch",
    family="aggregates",
    oracle="""
    WITH grams AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS total FROM grams)
    SELECT token,
           CAST(count(*) AS BIGINT) AS freq,
           round(count(*) * 1.0 / (SELECT total FROM tot), 6) AS share
    FROM grams
    GROUP BY token
    HAVING count(*) > (SELECT total FROM tot) / 50
    """,
    doc="Heavy hitters via a Misra-Gries SKETCH — the unbounded-vocab "
    "scale path the exact q_agg_heavy_hitters docstring promises: "
    "pass 1 builds a K=256-counter Misra-Gries summary PER PARTITION "
    "with mapInPandas (per Arrow batch: vectorized value_counts "
    "merged into the summary, then the (K+1)-th largest count "
    "subtracted from all — the standard mergeable-summary step, error "
    "<= N_p/(K+1)), so each task emits <= 256 candidate tokens no "
    "matter how large its vocabulary; pass 2 exactly counts ONLY the "
    "broadcast candidate set. Misra-Gries guarantees the union of "
    "partition summaries is a SUPERSET of every token with global "
    "freq > N/(K+1) ⊇ freq > N/50, and the exact second pass removes "
    "false candidates — so the result is IDENTICAL to the exact "
    "operator (same oracle), deterministic regardless of "
    "partitioning. At 100 TB: shuffle volume is O(#tasks × K), "
    "vs O(vocab) per task for the exact partial aggregation.",
)
def q_agg_heavy_hitters_sketch(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents")
    grams = d.select(F.explode(F.split("text", " ")).alias("token"))

    def mg_summary(batches):
        s = pd.Series(dtype="int64")
        for pdf in batches:
            s = s.add(pdf["token"].value_counts(), fill_value=0)
            if len(s) > _MG_K:
                # subtract the (K+1)-th largest count, keep positives:
                # the Misra-Gries merge (Agarwal et al., mergeable
                # summaries) — at most K counters survive
                thresh = s.nlargest(_MG_K + 1).iloc[_MG_K]
                s = s[s > thresh] - thresh
        yield pd.DataFrame({"token": s.index.astype(str)})

    cands = grams.mapInPandas(mg_summary, "token string").distinct()
    counts = (
        grams.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    tot = grams.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") > F.col("total") / 50)
        .select(
            "token",
            "freq",
            F.round(F.col("freq") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "q_text_scrub_chunks",
    family="text",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             i - 1 AS chunk_idx,
             array_to_string(l[(i-1)*{_CHUNK}+1 : i*{_CHUNK}], ' ') AS chunk
      FROM toks,
           LATERAL unnest(range(1, CAST(ceil(len(l) / {_CHUNK}.0) AS BIGINT) + 1))
             AS u(i)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk,
             row_number() OVER (
               PARTITION BY chunk ORDER BY doc_id, chunk_idx
             ) AS occ
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) FILTER (WHERE occ = 1) AS BIGINT)  AS n_kept,
           CAST(count(*) FILTER (WHERE occ > 1) AS BIGINT)  AS n_removed,
           nullif(string_agg(chunk, ' ' ORDER BY chunk_idx)
                    FILTER (WHERE occ = 1), '')             AS clean_text
    FROM ranked
    GROUP BY doc_id
    HAVING count(*) FILTER (WHERE occ > 1) > 0
    """,
    doc="Duplicated-chunk SCRUB — the transform twin of q_dedup_chunks' "
    "report: every consecutive 10-token chunk that is not the corpus-"
    "first occurrence (first = smallest (doc_id, chunk_idx)) is REMOVED "
    "and the surviving chunks are reassembled in original order into a "
    "cleaned document (C4/RefinedWeb line-dedup actually rewrites the "
    "corpus this way; the report alone can't feed a tokenizer). "
    "Reassembly is array_sort(collect_list(struct(chunk_idx, chunk))) "
    "-> transform -> array_join: the sort happens inside each doc's "
    "aggregation buffer (docs are small), never a global order-by. "
    "Only changed docs are emitted; a doc whose every chunk was "
    "boilerplate yields clean_text NULL, the drop signal. Scale: "
    "identical shuffle shape to q_dedup_chunks (partition by chunk "
    "text, then by doc_id) — both keys are data-sized, no skew beyond "
    "the boilerplate chunks this pass removes; at 100 TB shuffle a "
    "16-byte chunk hash + position and join the kept positions back "
    "to the chunk text.",
)
def q_text_scrub_chunks(spark, sf_dir):
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    n_chunks = F.ceil(F.size("l") / F.lit(float(_CHUNK))).cast("int")
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(
                    " ", F.slice("l", (i - F.lit(1)) * _CHUNK + 1, _CHUNK)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    occ = F.row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    )
    marked = chunks.withColumn("occ", occ)
    kept = F.when(F.col("occ") == 1, F.struct("chunk_idx", "chunk"))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_removed"),
            F.nullif(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept)), lambda s: s.chunk
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
        .filter(F.col("n_removed") > 0)
    )


@register(
    "q_corpus_datacard",
    family="text",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT)                   AS n_docs,
             CAST(sum(n_chars) AS BIGINT)               AS total_chars,
             CAST(count(DISTINCT md5(text)) AS BIGINT)  AS n_distinct_texts,
             CAST(sum(length(regexp_extract_all(text, '\\S+')) ) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source
    ),
    lang_n AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    top_lang AS (
      SELECT source, lang, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rk
      FROM lang_n
    )
    SELECT p.source, p.n_docs, p.total_chars, p.n_distinct_texts,
           round(CAST(p.n_docs - p.n_distinct_texts AS DOUBLE)
                 / p.n_docs, 6) AS dup_rate,
           t.lang AS top_lang,
           round(CAST(t.n AS DOUBLE) / p.n_docs, 6) AS top_lang_share,
           p.total_tokens
    FROM per_source p JOIN top_lang t
      ON p.source = t.source AND t.rk = 1
    ORDER BY p.source
    """,
    doc="Dataset card per corpus source — the one-page governance "
    "readout (HuggingFace dataset-card / Datasheets-for-Datasets "
    "numbers) every training-data release ships: document and "
    "character volume, exact-duplicate rate (distinct md5(text) vs "
    "rows), dominant language with its share, and whitespace token "
    "volume. Two aggregation passes over documents: the per-source "
    "rollup (count/sum/one DISTINCT on the text hash — 32-byte "
    "hashes shuffle, text never does) and the (source, lang) "
    "rollup whose top-1 is a row_number over the tiny "
    "sources x langs grid with a total order (count desc, lang) so "
    "ties cut deterministically. Ratios are single float divisions "
    "of exact integers. Scale: both shuffles are keyed on source "
    "(or source x lang) — bounded cardinality; the distinct-hash "
    "partial aggregation is the same shape as q_dedup_exact.",
)
def q_corpus_datacard(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct(F.md5(F.col("text"))).cast("long").alias(
            "n_distinct_texts"
        ),
        F.sum(F.regexp_count(F.col("text"), F.lit(r"\S+")))
        .cast("long")
        .alias("total_tokens"),
    )
    lang_n = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n"), "lang")
    )
    top_lang = (
        lang_n.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"), "n")
    )
    return (
        per_source.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "n_distinct_texts",
            F.round(
                (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
            "top_lang",
            F.round(F.col("n").cast("double") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            "total_tokens",
        )
        .orderBy("source")
    )
