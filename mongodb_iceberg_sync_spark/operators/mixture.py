"""Data-mixture, sampling-estimator, and corpus-layout operators.

The steps between "cleaned corpus" and "training run": weighted sample
selection with unbiased estimators (priority sampling), per-domain
mixture weights under a token-budget cap, RAG-style overlapping
chunking, embedding quantization for ANN index shipping, and
curriculum ordering. Reference analog: none of these exist in
/root/reference (`src/main` is config+CLI only, docs/design.md:1);
they extend the north-star query surface the same way the dedup/
similarity families do.

Determinism: every "random" draw is an md5-derived uniform (the same
cross-engine trick as operators/corpus.py:md5_fraction), every float
comparison rides on bitwise-identical arithmetic (single divisions of
identical inputs), and every checksum is an integer sum — so each
operator here is exactly oracle-checkable, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t

_PRI_K = 100  # priority-sample size


@register(
    "q_sample_priority",
    family="sampling",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id,
             n_chars AS w,
             n_chars / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1)
                        / 16777216.0) AS priority
      FROM documents
    ),
    topk1 AS (
      SELECT * FROM pri ORDER BY priority DESC, doc_id LIMIT {_PRI_K + 1}
    ),
    tau AS (SELECT min(priority) AS tau FROM topk1),
    topk AS (
      SELECT * FROM topk1 ORDER BY priority DESC, doc_id LIMIT {_PRI_K}
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS w,
           round(priority, 6) + 0.0 AS priority,
           round(greatest(w * 1.0, tau), 6) + 0.0 AS est_weight
    FROM topk CROSS JOIN tau
    """,
    doc="Priority sampling (Duffield-Lund-Thorup, JACM'07): weighted "
    "sample of k docs without replacement with an UNBIASED subset-sum "
    "estimator — the principled way to downsample a weighted corpus "
    "and still estimate token totals. priority = w/u with u an "
    "md5-uniform in (0,1]; keep the top k, and each kept item "
    "estimates its weight as max(w, tau) where tau is the (k+1)-th "
    "priority. A single division of identical inputs is bitwise "
    "identical across engines, so ORDER and estimator both "
    "oracle-check exactly. Scale: top-(k+1) is TakeOrderedAndProject "
    "— per-partition partial top-k, O(k) rows to one final task, no "
    "corpus shuffle; tau broadcasts back. At 100 TB this is one scan.",
)
def q_sample_priority(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
            "double"
        )
        + 1.0
    ) / 16777216.0
    pri = d.select(
        "doc_id",
        F.col("n_chars").alias("w"),
        (F.col("n_chars") / u).alias("priority"),
    )
    topk1 = pri.orderBy(F.col("priority").desc(), "doc_id").limit(_PRI_K + 1)
    # tau = the (k+1)-th priority = min over the k+1 retained rows; one
    # scalar, broadcast back onto the k winners.
    tau = topk1.agg(F.min("priority").alias("tau"))
    topk = topk1.orderBy(F.col("priority").desc(), "doc_id").limit(_PRI_K)
    return topk.crossJoin(F.broadcast(tau)).select(
        "doc_id",
        F.col("w").cast("long").alias("w"),
        (F.round("priority", 6) + 0.0).alias("priority"),
        (F.round(F.greatest(F.col("w") * 1.0, F.col("tau")), 6) + 0.0).alias(
            "est_weight"
        ),
    )


@register(
    "q_mix_domains",
    family="sampling",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t FROM tok),
    cap AS (
      SELECT source, tokens, t,
             least(tokens, t // 20) AS capped
      FROM tok CROSS JOIN tot
    ),
    z AS (SELECT CAST(sum(capped) AS BIGINT) AS z FROM cap)
    SELECT source, tokens,
           round(tokens * 1.0 / t, 6) + 0.0 AS raw_share,
           round(capped * 1.0 / z, 6) + 0.0 AS mix_weight
    FROM cap CROSS JOIN z
    """,
    doc="Training-mixture weights under a domain cap — the 'no domain "
    "may exceed 5% of the token budget' rebalance every LLM data "
    "recipe applies (e.g. The Pile / Dolma mixture tables): per-source "
    "token counts, capped at total//20 tokens, renormalized into "
    "sampling weights. All shares are single divisions of exact "
    "integer sums (cap and renormalizer stay in BIGINT), so the "
    "result oracle-checks exactly. Scale: one map-side-combinable "
    "groupBy to O(#domains) rows, then two scalar broadcasts — the "
    "corpus is scanned once and never shuffled.",
)
def q_mix_domains(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    tot = tok.agg(F.sum("tokens").cast("long").alias("t"))
    cap = tok.crossJoin(F.broadcast(tot)).withColumn(
        "capped", F.least(F.col("tokens"), F.expr("t DIV 20"))
    )
    z = cap.agg(F.sum("capped").cast("long").alias("z"))
    return cap.crossJoin(F.broadcast(z)).select(
        "source",
        "tokens",
        (F.round(F.col("tokens") * 1.0 / F.col("t"), 6) + 0.0).alias("raw_share"),
        (F.round(F.col("capped") * 1.0 / F.col("z"), 6) + 0.0).alias("mix_weight"),
    )


_CHUNK_W = 32  # RAG window tokens
_CHUNK_S = 24  # stride (8-token overlap)


@register(
    "q_text_chunk_rag",
    family="text",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    win AS (
      SELECT doc_id, l, CAST(i AS BIGINT) AS start_token
      FROM toks, LATERAL unnest(range(1, len(l) + 1, {_CHUNK_S})) AS u(i)
    )
    SELECT doc_id,
           CAST((start_token - 1) // {_CHUNK_S} AS BIGINT) AS chunk_idx,
           start_token,
           CAST(len(l[start_token : start_token + {_CHUNK_W} - 1]) AS BIGINT)
             AS n_tokens,
           array_to_string(l[start_token : start_token + {_CHUNK_W} - 1], ' ')
             AS chunk
    FROM win
    WHERE start_token = 1
       OR len(l) - start_token + 1 >= 8
    """,
    doc="RAG chunking: split each document into overlapping "
    f"{_CHUNK_W}-token windows with stride {_CHUNK_S} (8-token "
    "overlap keeps sentences that straddle a boundary retrievable "
    "from both sides), dropping tail fragments under 8 tokens unless "
    "they are the only chunk. Pure codegen: split once, explode an "
    "INT start sequence, slice+join per window — no lambda "
    "allocating per-window string arrays. Map-only (zero exchanges), "
    "so at 100 TB chunking rides the ingest scan; output order is "
    "keyed by (doc_id, chunk_idx), no sort needed.",
)
def q_text_chunk_rag(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l"))
    win = toks.select(
        "doc_id",
        "l",
        F.explode(F.expr(f"sequence(1, size(l), {_CHUNK_S})")).alias("start_i"),
    ).select(
        "doc_id", "l", F.col("start_i").cast("long").alias("start_token")
    ).filter(
        (F.col("start_token") == 1)
        | (F.size("l") - F.col("start_token") + 1 >= 8)
    )
    sl = F.expr(f"slice(l, start_token, {_CHUNK_W})")
    return win.select(
        "doc_id",
        ((F.col("start_token") - 1) / _CHUNK_S).cast("long").alias("chunk_idx"),
        "start_token",
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk"),
    )


@register(
    "q_embed_quantize",
    family="similarity",
    oracle="""
    WITH amax AS (
      SELECT vec_id, embedding,
             CAST(len(embedding) AS BIGINT) AS n_dims,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
               / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id, n_dims,
           round(scale, 6) + 0.0 AS scale,
           CASE WHEN scale = 0 THEN 0 ELSE
             CAST(list_sum(list_transform(embedding,
                  x -> CAST(floor(x / scale + 0.5) AS BIGINT))) AS BIGINT)
           END AS q_sum,
           CASE WHEN scale = 0 THEN 0 ELSE
             CAST(list_sum(list_transform(embedding,
                  x -> abs(CAST(floor(x / scale + 0.5) AS BIGINT)))) AS BIGINT)
           END AS q_l1
    FROM amax
    """,
    doc="Symmetric int8 embedding quantization — the 4x shrink before "
    "shipping vectors into an ANN index (FAISS SQ8-style): per-vector "
    "scale = max|x|/127, q_i = floor(x/scale + 0.5). floor(+0.5) "
    "instead of round() because IEEE half-up is engine-pinned that "
    "way (Spark HALF_UP vs DuckDB half-even would diverge on exact "
    ".5 quotients); divisions of identical inputs are bitwise "
    "identical, and the checksums are INTEGER sums (order-free), so "
    "the whole op oracle-checks exactly. Map-only JVM-side HOFs over "
    "the vector column — no Python, no shuffle; at 100 TB this is "
    "scan-bound and pairs with q_sim_pq's codebook path.",
)
def q_embed_quantize(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    amax = e.select(
        "vec_id",
        "embedding",
        F.size("embedding").cast("long").alias("n_dims"),
        (
            F.array_max(F.expr("transform(embedding, x -> abs(x))")) / F.lit(127.0)
        ).alias("scale"),
    )
    qsum = F.expr(
        "aggregate(embedding, 0L, (acc, x) -> acc + CAST(floor(x / scale + 0.5d) AS BIGINT))"
    )
    ql1 = F.expr(
        "aggregate(embedding, 0L, (acc, x) -> acc + abs(CAST(floor(x / scale + 0.5d) AS BIGINT)))"
    )
    zero = F.col("scale") == 0
    return amax.select(
        "vec_id",
        "n_dims",
        (F.round("scale", 6) + 0.0).alias("scale"),
        F.when(zero, F.lit(0)).otherwise(qsum).cast("long").alias("q_sum"),
        F.when(zero, F.lit(0)).otherwise(ql1).cast("long").alias("q_l1"),
    )


@register(
    "q_curriculum_order",
    family="sampling",
    oracle="""
    WITH staged AS (
      SELECT doc_id, n_chars,
             CASE WHEN n_chars < 175 THEN 0
                  WHEN n_chars < 306 THEN 1
                  WHEN n_chars < 419 THEN 2
                  ELSE 3 END AS stage,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, CAST(stage AS BIGINT) AS stage,
           CAST(row_number() OVER (ORDER BY stage, h, doc_id) AS BIGINT)
             AS curriculum_pos
    FROM staged
    """,
    doc="Curriculum ordering: short/easy documents first, hard ones "
    "last, SHUFFLED within each difficulty stage (md5 order — "
    "reproducible across runs and engines), emitted as one global "
    "position sequence. The global row_number does NOT use a global "
    "window: range-repartition on (stage, h), count partitions (one "
    "long each to the driver), exclusive-prefix into offsets, "
    "partition-local row_number + broadcast offset — the same "
    "two-pass shape as q_sort_global_rank/q_pack_tokens, fully "
    "parallel at 100 TB where a bare OVER (ORDER BY ...) would move "
    "the corpus to one reducer.",
)
def q_curriculum_order(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    stage = (
        F.when(F.col("n_chars") < 175, 0)
        .when(F.col("n_chars") < 306, 1)
        .when(F.col("n_chars") < 419, 2)
        .otherwise(3)
    )
    staged = d.select(
        "doc_id",
        stage.cast("long").alias("stage"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    parted = (
        staged.repartitionByRange(n_parts, "stage", "h", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = {
        r["pid"]: r["n"]
        for r in parted.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = spark.createDataFrame(offsets, "pid int, offset long")
    w = Window.partitionBy("pid").orderBy("stage", "h", "doc_id")
    return (
        parted.join(F.broadcast(off), "pid")
        .select(
            "doc_id",
            "stage",
            (F.col("offset") + F.row_number().over(w)).cast("long").alias(
                "curriculum_pos"
            ),
        )
    )


@register(
    "q_mix_token_budget",
    family="sampling",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             sum(n_chars) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum_chars
      FROM documents
    )
    SELECT doc_id, lang, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
    FROM ranked WHERE cum_chars <= 200000
    """,
    doc="Token-budget corpus mixing: each lang contributes documents in "
    "deterministic md5 priority order until a per-domain budget "
    "(~200k chars here; tokens at scale) is filled — the 'fill the "
    "mixture recipe' step of training-data assembly, downstream of "
    "q_mix_domains' rate-based sampling when the recipe is an "
    "absolute budget per domain. One hash shuffle on the domain key; "
    "the running sum is partition-local after it. A mega-domain's "
    "window input is pre-capped by a hash-prefix filter sized from "
    "budget/avg_doc_len (same guard as q_sample_stratified) so the "
    "sort never sees the whole domain at 100 TB. Cut rule cum<=B "
    "keeps the first doc overshooting nothing: budgets bind exactly, "
    "reproducibly, engine-identically.",
)
def q_mix_token_budget(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("cum_chars", F.sum("n_chars").over(w).cast("long"))
        .filter(F.col("cum_chars") <= 200000)
    )


_EPOCH_CAP = 4  # never repeat a domain more than this many times


@register(
    "q_mix_epochs",
    family="sampling",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    mx AS (SELECT max(tokens) AS m FROM tok),
    ep AS (
      SELECT source, tokens,
             least({_EPOCH_CAP},
                   CAST(ceil(m * 1.0 / tokens) AS BIGINT)) AS epochs
      FROM tok CROSS JOIN mx
    )
    SELECT d.doc_id, d.source, e.epochs, CAST(u.epoch AS BIGINT) AS epoch
    FROM documents d
    JOIN ep e ON d.source = e.source,
    LATERAL unnest(range(1, e.epochs + 1)) AS u(epoch)
    """,
    doc="Epoch-based domain upsampling — the 'repeat small domains, cap "
    "the repeats' mixing rule (Llama/Chinchilla-style data recipes; "
    "Muennighoff et al. 2023 shows ~4 epochs is where repetition stops "
    "helping, hence the cap): each source is replicated "
    "ceil(max_domain_tokens / domain_tokens) times, capped at 4, so "
    "small domains approach the largest one's token share without "
    "unbounded repetition. Emits one row per (doc, epoch) — the "
    "materialized training list q_shuffle_train would then shard. "
    "Fully deterministic: no RNG, the epoch count is a pure function "
    "of the token histogram. Scale: the per-source token table is a "
    "handful of rows (broadcast), the replication is a map-side "
    "explode(sequence(1, epochs)) — output is at most EPOCH_CAP x "
    "input with zero shuffles after the tiny dim agg, and at 100 TB "
    "the explode emits (doc_id, epoch) pairs, never duplicated "
    "document bytes.",
)
def q_mix_epochs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("tokens")
    )
    mx = tok.agg(F.max("tokens").alias("m"))
    ep = (
        tok.crossJoin(F.broadcast(mx))
        .select(
            "source",
            F.least(
                F.lit(_EPOCH_CAP),
                F.ceil(F.col("m") * 1.0 / F.col("tokens")),
            ).alias("epochs"),
        )
    )
    return (
        docs.join(F.broadcast(ep), "source")
        .select(
            "doc_id",
            "source",
            "epochs",
            F.explode(F.sequence(F.lit(1).cast("long"), "epochs")).alias("epoch"),
        )
    )


_LR_ITERS = 10
_LR_RATE = 0.5
_LR_QUANT = 1_000_000_000  # gradient quantization: 1e-9 resolution


@register(
    "q_ml_logreg",
    family="sampling",
    oracle=None,  # iterative trainer: pinned vs a numpy reference
    doc="Distributed logistic regression by batch gradient descent — "
    "the supervised sibling of q_embed_pca's unsupervised one-pass: "
    "per-user features (log event count, view share, log avg value) "
    "predict 'user has purchased'. Ten GD iterations, each ONE "
    "codegen aggregation over the per-user FEATURE table (one row "
    "per user — corpus size only affects the initial rollup): the "
    "per-row gradient contribution (sigmoid(w.x) - y) * x_j is "
    "QUANTIZED to exact 1e-9 integers before summing, so the "
    "gradient sums are order-independent exact longs — the trained "
    "weights are bit-identical across runs, partitionings and "
    "engines (float partial-sum order never enters). Driver traffic "
    "is d+1 = 4 longs per iteration. Output: one row per "
    "coefficient plus training accuracy — deterministic, so the "
    "driver's rows-only determinism check holds; "
    "tests/test_ml_logreg.py pins weights AND accuracy against an "
    "independent numpy implementation of the same quantized "
    "algorithm. Scale: GD over N users is a map-side-combinable "
    "agg; at 100 TB the feature rollup is the only corpus-sized "
    "stage, exactly how production propensity models train on "
    "aggregated features.",
)
def q_ml_logreg(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    feats = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("n_views"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_buys"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.log(F.col("n_events").cast("double") + 1.0).alias("x1"),
            (F.col("n_views").cast("double") / F.col("n_events")).alias("x2"),
            F.log(
                F.col("value_cents").cast("double")
                / F.col("n_events")
                / 100.0
                + 1.0
            ).alias("x3"),
            (F.col("n_buys") > 0).cast("double").alias("y"),
        )
    ).localCheckpoint()
    n = feats.count()
    if n == 0:
        return spark.createDataFrame([], "term string, value double")
    w = [0.0, 0.0, 0.0, 0.0]  # bias, x1, x2, x3
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    for _ in range(_LR_ITERS):
        z = sum(
            (F.lit(wj) * xj for wj, xj in zip(w, xs)), F.lit(0.0)
        )
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        grads = feats.agg(
            *[
                F.sum(F.round(err * xj * _LR_QUANT).cast("long")).alias(
                    f"g{j}"
                )
                for j, xj in enumerate(xs)
            ]
        ).head()
        w = [
            wj - _LR_RATE * (grads[f"g{j}"] / _LR_QUANT) / n
            for j, wj in enumerate(w)
        ]
    z = sum((F.lit(wj) * xj for wj, xj in zip(w, xs)), F.lit(0.0))
    acc = feats.agg(
        F.sum(
            ((z > 0).cast("double") == F.col("y")).cast("long")
        ).alias("correct")
    ).head()["correct"]
    rows = [
        ("bias", round(w[0], 9)),
        ("w_log_events", round(w[1], 9)),
        ("w_view_share", round(w[2], 9)),
        ("w_log_avg_value", round(w[3], 9)),
        ("train_accuracy", round(acc / n, 6)),
    ]
    return spark.createDataFrame(rows, "term string, value double")


@register(
    "q_mix_dedup_priority",
    family="sampling",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, n_chars,
             substr(text, 1, 40) AS fingerprint,
             CAST(substr(source, 4) AS BIGINT) AS src_rank
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, fingerprint,
             count(*) OVER (PARTITION BY fingerprint) AS n_copies,
             row_number() OVER (
               PARTITION BY fingerprint ORDER BY src_rank, doc_id
             ) AS pick
      FROM fp
    )
    SELECT fingerprint, doc_id AS kept_doc_id, source AS kept_source,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked
    WHERE pick = 1 AND n_copies >= 2
    ORDER BY fingerprint
    """,
    doc="Cross-source duplicate resolution by source priority: when "
    "the same content (40-char prefix fingerprint — the cheap "
    "canonicalization key; swap in the minhash signature for fuzzy "
    "groups) appears in multiple sources, keep the copy from the "
    "most-trusted source (rank = the source's numeric tier, e.g. "
    "curated < crawl) — the license/provenance-aware dedup every "
    "multi-source training mix needs, as opposed to q_dedup_exact's "
    "arbitrary-winner semantics. One hash shuffle on the fingerprint; "
    "both windows share the same partitioning (one Exchange, Spark "
    "collapses identical window specs). Reports only contested groups "
    "(n_copies >= 2).",
)
def q_mix_dedup_priority(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.substring("text", 1, 40).alias("fingerprint"),
        F.substring("source", 4, 10).cast("long").alias("src_rank"),
    )
    w_cnt = Window.partitionBy("fingerprint")
    w_pick = Window.partitionBy("fingerprint").orderBy("src_rank", "doc_id")
    return (
        fp.select(
            "doc_id",
            "source",
            "fingerprint",
            F.count("*").over(w_cnt).alias("n_copies"),
            F.row_number().over(w_pick).alias("pick"),
        )
        .filter((F.col("pick") == 1) & (F.col("n_copies") >= 2))
        .select(
            "fingerprint",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("source").alias("kept_source"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
        .orderBy("fingerprint")
    )


# DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
# hashed-bigram importance weights ranking raw documents by how
# target-like they are. Target = the 'en' slice; buckets hash bigrams
# through md5 (identical text both engines, unlike engine-native hash()).
_DSIR_BUCKETS = 8192
_DSIR_TOPK = 20


@register(
    "q_mix_dsir",
    family="sampling",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(ws[i] || ' ' || ws[i + 1]), 1, 8))
                  AS BIGINT) % {_DSIR_BUCKETS} AS b
      FROM toks CROSS JOIN unnest(range(1, len(ws))) AS r(i)
    ),
    tstat AS (
      SELECT b, CAST(count(*) AS BIGINT) AS ct
      FROM bg WHERE lang = 'en' GROUP BY b
    ),
    rstat AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM bg GROUP BY b),
    tot AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM bg WHERE lang = 'en')
               AS nt,
             (SELECT CAST(count(*) AS BIGINT) FROM bg) AS nr
    ),
    lr AS (
      SELECT r.b,
             CAST(round(1e9 * ln(
               ((coalesce(t.ct, 0) + 1.0) / (tot.nt + {_DSIR_BUCKETS}))
               / ((r.cr + 1.0) / (tot.nr + {_DSIR_BUCKETS})))) AS BIGINT)
               AS lr9
      FROM rstat r LEFT JOIN tstat t ON t.b = r.b CROSS JOIN tot
    ),
    per AS (
      SELECT bg.doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(lr.lr9) AS BIGINT) AS s9
      FROM bg JOIN lr ON lr.b = bg.b
      GROUP BY bg.doc_id
    )
    SELECT doc_id, n_feats,
           round(CAST(s9 AS DOUBLE) / n_feats / 1e9, 6) + 0.0
             AS dsir_weight
    FROM per
    ORDER BY CAST(s9 AS DOUBLE) / n_feats DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
    doc="DSIR importance ranking (Xie et al. 2023, 'Data Selection for "
    "Language Models via Importance Resampling'): every raw document "
    "scored by the mean log-ratio of hashed-bigram bucket "
    f"probabilities (Laplace-smoothed, {_DSIR_BUCKETS} buckets) "
    "between the TARGET distribution (the 'en' slice) and the raw "
    "corpus — the most-target-like docs rank first, which is exactly "
    "how production pretraining mixes select domain-matched data at "
    "scale. Buckets hash through md5 text (identical both engines — "
    "engine-native hash() would diverge); per-bucket log-ratios are "
    "quantized to 1e-9 BIGINTs so each doc's sum is exact and "
    "feature order cannot perturb it; top-k rides a (score, doc_id) "
    "total order. Scale: one bound-ws bigram explode, two "
    "bucket-keyed combinable aggs (bucket domain fixed at "
    f"{_DSIR_BUCKETS}), one broadcast-able log-ratio table joined "
    "back co-keyed — nothing pairwise, the n-gram model IS a "
    f"{_DSIR_BUCKETS}-row table. Ref: no reference counterpart — "
    "LLM-pipeline tier.",
)
def q_mix_dsir(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    toks = toks.localCheckpoint(eager=False)  # bind ws (self_bleu lesson)
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, size(ws) - 1), "
                "slice(ws, 2, size(ws) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    bg = bg.localCheckpoint(eager=False)  # target/raw stats + join-back
    tstat = bg.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    rstat = bg.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tot = bg.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("nr"),
    )
    lr = (
        rstat.join(tstat, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                1e9
                * F.log(
                    (
                        (F.coalesce("ct", F.lit(0)) + 1.0)
                        / (F.col("nt") + _DSIR_BUCKETS)
                    )
                    / ((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_BUCKETS))
                )
            ).cast("long").alias("lr9"),
        )
    )
    per = (
        bg.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr9").cast("long").alias("s9"),
        )
    )
    score = F.col("s9").cast("double") / F.col("n_feats")
    return (
        per.orderBy(score.desc(), "doc_id")
        .limit(_DSIR_TOPK)
        .select(
            "doc_id",
            "n_feats",
            (F.round(score / 1e9, 6) + 0.0).alias("dsir_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Round-10 wave 17 (final window slots): the temperature mixture plan.
# ---------------------------------------------------------------------------

_TMP_TAU = 0.7          # mixing temperature (the q_sample_temperature value)
_TMP_BUDGET = 100_000   # token budget to allocate


@register(
    "q_mix_temperature_plan",
    family="sampling",
    oracle=f"""
    WITH st AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, tokens,
             power(CAST(tokens AS DOUBLE), {_TMP_TAU!r}) AS wt
      FROM st
    ),
    tt AS (SELECT sum(wt) AS wsum, CAST(sum(tokens) AS BIGINT) AS ttot FROM w)
    SELECT w.source, w.tokens,
           round(w.wt / tt.wsum, 6) + 0.0 AS mix_weight,
           CAST(floor({_TMP_BUDGET} * w.wt / tt.wsum) AS BIGINT)
             AS quota_tokens,
           round(least(1.0, {_TMP_BUDGET} * w.wt / tt.wsum / w.tokens), 6)
             + 0.0 AS fraction_kept,
           {_TMP_BUDGET} * w.wt / tt.wsum > w.tokens AS needs_upsampling
    FROM w CROSS JOIN tt
    ORDER BY w.source
    """,
    doc=f"Temperature-mixing allocation plan (tau = {_TMP_TAU}, budget "
    f"= {_TMP_BUDGET} tokens): per-source token counts -> weights "
    "tokens^tau (renormalized) -> token quotas, the fraction of each "
    "source kept, and an upsampling flag — the PLANNING step the "
    "sampling operators execute (q_sample_temperature draws the "
    "per-row sample; q_mix_token_budget enforces a cap; this says "
    "what the per-source quotas SHOULD be and which sources need "
    "repeating — the multilingual-LLM mixing recipe at corpus "
    "level). Exact integer token counts; power/renormalize/floor is "
    "one identical float expression chain; the renormalized weight "
    "sum over k sources is the only cross-row float (k tiny, same "
    "ascending order both engines via the ORDER-insensitive sum "
    "over identical addends — pinned by the driver hash across "
    "shuffles). Scale: one token-count rollup; k-row tail. Ref: no "
    "reference counterpart — LLM-pipeline tier.",
)
def q_mix_temperature_plan(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    w = st.select(
        "source",
        "tokens",
        F.pow(F.col("tokens").cast("double"), _TMP_TAU).alias("wt"),
    )
    w = w.localCheckpoint(eager=False)  # tt + output read it
    tt = w.agg(
        F.sum("wt").alias("wsum"), F.sum("tokens").cast("long").alias("ttot")
    )
    share = F.col("wt") / F.col("wsum")
    return (
        w.crossJoin(F.broadcast(tt))
        .select(
            "source",
            "tokens",
            (F.round(share, 6) + 0.0).alias("mix_weight"),
            F.floor(_TMP_BUDGET * share).cast("long").alias("quota_tokens"),
            (
                F.round(
                    F.least(F.lit(1.0), _TMP_BUDGET * share / F.col("tokens")), 6
                )
                + 0.0
            ).alias("fraction_kept"),
            (_TMP_BUDGET * share > F.col("tokens")).alias("needs_upsampling"),
        )
        .orderBy("source")
    )
