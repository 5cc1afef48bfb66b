"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is almost never consumed whole: dataset ablations,
eval-holdout carving, and per-source mixture weighting all start with a
sample. `df.sample()` is seed-dependent across retries/partitions, so
pipelines that must be reproducible (and auditable) sample by CONTENT
HASH instead: a row is in the sample iff a cryptographic hash of its
key falls under a threshold. That makes the sample (a) deterministic
across runs, engines, and partitionings, (b) consistent under
re-execution of failed tasks, and (c) sliceable — the same hash
prefix-ordering yields nested samples (1% ⊂ 5% ⊂ 20%).

Both queries are exact-hash-checked against DuckDB (md5 hex is
identical in both engines), unlike RNG-based sampling which could only
ever be rows-only.

No reference analog (the reference is a sync pipeline; sampling is part
of the training-data surface this engine adds, per the build brief).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_sample_hash",
    family="sampling",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
    """,
    doc="Uniform deterministic ~5% sample: keep rows whose md5(doc_id) "
    "hex prefix is < '0d' (13/256 ≈ 5.1%). Pure map-side predicate — "
    "no shuffle, no RNG, no seed plumbing; the sample is stable across "
    "runs, engines, task retries, and repartitioning, and thresholds "
    "nest (a '03' sample is a subset of this one). At 100 TB this is "
    "embarrassingly parallel and composes with partition pruning.",
)
def q_sample_hash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "0d"
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "q_sample_stratified",
    family="sampling",
    oracle="""
    SELECT doc_id, source, lang, n_chars, sample_rank
    FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 20
    """,
    doc="Stratified fixed-size sample: exactly min(20, |stratum|) docs "
    "per source, chosen by md5(doc_id) order — a deterministic stand-in "
    "for 'random k per stratum' that is reproducible and hash-checked. "
    "One hash shuffle on the stratum key. At 100 TB a mega-stratum "
    "would make the full partition sort the bottleneck; the fix is a "
    "pre-filter on the hash prefix (as in q_sample_hash) to cap each "
    "stratum's candidate set before the window — same result as long "
    "as the prefix keeps ≥ k rows per stratum.",
)
def q_sample_stratified(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        d.select("doc_id", "source", "lang", "n_chars")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 20)
    )


@register(
    "q_sample_split",
    family="sampling",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN h < 80 THEN 'train'
             WHEN h < 90 THEN 'val'
             ELSE 'test'
           END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  % 100 AS BIGINT) AS h
      FROM documents
    )
    """,
    doc="Deterministic train/val/test split (80/10/10): bucket = "
    "md5(doc_id) mod 100 — reproducible across engines, retries and "
    "cluster sizes (a rand() split is none of those), stable as the "
    "corpus grows (a doc never changes split when new docs arrive — "
    "modulo hashing is per-row, unlike ntile/percent_rank). Map-side "
    "only: no shuffle, fuses into the scan.",
)
def q_sample_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100
    return d.select(
        "doc_id",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test").alias("split"),
    )


_RES_K = 10  # reservoir size per stratum


@register(
    "q_sample_reservoir",
    family="sampling",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS slot
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {_RES_K}
    """,
    doc=f"Distributed reservoir sample, k={_RES_K} per source stratum. "
    "The classic single-pass reservoir is sequential; the distributed "
    "equivalent is bottom-k by a uniform key — md5(doc_id) here, so "
    "the 'reservoir' is reproducible across engines, retries, and "
    "cluster sizes, and is a genuine uniform sample per stratum (each "
    "doc's key is i.i.d.-uniform, bottom-k of uniforms = simple random "
    "sample without replacement). Scale: one shuffle on source, keyed "
    "window, k rows retained per stratum; for a pathologically hot "
    "stratum the same bottom-k is computable as a two-level partial "
    "top-k aggregation without changing results.",
)
def q_sample_reservoir(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    key = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("slot"))
        .filter(F.col("slot") <= _RES_K)
        .select("doc_id", "source", F.col("slot").cast("long").alias("slot"))
    )


@register(
    "q_sample_balanced",
    family="sampling",
    oracle="""
    WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tgt AS (SELECT min(n) AS target FROM sizes),
    ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, sample_rank
    FROM ranked, tgt WHERE sample_rank <= tgt.target
    """,
    doc="Class-balanced downsample: every lang keeps exactly "
    "min-class-size docs (the training-data rebalance that stops a "
    "90% majority class from dominating a fine-tune mix), chosen by "
    "md5(doc_id) order so the subset is deterministic, reproducible "
    "and nested across runs. Differs from q_sample_stratified "
    "(proportional k-per-stratum): here the cap is DATA-DEPENDENT — "
    "one tiny per-class count agg feeds the scalar target via a "
    "broadcast cross join (one row; never a shuffle). One hash "
    "shuffle on the class key for the rank window; at 100 TB the "
    "mega-class window input is pre-capped by a hash-prefix filter "
    "exactly as documented on q_sample_stratified.",
)
def q_sample_balanced(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    target = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("target"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.withColumn("sample_rank", F.row_number().over(w))
    return ranked.join(F.broadcast(target)).filter(
        F.col("sample_rank") <= F.col("target")
    ).drop("target")


@register(
    "q_sample_entity",
    family="sampling",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS revenue_cents
    FROM events
    WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '1a'
    GROUP BY user_id ORDER BY user_id
    """,
    doc="ENTITY-coherent sampling: a ~10% user-level holdout that keeps "
    "ALL of a user's events or none — the correct shape for eval "
    "holdouts, privacy slices, and per-entity debugging, where "
    "row-level sampling (q_sample_hash) would shear users' histories "
    "mid-sequence and silently bias every sessionized/funnel metric "
    "computed on the sample. Membership is a pure function of the "
    "ENTITY key (md5 prefix), so it is sticky across reprocessing and "
    "consistent across every table sharing the key — sampling events, "
    "checkpoints, and features by the same predicate yields aligned "
    "slices with no join. Map-side predicate into the scan + one "
    "user-keyed rollup; embarrassingly parallel at 100 TB.",
)
def q_sample_entity(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "1a"
    )
    purchase = F.col("event_type") == "purchase"
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.when(purchase, F.round(F.col("value") * 100).cast("long"))
                .otherwise(0)
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("user_id")
    )


_NEYMAN_TOTAL = 100  # total sample budget across strata


@register(
    "q_sample_neyman",
    family="sampling",
    oracle=f"""
    WITH stats AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    ),
    alloc AS (
      SELECT source, nh,
             nh * sqrt(greatest(
               s2 * 1.0 / nh - (s1 * 1.0 / nh) * (s1 * 1.0 / nh), 0.0))
               AS weight
      FROM stats
    ),
    tot AS (SELECT sum(weight) AS wtot FROM alloc),
    sizes AS (
      SELECT a.source, a.nh,
             CAST(least(floor({_NEYMAN_TOTAL} * a.weight / t.wtot + 0.5),
                        a.nh) AS BIGINT) AS n_take
      FROM alloc a CROSS JOIN tot t
    ),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d
    )
    SELECT r.doc_id, r.source, s.n_take
    FROM ranked r JOIN sizes s USING (source)
    WHERE r.rn <= s.n_take
    ORDER BY r.source, r.doc_id
    """,
    doc="Neyman-allocation stratified sample: each stratum's share of "
    f"the {_NEYMAN_TOTAL}-doc budget is proportional to N_h·S_h "
    "(population size × within-stratum std-dev of n_chars) — the "
    "survey-statistics optimum that spends budget where variance "
    "lives, vs q_sample_stratified's equal-k. Variance comes from "
    "exact BIGINT sums (Σx, Σx² of integer lengths), so every "
    "stratum's weight is the identical float expression cross-engine; "
    "selection within a stratum is the md5-rank determinism pattern. "
    "Scale: one stats rollup (map-side), allocation is |strata| rows "
    "broadcast back, one stratum-keyed rank window with the same "
    "hash-prefix pre-filter valve as q_sample_stratified.",
)
def q_sample_neyman(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    var = F.greatest(
        F.col("s2") * 1.0 / F.col("nh")
        - (F.col("s1") * 1.0 / F.col("nh")) * (F.col("s1") * 1.0 / F.col("nh")),
        F.lit(0.0),
    )
    alloc = stats.select("source", "nh", (F.col("nh") * F.sqrt(var)).alias("weight"))
    tot = alloc.agg(F.sum("weight").alias("wtot"))
    sizes = alloc.join(F.broadcast(tot)).select(
        "source",
        F.least(
            F.floor(_NEYMAN_TOTAL * F.col("weight") / F.col("wtot") + 0.5),
            F.col("nh"),
        )
        .cast("long")
        .alias("n_take"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(sizes), "source")
        .filter(F.col("rn") <= F.col("n_take"))
        .select("doc_id", "source", "n_take")
        .orderBy("source", "doc_id")
    )


_WES_K = 50


@register(
    "q_sample_weighted",
    family="sampling",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             -- u in (0,1]: md5-derived 48-bit uniform, deterministic
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
              + 1) / 281474976710656.0 AS u
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, n_chars,
             ln(u) / n_chars AS es_key
      FROM keyed WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM scored
    ORDER BY es_key DESC, doc_id
    LIMIT {_WES_K}
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirtes "
    f"A-ES): top-{_WES_K} docs by key u^(1/w) — equivalently argmax "
    "ln(u)/w — with weight w = n_chars, so long documents are "
    "proportionally more likely but nothing is drawn twice; the "
    "length-weighted corpus subset a token-budget ablation wants "
    "(uniform doc sampling under-represents tokens). u is a "
    "DETERMINISTIC md5-derived 48-bit uniform (the content-hash "
    "sampling rule, not RNG), so the draw is reproducible, "
    "engine-exact (identical float expression of an exact integer), "
    "and consistent under retries. Scale: pure map-side scoring + "
    "TakeOrderedAndProject — no shuffle but the k-row result; the "
    "distributed-reservoir alternative is only needed when k itself "
    "outgrows the driver.",
)
def q_sample_weighted(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(281474976710656.0)
    es_key = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_WES_K)
        .select("doc_id", "source", "n_chars")
    )


_CORESET_SLICES = 8  # 8 sign bits over 8-dim slices -> up to 256 grid cells

_CORESET_CELL_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(embedding[{i * 8 + 1}:{i * 8 + 8}], "
    f"x -> x::DOUBLE)) >= 0 THEN {2 ** i} ELSE 0 END)"
    for i in range(_CORESET_SLICES)
)


@register(
    "q_sample_coreset",
    family="sampling",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, label,
             {_CORESET_CELL_SQL} AS cell
      FROM embeddings
    )
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(min(vec_id) AS BIGINT) AS rep_vec_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels
    FROM cells GROUP BY cell ORDER BY cell
    """,
    doc="Grid-cell coreset selection — diversity-preserving data "
    "selection for training: quantize each embedding to an 8-bit "
    "sign-grid cell (sign of each 8-dim slice sum — the same "
    "deterministic data-independent quantizer family as "
    "q_sim_rerank's coarse stage) and keep ONE representative per "
    "occupied cell (min vec_id) plus the cell's population and label "
    "diversity. Selecting per-cell representatives instead of "
    "uniform-random rows preserves coverage of sparse regions — the "
    "coreset/stratified-diversity primitive behind 'train on 1% "
    "without collapsing the tails'. Exactness: the slice sums are "
    "identical left-to-right double folds in both engines, so cell "
    "ids, representatives and counts are all bitwise. Scale: one "
    "map-side pass computes cells; the rollup groups on at most 256 "
    "keys (map-side combinable, no skew risk — a cell is a fixed "
    "aggregate, never a data copy); representatives join back by id "
    "when the full rows are needed. Ref: no reference counterpart — "
    "LLM data-selection tier.",
)
def q_sample_coreset(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    bits = []
    for i in range(_CORESET_SLICES):
        s = F.aggregate(
            F.slice(F.col("embedding"), i * 8 + 1, 8),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double"),
        )
        bits.append(F.when(s >= 0, F.lit(2 ** i)).otherwise(F.lit(0)))
    cell = bits[0]
    for b in bits[1:]:
        cell = cell + b
    return (
        e.select(cell.cast("int").alias("cell"), "vec_id", "label")
        .groupBy("cell")
        .agg(
            F.min("vec_id").cast("long").alias("rep_vec_id"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct("label").cast("long").alias("n_labels"),
        )
        .orderBy("cell")
    )


@register(
    "q_sample_kfold",
    family="sampling",
    oracle="""
    WITH tagged AS (
      SELECT user_id % 5 AS fold, user_id, event_type,
             CAST(round(value * 1e4) AS BIGINT) AS v
      FROM events
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(count(*) FILTER (event_type = 'purchase') AS DOUBLE)
                 / count(*), 6) + 0.0 AS purchase_share,
           round(sum(v) / 1e4, 4) + 0.0 AS value_sum
    FROM tagged GROUP BY fold ORDER BY fold
    """,
    doc="Deterministic 5-fold cross-validation assignment at the USER "
    "level (fold = user_id % 5): every event of a user lands in "
    "exactly one fold, so no user leaks across train/validation "
    "splits — the grouped-CV discipline that row-level random splits "
    "silently violate on repeated-measures data. The per-fold balance "
    "report (events, users, label share, value mass) is the "
    "before-you-train sanity table; the modulo is engine-independent "
    "and retry-stable, the same determinism stance as q_sample_hash "
    "(which covers content-hash splits; this covers entity-keyed "
    "folds). Exactness: counts exact; shares one division of exact "
    "counts; value mass an exact 1e4-quantized integer sum. Scale: "
    "one combinable 5-group agg; count(DISTINCT user) re-shuffles "
    "only (fold, user) pairs. Ref: no reference counterpart — "
    "sampling tier.",
)
def q_sample_kfold(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    tagged = ev.select(
        (F.col("user_id") % 5).alias("fold"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 1e4).cast("long").alias("v"),
    )
    return (
        tagged.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            (
                F.round(
                    F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                    .cast("double")
                    / F.count(F.lit(1)),
                    6,
                )
                + 0.0
            ).alias("purchase_share"),
            (F.round(F.sum("v") / 1e4, 4) + 0.0).alias("value_sum"),
        )
        .orderBy("fold")
    )


@register(
    "q_sample_importance",
    family="sampling",
    oracle="""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS k
      FROM src
    ),
    w AS (
      -- importance weight toward a UNIFORM source target:
      -- w = (nt/k)/n = target_share / current_share
      SELECT s.source, s.n, t.nt, t.k,
             CAST(t.nt AS DOUBLE) / t.k / s.n AS wt
      FROM src s CROSS JOIN tot t
    ),
    ess AS (
      -- effective sample size (Kish): (Σ n·w)² / Σ n·w² — exact
      -- rationals: Σn·w = nt (by construction), Σn·w² = (nt/k)²·Σ1/n
      SELECT CAST(sum(CAST(round(1e12 / n) AS BIGINT)) AS BIGINT) AS q_inv
      FROM src
    )
    SELECT w.source, w.n,
           round(CAST(w.n AS DOUBLE) / w.nt, 6) + 0.0 AS current_share,
           round(1.0 / w.k, 6) + 0.0 AS target_share,
           round(w.wt, 6) + 0.0 AS weight,
           round(CAST(w.nt AS DOUBLE) * w.nt
                 / ((CAST(w.nt AS DOUBLE) / w.k) * (CAST(w.nt AS DOUBLE) / w.k)
                    * (e.q_inv / 1e12)), 4) + 0.0 AS effective_n
    FROM w CROSS JOIN ess e
    ORDER BY source
    """,
    doc="Importance-sampling reweighting toward a uniform source "
    "mixture, with the Kish effective sample size — the two numbers "
    "that decide whether to REWEIGHT (cheap, but ESS collapse means "
    "high variance) or RESAMPLE (q_mix_domains) a skewed corpus: "
    "w = target_share/current_share per source, ESS = (Σnw)²/Σnw². "
    "Exactness: counts exact; each 1/n term is quantized 1e12 before "
    "the cross-source sum (order-insensitive), making ESS a float "
    "expression of exact ints; shares/weights are single divisions. "
    "Scale: one combinable per-source rollup + a 1-row totals "
    "broadcast — nothing touches the fact twice. Ref: no reference "
    "counterpart — sampling tier.",
)
def q_sample_importance(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    src = src.localCheckpoint(eager=False)  # tot/w/ess share it
    tot = src.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ess = src.agg(
        F.sum(F.round(F.lit(1e12) / F.col("n")).cast("long"))
        .cast("long").alias("q_inv")
    )
    w = src.join(F.broadcast(tot)).join(F.broadcast(ess))
    target = F.col("nt").cast("double") / F.col("k")
    return w.select(
        "source",
        "n",
        (F.round(F.col("n").cast("double") / F.col("nt"), 6) + 0.0).alias(
            "current_share"
        ),
        (F.round(1.0 / F.col("k"), 6) + 0.0).alias("target_share"),
        (F.round(target / F.col("n"), 6) + 0.0).alias("weight"),
        (
            F.round(
                F.col("nt").cast("double") * F.col("nt")
                / (target * target * (F.col("q_inv") / 1e12)),
                4,
            )
            + 0.0
        ).alias("effective_n"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round-10 wave 15: the Poisson bootstrap — THE distributed bootstrap.
# ---------------------------------------------------------------------------

_PB_REPS = 10
# Poisson(1) CDF cut points scaled to integer 1e-4 buckets: a uniform
# bucket u in [0,10000) maps to weight w = #cutoffs <= u (inverse-CDF).
# floor(1e4 * CDF(k)) for k = 0..6; P(w > 7) < 1e-4 collapses into w=7.
_PB_CUTS = (3678, 7357, 9196, 9809, 9963, 9994, 9999)


@register(
    "q_sample_poisson_bootstrap",
    family="sampling",
    oracle=f"""
    WITH reps AS (SELECT CAST(r AS BIGINT) AS r FROM range({_PB_REPS}) t(r)),
    w AS (
      SELECT reps.r,
             CAST(round(e.value * 100) AS BIGINT) AS cents,
             ({" + ".join(
                 f"(CASE WHEN CAST(('0x' || substring(md5(CAST(e.event_id AS VARCHAR) || ':' || CAST(reps.r AS VARCHAR)), 1, 4)) AS BIGINT) % 10000 >= {c} THEN 1 ELSE 0 END)"
                 for c in _PB_CUTS
             )}) AS wt
      FROM events e CROSS JOIN reps
    ),
    est AS (
      SELECT r,
             CAST(sum(wt) AS BIGINT) AS n_eff,
             CAST(sum(wt * cents) AS BIGINT) AS sv
      FROM w GROUP BY r
    )
    SELECT r AS replicate, n_eff,
           round(CAST(sv AS DOUBLE) / n_eff / 100, 6) + 0.0 AS est_mean
    FROM est ORDER BY replicate
    """,
    doc=f"Poisson bootstrap of the mean event value ({_PB_REPS} "
    "replicates): each row enters replicate r with weight w ~ "
    "Poisson(1), drawn DETERMINISTICALLY by inverting the Poisson "
    "CDF at an md5(event_id:r) integer bucket — the distributed "
    "bootstrap (Chamandy et al. / Google's poisson bootstrap): "
    "classical resampling needs n draws WITH replacement through a "
    "shuffle per replicate, dead at 100 TB; Poisson weights make "
    "every replicate ONE map expression over the same scan, all "
    f"{_PB_REPS} replicates in a single combinable pass, and the "
    "replicate spread estimates the sampling error of the mean "
    "(q_agg_bootstrap resamples WITHIN Spark for a quantile CI; "
    "this is the engine-portable hash-deterministic form whose "
    "weights the oracle reproduces bit-for-bit). Exactness: the "
    "inverse-CDF is integer bucket-vs-cutoff comparisons (cutoffs "
    "floor(1e4 CDF(k)), tail mass < 1e-4 collapses into w=7); "
    "estimates are exact integer weighted sums with one division. "
    "Scale: one fanned-out map pass (x replicates) into a "
    "combinable per-replicate rollup — no shuffle of the fact "
    "beyond the rollup, no resampling. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_sample_poisson_bootstrap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    reps = spark.createDataFrame([(r,) for r in range(_PB_REPS)], "r long")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    wt = sum(
        F.when(bucket >= c, 1).otherwise(0) for c in _PB_CUTS
    )
    w = ev.crossJoin(F.broadcast(reps)).select(
        "r",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        wt.alias("wt"),
    )
    est = w.groupBy("r").agg(
        F.sum("wt").cast("long").alias("n_eff"),
        F.sum(F.col("wt") * F.col("cents")).cast("long").alias("sv"),
    )
    return est.select(
        F.col("r").alias("replicate"),
        "n_eff",
        (
            F.round(F.col("sv").cast("double") / F.col("n_eff") / 100, 6) + 0.0
        ).alias("est_mean"),
    ).orderBy("replicate")
