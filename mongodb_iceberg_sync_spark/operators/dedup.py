"""Deduplication operators (north-star LLM-pipeline surface).

Dedup strategies over `documents`, all designed around equi-join
blocking so nothing is quadratic in the corpus:

  exact          — hash-groupBy on sha256(text)           (oracle-checked)
  minhash LSH    — shingle→minhash sig→band buckets       (rows-only: hash-specific)
  simhash        — 64-bit simhash, banded candidate join  (rows-only)
  n-gram jaccard — shingle-join candidates + exact jaccard (oracle-checked)
  embedding      — cosine near-dup clusters               (oracle-checked)
  incremental    — new batch vs corpus by content hash    (oracle-checked)
  clusters       — connected components over the jaccard
                   pair graph (hash-min label propagation) (oracle-checked
                   vs a DuckDB recursive CTE)

At 100 TB the shape that matters: every method produces candidates via
groupBy/join on a *derived key* (hash, band, shingle), never an
all-pairs cross join; the only cross join below is the 500-row
embedding table, with the LSH/IVF path in operators.similarity as the
scale alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import register
from ._util import t

N_MINHASH = 16
N_BANDS = 4  # 4 bands x 4 rows
MAX_LSH_BUCKET = 64  # skip degenerate band buckets (quadratic at scale)


def token_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, th: array<bigint>) — xxhash64 per word token.

    `split` is evaluated ONCE per row: the transform lambda touches only
    array ELEMENTS, never the array expression itself, so Catalyst's
    CollapseProject cannot inline a re-evaluation per element.
    """
    return docs.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda tk: F.xxhash64(tk)).alias("th"),
    )


def _shingle_hashes(th_col, n: int = 3):
    """Distinct word-n-gram shingle HASHES from a token-hash array.

    A shingle is identified by xxhash64 over its n consecutive token
    hashes (order-sensitive, multi-arg) — no shingle string is ever
    built. th_col MUST be a bound attribute (post-exchange), not an
    expression: the lambda body indexes into it per shingle, and an
    embedded expression would re-evaluate O(words) times per doc (the
    previous string-shingle form paid exactly that: O(words) `split`s
    per doc, ~2x the whole minhash pipeline's runtime).

    Guarded: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    documents must short-circuit to an empty array.
    """
    k = F.size(th_col) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), F.greatest(k, F.lit(1)) - 1),
            lambda i: F.xxhash64(*[F.get(th_col, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(grams)


def shingled_docs(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles: array<bigint>) — distinct word-3-gram hashes.

    Tokenize+hash first (one split per row), spread the token-hash
    arrays across cores (~8 B/token on the wire, same order as the raw
    text), THEN build shingle hashes from integer triples — the exchange
    doubles as the binding barrier `_shingle_hashes` requires.

    Short docs (< n words ⇒ empty shingle set) are filtered HERE, on the
    scan side, where the predicate is cheap (`size(split(text))`).
    Downstream must NOT filter on size(shingles): Catalyst pushes such a
    predicate below both exchanges, substituting the full shingle
    expression into the filter — which re-embeds the token-hash
    expression inside the indexing lambda and re-evaluates it per
    element. That one pushed-down filter was ~5s of a ~7s sf0.1 run
    (the whole pipeline is ~1.5s without it).
    """
    th = spread(token_hashes(docs.filter(F.size(F.split("text", " ")) >= n)))
    return th.select("doc_id", _shingle_hashes(F.col("th"), n).alias("shingles"))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    Shingling/minhashing is compute-bound per row; a small parquet file
    arrives as one input split, which would serialize the whole pipeline
    on a single core. At 100 TB the scan has natural parallelism and the
    exchange is a no-op-sized shuffle relative to the signature compute
    it unlocks; on the bench files it is the difference between 1 and 32
    cores. Cheap because it runs BEFORE shingle expansion (raw text
    crosses the wire once, ~5x smaller than its shingle set).
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


@register(
    "q_dedup_exact",
    family="dedup",
    oracle="""
    SELECT sha256(text)  AS text_sha,
           min(doc_id)   AS keeper_doc_id,
           count(*)      AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    doc="Exact dedup via content hash: groupBy(sha256(text)) keeps the "
    "smallest doc_id. Hashing first means the shuffle carries 64-byte "
    "keys, not arbitrary-length documents.",
)
def q_dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("text_sha"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "q_dedup_near",
    family="dedup",
    oracle=None,  # minhash values are engine-specific → rows-only
    doc="MinHash+LSH near-dup candidates: word-3-gram shingles → 16 "
    "minhashes (xxhash64 seeded per row) → 4 bands of 4 → bucket-join. "
    "Pairs sharing a band are candidates; output estimated Jaccard = "
    "signature agreement. Never all-pairs: candidates come from a "
    "groupBy on (band_id, band_hash), and buckets larger than "
    "MAX_LSH_BUCKET are skipped (degenerate buckets are quadratic).",
)
def q_dedup_near(spark, sf_dir):
    # shingled_docs spreads token-hash arrays across cores before the
    # shingle stage; shingles arrive as 64-bit hashes already (`base`
    # needs no further string hashing). The repartition below is a
    # deliberate materialization barrier — Catalyst's CollapseProject
    # would otherwise inline the shingle-hash expression into every one
    # of the 16 minhash lambdas below (CSE does not cross higher-order
    # functions), recomputing it 16x. The exchange carries only
    # (doc_id, base) — 64-bit hashes.
    d = shingled_docs(t(spark, sf_dir, "documents"))
    # NO size filter here — shingled_docs already dropped short docs on
    # the scan side (see its docstring for why a size(base)>0 filter
    # here is a performance trap).
    base_df = (
        d.select("doc_id", F.col("shingles").alias("base"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # Map-side signatures: sig[i] = min over base hashes re-hashed with
    # the family index (integer hashing, ~free vs string hashing). No
    # explode -> groupBy: the only corpus-wide shuffles are the barrier
    # above and the band-bucket join.
    # The signature (16 minhashes over the base hash array) is the
    # expensive map-side compute; it is checkpointed at ONE ROW PER DOC
    # so the bucket-size scan and both candidate-join sides read it
    # without recomputing — band derivation below it is trivial integer
    # hashing, cheap to repeat per consumer.
    sig = base_df.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
            lambda i: F.array_min(F.transform(F.col("base"), lambda h: F.xxhash64(h, i))),
        ).alias("sig"),
    ).localCheckpoint(eager=True)
    rows_per_band = N_MINHASH // N_BANDS
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        b,
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")
    # Oversized-bucket guard: a degenerate band hash (identical
    # boilerplate docs) makes one bucket quadratic at 100 TB; standard
    # LSH practice skips buckets above a cap. Bucket counting is a
    # map-side-combinable agg; the hot set is tiny → broadcast anti-join,
    # no extra shuffle on the corpus side.
    hot = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > MAX_LSH_BUCKET)
        .select("band_id", "band_hash")
    ).localCheckpoint(eager=True)  # computed once, read by both join sides
    pruned = bands.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
    a = pruned.alias("a")
    b = pruned.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(agree.cast("double") / N_MINHASH, 4).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= 0.25)


_NGRAM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(l) - 2, 0) + 1),
                      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
        FROM toks
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cutoff AS (SELECT greatest(16.0, 0.05 * count(*)) AS c FROM documents),
    rare AS (
      SELECT doc_id, s FROM sh
      WHERE s NOT IN (
        SELECT s FROM sh GROUP BY s HAVING count(*) > (SELECT c FROM cutoff)
      )
    ),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.c AS BIGINT) AS n_common,
           round(c.c / (sa.n + sb.n - c.c), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE c.c / (sa.n + sb.n - c.c) >= 0.2
"""


def _ngram_common_pairs(spark, sf_dir):
    """(doc_a, doc_b, c, na, nb) for every pair sharing a rare shingle —
    UNFILTERED: jaccard (q_dedup_ngram_jaccard) and asymmetric
    containment (q_text_containment) apply their own thresholds."""
    docs = t(spark, sf_dir, "documents")
    shingled = shingled_docs(docs)
    # shingle arrays are already array_distinct per doc, so exploding
    # yields distinct (doc_id, s) directly — no distinct() shuffle. The
    # set size rides along each exploded row (one extra long) instead of
    # joining a separate `sizes` relation twice — that shape recomputed
    # the shingle pipeline two more times and added two keyed shuffles.
    sh = shingled.select(
        "doc_id",
        F.size("shingles").cast("long").alias("n"),
        F.explode("shingles").alias("s"),
    ).localCheckpoint(eager=True)  # df scan + anti-join both read this
    # Hot-shingle guard: the df aggregation is map-side combinable and
    # the hot set is tiny (only shingles above the cutoff), so it
    # BROADCASTS to a left_anti join — no extra corpus-wide shuffle on
    # the join side. The max(16, 5%-of-corpus) cutoff rides the SAME job
    # as a 1-row broadcast (scalar-subquery shape) instead of a separate
    # docs.count() driver action — one fewer job per invocation.
    n_docs = docs.groupBy().agg(F.count("*").alias("n_docs"))
    hot = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .join(F.broadcast(n_docs))
        .filter(F.col("df") > F.greatest(F.lit(16.0), F.lit(0.05) * F.col("n_docs")))
    ).select("s")
    sh = sh.join(F.broadcast(hot), "s", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("c"),
            F.max(F.col("a.n")).alias("na"),
            F.max(F.col("b.n")).alias("nb"),
        )
    )
    return common


def _ngram_jaccard_pairs(spark, sf_dir):
    """(doc_a, doc_b, c, na, nb) candidate pairs with Jaccard >= 0.2
    (shared by q_dedup_ngram_jaccard and q_dedup_clusters)."""
    common = _ngram_common_pairs(spark, sf_dir)
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return common.filter(jac >= 0.2)


@register(
    "q_dedup_ngram_jaccard",
    family="dedup",
    oracle=_NGRAM_ORACLE,
    doc="Exact n-gram Jaccard over shingle-join candidates: pairs share "
    "at least one word-3-gram (equi-join blocking — the inverted-index "
    "trick), then |A∩B| / (|A|+|B|-|A∩B|) ≥ 0.2. Integer counts + one "
    "division ⇒ oracle-checkable exactly. Stop-shingles (document "
    "frequency > max(16, 5% of corpus)) are dropped before the join — "
    "a hot shingle is a quadratic join bucket at 100 TB; denominators "
    "keep full set sizes (conservative Jaccard for pairs that shared "
    "hot shingles).",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return _ngram_jaccard_pairs(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        F.col("c").alias("n_common"),
        F.round(jac, 6).alias("jaccard"),
    )


@register(
    "q_dedup_simhash",
    family="dedup",
    oracle=None,  # hash-specific → rows-only
    doc="SimHash near-dup: 64-bit signature from token hashes (sum of "
    "±1 per bit position, sign → bit), candidates from 4×16-bit band "
    "join (guarantees recall for hamming ≤ 3), verified by "
    "bit_count(a XOR b) ≤ 3. Token hashing stays JVM-side (xxhash64); "
    "the 64-wide ±1 bit-fold is dense integer math, so it runs as a "
    "vectorized numpy kernel per Arrow batch — the interpreted "
    "aggregate/zip_with HOF form was 20x slower (O(tokens x 64) lambda "
    "evals per doc).",
)
def q_dedup_simhash(spark, sf_dir):
    # NO spread() before the Python stage: mapInPandas parallelism
    # follows the scan's split count, which at 100 TB is already wide.
    # Locally the file is one split, and a forced 32-way fan-out spawns
    # 32 Python workers that each cold-import numpy (~6s wall) to share
    # 500 rows — the single-split stage is 6x faster end-to-end.
    d = t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda tk: F.xxhash64(tk)).alias("th"),
    )

    def sim_kernel(batches):
        import numpy as np
        import pandas as pd

        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            n = len(pdf)
            sims = np.empty(n, dtype=np.int64)
            th = pdf["th"].tolist()
            # chunk so the (tokens x 64) int32 bit matrix stays ~tens of
            # MB regardless of Arrow batch size (reduceat folds whole
            # docs, so the only Python-level loop is per ~512-doc chunk)
            CH = 512
            for s in range(0, n, CH):
                docs = th[s : s + CH]
                lens = np.array([len(d) for d in docs], dtype=np.int64)
                total = int(lens.sum())
                if total == 0 or (lens == 0).any():
                    # empty token lists corrupt reduceat segment bounds;
                    # they can't occur (split always yields >=1 token)
                    # but degrade to per-doc folding rather than miscount
                    for j, d in enumerate(docs):
                        h = np.asarray(d, dtype=np.int64).view(np.uint64)
                        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                        sums = (2 * bits - 1).sum(axis=0)
                        sims[s + j] = np.int64(
                            ((sums > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
                        )
                    continue
                flat = np.concatenate(
                    [np.asarray(d, dtype=np.int64) for d in docs]
                ).view(np.uint64)
                # bit b of (h >> b) is bit b of h — arithmetic vs logical
                # shift is irrelevant under & 1, so this matches the JVM
                # shiftright-based definition exactly
                bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                    np.int32
                )
                starts = np.zeros(len(docs), dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                ones = np.add.reduceat(bits, starts, axis=0)
                sums = 2 * ones - lens[:, None]
                packed = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                sims[s : s + len(docs)] = packed.view(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": sims})

    # materialize once: (doc_id, simhash) is 16 bytes/doc, and without
    # this the band self-join would run the Python stage on BOTH
    # branches (Spark can't reuse a non-deterministic-looking Python
    # exchange across a self-join)
    simhash = hashed.mapInPandas(
        sim_kernel, "doc_id bigint, simhash bigint"
    ).localCheckpoint()
    bands = simhash.select(
        "doc_id",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.struct(
                    i.alias("band_id"),
                    F.call_function("shiftright", F.col("simhash"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("band_val"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    # Degenerate-bucket guard, same rationale as minhash LSH: a flood
    # of identical documents shares one simhash, making its band bucket
    # quadratic (measured 0.96s -> 23.6s on a 10x-replicated corpus,
    # tools/scale_probe.py). Identical-content floods belong to EXACT
    # dedup (which precedes simhash in any real pipeline); capping the
    # bucket keeps the candidate join linear.
    hot = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 2 * MAX_LSH_BUCKET)
        .select("band_id", "band_val")
    ).localCheckpoint(eager=True)
    bands = bands.join(F.broadcast(hot), ["band_id", "band_val"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 3)
    )


_EMB_DEDUP_ORACLE = """
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
               6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.3
"""


@register(
    "q_dedup_embedding",
    family="dedup",
    oracle=_EMB_DEDUP_ORACLE,
    doc="Embedding-cosine near-dup pairs (cos ≥ 0.3 — the synthetic "
    "embeddings are near-random, max pairwise cos ≈ 0.47, so a "
    "production-style 0.9 threshold would make the differential check "
    "degenerate-empty). Exact all-pairs via distributed block GEMM "
    "(functions.vector.pairwise_cosine_gemm): vectors replicated to "
    "block-pair groups (block = id % 8), one numpy matmul per group "
    "inside applyInPandas — no driver collect, no broadcast; shuffle "
    "is O(n·n_blocks), per-group memory O(n/n_blocks·dim). Exact "
    "all-pairs is inherently O(n²) compute; the 100 TB path is "
    "LSH/IVF blocking (operators.similarity.q_sim_topk_ivf).",
)
def q_dedup_embedding(spark, sf_dir):
    from ..functions.vector import pairwise_cosine_gemm

    e = t(spark, sf_dir, "embeddings")
    return pairwise_cosine_gemm(e, "vec_id", "embedding", threshold=0.3)


@register(
    "q_dedup_incremental",
    family="dedup",
    oracle="""
    SELECT n.doc_id, sha256(n.text) AS text_sha
    FROM documents n
    WHERE n.doc_id % 10 = 0
      AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.doc_id % 10 <> 0 AND sha256(c.text) = sha256(n.text)
      )
    """,
    doc="Incremental dedup — the steady-state pipeline shape: a new "
    "batch (doc_id % 10 = 0 here; a micro-batch in production) is "
    "anti-joined by content hash against the existing corpus, keeping "
    "only genuinely new documents. The anti-join ships 64-hex-char "
    "hashes, never text; at 100 TB the corpus side is a bucketed/"
    "sorted hash index table so the join is co-located (see "
    "tests/test_scale_patterns.py), and Spark's left_anti + AQE "
    "turns the small new-batch side into a broadcast.",
)
def q_dedup_incremental(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    corpus = d.filter(F.col("doc_id") % 10 != 0).select(
        F.sha2(F.col("text"), 256).alias("text_sha")
    )
    return new.join(corpus, "text_sha", "left_anti")


def _rep_jaccard_pairs(reps):
    """Jaccard >= 0.2 candidate pairs between exact-text REPRESENTATIVES.

    Same rare-shingle inverted-index shape as _ngram_common_pairs, with
    one twist: shingle document frequency is weighted by the exact-group
    size each rep stands for (sum(gsize) == the raw per-doc count), so
    the hot-shingle cutoff — max(16, 5% of the FULL corpus) — selects
    exactly the shingles it would on the uncollapsed corpus. The join
    itself only ever sees distinct texts: a k-copy boilerplate clique
    costs one row here, not k (and not C(k,2) downstream).
    """
    shingled = shingled_docs(reps.select("doc_id", "text")).join(
        reps.select("doc_id", "gsize"), "doc_id"
    )
    sh = shingled.select(
        "doc_id",
        "gsize",
        F.size("shingles").cast("long").alias("n"),
        F.explode("shingles").alias("s"),
    ).localCheckpoint(eager=True)
    n_docs = reps.groupBy().agg(F.sum("gsize").alias("n_docs"))
    hot = (
        sh.groupBy("s")
        .agg(F.sum("gsize").alias("df"))
        .join(F.broadcast(n_docs))
        .filter(F.col("df") > F.greatest(F.lit(16.0), F.lit(0.05) * F.col("n_docs")))
    ).select("s")
    sh = sh.join(F.broadcast(hot), "s", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("c"),
            F.max(F.col("a.n")).alias("na"),
            F.max(F.col("b.n")).alias("nb"),
        )
        .filter(jac >= 0.2)
    )


_CLUSTERS_ORACLE = """
    WITH RECURSIVE grp AS (
      SELECT text, min(doc_id) AS rep_id, count(*) AS gsize
      FROM documents GROUP BY text
    ),
    star AS (
      SELECT d.doc_id AS u, g.rep_id AS v
      FROM documents d JOIN grp g ON d.text = g.text
      WHERE d.doc_id <> g.rep_id
    ),
    toks AS (
      SELECT rep_id AS doc_id, gsize, string_split(text, ' ') AS l FROM grp
    ),
    sh AS (
      SELECT DISTINCT doc_id, gsize, s FROM (
        SELECT doc_id, gsize,
               unnest(list_transform(range(1, greatest(len(l) - 2, 0) + 1),
                      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
        FROM toks
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cutoff AS (SELECT greatest(16.0, 0.05 * count(*)) AS c FROM documents),
    rare AS (
      SELECT doc_id, s FROM sh
      WHERE s NOT IN (
        SELECT s FROM sh GROUP BY s HAVING sum(gsize) > (SELECT c FROM cutoff)
      )
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE c.c / (sa.n + sb.n - c.c) >= 0.2
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
      UNION ALL SELECT u, v FROM star
      UNION ALL SELECT v, u FROM star
    ),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node
    ),
    lab AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY node)
    SELECT l.doc_id, l.cluster_id, cs.n AS cluster_size
    FROM lab l
    JOIN (SELECT cluster_id, count(*) AS n FROM lab GROUP BY 1) cs USING (cluster_id)
"""


@register(
    "q_dedup_clusters",
    family="dedup",
    oracle=_CLUSTERS_ORACLE,
    doc="Duplicate CLUSTERS, not just pairs: connected components over "
    "exact-dup STAR edges plus the n-gram-Jaccard graph between "
    "exact-text REPRESENTATIVES, via iterative hash-min label "
    "propagation (the Pregel idiom in pure DataFrames). Every doc gets "
    "cluster_id = min doc_id reachable through dup edges, plus the "
    "cluster size — the canonical keep-one-per-cluster shape a "
    "training-data dedup actually ships. The two-layer edge set is "
    "the scale-critical part: a boilerplate page with k exact copies "
    "contributes k-1 star edges instead of the C(k,2) pairs the "
    "member-level pair graph carries — the 100x probe filled the DISK "
    "with the pair form (C(100,2) per clique); components are "
    "IDENTICAL because similarity is a pure function of the text, so "
    "any member-level near-dup edge maps onto the rep-level edge, and "
    "shingle document frequencies stay corpus-weighted (sum of group "
    "sizes == raw doc counts) so the hot-shingle cutoff is unchanged. "
    "The iteration itself (functions/graph_algs.connected_components: "
    "per-round edge join + pointer doubling + min-combine, "
    "localCheckpoint-truncated lineage, O(log diameter) rounds) runs "
    "over the REP-PAIR graph only — nodes are the reps with >=1 "
    "near-dup edge, a tiny fraction of the corpus — which is exact "
    "because cluster_id = min reachable doc_id = min rep_id in the rep "
    "component (each rep is its group's min), and star members inherit "
    "it through ONE post-hoc hash join instead of riding every round's "
    "shuffle. Oracle: DuckDB recursive CTE over the equivalent "
    "two-layer (star + rep-pair) edge set.",
)
def q_dedup_clusters(spark, sf_dir):
    from ..functions.graph_algs import connected_components

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    # exact-text groups: shuffle carries 32-byte hashes, not documents
    grp = (
        docs.groupBy(F.sha2("text", 256).alias("_sha"))
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("gsize"))
        .localCheckpoint(eager=True)  # read twice: rep texts + label fan-out
    )
    member = docs.select(F.sha2("text", 256).alias("_sha"), "doc_id")
    reps = grp.join(docs, grp.rep_id == docs.doc_id).select(
        "doc_id", "text", "gsize"
    )
    pairs = _rep_jaccard_pairs(reps).select("doc_a", "doc_b")
    rep_edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # Components over the REP graph only — its node set is the reps that
    # have at least one near-dup pair, a tiny fraction of the corpus.
    # cluster_id = min doc_id reachable = min rep_id in the rep component,
    # because every rep is its exact-group's minimum doc_id; so running
    # the iteration rep-level is exact, and the full-corpus label map is
    # ONE hash join afterwards instead of a per-round corpus-wide shuffle.
    comp = connected_components(rep_edges, max_rounds=20)
    rep_cluster = grp.join(comp, grp.rep_id == comp.node, "left").select(
        "_sha", F.coalesce("comp", "rep_id").alias("cluster_id")
    )
    labels = member.join(rep_cluster, "_sha").select("doc_id", "cluster_id")
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


_BLOOM_M = 1 << 17  # bit-space size (positions live in [0, m))
_BLOOM_K = 5  # hash functions per document


def bloom_positions(text_col, m: int = _BLOOM_M, k: int = _BLOOM_K):
    """k bloom bit positions for a document, all JVM-side.

    Seeded xxhash64 plays the k independent hash functions; pmod keeps
    positions in [0, m). Returns an array<long> column.
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(text_col, F.lit(i)), F.lit(m))
            for i in range(k)
        ]
    )


def bloom_candidates(ref: DataFrame, qry: DataFrame, text_col: str = "text"):
    """Docs in ``qry`` whose every bloom bit is set by ``ref``.

    The filter is expressed RELATIONALLY: the 'bitmap' is the distinct
    set of reference bit positions (<= m rows, broadcastable), and a
    query doc is a candidate iff all k of its positions hit — an
    equi-join + grouped count, no driver-side bitmap, no UDF. Same
    false-positive semantics as a classic bloom filter (position
    collisions), zero false negatives (a present doc's positions are
    all set by its own reference copy).
    """
    ref_pos = (
        ref.select(F.explode(bloom_positions(F.col(text_col))).alias("pos"))
        .distinct()
    )
    qry_pos = qry.select(
        "doc_id", F.posexplode(bloom_positions(F.col(text_col))).alias("i", "pos")
    )
    return (
        qry_pos.join(F.broadcast(ref_pos), "pos")
        .groupBy("doc_id")
        .agg(F.countDistinct("i").alias("n_hits"))
        .filter(F.col("n_hits") == _BLOOM_K)
        .select("doc_id", F.lit(True).alias("maybe_duplicate"))
    )


@register(
    "q_dedup_bloom",
    family="dedup",
    oracle=None,  # xxhash64 is engine-specific; pinned by tests/test_dedup_bloom.py
    doc="Bloom-filter membership prefilter — the steady-state shape of "
    "incremental dedup at 100 TB: yesterday's corpus (here docs with "
    "even doc_id) is summarized as a set of bloom bit positions "
    "(k=5 seeded xxhash64 mod 2^17), and today's batch (odd doc_ids "
    "plus the doc_id%4==0 docs, which ARE in the reference and so "
    "must all be flagged) is scanned once against it. The bitmap is "
    "relational: distinct reference positions broadcast (<= 16 KB "
    "dense equivalent) and a candidate is a grouped all-k-positions "
    "hit — no driver sketch, no UDF, false positives only from "
    "position collisions, never false negatives. Candidates then go "
    "to exact verification (q_dedup_incremental's left_anti) — the "
    "bloom pass exists to keep that expensive step off the 99% of "
    "novel documents.",
)
def q_dedup_bloom(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    qry = docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0))
    return bloom_candidates(ref, qry).orderBy("doc_id")


_CONTAIN_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(l) - 2, 0) + 1),
                      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
        FROM toks
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cutoff AS (SELECT greatest(16.0, 0.05 * count(*)) AS c FROM documents),
    rare AS (
      SELECT doc_id, s FROM sh
      WHERE s NOT IN (
        SELECT s FROM sh GROUP BY s HAVING count(*) > (SELECT c FROM cutoff)
      )
    ),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    both_dirs AS (
      SELECT c.doc_a AS doc_id, c.doc_b AS other_doc,
             c.c, sa.n AS n_self
      FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
      UNION ALL
      SELECT c.doc_b AS doc_id, c.doc_a AS other_doc,
             c.c, sb.n AS n_self
      FROM common c JOIN sizes sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_id, other_doc,
           CAST(c AS BIGINT)          AS n_common,
           round(c / n_self, 6)       AS containment
    FROM both_dirs
    WHERE c / n_self >= 0.6
"""


@register(
    "q_text_containment",
    family="dedup",
    oracle=_CONTAIN_ORACLE,
    doc="Asymmetric n-gram CONTAINMENT: |shingles(A) ∩ shingles(B)| / "
    "|shingles(A)| ≥ 0.6 — catches document INCLUSION (a post quoted "
    "inside a digest, boilerplate wrapping an article) that symmetric "
    "Jaccard misses when sizes differ widely (the Broder distinction). "
    "Same rare-shingle inverted-index blocking and hot-shingle "
    "broadcast guard as q_dedup_ngram_jaccard — the pair stream is "
    "computed once and emitted in both directions with each side's "
    "own denominator riding the row, so asymmetry costs no second "
    "join. Integer counts + one division: oracle-exact.",
)
def q_text_containment(spark, sf_dir):
    common = _ngram_common_pairs(spark, sf_dir)
    fwd = common.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("other_doc"),
        "c",
        F.col("na").alias("n_self"),
    )
    rev = common.select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("other_doc"),
        "c",
        F.col("nb").alias("n_self"),
    )
    cont = F.col("c") / F.col("n_self")
    return (
        fwd.unionByName(rev)
        .filter(cont >= 0.6)
        .select(
            "doc_id",
            "other_doc",
            F.col("c").alias("n_common"),
            F.round(cont, 6).alias("containment"),
        )
    )


_SEM_TAU = 0.25        # within-bucket cosine that marks an epsilon-ball dup
_SEM_MIN_BITS = 4      # never fewer than 16 buckets
_SEM_MAX_BITS = 16     # never more sign dims than the embedding can give
_SEM_BUCKET_ROWS = 64  # target rows per bucket — bounds the per-bucket
                       # pair count, so the self-join stays ~linear in n


_SEMANTIC_ORACLE = f"""
    WITH nn AS (
      SELECT greatest({_SEM_MIN_BITS}, least({_SEM_MAX_BITS},
               CAST(ceil(log2(greatest(count(*) / {_SEM_BUCKET_ROWS}.0, 1.0)))
                    AS BIGINT))) AS bits
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(1, nn.bits + 1),
                    i -> CASE WHEN embedding[i] >= 0
                              THEN 1 << (i - 1) ELSE 0 END))
                  AS BIGINT) AS bucket
      FROM embeddings CROSS JOIN nn
    ),
    dup AS (
      SELECT hi.vec_id, count(*) AS n_dups
      FROM b lo JOIN b hi ON lo.bucket = hi.bucket AND lo.vec_id < hi.vec_id
      WHERE round(
              list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE))
              / (sqrt(list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * lo.embedding[i]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(1, 65),
                       i -> hi.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE)))),
              6) >= {_SEM_TAU}
      GROUP BY hi.vec_id
    )
    SELECT b.vec_id, b.bucket,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0             AS kept
    FROM b LEFT JOIN dup d ON b.vec_id = d.vec_id
"""


@register(
    "q_dedup_semantic",
    family="dedup",
    oracle=_SEMANTIC_ORACLE,
    doc="SemDedup-style semantic pruning (Abbas et al. 2023): a vector "
    "is dropped when a LOWER-id vector in the same coarse bucket sits "
    "within its epsilon-ball (cos >= 0.25 on this near-random synthetic "
    "data; ~0.95+ on a real corpus). Keep-lowest-id makes the greedy "
    "epsilon-cover deterministic — no RNG, no iteration order. The "
    "coarse bucket here is the sign pattern of the first 4 dims (a "
    "16-cell random hyperplane partition, the degenerate form of the "
    "k-means clustering SemDedup uses); pairwise cosine runs ONLY "
    "within buckets, so the self-join is bucket-blocked, never "
    "all-pairs — the same candidate-capping shape as q_sim_ann_lsh. "
    "The bit count ADAPTS to corpus size (ceil(log2(n/64)), floor 4): "
    "buckets multiply as n grows so per-bucket pair counts stay "
    "~constant and the self-join stays ~linear — the 10x probe caught "
    "the fixed-4-bit version at 86x growth; SemDedup does the same by "
    "scaling k-means k with n. Cross-bucket misses are SemDedup's "
    "documented cluster-boundary misses. Elementwise double casts "
    "before the dot product + round-6 make the score bitwise "
    "cross-engine (same contract as q_dedup_embedding). The count "
    "feeding the bit choice is one scalar to the driver (same "
    "bounded-collect class as q_graph_components' histogram).",
)
def q_dedup_semantic(spark, sf_dir):
    import math

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n_vec = e.count()
    bits = max(
        _SEM_MIN_BITS,
        min(
            _SEM_MAX_BITS,
            math.ceil(math.log2(max(n_vec / float(_SEM_BUCKET_ROWS), 1.0))),
        ),
    )
    bucket = sum(
        F.when(F.element_at("v", i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    )
    nrm = F.sqrt(
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    b = e.select("vec_id", "v", bucket.alias("bucket"), nrm.alias("nrm"))
    lo, hi = b.alias("lo"), b.alias("hi")
    dot = F.aggregate(
        F.zip_with(F.col("lo.v"), F.col("hi.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("lo.nrm") * F.col("hi.nrm")), 6)
    dup = (
        lo.join(
            hi,
            (F.col("lo.bucket") == F.col("hi.bucket"))
            & (F.col("lo.vec_id") < F.col("hi.vec_id")),
        )
        .filter(cos >= _SEM_TAU)
        .groupBy(F.col("hi.vec_id").alias("vec_id"))
        .agg(F.count("*").alias("n_dups"))
    )
    return b.join(dup, "vec_id", "left").select(
        "vec_id",
        "bucket",
        F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
        (F.coalesce("n_dups", F.lit(0)) == 0).alias("kept"),
    )


@register(
    "q_dedup_url",
    family="dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.COM:443/item/'
               || CAST(doc_id % 40 AS VARCHAR) || '/?utm_source=feed&ref='
               || lang || '&id=' || CAST(doc_id % 7 AS VARCHAR)
               || '&utm_campaign=sync#sec-2' AS url
      FROM documents
    ),
    split AS (
      SELECT doc_id,
             regexp_extract(regexp_replace(url, '#.*$', ''),
                            '^([^/]*//[^/]+)', 1) AS sh,
             regexp_replace(regexp_replace(url, '#.*$', ''),
                            '^[^/]*//[^/]+', '') AS rest
      FROM raw
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(sh), ':443$', ''),
                            '^https://www\\.', 'https://')
             ||
             regexp_replace(
               regexp_replace(
                 regexp_replace(rest, '(utm_[a-z]+|ref)=[^&]*&', '', 'g'),
                 '[?&](utm_[a-z]+|ref)=[^&]*$', ''),
               '\\?$', '') AS canonical_url
      FROM split
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM canon
    GROUP BY canonical_url
    """,
    doc="URL-canonicalization dedup — the web-crawl pipeline's FIRST "
    "dedup pass (cheaper than any content hash: two crawls of one "
    "page differ only in tracking params / host case / default "
    "port / fragment): lowercase scheme+host, strip the :443 "
    "default port, the www. prefix, the #fragment, and utm_*/ref "
    "tracking params, then exact-group on the canonical form "
    "keeping the first-crawled doc_id. URLs are synthesized "
    "deterministically from (source, lang, doc_id) since the "
    "fixture ships no URL column — the canonicalization chain is "
    "the operator. All regexes are RE2-safe (no backrefs or "
    "lookaround) so Java and DuckDB agree byte-for-byte; the whole "
    "chain is JVM codegen string ops fused into the scan (no UDF). "
    "Scale: map-only until ONE exact groupBy whose shuffle carries "
    "canonical urls + two longs with map-side partial count/min; "
    "the same shape as q_dedup_exact, upstream of it in a real "
    "crawl stack.",
)
def q_dedup_url(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/item/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("/?utm_source=feed&ref="),
        F.col("lang"),
        F.lit("&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&utm_campaign=sync#sec-2"),
    )
    no_frag = F.regexp_replace(url, "#.*$", "")
    sh = F.regexp_extract(no_frag, "^([^/]*//[^/]+)", 1)
    rest = F.regexp_replace(no_frag, "^[^/]*//[^/]+", "")
    canon_host = F.regexp_replace(
        F.regexp_replace(F.lower(sh), ":443$", ""), r"^https://www\.", "https://"
    )
    canon_rest = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(rest, r"(utm_[a-z]+|ref)=[^&]*&", ""),
            r"[?&](utm_[a-z]+|ref)=[^&]*$",
            "",
        ),
        r"\?$",
        "",
    )
    return (
        d.select(
            "doc_id", F.concat(canon_host, canon_rest).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


@register(
    "q_dedup_softdedup",
    family="dedup",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    clus AS (
      SELECT h, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY h
    ),
    wdocs AS (
      SELECT d.source, d.toks, cl.c,
             CAST(round(d.toks * 1e6 / cl.c) AS BIGINT) AS eff_q
      FROM docs d JOIN clus cl ON cl.h = d.h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_singletons,
           CAST(sum(toks) AS BIGINT) AS raw_tokens,
           round(sum(eff_q) / 1e6, 4) + 0.0 AS effective_tokens,
           round(CAST(sum(toks) AS DOUBLE) / (sum(eff_q) / 1e6), 6) + 0.0
             AS inflation
    FROM wdocs GROUP BY source ORDER BY source
    """,
    doc="SoftDeDup re-weighting per source (the modern alternative to "
    "hard dedup — He et al. 2024, FineWeb ablations): instead of "
    "dropping duplicates, each document gets sampling weight 1/c "
    "where c is its exact-hash cluster size, so the EFFECTIVE token "
    "mass of every duplicated text equals one copy while keeping all "
    "surface forms available. Reports per-source raw vs effective "
    "tokens and the inflation ratio — the table that reweights a "
    "training mixture (feeds q_mix_token_budget). Exactness: md5 "
    "cluster sizes and whitespace token counts are exact ints; each "
    "doc's toks/c is ONE float division quantized to 1e6 fixed-point "
    "before the order-insensitive per-source sum. Scale: one hash "
    "agg on md5 (16-byte keys), one co-keyed join-back, one "
    "combinable per-source rollup — exactly q_dedup_exact's plan "
    "plus a broadcast-sized cluster table join. Ref: no reference "
    "counterpart — LLM-dedup tier.",
)
def q_dedup_softdedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    clus = docs.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wdocs = docs.join(clus, "h").select(
        "source",
        "toks",
        "c",
        F.round(F.col("toks") * 1e6 / F.col("c")).cast("long").alias("eff_q"),
    )
    return (
        wdocs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long").alias("n_singletons"),
            F.sum("toks").cast("long").alias("raw_tokens"),
            (F.round(F.sum("eff_q") / 1e6, 4) + 0.0).alias("effective_tokens"),
            (
                F.round(
                    F.sum("toks").cast("double") / (F.sum("eff_q") / 1e6), 6
                )
                + 0.0
            ).alias("inflation"),
        )
        .orderBy("source")
    )


# IVF coarse quantizer for semantic dedup (r9, VERDICT r8 task #5): the
# documented 100 TB valve for q_dedup_semantic, promoted to a first-class
# operator. K scales as ceil(sqrt(n)) (the FAISS/IVF convention) within
# [16, 256]; centroids are the K lowest-vec_id vectors — deterministic,
# no RNG, no iteration — the degenerate-but-honest stand-in for a k-means
# codebook (SemDedup uses k-means; the plan shape is identical and a
# trained codebook drops in as a broadcast table without touching it).
_IVF_MIN_K = 16
_IVF_MAX_K = 4096
_IVF_TAU = 0.25  # same epsilon-ball as q_dedup_semantic


@register(
    "q_dedup_semantic_ivf",
    family="dedup",
    oracle=f"""
    WITH nn AS (
      SELECT greatest({_IVF_MIN_K}, least({_IVF_MAX_K},
               CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
      FROM embeddings
    ),
    ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) AS rnk
      FROM embeddings
    ),
    cent AS (
      SELECT r.vec_id AS cid, r.embedding AS cv
      FROM ranked r CROSS JOIN nn WHERE r.rnk <= nn.k
    ),
    scored AS (
      SELECT e.vec_id, cent.cid,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * cent.cv[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> cent.cv[i]::DOUBLE * cent.cv[i]::DOUBLE)))),
               6) AS cs
      FROM embeddings e CROSS JOIN cent
    ),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, cid) AS r
        FROM scored
      ) WHERE r = 1
    ),
    b AS (
      SELECT a.vec_id, a.cell, e.embedding
      FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
    ),
    dup AS (
      SELECT hi.vec_id, count(*) AS n_dups
      FROM b lo JOIN b hi ON lo.cell = hi.cell AND lo.vec_id < hi.vec_id
      WHERE round(
              list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE))
              / (sqrt(list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * lo.embedding[i]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(1, 65),
                       i -> hi.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE)))),
              6) >= {_IVF_TAU}
      GROUP BY hi.vec_id
    )
    SELECT b.vec_id, b.cell,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0             AS kept
    FROM b LEFT JOIN dup d ON b.vec_id = d.vec_id
    """,
    doc="SemDedup with an IVF coarse quantizer — the documented 100 TB "
    "valve of q_dedup_semantic (sign-bit cells) promoted to a real "
    "operator: vectors are assigned to their nearest of K = "
    "ceil(sqrt(n)) centroids by rounded cosine (ties to the lower "
    "centroid id — fully deterministic), and the epsilon-ball "
    "pairwise cosine (tau = 0.25, keep-lowest-id) runs ONLY within a "
    "cell, so the self-join is cell-blocked like SemDedup's k-means "
    "clustering. Centroids are the K lowest-vec_id vectors — no RNG; "
    "a trained k-means codebook drops into the same broadcast without "
    "changing the plan. Both dense stages are Arrow-batched numpy "
    "GEMM (the r9 probe caught the per-pair JVM-fold version at "
    "~550x/100x — dense linear algebra is the documented exception "
    "to stay-JVM-side): assignment is one mapInPandas over the "
    "corpus against the K x d broadcast codebook (argmax of round-6 "
    "cosine; codebook columns cid-ascending so numpy's first-max IS "
    "the oracle's tie-break), and the within-cell pair stage is "
    "functions.vector.pairwise_cosine_gemm keyed on the cell — the "
    "same kernel+rounding q_dedup_embedding hash-matches with. "
    "K ~ sqrt(n) (cap 4096) balances assignment (n*K) against "
    "within-cell pairs (n*n/K) at the classical IVF optimum ~n^1.5; "
    "multi-probe (2 nearest cells) is the documented recall knob. "
    "The count feeding K and the K x d codebook are the only driver "
    "collects — bounded by K, never the corpus (the q_embed_pca "
    "class). Ref: no reference counterpart — LLM-pipeline tier.",)
def q_dedup_semantic_ivf(spark, sf_dir):
    import math

    import numpy as np

    from ..functions.vector import pairwise_cosine_gemm

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = e.localCheckpoint(eager=False)  # count + codebook + assignment + GEMM
    n_vec = e.count()
    if n_vec == 0:  # empty corpus: no codebook to build, empty result
        return spark.createDataFrame(
            [], "vec_id bigint, cell bigint, n_dups bigint, kept boolean"
        )
    k = max(_IVF_MIN_K, min(_IVF_MAX_K, math.ceil(math.sqrt(n_vec))))
    # K x d codebook to the driver: bounded by K (never by the corpus) —
    # the same bounded-collect class as q_embed_pca's partials
    cent = e.orderBy("vec_id").limit(k).collect()
    cid_arr = np.array([r.vec_id for r in cent], dtype=np.int64)
    cmat = np.array([r.embedding for r in cent], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    bc = spark.sparkContext.broadcast((cid_arr, cmat, cnorm))

    def assign(batches):
        import numpy as np  # noqa: PLC0415 — by-value closure
        import pandas as pd

        cids, cm, cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.sqrt((x * x).sum(axis=1))
            # oracle form: dot / (|a||b|), rounded at 6 BEFORE the argmax;
            # the codebook columns are cid-ascending, and np.argmax takes
            # the FIRST max — exactly the oracle's (cs DESC, cid) tie-break
            sims = np.round((x @ cm.T) / (xn[:, None] * cn[None, :]), 6)
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cell": cids[best]}
            )

    assigned = e.mapInPandas(assign, "vec_id bigint, cell bigint")
    b = e.join(assigned, "vec_id")  # carry the vector next to its cell
    b = b.localCheckpoint(eager=False)  # GEMM pair stage + output read it
    pairs = pairwise_cosine_gemm(
        b, "vec_id", "embedding", threshold=_IVF_TAU, label_col="cell"
    )
    dup = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_dups")
    )
    return b.select("vec_id", "cell").join(dup, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
        (F.coalesce("n_dups", F.lit(0)) == 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Round-10 wave 1: the md5-MinHash twin (VERDICT r9 task #4a), the per-band
# bucket audit (#4c), and multi-probe IVF (#4b).
# ---------------------------------------------------------------------------

_MINHASH_SHINGLE_SQL = """
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(l) - 1),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
      FROM toks
    ),
    mh AS (
      SELECT doc_id, k, min(md5(s || '|' || CAST(k AS VARCHAR))) AS h
      FROM sh CROSS JOIN range(16) t(k)
      GROUP BY doc_id, k
    ),
    sig AS (SELECT doc_id, list(h ORDER BY k) AS sig FROM mh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, CAST(b AS BIGINT) AS band_id,
             md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' ||
                 sig[b*4+3] || ',' || sig[b*4+4]) AS band_hash
      FROM sig CROSS JOIN range(4) t(b)
    )
"""


def _minhash_md5_bands(spark, sf_dir):
    """(doc_id, sig: array<string>, band_id, band_hash) — the md5-MinHash
    banding shared by q_dedup_minhash and q_profile_lsh_buckets.

    Engine-neutral construction (the q_agg_countmin precedent): every
    hash is md5 of an explicit string, so DuckDB reproduces the ENTIRE
    signature bit-for-bit and the full MinHash+LSH pipeline sits under
    the cross-engine hash gate — where q_dedup_near's xxhash64 family is
    engine-specific and rides a rows-only stamp. Production swap:
    xxhash64 integer hashing (q_dedup_near) is ~10x cheaper per shingle;
    the two operators are otherwise the same shape.
    """
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l")).filter(
        F.size("l") >= 3
    )
    ss = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("l", i),
                    F.element_at("l", i + 1),
                    F.element_at("l", i + 2),
                ),
            )
        ).alias("ss"),
    )
    # the exchange is the binding barrier (the shingled_docs lesson:
    # CollapseProject would re-inline the shingle expression into each of
    # the 16 minhash lambdas) and spreads signature compute across cores
    ss = spread(ss)
    sig = ss.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
            lambda k: F.array_min(
                F.transform(
                    F.col("ss"),
                    lambda s: F.md5(
                        F.concat(s, F.lit("|"), k.cast("string")).cast("binary")
                    ),
                )
            ),
        ).alias("sig"),
    ).localCheckpoint(eager=True)  # bucket scan + both join sides read it
    rows_per_band = N_MINHASH // N_BANDS
    return sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            ).cast("binary")
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")


@register(
    "q_dedup_minhash",
    family="dedup",
    oracle=f"""
    WITH {_MINHASH_SHINGLE_SQL},
    hot AS (
      SELECT band_id, band_hash FROM bands
      GROUP BY band_id, band_hash HAVING count(*) > {MAX_LSH_BUCKET}
    ),
    pruned AS (
      SELECT bands.* FROM bands ANTI JOIN hot USING (band_id, band_hash)
    ),
    cp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pruned a JOIN pruned b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT cp.doc_a, cp.doc_b,
             round(CAST((SELECT count(*) FROM range(1, 17) r(i)
                         WHERE sa.sig[i] = sb.sig[i]) AS DOUBLE) / 16,
                   4) AS est_jaccard
      FROM cp JOIN sig sa ON sa.doc_id = cp.doc_a
              JOIN sig sb ON sb.doc_id = cp.doc_b
    )
    SELECT doc_a, doc_b, est_jaccard + 0.0 AS est_jaccard
    FROM est WHERE est_jaccard >= 0.25
    """,
    doc="MinHash+LSH near-dup candidates with an ENGINE-NEUTRAL hash "
    "family — the oracle-checkable twin of q_dedup_near (VERDICT r9 "
    "task #4a; the q_agg_countmin/_fast precedent): word-3-gram "
    "shingle STRINGS -> 16 minhashes h_k = min over shingles of "
    "md5(shingle || '|' || k) -> 4 bands of 4 -> band_hash = md5 of "
    "the joined quarter-signature -> bucket equi-join on "
    "(band_id, band_hash) behind the MAX_LSH_BUCKET=64 valve -> "
    "est_jaccard = positionwise signature agreement / 16 (exact "
    "multiples of 2^-4, so round(4) is lossless), threshold 0.25. "
    "Every stage is deterministic identical text on both engines, so "
    "the FULL signature pipeline hash-matches where q_dedup_near's "
    "xxhash64 is engine-specific (rows-only). Production swap: "
    "xxhash64 integer hashing is ~10x cheaper per shingle — same "
    "shape, different hash family; keep this md5 twin as the "
    "correctness witness. Scale: signatures are one map pass behind "
    "a spread barrier; the only corpus-wide shuffles are that barrier "
    "and the band-bucket join; hot buckets are dropped whole "
    "(broadcast anti-join). Ref: no reference counterpart — "
    "LLM-pipeline tier.",
)
def q_dedup_minhash(spark, sf_dir):
    bands = _minhash_md5_bands(spark, sf_dir)
    hot = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > MAX_LSH_BUCKET)
        .select("band_id", "band_hash")
    ).localCheckpoint(eager=True)  # computed once, read by both join sides
    pruned = bands.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e)
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(agree.cast("double") / N_MINHASH, 4).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= 0.25)


@register(
    "q_profile_lsh_buckets",
    family="dedup",
    oracle=f"""
    WITH {_MINHASH_SHINGLE_SQL},
    bs AS (
      SELECT band_id, band_hash, CAST(count(*) AS BIGINT) AS n
      FROM bands GROUP BY band_id, band_hash
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT)  AS n_buckets,
           CAST(sum(n) AS BIGINT)    AS n_docs,
           CAST(max(n) AS BIGINT)    AS max_bucket,
           CAST(sum(CASE WHEN n > {MAX_LSH_BUCKET} THEN 1 ELSE 0 END)
                AS BIGINT)           AS n_hot_buckets,
           CAST(sum(CASE WHEN n > {MAX_LSH_BUCKET} THEN n ELSE 0 END)
                AS BIGINT)           AS n_hot_docs
    FROM bs GROUP BY band_id ORDER BY band_id
    """,
    doc="LSH band-bucket audit (VERDICT r9 task #4c): per band of the "
    "md5-MinHash banding, the bucket count, total banded docs, largest "
    "bucket, and how many buckets/docs sit above the MAX_LSH_BUCKET=64 "
    "valve — the observability query that tells an operator how much "
    "of the corpus the dedup valve is dropping BEFORE they tune the "
    "cap (a hot share near zero means the valve is dormant; a large "
    "share means boilerplate dominates and the threshold or shingle "
    "size needs attention). Scale: one map-side-combinable rollup on "
    "(band_id, band_hash) then a 4-row rollup — no joins, no pair "
    "explosion; the audit is strictly cheaper than the dedup it "
    "guards. Ref: no reference counterpart — LLM-pipeline tier.",
)
def q_profile_lsh_buckets(spark, sf_dir):
    bands = _minhash_md5_bands(spark, sf_dir)
    bs = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        bs.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_docs"),
            F.max("n").cast("long").alias("max_bucket"),
            F.sum(F.when(F.col("n") > MAX_LSH_BUCKET, 1).otherwise(0))
            .cast("long")
            .alias("n_hot_buckets"),
            F.sum(F.when(F.col("n") > MAX_LSH_BUCKET, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_hot_docs"),
        )
        .orderBy("band_id")
    )


@register(
    "q_dedup_semantic_ivf_mp",
    family="dedup",
    oracle=f"""
    WITH nn AS (
      SELECT greatest({_IVF_MIN_K}, least({_IVF_MAX_K},
               CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
      FROM embeddings
    ),
    ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) AS rnk
      FROM embeddings
    ),
    cent AS (
      SELECT r.vec_id AS cid, r.embedding AS cv
      FROM ranked r CROSS JOIN nn WHERE r.rnk <= nn.k
    ),
    scored AS (
      SELECT e.vec_id, cent.cid,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * cent.cv[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> cent.cv[i]::DOUBLE * cent.cv[i]::DOUBLE)))),
               6) AS cs
      FROM embeddings e CROSS JOIN cent
    ),
    assign AS (
      SELECT vec_id, cid AS cell, r FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, cid) AS r
        FROM scored
      ) WHERE r <= 2
    ),
    b AS (
      SELECT a.vec_id, a.cell, e.embedding
      FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
    ),
    p AS (
      SELECT DISTINCT lo.vec_id AS id_a, hi.vec_id AS id_b
      FROM b lo JOIN b hi ON lo.cell = hi.cell AND lo.vec_id < hi.vec_id
      WHERE round(
              list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE))
              / (sqrt(list_sum(list_transform(range(1, 65),
                       i -> lo.embedding[i]::DOUBLE * lo.embedding[i]::DOUBLE)))
               * sqrt(list_sum(list_transform(range(1, 65),
                       i -> hi.embedding[i]::DOUBLE * hi.embedding[i]::DOUBLE)))),
              6) >= {_IVF_TAU}
    ),
    dup AS (
      SELECT id_b AS vec_id, count(*) AS n_dups FROM p GROUP BY id_b
    ),
    prim AS (
      SELECT vec_id,
             max(CASE WHEN r = 1 THEN cell END) AS cell,
             max(CASE WHEN r = 2 THEN cell END) AS cell2
      FROM assign GROUP BY vec_id
    )
    SELECT prim.vec_id, prim.cell, prim.cell2,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0             AS kept
    FROM prim LEFT JOIN dup d ON prim.vec_id = d.vec_id
    """,
    doc="Multi-probe IVF SemDedup — q_dedup_semantic_ivf's documented "
    "recall valve promoted to a real operator (VERDICT r9 task #4b): "
    "every vector is assigned to its TWO nearest centroids (round-6 "
    "cosine, ties to the lower cid — numpy stable argsort over "
    "cid-ascending codebook columns IS the oracle's (cs DESC, cid) "
    "tie-break), so a near-dup pair straddling a cell boundary is "
    "caught whenever either vector's second probe lands in the "
    "other's cell — single-probe IVF's one recall failure mode. "
    "Pairs are deduped across shared cells before counting; output "
    "carries both probes (cell, cell2) so the recall gain is "
    "auditable against q_dedup_semantic_ivf (invariant: multi-probe "
    "n_dups >= single-probe n_dups per vector — pinned in "
    "tests/test_r10_invariants.py). Scale: assignment stays one "
    "mapInPandas GEMM against the K x d broadcast codebook; the pair "
    "stage is the same cell-keyed pairwise_cosine_gemm on a 2x "
    "replicated corpus — within-cell pair work rises ~4x worst-case "
    "over single-probe (the standard multi-probe recall/cost trade), "
    "still n^2/K-bounded, never all-pairs. Ref: no reference "
    "counterpart — LLM-pipeline tier.",
)
def q_dedup_semantic_ivf_mp(spark, sf_dir):
    import math

    import numpy as np

    from ..functions.vector import pairwise_cosine_gemm

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = e.localCheckpoint(eager=False)  # count + codebook + assignment + GEMM
    n_vec = e.count()
    if n_vec == 0:  # empty corpus: no codebook to build, empty result
        return spark.createDataFrame(
            [],
            "vec_id bigint, cell bigint, cell2 bigint, n_dups bigint, kept boolean",
        )
    k = max(_IVF_MIN_K, min(_IVF_MAX_K, math.ceil(math.sqrt(n_vec))))
    cent = e.orderBy("vec_id").limit(k).collect()
    nprobe = min(2, len(cent))
    cid_arr = np.array([r.vec_id for r in cent], dtype=np.int64)
    cmat = np.array([r.embedding for r in cent], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    bc = spark.sparkContext.broadcast((cid_arr, cmat, cnorm, nprobe))

    def assign2(batches):
        import numpy as np  # noqa: PLC0415 — by-value closure
        import pandas as pd

        cids, cm, cn, npr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.sqrt((x * x).sum(axis=1))
            sims = np.round((x @ cm.T) / (xn[:, None] * cn[None, :]), 6)
            # stable argsort on -sims: ties keep column order = cid
            # ascending — exactly the oracle's (cs DESC, cid) tie-break
            order = np.argsort(-sims, axis=1, kind="stable")[:, :npr]
            vids = pdf["vec_id"].to_numpy()
            out = {
                "vec_id": np.repeat(vids, npr),
                "cell": cids[order].reshape(-1),
                "rnk": np.tile(np.arange(1, npr + 1), len(vids)),
            }
            yield pd.DataFrame(out)

    assigned = e.mapInPandas(assign2, "vec_id bigint, cell bigint, rnk int")
    assigned = assigned.localCheckpoint(eager=False)  # pairs + prim read it
    b = e.join(assigned.select("vec_id", "cell"), "vec_id")
    pairs = pairwise_cosine_gemm(
        b, "vec_id", "embedding", threshold=_IVF_TAU, label_col="cell"
    ).dropDuplicates(["id_a", "id_b"])  # a pair can share BOTH probes
    dup = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_dups")
    )
    prim = assigned.groupBy("vec_id").agg(
        F.max(F.when(F.col("rnk") == 1, F.col("cell"))).alias("cell"),
        F.max(F.when(F.col("rnk") == 2, F.col("cell"))).alias("cell2"),
    )
    return prim.join(dup, "vec_id", "left").select(
        "vec_id",
        "cell",
        "cell2",
        F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
        (F.coalesce("n_dups", F.lit(0)) == 0).alias("kept"),
    )


@register(
    "q_dedup_cluster_sizes",
    family="dedup",
    oracle=_CLUSTERS_ORACLE.replace(
        """    SELECT l.doc_id, l.cluster_id, cs.n AS cluster_size
    FROM lab l
    JOIN (SELECT cluster_id, count(*) AS n FROM lab GROUP BY 1) cs USING (cluster_id)
""",
        """    SELECT CAST(cs.n AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cs.n * count(*) AS BIGINT) AS n_docs
    FROM (SELECT cluster_id, count(*) AS n FROM lab GROUP BY 1) cs
    GROUP BY cs.n ORDER BY cluster_size
""",
    ),
    doc="Cluster-SIZE histogram over q_dedup_clusters' connected "
    "components (exact-dup stars + rep-level n-gram-Jaccard edges): "
    "one row per size with the cluster count and total docs — the "
    "dedup yield forecast (keep-one-per-cluster retains "
    "sum(n_clusters) docs; sum over sizes of n_docs - n_clusters is "
    "exactly what dedup deletes) and the pathological-clique alarm "
    "(a giant component = boilerplate eating the corpus). Same "
    "two-layer edge set, hash-min components, and recursive-CTE "
    "oracle as q_dedup_clusters; the histogram is a <=max-size-row "
    "rollup on top. Scale: identical to q_dedup_clusters plus two "
    "combinable rollups. Ref: no reference counterpart — "
    "LLM-pipeline tier.",
)
def q_dedup_cluster_sizes(spark, sf_dir):
    cl = q_dedup_clusters(spark, sf_dir)
    per_cluster = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        per_cluster.groupBy(F.col("size").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q_dedup_threshold_curve",
    family="dedup",
    oracle=f"""
    WITH {_MINHASH_SHINGLE_SQL},
    hot AS (
      SELECT band_id, band_hash FROM bands
      GROUP BY band_id, band_hash HAVING count(*) > {MAX_LSH_BUCKET}
    ),
    pruned AS (
      SELECT bands.* FROM bands ANTI JOIN hot USING (band_id, band_hash)
    ),
    cp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pruned a JOIN pruned b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT cp.doc_a, cp.doc_b,
             CAST((SELECT count(*) FROM range(1, 17) r(i)
                   WHERE sa.sig[i] = sb.sig[i]) AS BIGINT) AS agree
      FROM cp JOIN sig sa ON sa.doc_id = cp.doc_a
              JOIN sig sb ON sb.doc_id = cp.doc_b
    ),
    grid AS (SELECT CAST(a16 AS BIGINT) AS agree_min
             FROM (VALUES (4), (6), (8), (10), (12), (14), (16)) t(a16)),
    pt AS (
      SELECT g.agree_min, est.doc_a, est.doc_b
      FROM grid g JOIN est ON est.agree >= g.agree_min
    ),
    a1 AS (
      SELECT agree_min, CAST(count(*) AS BIGINT) AS n_pairs
      FROM pt GROUP BY agree_min
    ),
    a2 AS (
      SELECT agree_min, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      FROM (SELECT agree_min, doc_a AS d FROM pt
            UNION ALL SELECT agree_min, doc_b FROM pt)
      GROUP BY agree_min
    )
    SELECT g.agree_min,
           round(CAST(g.agree_min AS DOUBLE) / 16, 4) + 0.0 AS threshold,
           CAST(coalesce(a1.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(a2.n_docs, 0) AS BIGINT) AS n_docs_affected
    FROM grid g LEFT JOIN a1 USING (agree_min) LEFT JOIN a2 USING (agree_min)
    ORDER BY agree_min
    """,
    doc="Dedup yield curve over the similarity threshold: candidate "
    "pairs and affected docs of the md5-MinHash pipeline counted at "
    "every threshold in {{4..16}}/16 signature agreement — the "
    "tune-the-knob-BEFORE-the-run audit (how many docs would a 0.5 "
    "threshold delete vs 0.75? the curve answers without re-running "
    "dedup per candidate threshold; its thresholds are exact "
    "multiples of 2^-4, the q_dedup_minhash convention). The pair "
    "set is computed ONCE (same banding + bucket valve); the curve "
    "is a 7-row grid join over the pair agreements. Scale: identical "
    "to q_dedup_minhash plus two grid-keyed rollups. Ref: no "
    "reference counterpart — LLM-pipeline tier.",
)
def q_dedup_threshold_curve(spark, sf_dir):
    bands = _minhash_md5_bands(spark, sf_dir)
    hot = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > MAX_LSH_BUCKET)
        .select("band_id", "band_hash")
    ).localCheckpoint(eager=True)
    pruned = bands.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    est = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e
                )
            )
            .cast("long")
            .alias("agree"),
        )
    )
    est = est.localCheckpoint(eager=False)  # both grid rollups read it
    grid = est.sparkSession.createDataFrame(
        [(v,) for v in (4, 6, 8, 10, 12, 14, 16)], "agree_min long"
    )
    pt = F.broadcast(grid).join(est, est.agree >= F.col("agree_min"))
    pt = pt.localCheckpoint(eager=False)  # a1 + a2 read it
    a1 = pt.groupBy("agree_min").agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    a2 = (
        pt.select("agree_min", F.col("doc_a").alias("d"))
        .unionAll(pt.select("agree_min", F.col("doc_b").alias("d")))
        .groupBy("agree_min")
        .agg(F.count_distinct("d").cast("long").alias("n_docs"))
    )
    return (
        F.broadcast(grid)
        .join(a1, "agree_min", "left")
        .join(a2, "agree_min", "left")
        .select(
            "agree_min",
            (F.round(F.col("agree_min").cast("double") / 16, 4) + 0.0).alias(
                "threshold"
            ),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs_affected"),
        )
        .orderBy("agree_min")
    )


@register(
    "q_text_dedup_impact",
    family="dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    grp AS (
      SELECT source, text, CAST(min(doc_id) AS BIGINT) AS keeper,
             CAST(count(*) AS BIGINT) AS copies,
             CAST(max(toks) AS BIGINT) AS toks
      FROM d GROUP BY source, text
    )
    SELECT source,
           CAST(sum(copies) AS BIGINT)          AS n_docs,
           CAST(count(*) AS BIGINT)             AS n_kept,
           CAST(sum(copies * toks) AS BIGINT)   AS total_tokens,
           CAST(sum(toks) AS BIGINT)            AS kept_tokens,
           round(1.0 - CAST(sum(toks) AS DOUBLE) / sum(copies * toks), 6)
             + 0.0 AS token_savings
    FROM grp GROUP BY source ORDER BY source
    """,
    doc="Token-level exact-dedup impact per source: whitespace-token "
    "counts before vs after keep-one-per-exact-text, and the savings "
    "ratio — the number a training-data budget meeting actually asks "
    "for (q_dedup_exact counts COPIES; compute budgets are priced in "
    "TOKENS, and a source whose dups are all long docs saves far "
    "more than its copy count suggests). Exactness: group by the "
    "text itself (per source), exact integer token sums, one "
    "division. Scale: the shuffle carries (source, text) ONCE per "
    "doc — at 100 TB swap the group key to sha256(text) "
    "(q_dedup_exact's 64-byte-key trick; identical result, the "
    "hash is keyed per source+text); one combinable rollup each "
    "side. Ref: no reference counterpart — LLM-pipeline tier.",
)
def q_text_dedup_impact(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    # shuffle carries a 32-byte hash, not the document (the
    # q_dedup_exact trick); text-identical docs hash-collide only
    # with sha256 collisions
    grp = d.groupBy("source", F.sha2("text", 256).alias("_sha")).agg(
        F.min("doc_id").cast("long").alias("keeper"),
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.max("toks").cast("long").alias("toks"),
    )
    return (
        grp.groupBy("source")
        .agg(
            F.sum("copies").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum(F.col("copies") * F.col("toks")).cast("long").alias(
                "total_tokens"
            ),
            F.sum("toks").cast("long").alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "total_tokens",
            "kept_tokens",
            (
                F.round(
                    1.0
                    - F.col("kept_tokens").cast("double") / F.col("total_tokens"),
                    6,
                )
                + 0.0
            ).alias("token_savings"),
        )
        .orderBy("source")
    )
