"""Similarity search over embeddings (north-star LLM-pipeline surface).

Brute-force cosine top-k is the correctness baseline; the IVF variant is
the 100 TB path: partition vectors into centroid buckets once (a write-
time transform, like any other partition key), then a probe touches only
nprobe buckets — the scan prunes instead of reading the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot_with_literal, norm, pairwise_cosine_gemm
from ..registry import register
from ._util import t

_PROBE_ID = 0
_TOPK_ORACLE = f"""
    WITH probe AS (
      SELECT embedding AS p FROM embeddings WHERE vec_id = {_PROBE_ID}
    )
    SELECT e.vec_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> e.embedding[i]::DOUBLE * probe.p[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65),
                      i -> probe.p[i]::DOUBLE * probe.p[i]::DOUBLE)))),
             6) AS cos_sim
    FROM embeddings e, probe
    WHERE e.vec_id <> {_PROBE_ID}
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
"""


@register(
    "q_sim_topk",
    family="similarity",
    oracle=_TOPK_ORACLE,
    doc="Brute-force cosine top-10 vs a probe vector. The probe folds "
    "into the plan as a literal array (broadcast by value); the scan is "
    "one pass, and TakeOrderedAndProject keeps only k rows per "
    "partition — no global sort.",
)
def q_sim_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    probe_row = e.filter(F.col("vec_id") == _PROBE_ID).head()
    if probe_row is None:  # empty corpus / missing probe: empty result
        return spark.createDataFrame([], "vec_id long, cos_sim double")
    probe = [float(x) for x in probe_row.embedding]
    import math

    probe_norm = math.sqrt(sum(x * x for x in probe))
    cos = dot_with_literal("embedding", probe) / (norm("embedding") * F.lit(probe_norm))
    return (
        e.filter(F.col("vec_id") != _PROBE_ID)
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "q_sim_topk_ivf",
    family="similarity",
    oracle=None,  # approximate recall set is algorithm-specific → rows-only
    doc="IVF-bucketed approximate top-k: an 8-centroid coarse quantizer "
    "trained by 2 Lloyd iterations of distributed k-means "
    "(functions.vector.kmeans_fit — deterministic init from the 8 "
    "smallest vec_ids), every vector assigned to its nearest centroid "
    "(a partition key at write time); a probe searches the nprobe=3 "
    "nearest buckets only. Returns approx top-10 with bucket "
    "provenance.",
)
def q_sim_topk_ivf(spark, sf_dir):
    from ..functions.vector import bucket_assign_udf, kmeans_fit

    e = t(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, "embedding", "vec_id", k=8, iters=2)
    probe_row = e.filter(F.col("vec_id") == _PROBE_ID).head()
    if not centroids or probe_row is None:  # empty corpus: empty result
        return spark.createDataFrame(
            [], "vec_id long, bucket int, cos_sim double"
        )
    probe = [float(x) for x in probe_row.embedding]

    assigned = e.withColumn(
        "bucket", bucket_assign_udf(centroids)("embedding")
    )

    import math

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    probe_sims = [(i + 1, cos_py(probe, c)) for i, c in enumerate(centroids)]
    nprobe_buckets = [b for b, _ in sorted(probe_sims, key=lambda x: (-x[1], x[0]))[:3]]

    cos = cosine("embedding", F.array(*[F.lit(v) for v in probe]))
    return (
        assigned.filter(F.col("bucket").isin(nprobe_buckets))
        .filter(F.col("vec_id") != _PROBE_ID)
        .select(
            "vec_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.round(cos, 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


_PAIRWISE_ORACLE = """
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(a.label AS INTEGER) AS label,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
               6) AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, label, cos_sim FROM pairs WHERE cos_sim >= 0.3
"""


@register(
    "q_sim_pairwise",
    family="similarity",
    oracle=_PAIRWISE_ORACLE,
    doc="All-pairs similarity ≥ threshold with label blocking applied "
    "BEFORE the shuffle: the label is the partition key, so only "
    "same-label pairs are ever shuffled together or scored — compute "
    "is O(sum of block²), never O(n²). Each label group runs one "
    "triangular numpy GEMM inside applyInPandas (no driver collect, "
    "no broadcast). Threshold 0.3 because the synthetic embeddings "
    "are near-random (max pairwise cos ≈ 0.47); a production 0.85 "
    "would make the check degenerate-empty.",
)
def q_sim_pairwise(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label"), "embedding"
    )
    return pairwise_cosine_gemm(
        e, "vec_id", "embedding", threshold=0.3, label_col="label"
    )


_KNN_K = 10
_KNN_NPROBES = 8
_KNN_ORACLE = f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS p
      FROM embeddings WHERE vec_id < {_KNN_NPROBES}
    ),
    sims AS (
      SELECT probes.probe_id, e.vec_id,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * probes.p[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> probes.p[i]::DOUBLE * probes.p[i]::DOUBLE)))),
               5) AS cos_sim
      FROM embeddings e, probes
      WHERE e.vec_id <> probes.probe_id
    )
    SELECT probe_id, vec_id, cos_sim, knn_rank
    FROM (
      SELECT probe_id, vec_id, cos_sim,
             row_number() OVER (
               PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id
             ) AS knn_rank
      FROM sims
    )
    WHERE knn_rank <= {_KNN_K}
"""


@register(
    "q_sim_knn_join",
    family="similarity",
    oracle=_KNN_ORACLE,
    doc=f"Batch kNN join: top-{_KNN_K} neighbors for EACH of "
    f"{_KNN_NPROBES} probe vectors in one corpus pass — the retrieval "
    "shape (N queries vs corpus), not the single-probe special case. "
    "Scale mechanics: the probe matrix rides into mapInPandas by value "
    "(k·d floats); each Arrow batch computes an (n x p) GEMM and emits "
    "only its LOCAL top-k per probe (partial top-k — the global top-k "
    "per probe is always a subset of the per-batch top-k union, for "
    "any total order), so the final per-probe window sees at most "
    "k x n_batches rows instead of the corpus: no hot-probe-key "
    "shuffle, no global sort. Cosines rounded to 5 before ranking so "
    "both engines rank identically; ties break by vec_id.",
)
def q_sim_knn_join(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    probe_rows = (
        e.filter(F.col("vec_id") < _KNN_NPROBES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    if not probe_rows:  # empty corpus: no probes, empty result
        return spark.createDataFrame(
            [], "probe_id long, vec_id long, cos_sim double, knn_rank int"
        )
    probe_ids = np.array([int(r.vec_id) for r in probe_rows])
    P = np.array([[float(x) for x in r.embedding] for r in probe_rows])
    Pn = P / np.sqrt((P * P).sum(axis=1))[:, None]

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            An = A / np.sqrt((A * A).sum(axis=1))[:, None]
            sims = np.round(An @ Pn.T, 5)  # (n, p)
            out_p, out_v, out_s = [], [], []
            for j, pid in enumerate(probe_ids):
                mask = ids != pid  # exclude the self-pair
                order = np.lexsort((ids[mask], -sims[mask][:, j]))[: _KNN_K]
                out_p.extend([pid] * len(order))
                out_v.extend(ids[mask][order])
                out_s.extend(sims[mask][:, j][order])
            yield pd.DataFrame(
                {"probe_id": out_p, "vec_id": out_v, "cos_sim": out_s}
            )

    partials = e.select("vec_id", "embedding").mapInPandas(
        partial_topk, "probe_id long, vec_id long, cos_sim double"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        partials.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= _KNN_K)
    )


_LSH_BITS = 60  # hyperplane budget; bands/bits are sized per corpus
_LSH_MAX_BANDS = 6
_LSH_TARGET_BUCKET = 64  # expected bucket population the banding aims at
_LSH_BUCKET_CAP = 512  # skip degenerate buckets (identical-vector floods)


def _lsh_banding(n_rows: int) -> tuple[int, int]:
    """(bits_per_band, n_bands) sized so expected bucket population
    stays ~_LSH_TARGET_BUCKET regardless of corpus size.

    FIXED band width is a quadratic time bomb: with b bits a band has
    2^b buckets, so bucket population — and candidate pairs per bucket,
    squared — grows linearly with the corpus. Measured: 4-bit bands
    went 6s -> 200s on a 10x corpus (tools/scale_probe.py). Scaling
    bits with log2(n/target) pins bucket population, making candidate
    volume ~linear in n; recall per band falls as bits rise, which is
    the standard LSH trade — spend more bands (hyperplanes) to buy it
    back."""
    import math

    bits = min(12, max(4, math.ceil(math.log2(max(n_rows, 2) / _LSH_TARGET_BUCKET))))
    return bits, max(2, min(_LSH_MAX_BANDS, _LSH_BITS // bits))


@register(
    "q_sim_ann_lsh",
    family="similarity",
    oracle=None,  # hash-family-specific candidate set → rows-only
    doc="Random-hyperplane LSH ANN (kNN join, approximate): sign-bits "
    "of 60 fixed seeded Gaussian hyperplanes (numpy GEMM per Arrow "
    "batch — one matmul per batch, no per-row Python), banded "
    "ADAPTIVELY — bits per band = log2(corpus/64), so expected bucket "
    "population stays constant and candidate volume stays ~linear in "
    "n (a fixed band width was measured quadratic: 6s -> 200s on a "
    "10x corpus). Candidates live inside shared (band, value) buckets "
    "(degenerate buckets > 512 skipped); each bucket scores with ONE "
    "numpy GEMM over pre-normalized vectors (applyInPandas per "
    "bucket) keeping the bucket-local top-3 — lossless for the global "
    "top-3 and ~50x less shuffle than joining vectors onto candidate "
    "id-pairs. tests/test_scale_patterns.py pins recall@3 against the "
    "exact GEMM kNN.",
)
def q_sim_ann_lsh(spark, sf_dir):
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    # fixed seeded hyperplanes — deterministic across runs/executors
    H = np.random.RandomState(42).standard_normal((_LSH_BITS, 64))

    def sig_and_norm(batches):
        # one Arrow round-trip computes BOTH the LSH signature (GEMM +
        # sign-pack) and the L2-normalized vector, so the exact re-rank
        # below is a single dot product per candidate instead of
        # dot + two norms (3x less per-pair HOF work).
        import pandas as pd_  # noqa: N813 — worker-local

        for pdf in batches:
            M = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            if len(M) == 0:
                continue
            bits = (M @ H.T) > 0
            packed = (bits * (1 << np.arange(_LSH_BITS, dtype=np.int64))).sum(axis=1)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            yield pd_.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "nvec": list(Mn),
                    "sig": packed.astype(np.int64),
                }
            )

    e = t(spark, sf_dir, "embeddings")
    sig = e.select("vec_id", "embedding").mapInPandas(
        sig_and_norm, "vec_id long, nvec array<double>, sig long"
    ).localCheckpoint(eager=True)

    bits_per_band, n_bands = _lsh_banding(sig.count())  # count reads the checkpoint
    mask = (1 << bits_per_band) - 1
    # candidate generation carries IDS ONLY — an early version carried
    # both embedding arrays through the band join and paid ~60x the
    # shuffle volume (candidate multiplicity x 2 x 512 B vs 16 B);
    # dedupe the id-pairs first, then look the vectors back up.
    bands = sig.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.call_function("shiftright", F.col("sig"), b * bits_per_band)
                    .bitwiseAND(F.lit(mask))
                    .alias("band_val"),
                ),
            )
        ).alias("band"),
    ).select("vec_id", "band.band_id", "band.band_val")
    # degenerate-bucket guard (identical-vector floods): same pattern
    # as minhash LSH — count buckets (map-side combinable), broadcast
    # the tiny hot set, anti-join it away before the self-join
    hot = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > _LSH_BUCKET_CAP)
        .select("band_id", "band_val")
    ).localCheckpoint(eager=True)
    bands = bands.join(F.broadcast(hot), ["band_id", "band_val"], "left_anti")

    # Score INSIDE each bucket with one numpy GEMM (applyInPandas per
    # (band_id, band_val) group) and keep only the bucket-local top-3
    # per vector. The earlier shape — id-pair self-join, then two joins
    # to look the vectors back up, then an interpreted HOF dot per pair
    # — shuffled candidate_multiplicity × 512 B and evaluated ~6M lambda
    # chains at sf0.1 (3.4s); here each vector's 512 B crosses the wire
    # once per band membership (~50 MB) and all dots are one M @ M.T.
    # Bucket-local top-3 is lossless for the global top-3: any neighbor
    # dropped locally is outranked by 3 candidates in that same bucket,
    # so it cannot be global top-3 either.
    member = bands.join(sig.select("vec_id", "nvec"), "vec_id").select(
        "band_id", "band_val", "vec_id", "nvec"
    )

    def bucket_topk(pdf):
        import pandas as pd_  # noqa: N813 — worker-local

        n = len(pdf)
        if n < 2:
            return pd_.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cos_sim": []}
            ).astype({"vec_id": "int64", "neighbor_id": "int64", "cos_sim": "float64"})
        M = np.asarray(pdf["nvec"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        S = M @ M.T
        np.fill_diagonal(S, -np.inf)
        k = min(3, n - 1)
        # per-row order by (-cos, neighbor_id) — deterministic ties
        order = np.lexsort((np.broadcast_to(ids, (n, n)), -S), axis=1)[:, :k]
        rows = np.arange(n)[:, None]
        return pd_.DataFrame(
            {
                "vec_id": np.repeat(ids, k),
                "neighbor_id": ids[order].ravel(),
                "cos_sim": S[rows, order].ravel(),
            }
        )

    scored = (
        member.groupBy("band_id", "band_val")
        .applyInPandas(bucket_topk, "vec_id long, neighbor_id long, cos_sim double")
        # same pair from multiple bands has a bitwise-identical score
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("vec_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


@register(
    "q_cluster_kmeans",
    family="similarity",
    oracle=None,  # iterative algorithm → rows-only (deterministic init)
    doc="K-means clustering as a first-class operator: the IVF coarse "
    "quantizer's distributed Lloyd training (functions.vector."
    "kmeans_fit — Arrow-batched GEMM assignment, posexplode/avg "
    "update, driver holds only k x d floats) surfaced as a query: "
    "every vector labeled with its cluster and rounded cosine to the "
    "centroid, plus per-cluster sizes. Deterministic: init = the k "
    "smallest vec_ids, fixed 2 iterations, ties break to the first "
    "maximal centroid.",
)
def q_cluster_kmeans(spark, sf_dir):
    from ..functions.vector import bucket_assign_udf, kmeans_fit

    e = t(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, "embedding", "vec_id", k=8, iters=2)
    if not centroids:  # empty corpus: empty result
        return spark.createDataFrame(
            [], "vec_id long, cluster int, cluster_size long"
        )
    assigned = e.select(
        "vec_id",
        bucket_assign_udf(centroids)("embedding").alias("cluster"),
    )
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(sizes, "cluster")
        .select("vec_id", F.col("cluster").cast("int").alias("cluster"), "cluster_size")
    )


_PQ_M = 16  # subspaces
_PQ_K = 64  # centroids per subspace -> 6 bits/code, 16 codes/vector


@register(
    "q_sim_pq",
    family="similarity",
    oracle=None,  # quantized scores are codebook-specific → rows-only
    doc="Product-quantization ANN: vectors L2-normalize, split into 16 "
    "subspaces, each encoded as its nearest of 64 per-subspace "
    "centroids — 16 6-bit codes instead of 64 floats (~16x "
    "compression; at 100 TB the PQ codes column is what an exhaustive "
    "re-rankable scan reads, not the raw vectors). The codebook "
    "trains driver-side on a deterministic 256-vector sample (k·d "
    "floats — same budget as the IVF quantizer); asymmetric distance "
    "uses a per-probe lookup table folded into the plan as a literal, "
    "so scoring is 16 array lookups per row (one per subspace), "
    "JVM-side, no Python and "
    "no join. Returns approx top-10 by quantized cosine; "
    "tests/test_scale_patterns.py pins recall vs the exact top-10.",
)
def q_sim_pq(spark, sf_dir):
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    sample = np.asarray(
        [r.embedding for r in e.orderBy("vec_id").limit(256).collect()],
        dtype=np.float64,
    )
    if sample.size == 0:  # empty corpus: no codebook, empty result
        return spark.createDataFrame([], "vec_id long, approx_cos double")
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    dim = sample.shape[1]
    sub = dim // _PQ_M
    codebooks = []
    for s in range(_PQ_M):
        X = sample[:, s * sub : (s + 1) * sub]
        C = X[:_PQ_K].copy()  # deterministic init: first K sample rows
        for _ in range(5):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for k in range(_PQ_K):
                pts = X[assign == k]
                if len(pts):
                    C[k] = pts.mean(0)
        codebooks.append(C)
    CB = np.stack(codebooks)  # (M, K, sub)

    def encode(batches):
        import pandas as pd_

        for pdf in batches:
            V = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            if len(V) == 0:
                continue
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            codes = np.empty((len(V), _PQ_M), dtype=np.int32)
            for s in range(_PQ_M):
                X = V[:, s * sub : (s + 1) * sub]
                d2 = ((X[:, None, :] - CB[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d2.argmin(1)
            yield pd_.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    import pandas as pd_  # noqa: F401 — encode() closes over the module

    enc = e.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, codes array<int>"
    )

    probe = np.asarray(
        e.filter(F.col("vec_id") == _PROBE_ID).head().embedding, dtype=np.float64
    )
    probe /= np.linalg.norm(probe)
    # asymmetric-distance lookup table: LUT[s][c] = <probe_s, centroid_sc>
    lut = np.stack([CB[s] @ probe[s * sub : (s + 1) * sub] for s in range(_PQ_M)])
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    approx_cos = F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get(F.get(lut_lit, s), F.get(F.col("codes"), s)),
    )
    return (
        enc.filter(F.col("vec_id") != _PROBE_ID)
        .select("vec_id", F.round(approx_cos, 6).alias("approx_cos"))
        .orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(10)
    )


_SPATIAL_D = 0.02  # proximity radius in the 2-D slice


@register(
    "q_sim_spatial_join",
    family="similarity",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
         * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
         + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
         * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
           AS dist2
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        <= {_SPATIAL_D * _SPATIAL_D}
    """,
    doc="Grid-bucketed spatial proximity join: all pairs within L2 "
    "radius d in a 2-D slice of the embedding space. The ORACLE is the "
    "O(n^2) cross join (fine at sf0.01); the ENGINE never builds it — "
    "each point keys to its floor(coord/d) grid cell, one side "
    "replicates into its 3x3 neighborhood (9 rows, constant factor), "
    "and candidates are an EQUI-join on cell id: every true pair "
    "shares exactly one (replica-cell = home-cell) match, so no "
    "dedup pass is needed, and candidate volume is ~density-bounded "
    "per cell rather than n^2. This is the same banding idea as the "
    "range join and LSH buckets, in 2-D — at 100 TB the cell id is "
    "also the natural partition key (spatial locality = partition "
    "locality). Distances are fixed-order double arithmetic: "
    "bitwise-identical cross-engine, no rounding.",
)
def q_sim_spatial_join(spark, sf_dir):
    d = _SPATIAL_D
    emb = t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
        F.floor(F.element_at("embedding", 1).cast("double") / d).alias("cx"),
        F.floor(F.element_at("embedding", 2).cast("double") / d).alias("cy"),
    )
    # one side fans out to its 3x3 cell neighborhood
    offs = F.expr(
        "explode(array(-1L, 0L, 1L))"
    )
    a = (
        pts.withColumn("ox", offs)
        .withColumn("oy", F.expr("explode(array(-1L, 0L, 1L))"))
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("ox")).alias("cellx"),
            (F.col("cy") + F.col("oy")).alias("celly"),
        )
    )
    b = pts.select(
        F.col("vec_id").alias("vec_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("cellx"),
        F.col("cy").alias("celly"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cellx", "celly"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(dist2 <= F.lit(d * d))
        .select("vec_a", "vec_b", dist2.alias("dist2"))
    )


@register(
    "q_sim_range_search",
    family="similarity",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
      FROM embeddings WHERE vec_id % 100 = 0
    )
    SELECT p.probe_id, e.vec_id,
           round(list_cosine_similarity(p.pe, CAST(e.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM p, embeddings e
    WHERE e.vec_id <> p.probe_id
      AND list_cosine_similarity(p.pe, CAST(e.embedding AS DOUBLE[])) >= 0.3
    """,
    doc="Cosine RANGE search (radius query, not top-k): every corpus "
    "vector within cosine >= 0.3 of each probe — the shape behind "
    "'find everything semantically near this example' (contamination "
    "sweeps, near-dup fences, policy screens) where the answer size "
    "is data-dependent rather than a fixed k. The probe set "
    "broadcasts (tiny) and similarity is a JVM higher-order-function "
    "dot over the corpus — map-side, embarrassingly parallel, no "
    "shuffle at all: .explain shows scan -> broadcast join -> filter. "
    "At 100 TB this is one pass over the embedding shards; the "
    "LSH/IVF variants (q_sim_ann_lsh, q_sim_topk_ivf) bound the "
    "scanned fraction when passes get expensive. Exact cross-engine: "
    "both sides fold float32 values into a sequential DOUBLE "
    "accumulation (DuckDB needs CAST(emb AS DOUBLE[]) — its FLOAT[] "
    "kernel accumulates in float32 and diverges in the 8th digit).",
)
def q_sim_range_search(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    sim = cosine("pe", "embedding")
    # the per-(row, probe) cosine fold is compute-heavy map work: a
    # small parquet arrives as ONE input split, which would serialize
    # probes x corpus folds on a single core — the documented
    # single-split barrier (r6; same pattern as dedup.py:106)
    e_spread = e.repartition(max(spark.sparkContext.defaultParallelism, 1))
    return (
        e_spread.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .filter(sim >= 0.3)
        .select("probe_id", "vec_id", F.round(sim, 6).alias("cos_sim"))
    )


@register(
    "q_embed_pca",
    family="similarity",
    oracle=None,  # float covariance + LAPACK eigensolve → rows-only;
    # tests/test_scale_patterns.py pins projections vs a direct numpy
    # PCA at sf0.001 and orthogonality/variance invariants
    doc="Distributed PCA over the embedding column — the projection "
    "pass behind whitening, visualization, and cheap linear probes. "
    "Scale shape is the textbook one-pass Gramian: each partition "
    "reduces its Arrow batches to a d x d partial (M^T M, column sum, "
    "count) inside mapInPandas, so ONLY p x d^2 floats cross the "
    "wire; the driver merges partials in deterministic "
    "partition-range order (bitwise-stable sums), eigensolves the "
    "64 x 64 covariance (O(d^3), microseconds), and the top-2 "
    "components fold back into the plan as LITERAL arrays — the "
    "projection is zip_with/aggregate inside whole-stage codegen, no "
    "Python, no join, no second shuffle. Sign is canonicalized "
    "(largest-|loading| coordinate positive) so output does not "
    "depend on LAPACK's arbitrary eigenvector sign.",
)
def q_embed_pca(spark, sf_dir):
    import numpy as np

    from ..functions.vector import dot_with_literal

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def gram(batches):
        import numpy as np_
        import pandas as pd_

        G = None
        s = None
        n = 0
        first = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np_.asarray(pdf["embedding"].tolist(), dtype=np_.float64)
            g = M.T @ M
            cs = M.sum(axis=0)
            if G is None:
                G, s, n, first = g, cs, len(M), int(pdf["vec_id"].min())
            else:
                G += g
                s += cs
                n += len(M)
                first = min(first, int(pdf["vec_id"].min()))
        if G is None:
            return
        yield pd_.DataFrame(
            {
                "pkey": [first],
                "n": [n],
                "gram": [G.ravel().tolist()],
                "colsum": [s.tolist()],
            }
        )

    partials = (
        e.repartitionByRange(8, "vec_id")
        .sortWithinPartitions("vec_id")
        .mapInPandas(
            gram, "pkey long, n long, gram array<double>, colsum array<double>"
        )
        .collect()  # p x (d^2 + d) floats — partition count, not rows
    )
    if not partials:  # empty corpus: nothing to decompose
        return spark.createDataFrame([], "vec_id long, pc1 double, pc2 double")
    partials.sort(key=lambda r: r.pkey)
    d = int(len(partials[0].colsum))
    G = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in partials:
        G += np.asarray(r.gram).reshape(d, d)
        s += np.asarray(r.colsum)
        n += r.n
    mean = s / n
    cov = (G - np.outer(s, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = []
    for idx in order[:2]:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    centered = F.zip_with(
        F.col("embedding"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x.cast("double") - m,
    )
    proj = e.withColumn("c", centered)
    return proj.select(
        "vec_id",
        F.round(dot_with_literal("c", [float(x) for x in comps[0]]), 6).alias("pc1"),
        F.round(dot_with_literal("c", [float(x) for x in comps[1]]), 6).alias("pc2"),
    ).orderBy("vec_id")


_MAXSIM_NQ = 3       # query vectors: vec_id < 3
_MAXSIM_TOKENS = 8   # treat the 64-dim embedding as 8 token-vectors of 8 dims
_MAXSIM_DIM = 8
_MAXSIM_TOPK = 5


_MAXSIM_ORACLE = f"""
    WITH toks AS (
      SELECT vec_id, j,
             list_transform(
               embedding[j*{_MAXSIM_DIM}+1 : (j+1)*{_MAXSIM_DIM}],
               x -> x::DOUBLE)                                    AS tv
      FROM embeddings,
           LATERAL unnest(range(0, {_MAXSIM_TOKENS})) AS u(j)
    ),
    ntoks AS (
      SELECT vec_id, j, tv,
             sqrt(list_sum(list_transform(tv, x -> x * x))) AS nrm
      FROM toks
    ),
    tokmax AS (
      SELECT q.vec_id AS query_id, d.vec_id AS doc_id, q.j,
             max(round(
               list_sum(list_transform(range(1, {_MAXSIM_DIM} + 1),
                        i -> q.tv[i] * d.tv[i])) / (q.nrm * d.nrm),
               6)) AS best
      FROM ntoks q JOIN ntoks d
        ON q.vec_id < {_MAXSIM_NQ} AND d.vec_id >= {_MAXSIM_NQ}
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT query_id, doc_id,
             CAST(sum(CAST(best AS DECIMAL(18, 6))) AS DOUBLE) AS score
      FROM tokmax GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS rk
      FROM scored
    )
    SELECT query_id, doc_id, score, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_MAXSIM_TOPK}
"""


@register(
    "q_sim_maxsim",
    family="similarity",
    oracle=_MAXSIM_ORACLE,
    doc="ColBERT-style late-interaction retrieval (Khattab & Zaharia "
    "2020): query and document are BAGS of token vectors (the 64-dim "
    "embedding sliced into 8x8 here; real corpora store "
    "array<array<float>>), and score(q,d) = sum over query tokens of "
    "the max cosine against any doc token — MaxSim. Fully relational: "
    "token vectors are exploded to rows, the 3-query token side "
    "(nq x 8 = 24 rows) broadcasts into the doc-token stream, max per "
    "(query, doc, qtoken) then sum per (query, doc) are ordinary "
    "hash aggregations with map-side partials, and top-k rides a "
    "per-query window. Per-token cosines round to 6 before the "
    "DECIMAL sum, so the score — and therefore the top-k cut — is "
    "exact cross-engine (registry float rules). Scale: the doc-token "
    "side never shuffles full vectors more than once (explode is "
    "map-side); candidate generation at 100 TB precedes this with "
    "q_sim_ann_lsh / q_sim_topk_ivf so MaxSim only rescores a "
    "bounded candidate set per query — exactly ColBERT's "
    "retrieve-then-rescore split.",
)
def q_sim_maxsim(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    tok = e.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_MAXSIM_TOKENS - 1)),
                lambda j: F.slice("v", j * _MAXSIM_DIM + 1, _MAXSIM_DIM),
            )
        ).alias("j", "tv"),
    ).withColumn(
        "nrm",
        F.sqrt(F.aggregate("tv", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    q = tok.filter(F.col("vec_id") < _MAXSIM_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("j").alias("qj"),
        F.col("tv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    d = tok.filter(F.col("vec_id") >= _MAXSIM_NQ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("tv").alias("dv"),
        F.col("nrm").alias("dn"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with("qv", "dv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("qn") * F.col("dn")),
        6,
    )
    tokmax = (
        d.join(F.broadcast(q))
        .groupBy("query_id", "doc_id", "qj")
        .agg(F.max(cos).alias("best"))
    )
    scored = tokmax.groupBy("query_id", "doc_id").agg(
        F.sum(F.col("best").cast("decimal(18,6)")).cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _MAXSIM_TOPK)
        .select("query_id", "doc_id", "score", "rk")
    )


_RERANK_NPROBES = 8
_RERANK_TOPK = 3
_RERANK_SLICES = 4  # sign bits -> 2^4 coarse buckets


def _sign_bucket(col_name: str):
    """4-bit coarse signature: sign of each 16-dim slice sum.

    A deterministic, data-independent coarse quantizer (the spirit of
    IVF cell assignment without a trained codebook): both engines
    compute the identical left-to-right double fold per slice, so
    bucket ids match bitwise and the candidate sets are provably equal
    — which is what makes the two-stage pipeline hash-checkable end to
    end, unlike recall-based ANN."""
    bits = []
    for i in range(_RERANK_SLICES):
        s = F.aggregate(
            F.slice(F.col(col_name), i * 16 + 1, 16),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double"),
        )
        bits.append(F.when(s >= 0, F.lit(2 ** i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


@register(
    "q_sim_rerank",
    family="similarity",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             (CASE WHEN list_sum(list_transform(embedding[1:16],
                    x -> x::DOUBLE)) >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[17:32],
                    x -> x::DOUBLE)) >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[33:48],
                    x -> x::DOUBLE)) >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[49:64],
                    x -> x::DOUBLE)) >= 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    cand AS (
      SELECT p.vec_id AS probe_id, c.vec_id, p.bucket,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)))),
               5) AS cos_sim
      FROM sig p JOIN sig c
        ON p.bucket = c.bucket AND c.vec_id >= {_RERANK_NPROBES}
      WHERE p.vec_id < {_RERANK_NPROBES}
    )
    SELECT probe_id, vec_id, bucket, cos_sim, rnk
    FROM (
      SELECT probe_id, vec_id, bucket, cos_sim,
             row_number() OVER (
               PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id
             ) AS rnk
      FROM cand
    )
    WHERE rnk <= {_RERANK_TOPK}
    ORDER BY probe_id, rnk
    """,
    doc="Two-stage retrieval (the r6-verdict rerank debut): a coarse "
    "deterministic quantizer prunes the corpus, then an EXACT cosine "
    "reranks only the survivors — the retrieve-then-rerank shape of "
    "every production vector pipeline (IVF probe / cross-encoder "
    "rescore). Stage 1 assigns each vector a 4-bit signature (sign of "
    "each 16-dim slice sum, a data-independent IVF-cell stand-in: "
    "identical double fold both engines, so candidate sets match "
    "bitwise and the WHOLE pipeline is hash-checkable, unlike "
    "recall<1 ANN which can only be rows-only-checked). Stage 2 "
    "computes oracle-form cosine dot/(|a||b|) rounded to 5 only for "
    "same-bucket pairs — ~1/16 of the probes x corpus rectangle — and "
    "takes top-3 per probe under a (cos desc, vec_id) total order. "
    "Scale: the signature is one map-side pass; candidates ride one "
    "equi-join on the bucket key (probes broadcast); the rerank is "
    "per-pair JVM fold here because the bucket bounds candidates — a "
    "hot bucket swaps in the knn_join GEMM kernel unchanged. "
    "Ref: docs/design.md query surface; no reference counterpart — "
    "LLM-pipeline tier.",
)
def q_sim_rerank(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _sign_bucket("embedding").alias("bucket")
    )
    probes = e.filter(F.col("vec_id") < _RERANK_NPROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p"),
        "bucket",
    )
    corpus = e.filter(F.col("vec_id") >= _RERANK_NPROBES)
    cand = corpus.join(F.broadcast(probes), "bucket").select(
        "probe_id",
        "vec_id",
        "bucket",
        F.round(cosine("p", "embedding"), 5).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RERANK_TOPK)
        .select("probe_id", "vec_id", "bucket", "cos_sim", "rnk")
        .orderBy("probe_id", "rnk")
    )


@register(
    "q_embed_anisotropy",
    family="similarity",
    oracle="""
    WITH cn AS (
      SELECT label, i,
             CAST(sum(CAST(round(embedding[i]::DOUBLE * 1e7) AS BIGINT))
               AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS n
      FROM embeddings, range(1, 65) AS t(i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, min(n) AS n,
             list(CAST(q AS DOUBLE) / 1e7 / n ORDER BY i) AS c
      FROM cn GROUP BY label
    ),
    per_row AS (
      SELECT e.label, cent.n,
             list_sum(list_transform(range(1, 65),
                      i -> e.embedding[i]::DOUBLE * c[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65),
                      i -> c[i] * c[i])))) AS cos_c,
             sqrt(list_sum(list_transform(range(1, 65),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
               AS nrm
      FROM embeddings e JOIN cent ON cent.label = e.label
    )
    SELECT label, CAST(min(n) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(nrm * 1e9) AS BIGINT)) AS DOUBLE)
                 / 1e9 / min(n), 6) AS mean_norm,
           round(CAST(sum(CAST(round(cos_c * 1e9) AS BIGINT)) AS DOUBLE)
                 / 1e9 / min(n), 6) AS mean_cos_centroid
    FROM per_row GROUP BY label ORDER BY label
    """,
    doc="Embedding-health / anisotropy audit per label: mean vector "
    "norm and mean cosine to the label centroid — the two numbers "
    "that catch a degenerate embedding space before training wastes a "
    "cluster on it (anisotropic spaces have mean-cos near 1: all "
    "vectors point the same way, so cosine retrieval collapses; "
    "Ethayarajh 2019's contextual-anisotropy readout). Exactness: "
    "centroid components come from 1e-7-quantized exact component "
    "sums (order-independent); per-row cosine/norm are sequential "
    "64-term folds (bitwise both engines — the q_sim_topk "
    "convention); per-label means ride 1e-9-quantized per-row terms. "
    "Scale: one posexplode-shaped component rollup (64 longs per "
    "vector, map-side combinable), centroids broadcast back (k "
    "labels x 64 doubles), one combinable final agg — the corpus is "
    "scanned twice, shuffled never (label rollups are tiny). Ref: no "
    "reference counterpart — embedding-quality tier.",
)
def q_embed_anisotropy(spark, sf_dir):
    from ..functions.vector import dot, norm

    e = t(spark, sf_dir, "embeddings")
    cn = (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("x").cast("double") * 1e7).cast("long"))
            .cast("long")
            .alias("q"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cent = cn.groupBy("label").agg(
        F.min("n").alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        (F.col("q").cast("double") / 1e7 / F.col("n")).alias("v"),
                    )
                )
            ),
            lambda s: s.v,
        ).alias("c"),
    )
    per_row = e.join(F.broadcast(cent), "label").select(
        "label",
        "n",
        (dot("embedding", "c") / (norm("embedding") * norm("c"))).alias("cos_c"),
        norm("embedding").alias("nrm"),
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.min("n").cast("long").alias("n"),
            F.round(
                F.sum(F.round(F.col("nrm") * 1e9).cast("long")).cast("double")
                / 1e9
                / F.min("n"),
                6,
            ).alias("mean_norm"),
            F.round(
                F.sum(F.round(F.col("cos_c") * 1e9).cast("long")).cast("double")
                / 1e9
                / F.min("n"),
                6,
            ).alias("mean_cos_centroid"),
        )
        .orderBy("label")
    )


_OUT_TOPK = 5  # outliers reported per label


@register(
    "q_embed_outliers",
    family="similarity",
    oracle=f"""
    WITH cn AS (
      SELECT label, i,
             CAST(sum(CAST(round(embedding[i]::DOUBLE * 1e7) AS BIGINT))
               AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS n
      FROM embeddings, range(1, 65) AS t(i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, list(CAST(q AS DOUBLE) / 1e7 / n ORDER BY i) AS c
      FROM cn GROUP BY label
    ),
    d AS (
      SELECT e.label, e.vec_id,
             list_sum(list_transform(range(1, 65),
                      i -> (e.embedding[i]::DOUBLE - c[i])
                         * (e.embedding[i]::DOUBLE - c[i]))) AS d2
      FROM embeddings e JOIN cent ON cent.label = e.label
    ),
    ranked AS (
      SELECT label, vec_id, d2,
             row_number() OVER (PARTITION BY label
                                ORDER BY d2 DESC, vec_id) AS rn
      FROM d
    )
    SELECT label, CAST(rn AS BIGINT) AS rn, vec_id,
           round(sqrt(d2), 6) AS dist
    FROM ranked WHERE rn <= {_OUT_TOPK}
    ORDER BY label, rn
    """,
    doc="Embedding outlier mining: per label, the top-5 vectors "
    "farthest (euclidean) from their label centroid — the standard "
    "mislabeled-example / contamination sweep run before training on "
    "labeled embeddings (far-from-centroid points are label noise or "
    "novel modes; the data-cleaning companion to "
    "q_embed_anisotropy's aggregate health readout). Exactness: "
    "centroids from the same 1e-7-quantized exact component sums; "
    "per-row squared distance is a sequential 64-term fold (bitwise "
    "both engines); ranking carries a (d2 DESC, vec_id) total order. "
    "Scale: centroid table broadcasts back; the per-label rank is one "
    "shuffle on label with Spark's WindowGroupLimit forwarding only "
    "k rows per map task — the corpus never sorts globally. Ref: no "
    "reference counterpart — embedding-quality tier.",
)
def q_embed_outliers(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    cn = (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("x").cast("double") * 1e7).cast("long"))
            .cast("long")
            .alias("q"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cent = cn.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        (F.col("q").cast("double") / 1e7 / F.col("n")).alias("v"),
                    )
                )
            ),
            lambda s: s.v,
        ).alias("c"),
    )
    diffs = F.zip_with(
        "embedding",
        "c",
        lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc),
    )
    d2 = F.aggregate(diffs, F.lit(0.0).cast("double"), lambda acc, p: acc + p)
    d = e.join(F.broadcast(cent), "label").select(
        "label", "vec_id", d2.alias("d2")
    )
    w = Window.partitionBy("label").orderBy(F.col("d2").desc(), "vec_id")
    return (
        d.select("label", "vec_id", "d2", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _OUT_TOPK)
        .select(
            "label",
            F.col("rn").cast("long").alias("rn"),
            "vec_id",
            F.round(F.sqrt("d2"), 6).alias("dist"),
        )
        .orderBy("label", "rn")
    )


_COSH_STRIDE = 37  # deterministic pair sample: (id, id + stride)


@register(
    "q_sim_cos_histogram",
    family="similarity",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id,
             list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65),
                      i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
               AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON b.vec_id = a.vec_id + {_COSH_STRIDE}
    ),
    b AS (
      SELECT CAST(floor(cos_sim * 10) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tp FROM b)
    SELECT bucket, round(bucket / 10.0, 1) AS lo_edge, n_pairs,
           round(CAST(n_pairs AS DOUBLE) / t.tp, 6) AS share
    FROM b CROSS JOIN tot t ORDER BY bucket
    """,
    doc="Pairwise-cosine distribution histogram over a deterministic "
    "stride-pair sample (each vector vs vec_id+37): the "
    "embedding-geometry diagnostic that catches collapse (mass near "
    "1.0), hubness (heavy right tail) or dead features (mass at 0) — "
    "the distributional companion to q_embed_anisotropy's centroid "
    "readout, and the calibration curve that picks thresholds for "
    "q_dedup_embedding / q_sim_range_search. Exactness: the stride "
    "pair sample is a pure function of ids (no RNG); per-pair cosine "
    "is the sequential-fold oracle form (bitwise); bucket = "
    "floor(cos*10) on identical floats; counts exact, one share "
    "division. Scale: ONE self-equi-join on vec_id (co-partitioned, "
    "1:1 — never a cross product), then a <=21-bucket rollup; sample "
    "density tunes with the stride at no plan change. Ref: no "
    "reference counterpart — embedding-quality tier.",
)
def q_sim_cos_histogram(spark, sf_dir):
    from ..functions.vector import dot, norm

    e = t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = e.select(
        (F.col("vec_id") - _COSH_STRIDE).alias("ida"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, "ida").select(
        (dot("va", "vb") / (norm("va") * norm("vb"))).alias("cos_sim")
    )
    buckets = pairs.groupBy(
        F.floor(F.col("cos_sim") * 10).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    tot = buckets.agg(F.sum("n_pairs").cast("long").alias("tp"))
    return (
        buckets.join(F.broadcast(tot))
        .select(
            "bucket",
            F.round(F.col("bucket") / 10.0, 1).alias("lo_edge"),
            "n_pairs",
            F.round(F.col("n_pairs").cast("double") / F.col("tp"), 6).alias(
                "share"
            ),
        )
        .orderBy("bucket")
    )


_RAK_PROBE_MOD = 50  # vec_id % 50 == 0 → deterministic probe sample
_RAK_K = 10
_RAK_BITS = 8


@register(
    "q_sim_recall_at_k",
    family="similarity",
    oracle=f"""
    WITH codes AS (
      -- 8-bit sign-LSH: bit j = (embedding · hyperplane_j >= 0), with
      -- hyperplane_j[i] = sin((j*131 + i) * 0.7) — deterministic
      -- pseudo-random planes from pure arithmetic, identical both
      -- engines (no RNG, no engine hash)
      SELECT vec_id,
             CAST(sum(CASE WHEN d >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT)
               AS code
      FROM (
        SELECT e.vec_id, j,
               list_sum(list_transform(range(1, 65),
                 i -> e.embedding[i]::DOUBLE * sin((j*131 + i - 1) * 0.7)))
                 AS d
        FROM embeddings e CROSS JOIN range(0, {_RAK_BITS}) AS t(j)
      ) GROUP BY vec_id
    ),
    probes AS (
      SELECT e.vec_id AS pid, e.embedding AS pe, c.code AS pcode
      FROM embeddings e JOIN codes c ON c.vec_id = e.vec_id
      -- the vec_id cap bounds the probe SAMPLE (<=256 probes) so the
      -- brute-force side stays O(corpus x 256) — linear — at any
      -- scale; at fixture scale (max vec_id 2000) it excludes nothing
      WHERE e.vec_id % {_RAK_PROBE_MOD} = 0
        AND e.vec_id < {_RAK_PROBE_MOD} * 256
    ),
    scored AS (
      SELECT p.pid, p.pcode, e.vec_id AS cid, c.code AS ccode,
             list_sum(list_transform(range(1, 65),
               i -> p.pe[i]::DOUBLE * e.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> p.pe[i]::DOUBLE * p.pe[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65),
                 i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))))
               AS cos_sim
      FROM probes p
      JOIN embeddings e ON e.vec_id <> p.pid
      JOIN codes c ON c.vec_id = e.vec_id
    ),
    topk AS (
      SELECT pid, pcode, cid, ccode,
             row_number() OVER (PARTITION BY pid
                                ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    ),
    hits AS (
      SELECT pid,
             CAST(count(*) FILTER (ccode = pcode) AS BIGINT) AS n_hits
      FROM topk WHERE rn <= {_RAK_K} GROUP BY pid
    ),
    cands AS (
      SELECT p.pid, CAST(count(*) AS BIGINT) AS n_cand
      FROM probes p JOIN codes c
        ON c.code = p.pcode AND c.vec_id <> p.pid
      GROUP BY p.pid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST({_RAK_K} AS BIGINT) AS k,
           round(CAST(sum(coalesce(c.n_cand, 0)) AS DOUBLE) / count(*), 6)
             + 0.0 AS avg_candidates,
           round(CAST(sum(h.n_hits) AS DOUBLE)
                 / ({_RAK_K} * count(*)), 6) + 0.0 AS recall_at_k
    FROM hits h LEFT JOIN cands c ON c.pid = h.pid
    """,
    doc=f"Recall@{_RAK_K} metering of a sign-LSH ANN index against "
    "exact brute-force cosine — the query every similarity-search "
    "deployment runs before trusting its index: what fraction of the "
    "TRUE top-k lands in the probe's LSH bucket, and what the "
    "candidate-set size (≈ query cost) is. The "
    f"{_RAK_BITS}-hyperplane code uses deterministic sin-derived "
    "planes (pure arithmetic — identical both engines, unlike "
    "q_sim_ann_lsh's engine-hash banding which is rows-only), so "
    "THIS quality metric is fully oracle-checked. Exactness: hit and "
    "candidate counts are exact ints (recall = one division); cosine "
    "is the sequential-fold oracle form; plane-sign and ranking ulp "
    "risk is measure-zero (documented binning stance). Scale: the "
    f"brute-force side is probes×corpus with a FIXED probe sample "
    "(recall metering always brute-forces a sample — the corpus side "
    "stays a single scan joined to a broadcast probe set); the code "
    "table is one map pass. Ref: no reference counterpart — "
    "similarity tier.",
)
def q_sim_recall_at_k(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    planes = e.select(
        "vec_id",
        "embedding",
        F.explode(F.expr(f"sequence(0, {_RAK_BITS - 1})")).alias("j"),
    )
    d_expr = F.expr(
        "aggregate(zip_with(embedding, transform(sequence(0, 63),"
        " i -> sin((j*131 + i) * 0.7)),"
        " (x, h) -> CAST(x AS DOUBLE) * h),"
        " CAST(0.0 AS DOUBLE), (a, p) -> a + p)"
    )
    codes = (
        planes.select(
            "vec_id",
            F.when(d_expr >= 0, F.expr("shiftleft(1L, CAST(j AS INT))"))
            .otherwise(F.lit(0)).alias("bit"),
        )
        .groupBy("vec_id")
        .agg(F.sum("bit").cast("long").alias("code"))
    )
    codes = codes.localCheckpoint(eager=False)  # probes/cands/scored share it
    probes = (
        e.filter(
            (F.col("vec_id") % _RAK_PROBE_MOD == 0)
            # bounded probe sample: <=256 probes at ANY corpus size, so
            # the brute-force side is O(corpus x 256), never quadratic
            & (F.col("vec_id") < _RAK_PROBE_MOD * 256)
        )
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("pid"),
            F.col("embedding").alias("pe"),
            F.col("code").alias("pcode"),
        )
    )
    from ..functions.vector import dot, norm

    # a highly-compressed corpus file can scan as 1-2 partitions (size-
    # based splitting never sees the decompressed row count), which
    # would serialize the expensive cosine map below. Repartition ONLY
    # when the scan is under-parallel — a metadata check, so at real
    # scale (many files) no shuffle is added.
    par = spark.sparkContext.defaultParallelism
    corpus = e if e.rdd.getNumPartitions() >= par else e.repartition(par)
    scored = (
        corpus.join(codes, "vec_id")
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "pcode",
            F.col("vec_id").alias("cid"),
            F.col("code").alias("ccode"),
            (dot("pe", "embedding") / (norm("pe") * norm("embedding"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("pid").orderBy(F.desc("cos_sim"), "cid")
    topk = scored.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= _RAK_K
    )
    hits = topk.groupBy("pid").agg(
        F.sum(F.when(F.col("ccode") == F.col("pcode"), 1).otherwise(0))
        .cast("long").alias("n_hits")
    )
    cands = (
        probes.join(
            codes,
            (codes.code == probes.pcode) & (codes.vec_id != probes.pid),
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    )
    return (
        hits.join(cands, "pid", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.lit(_RAK_K).cast("long").alias("k"),
            (
                F.round(
                    F.sum(F.coalesce(F.col("n_cand"), F.lit(0))).cast("double")
                    / F.count(F.lit(1)),
                    6,
                )
                + 0.0
            ).alias("avg_candidates"),
            (
                F.round(
                    F.sum("n_hits").cast("double")
                    / (_RAK_K * F.count(F.lit(1))),
                    6,
                )
                + 0.0
            ).alias("recall_at_k"),
        )
    )


# Cross-encoder rescoring stage (r9, VERDICT r8 task #5 backlog): the
# third retrieval stage behind q_sim_rerank's candidates. The "model"
# here is a deterministic pair-interaction kernel — mean over dims of
# g(4 q_i d_i) with the ALGEBRAIC sigmoid g(x) = x / (1 + |x|) — chosen
# because (a) it is a true cross feature (not expressible as any
# dot(q, d), which is the whole point of a cross-encoder stage) and
# (b) it is pure rational IEEE arithmetic: div/abs/add are exactly
# rounded, so the identical fold is BITWISE equal on both engines
# (tanh/exp would carry JVM-vs-libm 1-ulp risk — registry trap 5). A
# real learned cross-encoder slots into the same candidate-bounded
# stage as an Arrow-batched mapInPandas over (probe, candidate) pairs.
_CE_CANDS = 8   # stage-2 bi-encoder candidates per probe
_CE_TOPK = 3    # final results per probe after rescoring
_CE_GAIN = 4.0  # interaction gain before the sigmoid


@register(
    "q_sim_rerank_ce",
    family="similarity",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             (CASE WHEN list_sum(list_transform(embedding[1:16],
                    x -> x::DOUBLE)) >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[17:32],
                    x -> x::DOUBLE)) >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[33:48],
                    x -> x::DOUBLE)) >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN list_sum(list_transform(embedding[49:64],
                    x -> x::DOUBLE)) >= 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    cand AS (
      SELECT p.vec_id AS probe_id, c.vec_id,
             p.embedding AS pv, c.embedding AS cv,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)))),
               5) AS cos_sim
      FROM sig p JOIN sig c
        ON p.bucket = c.bucket AND c.vec_id >= {_RERANK_NPROBES}
      WHERE p.vec_id < {_RERANK_NPROBES}
    ),
    shortlist AS (
      SELECT probe_id, vec_id, pv, cv, cos_sim FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS r
        FROM cand
      ) WHERE r <= {_CE_CANDS}
    ),
    ce AS (
      SELECT probe_id, vec_id, cos_sim,
             round(list_sum(list_transform(range(1, 65),
                     i -> ({_CE_GAIN} * pv[i]::DOUBLE * cv[i]::DOUBLE)
                          / (1.0 + abs({_CE_GAIN} * pv[i]::DOUBLE
                                        * cv[i]::DOUBLE))))
                   / 64.0, 5) AS ce_score
      FROM shortlist
    )
    SELECT probe_id, vec_id, cos_sim, ce_score, rnk
    FROM (
      SELECT probe_id, vec_id, cos_sim, ce_score,
             row_number() OVER (
               PARTITION BY probe_id ORDER BY ce_score DESC, vec_id) AS rnk
      FROM ce
    )
    WHERE rnk <= {_CE_TOPK}
    ORDER BY probe_id, rnk
    """,
    doc="Three-stage retrieval: coarse signature buckets -> bi-encoder "
    f"cosine shortlist (top-{_CE_CANDS} per probe) -> CROSS-ENCODER "
    f"rescoring of only the shortlist -> top-{_CE_TOPK} — the "
    "retrieve-shortlist-rescore shape of every production search "
    "stack, extending q_sim_rerank by the stage where a pair model "
    "re-orders what the dot product got roughly right. The stand-in "
    "cross-encoder is a deterministic pair-interaction kernel "
    "(mean_i g(4 q_i d_i), g(x) = x/(1+|x|)) — a true cross feature "
    "no bi-encoder dot can express, in pure rational IEEE arithmetic "
    "so the identical fold is bitwise cross-engine (tanh/exp would "
    "carry the JVM-vs-libm 1-ulp trap); a learned model drops into "
    "the same candidate-bounded stage as an Arrow-batched "
    "mapInPandas over (probe, candidate) pairs without changing the "
    "plan. Scale: the expensive model runs on probes x "
    f"{_CE_CANDS} rows ONLY — the stage-1/2 funnel pays for it; "
    "both windows partition by probe id. Ref: no reference "
    "counterpart — LLM-pipeline tier.",
)
def q_sim_rerank_ce(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _sign_bucket("embedding").alias("bucket")
    )
    e = e.localCheckpoint(eager=False)  # probe + corpus sides read it
    probes = e.filter(F.col("vec_id") < _RERANK_NPROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        "bucket",
    )
    corpus = e.filter(F.col("vec_id") >= _RERANK_NPROBES)
    cand = corpus.join(F.broadcast(probes), "bucket").select(
        "probe_id",
        "vec_id",
        "pv",
        F.col("embedding").alias("cv"),
        F.round(cosine("pv", "embedding"), 5).alias("cos_sim"),
    )
    w1 = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "vec_id")
    shortlist = (
        cand.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= _CE_CANDS)
        .drop("r")
    )
    ce_fold = F.aggregate(
        F.zip_with(
            F.col("pv"),
            F.col("cv"),
            lambda x, y: (F.lit(_CE_GAIN) * x.cast("double") * y.cast("double"))
            / (1.0 + F.abs(F.lit(_CE_GAIN) * x.cast("double") * y.cast("double"))),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    ce = shortlist.select(
        "probe_id",
        "vec_id",
        "cos_sim",
        F.round(ce_fold / 64.0, 5).alias("ce_score"),
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("ce_score"), "vec_id")
    return (
        ce.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= _CE_TOPK)
        .select("probe_id", "vec_id", "cos_sim", "ce_score", "rnk")
        .orderBy("probe_id", "rnk")
    )


_MRL_PROBES = 8    # probe vectors (vec_id < this)
_MRL_TOPK = 10     # retrieval depth compared across dimensionalities
_MRL_DIMS = 32     # truncated prefix length (of 64)


@register(
    "q_embed_matryoshka",
    family="similarity",
    oracle=f"""
    WITH cand AS (
      SELECT p.vec_id AS probe_id, c.vec_id,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, 65),
                        i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)))),
               6) AS cos_full,
             round(
               list_sum(list_transform(range(1, {_MRL_DIMS} + 1),
                        i -> c.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(range(1, {_MRL_DIMS} + 1),
                        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(range(1, {_MRL_DIMS} + 1),
                        i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)))),
               6) AS cos_trunc
      FROM embeddings p JOIN embeddings c ON c.vec_id >= {_MRL_PROBES}
      WHERE p.vec_id < {_MRL_PROBES}
    ),
    rk AS (
      SELECT probe_id, vec_id,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_full DESC, vec_id) AS rf,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_trunc DESC, vec_id) AS rt
      FROM cand
    )
    SELECT probe_id,
           round(CAST(sum(CASE WHEN rf <= {_MRL_TOPK} AND rt <= {_MRL_TOPK}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / {_MRL_TOPK}, 6) + 0.0 AS overlap_at_{_MRL_TOPK},
           CAST(max(CASE WHEN rf = 1 AND rt <= {_MRL_TOPK} THEN 1 ELSE 0 END)
                AS BOOLEAN) AS top1_kept
    FROM rk GROUP BY probe_id ORDER BY probe_id
    """,
    doc="Matryoshka dimension-ablation audit: for each probe, the "
    f"overlap@{_MRL_TOPK} between exact retrieval under the FULL "
    f"64-dim cosine and under the first-{_MRL_DIMS}-dims truncation — "
    "the measurement behind the store-half-the-vector decision "
    "(Kusupati et al.'s MRL evaluation): high overlap means the "
    "prefix dims carry the ranking and the index can shrink 2x; also "
    "flags whether the full top-1 survives truncated top-k (the "
    "rerank-funnel safety property q_sim_rerank_ce relies on). Both "
    "rankings are exact brute force over the corpus (probes "
    "broadcast, sequential double folds — bitwise cross-engine) "
    "under (cos DESC, vec_id) total orders. Scale: probes x corpus "
    "map work; both rank windows partition by probe; overlap is a "
    "per-probe conditional count. Ref: no reference counterpart — "
    "LLM-pipeline tier.",
)
def q_embed_matryoshka(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = e.localCheckpoint(eager=False)  # probe + corpus sides read it
    probes = e.filter(F.col("vec_id") < _MRL_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
    )
    corpus = e.filter(F.col("vec_id") >= _MRL_PROBES)

    def cos_over(pref):
        a = F.slice(F.col("pv"), 1, pref)
        b = F.slice(F.col("embedding"), 1, pref)
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )
        nb = F.sqrt(
            F.aggregate(
                b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )
        return F.round(dot / (na * nb), 6)

    cand = corpus.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        cos_over(64).alias("cos_full"),
        cos_over(_MRL_DIMS).alias("cos_trunc"),
    )
    wf = Window.partitionBy("probe_id").orderBy(F.desc("cos_full"), "vec_id")
    wt = Window.partitionBy("probe_id").orderBy(F.desc("cos_trunc"), "vec_id")
    rk = cand.select(
        "probe_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    return (
        rk.groupBy("probe_id")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(
                            (F.col("rf") <= _MRL_TOPK) & (F.col("rt") <= _MRL_TOPK),
                            1,
                        ).otherwise(0)
                    ).cast("double")
                    / _MRL_TOPK,
                    6,
                )
                + 0.0
            ).alias(f"overlap_at_{_MRL_TOPK}"),
            F.max(
                F.when(
                    (F.col("rf") == 1) & (F.col("rt") <= _MRL_TOPK), 1
                ).otherwise(0)
            ).cast("boolean").alias("top1_kept"),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# Round-10 wave 13: embedding centroid drift across a deterministic split.
# ---------------------------------------------------------------------------

_CD_Q = 10_000_000  # per-dim quantizer (the _NCC_Q precedent: f32 fits 1e7)
_CD_TRAIN_PCT = 50  # md5 half/half split — symmetric drift read


@register(
    "q_embed_centroid_drift",
    family="similarity",
    oracle=f"""
    WITH sp AS (
      SELECT vec_id, label, embedding,
             CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))
                  AS BIGINT) % 100 < {_CD_TRAIN_PCT} AS in_a
      FROM embeddings
    ),
    dims AS (
      SELECT sp.label, sp.in_a, i.i AS d,
             CAST(round(sp.embedding[i.i]::DOUBLE * {_CD_Q}, 0) AS BIGINT)
               AS q
      FROM sp CROSS JOIN range(1, 65) i(i)
    ),
    sums AS (
      SELECT label, d,
             CAST(sum(CASE WHEN in_a THEN q ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE q END) AS BIGINT) AS sb
      FROM dims GROUP BY label, d
    ),
    ns AS (
      SELECT label,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
      FROM sp GROUP BY label
    ),
    cos_ AS (
      SELECT label,
             CAST(sum(CAST(sa AS HUGEINT) * sb) AS DOUBLE)
               / (sqrt(CAST(sum(CAST(sa AS HUGEINT) * sa) AS DOUBLE))
                * sqrt(CAST(sum(CAST(sb AS HUGEINT) * sb) AS DOUBLE)))
               AS c
      FROM sums GROUP BY label
    )
    SELECT ns.label, ns.na AS n_a, ns.nb AS n_b,
           round(cos_.c, 6) + 0.0 AS centroid_cos,
           round(1.0 - cos_.c, 6) + 0.0 AS drift
    FROM ns JOIN cos_ ON cos_.label = ns.label
    ORDER BY ns.label
    """,
    doc="Per-label embedding centroid drift across a deterministic md5 "
    "half/half split of the corpus: cosine between the two halves' "
    "label centroids — near 1 means the label's embedding mass is "
    "stable under resampling; a low cosine flags a label whose "
    "representation depends on WHICH half you look at (ingest drift, "
    "mixed subpopulations) — the embedding-space drift monitor "
    "beside q_ml_psi's score-space one. The mean normalizations "
    "CANCEL inside the cosine (cos(mean_a, mean_b) = cos(sum_a, "
    "sum_b)), so the whole statistic reduces to three HUGEINT "
    "dot-products of exact 1e7-quantized per-dim sums — no float "
    "mean, no division until the final expression. Scale: one "
    "64-way dim explode into a combinable (label, dim) rollup "
    "(constant-size after the map side); k-row tail. Ref: no "
    "reference counterpart — embedding tier.",
)
def q_embed_centroid_drift(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    in_a = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
        < _CD_TRAIN_PCT
    )
    sp = e.select("vec_id", "label", "embedding", in_a.alias("in_a"))
    sp = sp.localCheckpoint(eager=False)  # dims + ns read it
    dims = sp.select(
        "label",
        "in_a",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda v: F.round(v.cast("double") * _CD_Q, 0).cast("long"),
            )
        ).alias("d0", "q"),
    ).select("label", "in_a", (F.col("d0") + 1).alias("d"), "q")
    sums = dims.groupBy("label", "d").agg(
        F.sum(F.when(F.col("in_a"), F.col("q")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("in_a"), F.lit(0)).otherwise(F.col("q")))
        .cast("long")
        .alias("sb"),
    )
    ns = sp.groupBy("label").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("n_b"),
    )
    dec = "decimal(38,0)"
    cos_ = sums.groupBy("label").agg(
        (
            F.sum(F.col("sa").cast(dec) * F.col("sb")).cast("double")
            / (
                F.sqrt(F.sum(F.col("sa").cast(dec) * F.col("sa")).cast("double"))
                * F.sqrt(F.sum(F.col("sb").cast(dec) * F.col("sb")).cast("double"))
            )
        ).alias("c")
    )
    return (
        ns.join(cos_, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            (F.round("c", 6) + 0.0).alias("centroid_cos"),
            (F.round(1.0 - F.col("c"), 6) + 0.0).alias("drift"),
        )
        .orderBy("label")
    )
