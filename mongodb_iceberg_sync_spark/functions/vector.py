"""Vector math as JVM-side column expressions (no Python UDFs).

Dot products / cosine similarity over array<float> columns via
zip_with + aggregate — stays inside whole-stage codegen, so similarity
scans vectorize across a 100 TB embedding corpus without Arrow
round-trips. Elements are cast to double before multiplying so Spark
and the DuckDB oracle do identical FP math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product of two float-array columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, p: acc + p)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_GEMM_SLAB_ROWS = 50_000  # ~25 MB per 64-dim float64 slab


def pairwise_cosine_gemm(
    df,
    id_col: str,
    vec_col: str,
    threshold: float,
    label_col: str | None = None,
    n_blocks: int | None = None,
):
    """All-pairs cosine >= threshold via distributed block GEMM.

    Per-pair array expressions (zip_with+aggregate) cost ~30x more than
    one BLAS matmul per block — this is the documented exception to
    "stay JVM-side": the work is dense linear algebra, so each GROUP
    (not the driver) computes `A @ B.T` with numpy inside
    `applyInPandas`. Nothing is collected to the driver and nothing is
    broadcast — the corpus only ever moves through one hash shuffle on
    the block key.

    Blocking strategies (both emit (id_a, id_b[, label], cos_sim) with
    id_a < id_b, cos_sim rounded to 6 — hash-identical to the DuckDB
    oracle):

    - `label_col` given: only same-label pairs are candidates, so the
      label IS the block key. One shuffle on label, one triangular GEMM
      per label group. Blocking happens BEFORE the shuffle — compute
      and output are both O(sum of block^2), never O(n^2).
    - no label (exact all-pairs): every unordered block pair (i, j),
      i <= j over `block = id % n_blocks` must meet. Each vector is
      replicated n_blocks times (one row per block-pair it belongs to)
      and each of the n_blocks*(n_blocks+1)/2 groups GEMMs its two
      slabs. Shuffle volume is O(n * n_blocks); per-group memory is
      O((n/n_blocks) * dim). n_blocks=None (the default) sizes the
      block count from the corpus so a slab never exceeds
      ~_GEMM_SLAB_ROWS rows — a FIXED count is a memory time bomb at
      scale (slabs grow linearly with n until a group OOMs an
      executor; caught by the r6 --distinct-vector 100x probe review).
      (Exact all-pairs is inherently O(n^2) compute; at 100 TB use the
      label/LSH/IVF blocked form instead.)
    """
    has_label = label_col is not None
    if not has_label and n_blocks is None:
        import math

        n_rows = df.count()
        n_blocks = max(8, math.ceil(n_rows / _GEMM_SLAB_ROWS))
    id_l = F.col(id_col).cast("long").alias("_pid")
    if has_label:
        tagged = df.select(
            F.col(label_col).cast("int").alias("_bi"),
            F.col(label_col).cast("int").alias("_bj"),
            id_l,
            F.col(vec_col).alias("_pvec"),
        )
        out_schema = "id_a bigint, id_b bigint, label int, cos_sim double"
    else:
        nb = int(n_blocks)
        blk = F.pmod(F.col(id_col).cast("long"), F.lit(nb)).cast("int")
        tagged = (
            df.select(id_l, F.col(vec_col).alias("_pvec"), blk.alias("_blk"))
            .withColumn("_other", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))
            .select(
                F.least("_blk", "_other").alias("_bi"),
                F.greatest("_blk", "_other").alias("_bj"),
                "_pid",
                "_pvec",
                "_blk",
            )
        )
        out_schema = "id_a bigint, id_b bigint, cos_sim double"
    thr = float(threshold)

    def gemm(key, pdf):
        import numpy as np
        import pandas as pd

        def empty():
            cols = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            if has_label:
                cols["label"] = pd.Series(dtype="int32")
            cols["cos_sim"] = pd.Series(dtype="float64")
            return pd.DataFrame(cols)

        ids = pdf["_pid"].to_numpy()
        m = np.array(pdf["_pvec"].tolist(), dtype=np.float64)
        if len(ids) == 0:
            return empty()
        norms = np.sqrt((m * m).sum(axis=1))
        bi, bj = int(key[0]), int(key[1])
        outs = []
        if has_label or bi == bj:
            # self block: strict upper triangle by id, tiled so the sims
            # slab stays ~512*|block|*8B
            for s in range(0, len(ids), 512):
                e = min(s + 512, len(ids))
                # oracle form: dot / (|a| * |b|), then round, then filter
                sims = np.round(
                    (m[s:e] @ m.T) / (norms[s:e, None] * norms[None, :]), 6
                )
                mask = (sims >= thr) & (ids[None, :] > ids[s:e, None])
                ii, jj = np.nonzero(mask)
                if len(ii) == 0:
                    continue
                out = {"id_a": ids[s + ii], "id_b": ids[jj]}
                if has_label:
                    out["label"] = np.full(len(ii), bi, dtype="int32")
                out["cos_sim"] = sims[ii, jj]
                outs.append(pd.DataFrame(out))
        else:
            # cross block: every (u in block bi, v in block bj) pair
            # appears in exactly this group — order output by id only
            side = pdf["_blk"].to_numpy()
            a_sel, b_sel = side == bi, side == bj
            a_ids, b_ids = ids[a_sel], ids[b_sel]
            a_m, b_m = m[a_sel], m[b_sel]
            a_n, b_n = norms[a_sel], norms[b_sel]
            if len(a_ids) == 0 or len(b_ids) == 0:
                return empty()
            for s in range(0, len(a_ids), 512):
                e = min(s + 512, len(a_ids))
                sims = np.round(
                    (a_m[s:e] @ b_m.T) / (a_n[s:e, None] * b_n[None, :]), 6
                )
                ii, jj = np.nonzero(sims >= thr)
                if len(ii) == 0:
                    continue
                u, v = a_ids[s + ii], b_ids[jj]
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(u, v),
                            "id_b": np.maximum(u, v),
                            "cos_sim": sims[ii, jj],
                        }
                    )
                )
        if not outs:
            return empty()
        return pd.concat(outs, ignore_index=True)

    return tagged.groupBy("_bi", "_bj").applyInPandas(gemm, out_schema)


def bucket_assign_udf(centroids: list[list[float]]):
    """Vectorized nearest-centroid (max-cosine) assignment: one numpy
    GEMM per Arrow batch against the k x d centroid matrix (captured by
    value — k·d floats, not a broadcast). 1-based bucket ids; ties break
    to the FIRST maximal centroid (np.argmax), cosines rounded to 9
    decimals for cross-run determinism. Same rationale as the pairwise
    GEMM: per-centroid HOF-expression cosines are interpreted per row
    (~30x slower than BLAS)."""
    C = np.array(centroids, dtype=np.float64)
    Cn = C / np.sqrt((C * C).sum(axis=1))[:, None]

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        A = np.array(v.tolist(), dtype=np.float64)
        if len(A) == 0:
            return pd.Series([], dtype="int32")
        An = A / np.sqrt((A * A).sum(axis=1))[:, None]
        sims = np.round(An @ Cn.T, 9)
        return pd.Series((np.argmax(sims, axis=1) + 1).astype("int32"))

    return assign


def kmeans_fit(
    df,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
) -> list[list[float]]:
    """Distributed Lloyd's k-means over an array<float> column (the IVF
    coarse quantizer's training step).

    Deterministic: init = the k vectors with the smallest ids (stable
    across runs), assignment = argmax cosine with first-max tie-break
    (bucket_assign_udf). Each iteration: one assignment scan (Arrow-
    batched GEMM) and a posexplode + groupBy(bucket, dim) + avg update
    whose result is only k*dim rows — the ONLY driver materialization is
    O(k·d), never O(n). At 100 TB you'd train on a sample; the operator
    shape is identical.
    """
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if not init_rows:  # empty input: no centroids (callers emit empty)
        return []
    centroids = [[float(x) for x in r[1]] for r in init_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        assign = bucket_assign_udf(centroids)
        assigned = df.select(
            assign(vec_col).alias("bucket"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
        )
        upd = (
            assigned.groupBy("bucket", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty buckets keep position
        acc: dict[int, list[float]] = {}
        for r in upd:
            acc.setdefault(int(r.bucket), [0.0] * dim)[int(r.pos)] = float(r.m)
        for b, vals in acc.items():
            new[b - 1] = vals  # bucket is 1-based
        centroids = new
    return centroids


def dot_with_literal(a: Column | str, probe: list[float]) -> Column:
    """Dot product against a driver-side constant probe vector.

    The probe folds into the plan as a literal array — broadcast by
    value, no join needed.
    """
    lit_vec = F.array(*[F.lit(float(x)).cast("double") for x in probe])
    prods = F.zip_with(a, lit_vec, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, p: acc + p)
