"""Vector math as JVM-side column expressions (no Python UDFs).

Dot products / cosine similarity over array<float> columns via
zip_with + aggregate — stays inside whole-stage codegen, so similarity
scans vectorize across a 100 TB embedding corpus without Arrow
round-trips. Elements are cast to double before multiplying so Spark
and the DuckDB oracle do identical FP math.
"""

from __future__ import annotations

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


def pairwise_cosine_gemm(
    df,
    id_col: str,
    vec_col: str,
    threshold: float,
    label_col: str | None = None,
):
    """All-pairs cosine >= threshold via Arrow-batched block GEMM.

    Per-pair array expressions (zip_with+aggregate) cost ~30x more than
    one BLAS matmul per Arrow batch — this is the documented exception
    to "stay JVM-side": the work is dense linear algebra, so each
    executor computes `A_chunk @ B.T` with numpy against a broadcast
    (ids, matrix) pair. Emits (id_a, id_b[, label], cos_sim) with
    id_a < id_b, cos_sim rounded to 6 — the same contract as the
    expression form, hash-identical to the DuckDB oracle.

    Scale: the broadcast side must fit per executor (1M x 64 f64 =
    ~0.5 GB); beyond that, block first (IVF/LSH buckets or label
    blocking via label_col) — which is also what keeps the output
    pair count sane. This mirrors how vector engines brute-force
    within a cell.
    """
    spark = df.sparkSession
    import numpy as np

    cols = [id_col, vec_col] + ([label_col] if label_col else [])
    pdf_all = df.select(*cols).toPandas()
    ids_all = pdf_all[id_col].to_numpy()
    m = np.array(pdf_all[vec_col].tolist(), dtype=np.float64)
    norms_all = np.sqrt((m * m).sum(axis=1))
    labels_all = pdf_all[label_col].to_numpy() if label_col else None
    bc = spark.sparkContext.broadcast((ids_all, m, norms_all, labels_all))

    out_schema = f"id_a bigint, id_b bigint{', label int' if label_col else ''}, cos_sim double"
    thr = float(threshold)
    vcol, icol, lcol = vec_col, id_col, label_col

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids_b, mat_b, norms_b, labels_b = bc.value
        for pdf in batches:
            a = np.array(pdf[vcol].tolist(), dtype=np.float64)
            if len(a) == 0:
                continue
            a_ids = pdf[icol].to_numpy()
            a_norms = np.sqrt((a * a).sum(axis=1))
            a_labels = pdf[lcol].to_numpy() if labels_b is not None else None
            # block the matmul so the sims slab stays ~512*|corpus|*8B
            for s in range(0, len(a), 512):
                e = min(s + 512, len(a))
                # oracle form: dot / (|a| * |b|), then round, then filter
                sims = np.round(
                    (a[s:e] @ mat_b.T)
                    / (a_norms[s:e, None] * norms_b[None, :]),
                    6,
                )
                mask = (sims >= thr) & (ids_b[None, :] > a_ids[s:e, None])
                if labels_b is not None:
                    mask &= labels_b[None, :] == a_labels[s:e, None]
                ii, jj = np.nonzero(mask)
                if len(ii) == 0:
                    continue
                out = {"id_a": a_ids[s + ii], "id_b": ids_b[jj]}
                if labels_b is not None:
                    out["label"] = a_labels[s + ii]
                out["cos_sim"] = sims[ii, jj]
                yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(gen, out_schema)


def dot_with_literal(a: Column | str, probe: list[float]) -> Column:
    """Dot product against a driver-side constant probe vector.

    The probe folds into the plan as a literal array — broadcast by
    value, no join needed.
    """
    lit_vec = F.array(*[F.lit(float(x)).cast("double") for x in probe])
    prods = F.zip_with(a, lit_vec, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, p: acc + p)
