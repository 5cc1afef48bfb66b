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


def dot_with_literal(a: Column | str, probe: list[float]) -> Column:
    """Dot product against a driver-side constant probe vector.

    The probe folds into the plan as a literal array — broadcast by
    value, no join needed.
    """
    lit_vec = F.array(*[F.lit(float(x)).cast("double") for x in probe])
    prods = F.zip_with(a, lit_vec, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, p: acc + p)
