"""Document → typed-columns mapping (reference operators A4/A5/A6).

The reference maps BSON documents to Iceberg rows either by full-
document auto mapping under an inferred union schema (A5 —
MappingConfig mode=auto, docs/design.md:424-431) or by explicit
field mappings with dot-notation source paths, rename, and type
override (A4 — docs/design.md:213-230, FieldMapping.java:6). Type
conversion rules are A6 (docs/design.md:406-422): the JSON scalar set
maps directly, and BSON-specific types arriving as MongoDB Extended
JSON wrappers ({"$oid"}, {"$date"}, {"$numberDecimal"}, {"$binary"},
{"$uuid"}, {"$regularExpression"}, {"$numberInt"/"$numberLong"/
"$numberDouble"}, {"$minKey"/"$maxKey"}) parse physically as their
wrapper structs and unwrap to the reference's logical Iceberg types
(string / timestamp-UTC / decimal / binary / long / double / skipped).

Spark-first: one `from_json` under the inferred/declared schema (a
single JVM-side parse per row, vectorized), then plain column
expressions — projection, rename, cast. No Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .config import FieldMapping
from .schema_infer import (
    BINARY,
    DECIMAL,
    DOUBLE_WRAP,
    EXT_PRIMITIVES,
    LONG_WRAP,
    OBJECTID,
    REGEX,
    SAMPLE_SIZE_DEFAULT,
    SKIP,
    TS_ISO,
    TS_MS,
    UUID,
    infer_union_schema,
    to_physical_spark_type,
)

# reference-config.yaml:71-85 type override vocabulary (A4), extended
# with the full JSON scalar set (A6).
TYPE_OVERRIDES: dict[str, T.DataType | None] = {
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "decimal": T.DecimalType(38, 9),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "list": None,  # keep the inferred element type (no cast)
}


def sample_docs(docs_df: DataFrame, doc_col: str, n: int = SAMPLE_SIZE_DEFAULT) -> list[str]:
    """First-N sample for schema inference (reference samples 1000 docs,
    docs/design.md:426). Driver-side size is O(n) strings, bounded."""
    return [r[0] for r in docs_df.select(doc_col).limit(n).collect()]


def _has_ext(t) -> bool:
    """True if lattice type ``t`` contains any extended-JSON wrapper
    (or skipped field) anywhere — i.e. unwrapping would change it."""
    if isinstance(t, str) and t in EXT_PRIMITIVES:
        return True
    if isinstance(t, tuple):
        if t[0] == "array":
            return _has_ext(t[1])
        return any(ft == SKIP or _has_ext(ft) for ft in t[1].values())
    return False


def unwrap_expr(c: F.Column, t) -> F.Column:
    """A6 type conversion: physical extended-JSON wrapper column →
    logical Iceberg-type column (reference docs/design.md:406-422).
    Plain types pass through untouched so non-BSON-specific documents
    keep the exact round-1 plan (no extra projection work)."""
    if t == OBJECTID:
        return c.getField("$oid")
    if t == UUID:
        return c.getField("$uuid")
    if t == REGEX:
        return c.getField("$regularExpression").getField("pattern")
    if t == BINARY:
        return F.unbase64(c.getField("$binary").getField("base64"))
    if t == DECIMAL:
        return c.getField("$numberDecimal").cast(T.DecimalType(38, 9))
    if t == LONG_WRAP:
        return F.coalesce(c.getField("$numberLong"), c.getField("$numberInt")).cast(
            "long"
        )
    if t == DOUBLE_WRAP:
        return F.coalesce(
            c.getField("$numberDouble"),
            c.getField("$numberLong"),
            c.getField("$numberInt"),
        ).cast("double")
    if t == TS_ISO:
        # relaxed extended JSON: ISO-8601 with Z; stored as UTC
        # (docs/design.md:415) — the session timezone is pinned UTC
        return c.getField("$date").cast("timestamp")
    if t == TS_MS:
        return F.timestamp_millis(
            c.getField("$date").getField("$numberLong").cast("long")
        )
    if isinstance(t, tuple) and t[0] == "array":
        if not _has_ext(t[1]):
            return c
        return F.transform(c, lambda e: unwrap_expr(e, t[1]))
    if isinstance(t, tuple) and t[0] == "struct":
        if not _has_ext(t):
            return c
        fields = [(n, ft) for n, ft in sorted(t[1].items()) if ft != SKIP]
        if not fields:
            return c
        rebuilt = F.struct(
            *[unwrap_expr(c.getField(n), ft).alias(n) for n, ft in fields]
        )
        # preserve null-ness: a missing nested document must stay NULL,
        # not become a struct of NULLs
        return F.when(c.isNotNull(), rebuilt)
    return c


def auto_map(
    docs_df: DataFrame,
    doc_col: str = "full_doc",
    sample_size: int = SAMPLE_SIZE_DEFAULT,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A5: full-document mapping under the inferred union schema.

    Conflicting types arrive as StringType columns (A7's promotion), so
    `from_json` renders the conflicted values as their JSON text.
    Extended-JSON wrapper fields parse physically as their wrapper
    struct and are unwrapped to logical types here (A6).
    """
    lattice = infer_union_schema(sample_docs(docs_df, doc_col, sample_size), sample_size)
    phys = to_physical_spark_type(lattice)
    parsed = docs_df.withColumn("_doc", F.from_json(F.col(doc_col), phys))
    cols = [F.col(c) for c in keep_cols]
    fields = sorted(lattice[1].items()) if isinstance(lattice, tuple) else []
    cols += [
        unwrap_expr(F.col("_doc").getField(name), ft).alias(name)
        for name, ft in fields
        if ft != SKIP
    ]
    return parsed.select(*cols)


def explicit_map(
    docs_df: DataFrame,
    fields: list[FieldMapping] | tuple[FieldMapping, ...],
    doc_col: str = "full_doc",
    sample_size: int = SAMPLE_SIZE_DEFAULT,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A4: dot-path extraction + rename + type override.

    The parse schema is still inferred (permissive superset) so that
    dot paths resolve; unmapped fields are simply never selected —
    Catalyst prunes them out of the parse via schema pruning.
    Extended-JSON wrapper values are unwrapped to their logical type
    (A6) before any explicit type override is applied.
    """
    lattice = infer_union_schema(sample_docs(docs_df, doc_col, sample_size), sample_size)
    phys = to_physical_spark_type(lattice)
    parsed = docs_df.withColumn("_doc", F.from_json(F.col(doc_col), phys))
    cols = [F.col(c) for c in keep_cols]
    for fm in fields:
        parts = fm.source.split(".")
        c = F.col("_doc")
        node = lattice
        for p in parts:
            c = c.getField(p)
            if isinstance(node, tuple) and node[0] == "struct" and p in node[1]:
                node = node[1][p]
            else:
                node = None  # path outside the sampled lattice → raw access
        if node is not None:
            c = unwrap_expr(c, node)
        target_type = TYPE_OVERRIDES.get(fm.type or "", None)
        if target_type is not None:
            c = c.cast(target_type)
        cols.append(c.alias(fm.target))
    return parsed.select(*cols)
