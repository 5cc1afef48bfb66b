"""Document → typed-columns mapping (reference operators A4/A5/A6).

The reference maps BSON documents to Iceberg rows either by full-
document auto mapping under an inferred union schema (A5 —
MappingConfig mode=auto, docs/design.md:424-431) or by explicit
field mappings with dot-notation source paths, rename, and type
override (A4 — docs/design.md:213-230, FieldMapping.java:6). Type
conversion rules are A6 (docs/design.md:406-422); in this engine's
JSON-document feed they collapse to the JSON scalar set, with the
BSON-specific types (ObjectId/UUID/Regex/Decimal128) arriving as
strings per the reference's own mapping.

Spark-first: one `from_json` under the inferred/declared schema (a
single JVM-side parse per row, vectorized), then plain column
expressions — projection, rename, cast. No Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .config import FieldMapping
from .schema_infer import SAMPLE_SIZE_DEFAULT, infer_spark_schema

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


def auto_map(
    docs_df: DataFrame,
    doc_col: str = "full_doc",
    sample_size: int = SAMPLE_SIZE_DEFAULT,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """A5: full-document mapping under the inferred union schema.

    Conflicting types arrive as StringType columns (A7's promotion), so
    `from_json` renders the conflicted values as their JSON text.
    """
    schema = infer_spark_schema(sample_docs(docs_df, doc_col, sample_size), sample_size)
    parsed = docs_df.withColumn("_doc", F.from_json(F.col(doc_col), schema))
    cols = [F.col(c) for c in keep_cols]
    cols += [F.col(f"_doc.`{f.name}`").alias(f.name) for f in schema.fields]
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
    """
    schema = infer_spark_schema(sample_docs(docs_df, doc_col, sample_size), sample_size)
    parsed = docs_df.withColumn("_doc", F.from_json(F.col(doc_col), schema))
    cols = [F.col(c) for c in keep_cols]
    for fm in fields:
        path = ".".join(f"`{p}`" for p in fm.source.split("."))
        c = F.col(f"_doc.{path}")
        target_type = TYPE_OVERRIDES.get(fm.type or "", None)
        if target_type is not None:
            c = c.cast(target_type)
        cols.append(c.alias(fm.target))
    return parsed.select(*cols)
