"""Union-schema inference with conflict→JSON-string promotion.

Implements reference operator A7 (docs/design.md:424-431): sample up to
N documents, build the union schema across samples with every field
optional, nested documents → Struct, arrays → List, and **conflicting
types for the same path promoted to StringType with JSON
serialization**. Spark's own JSON inference corrupts on conflict rather
than promoting, which is why this is custom (SURVEY.md §4).

Numeric widening (int → double) is NOT a conflict; anything else is.
Deterministic: field order is sorted, so the same sample set always
yields the same schema (needed for tests and for schema-evolution
diffing in sync.evolution).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

SAMPLE_SIZE_DEFAULT = 1000  # reference docs/design.md:426

# Internal type lattice: primitive names, plus ("array", elem) and
# ("struct", {name: type}) tuples. "conflict" renders as string-as-JSON.
_NULL = "null"
_STRING = "string"


def _type_of(value: Any):
    if value is None:
        return _NULL
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "long"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return _STRING
    if isinstance(value, list):
        elem = _NULL
        for v in value:
            elem = _merge(elem, _type_of(v))
        return ("array", elem)
    if isinstance(value, dict):
        return ("struct", {k: _type_of(v) for k, v in value.items()})
    return _STRING  # unknown scalar → JSON text


def _merge(a, b):
    if a == _NULL:
        return b
    if b == _NULL:
        return a
    if a == b:
        return a
    # numeric widening is not a conflict ((a, b) tuple compare, not a
    # set: struct/array types are unhashable)
    if (a, b) in (("long", "double"), ("double", "long")):
        return "double"
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0]:
        if a[0] == "array":
            return ("array", _merge(a[1], b[1]))
        if a[0] == "struct":
            fields = dict(a[1])
            for k, v in b[1].items():
                fields[k] = _merge(fields[k], v) if k in fields else v
            return ("struct", fields)
    # conflict → promote to string-as-JSON (docs/design.md:429-430)
    return _STRING


def infer_union_schema(docs: list[str], sample_size: int = SAMPLE_SIZE_DEFAULT):
    """Infer the union type over JSON document strings (top level must
    be an object). Returns the internal ("struct", fields) type."""
    merged = ("struct", {})
    for doc in docs[:sample_size]:
        if doc is None:
            continue
        try:
            parsed = json.loads(doc)
        except (TypeError, json.JSONDecodeError):
            continue
        if not isinstance(parsed, dict):
            continue
        merged = _merge(merged, _type_of(parsed))
    return merged


def to_spark_type(t) -> T.DataType:
    if isinstance(t, tuple):
        if t[0] == "array":
            return T.ArrayType(to_spark_type(t[1]), containsNull=True)
        return T.StructType(
            [
                T.StructField(name, to_spark_type(ft), nullable=True)
                for name, ft in sorted(t[1].items())
            ]
        )
    return {
        _NULL: T.StringType(),  # never-seen value → permissive string
        "boolean": T.BooleanType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        _STRING: T.StringType(),
    }[t]


def schema_to_rows(t, prefix: str = "") -> list[tuple[str, str, bool]]:
    """Flatten to (field_path, inferred_type, nullable) rows, globally
    sorted — the shape q_schema_union returns for the rows-only check.

    Dot-joined paths are ambiguous if field names themselves contain
    dots (legal in MongoDB only since 5.0); such paths may collide in
    the flattened view, which is acceptable for a reporting surface —
    global sorting keeps the output deterministic regardless.
    """
    return sorted(_schema_rows(t, prefix))


def _schema_rows(t, prefix: str = "") -> list[tuple[str, str, bool]]:
    rows: list[tuple[str, str, bool]] = []
    if isinstance(t, tuple) and t[0] == "struct":
        for name, ft in sorted(t[1].items()):
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(ft, tuple) and ft[0] == "struct":
                rows.append((path, "struct", True))
                rows.extend(_schema_rows(ft, path))
            elif isinstance(ft, tuple) and ft[0] == "array":
                elem = ft[1]
                elem_name = (
                    elem[0] if isinstance(elem, tuple) else elem
                )
                rows.append((path, f"array<{elem_name}>", True))
                if isinstance(elem, tuple) and elem[0] == "struct":
                    rows.extend(_schema_rows(elem, path + "[]"))
            else:
                rows.append((path, ft, True))
    return rows


def infer_spark_schema(docs: list[str], sample_size: int = SAMPLE_SIZE_DEFAULT) -> T.StructType:
    return to_spark_type(infer_union_schema(docs, sample_size))
