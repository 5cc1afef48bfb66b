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

BSON-specific types (reference A6 type table, docs/design.md:406-422)
arrive in a JSON feed as MongoDB Extended JSON wrappers and are
recognized here as dedicated lattice primitives: ``{"$oid": ...}`` →
objectid (string), ``{"$date": ...}`` → timestamp (relaxed ISO or
canonical ``{"$numberLong": millis}``), ``{"$numberDecimal": ...}`` →
decimal, ``{"$numberInt"/"$numberLong"/"$numberDouble": ...}`` →
long/double, ``{"$binary": {"base64": ...}}`` → binary, ``{"$uuid":
...}`` → uuid (string), ``{"$regularExpression": {...}}`` → regex
(pattern string), ``{"$minKey"/"$maxKey": 1}`` → skipped ("not
meaningful for analytics"). The PHYSICAL parse schema keeps the wrapper
struct shape (so one vectorized `from_json` handles everything);
`sync.mapper` unwraps to the logical Iceberg-table types.
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

# Extended-JSON lattice primitives (reference A6, docs/design.md:406-422)
OBJECTID = "objectid"
UUID = "uuid"
REGEX = "regex"
BINARY = "binary"
DECIMAL = "decimal"
LONG_WRAP = "long_wrap"  # {"$numberInt"} / {"$numberLong"}
DOUBLE_WRAP = "double_wrap"  # {"$numberDouble"} (or mixed with int/long)
TS_ISO = "ts_iso"  # {"$date": "2024-..Z"} (relaxed extended JSON)
TS_MS = "ts_ms"  # {"$date": {"$numberLong": "millis"}} (canonical)
SKIP = "skip"  # {"$minKey": 1} / {"$maxKey": 1} — dropped

EXT_PRIMITIVES = frozenset(
    {OBJECTID, UUID, REGEX, BINARY, DECIMAL, LONG_WRAP, DOUBLE_WRAP, TS_ISO, TS_MS, SKIP}
)


def _ext_json_type(d: dict):
    """Extended-JSON wrapper type of dict ``d``, or None if it is a
    plain document. Shape must match exactly (single wrapper key, value
    of the right kind) — anything else is treated as a regular nested
    document, never an error."""
    if len(d) != 1:
        return None
    ((k, v),) = d.items()
    if k == "$oid" and isinstance(v, str):
        return OBJECTID
    if k == "$uuid" and isinstance(v, str):
        return UUID
    if k == "$date":
        if isinstance(v, str):
            return TS_ISO
        if isinstance(v, dict) and set(v) == {"$numberLong"} and isinstance(v["$numberLong"], str):
            return TS_MS
        return None
    if k == "$numberDecimal" and isinstance(v, str):
        return DECIMAL
    if k in ("$numberInt", "$numberLong") and isinstance(v, str):
        return LONG_WRAP
    if k == "$numberDouble" and isinstance(v, str):
        return DOUBLE_WRAP
    if k == "$binary" and isinstance(v, dict) and isinstance(v.get("base64"), str):
        return BINARY
    if k == "$regularExpression" and isinstance(v, dict) and isinstance(v.get("pattern"), str):
        return REGEX
    if k in ("$minKey", "$maxKey"):
        return SKIP
    return None


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
        ext = _ext_json_type(value)
        if ext is not None:
            return ext
        return ("struct", {k: _type_of(v) for k, v in value.items()})
    return _STRING  # unknown scalar → JSON text


def _merge(a, b):
    if a == _NULL:
        return b
    if b == _NULL:
        return a
    # MinKey/MaxKey are skipped (docs/design.md:422): they never
    # constrain the field's type, so merge like null
    if a == SKIP:
        return b
    if b == SKIP:
        return a
    if a == b:
        return a
    # numeric widening is not a conflict ((a, b) tuple compare, not a
    # set: struct/array types are unhashable)
    if (a, b) in (("long", "double"), ("double", "long")):
        return "double"
    # wrapped-numeric widening mirrors Int32/Int64 → Double widening;
    # the physical struct for DOUBLE_WRAP parses all three wrapper keys
    if (a, b) in ((LONG_WRAP, DOUBLE_WRAP), (DOUBLE_WRAP, LONG_WRAP)):
        return DOUBLE_WRAP
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
    """LOGICAL Spark type — what the Iceberg table column would be
    (reference A6 table: ObjectId/UUID/Regex → string, Decimal128 →
    decimal, DateTime → timestamp stored as UTC, Binary → binary)."""
    if isinstance(t, tuple):
        if t[0] == "array":
            return T.ArrayType(to_spark_type(t[1]), containsNull=True)
        return T.StructType(
            [
                T.StructField(name, to_spark_type(ft), nullable=True)
                for name, ft in sorted(t[1].items())
                if ft != SKIP
            ]
        )
    return {
        _NULL: T.StringType(),  # never-seen value → permissive string
        "boolean": T.BooleanType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        _STRING: T.StringType(),
        OBJECTID: T.StringType(),
        UUID: T.StringType(),
        REGEX: T.StringType(),
        BINARY: T.BinaryType(),
        DECIMAL: T.DecimalType(38, 9),
        LONG_WRAP: T.LongType(),
        DOUBLE_WRAP: T.DoubleType(),
        TS_ISO: T.TimestampType(),
        TS_MS: T.TimestampType(),
        SKIP: T.StringType(),  # only reachable for a top-level all-skip doc
    }[t]


# PHYSICAL wrapper-struct shapes: what `from_json` must parse before
# sync.mapper unwraps to the logical types above.
_PHYSICAL_WRAPPERS: dict[str, T.DataType] = {
    OBJECTID: T.StructType([T.StructField("$oid", T.StringType(), True)]),
    UUID: T.StructType([T.StructField("$uuid", T.StringType(), True)]),
    REGEX: T.StructType(
        [
            T.StructField(
                "$regularExpression",
                T.StructType(
                    [
                        T.StructField("pattern", T.StringType(), True),
                        T.StructField("options", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    ),
    BINARY: T.StructType(
        [
            T.StructField(
                "$binary",
                T.StructType(
                    [
                        T.StructField("base64", T.StringType(), True),
                        T.StructField("subType", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    ),
    DECIMAL: T.StructType([T.StructField("$numberDecimal", T.StringType(), True)]),
    LONG_WRAP: T.StructType(
        [
            T.StructField("$numberInt", T.StringType(), True),
            T.StructField("$numberLong", T.StringType(), True),
        ]
    ),
    DOUBLE_WRAP: T.StructType(
        [
            T.StructField("$numberInt", T.StringType(), True),
            T.StructField("$numberLong", T.StringType(), True),
            T.StructField("$numberDouble", T.StringType(), True),
        ]
    ),
    TS_ISO: T.StructType([T.StructField("$date", T.StringType(), True)]),
    TS_MS: T.StructType(
        [
            T.StructField(
                "$date",
                T.StructType([T.StructField("$numberLong", T.StringType(), True)]),
                True,
            )
        ]
    ),
}


def to_physical_spark_type(t) -> T.DataType:
    """PHYSICAL parse type for `from_json`: extended-JSON wrappers keep
    their struct shape; skipped fields are dropped from structs."""
    if isinstance(t, tuple):
        if t[0] == "array":
            return T.ArrayType(to_physical_spark_type(t[1]), containsNull=True)
        return T.StructType(
            [
                T.StructField(name, to_physical_spark_type(ft), nullable=True)
                for name, ft in sorted(t[1].items())
                if ft != SKIP
            ]
        )
    if t in _PHYSICAL_WRAPPERS:
        return _PHYSICAL_WRAPPERS[t]
    return to_spark_type(t)


def schema_to_rows(t, prefix: str = "") -> list[tuple[str, str, bool]]:
    """Flatten to (field_path, inferred_type, nullable) rows, globally
    sorted — the shape q_schema_union returns for the rows-only check.

    Dot-joined paths are ambiguous if field names themselves contain
    dots (legal in MongoDB only since 5.0); such paths may collide in
    the flattened view, which is acceptable for a reporting surface —
    global sorting keeps the output deterministic regardless.
    """
    return sorted(_schema_rows(t, prefix))


# reporting names for the extended-JSON primitives (q_schema_union /
# evolution diff output) — logical Iceberg-table type, with the BSON
# origin in parens where the logical type alone would be ambiguous
_ROW_LABELS = {
    OBJECTID: "string(objectid)",
    UUID: "string(uuid)",
    REGEX: "string(regex)",
    BINARY: "binary",
    DECIMAL: "decimal(38,9)",
    LONG_WRAP: "long",
    DOUBLE_WRAP: "double",
    TS_ISO: "timestamp",
    TS_MS: "timestamp",
}


def _schema_rows(t, prefix: str = "") -> list[tuple[str, str, bool]]:
    rows: list[tuple[str, str, bool]] = []
    if isinstance(t, tuple) and t[0] == "struct":
        for name, ft in sorted(t[1].items()):
            path = f"{prefix}.{name}" if prefix else name
            if ft == SKIP:
                continue  # MinKey/MaxKey fields are not part of the table
            if isinstance(ft, tuple) and ft[0] == "struct":
                rows.append((path, "struct", True))
                rows.extend(_schema_rows(ft, path))
            elif isinstance(ft, tuple) and ft[0] == "array":
                elem = ft[1]
                elem_name = (
                    elem[0]
                    if isinstance(elem, tuple)
                    else _ROW_LABELS.get(elem, elem)
                )
                rows.append((path, f"array<{elem_name}>", True))
                if isinstance(elem, tuple) and elem[0] == "struct":
                    rows.extend(_schema_rows(elem, path + "[]"))
            else:
                rows.append((path, _ROW_LABELS.get(ft, ft), True))
    return rows


def infer_spark_schema(docs: list[str], sample_size: int = SAMPLE_SIZE_DEFAULT) -> T.StructType:
    return to_spark_type(infer_union_schema(docs, sample_size))
