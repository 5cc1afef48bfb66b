"""Union-schema inference tests (reference A7 behaviors,
docs/design.md:424-431 via SURVEY.md; test plan docs/plan.md:86-92)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from mongodb_iceberg_sync_spark.sync.schema_infer import (
    infer_spark_schema,
    infer_union_schema,
    schema_to_rows,
)


def test_union_across_docs():
    docs = ['{"a": 1}', '{"b": "x"}']
    rows = schema_to_rows(infer_union_schema(docs))
    assert rows == [("a", "long", True), ("b", "string", True)]


def test_conflict_promotes_to_string():
    docs = ['{"k": 1}', '{"k": "s"}']
    assert schema_to_rows(infer_union_schema(docs)) == [("k", "string", True)]


def test_numeric_widening_not_conflict():
    docs = ['{"k": 1}', '{"k": 2.5}']
    assert schema_to_rows(infer_union_schema(docs)) == [("k", "double", True)]


def test_nested_struct_and_array():
    docs = ['{"o": {"x": 1, "l": [1, 2]}}', '{"o": {"y": true}}']
    rows = schema_to_rows(infer_union_schema(docs))
    assert ("o", "struct", True) in rows
    assert ("o.l", "array<long>", True) in rows
    assert ("o.x", "long", True) in rows
    assert ("o.y", "boolean", True) in rows


def test_array_element_conflict():
    docs = ['{"l": [1, "x"]}']
    assert schema_to_rows(infer_union_schema(docs)) == [("l", "array<string>", True)]


def test_struct_vs_scalar_conflict():
    docs = ['{"k": {"a": 1}}', '{"k": 3}']
    assert schema_to_rows(infer_union_schema(docs)) == [("k", "string", True)]


def test_null_then_typed():
    docs = ['{"k": null}', '{"k": 7}']
    assert schema_to_rows(infer_union_schema(docs)) == [("k", "long", True)]


def test_malformed_docs_skipped():
    docs = ["not json", None, '{"k": 1}']
    assert schema_to_rows(infer_union_schema(docs)) == [("k", "long", True)]


def test_spark_schema_all_nullable_sorted():
    docs = ['{"b": 1, "a": {"z": "s"}}']
    schema = infer_spark_schema(docs)
    assert isinstance(schema, T.StructType)
    assert [f.name for f in schema.fields] == ["a", "b"]
    assert all(f.nullable for f in schema.fields)


def test_deterministic():
    docs = ['{"a": 1, "b": [1.0]}', '{"b": [2], "c": {"d": "x"}}']
    assert infer_union_schema(docs) == infer_union_schema(docs)
    assert schema_to_rows(infer_union_schema(docs)) == schema_to_rows(
        infer_union_schema(list(docs))
    )


def test_extended_json_wrappers_recognized():
    # A6 (docs/design.md:406-422): wrappers become dedicated lattice
    # primitives, reported with their logical Iceberg type
    docs = [json.dumps({
        "_id": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d1"},
        "when": {"$date": "2024-06-01T12:34:56.789Z"},
        "amt": {"$numberDecimal": "1.5"},
        "mk": {"$maxKey": 1},
    })]
    rows = schema_to_rows(infer_union_schema(docs))
    d = {p: ty for p, ty, _ in rows}
    assert d["_id"] == "string(objectid)"
    assert d["when"] == "timestamp"
    assert d["amt"] == "decimal(38,9)"
    assert "mk" not in d  # MinKey/MaxKey skipped


def test_extended_json_wrapper_conflicts_promote():
    from mongodb_iceberg_sync_spark.sync.schema_infer import _STRING, _merge

    # wrapper vs plain string -> A7 conflict promotion
    t = infer_union_schema(
        [json.dumps({"v": {"$oid": "a" * 24}}), json.dumps({"v": "plain"})]
    )
    assert t[1]["v"] == _STRING
    # wrapped-numeric widening mirrors long/double widening
    assert _merge("long_wrap", "double_wrap") == "double_wrap"
    # skip merges like null: never constrains the other side
    assert _merge("skip", "long") == "long"


def test_extended_json_wrong_shape_is_plain_struct():
    # multi-key / wrong value kind -> regular nested document, not a wrapper
    t = infer_union_schema(
        [json.dumps({"a": {"$oid": "x", "extra": 1}, "b": {"$oid": 5}})]
    )
    assert t[1]["a"][0] == "struct" and t[1]["b"][0] == "struct"
