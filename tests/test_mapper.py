"""Document→typed-column mapping tests (reference A4/A5/A6 —
docs/design.md:213-230, 406-431; FIXTURES.md mapping behaviors)."""

from __future__ import annotations

import json

from mongodb_iceberg_sync_spark.sync.config import FieldMapping
from mongodb_iceberg_sync_spark.sync.mapper import auto_map, explicit_map


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, json.dumps(d) if d is not None else None) for i, d in enumerate(docs)],
        "row_id int, full_doc string",
    )


def test_auto_map_flattens_and_types(spark):
    df = _docs_df(
        spark,
        [
            {"name": "a", "n": 1, "nested": {"x": 1.5}},
            {"name": "b", "n": 2, "nested": {"x": 2.5}, "extra": True},
        ],
    )
    out = auto_map(df, keep_cols=("row_id",))
    assert dict(out.dtypes)["n"] == "bigint"
    assert dict(out.dtypes)["extra"] == "boolean"
    rows = {r.row_id: r for r in out.collect()}
    assert rows[0].name == "a" and rows[0].nested.x == 1.5
    assert rows[0].extra is None  # missing field -> null (all optional)
    assert rows[1].extra is True


def test_auto_map_conflict_renders_json_text(spark):
    # int vs string conflict on "v" -> StringType; numbers arrive as text
    df = _docs_df(spark, [{"v": 42}, {"v": "s"}])
    out = auto_map(df)
    assert dict(out.dtypes)["v"] == "string"
    assert {r.v for r in out.collect()} == {"42", "s"}


def test_auto_map_null_and_malformed_docs(spark):
    df = spark.createDataFrame(
        [(0, '{"a": 1}'), (1, None), (2, "not-json")],
        "row_id int, full_doc string",
    )
    out = auto_map(df, keep_cols=("row_id",))
    rows = {r.row_id: r.a for r in out.collect()}
    assert rows[0] == 1 and rows[1] is None and rows[2] is None


def test_explicit_map_dot_path_rename_cast(spark):
    df = _docs_df(
        spark,
        [
            {"customer": {"name": "alice"}, "total": "12.50", "when": "2024-01-02T03:04:05"},
            {"customer": {"name": "bob"}, "total": "99.99", "when": "2024-06-07T08:09:10"},
        ],
    )
    out = explicit_map(
        df,
        [
            FieldMapping("customer.name", "customer_name", "string"),
            FieldMapping("total", "total", "decimal"),
            FieldMapping("when", "when_ts", "timestamp"),
        ],
        keep_cols=("row_id",),
    )
    assert dict(out.dtypes)["total"] == "decimal(38,9)"
    assert dict(out.dtypes)["when_ts"] == "timestamp"
    rows = sorted(out.collect(), key=lambda r: r.row_id)
    assert rows[0].customer_name == "alice"
    assert float(rows[0].total) == 12.5
    assert rows[0].when_ts.year == 2024


def test_explicit_map_unmapped_fields_dropped(spark):
    df = _docs_df(spark, [{"keep": 1, "drop": "x"}])
    out = explicit_map(df, [FieldMapping("keep", "kept", "long")])
    assert out.columns == ["kept"]


def test_auto_map_extended_json_types(spark):
    # A6 type conversion (reference docs/design.md:406-422): extended-
    # JSON wrappers unwrap to the reference's logical Iceberg types
    docs = [
        {
            "_id": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d1"},
            "when": {"$date": "2024-06-01T12:34:56.789Z"},
            "when_ms": {"$date": {"$numberLong": "1717245296789"}},
            "amount": {"$numberDecimal": "12.345678901"},
            "n32": {"$numberInt": "42"},
            "n64": {"$numberLong": "9007199254740993"},
            "ratio": {"$numberDouble": "0.5"},
            "payload": {"$binary": {"base64": "aGVsbG8=", "subType": "00"}},
            "uid": {"$uuid": "01234567-89ab-cdef-0123-456789abcdef"},
            "pat": {"$regularExpression": {"pattern": "^a.*z$", "options": "i"}},
            "mk": {"$minKey": 1},
            "nested": {"inner_id": {"$oid": "aaaaaaaaaaaaaaaaaaaaaaaa"}},
            "ids": [{"$oid": "bbbbbbbbbbbbbbbbbbbbbbbb"}],
        }
    ]
    out = auto_map(_docs_df(spark, docs), keep_cols=("row_id",))
    dt = dict(out.dtypes)
    assert dt["_id"] == "string"
    assert dt["when"] == "timestamp"
    assert dt["when_ms"] == "timestamp"
    assert dt["amount"] == "decimal(38,9)"
    assert dt["n32"] == "bigint" and dt["n64"] == "bigint"
    assert dt["ratio"] == "double"
    assert dt["payload"] == "binary"
    assert dt["uid"] == "string"
    assert dt["pat"] == "string"
    assert "mk" not in dt  # MinKey/MaxKey skipped (docs/design.md:422)
    assert dt["nested"] == "struct<inner_id:string>"
    assert dt["ids"] == "array<string>"
    r = out.collect()[0]
    assert r._id == "65f1a2b3c4d5e6f7a8b9c0d1"
    assert r.when.isoformat().startswith("2024-06-01T12:34:56.789")
    assert r.when == r.when_ms  # relaxed and canonical forms agree
    assert str(r.amount) == "12.345678901"
    assert r.n32 == 42 and r.n64 == 9007199254740993  # > 2^53: no float trip
    assert r.ratio == 0.5
    assert bytes(r.payload) == b"hello"
    assert r.uid == "01234567-89ab-cdef-0123-456789abcdef"
    assert r.pat == "^a.*z$"
    assert r.nested.inner_id == "aaaaaaaaaaaaaaaaaaaaaaaa"
    assert r.ids == ["bbbbbbbbbbbbbbbbbbbbbbbb"]


def test_auto_map_extended_json_conflict_and_nulls(spark):
    # wrapper vs plain scalar on one path -> A7 conflict (JSON text);
    # absent nested doc stays NULL (not a struct of NULLs)
    docs = [
        {"v": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d1"}, "nest": {"x": {"$numberInt": "1"}}},
        {"v": "plain"},
    ]
    out = auto_map(_docs_df(spark, docs), keep_cols=("row_id",))
    dt = dict(out.dtypes)
    assert dt["v"] == "string"
    rows = {r.row_id: r for r in out.collect()}
    assert rows[1].v == "plain"
    assert "$oid" in rows[0].v  # conflicted wrapper renders as JSON text
    assert rows[0].nest.x == 1
    assert rows[1].nest is None


def test_explicit_map_unwraps_extended_json(spark):
    docs = [
        {
            "meta": {"id": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d1"}},
            "total": {"$numberDecimal": "7.5"},
        }
    ]
    out = explicit_map(
        _docs_df(spark, docs),
        [
            FieldMapping(source="meta.id", target="doc_key", type="string"),
            FieldMapping(source="total", target="total_d", type="double"),
        ],
        keep_cols=("row_id",),
    )
    r = out.collect()[0]
    assert r.doc_key == "65f1a2b3c4d5e6f7a8b9c0d1"
    assert r.total_d == 7.5
