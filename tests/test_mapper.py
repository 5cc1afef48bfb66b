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
