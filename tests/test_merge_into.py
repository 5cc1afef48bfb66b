"""MERGE INTO facade on MorTable: clause semantics must mirror
Spark/Iceberg SQL MERGE — delete clause first, then conditional
update, then conditional insert — with target columns reachable via
the _target struct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.sync.table_store import MorTable


def _src(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, v long")


@pytest.fixture()
def table(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "merge_tbl"), key="doc_id")
    t.merge_into(_src(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id=0)
    return t


def _state(t):
    return sorted((r.doc_id, r.v) for r in t.snapshot().collect())


def test_insert_then_upsert_and_insert(spark, table):
    assert _state(table) == [("a", 1), ("b", 2), ("c", 3)]
    table.merge_into(_src(spark, [("b", 20), ("d", 4)]), batch_id=1)
    assert _state(table) == [("a", 1), ("b", 20), ("c", 3), ("d", 4)]


def test_matched_delete_clause_wins_over_update(spark, table):
    # v < 0 is the delete signal; matched non-negative rows update
    table.merge_into(
        _src(spark, [("a", -1), ("b", 22)]),
        batch_id=1,
        when_matched_delete=F.col("v") < 0,
    )
    assert _state(table) == [("b", 22), ("c", 3)]


def test_conditional_update_references_target(spark, table):
    # only update when the incoming value is larger (upsert-if-newer)
    table.merge_into(
        _src(spark, [("a", 0), ("b", 99)]),
        batch_id=1,
        when_matched_update=F.col("v") > F.col("_target.v"),
    )
    assert _state(table) == [("a", 1), ("b", 99), ("c", 3)]


def test_insert_condition_filters_new_rows(spark, table):
    table.merge_into(
        _src(spark, [("d", 10), ("e", -5)]),
        batch_id=1,
        when_not_matched_insert=F.col("v") > 0,
    )
    assert _state(table) == [("a", 1), ("b", 2), ("c", 3), ("d", 10)]


def test_matched_only_merge_leaves_unmatched_alone(spark, table):
    table.merge_into(
        _src(spark, [("c", 33), ("z", 1)]),
        batch_id=1,
        when_not_matched_insert=False,
    )
    assert _state(table) == [("a", 1), ("b", 2), ("c", 33)]


def test_merge_via_wap_staging(spark, table):
    table.merge_into(_src(spark, [("a", 11)]), batch_id=1, stage_only=True)
    assert _state(table) == [("a", 1), ("b", 2), ("c", 3)]  # invisible
    assert table.audit_batch(1) == []
    table.publish_batch(1)
    assert _state(table) == [("a", 11), ("b", 2), ("c", 3)]


def test_merge_is_replay_idempotent(spark, table):
    src = _src(spark, [("b", 42), ("x", 9)])
    table.merge_into(src, batch_id=1)
    after_once = _state(table)
    table.merge_into(src, batch_id=1)  # replayed batch id overwrites
    assert _state(table) == after_once == [("a", 1), ("b", 42), ("c", 3), ("x", 9)]


# -- randomized differential test vs a dict reference model -----------

from hypothesis import given, settings, strategies as st

_key = st.sampled_from(["k1", "k2", "k3", "k4", "k5"])
_val = st.integers(min_value=-5, max_value=50)
# a batch has unique keys (the MERGE cardinality precondition)
_batch = st.dictionaries(_key, _val, min_size=1, max_size=5)
_history = st.lists(_batch, min_size=1, max_size=4)


@settings(max_examples=8, deadline=None)
@given(history=_history)
def test_merge_matches_reference_model(spark, tmp_path_factory, history):
    t = MorTable(
        spark, str(tmp_path_factory.mktemp("merge_prop") / "tbl"), key="doc_id"
    )
    model: dict[str, int] = {}
    for i, batch in enumerate(history):
        rows = sorted(batch.items())
        t.merge_into(
            _src(spark, rows),
            batch_id=i,
            when_matched_delete=F.col("v") < 0,
        )
        for k, v in rows:
            if k in model:
                if v < 0:
                    del model[k]
                else:
                    model[k] = v
            else:
                model[k] = v  # insert clause takes any value
    assert _state(t) == sorted(model.items())


def test_null_delete_predicate_falls_through_to_update(spark, table):
    # SQL MERGE: a NULL clause predicate means "not satisfied" — a null
    # source value in the delete condition must NOT poison the update
    # clause (the row updates with the null payload, not silently no-op)
    src = spark.createDataFrame([("a", None), ("b", 22)], "doc_id string, v long")
    table.merge_into(
        src,
        batch_id=1,
        when_matched_delete=F.col("v") < 0,
    )
    assert _state(table) == [("a", None), ("b", 22), ("c", 3)]


def test_null_update_predicate_is_not_satisfied(spark, table):
    # NULL in the update condition -> clause not taken; matched row keeps
    # its target value instead of erroring or dropping
    src = spark.createDataFrame([("a", None)], "doc_id string, v long")
    table.merge_into(
        src,
        batch_id=1,
        when_matched_update=F.col("v") > F.col("_target.v"),
    )
    assert _state(table) == [("a", 1), ("b", 2), ("c", 3)]


def test_publish_rebases_op_seq_on_concurrent_commit(spark, table):
    # WAP race: stage batch 1, then batch 2 commits directly before
    # publish. Staged op_seq would collide with batch 2's; publish must
    # shift the staged seqs past the interloper so the published batch
    # (the later publish) deterministically wins LWW on overlapping keys.
    table.merge_into(_src(spark, [("a", 100)]), batch_id=1, stage_only=True)
    table.merge_into(_src(spark, [("a", 200), ("z", 9)]), batch_id=2)
    table.publish_batch(1)
    assert _state(table) == [("a", 100), ("b", 2), ("c", 3), ("z", 9)]
