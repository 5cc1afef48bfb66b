"""Partition-spec evolution on MorTable (Iceberg partition-evolution
analog): the spec changes for future commits only, mixed layouts
coexist under merge-on-read, and a full compact() rewrites the table
under the current spec."""

from __future__ import annotations

import json
import os

import pytest

from mongodb_iceberg_sync_spark.sync.table_store import MANIFEST, MorTable


def _mk_batch(spark, rows, seq0):
    return spark.createDataFrame(
        [(k, seq0 + i, "upsert", day, v) for i, (k, day, v) in enumerate(rows)],
        "doc_id string, _op_seq long, _op string, day string, v long",
    )


def _state(t):
    return sorted((r.doc_id, r.day, r.v) for r in t.snapshot().collect())


def test_spec_survives_reopen(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "t1"), key="doc_id", partition_col="day")
    assert t.partition_col == "day"
    reopened = MorTable(spark, str(tmp_path / "t1"), key="doc_id")
    assert reopened.partition_col == "day"
    with pytest.raises(ValueError, match="evolve_partition_spec"):
        MorTable(spark, str(tmp_path / "t1"), key="doc_id", partition_col="v")


def test_mixed_spec_commits_read_correctly(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "t2"), key="doc_id")  # unpartitioned
    t.commit_batch(_mk_batch(spark, [("a", "d1", 1), ("b", "d2", 2)], 0), 0)
    sid = t.evolve_partition_spec("day")
    assert sid == 1 and t.partition_col == "day"
    # new commit lands day-partitioned; old commit stays flat
    t.commit_batch(_mk_batch(spark, [("b", "d2", 20), ("c", "d1", 3)], 10), 1)
    assert os.path.isdir(f"{t.delta_dir}/batch=1/day=d1")
    assert not os.path.isdir(f"{t.delta_dir}/batch=0/day=d1")
    assert _state(t) == [("a", "d1", 1), ("b", "d2", 20), ("c", "d1", 3)]
    # manifests record the spec each commit was written under
    assert json.load(open(f"{t.delta_dir}/batch=0/{MANIFEST}"))["spec"] is None
    assert json.load(open(f"{t.delta_dir}/batch=1/{MANIFEST}"))["spec"] == "day"


def test_full_compact_rewrites_under_current_spec(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "t3"), key="doc_id")
    t.commit_batch(_mk_batch(spark, [("a", "d1", 1), ("b", "d2", 2)], 0), 0)
    t.evolve_partition_spec("day")
    before = _state(t)
    t.compact()
    assert _state(t) == before
    assert os.path.isdir(f"{t.base_dir}/day=d1")  # new layout in base


def test_targeted_compact_blocked_until_full_rewrite(spark, tmp_path):
    from pyspark.sql import functions as F

    t = MorTable(spark, str(tmp_path / "t4"), key="doc_id")
    t.commit_batch(_mk_batch(spark, [("a", "d1", 1)], 0), 0)
    t.evolve_partition_spec("day")
    t.commit_batch(_mk_batch(spark, [("b", "d2", 2)], 10), 1)
    with pytest.raises(ValueError, match="full compact"):
        t.compact(where=F.col("day") == "d1")
    t.compact()  # folds everything under the new spec
    t.commit_batch(_mk_batch(spark, [("c", "d1", 3)], 20), 2)
    t.compact(where=F.col("day") == "d1")  # now legal
    assert _state(t) == [("a", "d1", 1), ("b", "d2", 2), ("c", "d1", 3)]


# -- randomized: state is invariant under arbitrary spec evolution ------

from hypothesis import given, settings, strategies as st

_key2 = st.sampled_from(["a", "b", "c", "d"])
_day = st.sampled_from(["d1", "d2"])
_batch2 = st.lists(
    st.tuples(_key2, _day, st.integers(0, 99)), min_size=1, max_size=4
)
_step = st.tuples(_batch2, st.sampled_from([None, "day", "keep"]))


@settings(max_examples=6, deadline=None)
@given(history=st.lists(_step, min_size=1, max_size=4))
def test_state_invariant_under_random_evolution(
    spark, tmp_path_factory, history
):
    t = MorTable(
        spark, str(tmp_path_factory.mktemp("evo_prop") / "tbl"), key="doc_id"
    )
    model: dict[str, tuple] = {}
    seq = 0
    for i, (batch, spec) in enumerate(history):
        if spec != "keep":
            t.evolve_partition_spec(spec)
        # last occurrence of a key within the batch wins (LWW on op_seq)
        t.commit_batch(_mk_batch(spark, batch, seq), i)
        for k, day, v in batch:
            model[k] = (day, v)
        seq += len(batch)
    assert _state(t) == sorted((k, d, v) for k, (d, v) in model.items())


def test_append_base_refuses_mixed_layout(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "t5"), key="doc_id")
    base_df = spark.createDataFrame(
        [("a", "d1", 1)], "doc_id string, day string, v long"
    )
    t.append_base(base_df)
    t.evolve_partition_spec("day")
    # appending now would mix flat files with day= dirs in base/
    with pytest.raises(ValueError, match="mix"):
        t.append_base(base_df)
    t.compact()  # rewrites base under the new spec
    t.append_base(
        spark.createDataFrame([("b", "d2", 2)], "doc_id string, day string, v long")
    )
    assert _state(t) == [("a", "d1", 1), ("b", "d2", 2)]
