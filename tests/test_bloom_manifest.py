"""Bloom-filter key manifests (Iceberg puffin-blob analog): point
lookups must skip commits whose key bounds straddle the key without
containing it, with zero false negatives ever."""

from __future__ import annotations

import json

import pytest

from mongodb_iceberg_sync_spark.sync.table_store import MANIFEST, MorTable


def _mk_batch(spark, keys, seq0):
    return spark.createDataFrame(
        [(k, seq0 + i, "upsert", json.dumps({"v": k})) for i, k in enumerate(keys)],
        "doc_id string, _op_seq long, _op string, full_doc string",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "bloom_tbl"), key="doc_id")
    # overlapping [min,max] ranges: range pruning alone cannot separate
    # these commits, only the bloom can
    t.commit_batch(_mk_batch(spark, ["a", "z"], 0), 0)
    t.commit_batch(_mk_batch(spark, ["b", "y"], 10), 1)
    t.commit_batch(_mk_batch(spark, ["c", "x"], 20), 2)
    return t


def test_point_lookup_prunes_by_bloom(table):
    # key "b" is inside every commit's [min,max]; only commit 1 has it
    assert len(table.prune_batches("b", "b")) == 1
    assert table.prune_batches("b", "b")[0].endswith("batch=1")


def test_lookup_returns_correct_row_after_pruning(table):
    rows = table.lookup("x").collect()
    assert len(rows) == 1 and json.loads(rows[0].full_doc) == {"v": "x"}
    missing = table.lookup("nope")  # every commit pruned → empty table view
    assert missing is None or missing.count() == 0


def test_no_false_negatives_for_any_present_key(table):
    for k in ["a", "b", "c", "x", "y", "z"]:
        dirs = table.prune_batches(k, k)
        assert any(
            k in {"a", "z"} and d.endswith("batch=0")
            or k in {"b", "y"} and d.endswith("batch=1")
            or k in {"c", "x"} and d.endswith("batch=2")
            for d in dirs
        ), f"commit holding {k!r} was pruned"
        assert table.lookup(k).count() == 1


def test_range_scans_ignore_bloom(table):
    # lo != hi: bloom must not fire (it only answers point membership)
    assert len(table.prune_batches("a", "c")) == 3


def test_legacy_manifest_without_bloom_is_kept(spark, table):
    # strip the bloom from commit 2's manifest — planning must keep it
    # for any point key inside its [c, x] bounds, while commits 0 and 1
    # (bloom intact, key absent) are still skipped
    p = f"{table.delta_dir}/batch=2/{MANIFEST}"
    m = json.load(open(p))
    m.pop("bloom"), m.pop("bloom_bits")
    with open(p, "w") as f:
        json.dump(m, f)
    dirs = table.prune_batches("e", "e")  # in-bounds for all 3 commits
    assert {d.rsplit("=", 1)[1] for d in dirs} == {"2"}
