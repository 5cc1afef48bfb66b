"""MorTable metadata inspection tables (Iceberg `files`/`snapshots`/
`partitions`/`history` analogs) — metadata-only reads must describe
exactly what is on disk through commit → compact → expire lifecycle."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.sync.table_store import MorTable


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        [(d, s, op, json.dumps({"v": v})) for d, s, op, v in rows],
        "doc_id string, _op_seq long, _op string, full_doc string",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "meta_tbl"), key="doc_id")
    t.commit_batch(_mk_batch(spark, [("a", 1, "upsert", 1), ("b", 2, "upsert", 2)]), 0)
    t.commit_batch(_mk_batch(spark, [("b", 3, "upsert", 20), ("c", 4, "delete", None)]), 1)
    return t


def test_files_match_disk(table):
    rows = table.files().collect()
    assert all(r.section == "delta" for r in rows)
    assert {r.batch_id for r in rows} == {0, 1}
    # footer record counts sum to the rows committed
    assert sum(r.record_count for r in rows) == 4
    # Spark may emit empty part files (0 row groups); sizes are on-disk
    assert all(r.file_size_bytes > 0 for r in rows)
    assert all(r.num_row_groups >= 1 for r in rows if r.record_count > 0)
    assert all(not r.file_path.startswith("/") for r in rows)  # repo-relative


def test_snapshots_carry_manifest_bounds(table):
    snaps = {r.version: r for r in table.snapshots().collect()}
    assert set(snaps) == {0, 1}
    assert snaps[0].key_min == "a" and snaps[0].key_max == "b"
    assert snaps[1].key_min == "b" and snaps[1].key_max == "c"
    assert snaps[0].record_count == 2 and snaps[1].record_count == 2


def test_snapshots_after_compact_show_base_and_expiry(spark, table):
    table.compact()
    table.commit_batch(_mk_batch(spark, [("d", 5, "upsert", 5)]), 2)
    snaps = table.snapshots().collect()
    base = [r for r in snaps if r.section == "base"]
    delta = [r for r in snaps if r.section == "delta"]
    assert len(base) == 1 and base[0].history_expired_before == 1
    assert [r.version for r in delta] == [2]
    # base holds the merged live rows: a, b (c was a tombstone)
    assert base[0].record_count == 2
    # metadata view agrees with the actual snapshot
    assert table.snapshot().count() == 3


def test_history_tracks_generations(table):
    assert [tuple(r) for r in table.history().collect()] == [(0, "current", None)]
    table.compact()
    hist = [tuple(r) for r in table.history().collect()]
    assert hist == [(0, "archived", None), (1, "current", 1)]
    table.compact()
    table.expire_snapshots(keep_last=1)
    hist = table.history().collect()
    assert [r.status for r in hist] == ["archived", "current"]


def test_partitions_roll_up_by_partition_col(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "pmeta"), key="doc_id", partition_col="day")
    df = spark.createDataFrame(
        [("a", 1, "upsert", "d01", "{}"), ("b", 2, "upsert", "d02", "{}"),
         ("c", 3, "upsert", "d02", "{}")],
        "doc_id string, _op_seq long, _op string, day string, full_doc string",
    )
    t.commit_batch(df, 0)
    parts = {r.partition: r.record_count for r in t.partitions().collect()}
    assert parts == {"d01": 1, "d02": 2}


def test_files_feed_should_compact_decision(spark, table):
    """The inspection surface is the operational input to compaction
    scheduling: file counts from files() agree with should_compact's
    walk of the same tree."""
    n_delta_files = table.files().filter(F.col("section") == "delta").count()
    assert n_delta_files >= 2
    assert table.should_compact(max_delta_files=n_delta_files) is True
    assert table.should_compact(
        max_delta_batches=99, max_delta_files=n_delta_files + 1
    ) is False


def test_empty_table_metadata(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "empty_tbl"), key="doc_id")
    assert t.files().count() == 0
    assert t.snapshots().count() == 0
    assert t.partitions().count() == 0
    assert [tuple(r) for r in t.history().collect()] == [(0, "current", None)]


def test_compact_respects_max_records_per_file(spark, table):
    table.compact(max_records_per_file=1)
    files = [r for r in table.files().collect() if r.section == "base"]
    assert all(r.record_count <= 1 for r in files)
    assert len(files) >= 2  # 2 live keys (c tombstoned) → one file each


def test_files_show_staged_commits_but_live_views_exclude_them(spark, table):
    table.stage_batch(
        _mk_batch(spark, [("x", 9, "upsert", 9)]), 7
    )
    staged = [r for r in table.files().collect() if r.section == "staged"]
    assert len(staged) >= 1 and staged[0].batch_id == 7
    # snapshots()/partitions() describe the READABLE state only
    assert all(r.section != "staged" for r in table.snapshots().collect())
