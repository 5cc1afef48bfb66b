"""Column-stats data skipping (Iceberg lower/upper-bounds scan
planning at commit granularity): commits whose manifest column bounds
cannot intersect the predicate are never opened; results stay exact;
missing stats degrade to keep, never to skip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.sync.table_store import MANIFEST, MorTable


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, _op_seq long, _op string, v long, cat string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MorTable(spark, str(tmp_path / "stats_tbl"), key="doc_id")
    # three commits with disjoint v-ranges: [0,9], [10,19], [20,29]
    for b in range(3):
        rows = [
            (f"k{b}_{i}", b * 100 + i, "upsert", b * 10 + i, "x")
            for i in range(10)
        ]
        t.commit_batch(_mk_batch(spark, rows), b)
    return t


def test_manifest_records_column_stats(table):
    with open(f"{table.delta_dir}/batch=1/{MANIFEST}") as f:
        m = json.load(f)
    assert m["columns"]["v"] == {"min": 10, "max": 19}
    assert m["columns"]["cat"] == {"min": "x", "max": "x"}


def test_prune_by_column_bounds(table):
    kept = table.prune_batches(col_bounds={"v": (12, 15)})
    assert [p.rsplit("=", 1)[1] for p in kept] == ["1"]
    kept = table.prune_batches(col_bounds={"v": (5, 25)})
    assert len(kept) == 3
    kept = table.prune_batches(col_bounds={"v": (100, None)})
    assert kept == []


def test_scan_append_exact_and_pruned(spark, table):
    got = sorted(
        r.v for r in table.scan_append({"v": (12, 21)}).collect()
    )
    assert got == list(range(12, 22))  # exact despite commit skipping


def test_missing_stats_keep_commit(spark, table):
    # wipe one manifest's column stats: pruning must KEEP that commit
    p = f"{table.delta_dir}/batch=2/{MANIFEST}"
    with open(p) as f:
        m = json.load(f)
    del m["columns"]
    with open(p, "w") as f:
        json.dump(m, f)
    kept = table.prune_batches(col_bounds={"v": (0, 5)})
    assert [x.rsplit("=", 1)[1] for x in kept] == ["0", "2"]
    got = sorted(r.v for r in table.scan_append({"v": (0, 5)}).collect())
    assert got == list(range(0, 6))


def test_type_mismatch_is_conservative(table):
    # predicate literal incomparable with stored stat -> keep everything
    kept = table.prune_batches(col_bounds={"cat": (0, 5)})
    assert len(kept) == 3


def test_scan_append_refuses_tables_with_delete_files(spark, table):
    # the append-log path applies no pos/eq delete folding; letting it
    # read past delete files would silently resurrect deleted rows
    n = table.delete_equality(
        spark.createDataFrame([("k1_3",)], "doc_id string"), 3
    )
    assert n == 1
    with pytest.raises(ValueError, match="delete files"):
        table.scan_append({"v": (12, 21)})
