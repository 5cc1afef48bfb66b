"""Streaming materialized aggregate: after the CDC stream drains, the
incrementally-maintained aggregate equals a recompute over the
maintained snapshot — and a second identical run (replayed batches
into fresh checkpoints) converges to the same state.
"""

from __future__ import annotations

import os
import time

import pytest

from mongodb_iceberg_sync_spark.streaming.ivm_sink import (
    _latest_agg,
    maintained_group_stats,
    recompute_group_stats,
)

SCHEMA = "op_seq long, op_type string, doc_id string, grp string, value double"

BATCHES = [
    # batch file 0: initial inserts
    [
        (1, "insert", "a", "g1", 10.0),
        (2, "insert", "b", "g1", 20.0),
        (3, "insert", "c", "g2", 30.0),
    ],
    # batch file 1: group migration (b: g1 -> g2) + in-batch LWW (d)
    [
        (4, "update", "b", "g2", 25.0),
        (5, "insert", "d", "g3", 1.0),
        (6, "update", "d", "g3", 2.0),
    ],
    # batch file 2: delete c (g2 loses a member), new e
    [
        (7, "delete", "c", None, None),
        (8, "insert", "e", "g1", 5.0),
    ],
]


@pytest.fixture()
def cdc_dir(spark, tmp_path):
    import shutil

    path = str(tmp_path / "cdc")
    os.makedirs(path)
    base = time.time() - 100
    for i, rows in enumerate(BATCHES):
        staged = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
        dst = f"{path}/b{i}.parquet"
        shutil.move(f"{staged}/{part}", dst)
        # FileStreamSource processes in (modTime, path) order
        os.utime(dst, (base + i * 10, base + i * 10))
    return path


def _run(spark, cdc_dir, state_dir, ckpt_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_dir)
    )
    q = maintained_group_stats(
        stream, state_dir, ckpt_dir, key="doc_id", group_col="grp", value_col="value"
    )
    q.awaitTermination()


def _canon(df):
    return sorted((r["g"], r["n"], float(r["s"])) for r in df.collect())


def test_incremental_stream_equals_recompute(spark, tmp_path, cdc_dir):
    state = str(tmp_path / "state")
    _run(spark, cdc_dir, state, str(tmp_path / "ck1"))
    final = _latest_agg(spark, f"{state}/agg", 10**9)
    expect = recompute_group_stats(spark, state)
    got = _canon(final)
    assert got == _canon(expect)
    # ground truth after all three batches:
    # a(g1,10) e(g1,5) | b(g2,25) | d(g3,2)   (c deleted)
    assert got == [("g1", 2, 15.0), ("g2", 1, 25.0), ("g3", 1, 2.0)]


def test_replay_converges(spark, tmp_path, cdc_dir):
    state = str(tmp_path / "state")
    _run(spark, cdc_dir, state, str(tmp_path / "ck1"))
    first = _canon(_latest_agg(spark, f"{state}/agg", 10**9))
    # fresh checkpoint replays every batch against the existing state
    _run(spark, cdc_dir, state, str(tmp_path / "ck2"))
    second = _canon(_latest_agg(spark, f"{state}/agg", 10**9))
    assert first == second


def test_stale_out_of_order_op_is_ignored(spark, tmp_path):
    """An op whose op_seq is BELOW the key's current position must be a
    no-op for BOTH the table and the aggregate (cross-batch LWW)."""
    stale = [
        [(10, "insert", "a", "g1", 10.0), (11, "insert", "b", "g2", 20.0)],
        [(5, "update", "a", "g9", 99.0)],  # stale: 5 < 10
    ]
    import os
    import shutil
    import time

    path = str(tmp_path / "cdc")
    os.makedirs(path)
    base = time.time() - 100
    for i, rows in enumerate(stale):
        staged = str(tmp_path / f"st_{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
        dst = f"{path}/b{i}.parquet"
        shutil.move(f"{staged}/{part}", dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    state = str(tmp_path / "state")
    _run(spark, path, state, str(tmp_path / "ck"))
    final = _canon(_latest_agg(spark, f"{state}/agg", 10**9))
    assert final == [("g1", 1, 10.0), ("g2", 1, 20.0)]
    assert _canon(recompute_group_stats(spark, state)) == final
