"""A16 three-threshold batching tests (reference BatchConfig.java:8-30,
docs/design.md:366-374): a feed must flush on EACH of maxRecords,
maxBytes, flushIntervalSeconds — whichever is hit first."""

from __future__ import annotations

from datetime import datetime, timedelta

from mongodb_iceberg_sync_spark.sync.batching import (
    source_rate_options,
    threshold_batches,
    trigger_kwargs,
)
from mongodb_iceberg_sync_spark.sync.config import BatchConfig

T0 = datetime(2024, 1, 1)


def row(seq: int, payload: str = "x" * 10, sec: int = 0) -> tuple:
    return (seq, "insert", f"doc{seq}", T0 + timedelta(seconds=sec), payload)


def test_flush_on_max_records():
    cfg = BatchConfig(max_records=3, max_bytes=10**9, flush_interval_seconds=10**6)
    rows = [row(i) for i in range(1, 8)]
    got = list(threshold_batches(rows, cfg))
    assert [len(b) for _, b in got] == [3, 3, 1]
    # batch ids are the first op_seq of each batch (resume-stable)
    assert [bid for bid, _ in got] == [1, 4, 7]


def test_flush_on_max_bytes():
    # each row estimates >100 bytes -> every row alone crosses 150
    cfg = BatchConfig(max_records=10**6, max_bytes=150, flush_interval_seconds=10**6)
    rows = [row(i, payload="y" * 200) for i in range(1, 4)]
    got = list(threshold_batches(rows, cfg))
    assert [len(b) for _, b in got] == [1, 1, 1]


def test_flush_on_interval():
    # rows 10s apart, 30s interval -> flush once the span reaches 30s
    cfg = BatchConfig(max_records=10**6, max_bytes=10**9, flush_interval_seconds=30)
    rows = [row(i, sec=10 * (i - 1)) for i in range(1, 9)]
    got = list(threshold_batches(rows, cfg))
    # spans: row4 is 30s after row1 -> flush; row8 is 30s after row5
    assert [len(b) for _, b in got] == [4, 4]
    assert [bid for bid, _ in got] == [1, 5]


def test_resume_stability_of_batch_ids():
    """Replaying the tail of the log after a resume must produce the
    same batch ids for the same events — never renumber from zero."""
    cfg = BatchConfig(max_records=3, max_bytes=10**9, flush_interval_seconds=10**6)
    rows = [row(i) for i in range(1, 10)]
    full = {bid: [r[0] for r in b] for bid, b in threshold_batches(rows, cfg)}
    resumed = {
        bid: [r[0] for r in b]
        for bid, b in threshold_batches([r for r in rows if r[0] > 3], cfg)
    }
    for bid, seqs in resumed.items():
        assert bid == seqs[0]
        assert bid not in full or full[bid] == seqs


def test_trigger_kwargs():
    cfg = BatchConfig(flush_interval_seconds=45)
    assert trigger_kwargs(cfg, available_now=True) == {"availableNow": True}
    assert trigger_kwargs(None, available_now=False) == {"availableNow": True}
    assert trigger_kwargs(cfg, available_now=False) == {
        "processingTime": "45 seconds"
    }


def test_source_rate_options():
    cfg = BatchConfig(max_records=50_000)
    assert source_rate_options(cfg, avg_rows_per_file=10_000) == {
        "maxFilesPerTrigger": "5"
    }
    assert source_rate_options(cfg, avg_rows_per_file=10**9) == {
        "maxFilesPerTrigger": "1"
    }
    assert source_rate_options(cfg, avg_rows_per_file=0) == {
        "maxFilesPerTrigger": "1"
    }
