"""Three-threshold flush batching (reference A16).

The reference flushes its RecordBuffer when ANY of three thresholds is
hit: maxRecords=50000, maxBytes=128MB, flushIntervalSeconds=60
(reference BatchConfig.java:8-30, docs/design.md:366-374). In Spark the
micro-batch IS the buffer, so the thresholds map onto two places:

  1. `threshold_batches` — cuts an ordered event log into flush
     batches by the three thresholds. This is the batch/demo-engine
     analog of RecordBuffer: the time threshold uses EVENT time span
     (deterministic, testable) rather than wall clock, which is the
     batch-replay equivalent of "60s since last flush".
  2. `trigger_kwargs` / `source_rate_options` — derive the Structured
     Streaming trigger interval from flushIntervalSeconds and a source
     rate limit (files per trigger) from maxRecords, so a live stream
     honors the same contract.

Batch ids are the FIRST op_seq of each batch — globally stable across
resumes (a requirement of MorTable's idempotent batch-id commit
protocol: replaying after a crash must regenerate the same ids for the
same events, never renumber from zero).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from datetime import datetime

from .config import BatchConfig


def _default_size_of(row: tuple) -> int:
    # cheap estimate: string payload bytes + fixed per-row overhead
    return sum(len(x) for x in row if isinstance(x, str)) + 16


def _default_time_of(row: tuple) -> datetime | None:
    for x in row:
        if isinstance(x, datetime):
            return x
    return None


def _default_seq_of(row: tuple) -> int:
    return int(row[0])


def threshold_batches(
    rows: Iterable[tuple],
    batch: BatchConfig,
    size_of: Callable[[tuple], int] = _default_size_of,
    time_of: Callable[[tuple], datetime | None] = _default_time_of,
    seq_of: Callable[[tuple], int] = _default_seq_of,
) -> Iterator[tuple[int, list[tuple]]]:
    """Yield (batch_id, rows) flush batches from an ordered op log.

    A batch flushes as soon as ANY threshold is reached (reference
    semantics: check after each add, docs/design.md:366-374):
      - len(rows) >= max_records
      - accumulated estimated bytes >= max_bytes
      - event-time span >= flush_interval_seconds

    batch_id = first row's op_seq: stable across resumes regardless of
    where the log was truncated by the resume filter.
    """
    buf: list[tuple] = []
    buf_bytes = 0
    t0: datetime | None = None
    for row in rows:
        if not buf:
            t0 = time_of(row)
        buf.append(row)
        buf_bytes += size_of(row)
        ts = time_of(row)
        span = (ts - t0).total_seconds() if ts is not None and t0 is not None else 0.0
        if (
            len(buf) >= batch.max_records
            or buf_bytes >= batch.max_bytes
            or span >= batch.flush_interval_seconds
        ):
            yield (seq_of(buf[0]), buf)
            buf, buf_bytes, t0 = [], 0, None
    if buf:
        yield (seq_of(buf[0]), buf)


def trigger_kwargs(batch: BatchConfig | None, available_now: bool = True) -> dict:
    """Streaming trigger derived from the batch config: drain-and-stop
    for tests/catchup, else a processingTime trigger equal to the
    reference's flushIntervalSeconds."""
    if available_now or batch is None:
        return {"availableNow": True}
    return {"processingTime": f"{batch.flush_interval_seconds} seconds"}


def source_rate_options(batch: BatchConfig, avg_rows_per_file: int) -> dict[str, str]:
    """File-source rate limit honoring maxRecords: cap files per
    micro-batch so a trigger ingests ~max_records rows (the file-source
    analog of maxOffsetsPerTrigger)."""
    if avg_rows_per_file <= 0:
        return {"maxFilesPerTrigger": "1"}
    return {
        "maxFilesPerTrigger": str(max(1, batch.max_records // avg_rows_per_file))
    }
