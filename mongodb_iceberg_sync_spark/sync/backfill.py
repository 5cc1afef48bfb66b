"""Initial-sync backfill (reference A1/A9/A10/A22).

Reference algorithm (docs/design.md:88-99): open the change stream
FIRST to capture token T0, then scan the collection in _id order from
the high-water-mark, appending in chunks and checkpointing the HWM; on
completion, steady-state resumes from T0 — the overlap window is
deduplicated by key (A22).

Spark-first shape: the "scan" is one declarative filtered read —
`filter(key > hwm)` pushes into the parquet/Mongo scan; chunking for
resumability uses deterministic key ranges instead of a cursor, so
each chunk is an independent, retryable, *parallel* job. On 100 TB the
chunk boundary choice = partition pruning boundary.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import STATE_INITIAL_SYNC, STATE_STEADY_STATE, Checkpoint, CheckpointStore
from .table_store import MorTable


def run_backfill(
    source: DataFrame,
    table: MorTable,
    store: CheckpointStore,
    sync_id: str,
    key: str,
    source_database: str = "db",
    source_collection: str = "collection",
    chunk_rows: int = 100_000,
    stream_token_t0: str | None = None,
    fail_after_chunks: int | None = None,  # test hook: simulate crash
) -> Checkpoint:
    """Chunked, resumable snapshot scan. Resumes from the checkpoint
    HWM if one exists (reference RESUME_INITIAL_SYNC path)."""
    cp = store.read(sync_id)
    if cp is None:
        cp = Checkpoint(
            sync_id=sync_id,
            state=STATE_INITIAL_SYNC,
            source_database=source_database,
            source_collection=source_collection,
            resume_token=stream_token_t0,  # T0 captured BEFORE the scan (A22)
            high_water_mark_id=None,
            documents_processed=0,
            last_snapshot_id=None,
            updated_at=datetime.now(timezone.utc).isoformat(),
        )
        store.upsert(cp)

    # The checkpoint stores the HWM as a string (reference
    # docs/design.md:324 — JSON column); convert back to the key
    # column's own type so the resume predicate compares correctly for
    # numeric AND string keys (e.g. ObjectId-style ids).
    if cp.high_water_mark_id is None:
        hwm = None
    else:
        ktype = dict(source.dtypes).get(key, "string")
        if ktype in ("tinyint", "smallint", "int", "bigint"):
            hwm = int(cp.high_water_mark_id)
        elif ktype in ("float", "double"):
            hwm = float(cp.high_water_mark_id)
        else:
            hwm = cp.high_water_mark_id
    chunks_done = 0
    while True:
        remaining = source if hwm is None else source.filter(F.col(key) > F.lit(hwm))
        # deterministic chunk: next `chunk_rows` keys in key order. The
        # bound is computed with an aggregation (cheap: min/max + count
        # pushdown-friendly), then the chunk itself is a pure filter.
        bound_row = (
            remaining.select(key)
            .orderBy(key)
            .limit(chunk_rows)
            .agg(F.max(key).alias("hi"), F.count("*").alias("n"))
            .head()
        )
        if not bound_row or bound_row.n == 0:
            break
        chunk = remaining.filter(F.col(key) <= F.lit(bound_row.hi))
        table.append_base(chunk)
        hwm = bound_row.hi
        cp.high_water_mark_id = str(hwm)
        cp.documents_processed += bound_row.n
        store.upsert(cp)  # HWM checkpoint per chunk (A10)
        chunks_done += 1
        if fail_after_chunks is not None and chunks_done >= fail_after_chunks:
            raise RuntimeError("simulated backfill crash (test hook)")

    cp.state = STATE_STEADY_STATE  # handoff (A22): stream resumes from T0
    store.upsert(cp)
    return cp
