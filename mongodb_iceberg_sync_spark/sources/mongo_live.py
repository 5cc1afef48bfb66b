"""Live MongoDB change-stream wire source (reference A2, the
ChangeStreamSyncManager algorithm in docs/design.md:107-127).

Bridges a real ``collection.watch(...)`` cursor to the engine's
canonical CDC event log: wire events are normalized to the
``CDC_SCHEMA`` tuple shape and appended as parquet files to the same
directory ``sources.cdc_feed.read_stream`` tails — so every downstream
stage (three-threshold batching, apply, MoR sink, IVM, checkpointing)
is IDENTICAL for the wire source and the synthetic test feed. The
tailer is the only component that knows MongoDB exists.

Reference-parity decisions (docs/design.md:108-127):
  * the stream opens with ``full_document='updateLookup'`` so updates
    carry the complete document (the mapper never needs a read-back);
  * insert/replace/update → upsert event, delete → keyed delete,
    drop/rename/invalidate → passed through for the engine's
    re-initial-sync handling (``sync/engine.py``);
  * the resume token is checkpointed ONLY AFTER the batch file is
    durably written (step 3d "update checkpoint with latest resume
    token" happens after 3a-3c commit) — a crash between write and
    checkpoint replays the batch, and MorTable's stable batch ids
    (first op_seq) make the replay idempotent;
  * transient cursor errors resume from the last checkpointed token
    (the engine's backoff wrapper, reference A30, drives the retry).

``pymongo``/``bson`` are NOT installed in this sandbox, so everything
network-facing is import-gated: ``open_change_stream`` raises a clear
error without pymongo, while ``ChangeStreamTailer`` accepts ANY
iterator of change documents plus a ``resume_token_of`` accessor
(duck-typed — pymongo's ``ChangeStream`` satisfies it natively).
``tests/test_mongo_live.py`` drives the full tail→normalize→batch→
parquet→checkpoint loop with a deterministic fake cursor.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterable, Iterator
from datetime import datetime, timezone

from ..sync.batching import threshold_batches
from ..sync.checkpoint import (
    STATE_STEADY_STATE,
    Checkpoint,
    CheckpointStore,
)
from ..sync.config import BatchConfig

try:  # pragma: no cover - not installed in this sandbox
    import pymongo  # noqa: F401

    PYMONGO_AVAILABLE = True
except ImportError:
    PYMONGO_AVAILABLE = False

try:  # pragma: no cover - bson ships with pymongo
    from bson import json_util as _bson_json
except ImportError:
    _bson_json = None

#: change-stream operation types the engine applies as data events
DATA_OPS = ("insert", "update", "replace", "delete")
#: operation types that invalidate the stream → re-initial-sync
INVALIDATE_OPS = ("drop", "rename", "invalidate")


def _dumps_full_document(doc: dict | None) -> str | None:
    """Serialize fullDocument preserving BSON types.

    With bson installed this is MongoDB extended JSON ($oid/$date/
    $numberDecimal/...), which is exactly what the A6 type mapper
    (``sync/mapper.py``) decodes back to logical Iceberg types. The
    fallback (str() for unknown types) only runs in bson-less test
    environments feeding plain dicts.
    """
    if doc is None:
        return None
    if _bson_json is not None:  # pragma: no cover - sandbox has no bson
        return _bson_json.dumps(doc)
    return json.dumps(doc, default=str, sort_keys=True)


def _ts_of(change: dict) -> datetime:
    """Event time from clusterTime (BSON Timestamp has .time seconds);
    plain datetimes pass through; absent → epoch (ordering then rides
    entirely on op_seq, which is always assigned)."""
    ct = change.get("clusterTime")
    if isinstance(ct, datetime):
        return ct
    t = getattr(ct, "time", None)
    if t is not None:
        return datetime.fromtimestamp(int(t), tz=timezone.utc).replace(tzinfo=None)
    return datetime(1970, 1, 1)


def normalize_event(change: dict, op_seq: int) -> tuple:
    """Map one change-stream document to the canonical CDC tuple
    ``(op_seq, op_type, doc_id, ts, full_doc)`` (CDC_SCHEMA).

    Unknown operation types raise — the caller routes them to the
    dead-letter quarantine (``sync/quarantine.py``) rather than
    guessing at semantics.
    """
    op = change.get("operationType")
    if op not in DATA_OPS and op not in INVALIDATE_OPS:
        raise ValueError(f"unsupported change-stream operationType: {op!r}")
    key = change.get("documentKey") or {}
    raw_id = key.get("_id")
    doc_id = None if raw_id is None else str(raw_id)
    if op in ("insert", "update", "replace") and change.get("fullDocument") is None:
        # updateLookup lost the race with a subsequent delete: the
        # document no longer exists. The delete event that follows is
        # authoritative; emit a delete-shaped no-op for this key.
        op = "delete"
    full_doc = (
        _dumps_full_document(change.get("fullDocument"))
        if op in ("insert", "update", "replace")
        else None
    )
    return (op_seq, op, doc_id, _ts_of(change), full_doc)


def open_change_stream(collection, resume_token: dict | None = None):
    """Open a real change stream (requires pymongo). Kept tiny so the
    entire wire dependency is this one call."""
    if not PYMONGO_AVAILABLE:  # pragma: no cover
        raise RuntimeError(
            "pymongo is not installed — install it to tail a live "
            "MongoDB change stream, or feed ChangeStreamTailer any "
            "iterator of change documents (see tests/test_mongo_live.py)"
        )
    return collection.watch(
        full_document="updateLookup", resume_after=resume_token
    )  # pragma: no cover


def _write_parquet_batch(rows: list[tuple], out_dir: str) -> str:
    """Append one micro-batch file in CDC_SCHEMA parquet shape, written
    atomically (tmp + rename) so the Structured Streaming file source
    can never observe a torn file. Pure pyarrow — the tailer is a
    lightweight sidecar process, it does not need a SparkSession."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows, strict=True))
    table = pa.table(
        {
            "op_seq": pa.array(cols[0], pa.int64()),
            "op_type": pa.array(cols[1], pa.string()),
            "doc_id": pa.array(cols[2], pa.string()),
            "ts": pa.array(cols[3], pa.timestamp("us")),
            "full_doc": pa.array(cols[4], pa.string()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    name = f"wire-{rows[0][0]:020d}-{uuid.uuid4().hex[:8]}.parquet"
    tmp = os.path.join(out_dir, f".{name}.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(out_dir, name))
    return name


class ChangeStreamTailer:
    """Tail a change stream into the engine's file-stream directory.

    Parameters
    ----------
    changes : Iterable[dict]
        Any iterator of change-stream documents — a pymongo
        ``ChangeStream`` or a test fake. Exhausting it ends ``run()``
        (a live cursor blocks instead, so ``run`` is the daemon loop).
    out_dir : str
        Directory ``sources.cdc_feed.read_stream`` tails.
    store / sync_id :
        Checkpoint store + row key for resume-token persistence.
    batch : BatchConfig
        The reference's three flush thresholds (A16).
    resume_token_of :
        Accessor for the token that resumes AFTER a given change;
        defaults to the change's ``_id`` field (pymongo semantics).
    """

    def __init__(
        self,
        changes: Iterable[dict],
        out_dir: str,
        store: CheckpointStore,
        sync_id: str,
        batch: BatchConfig | None = None,
        source_database: str = "",
        source_collection: str = "",
        resume_token_of=lambda change: change.get("_id"),
    ):
        self.changes = changes
        self.out_dir = out_dir
        self.store = store
        self.sync_id = sync_id
        self.batch = batch or BatchConfig()
        self.source_database = source_database
        self.source_collection = source_collection
        self.resume_token_of = resume_token_of
        self.quarantined: list[dict] = []

    def _next_seq(self) -> int:
        cp = self.store.read(self.sync_id)
        if cp and cp.high_water_mark_id:
            return int(json.loads(cp.high_water_mark_id)["next_seq"])
        return 1

    def _events(self, start_seq: int) -> Iterator[tuple]:
        """Normalize the wire, tagging each tuple with its resume token
        (ridden along out-of-band, stripped before the parquet write)."""
        seq = start_seq
        for change in self.changes:
            try:
                ev = normalize_event(change, seq)
            except ValueError:
                self.quarantined.append(change)  # engine DLQs these
                continue
            seq += 1
            yield (*ev, self.resume_token_of(change))

    def run(self, max_batches: int | None = None) -> int:
        """Drain the stream into flush batches; returns batches written.

        Commit order per batch (docs/design.md:118-122): (1) parquet
        file durably renamed into place, (2) THEN resume token +
        next_seq checkpointed. At-least-once on crash; idempotent
        downstream because batch ids derive from op_seq, not arrival.
        """
        start_seq = self._next_seq()
        n = 0
        batches = threshold_batches(
            self._events(start_seq),
            self.batch,
            # token tail rides the tuple; exclude it from size estimate
            size_of=lambda r: sum(len(x) for x in r[:5] if isinstance(x, str)) + 16,
            time_of=lambda r: r[3],
            seq_of=lambda r: int(r[0]),
        )
        for _batch_id, tagged in batches:
            rows = [t[:5] for t in tagged]
            _write_parquet_batch(rows, self.out_dir)
            last = tagged[-1]
            self._checkpoint(
                resume_token=last[5], next_seq=int(last[0]) + 1, n_rows=len(rows)
            )
            n += 1
            if max_batches is not None and n >= max_batches:
                break
        return n

    def _checkpoint(self, resume_token, next_seq: int, n_rows: int) -> None:
        prev = self.store.read(self.sync_id)
        done = (prev.documents_processed if prev else 0) + n_rows
        self.store.upsert(
            Checkpoint(
                sync_id=self.sync_id,
                state=STATE_STEADY_STATE,
                source_database=self.source_database,
                source_collection=self.source_collection,
                resume_token=json.dumps(resume_token, default=str),
                high_water_mark_id=json.dumps({"next_seq": next_seq}),
                documents_processed=done,
                last_snapshot_id=prev.last_snapshot_id if prev else None,
                updated_at=datetime.now(timezone.utc).isoformat(),
            )
        )
