"""Live change-stream wire source (sources/mongo_live.py) driven by a
deterministic pymongo-shaped fake cursor — the sandbox has no MongoDB,
so these tests pin the full tail → normalize → three-threshold batch →
atomic parquet → checkpoint-after-write loop the real wire would use.
A pymongo-marked integration test is skipped unless pymongo exists."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import pytest

from mongodb_iceberg_sync_spark.sources.cdc_feed import CDC_SCHEMA
from mongodb_iceberg_sync_spark.sources.mongo_live import (
    PYMONGO_AVAILABLE,
    ChangeStreamTailer,
    normalize_event,
)
from mongodb_iceberg_sync_spark.sync.checkpoint import CheckpointStore
from mongodb_iceberg_sync_spark.sync.config import BatchConfig

BASE = datetime(2024, 3, 1)


def change(i: int, op: str, doc: int, full: bool = True) -> dict:
    """One pymongo-shaped change-stream document."""
    c = {
        "_id": {"_data": f"tok{i:04d}"},  # resume token
        "operationType": op,
        "clusterTime": BASE + timedelta(seconds=i),
        "documentKey": {"_id": f"doc{doc}"},
    }
    if op in ("insert", "update", "replace") and full:
        c["fullDocument"] = {"_id": f"doc{doc}", "v": i}
    return c


def wire(n: int = 20) -> list[dict]:
    ops = ["insert", "update", "replace", "delete"]
    return [change(i, ops[i % 4], i % 5) for i in range(n)]


# ---------------------------------------------------------------- unit


def test_normalize_maps_data_ops():
    ev = normalize_event(change(3, "update", 1), op_seq=42)
    assert ev[0] == 42 and ev[1] == "update" and ev[2] == "doc1"
    assert ev[3] == BASE + timedelta(seconds=3)
    assert json.loads(ev[4]) == {"_id": "doc1", "v": 3}


def test_normalize_delete_has_null_payload():
    ev = normalize_event(change(1, "delete", 2), op_seq=1)
    assert ev[1] == "delete" and ev[2] == "doc2" and ev[4] is None


def test_normalize_invalidate_passthrough():
    ev = normalize_event({"operationType": "invalidate"}, op_seq=9)
    assert ev[1] == "invalidate" and ev[2] is None and ev[4] is None


def test_normalize_update_lookup_race_downgrades_to_delete():
    # updateLookup returned no document (deleted before the lookup):
    # the tuple must not claim an upsert with a null payload.
    ev = normalize_event(change(5, "update", 3, full=False), op_seq=5)
    assert ev[1] == "delete" and ev[4] is None


def test_normalize_unknown_op_raises():
    with pytest.raises(ValueError):
        normalize_event({"operationType": "shardCollection"}, op_seq=1)


# ------------------------------------------------------------- tailer


def _tailer(events, tmp_path, **kw):
    store = CheckpointStore(str(tmp_path / "cp.jsonl"))
    out = str(tmp_path / "feed")
    return (
        ChangeStreamTailer(
            iter(events),
            out_dir=out,
            store=store,
            sync_id="db.coll",
            batch=kw.pop("batch", BatchConfig(max_records=6, max_bytes=1 << 30,
                                              flush_interval_seconds=3600)),
            **kw,
        ),
        store,
        out,
    )


def test_tailer_batches_and_checkpoints(tmp_path):
    tailer, store, out = _tailer(wire(20), tmp_path)
    n = tailer.run()
    assert n == 4  # ceil(20/6) batches of <=6 records
    files = sorted(os.listdir(out))
    assert len(files) == 4 and all(f.endswith(".parquet") for f in files)
    assert not any(f.startswith(".") for f in files)  # no torn tmp left
    cp = store.read("db.coll")
    assert cp is not None
    assert json.loads(cp.resume_token)["_data"] == "tok0019"  # last event
    assert json.loads(cp.high_water_mark_id)["next_seq"] == 21
    assert cp.documents_processed == 20


def test_tailer_resume_continues_sequence(tmp_path):
    t1, store, out = _tailer(wire(8), tmp_path)
    t1.run()
    # second tailer session on the SAME store: op_seq continues, the
    # stable batch-id contract (first op_seq) holds across restarts
    t2 = ChangeStreamTailer(
        iter([change(100 + i, "insert", 9) for i in range(3)]),
        out_dir=out,
        store=store,
        sync_id="db.coll",
        batch=BatchConfig(max_records=6, max_bytes=1 << 30,
                          flush_interval_seconds=3600),
    )
    t2.run()
    cp = store.read("db.coll")
    assert json.loads(cp.high_water_mark_id)["next_seq"] == 12
    assert cp.documents_processed == 11


def test_tailer_quarantines_unknown_ops(tmp_path):
    events = wire(6) + [{"operationType": "shardCollection", "_id": {"_data": "x"}}]
    tailer, store, _ = _tailer(events, tmp_path)
    tailer.run()
    assert len(tailer.quarantined) == 1
    assert store.read("db.coll").documents_processed == 6


def test_tailer_output_is_engine_readable(spark, tmp_path):
    """The parquet files the tailer writes are byte-compatible with the
    engine's CDC_SCHEMA file-stream source — same columns, same types,
    replayable through the sequential oracle."""
    from mongodb_iceberg_sync_spark.sources.cdc_feed import expected_final_state

    tailer, _, out = _tailer(wire(20), tmp_path)
    tailer.run()
    df = spark.read.schema(CDC_SCHEMA).parquet(out)
    rows = [tuple(r) for r in df.orderBy("op_seq").collect()]
    assert len(rows) == 20
    assert [r[0] for r in rows] == list(range(1, 21))  # dense op_seq
    # replay through the engine's sequential-state oracle: final state
    # reflects LWW of the synthetic op mix (keys 0..4, delete every 4th)
    state = expected_final_state(rows)
    assert set(state) <= {f"doc{i}" for i in range(5)}
    for doc in state.values():
        assert set(doc) == {"_id", "v"}


_MONGO_URL = os.environ.get("SPARK_GRAFT_MONGO_URL")


@pytest.mark.skipif(
    not (PYMONGO_AVAILABLE and _MONGO_URL),
    reason="wire lane: needs pymongo + SPARK_GRAFT_MONGO_URL pointing at a "
    "replica set (sandbox has neither)",
)
def test_live_wire_integration():  # pragma: no cover - integration lane
    """Real-wire lane: insert/update/delete against a live replica set
    and assert open_change_stream + normalize_event reproduce the exact
    CDC tuples the fake-tailer tests pin. Activates the day the
    environment provides a MongoDB (SPARK_GRAFT_MONGO_URL); skips
    cleanly here."""
    import pymongo

    from mongodb_iceberg_sync_spark.sources.mongo_live import (
        normalize_event,
        open_change_stream,
    )

    import time as _time

    client = pymongo.MongoClient(_MONGO_URL, serverSelectionTimeoutMS=5000)
    coll = client["mis_it"]["wire"]
    coll.drop()
    with open_change_stream(coll) as stream:
        coll.insert_one({"_id": "w1", "v": 1})
        coll.update_one({"_id": "w1"}, {"$set": {"v": 2}})
        coll.delete_one({"_id": "w1"})
        got = []
        deadline = _time.monotonic() + 60
        # try_next + deadline: a blocking `for change in stream` would
        # wedge the whole pytest run if an expected event never arrives
        while len(got) < 3 and _time.monotonic() < deadline:
            change = stream.try_next()
            if change is None:
                _time.sleep(0.2)
                continue
            got.append(normalize_event(change, op_seq=len(got)))
    assert len(got) == 3, f"expected 3 events within 60s, got {len(got)}: {got}"
    ops = [g[1] for g in got]
    assert ops == ["insert", "update", "delete"]
    assert all(g[2] == "w1" for g in got)
