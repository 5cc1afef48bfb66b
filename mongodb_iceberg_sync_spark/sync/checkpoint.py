"""Sync checkpoint table (reference A10/A18-A20).

One row per sync in a `_sync_checkpoints` table with the reference's
exact schema (docs/design.md:318-328): sync_id PK, state,
source_database, source_collection, resume_token, high_water_mark_id,
documents_processed, last_snapshot_id, updated_at. Upsert keyed on
sync_id (docs/design.md:330-337).

The table is tiny (one row per synced collection), so the pure-parquet
upsert is a read-modify-overwrite of a single file — the Iceberg
backend would use MERGE INTO on sync_id.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession

# reference docs/design.md:350-358 states
STATE_INITIAL_SYNC = "INITIAL_SYNC"
STATE_STEADY_STATE = "STEADY_STATE"

# restart decisions (reference A20)
RUN_INITIAL_SYNC = "RUN_INITIAL_SYNC"
RESUME_INITIAL_SYNC = "RESUME_INITIAL_SYNC"
RESUME_STEADY_STATE = "RESUME_STEADY_STATE"


@dataclass
class Checkpoint:
    sync_id: str  # "{namespace}.{table}"
    state: str
    source_database: str
    source_collection: str
    resume_token: str | None  # JSON
    high_water_mark_id: str | None  # JSON
    documents_processed: int
    last_snapshot_id: int | None
    updated_at: str


class CheckpointStore:
    """JSON-file-backed store with a Spark DataFrame view.

    The durable format is newline-JSON (atomic tmp+rename per write —
    checkpoint writes must not be torn, reference docs/design.md:339-348);
    `as_dataframe` exposes it as the `_sync_checkpoints` table shape for
    queries.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _read_all(self) -> dict[str, Checkpoint]:
        if not os.path.exists(self.path):
            return {}
        out: dict[str, Checkpoint] = {}
        with open(self.path) as fh:
            for line in fh:
                if line.strip():
                    d = json.loads(line)
                    out[d["sync_id"]] = Checkpoint(**d)
        return out

    def read(self, sync_id: str) -> Checkpoint | None:
        return self._read_all().get(sync_id)

    def upsert(self, cp: Checkpoint) -> None:
        cp.updated_at = datetime.now(timezone.utc).isoformat()
        all_cps = self._read_all()
        all_cps[cp.sync_id] = cp
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            for c in all_cps.values():
                fh.write(json.dumps(asdict(c)) + "\n")
        os.replace(tmp, self.path)

    def delete(self, sync_id: str) -> None:
        all_cps = self._read_all()
        all_cps.pop(sync_id, None)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            for c in all_cps.values():
                fh.write(json.dumps(asdict(c)) + "\n")
        os.replace(tmp, self.path)

    def as_dataframe(self, spark: SparkSession):
        rows = [asdict(c) for c in self._read_all().values()]
        schema = (
            "sync_id string, state string, source_database string, "
            "source_collection string, resume_token string, "
            "high_water_mark_id string, documents_processed long, "
            "last_snapshot_id long, updated_at string"
        )
        df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
        # reference schema declares updated_at TIMESTAMP
        # (docs/design.md:327); the durable JSON stores ISO-8601 text
        from pyspark.sql import functions as F

        return df.withColumn("updated_at", F.to_timestamp("updated_at"))

    def restart_decision(self, sync_id: str) -> str:
        """Reference A20 (docs/design.md:350-358): no row → fresh run;
        INITIAL_SYNC → resume backfill from HWM; STEADY_STATE → resume
        the change stream from the token."""
        cp = self.read(sync_id)
        if cp is None:
            return RUN_INITIAL_SYNC
        if cp.state == STATE_INITIAL_SYNC:
            return RESUME_INITIAL_SYNC
        return RESUME_STEADY_STATE
