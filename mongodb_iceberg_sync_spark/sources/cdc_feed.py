"""Synthetic CDC event feed (FIXTURES.md §3 shape).

Stands in for a MongoDB change stream (reference A2): a totally-ordered
log of typed change events. Batch form feeds sync-engine tests; file
form feeds Structured Streaming (each file = one micro-batch of the
"stream", exactly how Spark's file source incrementalizes).

Schema: op_seq long, op_type string, doc_id string, ts timestamp,
full_doc string (JSON; null for deletes — UPDATE_LOOKUP semantics,
reference docs/design.md:126).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

CDC_SCHEMA = (
    "op_seq long, op_type string, doc_id string, ts timestamp, full_doc string"
)


def make_events(
    n_docs: int = 20,
    n_ops: int = 200,
    delete_every: int = 7,
    invalidate_at: int | None = None,
    start_seq: int = 1,
) -> list[tuple]:
    """Deterministic synthetic op log: round-robin upserts with periodic
    deletes (and optionally one invalidate)."""
    base_ts = datetime(2024, 1, 1)
    rows = []
    for i in range(n_ops):
        seq = start_seq + i
        doc = i % n_docs
        if invalidate_at is not None and i == invalidate_at:
            rows.append((seq, "invalidate", None, base_ts + timedelta(seconds=i), None))
            continue
        if i > 0 and i % delete_every == 0:
            rows.append(
                (seq, "delete", f"doc{doc}", base_ts + timedelta(seconds=i), None)
            )
        else:
            op = "insert" if i < n_docs else ("replace" if i % 11 == 0 else "update")
            payload = json.dumps({"_id": f"doc{doc}", "v": i, "seq": seq})
            rows.append(
                (seq, op, f"doc{doc}", base_ts + timedelta(seconds=i), payload)
            )
    return rows


def events_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    # Arrow path via pandas: a list-of-tuples createDataFrame becomes a
    # 32-slice pickled Python RDD, and any downstream coalesce(1) then
    # evaluates all slices sequentially through Python workers (~6s of
    # pure overhead per tiny batch). The pandas form is a JVM-local
    # Arrow relation — no Python workers at execution time.
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["op_seq", "op_type", "doc_id", "ts", "full_doc"], dtype=object
    )
    return spark.createDataFrame(pdf, CDC_SCHEMA)


def expected_final_state(rows: list[tuple]) -> dict[str, dict]:
    """Python oracle: replay the log sequentially (the trivially-correct
    implementation the distributed one must match)."""
    state: dict[str, dict] = {}
    for seq, op, doc_id, _ts, payload in sorted(rows):
        if op in ("insert", "update", "replace"):
            state[doc_id] = json.loads(payload)
        elif op == "delete":
            state.pop(doc_id, None)
        elif op in ("drop", "rename", "invalidate"):
            state.clear()
    return state


def write_stream_source(
    spark: SparkSession, rows: list[tuple], path: str, files: int = 4
) -> str:
    """Write the op log as N parquet files (one per micro-batch) for
    the Structured Streaming file source."""
    os.makedirs(path, exist_ok=True)
    chunk = max(1, (len(rows) + files - 1) // files)
    for i in range(0, len(rows), chunk):
        df = events_df(spark, rows[i : i + chunk]).coalesce(1)
        df.write.mode("append").parquet(path)
    return path


def read_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file ≙ one micro-batch
        .parquet(path)
    )
