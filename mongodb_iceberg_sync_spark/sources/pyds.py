"""`mongo_cdc_sim` — the CDC feed as a NATIVE Spark data source.

The reference's change-stream source (A2, docs/design.md:111-126) is a
client-side cursor; in Spark the idiomatic integration point is the
Python Data Source API (Spark 4, SPARK-44076): a registered format
usable from both `spark.read` and `spark.readStream`, with the engine
owning partitioning, scheduling, and streaming offsets. This module
wraps the deterministic synthetic op log (sources/cdc_feed.py,
FIXTURES.md §3 schema) as such a source:

    spark.dataSource.register(cdc_sim_datasource())
    spark.read.format("mongo_cdc_sim").option("n_ops", 200).load()
    spark.readStream.format("mongo_cdc_sim").option("batch_size", 50)...

Batch reads SPLIT the log across ``partitions`` input partitions (each
executor task generates only its op_seq slice — the scan parallelizes
like any file source, no driver materialization). Streaming reads
expose the op_seq as the OFFSET axis; the committed offset IS the
resume token: a restarted query reads it back from its checkpoint and
continues where the last run committed (reference A9/A18;
sync/checkpoint.py stores the same position durably for the engine).

Every class is defined INSIDE the factory so cloudpickle serializes
them BY VALUE: data-source readers run in executor Python workers,
which re-import pickled-by-reference classes and fail with
ModuleNotFoundError whenever this repo is not on the worker's
sys.path (the exact bug the out-of-repo driver simulation catches;
same pattern as streaming/stateful.py's processor class). A real
MongoDB deployment would swap the generator for a pymongo cursor per
partition (sources/mongo_live.py has the wire protocol); the
Spark-facing contract — schema, partition planning, offset algebra —
is what this module pins.
"""

from __future__ import annotations

from .cdc_feed import CDC_SCHEMA

_DEFAULTS = {"n_docs": 20, "n_ops": 200, "delete_every": 7}


def cdc_sim_datasource():
    """Build the DataSource class (pickle-by-value; see module doc)."""
    import json
    from datetime import datetime, timedelta

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    schema_str = CDC_SCHEMA
    defaults = dict(_DEFAULTS)

    def _gen_rows(lo: int, hi: int, n_docs: int, delete_every: int):
        # rows i in [lo, hi) of the deterministic op log — the same log
        # cdc_feed.make_events builds, generated slice-locally so a
        # partition never touches another partition's range (op_seq=i+1)
        base_ts = datetime(2024, 1, 1)
        for i in range(lo, hi):
            seq, doc = i + 1, i % n_docs
            ts = base_ts + timedelta(seconds=i)
            if i > 0 and i % delete_every == 0:
                yield (seq, "delete", f"doc{doc}", ts, None)
            else:
                op = (
                    "insert"
                    if i < n_docs
                    else ("replace" if i % 11 == 0 else "update")
                )
                yield (
                    seq,
                    op,
                    f"doc{doc}",
                    ts,
                    json.dumps({"_id": f"doc{doc}", "v": i, "seq": seq}),
                )

    class _Slice(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo, self.hi = lo, hi

    class CdcSimBatchReader(DataSourceReader):
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", defaults["n_docs"]))
            self.n_ops = int(options.get("n_ops", defaults["n_ops"]))
            self.delete_every = int(
                options.get("delete_every", defaults["delete_every"])
            )
            self.n_parts = int(options.get("partitions", 4))

        def partitions(self):
            step = max(1, -(-self.n_ops // self.n_parts))
            return [
                _Slice(lo, min(lo + step, self.n_ops))
                for lo in range(0, self.n_ops, step)
            ]

        def read(self, partition):
            yield from _gen_rows(
                partition.lo, partition.hi, self.n_docs, self.delete_every
            )

    class CdcSimStreamReader(DataSourceStreamReader):
        # latestOffset reports the current log end (an availableNow run
        # drains to it and terminates); batch_size bounds rows per
        # INPUT PARTITION, so a large catch-up range still scans as
        # many parallel tasks, never one monolith
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", defaults["n_docs"]))
            self.n_ops = int(options.get("n_ops", defaults["n_ops"]))
            self.delete_every = int(
                options.get("delete_every", defaults["delete_every"])
            )
            self.batch_size = int(options.get("batch_size", 50))

        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            return {"pos": self.n_ops}

        def partitions(self, start, end):
            lo, hi = start["pos"], end["pos"]
            return [
                _Slice(p, min(p + self.batch_size, hi))
                for p in range(lo, hi, self.batch_size)
            ] or [_Slice(lo, hi)]

        def read(self, partition):
            yield from _gen_rows(
                partition.lo, partition.hi, self.n_docs, self.delete_every
            )

        def commit(self, end):
            pass  # offsets are deterministic replay positions

        def stop(self):
            pass

    class CdcSimDataSource(DataSource):
        @classmethod
        def name(cls):
            return "mongo_cdc_sim"

        def schema(self):
            return schema_str

        def reader(self, schema: StructType):
            return CdcSimBatchReader(self.options)

        def streamReader(self, schema: StructType):
            return CdcSimStreamReader(self.options)

    return CdcSimDataSource


def register_cdc_sim(spark) -> None:
    """Idempotently register the format on a session."""
    try:
        spark.dataSource.register(cdc_sim_datasource())
    except Exception:
        pass  # already registered under this name
