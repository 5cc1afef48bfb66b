"""`manifest_sink` — a NATIVE Spark data source WRITER with an
Iceberg-style commit protocol (Python Data Source API, Spark 4,
SPARK-44076 write path).

The read-side twin (sources/pyds.py) showed the CDC feed as a
registered format; this module pins the WRITE contract the sync engine
relies on (reference A15 append sink + A21 commit atomicity,
docs/design.md:351-420), expressed through the engine's own sink API
instead of a hand-rolled foreachBatch:

- each TASK writes one JSON-lines part file under ``<path>/data/`` and
  returns a WriterCommitMessage carrying (file, row count, byte size);
- the DRIVER's ``commit()`` aggregates the messages into a manifest
  JSON written via temp-file + atomic rename — the snapshot-pointer
  swap. A reader that trusts only the manifest never sees a torn
  write: part files from failed/aborted attempts are ORPHANS that
  manifest-scoped reads skip (MorTable's WAP/orphan contract,
  sync/table_store.py, at the DataSource API level);
- ``abort()`` best-effort deletes the attempt's part files (the
  remove_orphan_files analog runs later for anything it missed).

Classes are defined inside the factory so cloudpickle serializes them
BY VALUE — writer tasks run in executor Python workers that do not
have this repo on sys.path (same rule as sources/pyds.py).
"""

from __future__ import annotations


def manifest_sink_datasource():
    """Build the DataSource class (pickle-by-value; see module doc)."""
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class PartCommit(WriterCommitMessage):
        def __init__(self, rel_path: str, n_rows: int, n_bytes: int):
            self.rel_path = rel_path
            self.n_rows = n_rows
            self.n_bytes = n_bytes

    class ManifestWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options["path"]
            self.columns = [c for c in options["columns"].split(",") if c]
            self.overwrite = overwrite

        def write(self, iterator):
            # one part file per task attempt; TaskContext gives the
            # partition id (stable) + attempt number (unique per retry,
            # so a zombie attempt can never clobber the winner's file —
            # the manifest records exactly one winner per partition)
            from pyspark import TaskContext

            ctx = TaskContext.get()
            rel = f"data/part-{ctx.partitionId()}-{ctx.attemptNumber()}.jsonl"
            full = os.path.join(self.path, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            n = 0
            with open(full, "w") as fh:
                for row in iterator:
                    fh.write(
                        json.dumps(dict(zip(self.columns, tuple(row)))) + "\n"
                    )
                    n += 1
            return PartCommit(rel, n, os.path.getsize(full))

        def commit(self, messages):
            manifest = {
                "format_version": 1,
                "files": sorted(
                    (
                        {
                            "path": m.rel_path,
                            "n_rows": m.n_rows,
                            "n_bytes": m.n_bytes,
                        }
                        for m in messages
                        if m is not None
                    ),
                    key=lambda f: f["path"],
                ),
            }
            manifest["total_rows"] = sum(f["n_rows"] for f in manifest["files"])
            tmp = os.path.join(self.path, "manifest.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh, indent=1)
            # the atomic snapshot-pointer swap: readers see the old
            # manifest or the new one, never a partial file list
            os.replace(tmp, os.path.join(self.path, "manifest.json"))

        def abort(self, messages):
            for m in messages:
                if m is None:
                    continue
                try:
                    os.remove(os.path.join(self.path, m.rel_path))
                except OSError:
                    pass  # orphan; remove_orphan_files-style GC catches it

    class ManifestSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "manifest_sink"

        def writer(self, schema, overwrite: bool):
            return ManifestWriter(self.options, overwrite)

    return ManifestSinkDataSource


def read_manifest_scoped(spark, path: str, schema: str):
    """Read back ONLY the files the manifest lists (the WAP read path:
    orphans from failed attempts are invisible). Returns an empty
    DataFrame with the given schema when no manifest exists."""
    import json
    import os

    mf = os.path.join(path, "manifest.json")
    if not os.path.exists(mf):
        return spark.createDataFrame([], schema)
    with open(mf) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["path"]) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def manifest_stream_sink_datasource():
    """Streaming variant: one manifest per micro-batch, committed
    atomically and IDEMPOTENTLY — a replayed batchId (restart after a
    commit the checkpoint never recorded) is detected and skipped, the
    exactly-once contract a foreachBatch MERGE provides, here at the
    engine sink-API level (DataSourceStreamWriter.commit receives the
    batchId; reference A21 idempotent commit ordering).

    Layout:  <path>/data/batch-<id>-part-*.jsonl
             <path>/manifest-<id>.json       (one per committed batch)
    A manifest-scoped reader unions every committed manifest; parts of
    an aborted or replayed attempt are orphans it never sees.
    """
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class PartCommit(WriterCommitMessage):
        def __init__(self, rel_path: str, n_rows: int):
            self.rel_path = rel_path
            self.n_rows = n_rows

    class ManifestStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]
            self.columns = [c for c in options["columns"].split(",") if c]

        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            # batch id is not visible in write(); stage the part under a
            # task-unique name and let commit() bind it to the batch
            rel = (
                f"data/stage-{ctx.stageId()}-{ctx.partitionId()}"
                f"-{ctx.attemptNumber()}.jsonl"
            )
            full = os.path.join(self.path, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            n = 0
            with open(full, "w") as fh:
                for row in iterator:
                    fh.write(
                        json.dumps(dict(zip(self.columns, tuple(row)))) + "\n"
                    )
                    n += 1
            return PartCommit(rel, n)

        def commit(self, messages, batchId: int) -> None:
            mf = os.path.join(self.path, f"manifest-{batchId}.json")
            if os.path.exists(mf):
                # replayed batch (checkpoint lost the commit record):
                # the first commit won; this attempt's parts are orphans
                for m in messages:
                    if m is not None:
                        try:
                            os.remove(os.path.join(self.path, m.rel_path))
                        except OSError:
                            pass
                return
            files = sorted(
                ({"path": m.rel_path, "n_rows": m.n_rows} for m in messages if m),
                key=lambda f: f["path"],
            )
            manifest = {
                "format_version": 1,
                "batch_id": batchId,
                "files": files,
                "total_rows": sum(f["n_rows"] for f in files),
            }
            tmp = mf + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(manifest, fh, indent=1)
            os.replace(tmp, mf)

        def abort(self, messages, batchId: int) -> None:
            for m in messages:
                if m is None:
                    continue
                try:
                    os.remove(os.path.join(self.path, m.rel_path))
                except OSError:
                    pass

    class ManifestStreamSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "manifest_stream_sink"

        def streamWriter(self, schema, overwrite: bool):
            return ManifestStreamWriter(self.options)

    return ManifestStreamSinkDataSource


def read_stream_manifests(spark, path: str, schema: str):
    """Union of all committed batch manifests (exactly-once view)."""
    import glob
    import json
    import os

    files: list[str] = []
    for mf in sorted(glob.glob(os.path.join(path, "manifest-*.json"))):
        with open(mf) as fh:
            manifest = json.load(fh)
        files.extend(os.path.join(path, f["path"]) for f in manifest["files"])
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
