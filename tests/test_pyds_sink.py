"""manifest_sink commit protocol: atomic manifest, orphan invisibility.

The WAP contract q_sink_pyds relies on, pinned directly: the manifest
lists exactly the committed part files with exact row counts, a part
file not in the manifest (failed-attempt debris) is invisible to
manifest-scoped reads, and re-running the writer replaces the manifest
atomically (readers see old-or-new, never a partial list).
"""

from __future__ import annotations

import json
import os

from mongodb_iceberg_sync_spark.sources.pyds_sink import (
    manifest_sink_datasource,
    read_manifest_scoped,
)

SCHEMA = "k long, v string"


def _write(spark, df, path):
    spark.dataSource.register(manifest_sink_datasource())
    (
        df.write.format("manifest_sink")
        .option("path", path)
        .option("columns", "k,v")
        .mode("append")
        .save()
    )


def test_manifest_lists_exactly_committed_files(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id as k", "concat('v', id) as v").repartition(4)
    _write(spark, df, path)
    manifest = json.load(open(os.path.join(path, "manifest.json")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4
    listed = {f["path"] for f in manifest["files"]}
    on_disk = {
        f"data/{name}" for name in os.listdir(os.path.join(path, "data"))
    }
    assert listed == on_disk
    assert sum(f["n_rows"] for f in manifest["files"]) == 100


def test_orphan_file_invisible_to_manifest_scoped_read(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.range(10).selectExpr("id as k", "concat('v', id) as v")
    _write(spark, df, path)
    with open(os.path.join(path, "data", "part-orphan-9.jsonl"), "w") as fh:
        fh.write('{"k": -1, "v": "GHOST"}\n')
    back = read_manifest_scoped(spark, path, SCHEMA)
    assert back.count() == 10
    assert back.filter("k = -1").count() == 0


def test_recommit_swaps_manifest_atomically(spark, tmp_path):
    path = str(tmp_path / "sink")
    _write(spark, spark.range(10).selectExpr("id as k", "'a' as v"), path)
    first = json.load(open(os.path.join(path, "manifest.json")))
    _write(spark, spark.range(7).selectExpr("id as k", "'b' as v"), path)
    second = json.load(open(os.path.join(path, "manifest.json")))
    assert first["total_rows"] == 10 and second["total_rows"] == 7
    # no .tmp residue: the rename consumed it
    assert not os.path.exists(os.path.join(path, "manifest.json.tmp"))
    back = read_manifest_scoped(spark, path, SCHEMA)
    assert back.count() == 7 and back.filter("v = 'b'").count() == 7


def test_missing_manifest_reads_empty(spark, tmp_path):
    back = read_manifest_scoped(spark, str(tmp_path / "nowhere"), SCHEMA)
    assert back.count() == 0
    assert [f.name for f in back.schema] == ["k", "v"]


def test_stream_sink_commits_manifest_per_batch(spark, tmp_path):
    """DataSourceStreamWriter: N micro-batches -> N batch manifests;
    the unioned manifest-scoped view equals the full input; a replayed
    commit (same batchId) is skipped idempotently."""
    import json as _json

    from mongodb_iceberg_sync_spark.sources.pyds_sink import (
        manifest_stream_sink_datasource,
        read_stream_manifests,
    )

    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(40).selectExpr("id as k", "concat('v', id) as v")
    df.repartition(4).write.mode("overwrite").parquet(src_dir)

    spark.dataSource.register(manifest_stream_sink_datasource())
    stream = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        stream.writeStream.format("manifest_stream_sink")
        .option("path", sink_dir)
        .option("columns", "k,v")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import glob
    import os

    manifests = sorted(glob.glob(os.path.join(sink_dir, "manifest-*.json")))
    assert len(manifests) >= 2  # one per micro-batch (4 files, 1/trigger)
    total = sum(_json.load(open(m))["total_rows"] for m in manifests)
    assert total == 40
    back = read_stream_manifests(spark, sink_dir, "k long, v string")
    assert back.count() == 40
    assert sorted(r.k for r in back.collect()) == list(range(40))

    # replay: committing an already-committed batchId must be a no-op
    before = _json.load(open(manifests[0]))
    from mongodb_iceberg_sync_spark.sources.pyds_sink import (
        manifest_stream_sink_datasource as _f,
    )
    ds = _f()
    writer = ds({"path": sink_dir, "columns": "k,v"}).streamWriter(None, False)
    writer.commit([], batchId=0)
    after = _json.load(open(manifests[0]))
    assert before == after
