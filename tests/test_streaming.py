"""Real Structured Streaming tests: file-source micro-batches through
the streaming operators must converge to the batch-equivalent results
(the equivalence SURVEY.md §2B's oracle strategy relies on)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.sources.cdc_feed import (
    expected_final_state,
    make_events,
    read_stream,
    write_stream_source,
)
from mongodb_iceberg_sync_spark.streaming.sink import foreach_batch_merge
from mongodb_iceberg_sync_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
    watermark_dedup,
)
from mongodb_iceberg_sync_spark.sync.table_store import MorTable
from mongodb_iceberg_sync_spark.tables import load_table


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events table as a 4-file parquet dir (file streaming source).

    repartitionByRange on ts: FileStreamSource processes files in
    (modTime, path) order and range partition 0 = earliest timestamps,
    so micro-batches arrive in event-time order — modeling a real CDC
    stream (roughly time-ordered). With random file order, watermarked
    session windows would legitimately drop most rows as late, and
    cross-batch stateful run counts would see a shuffled event order."""
    import os
    import time

    path = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(path)
    # FileStreamSource orders by modification time; the write's task
    # completion order is arbitrary, so pin mtimes to path order
    # (part-00000 = earliest time range must stream first).
    base = time.time() - 1000
    for i, f in enumerate(
        sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    ):
        os.utime(os.path.join(path, f), (base + i * 10, base + i * 10))
    return path


def _run_to_memory(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _read_events_stream(spark, path):
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream_dir):
    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(
        spark, tumbling_counts(stream), "t_tumbling", "complete"
    ).collect()
    batch = load_table(spark, sf_dir, "events")
    exp = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_sliding_stream_matches_batch(spark, sf_dir, events_stream_dir):
    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, sliding_counts(stream), "t_sliding", "complete").collect()
    batch = load_table(spark, sf_dir, "events")
    exp = (
        batch.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_session_stream_matches_batch_equiv(spark, sf_dir, events_stream_dir):
    """session_window (streaming) vs the gaps-and-islands batch oracle:
    same (user, session_start, n_events) triples."""
    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import q_stream_session

    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, session_stats(stream), "t_session", "complete")
    got_rows = sorted(
        (r.user_id, r.session_start, r.n_events) for r in got.collect()
    )
    exp_rows = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in q_stream_session(spark, sf_dir).collect()
    )
    assert got_rows == exp_rows


def test_watermark_dedup_stream(spark, events_stream_dir, tmp_path):
    """Duplicated source files → dropDuplicates collapses to one row per
    event_id across micro-batches."""
    import shutil
    import os

    dup_dir = str(tmp_path / "dup")
    shutil.copytree(events_stream_dir, dup_dir)
    for f in os.listdir(events_stream_dir):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(events_stream_dir, f),
                os.path.join(dup_dir, "dup_" + f),
            )
    stream = _read_events_stream(spark, dup_dir)
    got = _run_to_memory(
        spark, watermark_dedup(stream).select("event_id"), "t_dedup", "append"
    )
    n = got.count()
    distinct = got.distinct().count()
    assert n == distinct > 0


def test_foreachbatch_merge_pipeline(spark, tmp_path):
    """CDC file stream → foreachBatch MoR merge == sequential replay."""
    rows = make_events(n_docs=15, n_ops=150)
    src = write_stream_source(spark, rows, str(tmp_path / "src"))
    table = MorTable(spark, str(tmp_path / "tbl"), key="doc_id")
    q = foreach_batch_merge(
        read_stream(spark, src), table, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {
        r.doc_id: json.loads(r.full_doc) for r in table.snapshot().collect()
    }
    assert got == expected_final_state(rows)


def test_stateful_stream_matches_batch(spark, sf_dir, events_stream_dir):
    """applyInPandasWithState longest-run == batch applyInPandas twin."""
    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import q_stream_stateful
    from mongodb_iceberg_sync_spark.streaming.stateful import longest_run_stream

    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, longest_run_stream(stream), "t_state", "update")
    # update mode emits one row per key per batch; keep the last emission
    # per user (max n_runs ⇒ latest) — state is cumulative
    # both metrics are nondecreasing across emissions → max = final state
    final = got.groupBy("user_id").agg(
        F.max("max_run").alias("max_run"), F.max("n_runs").alias("n_runs")
    )
    exp = q_stream_stateful(spark, sf_dir)
    got_rows = sorted(map(tuple, final.collect()))
    exp_rows = sorted(map(tuple, exp.collect()))
    assert got_rows == exp_rows


def test_stateful_tws_matches_batch(spark, sf_dir, events_stream_dir):
    """transformWithStateInPandas (Spark 4 API) == batch twin."""
    import pytest as _pytest

    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import q_stream_stateful
    from mongodb_iceberg_sync_spark.streaming.stateful import longest_run_stream_tws

    if longest_run_stream_tws is None:
        _pytest.skip(
            "transformWithStateInPandas unavailable (needs Spark>=4 AND "
            "protobuf for its state-server protocol)"
        )
    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, longest_run_stream_tws(stream), "t_tws", "update")
    final = got.groupBy("user_id").agg(
        F.max("max_run").alias("max_run"), F.max("n_runs").alias("n_runs")
    )
    exp = q_stream_stateful(spark, sf_dir)
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, exp.collect()))


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join (both sides watermarked, time-bounded
    state) must produce exactly the batch join's rows. Append mode: a
    joined row emits once both matching events have arrived."""
    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import (
        q_stream_stream_join,
    )
    from mongodb_iceberg_sync_spark.streaming.windows import interval_join

    stream = _read_events_stream(spark, events_stream_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    got = _run_to_memory(
        spark, interval_join(clicks, purchases), "t_ssjoin", "append"
    ).collect()
    exp = q_stream_stream_join(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_stream_static_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-static enrichment: every micro-batch joins the same
    static dim snapshot; the drained stream equals the batch join."""
    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import (
        q_stream_static_join,
    )
    from mongodb_iceberg_sync_spark.streaming.windows import enrich_static

    batch_ev = load_table(spark, sf_dir, "events")
    dim = (
        batch_ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("spend"))
        .select(
            "user_id",
            F.when(F.col("spend") > 500, "high")
            .when(F.col("spend") > 100, "mid")
            .otherwise("low")
            .alias("segment"),
        )
    )
    stream = _read_events_stream(spark, events_stream_dir).filter(
        F.col("event_type").isin("click", "view")
    ).select("event_id", "user_id", "event_type")
    got = _run_to_memory(
        spark, enrich_static(stream, dim), "t_static_join", "append"
    ).collect()
    exp = q_stream_static_join(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_ohlc_stream_matches_batch(spark, sf_dir, events_stream_dir):
    from mongodb_iceberg_sync_spark.operators.stream_batch_equiv import (  # noqa: F401
        q_stream_tumbling,
    )
    from mongodb_iceberg_sync_spark.operators.pipeline import q_timeseries_ohlc
    from mongodb_iceberg_sync_spark.streaming.windows import ohlc_candles

    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, ohlc_candles(stream), "t_ohlc", "complete").collect()
    exp = q_timeseries_ohlc(spark, sf_dir).collect()
    key = lambda r: (r["event_type"], r["hour"])  # noqa: E731
    got_m = {key(r): (r["open"], r["high"], r["low"], r["close"], r["n"]) for r in got}
    exp_m = {key(r): (r["open"], r["high"], r["low"], r["close"], r["n"]) for r in exp}
    assert got_m == exp_m


def test_foreachbatch_wap_audited_merge(spark, tmp_path):
    """WAP streaming sink: a poisoned micro-batch fails its audit, is
    aborted wholesale into quarantine, and the stream continues —
    clean batches' state is exactly the sequential replay of their
    ops."""
    import os

    rows = make_events(n_docs=10, n_ops=80)
    # poison the SECOND quarter (file 2 of 4): one null-key upsert
    chunk = (len(rows) + 3) // 4
    poisoned = list(rows)
    seq, op, _d, ts, payload = poisoned[chunk + 3]
    poisoned[chunk + 3] = (seq, "insert", None, ts, payload)

    src = write_stream_source(spark, poisoned, str(tmp_path / "src"))
    table = MorTable(spark, str(tmp_path / "tbl"), key="doc_id")
    q = foreach_batch_merge(
        read_stream(spark, src),
        table,
        str(tmp_path / "ckpt"),
        quarantine_dir=str(tmp_path / "dlq"),
        audit_checks=[],  # built-in expectations only
    )
    q.awaitTermination()

    # replay oracle: batch 2's ops are dropped ENTIRELY (aborted), all
    # other batches apply in order
    kept = [r for i, r in enumerate(poisoned) if not (chunk <= i < 2 * chunk)]
    assert {
        r.doc_id: json.loads(r.full_doc) for r in table.snapshot().collect()
    } == expected_final_state(kept)
    # the aborted batch is dead-lettered with the audit reason
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert dlq.count() == chunk
    assert dlq.filter(F.col("reason").startswith("audit_failed")).count() == chunk
    # nothing left staged
    assert not os.path.isdir(f"{table.staging_dir}/batch=1") or not os.listdir(
        f"{table.staging_dir}/batch=1"
    )


def test_decay_feature_stream_matches_batch(spark, sf_dir, events_stream_dir):
    """decay_features is a plain keyed aggregate of scaled integers, so
    update/complete-mode streaming state must converge to the batch
    feature exactly (bitwise: the scaled sum is integer arithmetic) —
    the incrementally-maintained feature-store form of q_events_decay."""
    from mongodb_iceberg_sync_spark.operators.pipeline import decay_features

    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(
        spark, decay_features(stream), "t_decay", "complete"
    ).collect()
    exp = decay_features(load_table(spark, sf_dir, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_debounce_stream_matches_batch(spark, sf_dir, events_stream_dir):
    """applyInPandasWithState debounce == batch lag-filter twin: each
    per-user state transition is emitted exactly once across all
    micro-batches (append mode), so the union of emissions equals the
    batch operator's output."""
    from mongodb_iceberg_sync_spark.operators.windows import q_window_alert_debounce
    from mongodb_iceberg_sync_spark.streaming.stateful import debounce_stream

    stream = _read_events_stream(spark, events_stream_dir)
    got = _run_to_memory(spark, debounce_stream(stream), "t_debounce", "append")
    exp = q_window_alert_debounce(spark, sf_dir)
    got_rows = sorted(map(tuple, got.select("user_id", "ts", "event_type").collect()))
    exp_rows = sorted(map(tuple, exp.collect()))
    assert got_rows == exp_rows
