"""Streaming operators in batch-equivalent form (SURVEY.md §2B streaming).

Structured Streaming transformations are incrementalized batch plans, so
every windowed aggregation here runs identically on a stream — the
streaming/ package wires the same expressions behind readStream with
watermarks; these batch forms are what the DuckDB oracle can check.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import session_tmpdir, t

_HOUR_US = 3_600_000_000
_SLIDE_US = 900_000_000  # 15 minutes


@register(
    "q_stream_tumbling",
    family="streaming",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           count(*)               AS n_events,
           round(sum(value), 4)   AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Tumbling 1h window aggregation via F.window — identical plan "
    "under readStream+watermark (streaming.windows.tumbling_counts).",
)
def q_stream_tumbling(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    family="streaming",
    oracle=f"""
    SELECT make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - k.k) * {_SLIDE_US})
             AS window_start,
           count(*)             AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events, range(0, 4) k(k)
    WHERE ((epoch_us(ts) // {_SLIDE_US}) - k.k) * {_SLIDE_US} > epoch_us(ts) - {_HOUR_US}
    GROUP BY 1
    """,
    doc="Sliding window (1h width, 15m slide): each event lands in 4 "
    "overlapping windows. Spark F.window(duration, slide) — the oracle "
    "replicates Spark's epoch-aligned window-start arithmetic.",
)
def q_stream_sliding(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_session",
    family="streaming",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Session windows, 10-minute gap (gaps-and-islands form). The "
    "streaming engine uses F.session_window with a watermark — same gap "
    "semantics: a new session starts when the gap is >= the timeout.",
)
def q_stream_session(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us >= 600_000_000), 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "q_stream_watermark_dedup",
    family="streaming",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    GROUP BY event_id, user_id, event_type
    """,
    doc="At-least-once replay dedup (reference A14/A21): a doubled feed "
    "collapses to one row per event_id. Streaming form: "
    "withWatermark('ts','1 hour').dropDuplicates(['event_id']) in "
    "streaming.windows.watermark_dedup — state expires past watermark.",
)
def q_stream_watermark_dedup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    replayed = ev.unionAll(ev)  # simulate at-least-once duplicate delivery
    return replayed.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "q_stream_foreachbatch_merge",
    family="streaming",
    oracle=None,  # side-effecting streaming pipeline → rows-only
    doc="End-to-end micro-batch upsert pipeline (reference A12+A21): a "
    "synthetic CDC file stream → foreachBatch LWW merge into a "
    "merge-on-read table → final snapshot. Runs a REAL StreamingQuery "
    "(availableNow) against temp dirs; the deterministic final state is "
    "the sequential-replay oracle in sources.cdc_feed.",
)
def q_stream_foreachbatch_merge(spark, sf_dir):
    from ..sources.cdc_feed import make_events, read_stream, write_stream_source
    from ..streaming.sink import foreach_batch_merge
    from ..sync.table_store import MorTable

    rows = make_events(n_docs=20, n_ops=200)
    # 2 files -> 2 micro-batches: enough to exercise cross-batch LWW +
    # idempotent commit; each extra micro-batch is ~1s of fixed
    # StreamingQuery overhead in the driver's correctness sweep.
    src = write_stream_source(
        spark, rows, session_tmpdir("mis_cdc_src_"), files=2
    )
    table = MorTable(spark, session_tmpdir("mis_cdc_tbl_"), key="doc_id")
    q = foreach_batch_merge(
        read_stream(spark, src), table, session_tmpdir("mis_cdc_ckpt_")
    )
    q.awaitTermination()
    snap = table.snapshot()
    return snap.select(
        "doc_id", F.get_json_object("full_doc", "$.v").cast("long").alias("v")
    ).orderBy("doc_id")


@register(
    "q_stream_stateful",
    family="streaming",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS grp
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, count(*) AS run_len
      FROM s GROUP BY user_id, event_type, grp
    )
    SELECT user_id, max(run_len) AS max_run, count(*) AS n_runs
    FROM runs GROUP BY user_id
    """,
    doc="Custom per-key state: longest run of same-type consecutive "
    "events per user, computed imperatively in applyInPandas (the batch "
    "twin of transformWithStateInPandas in streaming.stateful). Oracle "
    "is the gaps-and-islands SQL equivalent.",
)
def q_stream_stateful(spark, sf_dir):
    import pandas as pd

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")

    def longest_run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        best = cur = 0
        n_runs = 0
        prev = None
        for et in pdf["event_type"]:
            if et == prev:
                cur += 1
            else:
                cur = 1
                n_runs += 1
                prev = et
            best = max(best, cur)
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "max_run": [best], "n_runs": [n_runs]}
        )

    return ev.groupBy("user_id").applyInPandas(
        longest_run, "user_id bigint, max_run bigint, n_runs bigint"
    )


@register(
    "q_stream_stream_join",
    family="streaming",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click'
    """,
    doc="Stream-stream interval join (batch-equivalent): purchases "
    "within 30 min after a click, per user. The streaming twin "
    "(streaming.windows.interval_join) watermarks BOTH sides and "
    "bounds event time in both directions so join state is evictable "
    "— the unbounded form would buffer the full history; "
    "tests/test_streaming.py proves stream==batch on the real "
    "micro-batched source. Physically a user_id equi-join with the "
    "time band as a residual predicate — never a nested loop.",
)
def q_stream_stream_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")


@register(
    "q_stream_static_join",
    family="streaming",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             CASE WHEN sum(value) > 500 THEN 'high'
                  WHEN sum(value) > 100 THEN 'mid'
                  ELSE 'low' END AS segment
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type,
           coalesce(d.segment, 'unknown') AS segment
    FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
    WHERE e.event_type IN ('click', 'view')
    """,
    doc="Stream-static enrichment join (batch-equivalent): a "
    "click/view stream decorated with a per-user spend segment from a "
    "static dim. The streaming twin (streaming.windows.enrich_static) "
    "joins each micro-batch against the static snapshot — no "
    "watermark, no join state, broadcast when small; "
    "tests/test_streaming.py proves stream==batch. This is how a "
    "synced MoR table (MorTable.snapshot()) decorates a live stream.",
)
def q_stream_static_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
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
    stream = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "event_type"
    )
    d = dim.select(F.col("user_id").alias("d_user_id"), "segment")
    return stream.join(d, stream.user_id == d.d_user_id, "left").select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
    )


@register(
    "q_stream_ivm",
    family="streaming",
    oracle="""
    WITH lww AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events
    )
    SELECT event_type AS grp,
           count(*)   AS n_keys,
           round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) + 0.0
             AS sum_value
    FROM lww
    WHERE rn = 1 AND event_type <> 'error'
    GROUP BY event_type
    """,
    doc="Continuously-maintained materialized aggregate, END TO END on "
    "a REAL micro-batch stream (streaming/ivm_sink.py): the events "
    "table becomes an ordered CDC feed (op_seq = event_id, latest "
    "'error' = delete), streamed as 2 files -> 2 micro-batches into "
    "foreachBatch, which rolls the per-group aggregate forward with "
    "delta algebra — retract old rows AS OF the previous batch, "
    "insert winners, O(batch) per step, never a table rescan. The "
    "ORACLE recomputes the same aggregate from scratch with plain "
    "SQL, so the hash equality proves incremental == recompute "
    "through actual StreamingQuery machinery, not a batch stand-in.",
)
def q_stream_ivm(spark, sf_dir):
    import os
    import shutil
    import time

    from ..streaming.ivm_sink import _latest_agg, maintained_group_stats

    ev = t(spark, sf_dir, "events").select(
        F.col("event_id").alias("op_seq"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("insert")
        .alias("op_type"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("grp"),
        "value",
    )
    src = session_tmpdir("mis_ivm_src_")
    base_t = time.time() - 100
    # 2 op_seq-ordered files -> 2 in-order micro-batches (the CDC
    # resume-token delivery contract); stale-op handling is pinned
    # separately in tests/test_ivm_stream.py
    staged = session_tmpdir("mis_ivm_stage_")
    ev.repartitionByRange(2, "op_seq").write.mode("overwrite").parquet(staged)
    parts = sorted(p for p in os.listdir(staged) if p.endswith(".parquet"))
    for i, p in enumerate(parts):
        dst = f"{src}/b{i}.parquet"
        shutil.move(f"{staged}/{p}", dst)
        os.utime(dst, (base_t + i * 10, base_t + i * 10))
    state = session_tmpdir("mis_ivm_state_")
    stream = (
        spark.readStream.schema(
            "op_seq long, op_type string, doc_id string, grp string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintained_group_stats(
        stream,
        state,
        session_tmpdir("mis_ivm_ckpt_"),
        key="doc_id",
        group_col="grp",
        value_col="value",
    )
    q.awaitTermination()
    final = _latest_agg(spark, f"{state}/agg", 10**9)
    return final.select(
        F.col("g").alias("grp"),
        F.col("n").alias("n_keys"),
        (F.round(F.col("s").cast("double"), 4) + 0.0).alias("sum_value"),
    )


_LATE_D_US = 600_000_000  # 10-minute watermark delay, in microseconds
_LATE_BLOCK = 10_000      # arrival-order block size for the two-pass max


@register(
    "q_stream_late_audit",
    family="streaming",
    oracle=f"""
    WITH arr AS (
      SELECT event_id, event_type, epoch_us(ts) AS t_us
      FROM events
    ),
    wm AS (
      SELECT event_type, t_us,
             max(t_us) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS seen_max
      FROM arr
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN seen_max IS NOT NULL
                          AND t_us < seen_max - {_LATE_D_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           round(CAST(sum(CASE WHEN seen_max IS NOT NULL
                          AND t_us < seen_max - {_LATE_D_US}
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS late_share,
           CAST(coalesce(max(CASE WHEN seen_max IS NOT NULL
                          AND t_us < seen_max - {_LATE_D_US}
                         THEN seen_max - {_LATE_D_US} - t_us END), 0)
             AS BIGINT) AS max_lateness_us
    FROM wm GROUP BY event_type ORDER BY event_type
    """,
    doc="Watermark late-arrival audit — BEFORE committing a streaming "
    "job's watermark delay, replay the log and count what that delay "
    "would drop: an event is late iff its event time is older than "
    "the max event time seen earlier in ARRIVAL order (event_id) "
    "minus the 10-min delay — exactly Structured Streaming's global "
    "watermark rule (max-event-time - delay, applied in arrival "
    "order). The observability twin of q_stream_watermark_dedup: that "
    "op drops late rows, this one prices the drop rate per event "
    "type so the delay can be tuned on data instead of folklore. "
    "Exactness: all-integer microsecond arithmetic; one rounded "
    "share division. Scale: the ORACLE's single running max is an "
    "unpartitioned window — Spark instead runs the two-pass "
    "q_sort_global_rank trick: per-block running max (window "
    "partitioned by arrival block, balanced), plus a prefix max over "
    "the bounded block table broadcast back — no single-reducer "
    "window ever touches the fact. Ref: Spark Structured Streaming "
    "watermark semantics (public docs) — streaming-observability "
    "tier.",
)
def q_stream_late_audit(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    arr = ev.select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.expr(f"event_id div {_LATE_BLOCK}").alias("blk"),
    )
    # pass 1: bounded per-block stats (combinable)
    blocks = arr.groupBy("blk").agg(F.max("t_us").alias("blk_max"))
    # BOUNDED global window: one row per BLOCK (event_id div block_size),
    # cardinality rows/block_size — grows 1000x slower than the fact and
    # stays driver-tiny at 100 TB (SCALE.md §global-windows).
    wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    prefix = blocks.select(
        "blk", F.max("blk_max").over(wb).alias("prefix_max")
    )
    # pass 2: within-block running max (balanced partitions) + prefix
    wr = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = arr.join(F.broadcast(prefix), "blk").select(
        "event_type",
        "t_us",
        # Spark greatest() skips NULLs (returns NULL only if all args
        # are), so block-1/row-1 edges degrade exactly like the
        # oracle's running max over an empty frame
        F.greatest(F.max("t_us").over(wr), F.col("prefix_max")).alias("seen_max"),
    )
    late = F.col("seen_max").isNotNull() & (
        F.col("t_us") < F.col("seen_max") - _LATE_D_US
    )
    return (
        wm.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
            F.round(
                F.sum(F.when(late, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("late_share"),
            F.coalesce(
                F.max(
                    F.when(late, F.col("seen_max") - _LATE_D_US - F.col("t_us"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("max_lateness_us"),
        )
        .orderBy("event_type")
    )
