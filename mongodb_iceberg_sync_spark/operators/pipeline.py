"""End-to-end training-data cleaning pipeline — operators composed.

Every operator in this engine is a pure `DataFrame → DataFrame`
function, so a production cleaning pipeline is literally function
composition; this module registers one such composition as a single
query so the WHOLE chain is exact-hash-checked against DuckDB, not
just its stages: deterministic content-hash sampling → C4-style
quality thresholds → exact dedup (keep smallest doc_id). The chain is
one scan, one shuffle (the dedup groupBy) — sampling and quality are
map-side predicates that Catalyst fuses into the scan filter.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_pipeline_clean",
    family="pipeline",
    oracle="""
    WITH sampled AS (
      SELECT doc_id, lang, source, text, n_chars
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
    ),
    scored AS (
      SELECT doc_id, lang, source, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             CAST(n_chars AS DOUBLE) AS chars
      FROM sampled
    ),
    filtered AS (
      SELECT doc_id, lang, source, text, n_tokens,
             round(0.5 * (n_distinct / n_tokens)
                   + 0.5 * least(chars / n_tokens / 8.0, 1.0), 6) AS quality_score
      FROM scored
      WHERE n_tokens >= 20 AND n_distinct / n_tokens > 0.3
    ),
    deduped AS (
      SELECT *, row_number() OVER (
               PARTITION BY sha256(text) ORDER BY doc_id
             ) AS rn
      FROM filtered
    )
    SELECT doc_id, lang, source, n_tokens, quality_score
    FROM deduped WHERE rn = 1
    """,
    doc="Composed cleaning pipeline over documents: ~25% deterministic "
    "md5-hash sample → quality thresholds (length + type-token ratio) "
    "→ exact dedup keeping the smallest doc_id per content hash. "
    "Hash-checked END TO END. Physical shape: sample + quality fuse "
    "into the scan as one conjunctive map-side predicate; the only "
    "shuffle is the dedup window on sha256(text) — at 100 TB the "
    "pipeline is one pass + one 64-byte-key shuffle over the ~25% "
    "survivors.",
)
def q_pipeline_clean(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # stage 1: deterministic content-hash sample (~25%) — see
    # operators.sampling for the reproducibility rationale
    sampled = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40"
    )
    # stage 2: C4-style quality thresholds (operators.text formulas)
    toks = F.split("text", " ")
    scored = sampled.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.col("n_chars").cast("double").alias("chars"),
    )
    ttr = F.col("n_distinct") / F.col("n_tokens")
    score = 0.5 * ttr + 0.5 * F.least(
        F.col("chars") / F.col("n_tokens") / 8.0, F.lit(1.0)
    )
    filtered = scored.filter((F.col("n_tokens") >= 20) & (ttr > 0.3)).select(
        "doc_id",
        "lang",
        "source",
        "text",
        "n_tokens",
        F.round(score, 6).alias("quality_score"),
    )
    # stage 3: exact dedup, keep smallest doc_id per content hash
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_tokens", "quality_score")
    )


@register(
    "q_events_funnel",
    family="pipeline",
    oracle="""
    WITH signup AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
      FROM signup s
      LEFT JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.signup_ts
      GROUP BY s.user_id, s.signup_ts
    )
    SELECT user_id, signup_ts, first_purchase_ts,
           CASE WHEN first_purchase_ts IS NOT NULL
                -- full elapsed seconds (floor), matching Spark's
                -- timestampdiff; date_diff('second', ...) would count
                -- second-BOUNDARY crossings instead
                THEN CAST((epoch_us(first_purchase_ts) - epoch_us(signup_ts))
                          // 1000000 AS BIGINT) END
             AS secs_to_convert
    FROM conv
    """,
    doc="Conversion funnel: per user, first signup -> first purchase at "
    "or after it, with seconds-to-convert (NULL = never converted). "
    "Two aggregations + one equi-join, all keyed on user_id: at 100 TB "
    "the signup agg output is tiny relative to the event log, and both "
    "shuffles share the user_id key so AQE reuses the partitioning; "
    "the ts >= signup_ts predicate rides the equi-join as a residual "
    "filter, never a nested-loop.",
)
def q_events_funnel(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    conv = (
        signup.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        F.when(
            F.col("first_purchase_ts").isNotNull(),
            F.expr("timestampdiff(SECOND, signup_ts, first_purchase_ts)"),
        ).alias("secs_to_convert"),
    )


PACK_BUDGET = 2048  # tokens per training shard


@register(
    "q_pack_tokens",
    family="pipeline",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS shard_id
    FROM cum
    """,
    doc="Sequence packing for training shards: docs in doc_id order are "
    "assigned to shards by exclusive-prefix token count / budget — "
    "every shard holds ~2048 tokens of consecutive docs. Distributed "
    "two-pass prefix sum (no global single-reducer window): "
    "range-partition by doc_id, per-partition token subtotals to the "
    "driver (ONE long per partition), exclusive-prefix the subtotals "
    "into per-partition offsets, broadcast them back, then a "
    "partition-LOCAL cumulative window. Every stage is "
    "partition-parallel; driver traffic is O(#partitions) longs — the "
    "same math as the global window, scale-safe at 100 TB.",
)
def q_pack_tokens(spark, sf_dir):
    return pack_shards(t(spark, sf_dir, "documents"))


def pack_shards(docs, budget: int | None = None, weight=None):
    """Df-level core of q_pack_tokens (also a pipeline step): assign
    each doc a training shard by exclusive-prefix token count / budget
    via the distributed two-pass prefix sum described above.

    ``weight`` overrides the per-row cost column (default: whitespace
    token count of ``text``) — q_multimodal_shard_pack packs on payload
    bytes through the same two-pass core."""
    from pyspark.sql import Window

    budget = PACK_BUDGET if budget is None else budget
    spark = docs.sparkSession
    if weight is None:
        weight = F.size(F.split("text", " ")).cast("long")
    toks = docs.select("doc_id", weight.alias("n_tokens"))
    # Pass 0: range-partition so partition i holds a contiguous doc_id
    # range and ids increase with doc_id. localCheckpoint pins the data
    # AND the partitioning so the subtotal job and the final job see the
    # identical layout (no recompute / AQE re-plan between actions).
    # (no sortWithinPartitions here: the pass-2 window sorts each pid
    # partition by doc_id anyway — sorting twice bought nothing)
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    parted = (
        toks.repartitionByRange(n_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # Pass 1: one subtotal per partition → driver (O(#partitions) longs)
    subtotals = {
        r["pid"]: r["sub"]
        for r in parted.groupBy("pid").agg(F.sum("n_tokens").alias("sub")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += subtotals[pid]
    off_df = spark.createDataFrame(offsets, "pid int, part_offset long")
    # Pass 2: partition-local cumsum + broadcast offset = global prefix
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parted.join(F.broadcast(off_df), "pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (
                    F.col("part_offset")
                    + F.sum("n_tokens").over(w)
                    - F.col("n_tokens")
                )
                / budget
            )
            .cast("long")
            .alias("shard_id"),
        )
    )


@register(
    "q_timeseries_gapfill",
    family="pipeline",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
             round(sum(CAST(value AS DECIMAL(18,6))), 4) AS sum_value
      FROM ev GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM ev GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM span
    )
    SELECT g.user_id, g.hour,
           coalesce(h.n_events, 0) AS n_events,
           h.sum_value AS sum_value,
           last_value(h.sum_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM grid g
    LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour
    """,
    doc="Time-series resample + gap fill: per-user hourly grid "
    "(sequence/explode between the user's first and last hour), left "
    "join of hourly aggregates, zero-fill counts, forward-fill values "
    "(last non-null over an ordered window). The grid generation is "
    "gap-count-proportional, the fill is a per-user window — both "
    "partition-parallel at 100 TB; nothing global. Decimal-exact "
    "hourly sums keep the rounded values engine-identical before the "
    "fill copies them.",
)
def q_timeseries_gapfill(spark, sf_dir):
    from pyspark.sql import Window

    # user subset keeps the materialized grid (users x 720 hours)
    # oracle-comparable in seconds; the shapes are per-user-parallel
    # regardless of how many users flow through
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )
    span = ev.groupBy("user_id").agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "q_timeseries_interp",
    family="pipeline",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) * 10000 AS BIGINT)
               AS v
      FROM ev GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(date_trunc('hour', ts)) AS h0,
             max(date_trunc('hour', ts)) AS h1
      FROM ev GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM span
    ),
    joined AS (
      SELECT g.user_id, g.hour, h.v
      FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour
    ),
    ctx AS (
      SELECT user_id, hour, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER w_prev AS ph,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER w_next AS nh
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    frac AS (
      SELECT user_id, hour, v, pv, nv,
             (epoch_us(hour) - epoch_us(ph)) // 3600000000 AS kh,
             (epoch_us(nh) - epoch_us(ph)) // 3600000000 AS mh
      FROM ctx
    )
    SELECT user_id, hour,
           CASE
             WHEN v IS NOT NULL THEN CAST(v AS DOUBLE) / 10000.0
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CAST(pv * (mh - kh) + nv * kh AS DOUBLE)
               / CAST(mh * 10000 AS DOUBLE)
             ELSE CAST(coalesce(pv, nv) AS DOUBLE) / 10000.0
           END AS filled_value,
           CASE WHEN v IS NOT NULL THEN 'obs'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS method
    FROM frac
    """,
    doc="Time-series LINEAR interpolation (gapfill's sibling): missing "
    "hours get the value interpolated between the nearest observed "
    "neighbors; edges fall back to the known side. Two per-user "
    "ordered windows (backward last-non-null, forward first-non-null) "
    "— partition-parallel at 100 TB, nothing global. All arithmetic "
    "runs on 1e4-scaled BIGINTs (hourly sums are decimal-rounded then "
    "scaled), so the interpolation pv*(m-k) + nv*k is EXACT integer "
    "math in both engines and the single final int/int division is "
    "one correctly-rounded IEEE op — bitwise cross-engine parity "
    "without any float rounding (a float multiply-add here differed "
    "by ULPs: DuckDB contracts it to an FMA).",
)
def q_timeseries_interp(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour")).agg(
        (F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4) * 10000)
        .cast("long")
        .alias("v")
    )
    span = ev.groupBy("user_id").agg(F.min(hour).alias("h0"), F.max(hour).alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "user_id",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_hour, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_hour, ignorenulls=True).over(w_next).alias("nh"),
    )
    kh = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")) / 3600
    ).cast("long")
    mh = ((F.unix_timestamp("nh") - F.unix_timestamp("ph")) / 3600).cast("long")
    ctx = ctx.withColumn("kh", kh).withColumn("mh", mh)
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double") / 10000.0)
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            (
                F.col("pv") * (F.col("mh") - F.col("kh"))
                + F.col("nv") * F.col("kh")
            ).cast("double")
            / (F.col("mh") * 10000).cast("double"),
        )
        .otherwise(F.coalesce("pv", "nv").cast("double") / 10000.0)
    )
    method = (
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp"))
        .otherwise(F.lit("edge"))
    )
    return ctx.select(
        "user_id",
        "hour",
        filled.alias("filled_value"),
        method.alias("method"),
    )


@register(
    "q_events_retention",
    family="pipeline",
    oracle="""
    WITH first_week AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM activity a JOIN first_week f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen week, "
    "counted in each subsequent active week offset — the standard "
    "product-analytics rollup. Two aggregations keyed on user_id "
    "(first-seen + distinct active weeks) share their shuffle "
    "partitioning, then one count keyed on the tiny (cohort, offset) "
    "pair. All map-side combinable; no window, no skew risk (weeks "
    "bound the key space).",
)
def q_events_retention(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_week = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select("user_id", week.alias("week")).distinct()
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    return (
        activity.join(first_week, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q_timeseries_ohlc",
    family="pipeline",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           arg_min(value, strftime(ts, '%Y%m%d%H%M%S%f')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           max(value)  AS high,
           min(value)  AS low,
           arg_max(value, strftime(ts, '%Y%m%d%H%M%S%f')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
           count(*)    AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="OHLC resampling — the candlestick rollup every metrics/market "
    "pipeline runs: per (series, hour), first/max/min/last of value. "
    "first/last ride min_by/max_by over a struct(ts, event_id) key "
    "(struct ordering is lexicographic over its fields), so the "
    "result is deterministic even with timestamp ties and equals the "
    "oracle's sortable timestamp||event_id string without building a "
    "26-char string per row (3.5x faster at sf0.1). One "
    "map-side-combinable groupBy — partial aggregates collapse each "
    "scan task's rows to O(#groups) before the single shuffle, so at "
    "100 TB the exchange carries candles, not events. Raw per-row "
    "doubles (no summation) — bitwise-identical across engines, no "
    "rounding needed.",
)
def q_timeseries_ohlc(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").alias("n"),
    )


@register(
    "q_events_anomaly",
    family="pipeline",
    oracle="""
    WITH stats AS (
      SELECT user_id,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS s2
      FROM events
      GROUP BY user_id
      HAVING count(*) >= 30
    ),
    ms AS (
      SELECT user_id, n, s1 / n AS mean,
             sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std
      FROM stats
    )
    SELECT e.event_id, e.user_id, e.value,
           round((e.value - m.mean) / m.std, 6) + 0.0 AS zscore
    FROM events e JOIN ms m USING (user_id)
    WHERE m.std > 0 AND abs(e.value - m.mean) > 3 * m.std
    """,
    doc="Per-entity anomaly flagging: events whose value sits more "
    "than 3 sigma from that user's mean — the standard telemetry/"
    "fraud outlier sweep. Moments are exact DECIMAL sums (summation "
    "order can't change them), converted to DOUBLE only for the final "
    "mean/std arithmetic, which is then bitwise identical across "
    "engines. Two passes: one map-side-combinable groupBy producing "
    "O(#users) stat rows, then the stats join back onto the event "
    "stream — stats are tiny relative to events, so at 100 TB the "
    "join broadcasts and the event side never shuffles.",
)
def q_events_anomaly(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("s1"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(38,10)"))
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n") >= 30)
    )
    ms = stats.select(
        "user_id",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(ms), "user_id")
        .filter(
            (F.col("std") > 0)
            & (F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"))
        )
        .select(
            "event_id",
            "user_id",
            "value",
            (F.round((F.col("value") - F.col("mean")) / F.col("std"), 6) + 0.0).alias(
                "zscore"
            ),
        )
    )


@register(
    "q_events_markov",
    family="pipeline",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    totals AS (
      SELECT prev_type, sum(n) AS tot FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type,
           CAST(t.n AS BIGINT) AS n,
           t.n / CAST(o.tot AS BIGINT) AS p
    FROM trans t JOIN totals o ON t.prev_type = o.prev_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next_type | prev_type) — the behavioral model behind "
    "next-action prediction and funnel-drop analysis. One per-user "
    "window (lag over (ts, event_id) — total order, deterministic), "
    "then two tiny aggregates over O(types^2) rows. The window "
    "partitions by user_id so sequencing spreads across the cluster; "
    "the transition counts partial-aggregate map-side, so the only "
    "full-data exchange is the user_id one the window needs anyway. "
    "Probabilities are one bigint/bigint division — bitwise "
    "cross-engine, no rounding.",
)
def q_events_markov(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return trans.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") / F.col("tot").cast("bigint")).alias("p"),
    )


_EWMA_LAGS = 7  # bounded history: weights 0.5^0 .. 0.5^7
_EWMA_A = 0.5


def _ewma_sql_terms() -> tuple[str, str]:
    """Identical-structure numerator/denominator SQL for the oracle."""
    num = ["value * 1.0"]
    den = ["1.0"]
    for k in range(1, _EWMA_LAGS + 1):
        w = _EWMA_A**k
        num.append(
            f"coalesce(lag(value, {k}) OVER win, 0.0) * {w!r}"
        )
        den.append(
            f"(CASE WHEN lag(value, {k}) OVER win IS NULL THEN 0.0 ELSE {w!r} END)"
        )
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()


@register(
    "q_timeseries_ewma",
    family="pipeline",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    LIMIT 5000
    """,
    doc="Bounded exponentially-weighted moving average per user "
    f"(weights {_EWMA_A}^k over the last {_EWMA_LAGS} events + "
    "current, renormalized at series head) — the smoothing step of a "
    "metric/feature pipeline. A true infinite-history EWMA is a "
    "sequential recurrence; the bounded form (tail weight < 0.4% "
    "here) is a fixed lag-combination, so it runs as ONE keyed window "
    "— per-user partitions, no recurrence, no applyInPandas. "
    "Cross-engine exactness: both engines evaluate the SAME "
    "left-associative float expression per row (lag chains + literal "
    "power-of-two weights), so results are bitwise identical with no "
    "rounding. Scale: single shuffle on user_id; window state is "
    f"{_EWMA_LAGS + 1} rows.",
)
def q_timeseries_ewma(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value") * F.lit(1.0)
    den = F.lit(1.0)
    for k in range(1, _EWMA_LAGS + 1):
        wt = _EWMA_A**k
        lagv = F.lag("value", k).over(w)
        num = num + F.coalesce(lagv, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lagv.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    return (
        e.select("event_id", "user_id", "ts", "value", (num / den).alias("ewma"))
        .orderBy("user_id", "ts", "event_id")
        .limit(5000)
    )


_ATTR_WINDOW_US = 7 * 24 * 3600 * 1000000  # 7-day lookback


@register(
    "q_events_attribution",
    family="pipeline",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts, value AS p_value
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    touches AS (
      SELECT p.p_id, p.p_value, c.c_id,
             count(*) OVER (PARTITION BY p.p_id) AS n_touch
      FROM purchases p
      JOIN clicks c
        ON c.user_id = p.user_id
       AND epoch_us(c.c_ts) BETWEEN epoch_us(p.p_ts) - {_ATTR_WINDOW_US}
                                AND epoch_us(p.p_ts)
    )
    SELECT c_id,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(CAST(round(p_value / n_touch, 6) AS DECIMAL(18,6)))
                AS DOUBLE) + 0.0 AS credit
    FROM touches
    GROUP BY c_id
    """,
    doc="Linear multi-touch attribution: every purchase's value splits "
    "equally across that user's clicks in the prior 7 days; per-click "
    "totals are the marketing-spend signal. Shape: user_id equi-join "
    "with a residual time-band filter (pairs bounded per user, never "
    "cross-user), per-purchase touch counts from a p_id-keyed window "
    "riding the SAME join output, then one c_id aggregation. "
    "Per-touch credit is a single division of identical inputs "
    "(bitwise cross-engine), rounded and decimal-summed so the "
    "per-click total is order-insensitive. Scale: two keyed "
    "shuffles (user join, c_id agg) — both partial-aggregated; a "
    "hot user with many clicks×purchases is bounded by the 7-day "
    "band, the same skew profile as q_join_range_banded.",
)
def q_events_attribution(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (
            F.unix_micros(F.col("c_ts").cast("timestamp")).between(
                F.unix_micros(F.col("p_ts").cast("timestamp")) - _ATTR_WINDOW_US,
                F.unix_micros(F.col("p_ts").cast("timestamp")),
            )
        ),
    )
    w = Window.partitionBy("p_id")
    touches = j.select(
        "p_id", "p_value", "c_id", F.count("*").over(w).alias("n_touch")
    )
    credit = F.round(F.col("p_value") / F.col("n_touch"), 6).cast("decimal(18,6)")
    return touches.groupBy("c_id").agg(
        F.count("*").cast("long").alias("n_conversions"),
        (F.sum(credit).cast("double") + 0.0).alias("credit"),
    )


_KM_CUTOFF_H = 72  # observation window: censor conversions past 72h


@register(
    "q_events_survival",
    family="pipeline",
    oracle=f"""
    WITH su AS (
      SELECT user_id, min(ts) AS s FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT e.user_id, min(e.ts) AS p
      FROM events e JOIN su ON su.user_id = e.user_id AND e.ts >= su.s
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    subj AS (
      SELECT su.user_id,
             CAST(CASE WHEN p IS NOT NULL
                  AND (epoch_us(p) - epoch_us(s)) // 3600000000 < {_KM_CUTOFF_H}
                  THEN (epoch_us(p) - epoch_us(s)) // 3600000000
                  ELSE {_KM_CUTOFF_H} END AS BIGINT) AS h,
             CASE WHEN p IS NOT NULL
                  AND (epoch_us(p) - epoch_us(s)) // 3600000000 < {_KM_CUTOFF_H}
                  THEN 1 ELSE 0 END AS ev
      FROM su LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    grid AS (
      SELECT h, CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leave_n
      FROM subj GROUP BY h
    ),
    risk AS (
      SELECT h, d,
             (SELECT count(*) FROM subj)
               - coalesce(sum(leave_n) OVER (ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM grid
    ),
    km AS (
      SELECT h, d, n_risk,
             sum(CAST(round(ln(1.0 - d * 1.0 / n_risk), 6) AS DECIMAL(18,6)))
               OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS logsurv
      FROM risk
    )
    SELECT h AS hours, CAST(n_risk AS BIGINT) AS n_at_risk, d AS n_events,
           CAST(logsurv AS DOUBLE) AS log_survival
    FROM km WHERE d > 0
    ORDER BY h
    """,
    doc=f"Kaplan-Meier survival curve for signup→purchase conversion "
    f"with right-censoring at {_KM_CUTOFF_H}h — the time-to-event "
    "statistic behind retention/conversion analyses that a naive "
    "conversion rate gets wrong when observation windows differ. "
    "Subjects collapse to the HOUR grid (≤73 distinct times), so "
    "risk sets and event counts are exact integers from one "
    "aggregation; each KM factor's log is rounded and decimal-"
    "summed (the registry's log pattern) and the final exp of an "
    "exact decimal is engine-identical. Scale: per-subject rows "
    "reduce to the time grid before any window — the cumsum runs "
    "over ≤73 rows regardless of cohort size.",
)
def q_events_survival(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su.select(F.col("user_id").alias("su_user"), "s"),
              (F.col("user_id") == F.col("su_user")) & (F.col("ts") >= F.col("s")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    delay_h = (
        F.unix_micros(F.col("p").cast("timestamp"))
        - F.unix_micros(F.col("s").cast("timestamp"))
    ) / F.lit(3600000000)
    h_floor = F.floor(delay_h).cast("long")
    converted = F.col("p").isNotNull() & (h_floor < _KM_CUTOFF_H)
    subj = su.join(pu, "user_id", "left").select(
        F.when(converted, h_floor).otherwise(F.lit(_KM_CUTOFF_H)).alias("h"),
        F.when(converted, 1).otherwise(0).alias("ev"),
    )
    grid = subj.groupBy("h").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count("*").cast("long").alias("leave_n"),
    )
    total = subj.count()  # one scalar; the grid is ≤73 rows
    from pyspark.sql import Window

    # explicit constant partition key: the grid is ≤73 rows by
    # construction, so one partition IS the right plan — naming it
    # silences the WindowExec no-partition warning without changing it.
    # h*0 rather than lit(0): a foldable literal is optimizer-stripped
    # from the partition spec and the warning comes back (h ≥ 0 non-null
    # here, so h*0 is the constant 0 on every row).
    one = F.col("h") * F.lit(0)
    w_prev = (
        Window.partitionBy(one).orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(one)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_risk = F.lit(total) - F.coalesce(F.sum("leave_n").over(w_prev), F.lit(0))
    log_term = F.round(F.log(1.0 - F.col("d") * 1.0 / n_risk), 6).cast(
        "decimal(18,6)"
    )
    km = grid.select(
        "h",
        "d",
        n_risk.alias("n_risk"),
        F.sum(log_term).over(w_cum).alias("logsurv"),
    )
    return (
        km.filter(F.col("d") > 0)
        .orderBy("h")
        .select(
            F.col("h").alias("hours"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            # the exact decimal log-survival, NOT exp(): Math.exp and
            # libm exp disagree by 1 ulp on identical inputs (caught by
            # the differential sweep) — consumers exponentiate locally
            F.col("logsurv").cast("double").alias("log_survival"),
        )
    )


_RFM_Q = """
    WITH p AS (
      SELECT user_id,
             max(ts)                                   AS last_ts,
             CAST(count(*) AS BIGINT)                  AS freq,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
    rk AS (
      SELECT p.*, tot.n,
             row_number() OVER (ORDER BY last_ts DESC, user_id) AS r_rank,
             row_number() OVER (ORDER BY freq  DESC, user_id)   AS f_rank,
             row_number() OVER (ORDER BY cents DESC, user_id)   AS m_rank
      FROM p CROSS JOIN tot
    )
    SELECT user_id,
           CAST((r_rank * 5 + n - 1) // n AS BIGINT) AS r_q,
           CAST((f_rank * 5 + n - 1) // n AS BIGINT) AS f_q,
           CAST((m_rank * 5 + n - 1) // n AS BIGINT) AS m_q,
           CASE WHEN (r_rank * 5 + n - 1) // n = 1
                 AND (f_rank * 5 + n - 1) // n <= 2 THEN 'champion'
                WHEN (r_rank * 5 + n - 1) // n >= 4
                 AND (f_rank * 5 + n - 1) // n <= 2 THEN 'at_risk'
                WHEN (f_rank * 5 + n - 1) // n = 1 THEN 'loyal'
                ELSE 'regular' END AS segment
    FROM rk ORDER BY user_id
"""


@register(
    "q_events_rfm",
    family="pipeline",
    oracle=_RFM_Q,
    doc="RFM customer segmentation (recency/frequency/monetary "
    "quintiles + segment rules) WITHOUT a single-reducer window: each "
    "of the three rankings runs on the shared two-pass global-rank "
    "core (sorts_sets.global_rank — range-repartition, per-partition "
    "counts to the driver as one long each, broadcast offsets, "
    "partition-local row_number), so the corpus-wide ORDER BY that "
    "ntile() would hide behind one reducer is three balanced range "
    "shuffles of the USER AGGREGATE (already one row per user, not "
    "per event). Quintile = (rank*5 + n - 1) div n on exact integers "
    "— identical arithmetic both engines (ntile's remainder policy "
    "need not be re-implemented); monetary rides exact cents. The "
    "segment CASE is pure integer comparisons.",
)
def q_events_rfm(spark, sf_dir):
    from .sorts_sets import global_rank

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    r = global_rank(p, F.col("last_ts").desc(), F.col("user_id")).withColumnRenamed(
        "rank", "r_rank"
    )
    r = global_rank(r, F.col("freq").desc(), F.col("user_id")).withColumnRenamed(
        "rank", "f_rank"
    )
    r = global_rank(r, F.col("cents").desc(), F.col("user_id")).withColumnRenamed(
        "rank", "m_rank"
    )
    n = r.agg(F.count("*").cast("long").alias("n"))
    r = r.join(F.broadcast(n))
    q = lambda c: F.expr(f"({c} * 5 + n - 1) div n").cast("long")  # noqa: E731
    seg = (
        F.when((q("r_rank") == 1) & (q("f_rank") <= 2), "champion")
        .when((q("r_rank") >= 4) & (q("f_rank") <= 2), "at_risk")
        .when(q("f_rank") == 1, "loyal")
        .otherwise("regular")
    )
    return r.select(
        "user_id",
        q("r_rank").alias("r_q"),
        q("f_rank").alias("f_q"),
        q("m_rank").alias("m_q"),
        seg.alias("segment"),
    ).orderBy("user_id")


@register(
    "q_events_cohort_ltv",
    family="pipeline",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS st
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), j AS (
      SELECT CAST(year(s.st) * 100 + month(s.st) AS BIGINT) AS cohort_ym,
             CAST((year(p.ts) * 12 + month(p.ts))
                  - (year(s.st) * 12 + month(s.st)) AS BIGINT) AS age_m,
             p.cents
      FROM s JOIN p ON p.user_id = s.user_id AND p.ts >= s.st
    ), cell AS (
      SELECT cohort_ym, age_m,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM j GROUP BY cohort_ym, age_m
    )
    SELECT cohort_ym, age_m, n_purchases,
           CAST(sum(cents) OVER (PARTITION BY cohort_ym ORDER BY age_m
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_cents
    FROM cell ORDER BY cohort_ym, age_m
    """,
    doc="Cohort lifetime-value curves: signup-month cohort x months-"
    "since-signup, cumulative revenue per cohort cell — the LTV "
    "matrix behind payback-period decisions (the money-weighted "
    "complement of q_events_retention's user counts). Cohort and age "
    "are pure INTEGER month arithmetic (year*100+month / year*12+"
    "month deltas — no date_trunc type divergence between engines), "
    "revenue is exact cents end-to-end, and the running LTV is a "
    "window PARTITIONED BY cohort over the tiny cell grid (months x "
    "months), so the only corpus-sized work is the signup agg + one "
    "user-keyed equi-join with the ts >= signup residual; the "
    "cumsum input is dozens of rows per cohort regardless of table "
    "size.",
)
def q_events_cohort_ltv(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    ym = lambda c: F.year(c) * 100 + F.month(c)  # noqa: E731
    mix = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    cell = (
        s.join(p, (F.col("p_user") == F.col("user_id")) & (F.col("ts") >= F.col("st")))
        .select(
            ym(F.col("st")).cast("long").alias("cohort_ym"),
            (mix(F.col("ts")) - mix(F.col("st"))).cast("long").alias("age_m"),
            "cents",
        )
        .groupBy("cohort_ym", "age_m")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort_ym",
        "age_m",
        "n_purchases",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    ).orderBy("cohort_ym", "age_m")


@register(
    "q_events_sessionize",
    family="pipeline",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, event_id, ts, event_type,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_no
      FROM ordered
    )
    SELECT user_id,
           CAST(session_no AS BIGINT)               AS session_no,
           CAST(count(*) AS BIGINT)                 AS n_events,
           min(ts)                                  AS t_start,
           max(ts)                                  AS t_end,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT)                          AS n_purchases
    FROM tagged
    GROUP BY user_id, session_no
    """,
    doc="Batch sessionization (30-min inactivity gap): lag per user "
    "marks session starts, a running sum numbers them, then one "
    "per-session rollup — the canonical clickstream prep before "
    "funnel/retention features, and the batch twin of "
    "q_stream_session's session_window (same cut rule, so stream and "
    "batch sessions agree). Scale: both windows and the final agg "
    "share ONE hash shuffle on user_id (per-user ordering is "
    "partition-local within the window sort); no global sort, no "
    "single reducer — per-user event counts are bounded, so the "
    "window buffer is too. Ties cut deterministically on (ts, "
    "event_id).",
)
def q_events_sessionize(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    tagged = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn(
            "new_sess",
            F.when(
                F.lag("ts").over(w).isNull()
                | ((us(F.col("ts")) - us(F.lag("ts").over(w))) > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return tagged.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.floor(
            (us(F.max("ts")) - us(F.min("ts"))) / F.lit(1_000_000)
        ).cast("long").alias("duration_s"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("n_purchases"),
    )


@register(
    "q_events_ab_assign",
    family="pipeline",
    oracle="""
    WITH assigned AS (
      SELECT user_id, event_type, value,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                         AS INTEGER) % 100 < 50 THEN 'control'
               ELSE 'treatment'
             END AS arm
      FROM events
    )
    SELECT arm,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT)                AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT)                         AS n_purchases,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT)    AS revenue_cents
    FROM assigned GROUP BY arm
    """,
    doc="Deterministic experiment assignment + per-arm outcome rollup: "
    "the arm is a pure function of user_id (md5 prefix mod 100 — the "
    "universal hash-bucketing idiom for A/B splits: sticky across "
    "sessions, engines, and reprocessing, no assignment table to "
    "join). Arm arithmetic is identical in Spark (conv) and DuckDB "
    "(hex-literal cast); outcomes are exact integer cents. Map-side "
    "assignment, one tiny 2-group aggregate — embarrassingly "
    "parallel at 100 TB; pairs with q_agg_ttest/q_agg_mannwhitney "
    "for the significance read-out.",
)
def q_events_ab_assign(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    assigned = ev.withColumn(
        "arm", F.when(bucket < 50, "control").otherwise("treatment")
    )
    purchase = F.col("event_type") == "purchase"
    return assigned.groupBy("arm").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(purchase.cast("int")).cast("long").alias("n_purchases"),
        F.sum(
            F.when(purchase, F.round(F.col("value") * 100).cast("long")).otherwise(0)
        ).cast("long").alias("revenue_cents"),
    )


_DECAY_REF = "2024-02-01"   # scoring date (events span Jan 2024)
_DECAY_HALF_DAYS = 7        # half-life: one week
_DECAY_MAX_HALVINGS = 8     # horizon: weight 0 past 8 half-lives (56 days)


@register(
    "q_events_decay",
    family="events",
    oracle=f"""
    WITH aged AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             date_diff('day', CAST(ts AS DATE), DATE '{_DECAY_REF}')
               // {_DECAY_HALF_DAYS} AS k
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(min(k) AS BIGINT) AS freshest_halvings,
           CAST(sum(CAST(cents * (1 << ({_DECAY_MAX_HALVINGS} - k))
                         AS DECIMAL(38,0))) AS DOUBLE)
             / {float(2 ** _DECAY_MAX_HALVINGS * 100)} AS decayed_value
    FROM aged
    WHERE k <= {_DECAY_MAX_HALVINGS}
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Time-decayed engagement feature (feature-store staple): per "
    "user, purchase value decayed with a one-week half-life as of a "
    "reference date. The decay weight is 2^(-k) with k = whole "
    "half-lives elapsed — a deliberately EXACT formulation: "
    "every term cents*2^(K-k) is an integer, the DECIMAL(38,0) sum "
    "is order-insensitive, and one final division by the constant "
    "2^K*100 is a single exact-by-IEEE float op — so the score is "
    "bitwise reproducible across engines, retries, and partitionings, "
    "where the textbook sum(value*exp(-age/tau)) differs by summation "
    "order AND by libm exp() ulps (the q_events_survival lesson). "
    "Plan: one scan filtered to purchases inside the decay horizon "
    "(both predicates pushed), map-side-combinable sum/count/min — "
    "a single shuffle on user_id at any scale.",
)
def q_events_decay(spark, sf_dir):
    return decay_features(t(spark, sf_dir, "events"))


def decay_features(events):
    """Shared decay core — q_events_decay's batch body, also run under
    readStream by tests/test_streaming.py: the scaled-integer sum is a
    plain keyed aggregate (no window, no event-time dependence beyond
    the row itself), so update-mode streaming state converges to the
    batch result exactly — the incrementally-maintained feature-store
    view of the same feature."""
    scale = float(2 ** _DECAY_MAX_HALVINGS * 100)
    aged = (
        events
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            (
                F.datediff(
                    F.lit(_DECAY_REF).cast("date"), F.col("ts").cast("date")
                )
                / _DECAY_HALF_DAYS
            )
            .cast("long")  # truncating int division (ages are non-negative)
            .alias("k"),
        )
        .filter(F.col("k") <= _DECAY_MAX_HALVINGS)
    )
    weighted = aged.withColumn(
        "scaled",
        (
            F.col("cents")
            * F.expr(f"shiftleft(1L, int({_DECAY_MAX_HALVINGS} - k))")
        ).cast("decimal(38,0)"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.min("k").cast("long").alias("freshest_halvings"),
            (F.sum("scaled").cast("double") / scale).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


_BT_SEASON_DAYS = 7     # seasonal-naive lag: one week
_BT_EVAL_FROM = "2024-01-17"   # backtest window: the last two weeks


@register(
    "q_timeseries_backtest",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.event_type, a.d, a.n,
             b.n AS forecast
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND b.d = a.d - INTERVAL {_BT_SEASON_DAYS} DAY
      WHERE a.d >= DATE '{_BT_EVAL_FROM}'
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(n - forecast)) AS BIGINT) AS sum_abs_err,
           CAST(sum(abs(n - forecast)) AS DOUBLE) / count(*) AS mae
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
    doc="Forecast backtesting with a seasonal-naive baseline — the "
    "sanity harness every production forecaster is judged against: "
    "daily event counts per type, forecast(d) = actual(d - 7 days), "
    "MAE over the final two weeks. The seasonal join is BY DATE "
    "ARITHMETIC (d-7), not lag(7 rows), so calendar gaps can never "
    "silently misalign the season. Everything is exact integers "
    "until one final division (bitwise cross-engine); the daily "
    "rollup is the only corpus-sized pass — the backtest itself runs "
    "on the days x types grid, which is trivially small at any "
    "corpus scale.",
)
def q_timeseries_backtest(spark, sf_dir):
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("d"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        # the self-join consumes daily twice; pin the days x types grid
        # (tiny at any corpus scale) so events is scanned ONCE
        .localCheckpoint(eager=True)
    )
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("d").alias("b_d"),
        F.col("n").alias("forecast"),
    )
    joined = a.join(
        b,
        (F.col("b_type") == F.col("a.event_type"))
        & (F.col("b_d") == F.date_sub(F.col("a.d"), _BT_SEASON_DAYS)),
    ).filter(F.col("a.d") >= F.lit(_BT_EVAL_FROM).cast("date"))
    err = F.abs(F.col("a.n") - F.col("forecast"))
    return (
        joined.groupBy("a.event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(err).cast("long").alias("sum_abs_err"),
            (F.sum(err).cast("double") / F.count("*")).alias("mae"),
        )
        .orderBy("event_type")
    )


_DID_SPLIT = "2024-01-16"   # pre/post boundary (events span Jan 2024)


@register(
    "q_events_did",
    family="events",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE
               WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                         AS INTEGER) % 100 < 50 THEN 'control'
               ELSE 'treatment'
             END AS arm,
             CASE WHEN CAST(ts AS DATE) < DATE '{_DID_SPLIT}'
                  THEN 'pre' ELSE 'post' END AS period,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    cell AS (
      SELECT arm, period,
             CAST(count(*) AS BIGINT)   AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM assigned GROUP BY arm, period
    ),
    m AS (
      SELECT arm, period, n, cents,
             CAST(cents AS DOUBLE) / n AS mean_cents
      FROM cell
    )
    SELECT t_post.mean_cents - t_pre.mean_cents
             - (c_post.mean_cents - c_pre.mean_cents) AS did_cents,
           t_pre.mean_cents  AS treat_pre,
           t_post.mean_cents AS treat_post,
           c_pre.mean_cents  AS control_pre,
           c_post.mean_cents AS control_post,
           t_pre.n + t_post.n + c_pre.n + c_post.n AS n_purchases
    FROM m t_pre, m t_post, m c_pre, m c_post
    WHERE t_pre.arm  = 'treatment' AND t_pre.period  = 'pre'
      AND t_post.arm = 'treatment' AND t_post.period = 'post'
      AND c_pre.arm  = 'control'   AND c_pre.period  = 'pre'
      AND c_post.arm = 'control'   AND c_post.period = 'post'
    """,
    doc="Difference-in-differences estimator over the deterministic "
    "hash-assigned experiment (q_events_ab_assign's arms x a pre/post "
    "boundary): DiD = (treat_post - treat_pre) - (ctrl_post - "
    "ctrl_pre) on mean purchase cents — the causal read-out layer on "
    "top of the assignment + significance operators. One pushed-"
    "filter corpus pass to a 4-cell aggregate; each mean is ONE "
    "division of exact integers, and the estimator is three "
    "subtractions of those bitwise-identical doubles — fully "
    "deterministic cross-engine with no variance-reduction magic "
    "hiding float drift. The 2 x 2 cell grid pivots driver-side "
    "via first()-style conditional aggregation, so nothing beyond "
    "four rows ever leaves the executors.",
)
def q_events_did(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    cells = (
        ev.select(
            F.when(bucket < 50, "control").otherwise("treatment").alias("arm"),
            F.when(
                F.col("ts").cast("date") < F.lit(_DID_SPLIT).cast("date"), "pre"
            )
            .otherwise("post")
            .alias("period"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("arm", "period")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
        .withColumn("mean_cents", F.col("cents").cast("double") / F.col("n"))
    )

    def cell(arm, period, col):
        return F.max(
            F.when((F.col("arm") == arm) & (F.col("period") == period), F.col(col))
        )

    return cells.agg(
        (
            cell("treatment", "post", "mean_cents")
            - cell("treatment", "pre", "mean_cents")
            - (
                cell("control", "post", "mean_cents")
                - cell("control", "pre", "mean_cents")
            )
        ).alias("did_cents"),
        cell("treatment", "pre", "mean_cents").alias("treat_pre"),
        cell("treatment", "post", "mean_cents").alias("treat_post"),
        cell("control", "pre", "mean_cents").alias("control_pre"),
        cell("control", "post", "mean_cents").alias("control_post"),
        F.sum("n").cast("long").alias("n_purchases"),
    )


@register(
    "q_timeseries_cusum",
    family="pipeline",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    dim AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS total
      FROM daily GROUP BY 1
    ),
    walk AS (
      SELECT d.event_type, d.day, m.n_days,
             sum(d.cents * m.n_days - m.total) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS UNBOUNDED PRECEDING)                       AS r
      FROM daily d JOIN dim m USING (event_type)
    ),
    stat AS (
      SELECT event_type, day, n_days,
             r - least(0, min(r) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING))                      AS s
      FROM walk
    ),
    ranked AS (
      SELECT event_type, day AS cp_day, n_days,
             CAST(s AS BIGINT) AS cusum_scaled,
             row_number() OVER (
               PARTITION BY event_type ORDER BY s DESC, day)  AS rk
      FROM stat
    )
    SELECT event_type, cp_day, n_days, cusum_scaled
    FROM ranked WHERE rk = 1
    """,
    doc="CUSUM changepoint detection per series: the classic recursive "
    "statistic s_t = max(0, s_{t-1} + (x_t - mean)) is NOT a window "
    "function, but its closed form IS — s_t = R_t - min(R_0..R_t) "
    "with R_0 = 0 (the empty prefix MUST participate, hence the "
    "least(0, running_min)) — so the whole detector is two "
    "cumulative windows (sum, then min) plus an argmax, no "
    "recursion, no UDF; the identity is hypothesis-tested against "
    "the recursion in tests/test_cusum_props.py. Everything stays exact BIGINT: "
    "demeaning multiplies through by n_days (x_t*n - total, unit = "
    "cents*days) instead of subtracting a float mean, so the reported "
    "peak location and scaled statistic are bitwise cross-engine. "
    "The changepoint is the s-argmax (ties -> earliest day). Scale: "
    "windows partition by series over the DAILY rollup (rows = days, "
    "map-side-combined before the shuffle), so window partitions are "
    "bounded by calendar length, not data volume — at 100 TB the "
    "detector's input is #series x #days rows regardless of event "
    "count.",
)
def q_timeseries_cusum(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    dim = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum("cents").alias("total")
    )
    walk = daily.join(F.broadcast(dim), "event_type")
    cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = F.sum(F.col("cents") * F.col("n_days") - F.col("total")).over(cum)
    # the prefix-min must include the EMPTY prefix (R_0 = 0), or s_1 is
    # zeroed whenever the first demeaned value is positive
    stat = walk.select(
        "event_type",
        "day",
        "n_days",
        (r - F.least(F.min(r).over(cum), F.lit(0))).alias("s"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("s"), "day")
    )
    return (
        stat.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "n_days",
            F.col("s").cast("long").alias("cusum_scaled"),
        )
    )


@register(
    "q_timeseries_seasonal",
    family="pipeline",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ),
    ma AS (
      SELECT day, rev,
             sum(rev)  OVER w AS sum7,
             count(*)  OVER w AS n7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT ((day - DATE '1970-01-01') + 3) % 7 AS dow,
             round(rev - sum7 / 7.0, 6) AS detr
      FROM ma WHERE n7 = 7
    )
    SELECT dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(CAST(detr AS DECIMAL(38, 6))) AS DOUBLE) / count(*), 6)
             AS seasonal
    FROM det GROUP BY dow
    """,
    doc="Seasonal decomposition (classical additive, the moving-average "
    "core of STL): daily revenue -> centered 7-day moving-average "
    "trend -> detrended residual -> day-of-week seasonal index = mean "
    "residual per weekday. Incomplete edge windows (n7 < 7) are "
    "excluded, as in the textbook decomposition. Determinism: daily "
    "revenue is exact integer (cents x (100 - disc_cents)); the trend "
    "is one FP division of that exact sum (bitwise cross-engine); "
    "residuals round to 6 before the DECIMAL sum (registry rule 3); "
    "day-of-week comes from days-since-epoch arithmetic ((d+3) mod 7, "
    "0 = Monday), immune to engine dayofweek() convention drift. "
    "Scale: the ROWS window runs over the DAILY rollup — one row per "
    "calendar day after a map-side-combined groupBy — so the "
    "single-series window holds #days rows (bounded by the calendar, "
    "~2.5k here) regardless of raw volume; the constant-partition key "
    "keeps WindowExec from warning without repartitioning real data. "
    "Multi-series corpora would partition these windows by series key.",
)
def q_timeseries_seasonal(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(price_c * (F.lit(100) - disc_c)).alias("rev")
    )
    one = F.col("rev") * F.lit(0)  # non-foldable constant partition key
    w = Window.partitionBy(one).orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("sum7"),
        F.count("*").over(w).alias("n7"),
    )
    dow = (F.datediff("day", F.lit("1970-01-01").cast("date")) + 3) % 7
    det = ma.filter(F.col("n7") == 7).select(
        dow.alias("dow"),
        F.round(F.col("rev") - F.col("sum7") / 7.0, 6).alias("detr"),
    )
    return det.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.round(
            F.sum(F.col("detr").cast("decimal(38,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("seasonal"),
    )


_PATH_LEN = 5   # first N events define a user's entry path
_PATH_TOPK = 10


@register(
    "q_events_pathing",
    family="pipeline",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {_PATH_LEN}
      GROUP BY user_id
    ),
    counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_users
      FROM paths GROUP BY path
    ),
    topk AS (
      SELECT path, n_users,
             row_number() OVER (ORDER BY n_users DESC, path) AS rk
      FROM counted
    )
    SELECT path, n_users, CAST(rk AS BIGINT) AS rk
    FROM topk WHERE rk <= {_PATH_TOPK}
    """,
    doc="Top entry paths — the product-analytics 'what do users do "
    "first' readout that funnels (fixed steps) and Markov chains "
    "(memoryless transitions) both miss: each user's first 5 events "
    "in (ts, event_id) order become a path string, and the most "
    "common paths are ranked. The per-user sequence window partitions "
    "by user_id (bounded partitions — a user's history, further "
    "capped by the rank filter); path assembly sorts inside each "
    "user's aggregation buffer; the final count is a hash agg whose "
    "key cardinality is the distinct-path count (<= |event_types|^5, "
    "tiny). Top-k carries a total order (count desc, then path) so "
    "the cut is deterministic cross-engine. Scale: the only "
    "data-sized shuffle is the user-keyed one; everything after "
    "operates on one row per user, then one row per path.",
)
def q_events_pathing(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    paths = (
        ev.select("user_id", "event_type", rn.alias("rn"))
        .filter(F.col("rn") <= _PATH_LEN)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_users"))
    rk = F.row_number().over(
        Window.partitionBy(F.col("n_users") * F.lit(0)).orderBy(
            F.desc("n_users"), "path"
        )
    )
    return (
        counted.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= _PATH_TOPK)
        .select("path", "n_users", "rk")
    )


_ACF_MAX_LAG = 7


@register(
    "q_timeseries_autocorr",
    family="pipeline",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ),
    rn AS (
      SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    pairs AS (
      SELECT u.k, a.rev AS x, b.rev AS y
      FROM rn a
      CROSS JOIN unnest(range(1, {_ACF_MAX_LAG} + 1)) AS u(k)
      JOIN rn b ON a.rn = b.rn + u.k
    ),
    s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE)     AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE)     AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag, n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS autocorr
    FROM s
    """,
    doc="Autocorrelation function of the daily revenue series (lags "
    "1..7) — the seasonality detector that motivates "
    "q_timeseries_seasonal's weekly period. Lagged pairs come from a "
    "row-number SELF-JOIN against an exploded lag range rather than "
    "7 window passes: one window assigns rn over the daily rollup, "
    "one equi-join (rn = rn + k) builds every (lag, x, y) pair. "
    "Pearson r per lag derives from exact integer power sums "
    "(HUGEINT/DECIMAL(38)) cast to double, with the identical "
    "n*sxy - sx*sy expression tree both engines and sqrt-only "
    "algebra — the q_agg_moments determinism contract. Scale: the "
    "daily rollup is calendar-bound (~2.5k rows), so the self-join "
    "is trivially small no matter the raw volume; the rollup itself "
    "is one map-side-combinable groupBy.",
)
def q_timeseries_autocorr(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    daily = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(price_c * (F.lit(100) - disc_c)).alias("rev")
    )
    rn = daily.select(
        "rev",
        F.row_number()
        .over(Window.partitionBy(F.col("rev") * F.lit(0)).orderBy("day"))
        .alias("rn"),
    )
    lags = rn.select(
        "rev", "rn", F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("k")
    )
    a, b = lags.alias("a"), rn.alias("b")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = a.join(
        b, F.col("a.rn") == F.col("b.rn") + F.col("a.k")
    ).select(
        F.col("a.k").alias("k"),
        dec(F.col("a.rev")).alias("x"),
        dec(F.col("b.rev")).alias("y"),
    )
    s = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        F.col("k").cast("long").alias("lag"),
        "n",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("autocorr"),
    )


# Sequence-match: first N events per user form the searchable path.
# The cap bounds per-user state (collect_list buffer) at scale; 200
# events dwarfs any funnel depth worth matching.
_SEQ_CAP = 200
# Ordered-subsequence patterns over the '>'-delimited, '>'-wrapped path.
# '(.*>)?' = "zero or more whole events between the anchors" — the same
# RE evaluates identically under Java regex (Spark rlike) and RE2
# (DuckDB regexp_matches) because it uses no backrefs/lookaround.
_SEQ_FULL = ">view>(.*>)?click>(.*>)?purchase>"
_SEQ_PARTIAL = ">view>(.*>)?click>"
_SEQ_ENTRY = ">view>"


@register(
    "q_events_sequence_match",
    family="pipeline",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             '>' || string_agg(event_type, '>' ORDER BY rn) || '>' AS path
      FROM ranked WHERE rn <= {_SEQ_CAP}
      GROUP BY user_id
    ),
    staged AS (
      SELECT CASE
               WHEN regexp_matches(path, '{_SEQ_FULL}')
                 THEN 'view>click>purchase'
               WHEN regexp_matches(path, '{_SEQ_PARTIAL}')
                 THEN 'view>click'
               WHEN regexp_matches(path, '{_SEQ_ENTRY}')
                 THEN 'view'
               ELSE 'none'
             END AS stage
      FROM paths
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage
    ORDER BY stage
    """,
    doc="MATCH_RECOGNIZE-style sequence matching — which users "
    "completed the view -> click -> purchase journey as an ORDERED "
    "SUBSEQUENCE (any events in between), vs stalled at view -> "
    "click, vs only ever viewed. Each user's first 200 events "
    "(cap bounds aggregation-buffer state at scale) are assembled "
    "into one delimited path string inside the user-keyed "
    "aggregation — the same single exchange every per-user op "
    "shares — and the funnel stages are three anchored regexes "
    "evaluated most-specific-first in a CASE. Regexes use no "
    "backreferences or lookaround, so Java regex (Spark) and RE2 "
    "(DuckDB) agree. Scale: one user-keyed shuffle; the regex runs "
    "once per USER (not per event) on a <=~2KB string; output is "
    "one row per stage. The pattern alphabet is the event-type "
    "domain, so no symbol table is needed — the path IS the "
    "delimited type sequence.",
)
def q_events_sequence_match(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    paths = (
        ev.select("user_id", "event_type", rn.alias("rn"))
        .filter(F.col("rn") <= _SEQ_CAP)
        .groupBy("user_id")
        .agg(
            F.concat(
                F.lit(">"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rn", "event_type"))
                        ),
                        lambda s: s.event_type,
                    ),
                    ">",
                ),
                F.lit(">"),
            ).alias("path")
        )
    )
    stage = (
        F.when(F.col("path").rlike(_SEQ_FULL), "view>click>purchase")
        .when(F.col("path").rlike(_SEQ_PARTIAL), "view>click")
        .when(F.col("path").rlike(_SEQ_ENTRY), "view")
        .otherwise("none")
    )
    return (
        paths.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("stage")
    )


_TF_WINDOW_US = 7 * 86400 * 1000 * 1000  # 7 days, microseconds


@register(
    "q_events_funnel_timed",
    family="pipeline",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) > v.t
        AND epoch_us(e.ts) <= v.t + {_TF_WINDOW_US}
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > c.t
        AND epoch_us(e.ts) <= c.t + {_TF_WINDOW_US}
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
             CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'click',
             CAST((SELECT count(*) FROM c) AS BIGINT)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase',
             CAST((SELECT count(*) FROM p) AS BIGINT)
    ) ORDER BY stage
    """,
    doc="TIME-CONSTRAINED funnel — view -> click -> purchase where "
    "each stage must land within 7 days of the PREVIOUS stage's "
    "first completion (q_events_funnel counts any-order-in-history "
    "completion; product conversion windows never do). Stage "
    "anchors are exact micro-second minima: first view, first "
    "qualifying click strictly after it inside the window, then "
    "any qualifying purchase. Each stage is one keyed rollup "
    "joined back to events ON user_id — three co-partitioned "
    "shuffles on the same key (Spark reuses the exchange "
    "partitioning), no windows, no inequality join wider than the "
    "per-user slice. Exact integer microseconds make the window "
    "edges bitwise-identical cross-engine. Scale: per-stage state "
    "is one row per surviving user; survivors only shrink.",
)
def q_events_funnel_timed(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t_us").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("t_us") > F.col("vt"))
            & (F.col("t_us") <= F.col("vt") + _TF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("t_us").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("t_us") > F.col("ct"))
            & (F.col("t_us") <= F.col("ct") + _TF_WINDOW_US)
        )
        .select("user_id")
        .distinct()
    )
    rows = [
        (1, "view", v),
        (2, "click", c),
        (3, "purchase", p),
    ]
    counts = None
    for stage, name, df in rows:
        one = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("event_type"),
            "n_users",
        )
        counts = one if counts is None else counts.unionByName(one)
    return counts.orderBy("stage")


_WILSON_Z = 1.96  # 95% two-sided


@register(
    "q_events_conversion_ci",
    family="pipeline",
    oracle=f"""
    WITH assigned AS (
      SELECT DISTINCT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 4)) AS BIGINT) % 100 < 50
                  THEN 'control' ELSE 'treatment' END AS arm
      FROM events
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT a.arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(count(c.user_id) AS BIGINT) AS n_converted
      FROM assigned a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY a.arm
    )
    SELECT arm, n_users, n_converted,
           round(CAST(n_converted AS DOUBLE) / n_users, 6) AS conv_rate,
           round((CAST(n_converted AS DOUBLE) / n_users
                  + {_WILSON_Z} * {_WILSON_Z} / (2 * n_users)
                  - {_WILSON_Z} * sqrt(
                      (CAST(n_converted AS DOUBLE) / n_users)
                      * (1 - CAST(n_converted AS DOUBLE) / n_users) / n_users
                      + {_WILSON_Z} * {_WILSON_Z}
                        / (4 * CAST(n_users AS DOUBLE) * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6)
             AS wilson_lo,
           round((CAST(n_converted AS DOUBLE) / n_users
                  + {_WILSON_Z} * {_WILSON_Z} / (2 * n_users)
                  + {_WILSON_Z} * sqrt(
                      (CAST(n_converted AS DOUBLE) / n_users)
                      * (1 - CAST(n_converted AS DOUBLE) / n_users) / n_users
                      + {_WILSON_Z} * {_WILSON_Z}
                        / (4 * CAST(n_users AS DOUBLE) * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6)
             AS wilson_hi
    FROM cells ORDER BY arm
    """,
    doc="Wilson score confidence interval for per-arm conversion — "
    "the readout that closes the A/B toolkit (t-test, chi-square, "
    "Mann-Whitney, KS, bootstrap, DiD): unlike the normal "
    "approximation it never leaves [0,1] and stays calibrated at "
    "small n or extreme rates, which is why it is the standard for "
    "conversion metrics. Arms come from the same deterministic md5 "
    "bucket as q_events_ab_assign (sticky, joinless); conversion = "
    "user ever purchased. The interval is pure float arithmetic on "
    "two exact integers (n_users, n_converted) with an identical "
    "expression tree both engines, so even sqrt agrees bitwise. "
    "Scale: two user-keyed rollups into a 2-row cell table — the "
    "statistic costs nothing beyond the distincts.",
)
def q_events_conversion_ci(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    assigned = ev.select(
        "user_id",
        F.when(bucket < 50, "control").otherwise("treatment").alias("arm"),
    ).distinct()
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    cells = (
        assigned.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_converted").cast("double") / F.col("n_users")
    z2 = F.lit(_WILSON_Z * _WILSON_Z)
    center = p + z2 / (2 * F.col("n_users"))
    margin = F.lit(_WILSON_Z) * F.sqrt(
        p * (1 - p) / F.col("n_users") + z2 / (4 * n * F.col("n_users"))
    )
    denom = 1 + z2 / F.col("n_users")
    return cells.select(
        "arm",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("conv_rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("arm")


@register(
    "q_events_stickiness",
    family="pipeline",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('week', ts) AS week,
             date_trunc('day', ts) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT date_trunc('week', ts) AS week,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY 1
    )
    SELECT CAST(d.week AS TIMESTAMP) AS week,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.dau) AS BIGINT) AS dau_sum,
           w.wau,
           round(CAST(sum(d.dau) AS DOUBLE) / (count(*) * w.wau), 6)
             AS stickiness
    FROM daily d JOIN weekly w USING (week)
    GROUP BY d.week, w.wau
    ORDER BY week
    """,
    doc="DAU/WAU stickiness per week — avg daily-active over "
    "weekly-active users, the engagement-frequency readout every "
    "growth dashboard leads with (a 0.9 product is used daily; a 0.2 "
    "product weekly). Two distinct-user aggregations share the "
    "(week, user) grain: Spark's partial aggregation collapses "
    "(week, day, user) duplicates map-side before either distinct "
    "shuffles, so the exchange carries unique keys, not raw events. "
    "The ratio is one rounded division of exact BIGINTs (dau summed "
    "over exact per-day distincts, cross-multiplied by day count and "
    "WAU). At 100 TB the exact per-day distinct is the right tool — "
    "its key space is bounded by true actives/day; the documented "
    "swap for unbounded keys is approx_count_distinct "
    "(q_profile_columns_sketch pattern).",
)
def q_events_stickiness(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    daily = (
        ev.groupBy(
            wk.alias("week"), F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.countDistinct("user_id").cast("long").alias("dau"))
    )
    weekly = ev.groupBy(wk.alias("week")).agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        daily.join(weekly, "week")
        .groupBy("week", "wau")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("dau").cast("long").alias("dau_sum"),
        )
        .select(
            "week",
            "n_days",
            "dau_sum",
            "wau",
            F.round(
                F.col("dau_sum").cast("double") / (F.col("n_days") * F.col("wau")), 6
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


@register(
    "q_events_concurrency",
    family="pipeline",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, min(ts) AS t_start, max(ts) AS t_end
      FROM (
        SELECT user_id, ts,
               sum(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING
               ) AS session_no
        FROM ordered
      )
      GROUP BY user_id, session_no
    ),
    segs AS (
      SELECT unnest(generate_series(
               date_trunc('day', t_start), date_trunc('day', t_end),
               INTERVAL 1 DAY)) AS day,
             t_start, t_end
      FROM sessions
    ),
    deltas AS (
      SELECT day,
             greatest(epoch_us(t_start), epoch_us(day)) AS us,
             1 AS plus, 0 AS minus
      FROM segs
      UNION ALL
      SELECT day,
             least(epoch_us(t_end), epoch_us(day + INTERVAL 1 DAY) - 1) AS us,
             0 AS plus, 1 AS minus
      FROM segs
    ),
    ticks AS (
      SELECT day, us,
             CAST(sum(plus) AS BIGINT) AS plus,
             CAST(sum(minus) AS BIGINT) AS minus
      FROM deltas GROUP BY day, us
    ),
    running AS (
      SELECT day, minus, plus,
             sum(plus - minus) OVER (
               PARTITION BY day ORDER BY us ROWS UNBOUNDED PRECEDING
             ) AS cum_net
      FROM ticks
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(sum(plus) AS BIGINT) AS n_segments,
           CAST(max(cum_net + minus) AS BIGINT) AS peak_concurrency
    FROM running GROUP BY day ORDER BY day
    """,
    doc="Peak concurrent sessions per day — the capacity-planning "
    "sweep-line: sessionize (30-min gap, the q_events_sessionize cut "
    "rule), clip each session to day boundaries, emit +1/-1 ticks at "
    "segment start/end, and take the max of the running sum. "
    "Determinism without a fragile tie order: ticks are AGGREGATED "
    "per distinct microsecond first (plus/minus counts), the running "
    "sum is over distinct timestamps (ROWS == RANGE), and occupancy "
    "at an instant is defined starts-first as cum_net + minus — no "
    "row-order dependence at equal timestamps in either engine. "
    "Timestamps compared in exact integer microseconds (unix_micros "
    "== epoch_us; never truncated seconds). Scale: sessions shuffle "
    "once on user_id; the sweep-line windows partition BY DAY, so "
    "each day's tick list (2 x sessions touching it) is the only "
    "window buffer — no global ordering ever.",
)
def q_events_concurrency(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    _us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = _us(F.col("ts")) - _us(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("new_sess", new_sess)
        .withColumn("session_no", F.sum("new_sess").over(w_run))
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    )
    segs = sessions.select(
        F.explode(
            F.sequence(
                F.date_trunc("day", "t_start"),
                F.date_trunc("day", "t_end"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "t_start",
        "t_end",
    )
    _usc = lambda name: F.unix_micros(F.col(name).cast("timestamp"))  # noqa: E731
    starts = segs.select(
        "day",
        F.greatest(_usc("t_start"), _usc("day")).alias("us"),
        F.lit(1).alias("plus"),
        F.lit(0).alias("minus"),
    )
    ends = segs.select(
        "day",
        F.least(
            _usc("t_end"),
            F.unix_micros(
                (F.col("day") + F.expr("INTERVAL 1 DAY")).cast("timestamp")
            )
            - 1,
        ).alias("us"),
        F.lit(0).alias("plus"),
        F.lit(1).alias("minus"),
    )
    ticks = (
        starts.unionByName(ends)
        .groupBy("day", "us")
        .agg(
            F.sum("plus").cast("long").alias("plus"),
            F.sum("minus").cast("long").alias("minus"),
        )
    )
    w_day = Window.partitionBy("day").orderBy("us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ticks.withColumn("cum_net", F.sum(F.col("plus") - F.col("minus")).over(w_day))
        .groupBy("day")
        .agg(
            F.sum("plus").cast("long").alias("n_segments"),
            F.max(F.col("cum_net") + F.col("minus")).cast("long").alias(
                "peak_concurrency"
            ),
        )
        .orderBy("day")
    )


_SLO = 0.80  # error budget: at most 20% of events may be errors


@register(
    "q_events_error_budget",
    family="pipeline",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_err
      FROM events GROUP BY 1
    )
    SELECT CAST(hour AS TIMESTAMP) AS hour, n, n_err,
           round(n_err * 5.0 / n, 6) AS burn_rate
    FROM hourly
    WHERE n_err * 5 > n
    ORDER BY hour
    """,
    doc=f"SLO error-budget burn rate per hour (SLO = {_SLO:.0%} "
    "success): burn = error_rate / allowed_rate; hours burning faster "
    "than 1x eat more budget than they are allotted — the "
    "SRE-handbook alert rule, as a batch readout over the event log. "
    "The over-budget filter is ALL-INTEGER (n_err·5 > n — the 20% "
    "budget cross-multiplied; a float 1−SLO literal parses as binary "
    "0.1999.. in Spark but exact DECIMAL 0.2 in DuckDB and diverges "
    "on burn==1.0 boundary hours), and the displayed burn is one "
    "rounded division of exact counts. Scale: "
    "one map-side-combined hourly rollup; everything after is "
    "per-hour arithmetic.",
)
def q_events_error_budget(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )
    return (
        hourly.filter(F.col("n_err") * 5 > F.col("n"))
        .select(
            "hour",
            "n",
            "n_err",
            F.round(F.col("n_err") * 5.0 / F.col("n"), 6).alias("burn_rate"),
        )
        .orderBy("hour")
    )


# two-sided alpha=0.05, power=0.80; detect a 10% relative lift
_PWR_Z = 1.9599639845400545 + 0.8416212335729143  # z_{0.975} + z_{0.80}
_PWR_LIFT = 1.10


@register(
    "q_events_power",
    family="pipeline",
    oracle=f"""
    WITH base AS (
      SELECT CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                      THEN user_id END) AS BIGINT) AS conv,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users
      FROM events
    )
    SELECT users, conv,
           round(conv * 1.0 / users, 6) AS p1,
           round(conv * 1.0 / users * {_PWR_LIFT}, 6) AS p2,
           CAST(ceil(
             {_PWR_Z} * {_PWR_Z}
             * ((conv * 1.0 / users) * (1 - conv * 1.0 / users)
                + (conv * 1.0 / users * {_PWR_LIFT})
                  * (1 - conv * 1.0 / users * {_PWR_LIFT}))
             / ((conv * 1.0 / users * {_PWR_LIFT}) - conv * 1.0 / users)
             / ((conv * 1.0 / users * {_PWR_LIFT}) - conv * 1.0 / users)
           ) AS BIGINT) AS n_per_arm
    FROM base
    """,
    doc="A/B test power analysis: minimum users per arm to detect a "
    "10% relative conversion lift at alpha=0.05 / power=0.80, from the "
    "OBSERVED baseline rate — the pre-experiment sizing step that "
    "completes the experimentation toolkit (q_events_ab_assign splits, "
    "q_events_did and q_events_conversion_ci read out). The classic "
    "two-proportion formula n = z²(p1q1+p2q2)/(p2−p1)²; p1 is an exact "
    "rational of distinct counts, the z constant is a fixed literal, "
    "so the whole expression tree is identical cross-engine (ceil ties "
    "are measure-zero). Scale: one distinct-user rollup; the formula "
    "is constant-size.",
)
def q_events_power(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    base = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("long")
        .alias("conv"),
        F.countDistinct("user_id").cast("long").alias("users"),
    )
    p1 = F.col("conv") * 1.0 / F.col("users")
    p2 = p1 * _PWR_LIFT
    n = F.ceil(
        (_PWR_Z * _PWR_Z) * (p1 * (1 - p1) + p2 * (1 - p2)) / (p2 - p1) / (p2 - p1)
    ).cast("long")
    return base.select(
        "users",
        "conv",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        n.alias("n_per_arm"),
    )


@register(
    "q_events_interpurchase",
    family="pipeline",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(prev_ts)) // 60000000 AS gap_min
      FROM p WHERE prev_ts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_repeat_buyers,
           CAST(min(gap_min) AS BIGINT) AS min_gap_min,
           round(quantile_cont(gap_min, 0.50), 4) AS p50_gap_min,
           round(quantile_cont(gap_min, 0.90), 4) AS p90_gap_min,
           CAST(max(gap_min) AS BIGINT) AS max_gap_min
    FROM gaps
    """,
    doc="Inter-purchase interval distribution: per-user gaps between "
    "consecutive purchases (lag over the purchase stream), summarized "
    "as count / repeat-buyer count / min / p50 / p90 / max minutes — "
    "the replenishment-cycle readout behind churn prediction and "
    "send-time optimization. Gaps are exact integer minutes "
    "(microsecond subtraction floor-divided — never second-truncated "
    "casts); the two percentiles are exact interpolation on those "
    "integers. Scale: the purchase filter prunes before the one "
    "user-keyed window shuffle; the summary is a single map-side "
    "combinable aggregate (percentile buffer bounded by distinct gap "
    "values).",
)
def q_events_interpurchase(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            ((us(F.col("ts")) - us(F.col("prev_ts"))) / 60_000_000)
            .cast("long")
            .alias("gap_min"),
        )
    )
    return gaps.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.countDistinct("user_id").cast("long").alias("n_repeat_buyers"),
        F.min("gap_min").cast("long").alias("min_gap_min"),
        F.round(F.expr("percentile(gap_min, 0.50)"), 4).alias("p50_gap_min"),
        F.round(F.expr("percentile(gap_min, 0.90)"), 4).alias("p90_gap_min"),
        F.max("gap_min").cast("long").alias("max_gap_min"),
    )


_INC_WINDOW_US = 1_800_000_000  # each error opens a 30-min incident window


@register(
    "q_timeseries_interval_union",
    family="timeseries",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             date_trunc('day', ts) AS day,
             epoch_us(ts) AS s_us,
             least(epoch_us(ts) + {_INC_WINDOW_US},
                   epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY)) AS e_us,
             event_id
      FROM events WHERE event_type IN ('error', 'purchase')
    ),
    flagged AS (
      SELECT event_type, day, s_us, e_us,
             CASE WHEN s_us > coalesce(max(e_us) OVER (
                    PARTITION BY event_type, day ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_inc
      FROM pts
    ),
    numbered AS (
      SELECT event_type, day, s_us, e_us,
             sum(new_inc) OVER (
               PARTITION BY event_type, day ORDER BY s_us, e_us
               ROWS UNBOUNDED PRECEDING) AS inc_id
      FROM flagged
    ),
    incidents AS (
      SELECT event_type, day, inc_id,
             min(s_us) AS inc_start, max(e_us) AS inc_end
      FROM numbered GROUP BY event_type, day, inc_id
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_incidents,
           CAST(sum(inc_end - inc_start) // 60000000 AS BIGINT)
             AS covered_min
    FROM incidents GROUP BY event_type ORDER BY event_type
    """,
    doc="Interval union (incident merge): every error/purchase event "
    "opens a 30-min window; transitively-overlapping windows merge "
    "into incidents and the union length is reported per type — the "
    "uptime/alert-coverage computation (N overlapping alerts ≠ N·30 "
    "minutes of outage). The classic cummax sweep: a window starts a "
    "NEW incident iff its start exceeds the running max end of all "
    "earlier windows; within a merged chain the union is simply "
    "max(end) − min(start). Incident composition is invariant to tie "
    "order (equal starts merge symmetrically), so the result is "
    "deterministic with the (s, event_id) total order. Scale: windows "
    "partition by (type, DAY) — windows are clipped at midnight so no "
    "partition outgrows a day's events (same valve as "
    "q_events_concurrency); never a global sort. All arithmetic in "
    "exact integer microseconds.",
)
def q_timeseries_interval_union(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "purchase")
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    day = F.date_trunc("day", F.col("ts"))
    pts = ev.select(
        "event_type",
        day.alias("day"),
        us(F.col("ts")).alias("s_us"),
        F.least(
            us(F.col("ts")) + _INC_WINDOW_US,
            us(day + F.expr("INTERVAL 1 DAY")),
        ).alias("e_us"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("event_type", "day")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pts.select(
        "event_type",
        "day",
        "s_us",
        "e_us",
        F.when(
            F.col("s_us") > F.coalesce(F.max("e_us").over(w_prev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_inc"),
    )
    w_cum = (
        Window.partitionBy("event_type", "day")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    incidents = (
        flagged.withColumn("inc_id", F.sum("new_inc").over(w_cum))
        .groupBy("event_type", "day", "inc_id")
        .agg(F.min("s_us").alias("inc_start"), F.max("e_us").alias("inc_end"))
    )
    return (
        incidents.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_incidents"),
            (F.sum(F.col("inc_end") - F.col("inc_start")) / 60_000_000)
            .cast("long")
            .alias("covered_min"),
        )
        .orderBy("event_type")
    )


_ABANDON_WINDOW_US = 3_600_000_000  # purchase within 1h converts the click


@register(
    "q_events_abandonment",
    family="pipeline",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, event_id, ts,
             date_trunc('day', ts) AS day
      FROM events WHERE event_type = 'click'
    ),
    converted AS (
      SELECT DISTINCT c.event_id
      FROM clicks c
      JOIN events p
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase'
       AND epoch_us(p.ts) BETWEEN epoch_us(c.ts)
                              AND epoch_us(c.ts) + {_ABANDON_WINDOW_US}
    )
    SELECT CAST(c.day AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_carts,
           CAST(sum(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_abandoned,
           round(CAST(sum(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS abandon_rate
    FROM clicks c LEFT JOIN converted v ON v.event_id = c.event_id
    GROUP BY c.day ORDER BY day
    """,
    doc="Cart abandonment per day: a click 'carts'; it converts iff the "
    "same user purchases within 1 hour, else it is abandoned — the "
    "complement readout to q_events_funnel_timed (which counts the "
    "conversions; revenue teams alert on the abandons). The "
    "within-window EXISTS is a user-keyed equi-join with a "
    "microsecond-exact band predicate (the q_join_theta_range shape "
    "— only same-user pairs are ever compared, never a time cross "
    "join), then a LEFT anti-style join marks the unconverted. "
    "Scale: both joins key on user_id/event_id hash partitions; "
    "per-user event counts bound the band fan-out.",
)
def q_events_abandonment(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "ts",
        F.date_trunc("day", "ts").alias("day"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & us(F.col("p_ts")).between(
                us(F.col("ts")), us(F.col("ts")) + _ABANDON_WINDOW_US
            ),
        )
        .select("event_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    return (
        clicks.join(converted, "event_id", "left")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_carts"),
            F.sum(F.when(F.col("conv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_abandoned"),
        )
        .select(
            "day",
            "n_carts",
            "n_abandoned",
            F.round(F.col("n_abandoned").cast("double") / F.col("n_carts"), 6).alias(
                "abandon_rate"
            ),
        )
        .orderBy("day")
    )


@register(
    "q_timeseries_dow_index",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT extract(dow FROM ts) AS dow,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(cents) AS BIGINT) AS tc,
                   CAST(count(*) AS BIGINT) AS k FROM daily)
    SELECT CAST(d.dow AS BIGINT) AS dow, d.n,
           round(d.n * 1.0 * t.k / t.tn, 6) AS traffic_index,
           round(d.cents * 1.0 * t.k / t.tc, 6) AS value_index
    FROM daily d CROSS JOIN tot t
    ORDER BY dow
    """,
    doc="Day-of-week seasonal index: each weekday's traffic and value "
    "share relative to a uniform week (index 1.0 = average day; "
    "retail Saturdays run ~1.3) — the normalization table every "
    "forecast and staffing model starts from, and the seasonal-index "
    "companion to q_timeseries_seasonal's decomposition. Indexes are "
    "cross-multiplied rationals of exact BIGINTs (share·k, no "
    "intermediate float means); dow via extract == Spark "
    "dayofweek−1. One map-side rollup to ≤7 rows.",
)
def q_timeseries_dow_index(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy((F.dayofweek("ts") - 1).alias("dow")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    tot = daily.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("cents").cast("long").alias("tc"),
        F.count("*").cast("long").alias("k"),
    )
    return (
        daily.join(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            "n",
            F.round(F.col("n") * 1.0 * F.col("k") / F.col("tn"), 6).alias(
                "traffic_index"
            ),
            F.round(F.col("cents") * 1.0 * F.col("k") / F.col("tc"), 6).alias(
                "value_index"
            ),
        )
        .orderBy("dow")
    )


_VELOCITY_N = 4  # >= N purchases inside any trailing 30-min window flags
_VELOCITY_WIN_S = 1800


@register(
    "q_events_velocity",
    family="pipeline",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
      FROM events WHERE event_type = 'purchase'
    ),
    windowed AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN {_VELOCITY_WIN_S} PRECEDING AND CURRENT ROW
             ) AS n_in_window
      FROM p
    )
    SELECT user_id,
           CAST(max(n_in_window) AS BIGINT) AS max_burst,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM windowed
    GROUP BY user_id
    HAVING max(n_in_window) >= {_VELOCITY_N}
    ORDER BY user_id
    """,
    doc=f"Transaction-velocity fraud screen: users with >= "
    f"{_VELOCITY_N} purchases inside ANY trailing 30-minute window — "
    "the card-testing / bot-burst rule every payments risk engine "
    "runs. Implemented with a NUMERIC RANGE FRAME (RANGE BETWEEN "
    f"{_VELOCITY_WIN_S} PRECEDING) over integer epoch-seconds, the "
    "event-time sliding count without self-joining the stream "
    "against itself; equal-timestamp rows are handled identically by "
    "RANGE semantics in both engines (frame bounds are VALUES, not "
    "row positions — no tie-order dependence). Scale: one user-keyed "
    "window shuffle; per-user purchase history bounds the frame "
    "buffer; the streaming twin is q_stream_sliding's windowed count.",
)
def q_events_velocity(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    sec = (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_VELOCITY_WIN_S, 0)
    )
    return (
        ev.select("user_id", sec.alias("sec"))
        .withColumn("n_in_window", F.count("*").over(w))
        .groupBy("user_id")
        .agg(
            F.max("n_in_window").cast("long").alias("max_burst"),
            F.count("*").cast("long").alias("n_purchases"),
        )
        .filter(F.col("max_burst") >= _VELOCITY_N)
        .orderBy("user_id")
    )


@register(
    "q_events_tte_labels",
    family="pipeline",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS us,
             ts
      FROM events
    ),
    labeled AS (
      SELECT user_id, event_id, event_type, us,
             min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_purchase_us
      FROM e
    )
    SELECT user_id, event_id,
           CAST((next_purchase_us - us) // 60000000 AS BIGINT)
             AS tte_minutes
    FROM labeled
    WHERE next_purchase_us IS NOT NULL
    ORDER BY user_id, event_id
    """,
    doc="Time-to-event TRAINING LABELS: at every event, the minutes "
    "until the same user's NEXT purchase — the label generator for "
    "survival / next-purchase models, produced in one pass with a "
    "FORWARD-looking window (min over the following frame of "
    "purchase timestamps; rows after the last purchase are censored "
    "and dropped here — q_events_survival handles the censored "
    "analysis). The frame trick replaces the per-row as-of-forward "
    "self-join: one user-keyed window instead of an events×purchases "
    "band join. Exact integer microseconds → floor minutes. Scale: "
    "one hash shuffle on user_id; frame buffers bounded by per-user "
    "history.",
)
def q_events_tte_labels(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    labeled = ev.select(
        "user_id", "event_id", "event_type", us.alias("us")
    ).withColumn(
        "next_purchase_us",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).over(w),
    )
    return (
        labeled.filter(F.col("next_purchase_us").isNotNull())
        .select(
            "user_id",
            "event_id",
            ((F.col("next_purchase_us") - F.col("us")) / 60_000_000)
            .cast("long")
            .alias("tte_minutes"),
        )
        .orderBy("user_id", "event_id")
    )



@register(
    "q_timeseries_holt",
    family="timeseries",
    oracle="""
    WITH RECURSIVE hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id, hr
    ),
    series AS (
      SELECT user_id, list(CAST(cents AS DOUBLE) ORDER BY hr) AS xs
      FROM hourly GROUP BY user_id
    ),
    -- per-user scalar recursion, NOT a struct-lambda list_reduce: DuckDB
    -- 1.0 struct-pack lambdas update acc fields SEQUENTIALLY (a later
    -- field reading acc.l sees the new l — verified with a minimal
    -- repro), which silently corrupts any coupled two-variable fold
    fit AS (
      SELECT user_id, xs, 1 AS t, xs[1] AS l, CAST(0.0 AS DOUBLE) AS b
      FROM series
      UNION ALL
      SELECT user_id, xs, t + 1,
             CAST(0.5 AS DOUBLE) * xs[t + 1] + CAST(0.5 AS DOUBLE) * (l + b),
             CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * xs[t + 1]
               + CAST(0.5 AS DOUBLE) * (l + b)) - l) + CAST(0.75 AS DOUBLE) * b
      FROM fit WHERE t < len(xs)
    )
    SELECT user_id, CAST(len(xs) AS BIGINT) AS n_hours,
           round(l, 6) AS level_cents, round(b, 6) AS trend_cents,
           round(l + b, 6) AS forecast_cents
    FROM fit WHERE t = len(xs) ORDER BY user_id
    """,
    doc="Holt double exponential smoothing (level + trend) per user "
    "over the hourly spend series, alpha=1/2 beta=1/4 — the "
    "one-step-ahead forecasting baseline every anomaly detector and "
    "capacity planner starts from, and the stateful-fold shape EWMA "
    "(q_timeseries_ewma) cannot express (trend couples to level). "
    "Exactness WITHOUT quantization: the recurrence is a left fold "
    "whose op order is fixed, inputs are exact integer cents, and the "
    "smoothing constants are dyadic rationals — so every IEEE-754 "
    "double op is bit-identical across engines by determinism of "
    "+,-,*,/ under a fixed evaluation order (Spark F.aggregate fold "
    "== DuckDB list_reduce fold element-for-element, init = first "
    "observation, trend 0). Scale: the fold is a JVM array expression "
    "over ONE user's hourly rollup (bounded by hours, not events); "
    "the hourly agg is map-side combinable; no window, no Python, no "
    "driver loop — 100 TB of events fold after a 1e4x rollup. Ref: "
    "no reference counterpart — time-series tier.",
)
def q_timeseries_holt(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    series = hourly.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("hr"), F.col("cents").cast("double").alias("x"))
                )
            ),
            lambda s: s["x"],
        ).alias("xs")
    )
    half = F.lit(0.5).cast("double")
    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.struct(
            F.element_at(F.col("xs"), 1).alias("l"),
            F.lit(0.0).cast("double").alias("b"),
        ),
        lambda acc, e: F.struct(
            (half * e + half * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(0.25).cast("double")
                * ((half * e + half * (acc["l"] + acc["b"])) - acc["l"])
                + F.lit(0.75).cast("double") * acc["b"]
            ).alias("b"),
        ),
    )
    return (
        series.filter(F.size("xs") >= 1)
        .select(
            "user_id",
            F.size("xs").cast("long").alias("n_hours"),
            st.alias("st"),
        )
        .select(
            "user_id",
            "n_hours",
            F.round(F.col("st.l"), 6).alias("level_cents"),
            F.round(F.col("st.b"), 6).alias("trend_cents"),
            F.round(F.col("st.l") + F.col("st.b"), 6).alias("forecast_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "q_timeseries_theilsen",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, 2
    ),
    slopes AS (
      SELECT a.user_id,
             (CAST(b.cents AS DOUBLE) - CAST(a.cents AS DOUBLE))
               / (b.d - a.d) AS slope,
             a.d AS d1, b.d AS d2
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND a.d < b.d
    ),
    ranked AS (
      SELECT user_id, slope,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY slope, d1, d2) AS rn,
             count(*) OVER (PARTITION BY user_id) AS np
      FROM slopes
    )
    SELECT r.user_id,
           n.n_days,
           CAST(r.np AS BIGINT) AS n_pairs,
           round(r.slope / 100, 6) + 0.0 AS theil_slope_per_day
    FROM ranked r
    JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY user_id) n USING (user_id)
    WHERE r.rn = (r.np + 1) // 2
    ORDER BY user_id
    """,
    doc="Theil-Sen robust trend slope per user over daily purchase "
    "spend — the median of all pairwise slopes, the estimator that "
    "shrugs off the outliers OLS (q_agg_ols) chases; the standard "
    "robust-trend readout for spend/latency drift. Exactness: spend "
    "becomes exact daily cent sums; every pairwise slope is ONE double "
    "division of exact integers (bitwise both engines); the median is "
    "the DISCRETE lower median picked by row_number over (slope, d1, "
    "d2) — a total order, no averaging of two middle floats. Scale: "
    "the pair join runs on the DAILY ROLLUP (bounded by the calendar — "
    "~30 rows/user whatever the event volume), so pairs are "
    "O(days^2)=O(1) per user, shuffled by user_id; the raw stream is "
    "touched once by the combinable rollup. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_timeseries_theilsen(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    daily = daily.localCheckpoint(eager=False)  # pair join reads twice
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.cents").cast("double") - F.col("a.cents").cast("double"))
            / (F.col("b.d") - F.col("a.d"))
        ).alias("slope"),
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
    )
    w = Window.partitionBy("user_id").orderBy("slope", "d1", "d2")
    wc = Window.partitionBy("user_id")
    ranked = slopes.select(
        "user_id",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("np"),
    )
    n_days = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(np + 1) div 2"))
        .join(n_days, "user_id")
        .select(
            "user_id",
            "n_days",
            F.col("np").cast("long").alias("n_pairs"),
            (F.round(F.col("slope") / 100, 6) + 0.0).alias("theil_slope_per_day"),
        )
        .orderBy("user_id")
    )


_SMA_FAST = 3
_SMA_SLOW = 7


@register(
    "q_timeseries_sma_crossover",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    sma AS (
      SELECT d, cents,
             row_number() OVER (ORDER BY d) AS rn,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN {_SMA_FAST - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s_fast,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN {_SMA_SLOW - 1} PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s_slow
      FROM daily
    ),
    sig AS (
      SELECT d, cents, s_fast, s_slow,
             CASE WHEN {_SMA_SLOW} * s_fast > {_SMA_FAST} * s_slow THEN 1
                  WHEN {_SMA_SLOW} * s_fast < {_SMA_FAST} * s_slow THEN -1
                  ELSE 0 END AS pos,
             rn
      FROM sma WHERE rn >= {_SMA_SLOW}
    ),
    x AS (
      SELECT d, cents, s_fast, s_slow, pos,
             lag(pos) OVER (ORDER BY d) AS prev_pos
      FROM sig
    )
    SELECT d AS day,
           round(CAST(s_fast AS DOUBLE) / {_SMA_FAST} / 100, 6) AS sma_fast,
           round(CAST(s_slow AS DOUBLE) / {_SMA_SLOW} / 100, 6) AS sma_slow,
           CASE WHEN pos = 1 THEN 'golden' ELSE 'death' END AS crossover
    FROM x
    WHERE prev_pos IS NOT NULL AND pos <> prev_pos AND pos <> 0
    ORDER BY day
    """,
    doc="Moving-average crossover detection (SMA-3 vs SMA-7 of daily "
    "spend): emit the days where the fast average crosses the slow one "
    "— golden cross up, death cross down — the canonical trend-change "
    "alert shape (trading signals, traffic trend flips, capacity "
    "alerts). Exactness: the comparison never forms a float mean — "
    "slow_n*sum_fast vs fast_n*sum_slow is integer cross-"
    "multiplication of exact cent window sums, so the signal (and its "
    "lag) is pure integer logic; the reported SMAs are single rounded "
    "divisions. Warm-up rows (rn < slow window) are excluded so every "
    "window is full. Scale: the window runs on the DAILY rollup "
    "(calendar-bounded, one partition of ~tens of rows after a "
    "combinable corpus rollup) — the pattern for any per-entity "
    "variant is the same window partitioned by entity. Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_sma_crossover(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    # BOUNDED global window: runs over the CALENDAR-day rollup (≤366
    # rows/year at any corpus size — SCALE.md §global-windows).
    w = Window.orderBy("d")
    sma = daily.select(
        "d",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(w.rowsBetween(-(_SMA_FAST - 1), 0))
        .cast("long")
        .alias("s_fast"),
        F.sum("cents").over(w.rowsBetween(-(_SMA_SLOW - 1), 0))
        .cast("long")
        .alias("s_slow"),
    )
    sig = sma.filter(F.col("rn") >= _SMA_SLOW).select(
        "d",
        "s_fast",
        "s_slow",
        F.when(_SMA_SLOW * F.col("s_fast") > _SMA_FAST * F.col("s_slow"), 1)
        .when(_SMA_SLOW * F.col("s_fast") < _SMA_FAST * F.col("s_slow"), -1)
        .otherwise(0)
        .alias("pos"),
    )
    x = sig.select(
        # calendar-bounded global lag (same daily grid as above)
        "d", "s_fast", "s_slow", "pos", F.lag("pos").over(Window.orderBy("d")).alias("prev_pos")
    )
    return (
        x.filter(
            F.col("prev_pos").isNotNull()
            & (F.col("pos") != F.col("prev_pos"))
            & (F.col("pos") != 0)
        )
        .select(
            F.col("d").alias("day"),
            F.round(F.col("s_fast").cast("double") / _SMA_FAST / 100, 6).alias(
                "sma_fast"
            ),
            F.round(F.col("s_slow").cast("double") / _SMA_SLOW / 100, 6).alias(
                "sma_slow"
            ),
            F.when(F.col("pos") == 1, "golden").otherwise("death").alias("crossover"),
        )
        .orderBy("day")
    )


@register(
    "q_events_new_vs_returning",
    family="pipeline",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    firsts AS (SELECT user_id, min(day) AS first_day FROM activity GROUP BY user_id)
    SELECT a.day,
           CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END)
             AS BIGINT) AS n_returning,
           round(CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*), 6) AS new_share
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY a.day ORDER BY a.day
    """,
    doc="Daily active users decomposed into NEW vs RETURNING (growth "
    "accounting): each active (user, day) is classified by whether "
    "the day is that user's first-ever active day — the DAU "
    "decomposition every growth dashboard leads with, complementary "
    "to q_events_retention's cohort triangle and "
    "q_events_stickiness's DAU/MAU ratio. Exactness: all integer "
    "counts, one rounded share division; first-day is a combinable "
    "min. Scale: one distinct-activity rollup (combinable), one "
    "per-user min, one join co-partitioned on user_id, one "
    "calendar-bounded day rollup — no window anywhere. Ref: no "
    "reference counterpart — product-analytics tier.",
)
def q_events_new_vs_returning(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    activity = activity.localCheckpoint(eager=False)  # firsts + join read it
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = activity.join(firsts, "user_id")
    new_f = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        j.groupBy("day")
        .agg(
            F.sum(new_f).cast("long").alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
            F.round(F.sum(new_f).cast("double") / F.count(F.lit(1)), 6).alias(
                "new_share"
            ),
        )
        .orderBy("day")
    )


@register(
    "q_events_heatmap_dow_hour",
    family="pipeline",
    oracle="""
    WITH cells AS (
      SELECT extract(dow FROM ts) AS dow, extract(hour FROM ts) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(count(*) AS BIGINT) AS k FROM cells)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr, n,
           round(CAST(cents AS DOUBLE) / n / 100, 6) AS avg_value,
           round(n * 1.0 * t.k / t.tn, 6) AS traffic_index
    FROM cells CROSS JOIN tot t
    ORDER BY dow, hr
    """,
    doc="Activity heatmap over (day-of-week x hour): event count, "
    "average value and traffic index per cell (index 1.0 = uniform "
    "across observed cells, the q_timeseries_dow_index convention "
    "extended to the 168-cell week) — the when-are-users-here matrix "
    "behind staffing, batch-window placement and anomaly baselines. "
    "Exactness: integer counts and exact cent sums; the index is a "
    "cross-multiplied rational (n*k/tn, never an intermediate float "
    "mean); dow via extract == Spark dayofweek-1. Scale: one "
    "map-side-combinable rollup to <=168 cells; everything after is "
    "arithmetic on the bounded table. Ref: no reference counterpart "
    "— product-analytics tier.",
)
def q_events_heatmap_dow_hour(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).alias("dow"), F.hour("ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "cents"
        ),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("tn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return (
        cells.join(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hr").cast("long").alias("hr"),
            "n",
            F.round(F.col("cents").cast("double") / F.col("n") / 100, 6).alias(
                "avg_value"
            ),
            F.round(F.col("n") * 1.0 * F.col("k") / F.col("tn"), 6).alias(
                "traffic_index"
            ),
        )
        .orderBy("dow", "hr")
    )


@register(
    "q_timeseries_wow",
    family="timeseries",
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, week, n, cents,
             lag(n)     OVER w AS prev_n,
             lag(cents) OVER w AS prev_cents
      FROM weekly
      WINDOW w AS (PARTITION BY event_type ORDER BY week)
    )
    SELECT event_type, week, n,
           round(CAST(cents AS DOUBLE) / 100, 2) AS value_total,
           round(CAST(n - prev_n AS DOUBLE) / nullif(prev_n, 0), 6) + 0.0
             AS wow_count_growth,
           round(CAST(cents - prev_cents AS DOUBLE) / nullif(prev_cents, 0), 6)
             + 0.0 AS wow_value_growth
    FROM x WHERE prev_n IS NOT NULL
    ORDER BY event_type, week
    """,
    doc="Week-over-week growth per event type (count and value): the "
    "default KPI delta every weekly business review reads, and the "
    "coarse companion to q_timeseries_ewma/seasonal (WoW deliberately "
    "ignores within-week shape; the dow/heatmap indexes handle that). "
    "Weeks are ISO Monday-truncated — Spark date_trunc('week') == "
    "DuckDB date_trunc('week'). Exactness: integer counts and exact "
    "cent sums; each growth rate is ONE rounded division of exact "
    "integer deltas with a nullif zero-base guard on both engines. "
    "Scale: one map-side-combinable (type, week) rollup; the lag "
    "window runs on the calendar-bounded weekly table. Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_wow(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "cents"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    x = weekly.select(
        "event_type",
        "week",
        "n",
        "cents",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("cents").over(w).alias("prev_cents"),
    )
    return (
        x.filter(F.col("prev_n").isNotNull())
        .select(
            "event_type",
            "week",
            "n",
            F.round(F.col("cents").cast("double") / 100, 2).alias("value_total"),
            (
                F.round(
                    (F.col("n") - F.col("prev_n")).cast("double")
                    / F.nullif(F.col("prev_n"), F.lit(0)),
                    6,
                )
                + 0.0
            ).alias("wow_count_growth"),
            (
                F.round(
                    (F.col("cents") - F.col("prev_cents")).cast("double")
                    / F.nullif(F.col("prev_cents"), F.lit(0)),
                    6,
                )
                + 0.0
            ).alias("wow_value_growth"),
        )
        .orderBy("event_type", "week")
    )


@register(
    "q_timeseries_mann_kendall",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    s AS (
      SELECT a.et,
             CAST(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b ON a.et = b.et AND a.d < b.d
      GROUP BY a.et
    ),
    ties AS (
      SELECT et, CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie18
      FROM (SELECT et, c, CAST(count(*) AS BIGINT) AS tc
            FROM daily GROUP BY et, c)
      GROUP BY et
    ),
    nd AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY et)
    SELECT nd.et AS event_type, nd.n AS n_days, s.s_stat,
           CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie18 AS BIGINT)
             AS var18,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1.0) ELSE
                      CASE WHEN s.s_stat < 0 THEN (s.s_stat + 1.0)
                           ELSE 0.0 END END
                 / sqrt((nd.n * (nd.n - 1.0) * (2 * nd.n + 5) - ties.tie18)
                        / 18.0), 6) + 0.0 AS z_score,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM nd JOIN s ON s.et = nd.et JOIN ties ON ties.et = nd.et
    ORDER BY event_type
    """,
    doc="Mann-Kendall trend test per event type on the daily-count "
    "series — the nonparametric is-volume-trending gate (no "
    "normality or linearity assumption; robust to outlier days), "
    "with the tie-corrected variance and the ±1 continuity "
    "correction. Exactness: S and the tie term Σt(t-1)(2t+5) are "
    "exact integers from the CALENDAR-BOUNDED daily rollup (≤366 "
    "days/type regardless of corpus size, so the O(days²) pair "
    "self-join is ≤67k tiny rows per type — never O(rows²)); var18 "
    "is emitted as the exact integer 18·Var(S); z is one float "
    "expression of exact ints. Scale: one combinable daily rollup "
    "over the fact, then arithmetic on the grid. Ref: no reference "
    "counterpart — timeseries tier.",
)
def q_timeseries_mann_kendall(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # 3 consumers below
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("a.et") == F.col("b.et")) & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.et").alias("et"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("et", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy("et")
        .agg(
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            ).cast("long").alias("tie18")
        )
    )
    nd = daily.groupBy("et").agg(F.count(F.lit(1)).cast("long").alias("n"))
    var18_f = (
        F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5) - F.col("tie18")
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1.0))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1.0))
        .otherwise(F.lit(0.0))
    ) / F.sqrt(var18_f)
    return (
        nd.join(s, "et")
        .join(ties, "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("n").alias("n_days"),
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie18")
            ).cast("long").alias("var18"),
            (F.round(z, 6) + 0.0).alias("z_score"),
            F.when(F.col("s_stat") > 0, F.lit("increasing"))
            .when(F.col("s_stat") < 0, F.lit("decreasing"))
            .otherwise(F.lit("no trend"))
            .alias("trend"),
        )
        .orderBy("event_type")
    )


@register(
    "q_timeseries_bollinger",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY et, d
    ),
    w AS (
      SELECT et, d, sv,
             CAST(count(*) OVER fr AS BIGINT) AS nw,
             CAST(sum(sv) OVER fr AS BIGINT) AS sw,
             CAST(sum(CAST(sv AS HUGEINT) * sv) OVER fr AS DOUBLE) AS ssw
      FROM daily
      WINDOW fr AS (PARTITION BY et ORDER BY d
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT et AS event_type, d AS day,
           round(sv / 1e4, 6) + 0.0 AS daily_value,
           round(CAST(sw AS DOUBLE) / nw / 1e4, 6) + 0.0 AS ma7,
           round(sqrt(greatest(
             ssw / nw - (CAST(sw AS DOUBLE) / nw) * (CAST(sw AS DOUBLE) / nw),
             0.0)) / 1e4, 6) + 0.0 AS sigma7,
           CASE WHEN sv * 1.0 > CAST(sw AS DOUBLE) / nw
                     + 2 * sqrt(greatest(ssw / nw
                       - (CAST(sw AS DOUBLE)/nw) * (CAST(sw AS DOUBLE)/nw),
                       0.0)) THEN 'above'
                WHEN sv * 1.0 < CAST(sw AS DOUBLE) / nw
                     - 2 * sqrt(greatest(ssw / nw
                       - (CAST(sw AS DOUBLE)/nw) * (CAST(sw AS DOUBLE)/nw),
                       0.0)) THEN 'below'
                ELSE 'inside' END AS band
    FROM w WHERE nw = 7
    ORDER BY event_type, day
    """,
    doc="Bollinger bands (7-day rolling mean ± 2σ) on daily value per "
    "event type, with the above/inside/below band flag — the "
    "volatility-normalized is-today-unusual check that q_events_"
    "anomaly's fixed-threshold variant can't give. Exactness: daily "
    "sums are exact 1e4-quantized ints; rolling mean and σ are float "
    "expressions of exact window sums (Σ, Σ² — the square in DECIMAL/"
    "HUGEINT) over a ROWS frame whose order key (et, day) is unique, "
    "so both engines see identical frames; only full 7-day windows "
    "emit (partial-frame rows differ in no way worth modeling). "
    "Scale: the window runs on the CALENDAR-BOUNDED daily rollup "
    "(≤366 rows/type at any corpus size), never the fact; one "
    "combinable rollup pass is the only fact-sized work. Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_bollinger(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv"))
    fr = (
        Window.partitionBy("et").orderBy("d").rowsBetween(-6, Window.currentRow)
    )
    dec = "decimal(38,0)"
    w = daily.select(
        "et",
        "d",
        "sv",
        F.count(F.lit(1)).over(fr).cast("long").alias("nw"),
        F.sum("sv").over(fr).cast("long").alias("sw"),
        F.sum(F.col("sv").cast(dec) * F.col("sv").cast(dec)).over(fr)
        .cast("double").alias("ssw"),
    )
    mean = F.col("sw").cast("double") / F.col("nw")
    sig = F.sqrt(
        F.greatest(F.col("ssw") / F.col("nw") - mean * mean, F.lit(0.0))
    )
    return (
        w.filter(F.col("nw") == 7)
        .select(
            F.col("et").alias("event_type"),
            F.col("d").alias("day"),
            (F.round(F.col("sv") / 1e4, 6) + 0.0).alias("daily_value"),
            (F.round(mean / 1e4, 6) + 0.0).alias("ma7"),
            (F.round(sig / 1e4, 6) + 0.0).alias("sigma7"),
            F.when(F.col("sv") * 1.0 > mean + 2 * sig, F.lit("above"))
            .when(F.col("sv") * 1.0 < mean - 2 * sig, F.lit("below"))
            .otherwise(F.lit("inside"))
            .alias("band"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_timeseries_rsi",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY et, d
    ),
    delta AS (
      SELECT et, d,
             sv - lag(sv) OVER (PARTITION BY et ORDER BY d) AS ch
      FROM daily
    ),
    gl AS (
      SELECT et, d,
             CAST(greatest(ch, 0) AS BIGINT) AS gain,
             CAST(greatest(-ch, 0) AS BIGINT) AS loss
      FROM delta WHERE ch IS NOT NULL
    ),
    w AS (
      SELECT et, d,
             CAST(count(*) OVER fr AS BIGINT) AS nw,
             CAST(sum(gain) OVER fr AS BIGINT) AS ag,
             CAST(sum(loss) OVER fr AS BIGINT) AS al
      FROM gl
      WINDOW fr AS (PARTITION BY et ORDER BY d
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT et AS event_type, d AS day,
           round(100.0 * ag / nullif(ag + al, 0), 6) + 0.0 AS rsi14
    FROM w WHERE nw = 14
    ORDER BY event_type, day
    """,
    doc="RSI-14 (Cutler's simple-average variant — SMA of gains/losses, "
    "the window-expressible form; Wilder's EMA recursion is "
    "q_timeseries_ewma's territory) on daily value per event type — "
    "the bounded-[0,100] momentum oscillator. Exactness: day-over-day "
    "deltas of exact 1e4-quantized daily sums are exact ints; gains/"
    "losses exact; the 14-row frame sums are exact ints; RSI = "
    "100·ag/(ag+al) is ONE float division with a nullif zero guard "
    "(algebraically identical to 100−100/(1+RS) without the "
    "divide-by-zero-loss hole). Scale: lag + frame windows run on the "
    "calendar-bounded daily rollup (≤366 rows/type), one combinable "
    "fact pass. Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_rsi(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv"))
    lagw = Window.partitionBy("et").orderBy("d")
    delta = daily.select(
        "et", "d", (F.col("sv") - F.lag("sv").over(lagw)).alias("ch")
    ).filter(F.col("ch").isNotNull())
    gl = delta.select(
        "et",
        "d",
        F.greatest(F.col("ch"), F.lit(0)).cast("long").alias("gain"),
        F.greatest(-F.col("ch"), F.lit(0)).cast("long").alias("loss"),
    )
    fr = (
        Window.partitionBy("et").orderBy("d").rowsBetween(-13, Window.currentRow)
    )
    w = gl.select(
        "et",
        "d",
        F.count(F.lit(1)).over(fr).cast("long").alias("nw"),
        F.sum("gain").over(fr).cast("long").alias("ag"),
        F.sum("loss").over(fr).cast("long").alias("al"),
    )
    return (
        w.filter(F.col("nw") == 14)
        .select(
            F.col("et").alias("event_type"),
            F.col("d").alias("day"),
            (
                F.round(
                    100.0 * F.col("ag") / F.nullif(
                        (F.col("ag") + F.col("al")).cast("double"), F.lit(0.0)
                    ),
                    6,
                )
                + 0.0
            ).alias("rsi14"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_events_cuped",
    family="events",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 1e4) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS pre_q,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 1e4) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS post_q
      FROM events GROUP BY user_id
    ),
    theta_stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_q) AS BIGINT) AS sx,
             CAST(sum(post_q) AS BIGINT) AS sy,
             sum(CAST(pre_q AS HUGEINT) * pre_q) AS sxx,
             sum(CAST(pre_q AS HUGEINT) * post_q) AS sxy
      FROM per_user
    ),
    th AS (
      SELECT n, sx, sy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
             / nullif(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n, 0)
               AS theta,
             CAST(sx AS DOUBLE) / n AS pre_mean
      FROM theta_stats
    ),
    adj AS (
      SELECT u.variant,
             u.post_q,
             CAST(round(
               (u.post_q - t.theta * (u.pre_q - t.pre_mean)) / 1e4 * 1e6
             ) AS BIGINT) AS adj_q
      FROM per_user u CROSS JOIN th t
    ),
    v AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(post_q) AS BIGINT) AS post_sum,
             -- adj_q carries a 1e6 quantization on top of value units:
             -- its sum passes 2^63 near ~1e9 users — HUGEINT accumulator
             sum(CAST(adj_q AS HUGEINT)) AS adj_sum,
             sum(CAST(post_q AS HUGEINT) * post_q) AS post_ss,
             sum(CAST(adj_q AS HUGEINT) * adj_q) AS adj_ss
      FROM adj GROUP BY variant
    )
    SELECT variant, n_users,
           round(CAST(post_sum AS DOUBLE) / n_users / 1e4, 6) + 0.0
             AS mean_post,
           round(CAST(adj_sum AS DOUBLE) / n_users / 1e6, 6) + 0.0
             AS mean_cuped,
           round(1.0 -
             (CAST(adj_ss AS DOUBLE) / n_users
               - (CAST(adj_sum AS DOUBLE)/n_users) * (CAST(adj_sum AS DOUBLE)/n_users))
             / 1e4
             / nullif(CAST(post_ss AS DOUBLE) / n_users
               - (CAST(post_sum AS DOUBLE)/n_users) * (CAST(post_sum AS DOUBLE)/n_users), 0)
             , 6) + 0.0 AS var_reduction
    FROM v ORDER BY variant
    """,
    doc="CUPED variance reduction (Deng et al. 2013 — the standard "
    "pre-experiment-covariate adjustment every A/B platform applies "
    "before reading a metric): adjusted = post − θ·(pre − pre_mean) "
    "with θ = cov(pre,post)/var(pre) fitted on ALL users, pre/post "
    "split at the experiment midpoint and variant = user_id % 2 (the "
    "deterministic stand-in for q_events_ab_assign's hash bucket). "
    "Reports per-variant raw vs CUPED means and the achieved "
    "variance-reduction fraction — the query that tells you how much "
    "sample size the covariate just bought. Exactness: per-user "
    "pre/post sums are exact 1e4-quantized ints; θ's sufficient "
    "stats are exact (quadratics in HUGEINT/DECIMAL); each user's "
    "adjusted value is ONE float expression quantized 1e6 before the "
    "per-variant sums (order-insensitive); var_reduction's /1e4 "
    "rescales the quantized-adj variance back to post units². Scale: "
    "one combinable per-user agg over the fact, one 1-row θ "
    "broadcast, one per-variant rollup — three tiny stages after the "
    "single fact pass. Ref: no reference counterpart — "
    "experimentation tier.",
)
def q_events_cuped(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    vq = F.round(F.col("value") * 1e4).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, vq).otherwise(F.lit(0)))
        .cast("long").alias("pre_q"),
        F.sum(F.when(F.col("ts") >= cut, vq).otherwise(F.lit(0)))
        .cast("long").alias("post_q"),
    ).select(
        (F.col("user_id") % 2).alias("variant"), "pre_q", "post_q"
    )
    per_user = per_user.localCheckpoint(eager=False)  # theta + adj share it
    dec = "decimal(38,0)"
    ts_ = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre_q").cast("long").alias("sx"),
        F.sum("post_q").cast("long").alias("sy"),
        F.sum(F.col("pre_q").cast(dec) * F.col("pre_q").cast(dec)).alias("sxx"),
        F.sum(F.col("pre_q").cast(dec) * F.col("post_q").cast(dec)).alias("sxy"),
    )
    th = ts_.select(
        (
            (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
            / F.nullif(
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n"),
                F.lit(0.0),
            )
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("pre_mean"),
    )
    adj = per_user.join(F.broadcast(th)).select(
        "variant",
        "post_q",
        F.round(
            (F.col("post_q") - F.col("theta") * (F.col("pre_q") - F.col("pre_mean")))
            / 1e4
            * 1e6
        ).cast("long").alias("adj_q"),
    )
    v = adj.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("post_q").cast("long").alias("post_sum"),
        # 1e6-quantized terms: DECIMAL accumulator (overflows LONG ~1e9 users)
        F.sum(F.col("adj_q").cast(dec)).alias("adj_sum"),
        F.sum(F.col("post_q").cast(dec) * F.col("post_q").cast(dec)).alias("post_ss"),
        F.sum(F.col("adj_q").cast(dec) * F.col("adj_q").cast(dec)).alias("adj_ss"),
    )
    mean_adj = F.col("adj_sum").cast("double") / F.col("n_users")
    mean_post_q = F.col("post_sum").cast("double") / F.col("n_users")
    var_adj = F.col("adj_ss").cast("double") / F.col("n_users") - mean_adj * mean_adj
    var_post = (
        F.col("post_ss").cast("double") / F.col("n_users")
        - mean_post_q * mean_post_q
    )
    return v.select(
        "variant",
        "n_users",
        (F.round(mean_post_q / 1e4, 6) + 0.0).alias("mean_post"),
        (F.round(mean_adj / 1e6, 6) + 0.0).alias("mean_cuped"),
        (
            F.round(
                1.0 - var_adj / 1e4 / F.nullif(var_post, F.lit(0.0)), 6
            )
            + 0.0
        ).alias("var_reduction"),
    ).orderBy("variant")


_MSPRT_TAU2 = 0.0001  # mixture variance tau^2 (tau = 0.01 on proportions)
_MSPRT_ALPHA = 0.05


@register(
    "q_events_sequential_msprt",
    family="events",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n1,
             CAST(count(*) FILTER (user_id % 2 = 0
                  AND event_type = 'purchase') AS BIGINT) AS c0,
             CAST(count(*) FILTER (user_id % 2 = 1
                  AND event_type = 'purchase') AS BIGINT) AS c1
      FROM events GROUP BY d
    ),
    cum AS (
      SELECT d,
             CAST(sum(n0) OVER w AS BIGINT) AS n0,
             CAST(sum(n1) OVER w AS BIGINT) AS n1,
             CAST(sum(c0) OVER w AS BIGINT) AS c0,
             CAST(sum(c1) OVER w AS BIGINT) AS c1
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    lam AS (
      SELECT d, n0, n1, c0, c1,
             CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0 AS delta,
             ((CAST(c0+c1 AS DOUBLE)/(n0+n1))
              * (1.0 - CAST(c0+c1 AS DOUBLE)/(n0+n1))
              * (1.0/n0 + 1.0/n1)) AS v
      FROM cum WHERE n0 > 0 AND n1 > 0
    ),
    lam2 AS (
      SELECT d, n0, n1, delta, v,
             sqrt(v / (v + {_MSPRT_TAU2}))
             * exp(delta * delta * {_MSPRT_TAU2}
                   / (2.0 * v * (v + {_MSPRT_TAU2}))) AS lambda
      FROM lam
    ),
    pv AS (
      SELECT d, n0, n1, delta, lambda,
             max(lambda) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS lam_max
      FROM lam2
    )
    SELECT d AS day, n0, n1,
           round(delta, 6) + 0.0 AS delta,
           round(lambda, 6) + 0.0 AS lambda,
           round(least(1.0, 1.0 / lam_max), 6) + 0.0 AS p_always_valid,
           CAST(1.0 / lam_max < {_MSPRT_ALPHA} AS BOOLEAN) AS rejected
    FROM pv ORDER BY day
    """,
    doc="Always-valid sequential test (mixture SPRT, Johari et al. "
    "2017) on the running purchase-rate difference between the two "
    "user_id%2 variants — the peek-as-often-as-you-like inference "
    "every modern A/B platform runs instead of a fixed-horizon z "
    "test: Λ_t from the normal-mixture likelihood ratio (τ=0.01), "
    "always-valid p_t = min(1, 1/max_{{s<=t}} Λ_s), monotone "
    "non-increasing by construction (the running max window). "
    "Exactness: daily and cumulative counts are exact ints; Λ and p "
    "are float expressions of exact ints computed IDENTICALLY both "
    "engines; the cumulative and running-max windows run on the "
    "CALENDAR-BOUNDED daily grid (≤366 rows — SCALE.md global-window "
    "ledger). Scale: one combinable daily conditional-count pass "
    "over the fact; everything after is arithmetic on the grid. "
    "Ref: no reference counterpart — experimentation tier.",
)
def q_events_sequential_msprt(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    is0 = F.col("user_id") % 2 == 0
    isp = F.col("event_type") == "purchase"
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.when(is0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(~is0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(is0 & isp, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when((~is0) & isp, 1).otherwise(0)).cast("long").alias("c1"),
    )
    # calendar-bounded global windows (SCALE.md ledger: ≤366 day rows)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("n0").over(w).cast("long").alias("n0"),
        F.sum("n1").over(w).cast("long").alias("n1"),
        F.sum("c0").over(w).cast("long").alias("c0"),
        F.sum("c1").over(w).cast("long").alias("c1"),
    ).filter((F.col("n0") > 0) & (F.col("n1") > 0))
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    v = pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    delta = F.col("c1").cast("double") / F.col("n1") - F.col("c0").cast(
        "double"
    ) / F.col("n0")
    lam2 = cum.select(
        "d",
        "n0",
        "n1",
        delta.alias("delta"),
        (
            F.sqrt(v / (v + _MSPRT_TAU2))
            * F.exp(delta * delta * _MSPRT_TAU2 / (2.0 * v * (v + _MSPRT_TAU2)))
        ).alias("lambda"),
    )
    pv = lam2.select(
        "*", F.max("lambda").over(w).alias("lam_max")
    )
    return pv.select(
        F.col("d").alias("day"),
        "n0",
        "n1",
        (F.round(F.col("delta"), 6) + 0.0).alias("delta"),
        (F.round(F.col("lambda"), 6) + 0.0).alias("lambda"),
        (
            F.round(F.least(F.lit(1.0), 1.0 / F.col("lam_max")), 6) + 0.0
        ).alias("p_always_valid"),
        (1.0 / F.col("lam_max") < _MSPRT_ALPHA).alias("rejected"),
    ).orderBy("day")


@register(
    "q_profile_freshness",
    family="events",
    oracle="""
    WITH g AS (SELECT max(ts) AS gmax FROM events),
    f AS (
      SELECT e.event_type,
             CAST(count(*) AS BIGINT) AS n,
             max(e.ts) AS last_ts,
             CAST(count(*) FILTER (
               epoch_us(g.gmax) - epoch_us(e.ts) < 86400000000
             ) AS BIGINT) AS n_last_day
      FROM events e CROSS JOIN g
      GROUP BY e.event_type
    )
    SELECT f.event_type, f.n, f.last_ts,
           CAST((epoch_us(g.gmax) - epoch_us(f.last_ts)) // 60000000
             AS BIGINT) AS lag_minutes,
           round(CAST(f.n_last_day AS DOUBLE) / f.n, 6) + 0.0
             AS share_last_day,
           CAST((epoch_us(g.gmax) - epoch_us(f.last_ts)) // 60000000 > 60
             AS BOOLEAN) AS stale
    FROM f CROSS JOIN g
    ORDER BY event_type
    """,
    doc="Data-freshness audit per feed (event type): last-arrival lag "
    "vs the newest row anywhere, last-24h volume share, and a "
    ">60-minute staleness flag — the is-the-pipeline-alive table an "
    "ingest SLO dashboard reads (the operational companion to the "
    "sync engine's checkpoint lag, surfaced as a lake query). "
    "Exactness: lags are exact integer microsecond differences "
    "(epoch_us both engines) floor-divided to minutes; counts exact; "
    "one share division. Scale: one conditional-count pass over the "
    "fact with a 1-row global-max broadcast — the same "
    "two-aggregate shape as every threshold query here. Ref: "
    "reference tracks per-sync lastUpdated in checkpoints "
    "(docs/design.md:302-328) — this is the analytics-side twin. "
    "Experimentation/ops tier.",
)
def q_profile_freshness(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("gmax"))
    # ntz→ltz cast before unix_micros: both sides shift identically, so
    # the DIFFERENCE is timezone-invariant (and matches epoch_us diffs)
    lag_us = F.unix_micros(F.col("gmax").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    f = (
        ev.join(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("ts").alias("last_ts"),
            F.sum(F.when(lag_us < 86400000000, 1).otherwise(0))
            .cast("long").alias("n_last_day"),
        )
    )
    last_lag_min = F.expr(
        "(unix_micros(CAST(gmax AS TIMESTAMP))"
        " - unix_micros(CAST(last_ts AS TIMESTAMP))) div 60000000"
    )
    return (
        f.join(F.broadcast(g))
        .select(
            "event_type",
            "n",
            "last_ts",
            last_lag_min.cast("long").alias("lag_minutes"),
            (
                F.round(F.col("n_last_day").cast("double") / F.col("n"), 6)
                + 0.0
            ).alias("share_last_day"),
            (last_lag_min > 60).alias("stale"),
        )
        .orderBy("event_type")
    )


@register(
    "q_profile_eval_slices",
    family="corpus",
    oracle="""
    WITH cells AS (
      SELECT lang, source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
               AS BIGINT) AS tokens
      FROM documents GROUP BY lang, source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM cells
    )
    SELECT c.lang, c.source, c.n_docs, c.tokens,
           round(CAST(c.n_docs AS DOUBLE) / t.nt, 6) + 0.0 AS share,
           -- under-represented iff share < 0.5/n_cells, compared as the
           -- exact integer cross-multiplication 2*n*cells < total
           CAST(2 * c.n_docs * t.n_cells < t.nt AS BOOLEAN)
             AS under_represented
    FROM cells c CROSS JOIN tot t
    ORDER BY lang, source
    """,
    doc="Eval-slice coverage audit over the (lang × source) grid: doc "
    "and token mass per slice, share of corpus, and an "
    "under-representation flag at half the uniform target — the "
    "check-your-slices table every eval harness needs before "
    "reporting per-slice metrics (a slice with 12 docs isn't a "
    "metric, it's noise), and the input to q_mix_domains-style "
    "rebalancing. Exactness: counts and token sums exact ints; the "
    "threshold is an exact integer cross-multiplication (2·n·cells < "
    "total — no float fraction); one share division for display. "
    "Scale: one combinable grid agg (|langs|×|sources| cells) + a "
    "1-row totals broadcast. Ref: no reference counterpart — corpus "
    "tier.",
)
def q_profile_eval_slices(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).cast("long").alias(
            "tokens"
        ),
    )
    cells = cells.localCheckpoint(eager=False)  # tot + output share it
    tot = cells.agg(
        F.sum("n_docs").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return (
        cells.join(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            "tokens",
            (
                F.round(F.col("n_docs").cast("double") / F.col("nt"), 6) + 0.0
            ).alias("share"),
            (2 * F.col("n_docs") * F.col("n_cells") < F.col("nt")).alias(
                "under_represented"
            ),
        )
        .orderBy("lang", "source")
    )


_HURST_KS = (5, 10, 15, 30)


@register(
    "q_timeseries_hurst",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv,
             CAST(row_number() OVER (ORDER BY date_trunc('day', ts)) - 1
               AS BIGINT) AS idx
      FROM events GROUP BY d
    ),
    ks AS (SELECT unnest(ARRAY{list(_HURST_KS)}) AS k),
    blocks AS (
      SELECT k.k, daily.idx // k.k AS blk, daily.idx, daily.sv
      FROM daily CROSS JOIN ks k
    ),
    bstat AS (
      SELECT k, blk, idx, sv,
             CAST(count(*) OVER pb AS BIGINT) AS bn,
             CAST(sum(sv) OVER pb AS BIGINT) AS bs,
             CAST(sum(CAST(sv AS HUGEINT) * sv) OVER pb AS DOUBLE) AS bss,
             CAST(sum(sv) OVER (PARTITION BY k, blk ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM blocks
      WINDOW pb AS (PARTITION BY k, blk)
    ),
    devrows AS (
      -- cumulative deviation from the block mean at step t:
      -- cum_t - pos*mean == exact rational: scale by bn to stay integer
      -- (dev_scaled = cum_t*bn - pos*bs); materialized in its own CTE
      -- because a window cannot nest inside another window's argument
      SELECT k, blk, bn, bs, bss,
             cum * bn - (row_number() OVER (PARTITION BY k, blk
                 ORDER BY idx)) * bs AS dev_scaled
      FROM bstat WHERE bn = k
    ),
    devs AS (
      SELECT k, blk, bn, bs, bss,
             max(dev_scaled) OVER (PARTITION BY k, blk) AS dmax,
             min(dev_scaled) OVER (PARTITION BY k, blk) AS dmin
      FROM devrows
    ),
    rs AS (
      SELECT DISTINCT k, blk, bn, bs, bss, dmax, dmin,
             (CAST(dmax - dmin AS DOUBLE) / bn)
             / nullif(sqrt(bss / bn
                 - (CAST(bs AS DOUBLE)/bn) * (CAST(bs AS DOUBLE)/bn)), 0)
               AS rs_val
      FROM devs
    ),
    per_k AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(CAST(round(ln(rs_val) * 1e9) AS BIGINT)) AS BIGINT)
               AS qlrs
      FROM rs WHERE rs_val > 0 GROUP BY k
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             sum(ln(CAST(k AS DOUBLE))) AS sx,
             sum(ln(CAST(k AS DOUBLE)) * ln(CAST(k AS DOUBLE))) AS sxx,
             sum(qlrs * 1.0 / n_blocks / 1e9) AS sy,
             sum(ln(CAST(k AS DOUBLE)) * (qlrs * 1.0 / n_blocks / 1e9))
               AS sxy
      FROM per_k
    )
    SELECT m AS n_window_sizes,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) + 0.0
             AS hurst_exponent
    FROM ols
    """,
    doc="Hurst exponent via rescaled-range (R/S) analysis of the daily "
    "value series — the long-memory diagnostic (H≈0.5 random walk, "
    ">0.5 trending/persistent, <0.5 mean-reverting) that tells a "
    "forecasting pipeline whether q_timeseries_holt-style trend "
    "models are even applicable. Block R over each window size rides "
    "an EXACT integer trick: cumulative deviation from the block "
    "mean is (cum·n − pos·sum)/n, so max−min of the SCALED integer "
    "is exact and one division recovers R; S is the block σ from "
    "exact Σ,Σ²; ln(R/S) is quantized 1e9 before the per-k average "
    "and the final 4-point OLS slope. The 4-point ln-ln OLS sums are "
    "float but over a FIXED 4-row table — deterministic. Scale: one "
    "daily rollup pass; every window partitions by (k, block) over "
    "the calendar-bounded grid (SCALE.md ledger). Ref: no reference "
    "counterpart — timeseries tier.",
)
def q_timeseries_hurst(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    # calendar-bounded global window (≤366 rows — SCALE.md ledger)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv")
    ).select(
        "d", "sv",
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("idx"),
    )
    ks = spark.createDataFrame([(k,) for k in _HURST_KS], "k long")
    blocks = daily.crossJoin(F.broadcast(ks)).select(
        "k", F.expr("idx div k").alias("blk"), "idx", "sv"
    )
    pb = Window.partitionBy("k", "blk")
    pbo = pb.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    bstat = blocks.select(
        "k", "blk", "idx", "sv",
        F.count(F.lit(1)).over(pb).cast("long").alias("bn"),
        F.sum("sv").over(pb).cast("long").alias("bs"),
        F.sum(F.col("sv").cast(dec) * F.col("sv").cast(dec)).over(pb)
        .cast("double").alias("bss"),
        F.sum("sv").over(pbo).cast("long").alias("cum"),
    ).filter(F.col("bn") == F.col("k"))
    pos = F.row_number().over(pb.orderBy("idx"))
    devrows = bstat.select(
        "k", "blk", "bn", "bs", "bss",
        (F.col("cum") * F.col("bn") - pos * F.col("bs")).alias("dev_scaled"),
    )
    devs = devrows.select(
        "k", "blk", "bn", "bs", "bss",
        F.max("dev_scaled").over(pb).alias("dmax"),
        F.min("dev_scaled").over(pb).alias("dmin"),
    )
    mean = F.col("bs").cast("double") / F.col("bn")
    s_val = F.sqrt(F.col("bss") / F.col("bn") - mean * mean)
    rs = devs.distinct().select(
        "k",
        (
            ((F.col("dmax") - F.col("dmin")).cast("double") / F.col("bn"))
            / F.nullif(s_val, F.lit(0.0))
        ).alias("rs_val"),
    )
    per_k = (
        rs.filter(F.col("rs_val") > 0)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.round(F.log("rs_val") * 1e9).cast("long"))
            .cast("long").alias("qlrs"),
        )
    )
    lnk = F.log(F.col("k").cast("double"))
    y = F.col("qlrs") * 1.0 / F.col("n_blocks") / 1e9
    ols = per_k.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(lnk).alias("sx"),
        F.sum(lnk * lnk).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(lnk * y).alias("sxy"),
    )
    return ols.select(
        F.col("m").alias("n_window_sizes"),
        (
            F.round(
                (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            )
            + 0.0
        ).alias("hurst_exponent"),
    )


@register(
    "q_timeseries_changepoint",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY d
    ),
    cum AS (
      SELECT d, sv,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             CAST(sum(sv) OVER w AS BIGINT) AS cs,
             sum(CAST(sv AS HUGEINT) * sv) OVER w AS css,
             CAST(sum(sv) OVER () AS BIGINT) AS ts_,
             CAST(sum(CAST(sv AS HUGEINT) * sv) OVER () AS DOUBLE) AS tss,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    costs AS (
      -- split AFTER row i: SSE_left + SSE_right from exact prefix sums
      SELECT d, i, n, cs, ts_,
             (CAST(css AS DOUBLE) - CAST(cs AS DOUBLE) * cs / i)
             + ((tss - CAST(css AS DOUBLE))
                - CAST(ts_ - cs AS DOUBLE) * (ts_ - cs) / (n - i)) AS sse,
             tss - CAST(ts_ AS DOUBLE) * ts_ / n AS sse0
      FROM cum WHERE i >= 3 AND i <= n - 3
    ),
    best AS (
      SELECT *, row_number() OVER (ORDER BY sse, d) AS rn FROM costs
    )
    SELECT d AS split_day, i AS n_left, n - i AS n_right,
           round(CAST(cs AS DOUBLE) / i / 1e4, 6) + 0.0 AS mean_left,
           round(CAST(ts_ - cs AS DOUBLE) / (n - i) / 1e4, 6) + 0.0
             AS mean_right,
           round(1.0 - sse / nullif(sse0, 0), 6) + 0.0 AS sse_reduction
    FROM best WHERE rn = 1
    """,
    doc="Single changepoint detection by binary segmentation on the "
    "daily value series: the split minimizing SSE_left + SSE_right "
    "(equivalently maximizing between-segment variance) with a "
    "minimum segment length of 3 — the where-did-the-level-shift-"
    "happen answer that q_timeseries_cusum's threshold-crossing "
    "can't localize, and the first recursion step of full binseg/"
    "PELT. Exactness: every candidate cost comes from EXACT integer "
    "prefix sums (Σ, Σ² with the square in HUGEINT/DECIMAL) — the "
    "identical float expression per split on both engines; argmin "
    "via row_number with the day as tie-break (no float-equality "
    "join). Scale: one combinable daily rollup; the candidate scan "
    "is the calendar-bounded grid (≤366 splits — SCALE.md ledger). "
    "Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv")
    )
    dec = "decimal(38,0)"
    # calendar-bounded global windows (SCALE.md ledger)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sv2 = F.col("sv").cast(dec) * F.col("sv").cast(dec)
    cum = daily.select(
        "d",
        "sv",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("i"),
        F.sum("sv").over(w).cast("long").alias("cs"),
        F.sum(sv2).over(w).alias("css"),
        F.sum("sv").over(wall).cast("long").alias("ts_"),
        F.sum(sv2).over(wall).cast("double").alias("tss"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    )
    sse_l = F.col("css").cast("double") - F.col("cs").cast("double") * F.col(
        "cs"
    ) / F.col("i")
    rs = F.col("ts_") - F.col("cs")
    sse_r = (F.col("tss") - F.col("css").cast("double")) - rs.cast(
        "double"
    ) * rs / (F.col("n") - F.col("i"))
    costs = cum.filter(
        (F.col("i") >= 3) & (F.col("i") <= F.col("n") - 3)
    ).select(
        "d", "i", "n", "cs", "ts_",
        (sse_l + sse_r).alias("sse"),
        (
            F.col("tss") - F.col("ts_").cast("double") * F.col("ts_") / F.col("n")
        ).alias("sse0"),
    )
    best = costs.select(
        "*", F.row_number().over(Window.orderBy("sse", "d")).alias("rn")
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("d").alias("split_day"),
        F.col("i").alias("n_left"),
        (F.col("n") - F.col("i")).alias("n_right"),
        (
            F.round(F.col("cs").cast("double") / F.col("i") / 1e4, 6) + 0.0
        ).alias("mean_left"),
        (
            F.round(
                (F.col("ts_") - F.col("cs")).cast("double")
                / (F.col("n") - F.col("i"))
                / 1e4,
                6,
            )
            + 0.0
        ).alias("mean_right"),
        (
            F.round(
                1.0 - F.col("sse") / F.nullif(F.col("sse0"), F.lit(0.0)), 6
            )
            + 0.0
        ).alias("sse_reduction"),
    )


_EV_GAMMA = 0.5772156649015329  # Euler–Mascheroni, shared literal
_EV_SQRT6_PI = 0.7796968012336793  # sqrt(6)/pi, shared literal


@register(
    "q_timeseries_extreme_value",
    family="timeseries",
    oracle=f"""
    WITH dmax AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(max(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS mx
      FROM events GROUP BY d
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(mx) AS BIGINT) AS s,
             sum(CAST(mx AS HUGEINT) * mx) AS ss
      FROM dmax
    ),
    fit AS (
      SELECT n,
             CAST(s AS DOUBLE) / n / 1e4 AS mean_,
             sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (n - 1)) / 1e4 AS sd_
      FROM st
    )
    SELECT n AS n_blocks,
           round(sd_ * {_EV_SQRT6_PI}, 6) + 0.0 AS gumbel_beta,
           round(mean_ - {_EV_GAMMA} * sd_ * {_EV_SQRT6_PI}, 6) + 0.0
             AS gumbel_mu,
           round(mean_ - {_EV_GAMMA} * sd_ * {_EV_SQRT6_PI}
                 - sd_ * {_EV_SQRT6_PI} * ln(-ln(1.0 - 1.0/100)), 6) + 0.0
             AS return_level_100,
           round(mean_ - {_EV_GAMMA} * sd_ * {_EV_SQRT6_PI}
                 - sd_ * {_EV_SQRT6_PI} * ln(-ln(1.0 - 1.0/1000)), 6) + 0.0
             AS return_level_1000
    FROM fit
    """,
    doc="Extreme-value analysis: Gumbel fit (method of moments — β = "
    "σ√6/π, μ = x̄ − γβ) on daily block maxima of event value, with "
    "100-day and 1000-day return levels — the capacity-planning "
    "question ('what peak should we provision for?') answered from "
    "the tail law rather than an observed quantile, which cannot "
    "extrapolate beyond the data. Constants (Euler–Mascheroni γ, "
    "√6/π) are shared decimal literals on both engines. Exactness: "
    "block maxima and their Σ/Σ² are exact ints (Σ² HUGEINT/"
    "DECIMAL); the fit and return levels are one float expression "
    "each. Scale: one combinable daily-max rollup; the fit runs on "
    "a 1-row stats table. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_extreme_value(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dmax = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.max(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("mx")
    )
    dec = "decimal(38,0)"
    st = dmax.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx").cast(dec) * F.col("mx").cast(dec)).alias("ss"),
    )
    mean_ = F.col("s").cast("double") / F.col("n") / 1e4
    sd_ = (
        F.sqrt(
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        / 1e4
    )
    beta = sd_ * _EV_SQRT6_PI
    mu = mean_ - _EV_GAMMA * beta
    def rl(T):
        return mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / T)))
    return st.select(
        F.col("n").alias("n_blocks"),
        (F.round(beta, 6) + 0.0).alias("gumbel_beta"),
        (F.round(mu, 6) + 0.0).alias("gumbel_mu"),
        (F.round(rl(100), 6) + 0.0).alias("return_level_100"),
        (F.round(rl(1000), 6) + 0.0).alias("return_level_1000"),
    )


@register(
    "q_timeseries_stl_strength",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY d, dw
    ),
    tr AS (
      -- centered 7-day moving average = the trend component; only full
      -- windows (edges trimmed) so both engines see identical frames
      SELECT d, dw, sv,
             CAST(count(*) OVER fr AS BIGINT) AS nw,
             CAST(sum(sv) OVER fr AS BIGINT) AS sw
      FROM daily
      WINDOW fr AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT d, dw,
             CAST(round(sv - CAST(sw AS DOUBLE) / 7) AS BIGINT) AS detr
      FROM tr WHERE nw = 7
    ),
    seas AS (
      SELECT dw, CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(detr) AS BIGINT) AS ssum
      FROM det GROUP BY dw
    ),
    resid AS (
      SELECT de.d,
             de.detr,
             CAST(round(de.detr - CAST(s.ssum AS DOUBLE) / s.ns) AS BIGINT)
               AS res
      FROM det de JOIN seas s ON s.dw = de.dw
    ),
    var_ AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(detr) AS BIGINT) AS s_d,
             sum(CAST(detr AS HUGEINT) * detr) AS ss_d,
             CAST(sum(res) AS BIGINT) AS s_r,
             sum(CAST(res AS HUGEINT) * res) AS ss_r
      FROM resid
    )
    SELECT n AS n_days_used,
           round(greatest(0.0, 1.0 -
             (CAST(ss_r AS DOUBLE)/n - (CAST(s_r AS DOUBLE)/n)*(CAST(s_r AS DOUBLE)/n))
             / nullif(CAST(ss_d AS DOUBLE)/n
               - (CAST(s_d AS DOUBLE)/n)*(CAST(s_d AS DOUBLE)/n), 0)), 6)
             + 0.0 AS seasonal_strength
    FROM var_
    """,
    doc="Seasonal-strength measure (Hyndman & Athanasopoulos FPP: "
    "F_s = max(0, 1 − var(remainder)/var(detrended))) from an "
    "STL-lite decomposition — trend = centered 7-day MA, seasonal = "
    "day-of-week means of the detrended series, remainder = the "
    "rest: the one number that says whether dow-aware models "
    "(q_timeseries_seasonal/dow_index) are worth their complexity "
    "on this series. Exactness: the detrended and remainder series "
    "are re-quantized to ints at each subtraction (round of a "
    "deterministic float — identical both engines), so all variance "
    "sufficient stats are exact ints (Σ² HUGEINT/DECIMAL); F_s is "
    "one float expression. Scale: windows and grouped means on the "
    "calendar-bounded daily grid (SCALE.md ledger); one combinable "
    "rollup over the fact. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_stl_strength(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"),
        F.dayofweek("ts").cast("long").alias("dw"),
    ).agg(F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv"))
    # calendar-bounded global window (SCALE.md ledger)
    fr = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "dw", "sv",
        F.count(F.lit(1)).over(fr).cast("long").alias("nw"),
        F.sum("sv").over(fr).cast("long").alias("sw"),
    )
    det = tr.filter(F.col("nw") == 7).select(
        "d", "dw",
        F.round(F.col("sv") - F.col("sw").cast("double") / 7)
        .cast("long").alias("detr"),
    )
    det = det.localCheckpoint(eager=False)  # seas + resid share it
    seas = det.groupBy("dw").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("detr").cast("long").alias("ssum"),
    )
    resid = det.join(F.broadcast(seas), "dw").select(
        "d", "detr",
        F.round(F.col("detr") - F.col("ssum").cast("double") / F.col("ns"))
        .cast("long").alias("res"),
    )
    dec = "decimal(38,0)"
    var_ = resid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("detr").cast("long").alias("s_d"),
        F.sum(F.col("detr").cast(dec) * F.col("detr").cast(dec)).alias("ss_d"),
        F.sum("res").cast("long").alias("s_r"),
        F.sum(F.col("res").cast(dec) * F.col("res").cast(dec)).alias("ss_r"),
    )
    def v(ss, s):
        m = F.col(s).cast("double") / F.col("n")
        return F.col(ss).cast("double") / F.col("n") - m * m
    return var_.select(
        F.col("n").alias("n_days_used"),
        (
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0 - v("ss_r", "s_r") / F.nullif(v("ss_d", "s_d"), F.lit(0.0)),
                ),
                6,
            )
            + 0.0
        ).alias("seasonal_strength"),
    )


@register(
    "q_events_propensity_strata",
    family="events",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS treat,
             CAST(count(*) FILTER (ts < TIMESTAMP '2024-01-16') AS BIGINT)
               AS pre_n,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 1e4) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS post_q
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT treat, least(pre_n // 25, 3) AS stratum, post_q
      FROM per_user
    ),
    cell AS (
      SELECT stratum, treat,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(post_q) AS BIGINT) AS s,
             sum(CAST(post_q AS HUGEINT) * post_q) AS ss
      FROM strat GROUP BY stratum, treat
    ),
    eff AS (
      SELECT stratum,
        max(CASE WHEN treat = 0 THEN n END) AS n0,
        max(CASE WHEN treat = 1 THEN n END) AS n1,
        max(CASE WHEN treat = 1 THEN CAST(s AS DOUBLE)/n END)
          - max(CASE WHEN treat = 0 THEN CAST(s AS DOUBLE)/n END) AS effect,
        max(CASE WHEN treat = 0 THEN
          ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)/nullif(n-1, 0))/n END)
        + max(CASE WHEN treat = 1 THEN
          ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n)/nullif(n-1, 0))/n END)
          AS var_eff
      FROM cell GROUP BY stratum
    ),
    pool AS (
      SELECT CAST(sum(CAST(round(1e9 / var_eff) AS BIGINT)) AS BIGINT)
               AS qw,
             CAST(sum(CAST(round(effect / var_eff * 1e5) AS BIGINT))
               AS BIGINT) AS qwe
      FROM eff WHERE var_eff > 0
    )
    SELECT e.stratum, e.n0, e.n1,
           round(e.effect / 1e4, 6) + 0.0 AS effect,
           round(sqrt(e.var_eff) / 1e4, 6) + 0.0 AS se,
           round((p.qwe / 1e5) / nullif(p.qw / 1e9, 0) / 1e4, 6) + 0.0
             AS pooled_ate
    FROM eff e CROSS JOIN pool p
    ORDER BY e.stratum
    """,
    doc="Stratified treatment-effect estimation: users bucketed by "
    "PRE-period activity (fixed breaks, 4 strata), per-stratum "
    "treated-vs-control mean difference of post-period value, pooled "
    "by inverse-variance weighting — the observational-causal "
    "workhorse (stratification on a pre-treatment covariate removes "
    "the confounding that a raw q_events_did difference absorbs "
    "silently); fixed integer breaks instead of ntile because "
    "quantile bucket BOUNDARIES are engine-order-dependent under "
    "ties. Exactness: per-user and per-cell stats exact ints (Σ² "
    "HUGEINT/DECIMAL); per-stratum effect/variance single float "
    "expressions; the inverse-variance weights and weighted effects "
    "are quantized to fixed-point BEFORE the cross-stratum pooled "
    "sums. Scale: one combinable per-user pass, one per-cell "
    "rollup (8 cells), arithmetic after. Ref: no reference "
    "counterpart — experimentation tier.",
)
def q_events_propensity_strata(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    vq = F.round(F.col("value") * 1e4).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long").alias("pre_n"),
        F.sum(F.when(F.col("ts") >= cut, vq).otherwise(F.lit(0)))
        .cast("long").alias("post_q"),
    ).select(
        (F.col("user_id") % 2).alias("treat"),
        F.least(F.expr("pre_n div 25"), F.lit(3)).alias("stratum"),
        "post_q",
    )
    dec = "decimal(38,0)"
    cell = per_user.groupBy("stratum", "treat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("post_q").cast("long").alias("s"),
        F.sum(F.col("post_q").cast(dec) * F.col("post_q").cast(dec)).alias("ss"),
    )
    m = F.col("s").cast("double") / F.col("n")
    vn = (
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
    ) / F.col("n")
    eff = (
        cell.select("stratum", "treat", "n", m.alias("m"), vn.alias("vn"))
        .groupBy("stratum")
        .agg(
            F.max(F.when(F.col("treat") == 0, F.col("n"))).alias("n0"),
            F.max(F.when(F.col("treat") == 1, F.col("n"))).alias("n1"),
            (
                F.max(F.when(F.col("treat") == 1, F.col("m")))
                - F.max(F.when(F.col("treat") == 0, F.col("m")))
            ).alias("effect"),
            (
                F.max(F.when(F.col("treat") == 0, F.col("vn")))
                + F.max(F.when(F.col("treat") == 1, F.col("vn")))
            ).alias("var_eff"),
        )
    )
    eff = eff.localCheckpoint(eager=False)  # pool + output share it
    pool = eff.filter(F.col("var_eff") > 0).agg(
        F.sum(F.round(F.lit(1e9) / F.col("var_eff")).cast("long"))
        .cast("long").alias("qw"),
        F.sum(
            F.round(F.col("effect") / F.col("var_eff") * 1e5).cast("long")
        ).cast("long").alias("qwe"),
    )
    return (
        eff.join(F.broadcast(pool))
        .select(
            "stratum",
            "n0",
            "n1",
            (F.round(F.col("effect") / 1e4, 6) + 0.0).alias("effect"),
            (F.round(F.sqrt(F.col("var_eff")) / 1e4, 6) + 0.0).alias("se"),
            (
                F.round(
                    (F.col("qwe") / 1e5)
                    / F.nullif(F.col("qw") / 1e9, F.lit(0.0))
                    / 1e4,
                    6,
                )
                + 0.0
            ).alias("pooled_ate"),
        )
        .orderBy("stratum")
    )


@register(
    "q_timeseries_contribution",
    family="timeseries",
    oracle="""
    WITH halves AS (
      SELECT event_type AS et,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 1e4) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v1,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 1e4) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS v2
      FROM events GROUP BY et
    ),
    tot AS (
      SELECT CAST(sum(v1) AS BIGINT) AS t1, CAST(sum(v2) AS BIGINT) AS t2
      FROM halves
    )
    SELECT h.et AS event_type,
           round(h.v1 / 1e4, 4) + 0.0 AS value_p1,
           round(h.v2 / 1e4, 4) + 0.0 AS value_p2,
           round((h.v2 - h.v1) / 1e4, 4) + 0.0 AS delta,
           round(CAST(h.v2 - h.v1 AS DOUBLE)
                 / nullif(t.t2 - t.t1, 0), 6) + 0.0 AS share_of_total_delta,
           round(CAST(h.v2 - h.v1 AS DOUBLE) / nullif(h.v1, 0), 6) + 0.0
             AS pct_change,
           round(CAST(t.t2 - t.t1 AS DOUBLE) / nullif(t.t1, 0), 6) + 0.0
             AS total_pct_change
    FROM halves h CROSS JOIN tot t
    ORDER BY event_type
    """,
    doc="Metric-movement contribution analysis: the total value delta "
    "between the two halves of the window decomposed by event type — "
    "each segment's share of the TOTAL change (shares sum to 1 "
    "exactly, since Σ segment deltas = total delta) plus its own "
    "percent change — the 'WHY did the metric move' drill-down that "
    "follows q_timeseries_wow's 'it moved': a segment with a small "
    "own-change but huge base can dominate the total delta, which "
    "per-segment growth rates alone never reveal. Exactness: period "
    "sums are exact 1e4-quantized ints; every share/pct is ONE "
    "division of exact integer deltas with nullif zero guards. "
    "Scale: one conditional-sum pass over the fact + a 1-row totals "
    "broadcast. Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_contribution(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    vq = F.round(F.col("value") * 1e4).cast("long")
    halves = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.sum(F.when(F.col("ts") < cut, vq).otherwise(F.lit(0)))
        .cast("long").alias("v1"),
        F.sum(F.when(F.col("ts") >= cut, vq).otherwise(F.lit(0)))
        .cast("long").alias("v2"),
    )
    halves = halves.localCheckpoint(eager=False)  # tot + output share it
    tot = halves.agg(
        F.sum("v1").cast("long").alias("t1"),
        F.sum("v2").cast("long").alias("t2"),
    )
    d = F.col("v2") - F.col("v1")
    td = F.col("t2") - F.col("t1")
    return (
        halves.join(F.broadcast(tot))
        .select(
            F.col("et").alias("event_type"),
            (F.round(F.col("v1") / 1e4, 4) + 0.0).alias("value_p1"),
            (F.round(F.col("v2") / 1e4, 4) + 0.0).alias("value_p2"),
            (F.round(d / 1e4, 4) + 0.0).alias("delta"),
            (
                F.round(
                    d.cast("double") / F.nullif(td.cast("double"), F.lit(0.0)),
                    6,
                )
                + 0.0
            ).alias("share_of_total_delta"),
            (
                F.round(
                    d.cast("double")
                    / F.nullif(F.col("v1").cast("double"), F.lit(0.0)),
                    6,
                )
                + 0.0
            ).alias("pct_change"),
            (
                F.round(
                    td.cast("double")
                    / F.nullif(F.col("t1").cast("double"), F.lit(0.0)),
                    6,
                )
                + 0.0
            ).alias("total_pct_change"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-9 wave 2: time-series diagnostics on the calendar-bounded daily
# grid (seasonal Mann-Kendall, Ljung-Box, Durbin-Watson, Granger, runs
# test). All heavy lifting is ONE combinable daily rollup over the fact;
# every window/join after runs on the <=366-row-per-series grid.
# ---------------------------------------------------------------------------


@register(
    "q_timeseries_seasonal_mk",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(dayofweek(date_trunc('day', ts)) AS BIGINT) AS season,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    s AS (
      SELECT a.et, a.season,
             CAST(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a
      JOIN daily b ON a.et = b.et AND a.season = b.season AND a.d < b.d
      GROUP BY a.et, a.season
    ),
    ties AS (
      SELECT et, season,
             CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie18
      FROM (SELECT et, season, c, CAST(count(*) AS BIGINT) AS tc
            FROM daily GROUP BY et, season, c)
      GROUP BY et, season
    ),
    nd AS (SELECT et, season, CAST(count(*) AS BIGINT) AS n
           FROM daily GROUP BY et, season),
    per AS (
      SELECT nd.et, nd.season, nd.n, s.s_stat,
             CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie18 AS BIGINT)
               AS var18
      FROM nd JOIN s ON s.et = nd.et AND s.season = nd.season
              JOIN ties ON ties.et = nd.et AND ties.season = nd.season
    ),
    tot AS (
      SELECT et, CAST(sum(n) AS BIGINT) AS n_days,
             CAST(sum(s_stat) AS BIGINT) AS s_total,
             CAST(sum(var18) AS BIGINT) AS var18_total
      FROM per GROUP BY et
    )
    SELECT et AS event_type, n_days, s_total, var18_total,
           round(CASE WHEN s_total > 0 THEN (s_total - 1.0)
                      WHEN s_total < 0 THEN (s_total + 1.0)
                      ELSE 0.0 END
                 / sqrt(var18_total / 18.0), 6) + 0.0 AS z_score,
           CASE WHEN s_total > 0 THEN 'increasing'
                WHEN s_total < 0 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM tot ORDER BY event_type
    """,
    doc="Seasonal Mann-Kendall trend test per event type — "
    "q_timeseries_mann_kendall's seasonality-robust upgrade (Hirsch "
    "& Slack): the MK statistic is computed WITHIN each day-of-week "
    "season (so a strong weekly cycle cannot masquerade as — or "
    "mask — a trend), then S and the tie-corrected 18*Var(S) are "
    "summed across seasons and one continuity-corrected z is taken "
    "on the totals. Exactness: every per-season S and variance term "
    "is an exact integer from the calendar-bounded daily grid; only "
    "the final z is float. Scale: one combinable daily rollup over "
    "the fact; the pair self-join is per-(type, season) over <=53 "
    "rows each — never O(rows^2). Season key is Spark dayofweek-1 "
    "== DuckDB dayofweek (both on the truncated day). Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_seasonal_mk(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        day.alias("d"),
        (F.dayofweek(day) - 1).cast("long").alias("season"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # 3 consumers below
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("a.et") == F.col("b.et"))
            & (F.col("a.season") == F.col("b.season"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.et").alias("et"), F.col("a.season").alias("season"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("et", "season", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy("et", "season")
        .agg(
            F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5))
            .cast("long")
            .alias("tie18")
        )
    )
    nd = daily.groupBy("et", "season").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per = nd.join(s, ["et", "season"]).join(ties, ["et", "season"]).select(
        "et",
        "season",
        "n",
        "s_stat",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie18")
        ).cast("long").alias("var18"),
    )
    tot = per.groupBy("et").agg(
        F.sum("n").cast("long").alias("n_days"),
        F.sum("s_stat").cast("long").alias("s_total"),
        F.sum("var18").cast("long").alias("var18_total"),
    )
    z = (
        F.when(F.col("s_total") > 0, F.col("s_total") - 1.0)
        .when(F.col("s_total") < 0, F.col("s_total") + 1.0)
        .otherwise(F.lit(0.0))
    ) / F.sqrt(F.col("var18_total") / 18.0)
    return tot.select(
        F.col("et").alias("event_type"),
        "n_days",
        "s_total",
        "var18_total",
        (F.round(z, 6) + 0.0).alias("z_score"),
        F.when(F.col("s_total") > 0, F.lit("increasing"))
        .when(F.col("s_total") < 0, F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
    ).orderBy("event_type")


_LB_MAX_LAG = 7           # weekly horizon on the daily grid
_LB_CHI2_CRIT_7 = 14.067  # chi2_{0.05, df=7}


@register(
    "q_timeseries_ljung_box",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    idx AS (
      SELECT et, CAST(date_diff('day', min(d) OVER (PARTITION BY et), d)
                      AS BIGINT) AS tt, c
      FROM daily
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM idx GROUP BY et
    ),
    lagged AS (
      SELECT a.et, b.tt - a.tt AS k,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(a.c * b.c) AS BIGINT) AS spp,
             CAST(sum(a.c) AS BIGINT) AS hs,
             CAST(sum(b.c) AS BIGINT) AS ts_
      FROM idx a JOIN idx b
        ON a.et = b.et AND b.tt - a.tt BETWEEN 1 AND {_LB_MAX_LAG}
      GROUP BY a.et, b.tt - a.tt
    ),
    rk AS (
      SELECT l.et, l.k, s.n,
             (l.spp - (CAST(s.s1 AS DOUBLE) / s.n) * (l.hs + l.ts_)
                    + l.cnt * (CAST(s.s1 AS DOUBLE) / s.n)
                            * (CAST(s.s1 AS DOUBLE) / s.n))
             / (s.s2 - s.n * (CAST(s.s1 AS DOUBLE) / s.n)
                           * (CAST(s.s1 AS DOUBLE) / s.n)) AS r
      FROM lagged l JOIN st s ON s.et = l.et
    ),
    q AS (
      SELECT et, max(n) AS n,
             CAST(sum(CAST(round(1e12 * r * r / (n - k)) AS BIGINT))
                  AS DOUBLE) / 1e12 AS tsum,
             CAST(sum(CASE WHEN k = 1
                           THEN CAST(round(1e6 * r) AS BIGINT) END)
                  AS DOUBLE) / 1e6 AS r1
      FROM rk GROUP BY et
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
           round(r1, 6) + 0.0 AS r1,
           round(n * (n + 2.0) * tsum, 6) + 0.0 AS q_lb,
           n * (n + 2.0) * tsum > {_LB_CHI2_CRIT_7} AS significant
    FROM q ORDER BY event_type
    """,
    doc="Ljung-Box portmanteau test per event type — is the daily "
    f"series white noise, or autocorrelated up to lag {_LB_MAX_LAG} "
    "(the weekly horizon)? The is-there-structure-left gate run on "
    "model residuals and on raw series before q_timeseries_autocorr "
    "is trusted. Autocorrelations never touch per-row floats: each "
    "lag's cross-product, head/tail sums and pair count are exact "
    "integers from the calendar-bounded grid, r_k is one float "
    "expression of them, and the Q summands r_k^2/(n-k) are "
    "quantized to 1e-12 BIGINTs before the cross-lag sum (lag order "
    "cannot perturb Q). Judged against the published "
    f"chi2_(0.05, df={_LB_MAX_LAG}) = {_LB_CHI2_CRIT_7} (odd df has "
    "no even-df closed form; the critical-value literal keeps the "
    "operator exact). Scale: one combinable daily rollup; the lag "
    "join is banded (<=7 partners) on the <=366-row grid. Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_ljung_box(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # grid-bounded window: one row per (type, day)
    idx = daily.select(
        "et",
        F.datediff(
            F.col("d"), F.min("d").over(Window.partitionBy("et"))
        ).cast("long").alias("tt"),
        "c",
    )
    idx = idx.localCheckpoint(eager=False)  # st + both lag sides read it
    st = idx.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    lagged = (
        a.join(
            F.broadcast(b),
            (F.col("a.et") == F.col("b.et"))
            & ((F.col("b.tt") - F.col("a.tt")).between(1, _LB_MAX_LAG)),
        )
        .groupBy(F.col("a.et").alias("et"), (F.col("b.tt") - F.col("a.tt")).alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("spp"),
            F.sum(F.col("a.c")).cast("long").alias("hs"),
            F.sum(F.col("b.c")).cast("long").alias("ts_"),
        )
    )
    m = F.col("s1").cast("double") / F.col("n")
    r = (F.col("spp") - m * (F.col("hs") + F.col("ts_")) + F.col("cnt") * m * m) / (
        F.col("s2") - F.col("n") * m * m
    )
    rk = lagged.join(F.broadcast(st), "et").select("et", "k", "n", r.alias("r"))
    q = rk.groupBy("et").agg(
        F.max("n").alias("n"),
        (
            F.sum(
                F.round(1e12 * F.col("r") * F.col("r") / (F.col("n") - F.col("k")))
                .cast("long")
            ).cast("double")
            / 1e12
        ).alias("tsum"),
        (
            F.sum(
                F.when(F.col("k") == 1, F.round(1e6 * F.col("r")).cast("long"))
            ).cast("double")
            / 1e6
        ).alias("r1"),
    )
    qlb = F.col("n") * (F.col("n") + 2.0) * F.col("tsum")
    return q.select(
        F.col("et").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        (F.round("r1", 6) + 0.0).alias("r1"),
        (F.round(qlb, 6) + 0.0).alias("q_lb"),
        (qlb > _LB_CHI2_CRIT_7).alias("significant"),
    ).orderBy("event_type")


@register(
    "q_timeseries_durbin_watson",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    idx AS (
      SELECT et, CAST(date_diff('day', min(d) OVER (PARTITION BY et), d)
                      AS BIGINT) AS tt, c
      FROM daily
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(tt) AS BIGINT) AS stx,
             CAST(sum(tt * tt) AS BIGINT) AS stt,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(tt * c) AS BIGINT) AS stc
      FROM idx GROUP BY et
    ),
    fit AS (
      SELECT et, n,
             (n * CAST(stc AS DOUBLE) - CAST(stx AS DOUBLE) * sc)
             / (n * CAST(stt AS DOUBLE) - CAST(stx AS DOUBLE) * stx) AS b,
             (CAST(sc AS DOUBLE)
              - (n * CAST(stc AS DOUBLE) - CAST(stx AS DOUBLE) * sc)
                / (n * CAST(stt AS DOUBLE) - CAST(stx AS DOUBLE) * stx)
                * stx) / n AS a
      FROM st
    ),
    res AS (
      SELECT i.et, i.tt, f.n, f.b,
             CAST(round((i.c - f.a - f.b * i.tt) * 1e6) AS HUGEINT) AS eq
      FROM idx i JOIN fit f ON f.et = i.et
    ),
    dw AS (
      SELECT r.et, max(r.n) AS n, max(r.b) AS b,
             CAST(sum(r.eq * r.eq) AS DOUBLE) AS sse,
             CAST(sum(CASE WHEN p.eq IS NULL THEN 0
                           ELSE (r.eq - p.eq) * (r.eq - p.eq) END)
                  AS DOUBLE) AS ssd
      FROM res r LEFT JOIN res p ON p.et = r.et AND p.tt = r.tt - 1
      GROUP BY r.et
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
           round(b, 6) + 0.0 AS trend_slope,
           round(ssd / sse, 6) + 0.0 AS dw_stat,
           round(1.0 - ssd / sse / 2.0, 6) + 0.0 AS rho_approx
    FROM dw ORDER BY event_type
    """,
    doc="Durbin-Watson serial-correlation statistic per event type on "
    "the residuals of an OLS linear trend over the daily grid — the "
    "are-residuals-independent check that validates (or indicts) "
    "every trend fit the timeseries tier reports "
    "(q_timeseries_theilsen, q_window_regr_slope); DW ~ 2 means "
    "clean, <2 positive autocorrelation (rho_approx = 1 - DW/2). "
    "Exactness: the trend coefficients come from exact integer sums "
    "(the q_agg_ols discipline); each residual — an identical float "
    "expression both engines — is quantized to 1e-6 BIGINTs and the "
    "two quadratic sums run in HUGEINT/DECIMAL(38,0), so day order "
    "cannot perturb DW. Scale: one combinable daily rollup; the "
    "lag-1 join and both quadratic sums run on the <=366-row grid. "
    "Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_durbin_watson(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    idx = daily.select(
        "et",
        F.datediff(
            F.col("d"), F.min("d").over(Window.partitionBy("et"))
        ).cast("long").alias("tt"),
        "c",
    )
    idx = idx.localCheckpoint(eager=False)  # st + residual pass read it
    st = idx.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tt").cast("long").alias("stx"),
        F.sum(F.col("tt") * F.col("tt")).cast("long").alias("stt"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("tt") * F.col("c")).cast("long").alias("stc"),
    )
    nd = F.col("n").cast("double")
    b = (nd * F.col("stc").cast("double") - F.col("stx").cast("double") * F.col("sc")) / (
        nd * F.col("stt").cast("double") - F.col("stx").cast("double") * F.col("stx")
    )
    fit = st.select("et", "n", b.alias("b"), ((F.col("sc").cast("double") - b * F.col("stx")) / nd).alias("a"))
    res = idx.join(F.broadcast(fit), "et").select(
        "et",
        "tt",
        "n",
        "b",
        F.round((F.col("c") - F.col("a") - F.col("b") * F.col("tt")) * 1e6)
        .cast("decimal(38,0)")
        .alias("eq"),
    )
    res = res.localCheckpoint(eager=False)  # both lag-join sides read it
    r, p = res.alias("r"), res.alias("p")
    dw = (
        r.join(
            F.broadcast(p.select(F.col("et").alias("pet"), F.col("tt").alias("ptt"), F.col("eq").alias("peq"))),
            (F.col("pet") == F.col("r.et")) & (F.col("ptt") == F.col("r.tt") - 1),
            "left",
        )
        .groupBy(F.col("r.et").alias("et"))
        .agg(
            F.max("r.n").alias("n"),
            F.max("r.b").alias("b"),
            F.sum(F.col("r.eq") * F.col("r.eq")).cast("double").alias("sse"),
            F.sum(
                F.when(F.col("peq").isNull(), F.lit(0).cast("decimal(38,0)"))
                .otherwise((F.col("r.eq") - F.col("peq")) * (F.col("r.eq") - F.col("peq")))
            ).cast("double").alias("ssd"),
        )
    )
    return dw.select(
        F.col("et").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        (F.round("b", 6) + 0.0).alias("trend_slope"),
        (F.round(F.col("ssd") / F.col("sse"), 6) + 0.0).alias("dw_stat"),
        (F.round(1.0 - F.col("ssd") / F.col("sse") / 2.0, 6) + 0.0).alias("rho_approx"),
    ).orderBy("event_type")


_GRANGER_CAUSE = "click"     # candidate leading indicator
_GRANGER_EFFECT = "purchase" # series being predicted


@register(
    "q_timeseries_granger",
    family="timeseries",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT date_trunc('day', ts) AS d FROM events
    ),
    idx AS (
      SELECT d, CAST(date_diff('day', (SELECT min(d) FROM days), d)
                     AS BIGINT) AS tt
      FROM days
    ),
    cx AS (
      SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE event_type = '{_GRANGER_CAUSE}' GROUP BY 1
    ),
    cy AS (
      SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = '{_GRANGER_EFFECT}' GROUP BY 1
    ),
    grid AS (
      SELECT i.tt, coalesce(cx.x, 0) AS x, coalesce(cy.y, 0) AS y
      FROM idx i LEFT JOIN cx ON cx.d = i.d LEFT JOIN cy ON cy.d = i.d
    ),
    rows_ AS (
      SELECT cur.y AS y, prev.y AS x1, prev.x AS x2
      FROM grid cur JOIN grid prev ON prev.tt = cur.tt - 1
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * x1) AS DOUBLE) AS sx1x1,
             CAST(sum(x2 * x2) AS DOUBLE) AS sx2x2,
             CAST(sum(x1 * x2) AS DOUBLE) AS sx1x2,
             CAST(sum(x1 * y) AS DOUBLE) AS sx1y,
             CAST(sum(x2 * y) AS DOUBLE) AS sx2y,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM rows_
    ),
    m AS (
      SELECT n,
             CAST(n AS DOUBLE) * sx1x1 - sx1 * sx1 AS m11,
             CAST(n AS DOUBLE) * sx2x2 - sx2 * sx2 AS m22,
             CAST(n AS DOUBLE) * sx1x2 - sx1 * sx2 AS m12,
             CAST(n AS DOUBLE) * sx1y - sx1 * sy AS v1,
             CAST(n AS DOUBLE) * sx2y - sx2 * sy AS v2,
             CAST(n AS DOUBLE) * syy - sy * sy AS tss
      FROM st
    ),
    b AS (
      SELECT n, tss, v1, v2, m11,
             (v1 * m22 - v2 * m12) / (m11 * m22 - m12 * m12) AS b1,
             (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) AS b2
      FROM m
    )
    SELECT n AS n_obs,
           round(b1, 6) + 0.0 AS beta_own,
           round(b2, 6) + 0.0 AS beta_cross,
           round(((tss - v1 * v1 / m11) - (tss - b1 * v1 - b2 * v2))
                 * (n - 3) / (tss - b1 * v1 - b2 * v2), 6) + 0.0 AS f_stat
    FROM b
    """,
    doc=f"Granger causality test (lag 1): does yesterday's "
    f"{_GRANGER_CAUSE} volume improve the prediction of today's "
    f"{_GRANGER_EFFECT} volume beyond {_GRANGER_EFFECT}'s own lag? "
    "F = ((SSE_restricted - SSE_unrestricted)/1) / (SSE_u/(n-3)) "
    "where the unrestricted model y_t ~ y_(t-1) + x_(t-1) is solved "
    "with q_agg_ols_multi's closed-form 2x2 Cramer normal equations "
    "and the restricted one is simple OLS — both from the SAME ten "
    "exact integer sums over the lag-aligned daily grid (counts are "
    "ints, so every sufficient statistic is exact; the n-scaled "
    "centered moments cancel in the F ratio). Scale: two filtered "
    "combinable daily rollups + a lag-1 grid join on <=366 rows; "
    "the fact is scanned once. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_granger(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    days = days.localCheckpoint(eager=False)  # min + index read it
    idx = days.crossJoin(F.broadcast(days.agg(F.min("d").alias("d0")))).select(
        "d", F.datediff(F.col("d"), F.col("d0")).cast("long").alias("tt")
    )

    def series(et, name):
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy(F.date_trunc("day", "ts").alias("d"))
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    grid = (
        idx.join(F.broadcast(series(_GRANGER_CAUSE, "x")), "d", "left")
        .join(F.broadcast(series(_GRANGER_EFFECT, "y")), "d", "left")
        .select(
            "tt",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    grid = grid.localCheckpoint(eager=False)  # both lag-join sides read it
    cur, prev = grid.alias("cur"), grid.alias("prev")
    rows_ = cur.join(
        F.broadcast(prev), F.col("prev.tt") == F.col("cur.tt") - 1
    ).select(
        F.col("cur.y").alias("y"),
        F.col("prev.y").alias("x1"),
        F.col("prev.x").alias("x2"),
    )
    st = rows_.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    m11 = nd * F.col("sx1x1") - F.col("sx1") * F.col("sx1")
    m22 = nd * F.col("sx2x2") - F.col("sx2") * F.col("sx2")
    m12 = nd * F.col("sx1x2") - F.col("sx1") * F.col("sx2")
    v1 = nd * F.col("sx1y") - F.col("sx1") * F.col("sy")
    v2 = nd * F.col("sx2y") - F.col("sx2") * F.col("sy")
    tss = nd * F.col("syy") - F.col("sy") * F.col("sy")
    det = m11 * m22 - m12 * m12
    b1 = (v1 * m22 - v2 * m12) / det
    b2 = (m11 * v2 - m12 * v1) / det
    sse_u = tss - b1 * v1 - b2 * v2
    sse_r = tss - v1 * v1 / m11
    return st.select(
        F.col("n").alias("n_obs"),
        (F.round(b1, 6) + 0.0).alias("beta_own"),
        (F.round(b2, 6) + 0.0).alias("beta_cross"),
        (F.round((sse_r - sse_u) * (F.col("n") - 3) / sse_u, 6) + 0.0).alias(
            "f_stat"
        ),
    )


@register(
    "q_timeseries_runs_test",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    cells AS (
      SELECT et, c, CAST(count(*) AS BIGINT) AS w FROM daily GROUP BY et, c
    ),
    cum AS (
      SELECT et, c,
             sum(w) OVER (PARTITION BY et ORDER BY c
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY et) AS n
      FROM cells
    ),
    med AS (
      SELECT et,
             min(CASE WHEN cw >= (n + 1) // 2 THEN c END)
           + min(CASE WHEN cw >= n // 2 + 1 THEN c END) AS med2
      FROM cum GROUP BY et
    ),
    signs AS (
      SELECT daily.et, daily.d,
             CASE WHEN 2 * daily.c > m.med2 THEN 1 ELSE -1 END AS s
      FROM daily JOIN med m ON m.et = daily.et
      WHERE 2 * daily.c <> m.med2
    ),
    runs AS (
      SELECT et, s,
             CASE WHEN lag(s) OVER (PARTITION BY et ORDER BY d) IS NULL
                  OR lag(s) OVER (PARTITION BY et ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS strt
      FROM signs
    ),
    agg AS (
      SELECT et,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(strt) AS BIGINT) AS r
      FROM runs GROUP BY et
    )
    SELECT et AS event_type, n1 AS n_above, n2 AS n_below, r AS n_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))),
                 6) + 0.0 AS z_score
    FROM agg ORDER BY event_type
    """,
    doc="Wald-Wolfowitz runs test per event type — is the daily series "
    "RANDOM around its median, or do above/below-median days clump "
    "(regime persistence) or alternate (overdispersion)? The "
    "randomness gate that complements q_timeseries_ljung_box's "
    "correlation view with a fully nonparametric one. The median is "
    "an exact lower+upper walk over per-count cells (DOUBLED to stay "
    "integral, the q_agg_hodges_lehmann convention); median-equal "
    "days are excluded per the classical prescription; runs are "
    "counted with one lag over the calendar-bounded grid; z is one "
    "float expression of the exact integers (n1, n2, R). Scale: one "
    "combinable daily rollup; every window is partitioned by series "
    "and grid-bounded. Ref: no reference counterpart — timeseries "
    "tier.",
)
def q_timeseries_runs_test(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # cells + signs read it
    cells = daily.groupBy("et", "c").agg(F.count(F.lit(1)).cast("long").alias("w"))
    wc = Window.partitionBy("et").orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "et",
        "c",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(Window.partitionBy("et")).alias("n"),
    )
    med = cum.groupBy("et").agg(
        (
            F.min(F.when(F.col("cw") >= F.expr("(n + 1) div 2"), F.col("c")))
            + F.min(F.when(F.col("cw") >= F.expr("n div 2 + 1"), F.col("c")))
        ).alias("med2")
    )
    signs = (
        daily.join(F.broadcast(med), "et")
        .filter(2 * F.col("c") != F.col("med2"))
        .select(
            "et",
            "d",
            F.when(2 * F.col("c") > F.col("med2"), 1).otherwise(-1).alias("s"),
        )
    )
    wd = Window.partitionBy("et").orderBy("d")
    runs = signs.select(
        "et",
        "s",
        F.when(
            F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")),
            1,
        ).otherwise(0).alias("strt"),
    )
    agg = runs.groupBy("et").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum("strt").cast("long").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sig = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        F.col("et").alias("event_type"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        (F.round((r - mu) / sig, 6) + 0.0).alias("z_score"),
    ).orderBy("event_type")


# activity-tier cuts for the uplift segmentation (per-user event counts
# center on ~67 at every fixture SF; the cuts straddle the terciles)
_UPLIFT_LO = 63
_UPLIFT_HI = 70
_UPLIFT_VAL = 200  # conversion = any purchase at value >= this (~20% of
                   # users at every fixture SF -- a NON-saturated outcome;
                   # plain any-purchase converts ~100% of users and its
                   # pooled variance collapses to zero)


@register(
    "q_events_uplift",
    family="events",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                               1, 4)) AS BIGINT) % 100 < 50
                  THEN 'control' ELSE 'treatment' END AS arm,
             CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN event_type = 'purchase' AND value >= {_UPLIFT_VAL}
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    seg AS (
      SELECT CASE WHEN n_events < {_UPLIFT_LO} THEN 'low'
                  WHEN n_events < {_UPLIFT_HI} THEN 'mid'
                  ELSE 'high' END AS segment,
             arm, conv
      FROM u
    ),
    c AS (
      SELECT segment,
             CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN arm = 'treatment' THEN conv ELSE 0 END) AS BIGINT) AS conv_t,
             CAST(sum(CASE WHEN arm = 'control' THEN conv ELSE 0 END) AS BIGINT) AS conv_c
      FROM seg GROUP BY segment
      HAVING n_t > 0 AND n_c > 0
    )
    SELECT segment, n_t, n_c, conv_t, conv_c,
           round(CAST(conv_t AS DOUBLE) / n_t
                 - CAST(conv_c AS DOUBLE) / n_c, 6) + 0.0 AS uplift,
           round((CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
                 / nullif(sqrt((CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                        * (1.0 - CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                        * (1.0 / n_t + 1.0 / n_c)), 0), 6) + 0.0 AS z_score
    FROM c ORDER BY segment
    """,
    doc="Segment-level uplift readout: per activity tier, the "
    "treatment-minus-control conversion-rate difference with its "
    "pooled two-proportion z — the heterogeneous-treatment-effect "
    "table that decides WHERE a feature works, the segment-sliced "
    "companion to q_events_ab_assign (same md5 hash split, so arms "
    "replay deterministically) and q_events_cuped (which tightens "
    "the same CI with covariates). Conversion and segment come from "
    "ONE per-user rollup (conv = any purchase, tier from the event "
    "count); every cell is an exact integer and uplift/z are single "
    "float expressions. Scale: one combinable per-user rollup, then "
    "a <=3-row segment table. Ref: no reference counterpart — "
    "events tier.",
)
def q_events_uplift(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _UPLIFT_VAL),
                1,
            ).otherwise(0)
        ).alias("conv"),
    ).select(
        F.when(bucket < 50, "control").otherwise("treatment").alias("arm"),
        "n_events",
        "conv",
    )
    seg = u.select(
        F.when(F.col("n_events") < _UPLIFT_LO, "low")
        .when(F.col("n_events") < _UPLIFT_HI, "mid")
        .otherwise("high")
        .alias("segment"),
        "arm",
        "conv",
    )
    c = seg.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0))
        .cast("long").alias("n_t"),
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("long").alias("n_c"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("conv")).otherwise(0))
        .cast("long").alias("conv_t"),
        F.sum(F.when(F.col("arm") == "control", F.col("conv")).otherwise(0))
        .cast("long").alias("conv_c"),
    )
    # a segment without BOTH arms has no estimable uplift (and at tiny
    # fixture scales a tercile can be one-armed) — drop it in both engines
    c = c.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    pt = F.col("conv_t").cast("double") / F.col("n_t")
    pc = F.col("conv_c").cast("double") / F.col("n_c")
    pool = (F.col("conv_t") + F.col("conv_c")).cast("double") / (
        F.col("n_t") + F.col("n_c")
    )
    # pool*(1-pool) degenerates to 0 when a tiny segment converts no
    # one (or everyone) — z is NULL there, identically on both engines
    z = (pt - pc) / F.nullif(
        F.sqrt(
            pool * (1.0 - pool) * (1.0 / F.col("n_t") + 1.0 / F.col("n_c"))
        ),
        F.lit(0.0),
    )
    return c.select(
        "segment",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        (F.round(pt - pc, 6) + 0.0).alias("uplift"),
        (F.round(z, 6) + 0.0).alias("z_score"),
    ).orderBy("segment")


_BASS_K = 50  # "adoption" = the day a user crosses this cumulative
              # event count (first-ever event is degenerate on the fixture:
              # every user starts on day 1-2, so no curve exists to fit)


@register(
    "q_events_bass",
    family="events",
    oracle=f"""
    WITH ud AS (
      SELECT user_id, date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, d
    ),
    ucum AS (
      SELECT user_id, d,
             sum(c) OVER (PARTITION BY user_id ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS cw
      FROM ud
    ),
    first_day AS (
      SELECT user_id, min(d) AS d0 FROM ucum
      WHERE cw >= {_BASS_K} GROUP BY user_id
    ),
    adopt AS (
      SELECT d0 AS d, CAST(count(*) AS BIGINT) AS nt FROM first_day GROUP BY d0
    ),
    cum AS (
      SELECT d, nt,
             sum(nt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) - nt AS nprev
      FROM adopt
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nprev) AS DOUBLE) AS sx1,
             CAST(sum(nprev * nprev) AS DOUBLE) AS sx2,
             CAST(sum(nt) AS DOUBLE) AS sy,
             CAST(sum(nprev * nprev) AS DOUBLE) AS sx1x1,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev * nprev)
                  AS DOUBLE) AS sx2x2,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev) AS DOUBLE) AS sx1x2,
             CAST(sum(nprev * nt) AS DOUBLE) AS sx1y,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * nt) AS DOUBLE) AS sx2y,
             CAST(sum(nt) AS BIGINT) AS m_users
      FROM cum
    ),
    m AS (
      SELECT n, m_users, sx1, sx2, sy,
             CAST(n AS DOUBLE) * sx1x1 - sx1 * sx1 AS m11,
             CAST(n AS DOUBLE) * sx2x2 - sx2 * sx2 AS m22,
             CAST(n AS DOUBLE) * sx1x2 - sx1 * sx2 AS m12,
             CAST(n AS DOUBLE) * sx1y - sx1 * sy AS v1,
             CAST(n AS DOUBLE) * sx2y - sx2 * sy AS v2
      FROM st
    ),
    b AS (
      SELECT n, m_users,
             (v1 * m22 - v2 * m12) / nullif(m11 * m22 - m12 * m12, 0) AS cb,
             (m11 * v2 - m12 * v1) / nullif(m11 * m22 - m12 * m12, 0) AS cc,
             (sy - (v1 * m22 - v2 * m12) / nullif(m11 * m22 - m12 * m12, 0) * sx1
                 - (m11 * v2 - m12 * v1) / nullif(m11 * m22 - m12 * m12, 0) * sx2)
             / n AS ca
      FROM m
    )
    SELECT n AS n_days, m_users,
           round(ca, 6) + 0.0 AS coef_a,
           round(cb, 6) + 0.0 AS coef_b,
           round(cc, 6) + 0.0 AS coef_c,
           round(CASE WHEN cc < 0 AND cb * cb - 4 * cc * ca >= 0
                      THEN (-cb - sqrt(cb * cb - 4 * cc * ca)) / (2 * nullif(cc, 0))
                 END, 6) + 0.0 AS m_est,
           round(CASE WHEN cc < 0 AND cb * cb - 4 * cc * ca >= 0
                      THEN ca / nullif((-cb - sqrt(cb * cb - 4 * cc * ca)) / (2 * nullif(cc, 0)), 0)
                 END, 6) + 0.0 AS p_est,
           round(CASE WHEN cc < 0 AND cb * cb - 4 * cc * ca >= 0
                      THEN -cc * ((-cb - sqrt(cb * cb - 4 * cc * ca)) / (2 * nullif(cc, 0)))
                 END, 6) + 0.0 AS q_est
    FROM b
    """,
    doc="Bass diffusion fit on the adoption curve — adoption = the "
    f"day a user crosses {_BASS_K} cumulative events (first-ever "
    "event is degenerate on the fixture: everyone starts on day "
    "1-2): the discrete Bass estimation n_t = a + b N_(t-1) "
    "+ c N_(t-1)^2 via the same closed-form two-predictor normal "
    "equations as q_agg_ols_multi (exact integer sums — adopter "
    "counts are ints; N^3/N^4 cross-terms ride HUGEINT/"
    "DECIMAL(38,0)), then the implied market size m (positive root "
    "of c m^2 + b m + a), innovation p = a/m and imitation q = -c m "
    "— guarded NULL (both engines) when the fit is not "
    "diffusion-shaped (c >= 0 or negative discriminant), which a "
    "uniform-arrival synthetic corpus may legitimately produce. "
    "Scale: one per-user min rollup (combinable), a <=366-row "
    "cumulative grid, constant work after. Ref: no reference "
    "counterpart — events tier.",
)
def q_events_bass(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    ud = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # per-user window over that user's <=31 active days
    wu = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ucum = ud.select("user_id", "d", F.sum("c").over(wu).alias("cw"))
    first_day = (
        ucum.filter(F.col("cw") >= _BASS_K)
        .groupBy("user_id")
        .agg(F.min("d").alias("d0"))
    )
    adopt = first_day.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    # grid-bounded window: one row per adoption day
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = adopt.select(
        "nt", (F.sum("nt").over(w) - F.col("nt")).alias("nprev")
    )
    hp = F.col("nprev").cast("decimal(38,0)")
    st = cum.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nprev").cast("double").alias("sx1"),
        F.sum(F.col("nprev") * F.col("nprev")).cast("double").alias("sx2"),
        F.sum("nt").cast("double").alias("sy"),
        F.sum(F.col("nprev") * F.col("nprev")).cast("double").alias("sx1x1"),
        F.sum(hp * F.col("nprev") * F.col("nprev") * F.col("nprev"))
        .cast("double").alias("sx2x2"),
        F.sum(hp * F.col("nprev") * F.col("nprev")).cast("double").alias("sx1x2"),
        F.sum(F.col("nprev") * F.col("nt")).cast("double").alias("sx1y"),
        F.sum(hp * F.col("nprev") * F.col("nt")).cast("double").alias("sx2y"),
        F.sum("nt").cast("long").alias("m_users"),
    )
    nd = F.col("n").cast("double")
    m11 = nd * F.col("sx1x1") - F.col("sx1") * F.col("sx1")
    m22 = nd * F.col("sx2x2") - F.col("sx2") * F.col("sx2")
    m12 = nd * F.col("sx1x2") - F.col("sx1") * F.col("sx2")
    v1 = nd * F.col("sx1y") - F.col("sx1") * F.col("sy")
    v2 = nd * F.col("sx2y") - F.col("sx2") * F.col("sy")
    det = F.nullif(m11 * m22 - m12 * m12, F.lit(0.0))
    cb = (v1 * m22 - v2 * m12) / det
    cc = (m11 * v2 - m12 * v1) / det
    ca = (F.col("sy") - cb * F.col("sx1") - cc * F.col("sx2")) / nd
    disc = cb * cb - 4 * cc * ca
    ok = (cc < 0) & (disc >= 0)
    m_est = (-cb - F.sqrt(F.when(ok, disc))) / (2 * F.nullif(cc, F.lit(0.0)))
    return st.select(
        F.col("n").alias("n_days"),
        "m_users",
        (F.round(ca, 6) + 0.0).alias("coef_a"),
        (F.round(cb, 6) + 0.0).alias("coef_b"),
        (F.round(cc, 6) + 0.0).alias("coef_c"),
        (F.round(F.when(ok, m_est), 6) + 0.0).alias("m_est"),
        (F.round(F.when(ok, ca / F.nullif(m_est, F.lit(0.0))), 6) + 0.0).alias("p_est"),
        (F.round(F.when(ok, -cc * m_est), 6) + 0.0).alias("q_est"),
    )


_PGRAM_MIN_P = 2    # candidate period range (days): Nyquist floor ..
_PGRAM_MAX_P = 14   # .. two weeks (the grid spans ~30 days)
_TWO_PI = "6.283185307179586"  # exact literal, identical text both engines


@register(
    "q_timeseries_periodogram",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    idx AS (
      SELECT et, CAST(date_diff('day', min(d) OVER (PARTITION BY et), d)
                      AS BIGINT) AS tt, c
      FROM daily
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
      FROM idx GROUP BY et
    ),
    terms AS (
      SELECT i.et, p.p, s.n,
             CAST(sum(CAST(round((i.c - CAST(s.s AS DOUBLE) / s.n)
                   * cos({_TWO_PI} * i.tt / p.p) * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 AS sc,
             CAST(sum(CAST(round((i.c - CAST(s.s AS DOUBLE) / s.n)
                   * sin({_TWO_PI} * i.tt / p.p) * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 AS ss
      FROM idx i
      JOIN st s ON s.et = i.et
      CROSS JOIN (SELECT unnest(range({_PGRAM_MIN_P}, {_PGRAM_MAX_P} + 1))
                    AS p) p
      GROUP BY i.et, p.p, s.n
    ),
    pw AS (
      SELECT et, p, n, sc * sc + ss * ss AS power,
             sum(sc * sc + ss * ss) OVER (PARTITION BY et) AS total,
             row_number() OVER (
               PARTITION BY et
               ORDER BY round(sc * sc + ss * ss, 6) DESC, p) AS r
      FROM terms
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
           CAST(p AS BIGINT) AS best_period,
           round(power / total, 6) + 0.0 AS power_share
    FROM pw WHERE r = 1 ORDER BY event_type
    """,
    doc="Discrete periodogram over candidate periods "
    f"{_PGRAM_MIN_P}..{_PGRAM_MAX_P} days per event type (Goertzel-"
    "style single-bin DFT power of the demeaned daily series), "
    "reporting the dominant period and its share of candidate power "
    "— the which-cycle-is-it detector that tells the seasonal suite "
    "(q_timeseries_seasonal, q_timeseries_seasonal_mk) WHAT season "
    "length to use instead of assuming weekly. Determinism: each "
    "cos/sin product term is quantized to 1e-6 BIGINTs before the "
    "per-(series, period) sum (engine libm cos/sin may differ by 1 "
    "ulp — the quantize-before-sum discipline absorbs it, same as "
    "the entropy/hill ln terms); 2*pi rides one exact literal; the "
    "argmax is a (rounded power DESC, period) total order. Scale: "
    "one combinable daily rollup; the period fan-out multiplies the "
    "GRID (<=366 rows/series x 13 periods), never the fact; all "
    "windows partition by series. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_periodogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    idx = daily.select(
        "et",
        F.datediff(
            F.col("d"), F.min("d").over(Window.partitionBy("et"))
        ).cast("long").alias("tt"),
        "c",
    )
    idx = idx.localCheckpoint(eager=False)  # st + term fan-out read it
    st = idx.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    fan = idx.join(F.broadcast(st), "et").withColumn(
        "p",
        F.explode(F.sequence(F.lit(_PGRAM_MIN_P), F.lit(_PGRAM_MAX_P))),
    )
    dm = F.col("c") - F.col("s").cast("double") / F.col("n")
    ang = F.expr(f"{_TWO_PI} * tt / p")
    terms = fan.groupBy("et", "p", "n").agg(
        (
            F.sum(F.round(dm * F.cos(ang) * 1e6).cast("long")).cast("double")
            / 1e6
        ).alias("sc"),
        (
            F.sum(F.round(dm * F.sin(ang) * 1e6).cast("long")).cast("double")
            / 1e6
        ).alias("ss"),
    )
    power = F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
    wtot = Window.partitionBy("et")
    wrnk = Window.partitionBy("et").orderBy(F.round(power, 6).desc(), "p")
    pw = terms.select(
        "et",
        "p",
        "n",
        power.alias("power"),
        F.sum(power).over(wtot).alias("total"),
        F.row_number().over(wrnk).alias("r"),
    )
    return (
        pw.filter(F.col("r") == 1)
        .select(
            F.col("et").alias("event_type"),
            F.col("n").cast("long").alias("n_days"),
            F.col("p").cast("long").alias("best_period"),
            (F.round(F.col("power") / F.col("total"), 6) + 0.0).alias(
                "power_share"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_meta_i2",
    family="events",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                               1, 4)) AS BIGINT) % 100 < 50
                  THEN 'control' ELSE 'treatment' END AS arm,
             CAST(count(*) AS BIGINT) AS n_events,
             max(CASE WHEN event_type = 'purchase' AND value >= {_UPLIFT_VAL}
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    seg AS (
      SELECT CASE WHEN n_events < {_UPLIFT_LO} THEN 'low'
                  WHEN n_events < {_UPLIFT_HI} THEN 'mid'
                  ELSE 'high' END AS segment,
             arm, conv
      FROM u
    ),
    c AS (
      SELECT segment,
             CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN arm = 'treatment' THEN conv ELSE 0 END) AS BIGINT) AS conv_t,
             CAST(sum(CASE WHEN arm = 'control' THEN conv ELSE 0 END) AS BIGINT) AS conv_c
      FROM seg GROUP BY segment
      HAVING n_t > 0 AND n_c > 0
    ),
    eff AS (
      SELECT segment,
             CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c AS d,
             (CAST(conv_t AS DOUBLE) / n_t)
               * (1.0 - CAST(conv_t AS DOUBLE) / n_t) / n_t
             + (CAST(conv_c AS DOUBLE) / n_c)
               * (1.0 - CAST(conv_c AS DOUBLE) / n_c) / n_c AS v
      FROM c
    ),
    ok AS (SELECT segment, d, 1.0 / v AS w FROM eff WHERE v > 0),
    pool AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(w * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sw,
             CAST(sum(CAST(round(w * d * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
               AS swd
      FROM ok
    ),
    q AS (
      SELECT p.k, p.swd / p.sw AS pooled,
             CAST(sum(CAST(round(o.w * (o.d - p.swd / p.sw)
                                     * (o.d - p.swd / p.sw) * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6 AS qstat
      FROM ok o CROSS JOIN pool p
      GROUP BY p.k, p.swd / p.sw
    )
    SELECT k AS k_segments,
           round(pooled, 6) + 0.0 AS pooled_uplift,
           round(qstat, 6) + 0.0 AS q_stat,
           round(greatest(0.0, (qstat - (k - 1)) / nullif(qstat, 0)), 6) + 0.0
             AS i_squared
    FROM q
    """,
    doc="Fixed-effect meta-analysis over the uplift segments: the "
    "inverse-variance pooled treatment effect, Cochran's Q "
    "heterogeneity statistic, and Higgins' I^2 (share of "
    "between-segment variance not explained by sampling noise) — "
    "the one-effect-or-many verdict that decides whether "
    "q_events_uplift's per-segment table can be collapsed to a "
    "single number or the effect is genuinely heterogeneous; the "
    "same machinery pools per-shard A/B readouts at 100 TB. Segment "
    "effects/variances are single float expressions of exact cells "
    "(same md5 arm split and guards as q_events_uplift, plus a "
    "v > 0 degeneracy filter); weights, weighted effects and Q "
    "summands are 1e-6-quantized BIGINTs before every cross-segment "
    "sum (segment order cannot perturb the pooled estimate). Scale: "
    "one per-user rollup; everything after runs on <=3 rows. Ref: "
    "no reference counterpart — events tier.",
)
def q_events_meta_i2(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _UPLIFT_VAL),
                1,
            ).otherwise(0)
        ).alias("conv"),
    ).select(
        F.when(bucket < 50, "control").otherwise("treatment").alias("arm"),
        "n_events",
        "conv",
    )
    seg = u.select(
        F.when(F.col("n_events") < _UPLIFT_LO, "low")
        .when(F.col("n_events") < _UPLIFT_HI, "mid")
        .otherwise("high")
        .alias("segment"),
        "arm",
        "conv",
    )
    c = seg.groupBy("segment").agg(
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0))
        .cast("long").alias("n_t"),
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("long").alias("n_c"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("conv")).otherwise(0))
        .cast("long").alias("conv_t"),
        F.sum(F.when(F.col("arm") == "control", F.col("conv")).otherwise(0))
        .cast("long").alias("conv_c"),
    ).filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    pt = F.col("conv_t").cast("double") / F.col("n_t")
    pc = F.col("conv_c").cast("double") / F.col("n_c")
    eff = c.select(
        "segment",
        (pt - pc).alias("d"),
        (pt * (1.0 - pt) / F.col("n_t") + pc * (1.0 - pc) / F.col("n_c")).alias(
            "v"
        ),
    )
    ok = eff.filter(F.col("v") > 0).select(
        "segment", "d", (1.0 / F.col("v")).alias("w")
    )
    ok = ok.localCheckpoint(eager=False)  # pool + Q pass read it
    pool = ok.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum(F.round(F.col("w") * 1e6).cast("long")).cast("double") / 1e6)
        .alias("sw"),
        (
            F.sum(F.round(F.col("w") * F.col("d") * 1e6).cast("long"))
            .cast("double") / 1e6
        ).alias("swd"),
    )
    pooled = F.col("swd") / F.col("sw")
    q = (
        ok.crossJoin(F.broadcast(pool))
        .groupBy("k", pooled.alias("pooled"))
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("w")
                        * (F.col("d") - pooled)
                        * (F.col("d") - pooled)
                        * 1e6
                    ).cast("long")
                ).cast("double")
                / 1e6
            ).alias("qstat")
        )
    )
    return q.select(
        F.col("k").alias("k_segments"),
        (F.round("pooled", 6) + 0.0).alias("pooled_uplift"),
        (F.round("qstat", 6) + 0.0).alias("q_stat"),
        (
            F.round(
                F.greatest(
                    F.lit(0.0),
                    (F.col("qstat") - (F.col("k") - 1))
                    / F.nullif(F.col("qstat"), F.lit(0.0)),
                ),
                6,
            )
            + 0.0
        ).alias("i_squared"),
    )


_COINT_ADF_CRIT = -3.34  # MacKinnon asymptotic 5% for 2-variable EG step 2


@register(
    "q_timeseries_cointegration",
    family="timeseries",
    oracle=f"""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
    idx AS (
      SELECT d, CAST(date_diff('day', (SELECT min(d) FROM days), d)
                     AS BIGINT) AS tt
      FROM days
    ),
    cx AS (
      SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    cy AS (
      SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    grid AS (
      SELECT i.tt, coalesce(cx.x, 0) AS x, coalesce(cy.y, 0) AS y
      FROM idx i LEFT JOIN cx ON cx.d = i.d LEFT JOIN cy ON cy.d = i.d
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM grid
    ),
    fit AS (
      SELECT n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sx)
             / n AS a
      FROM st
    ),
    res AS (
      SELECT g.tt,
             CAST(round((g.y - f.a - f.b * g.x) * 1e6) AS HUGEINT) AS eq
      FROM grid g CROSS JOIN fit f
    ),
    df_ AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(p.eq * (r.eq - p.eq)) AS DOUBLE) AS sed,
             CAST(sum(p.eq * p.eq) AS DOUBLE) AS see,
             CAST(sum((r.eq - p.eq) * (r.eq - p.eq)) AS DOUBLE) AS sdd
      FROM res r JOIN res p ON p.tt = r.tt - 1
    ),
    adf AS (
      SELECT f.n, f.b, d.m,
             d.sed / d.see AS rho,
             (d.sed / d.see)
             / sqrt(((d.sdd - d.sed * d.sed / d.see) / (d.m - 1)) / d.see)
               AS t_adf
      FROM df_ d CROSS JOIN fit f
    )
    SELECT n AS n_days,
           round(b, 6) + 0.0 AS hedge_beta,
           round(rho, 6) + 0.0 AS resid_rho,
           round(t_adf, 6) + 0.0 AS adf_stat,
           t_adf < {_COINT_ADF_CRIT} AS cointegrated
    FROM adf
    """,
    doc="Engle-Granger cointegration test between the click and "
    "purchase daily LEVEL series: step 1 fits the long-run hedge "
    "(OLS y ~ x), step 2 runs a no-intercept Dickey-Fuller "
    "regression of the residual increments on the lagged residual — "
    "a stationary residual (t_adf below the MacKinnon asymptotic 5% "
    f"critical {_COINT_ADF_CRIT}) means the two series share a "
    "common stochastic trend, the do-these-metrics-move-together "
    "question q_timeseries_granger answers for INCREMENTS asked for "
    "LEVELS. Exactness: both regressions ride exact integer sums "
    "(residuals quantized to 1e-6 HUGEINT/DECIMAL before the "
    "quadratic DF sums); the t statistic is one float expression. "
    "Scale: two filtered combinable daily rollups; everything after "
    "runs on the <=366-row grid. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_cointegration(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("d")).distinct()
    days = days.localCheckpoint(eager=False)
    idx = days.crossJoin(F.broadcast(days.agg(F.min("d").alias("d0")))).select(
        "d", F.datediff(F.col("d"), F.col("d0")).cast("long").alias("tt")
    )

    def series(et, name):
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy(F.date_trunc("day", "ts").alias("d"))
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    grid = (
        idx.join(F.broadcast(series("click", "x")), "d", "left")
        .join(F.broadcast(series("purchase", "y")), "d", "left")
        .select(
            "tt",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    grid = grid.localCheckpoint(eager=False)  # fit + residual pass read it
    st = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b = (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    )
    fit = st.select(
        "n", b.alias("b"), ((F.col("sy").cast("double") - b * F.col("sx")) / nd).alias("a")
    )
    fit = fit.localCheckpoint(eager=False)  # residuals + output read it
    res = grid.crossJoin(F.broadcast(fit)).select(
        "tt",
        F.round((F.col("y") - F.col("a") - F.col("b") * F.col("x")) * 1e6)
        .cast("decimal(38,0)")
        .alias("eq"),
    )
    res = res.localCheckpoint(eager=False)  # both DF-join sides read it
    r, p = res.alias("r"), res.alias("p")
    dfr = r.join(
        F.broadcast(
            p.select(F.col("tt").alias("ptt"), F.col("eq").alias("peq"))
        ),
        F.col("ptt") == F.col("r.tt") - 1,
    ).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("peq") * (F.col("r.eq") - F.col("peq"))).cast("double").alias("sed"),
        F.sum(F.col("peq") * F.col("peq")).cast("double").alias("see"),
        F.sum((F.col("r.eq") - F.col("peq")) * (F.col("r.eq") - F.col("peq")))
        .cast("double").alias("sdd"),
    )
    rho = F.col("sed") / F.col("see")
    t_adf = rho / F.sqrt(
        ((F.col("sdd") - F.col("sed") * F.col("sed") / F.col("see")) / (F.col("m") - 1))
        / F.col("see")
    )
    return dfr.crossJoin(F.broadcast(fit.select("n", "b"))).select(
        F.col("n").alias("n_days"),
        (F.round("b", 6) + 0.0).alias("hedge_beta"),
        (F.round(rho, 6) + 0.0).alias("resid_rho"),
        (F.round(t_adf, 6) + 0.0).alias("adf_stat"),
        (t_adf < _COINT_ADF_CRIT).alias("cointegrated"),
    )


_SPC_SIGMAS = 3.0  # Shewhart limits


@register(
    "q_timeseries_spc_control",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM daily GROUP BY et
    ),
    lim AS (
      SELECT et, n,
             CAST(s1 AS DOUBLE) / n AS m,
             sqrt(CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
      FROM st
    ),
    flagged AS (
      SELECT d.et, d.d, d.c, l.n, l.m, l.sd,
             CASE WHEN d.c > l.m + {_SPC_SIGMAS} * l.sd
                    OR d.c < l.m - {_SPC_SIGMAS} * l.sd
                  THEN 1 ELSE 0 END AS ooc,
             CASE WHEN CAST(d.c AS DOUBLE) * st.n > st.s1 THEN 1 ELSE 0 END
               AS above
      FROM daily d JOIN lim l ON l.et = d.et JOIN st ON st.et = d.et
    ),
    runs AS (
      SELECT et, d, n, m, sd, ooc, above,
             CASE WHEN lag(above) OVER (PARTITION BY et ORDER BY d) IS NULL
                    OR lag(above) OVER (PARTITION BY et ORDER BY d) <> above
                  THEN 1 ELSE 0 END AS strt
      FROM flagged
    ),
    islands AS (
      SELECT et, n, m, sd, ooc,
             sum(strt) OVER (PARTITION BY et ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS run_id
      FROM runs
    ),
    runlen AS (
      SELECT et, run_id, CAST(count(*) AS BIGINT) AS len,
             max(n) AS n, max(m) AS m, max(sd) AS sd,
             CAST(sum(ooc) AS BIGINT) AS ooc
      FROM islands GROUP BY et, run_id
    )
    SELECT et AS event_type, CAST(max(n) AS BIGINT) AS n_days,
           round(max(m), 6) + 0.0 AS center,
           round(max(m) + {_SPC_SIGMAS} * max(sd), 6) + 0.0 AS ucl,
           round(max(m) - {_SPC_SIGMAS} * max(sd), 6) + 0.0 AS lcl,
           CAST(sum(ooc) AS BIGINT) AS n_out_of_control,
           CAST(max(len) AS BIGINT) AS max_run_one_side
    FROM runlen GROUP BY et ORDER BY event_type
    """,
    doc="Shewhart control chart per event type on the daily-count "
    f"series: center line, +/-{_SPC_SIGMAS} sigma limits, the count "
    "of out-of-control days (Western Electric rule 1) and the "
    "longest same-side-of-center run (the rule-4 drift signal) — "
    "the is-the-pipeline-in-control monitor a data-quality system "
    "runs per metric per day, complementing q_timeseries_cusum "
    "(which accumulates small shifts) with the classical big-shift "
    "chart. Exactness: limits come from exact integer (n, sum, "
    "sumsq); above-center is an integer cross-multiplication "
    "(c*n > sum — no float threshold); runs ride one partitioned "
    "lag + cumsum island pass over the calendar grid. Scale: one "
    "combinable daily rollup; every window partitions by series. "
    "Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_spc_control(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # stats + flag pass read it
    st = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(F.col("s2").cast("double") / F.col("n") - m * m)
    lim = st.select("et", "n", "s1", m.alias("m"), sd.alias("sd"))
    flagged = daily.join(F.broadcast(lim), "et").select(
        "et",
        "d",
        "n",
        "m",
        "sd",
        F.when(
            (F.col("c") > F.col("m") + _SPC_SIGMAS * F.col("sd"))
            | (F.col("c") < F.col("m") - _SPC_SIGMAS * F.col("sd")),
            1,
        ).otherwise(0).alias("ooc"),
        F.when(
            F.col("c").cast("double") * F.col("n") > F.col("s1"), 1
        ).otherwise(0).alias("above"),
    )
    wd = Window.partitionBy("et").orderBy("d")
    runs = flagged.select(
        "et",
        "d",
        "n",
        "m",
        "sd",
        "ooc",
        F.when(
            F.lag("above").over(wd).isNull()
            | (F.lag("above").over(wd) != F.col("above")),
            1,
        ).otherwise(0).alias("strt"),
    )
    wc = Window.partitionBy("et").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = runs.select(
        "et", "n", "m", "sd", "ooc", F.sum("strt").over(wc).alias("run_id")
    )
    runlen = islands.groupBy("et", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.max("sd").alias("sd"),
        F.sum("ooc").cast("long").alias("ooc"),
    )
    return (
        runlen.groupBy("et")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            (F.round(F.max("m"), 6) + 0.0).alias("center"),
            (F.round(F.max("m") + _SPC_SIGMAS * F.max("sd"), 6) + 0.0).alias(
                "ucl"
            ),
            (F.round(F.max("m") - _SPC_SIGMAS * F.max("sd"), 6) + 0.0).alias(
                "lcl"
            ),
            F.sum("ooc").cast("long").alias("n_out_of_control"),
            F.max("len").cast("long").alias("max_run_one_side"),
        )
        .select(
            F.col("et").alias("event_type"),
            "n_days",
            "center",
            "ucl",
            "lcl",
            "n_out_of_control",
            "max_run_one_side",
        )
        .orderBy("event_type")
    )


_POWER_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
_POWER_Z_BETA = 0.8416212335729143  # power = 0.80
_POWER_MDES = "0.01, 0.02, 0.05, 0.10"  # absolute rate lifts to detect


@register(
    "q_events_power_analysis",
    family="events",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                               1, 4)) AS BIGINT) % 100 < 50
                  THEN 'control' ELSE 'treatment' END AS arm,
             max(CASE WHEN event_type = 'purchase' AND value >= {_UPLIFT_VAL}
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_c,
             CAST(sum(conv) AS BIGINT) AS conv_c
      FROM u WHERE arm = 'control'
    ),
    grid AS (
      SELECT CAST(unnest([{_POWER_MDES}]) AS DOUBLE) AS mde
    ),
    calc AS (
      SELECT g.mde, b.n_c,
             CAST(b.conv_c AS DOUBLE) / b.n_c AS p1,
             CAST(b.conv_c AS DOUBLE) / b.n_c + g.mde AS p2
      FROM grid g CROSS JOIN base b
    )
    SELECT mde,
           round(p1, 6) + 0.0 AS baseline_rate,
           CAST(ceil(
             ({_POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2)
                                      * (1.0 - (p1 + p2) / 2))
              + {_POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
             * ({_POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2)
                                        * (1.0 - (p1 + p2) / 2))
                + {_POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
             / (mde * mde)) AS BIGINT) AS n_per_arm,
           CAST(ceil(
             ({_POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2)
                                      * (1.0 - (p1 + p2) / 2))
              + {_POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
             * ({_POWER_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2)
                                        * (1.0 - (p1 + p2) / 2))
                + {_POWER_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
             / (mde * mde)) AS BIGINT) <= n_c AS feasible_now
    FROM calc ORDER BY mde
    """,
    doc="Two-proportion power analysis over an MDE grid: from the "
    "OBSERVED control-arm conversion baseline (same md5 split and "
    "value-thresholded outcome as q_events_uplift), the required "
    "sample per arm to detect each absolute lift at alpha = 0.05 "
    "two-sided / 80% power (pooled-variance normal approximation — "
    "the standard pre-experiment sizing formula), plus whether the "
    "CURRENT arm already clears it — the before-you-launch companion "
    "to q_events_uplift's after-the-fact readout; together with "
    "q_events_sequential_msprt they cover the experiment lifecycle. "
    "Exactness: the baseline is one exact-integer division; z "
    "quantiles are exact literals; n_per_arm is one ceil'd float "
    "expression per grid row. Scale: one per-user rollup; the MDE "
    "grid is 4 literal rows. Ref: no reference counterpart — events "
    "tier.",
)
def q_events_power_analysis(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _UPLIFT_VAL),
                1,
            ).otherwise(0)
        ).alias("conv"),
    ).select(F.when(bucket < 50, "control").otherwise("treatment").alias("arm"), "conv")
    base = u.filter(F.col("arm") == "control").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("conv").cast("long").alias("conv_c"),
    )
    grid = spark.createDataFrame(
        [(float(x),) for x in _POWER_MDES.split(", ")], "mde double"
    )
    calc = grid.crossJoin(F.broadcast(base)).select(
        "mde",
        "n_c",
        (F.col("conv_c").cast("double") / F.col("n_c")).alias("p1"),
        (F.col("conv_c").cast("double") / F.col("n_c") + F.col("mde")).alias("p2"),
    )
    pbar = (F.col("p1") + F.col("p2")) / 2
    root = F.lit(_POWER_Z_ALPHA) * F.sqrt(2.0 * pbar * (1.0 - pbar)) + F.lit(
        _POWER_Z_BETA
    ) * F.sqrt(
        F.col("p1") * (1.0 - F.col("p1")) + F.col("p2") * (1.0 - F.col("p2"))
    )
    n_req = F.ceil(root * root / (F.col("mde") * F.col("mde"))).cast("long")
    return calc.select(
        "mde",
        (F.round("p1", 6) + 0.0).alias("baseline_rate"),
        n_req.alias("n_per_arm"),
        (n_req <= F.col("n_c")).alias("feasible_now"),
    ).orderBy("mde")


# ---------------------------------------------------------------------------
# Round-10 wave 4: timeseries diagnostics on the daily grid (Pettitt
# changepoint, Lo-MacKinlay variance ratio, turning-point randomness,
# Dickey-Fuller unit root, KPSS stationarity, permutation entropy). Same
# grid discipline as the r9 wave: one combinable daily rollup per series,
# windows and joins bounded by the <=366-row grid, exact integer
# sufficient statistics, identical float expression trees.
# ---------------------------------------------------------------------------

from .aggregates import _erfc_sql  # noqa: E402 — shared p-value kernel


@register(
    "q_timeseries_pettitt",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    pos AS (
      SELECT et, d, c,
             CAST(row_number() OVER (PARTITION BY et ORDER BY d) AS BIGINT)
               AS rn,
             2 * rank() OVER (PARTITION BY et ORDER BY c)
               + count(*) OVER (PARTITION BY et, c) - 1 AS dmr
      FROM daily
    ),
    nn AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY et),
    u AS (
      SELECT p.et, p.rn, p.d, nn.n,
             CAST(sum(p.dmr) OVER (PARTITION BY p.et ORDER BY p.rn
                    ROWS UNBOUNDED PRECEDING) - p.rn * (nn.n + 1)
                  AS BIGINT) AS ut
      FROM pos p JOIN nn ON nn.et = p.et
    ),
    best AS (
      SELECT et, n, rn, d, abs(ut) AS aut,
             row_number() OVER (PARTITION BY et
                                ORDER BY abs(ut) DESC, rn) AS r
      FROM u WHERE rn < n
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
           CAST(aut AS BIGINT) AS k_stat,
           d AS change_day,
           round(least(1.0, 2.0 * exp(-6.0 * CAST(aut AS DOUBLE) * aut
                 / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 6)
             + 0.0 AS p_value
    FROM best WHERE r = 1 ORDER BY event_type
    """,
    doc="Pettitt rank changepoint test per event type on the daily "
    "count series: U_t = sum_(i<=t) dmr_i - t(n+1) (the doubled-"
    "midrank identity keeps U_t an exact BIGINT under ties — the "
    "kruskal discipline on the time axis), K = max|U_t|, change day "
    "= the argmax (earliest under the (|U| DESC, position) total "
    "order), p = min(1, 2 exp(-6K^2/(n^3+n^2))) — the standard "
    "Pettitt approximation as ONE float expression. The "
    "nonparametric single-changepoint locator beside "
    "q_timeseries_changepoint's variance-reduction scan: Pettitt "
    "needs no normality and resists outliers. Scale: one combinable "
    "daily rollup; rank/cumsum windows and the argmax all ride the "
    "<=366-row per-series grid. Ref: no reference counterpart — "
    "timeseries tier.",
)
def q_timeseries_pettitt(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # pos + nn read it
    dmr = (
        2 * F.rank().over(Window.partitionBy("et").orderBy("c"))
        + F.count(F.lit(1)).over(Window.partitionBy("et", "c"))
        - 1
    )
    pos = daily.select(
        "et",
        "d",
        "c",
        F.row_number().over(Window.partitionBy("et").orderBy("d")).cast("long").alias("rn"),
        dmr.alias("dmr"),
    )
    nn = daily.groupBy("et").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wcum = (
        Window.partitionBy("et").orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    )
    u = pos.join(F.broadcast(nn), "et").select(
        "et",
        "rn",
        "d",
        "n",
        (F.sum("dmr").over(wcum) - F.col("rn") * (F.col("n") + 1))
        .cast("long")
        .alias("ut"),
    )
    wbest = Window.partitionBy("et").orderBy(F.col("aut").desc(), "rn")
    best = (
        u.filter(F.col("rn") < F.col("n"))
        .select("et", "n", "rn", "d", F.abs(F.col("ut")).alias("aut"))
        .withColumn("r", F.row_number().over(wbest))
        .filter(F.col("r") == 1)
    )
    nd = F.col("n").cast("double")
    pv = F.least(
        F.lit(1.0),
        2.0
        * F.exp(
            -6.0 * F.col("aut").cast("double") * F.col("aut") / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
        ),
    )
    return best.select(
        F.col("et").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        F.col("aut").cast("long").alias("k_stat"),
        F.col("d").alias("change_day"),
        (F.round(pv, 6) + 0.0).alias("p_value"),
    ).orderBy("event_type")


_VR_Q = 5  # variance-ratio horizon (trading-week convention)


@register(
    "q_timeseries_variance_ratio",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY et, d
    ),
    pos AS (
      SELECT et, y,
             CAST(row_number() OVER (PARTITION BY et ORDER BY d) AS BIGINT)
               AS rn
      FROM daily
    ),
    d1 AS (
      SELECT a.et, a.y - b.y AS dx
      FROM pos a JOIN pos b ON b.et = a.et AND b.rn = a.rn - 1
    ),
    dq AS (
      SELECT a.et, a.y - b.y AS dx
      FROM pos a JOIN pos b ON b.et = a.et AND b.rn = a.rn - {_VR_Q}
    ),
    s1 AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dx) AS BIGINT) AS s,
             CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS ss
      FROM d1 GROUP BY et
    ),
    sq AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dx) AS BIGINT) AS s,
             CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS ss
      FROM dq GROUP BY et
    ),
    vr AS (
      SELECT s1.et, s1.n AS n1,
             ((CAST(sq.ss AS DOUBLE) - CAST(sq.s AS DOUBLE) * sq.s / sq.n)
              / sq.n)
             / ({_VR_Q} * (CAST(s1.ss AS DOUBLE)
                           - CAST(s1.s AS DOUBLE) * s1.s / s1.n) / s1.n)
               AS vrq
      FROM s1 JOIN sq ON sq.et = s1.et
    ),
    z AS (
      SELECT et, n1, vrq,
             (vrq - 1.0) / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                                / (3.0 * {_VR_Q} * n1)) AS zval
      FROM vr
    )
    SELECT et AS event_type, CAST(n1 AS BIGINT) AS n_returns,
           round(vrq, 6) + 0.0 AS variance_ratio,
           round(zval, 6) + 0.0 AS z,
           round({_erfc_sql("abs(zval) / 1.4142135623730951")}, 6) + 0.0
             AS p_value
    FROM z ORDER BY event_type
    """,
    doc=f"Lo-MacKinlay variance ratio VR(q={_VR_Q}) per event type on "
    "the daily cent-total level series: Var(q-day differences)/"
    "(q*Var(1-day differences)) — 1 under a random walk, <1 mean-"
    "reverting, >1 trending; the random-walk diagnostic that "
    "complements q_timeseries_hurst's long-memory exponent at a "
    "fixed horizon. Both difference populations are exact BIGINTs "
    "(level series is a cent sum), their variances ride exact "
    "(n, sum, HUGEINT sum-of-squares) — population variances of the "
    "overlapping-difference sets (the simplified estimator, "
    "documented; the unbiased-overlap corrections move the 3rd "
    "digit), z uses the homoskedastic asymptotic variance "
    "2(2q-1)(q-1)/(3qn) and two-sided p rides the shared erfc "
    "kernel. Scale: one combinable daily rollup; the lag joins ride "
    "the <=366-row grid. Ref: no reference counterpart — timeseries "
    "tier.",
)
def q_timeseries_variance_ratio(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y")
    )
    pos = daily.select(
        "et",
        "y",
        F.row_number().over(Window.partitionBy("et").orderBy("d")).cast("long").alias("rn"),
    )
    pos = pos.localCheckpoint(eager=False)  # all four join sides read it

    def diffs(lag):
        a, b = pos.alias("a"), pos.alias("b")
        return a.join(
            b,
            (F.col("b.et") == F.col("a.et")) & (F.col("b.rn") == F.col("a.rn") - lag),
        ).select(F.col("a.et").alias("et"), (F.col("a.y") - F.col("b.y")).alias("dx"))

    def stats(df):
        return df.groupBy("et").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dx").cast("long").alias("s"),
            F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dx"))
            .cast("decimal(38,0)")
            .alias("ss"),
        )

    s1 = stats(diffs(1))
    sq = stats(diffs(_VR_Q)).select(
        F.col("et").alias("qet"),
        F.col("n").alias("qn"),
        F.col("s").alias("qs"),
        F.col("ss").alias("qss"),
    )
    var1 = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / F.col("n")
    varq = (
        F.col("qss").cast("double")
        - F.col("qs").cast("double") * F.col("qs") / F.col("qn")
    ) / F.col("qn")
    vr = (
        s1.join(sq, F.col("qet") == F.col("et"))
        .select("et", F.col("n").alias("n1"), (varq / (_VR_Q * var1)).alias("vrq"))
    )
    zval = (F.col("vrq") - 1.0) / F.sqrt(
        2.0 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3.0 * _VR_Q * F.col("n1"))
    )
    z = vr.select("et", "n1", "vrq", zval.alias("zval"))
    return z.select(
        F.col("et").alias("event_type"),
        F.col("n1").cast("long").alias("n_returns"),
        (F.round("vrq", 6) + 0.0).alias("variance_ratio"),
        (F.round("zval", 6) + 0.0).alias("z"),
        (
            F.round(F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")), 6) + 0.0
        ).alias("p_value"),
    ).orderBy("event_type")


@register(
    "q_timeseries_turning_points",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    pos AS (
      SELECT et, c,
             CAST(row_number() OVER (PARTITION BY et ORDER BY d) AS BIGINT)
               AS rn,
             lag(c) OVER (PARTITION BY et ORDER BY d) AS pc,
             lead(c) OVER (PARTITION BY et ORDER BY d) AS nc
      FROM daily
    ),
    tp AS (
      SELECT et, CAST(max(rn) AS BIGINT) AS n,
             CAST(sum(CASE WHEN (pc < c AND nc < c) OR (pc > c AND nc > c)
                           THEN 1 ELSE 0 END) AS BIGINT) AS tpts
      FROM pos GROUP BY et
    ),
    z AS (
      SELECT et, n, tpts,
             (tpts - 2.0 * (n - 2) / 3.0)
               / sqrt((16.0 * n - 29.0) / 90.0) AS zval
      FROM tp
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
           CAST(tpts AS BIGINT) AS n_turning_points,
           round(2.0 * (n - 2) / 3.0, 6) + 0.0 AS expected,
           round(zval, 6) + 0.0 AS z,
           round({_erfc_sql("abs(zval) / 1.4142135623730951")}, 6) + 0.0
             AS p_value
    FROM z ORDER BY event_type
    """,
    doc="Turning-point randomness test per event type on the daily "
    "count series: count strict local maxima+minima (ties break "
    "neither way — a tie is no turning point, documented), compare "
    "to the i.i.d. null E = 2(n-2)/3, Var = (16n-29)/90, two-sided "
    "p via the shared erfc kernel. Too FEW turning points = trend/"
    "persistence, too MANY = alternation/negative autocorrelation — "
    "the distribution-free companion to q_timeseries_runs_test "
    "(runs dichotomize around a level; turning points read local "
    "shape). Counting is exact integers via lag/lead windows on the "
    "per-series grid; z is one float expression. Scale: one "
    "combinable daily rollup; windows on the <=366-row grid. Ref: "
    "no reference counterpart — timeseries tier.",
)
def q_timeseries_turning_points(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("et").orderBy("d")
    pos = daily.select(
        "et",
        "c",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("c").over(w).alias("pc"),
        F.lead("c").over(w).alias("nc"),
    )
    is_tp = (
        ((F.col("pc") < F.col("c")) & (F.col("nc") < F.col("c")))
        | ((F.col("pc") > F.col("c")) & (F.col("nc") > F.col("c")))
    )
    tp = pos.groupBy("et").agg(
        F.max("rn").cast("long").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("long").alias("tpts"),
    )
    zval = (F.col("tpts") - 2.0 * (F.col("n") - 2) / 3.0) / F.sqrt(
        (16.0 * F.col("n") - 29.0) / 90.0
    )
    z = tp.select("et", "n", "tpts", zval.alias("zval"))
    return z.select(
        F.col("et").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        F.col("tpts").cast("long").alias("n_turning_points"),
        (F.round(2.0 * (F.col("n") - 2) / 3.0, 6) + 0.0).alias("expected"),
        (F.round("zval", 6) + 0.0).alias("z"),
        (
            F.round(F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")), 6) + 0.0
        ).alias("p_value"),
    ).orderBy("event_type")


@register(
    "q_timeseries_dickey_fuller",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY et, d
    ),
    pos AS (
      SELECT et, y,
             CAST(row_number() OVER (PARTITION BY et ORDER BY d) AS BIGINT)
               AS rn
      FROM daily
    ),
    pairs AS (
      SELECT a.et, b.y AS x, a.y - b.y AS dy
      FROM pos a JOIN pos b ON b.et = a.et AND b.rn = a.rn - 1
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * dy) AS HUGEINT) AS sxy
      FROM pairs GROUP BY et
    ),
    fit AS (
      SELECT et, n, sx, sxx,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                * sx) / n AS a
      FROM st
    ),
    res AS (
      SELECT p.et, f.n, f.sx, f.sxx, f.b,
             CAST(sum(CAST(round((p.dy - f.a - f.b * p.x) * 1e6) AS HUGEINT)
                      * CAST(round((p.dy - f.a - f.b * p.x) * 1e6) AS HUGEINT))
                  AS DOUBLE) / 1e12 AS sse
      FROM pairs p JOIN fit f ON f.et = p.et
      GROUP BY p.et, f.n, f.sx, f.sxx, f.b
    ),
    tt AS (
      SELECT et, n, b,
             b / sqrt((sse / (n - 2))
                      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n))
               AS tstat
      FROM res
    )
    SELECT et AS event_type, CAST(n AS BIGINT) AS n_obs,
           round(b, 6) + 0.0 AS gamma,
           round(tstat, 6) + 0.0 AS df_stat,
           tstat < -3.43 AS stationary_1pct,
           tstat < -2.86 AS stationary_5pct
    FROM tt ORDER BY event_type
    """,
    doc="Dickey-Fuller unit-root test per event type on the daily "
    "cent-total level series: regress dy_t = a + gamma*y_(t-1), "
    "t-statistic of gamma against the DF critical values -3.43 (1%) "
    "and -2.86 (5%) as literal flags — the DF distribution is "
    "nonstandard, so NO p-value is emitted (the tukey/dunn "
    "critical-literal precedent; the flags are the decision). "
    "gamma significantly negative = mean-reverting (stationary), "
    "gamma ~ 0 = unit root/random walk — the formal complement to "
    "q_timeseries_variance_ratio at horizon 1 and the "
    "should-you-difference gate before any ARIMA-style model. "
    "Exactness: the q_agg_ols discipline (exact BIGINT/HUGEINT "
    "cross sums; residuals quantized 1e-6 and HUGEINT-squared so "
    "day order cannot perturb SSE); the lag pairs ride the "
    "<=366-row grid. Scale: one combinable daily rollup, constant "
    "tail per series. Ref: no reference counterpart — timeseries "
    "tier.",
)
def q_timeseries_dickey_fuller(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y")
    )
    pos = daily.select(
        "et",
        "y",
        F.row_number().over(Window.partitionBy("et").orderBy("d")).cast("long").alias("rn"),
    )
    pos = pos.localCheckpoint(eager=False)  # both lag-join sides read it
    a, b = pos.alias("a"), pos.alias("b")
    pairs = a.join(
        b, (F.col("b.et") == F.col("a.et")) & (F.col("b.rn") == F.col("a.rn") - 1)
    ).select(
        F.col("a.et").alias("et"),
        F.col("b.y").alias("x"),
        (F.col("a.y") - F.col("b.y")).alias("dy"),
    )
    pairs = pairs.localCheckpoint(eager=False)  # st + residual pass read it
    st = pairs.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("dy"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    bexp = (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    )
    fit = st.select(
        "et",
        "n",
        "sx",
        "sxx",
        bexp.alias("b"),
        ((F.col("sy").cast("double") - bexp * F.col("sx")) / nd).alias("a"),
    )
    eq = F.round((F.col("dy") - F.col("a") - F.col("b") * F.col("x")) * 1e6).cast(
        "decimal(38,0)"
    )
    res = (
        pairs.join(F.broadcast(fit), "et")
        .groupBy("et", "n", "sx", "sxx", "b")
        .agg((F.sum(eq * eq).cast("double") / 1e12).alias("sse"))
    )
    tstat = F.col("b") / F.sqrt(
        (F.col("sse") / (F.col("n") - 2))
        / (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
    )
    tt = res.select("et", "n", "b", tstat.alias("tstat"))
    return tt.select(
        F.col("et").alias("event_type"),
        F.col("n").cast("long").alias("n_obs"),
        (F.round("b", 6) + 0.0).alias("gamma"),
        (F.round("tstat", 6) + 0.0).alias("df_stat"),
        (F.col("tstat") < -3.43).alias("stationary_1pct"),
        (F.col("tstat") < -2.86).alias("stationary_5pct"),
    ).orderBy("event_type")


@register(
    "q_timeseries_kpss",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY et, d
    ),
    nn AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
      FROM daily GROUP BY et
    ),
    e AS (
      -- scaled residual e' = n*y - sum(y) is an EXACT BIGINT (the true
      -- residual times n); eta is scale-free in e', so no float mean
      SELECT d2.et, d2.d, nn.n,
             CAST(nn.n * d2.y - nn.sy AS BIGINT) AS ep
      FROM daily d2 JOIN nn ON nn.et = d2.et
    ),
    s AS (
      SELECT et, n, ep,
             CAST(sum(ep) OVER (PARTITION BY et ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS sp
      FROM e
    ),
    eta AS (
      SELECT et, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(sp * sp) AS DOUBLE)
               / (max(n) * CAST(sum(CAST(ep AS HUGEINT) * ep) AS DOUBLE))
               AS eta
      FROM s GROUP BY et
    )
    SELECT et AS event_type, n AS n_days,
           round(eta, 6) + 0.0 AS kpss_stat,
           eta > 0.463 AS nonstationary_5pct
    FROM eta ORDER BY event_type
    """,
    doc="KPSS level-stationarity statistic per event type on the daily "
    "cent-total series: eta = sum_t S_t^2 / (n^2 sigma^2) with S_t "
    "the partial sums of demeaned values and sigma^2 the short-run "
    "(l=0) variance — algebraically reduced to the ALL-INTEGER ratio "
    "sum(S'^2) / (n * sum(e'^2)) where e' = n*y - sum(y) (scaling by "
    "n clears the float mean; eta is scale-invariant), so the whole "
    "statistic is ONE float division of exact HUGEINT sums. Flagged "
    "against the 5% critical value 0.463 (literal; the KPSS "
    "distribution is nonstandard — the dickey_fuller convention). "
    "KPSS's null is STATIONARITY where DF's null is the unit root: "
    "running both brackets the truth (DF rejects + KPSS accepts = "
    "confidently stationary). Scale: one combinable daily rollup; "
    "the partial-sum window rides the <=366-row grid. Ref: no "
    "reference counterpart — timeseries tier.",
)
def q_timeseries_kpss(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y")
    )
    daily = daily.localCheckpoint(eager=False)  # nn + e read it
    nn = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    e = daily.join(F.broadcast(nn), "et").select(
        "et",
        "d",
        "n",
        (F.col("n") * F.col("y") - F.col("sy")).cast("long").alias("ep"),
    )
    w = Window.partitionBy("et").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    s = e.select(
        "et", "n", "ep", F.sum("ep").over(w).cast("decimal(38,0)").alias("sp")
    )
    eta = s.groupBy("et").agg(
        F.max("n").cast("long").alias("n"),
        (
            F.sum(F.col("sp") * F.col("sp")).cast("double")
            / (
                F.max("n")
                * F.sum(F.col("ep").cast("decimal(38,0)") * F.col("ep")).cast("double")
            )
        ).alias("eta"),
    )
    return eta.select(
        F.col("et").alias("event_type"),
        F.col("n").alias("n_days"),
        (F.round("eta", 6) + 0.0).alias("kpss_stat"),
        (F.col("eta") > 0.463).alias("nonstationary_5pct"),
    ).orderBy("event_type")


@register(
    "q_timeseries_permutation_entropy",
    family="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    pat AS (
      SELECT et,
             concat(
               CASE WHEN c < lead(c, 1) OVER w THEN '<'
                    WHEN c = lead(c, 1) OVER w THEN '=' ELSE '>' END,
               CASE WHEN lead(c, 1) OVER w < lead(c, 2) OVER w THEN '<'
                    WHEN lead(c, 1) OVER w = lead(c, 2) OVER w THEN '='
                    ELSE '>' END,
               CASE WHEN c < lead(c, 2) OVER w THEN '<'
                    WHEN c = lead(c, 2) OVER w THEN '=' ELSE '>' END
             ) AS pattern,
             lead(c, 2) OVER w IS NOT NULL AS complete
      FROM daily WINDOW w AS (PARTITION BY et ORDER BY d)
    ),
    pc AS (
      SELECT et, pattern, CAST(count(*) AS BIGINT) AS cnt
      FROM pat WHERE complete GROUP BY et, pattern
    ),
    tot AS (SELECT et, CAST(sum(cnt) AS BIGINT) AS n FROM pc GROUP BY et),
    h AS (
      SELECT pc.et, tot.n,
             CAST(count(*) AS BIGINT) AS n_patterns,
             CAST(sum(CAST(round(-1e9 * (CAST(cnt AS DOUBLE) / tot.n)
                   * ln(CAST(cnt AS DOUBLE) / tot.n)) AS BIGINT)) AS DOUBLE)
               / 1e9 AS ent
      FROM pc JOIN tot ON tot.et = pc.et
      GROUP BY pc.et, tot.n
    )
    SELECT et AS event_type, n AS n_windows, n_patterns,
           round(ent, 6) + 0.0 AS perm_entropy,
           round(ent / ln(13.0), 6) + 0.0 AS perm_entropy_norm
    FROM h ORDER BY event_type
    """,
    doc="Permutation entropy (order 3) per event type on the daily "
    "count series: each 3-day window maps to its ordinal pattern — "
    "encoded as the three pairwise comparison signs (t vs t+1, t+1 "
    "vs t+2, t vs t+2), which handles TIES deterministically where "
    "classic rank patterns would need a tie-break rule — and H = "
    "-sum p ln p over the pattern distribution measures series "
    "complexity: low H = regular/predictable (trend, strict "
    "alternation), high H = noise-like; normalized by ln(13), the "
    "count of ordinal outcomes of 3 elements with ties (Fubini "
    "number a(3)=13), so 1.0 = maximally irregular. Per-pattern "
    "p ln p terms quantized 1e-9 and BIGINT-summed (the "
    "q_agg_entropy discipline). Band-Pompe permutation entropy is "
    "the standard model-free complexity screen before fitting any "
    "seasonal/AR structure. Scale: one combinable daily rollup; "
    "lead windows + a <=13-row pattern rollup per series on the "
    "grid. Ref: no reference counterpart — timeseries tier.",
)
def q_timeseries_permutation_entropy(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("et").orderBy("d")
    c0, c1, c2 = F.col("c"), F.lead("c", 1).over(w), F.lead("c", 2).over(w)

    def sign(x, y):
        return F.when(x < y, "<").when(x == y, "=").otherwise(">")

    pat = daily.select(
        "et",
        F.concat(sign(c0, c1), sign(c1, c2), sign(c0, c2)).alias("pattern"),
        c2.isNotNull().alias("complete"),
    )
    pc = (
        pat.filter("complete")
        .groupBy("et", "pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pc = pc.localCheckpoint(eager=False)  # tot + h read it
    tot = pc.groupBy("et").agg(F.sum("cnt").cast("long").alias("n"))
    p = F.col("cnt").cast("double") / F.col("n")
    h = (
        pc.join(F.broadcast(tot), "et")
        .groupBy("et", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_patterns"),
            (F.sum(F.round(-1e9 * p * F.log(p)).cast("long")).cast("double") / 1e9).alias(
                "ent"
            ),
        )
    )
    return h.select(
        F.col("et").alias("event_type"),
        F.col("n").alias("n_windows"),
        "n_patterns",
        (F.round("ent", 6) + 0.0).alias("perm_entropy"),
        (F.round(F.col("ent") / F.log(F.lit(13.0)), 6) + 0.0).alias(
            "perm_entropy_norm"
        ),
    ).orderBy("event_type")


@register(
    "q_events_srm",
    family="events",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                         AS INTEGER) % 100 < 50 THEN 'control'
               ELSE 'treatment'
             END AS arm
      FROM events
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
             CAST(count(*) AS BIGINT) AS n
      FROM u
    ),
    z AS (
      SELECT nc, n - nc AS nt, n,
             (nc - CAST(n AS DOUBLE) / 2) / sqrt(CAST(n AS DOUBLE) / 4)
               AS zval
      FROM c
    )
    SELECT nc AS n_control, CAST(nt AS BIGINT) AS n_treatment,
           round(CAST(n AS DOUBLE) / 2, 1) + 0.0 AS expected_each,
           round(zval, 6) + 0.0 AS z,
           round({_erfc_sql("abs(zval) / 1.4142135623730951")}, 6) + 0.0
             AS p_value,
           {_erfc_sql("abs(zval) / 1.4142135623730951")} < 0.001 AS srm_alarm
    FROM z
    """,
    doc="Sample-ratio-mismatch check on q_events_ab_assign's 50/50 "
    "md5-bucket split: exact binomial z = (n_c - N/2)/sqrt(N/4) on "
    "DISTINCT USERS, two-sided p via the shared erfc kernel, alarm "
    "at the industry p < 0.001 threshold — the invalidity gate every "
    "experiment readout (uplift, CUPED, mSPRT, power) must pass "
    "FIRST: an SRM means assignment or logging is broken and every "
    "downstream metric is untrustworthy. The alarm branches on the "
    "same erfc expression both engines. Scale: one distinct-user "
    "rollup into three scalars. Ref: no reference counterpart — "
    "experimentation tier.",
)
def q_events_srm(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    u = ev.select(
        "user_id", F.when(bucket < 50, "control").otherwise("treatment").alias("arm")
    ).distinct()
    c = u.agg(
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    zval = (F.col("nc") - F.col("n").cast("double") / 2) / F.sqrt(
        F.col("n").cast("double") / 4
    )
    z = c.select("nc", (F.col("n") - F.col("nc")).alias("nt"), "n", zval.alias("zval"))
    return z.select(
        F.col("nc").alias("n_control"),
        F.col("nt").cast("long").alias("n_treatment"),
        (F.round(F.col("n").cast("double") / 2, 1) + 0.0).alias("expected_each"),
        (F.round("zval", 6) + 0.0).alias("z"),
        (
            F.round(F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")), 6) + 0.0
        ).alias("p_value"),
        (
            F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")) < 0.001
        ).alias("srm_alarm"),
    )


@register(
    "q_events_lorenz_users",
    family="events",
    oracle="""
    WITH uc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT c,
             CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS nu,
             CAST(sum(c) OVER () AS BIGINT) AS tot,
             CAST(sum(c) OVER (ORDER BY c, user_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumc
      FROM uc
    ),
    dec AS (
      -- decile of the ranked user list by the integer rule
      -- ceil(10*rn/nu) = floor((10*rn + nu - 1)/nu)
      SELECT CAST((10 * rn + nu - 1) // nu AS BIGINT) AS decile,
             c, nu, tot, cumc, rn
      FROM ranked
    ),
    g AS (
      -- exact Gini from the rank identity:
      -- G = (2*sum(rn*c) - (n+1)*sum(c)) / (n*sum(c))
      SELECT CAST(sum(rn * c) AS BIGINT) AS src,
             CAST(max(nu) AS BIGINT) AS nu, CAST(max(tot) AS BIGINT) AS tot
      FROM ranked
    )
    SELECT d.decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(d.c) AS BIGINT) AS n_events,
           round(CAST(sum(d.c) AS DOUBLE) / max(d.tot), 6) + 0.0 AS share,
           round(CAST(max(d.cumc) AS DOUBLE) / max(d.tot), 6) + 0.0
             AS cum_share,
           round((2.0 * g.src - (CAST(g.nu AS DOUBLE) + 1) * g.tot)
                 / (CAST(g.nu AS DOUBLE) * g.tot), 6) + 0.0 AS gini_users
    FROM dec d CROSS JOIN g
    GROUP BY d.decile, g.src, g.nu, g.tot
    ORDER BY d.decile
    """,
    doc="Lorenz concentration of event volume across USERS: users "
    "ranked ascending by activity (total order (count, user_id)), "
    "split into deciles by the integer rule ceil(10*rn/n), per-decile "
    "event share + cumulative share, plus the exact rank-identity "
    "Gini G = (2*sum(rn*c) - (n+1)*sum(c))/(n*sum(c)) repeated on "
    "every row — the whale-dependence readout (q_agg_gini profiles "
    "VALUE inequality; this profiles the user base behind every "
    "per-user metric: if decile 10 is 60% of volume, every 'average "
    "user' number is a fiction). Everything is exact integers until "
    "the final divisions. Scale: one per-user combinable rollup; the "
    "global rank is the TWO-PASS q_sort_global_rank core (range-"
    "repartition + partition-local row_number + broadcast offsets — "
    "never a single-reducer window over users); the only window runs "
    "on the <=10-row decile table. Ref: no reference counterpart — "
    "events tier.",
)
def q_events_lorenz_users(spark, sf_dir):
    from .sorts_sets import global_rank

    ev = t(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # two-pass distributed rank (the q_sort_global_rank core) — a bare
    # row_number() over all users is a single-reducer window, dead at
    # billions of users
    ranked = global_rank(uc, F.col("c"), F.col("user_id"))
    ranked = ranked.localCheckpoint(eager=False)  # tots + dec + g read it
    tots = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("rank") * F.col("c")).cast("long").alias("src"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tots))
        .select(
            ((10 * F.col("rank") + F.col("nu") - 1) / F.col("nu"))
            .cast("long")
            .alias("decile"),
            "c",
            "nu",
            "tot",
            "src",
        )
        .groupBy("decile", "nu", "tot", "src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
        )
    )
    # the cumulative share window runs over the <=10-row decile table
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    gini = (
        2.0 * F.col("src") - (F.col("nu").cast("double") + 1) * F.col("tot")
    ) / (F.col("nu").cast("double") * F.col("tot"))
    return (
        dec.select(
            "decile",
            "n_users",
            "n_events",
            (F.round(F.col("n_events").cast("double") / F.col("tot"), 6) + 0.0).alias(
                "share"
            ),
            (
                F.round(
                    F.sum("n_events").over(wd).cast("double") / F.col("tot"), 6
                )
                + 0.0
            ).alias("cum_share"),
            (F.round(gini, 6) + 0.0).alias("gini_users"),
        )
        .orderBy("decile")
    )


@register(
    "q_timeseries_page_trend",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type AS et,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY d, et
    ),
    days AS (SELECT DISTINCT d FROM daily),
    ets AS (
      SELECT et, CAST(row_number() OVER (ORDER BY et) AS BIGINT) AS j
      FROM (SELECT DISTINCT et FROM daily)
    ),
    grid AS (
      SELECT days.d, ets.et, ets.j, coalesce(daily.v, 0) AS v
      FROM days CROSS JOIN ets
      LEFT JOIN daily ON daily.d = days.d AND daily.et = ets.et
    ),
    rk AS (
      SELECT d, et, j,
             2 * rank() OVER (PARTITION BY d ORDER BY v)
               + count(*) OVER (PARTITION BY d, v) - 1 AS dmr
      FROM grid
    ),
    rj AS (
      SELECT et, CAST(max(j) AS BIGINT) AS j,
             CAST(sum(dmr) AS BIGINT) AS r2
      FROM rk GROUP BY et
    ),
    bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM days),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ets),
    l AS (SELECT CAST(sum(j * r2) AS BIGINT) AS l2 FROM rj),
    z AS (
      SELECT bb.b, kk.k, l.l2,
             (l.l2 - CAST(bb.b AS DOUBLE) * kk.k * (kk.k + 1) * (kk.k + 1)
                     / 2.0)
             / sqrt(CAST(bb.b AS DOUBLE) * kk.k * kk.k * (kk.k + 1)
                    * (CAST(kk.k AS DOUBLE) * kk.k - 1) / 36.0) AS zval
      FROM bb CROSS JOIN kk CROSS JOIN l
    )
    SELECT b AS b_days, k AS k_groups,
           round(CAST(l2 AS DOUBLE) / 2, 1) + 0.0 AS page_l,
           round(zval, 6) + 0.0 AS z,
           round({_erfc_sql("abs(zval) / 1.4142135623730951")}, 6) + 0.0
             AS p_value
    FROM z
    """,
    doc="Page's trend test on q_agg_friedman's day x type block design "
    "under the alphabetical treatment ordering (the deterministic "
    "stand-in; the machinery is the operator): L = sum_j j*R_j over "
    "within-day ranks — Friedman asks 'do treatments differ', Page "
    "asks 'do they differ in THIS order', gaining power against "
    "ordered alternatives exactly as jonckheere does over kruskal "
    "for unblocked data. DOUBLED ranks keep L2 = 2L an exact BIGINT "
    "under ties; E[L2] = bk(k+1)^2/2 and Var[L2] = "
    "bk^2(k+1)(k^2-1)/36 are single float expressions; two-sided p "
    "via the shared erfc kernel. Scale: one (day,type) rollup; rank "
    "windows on the <=366xk grid; constant tail. Ref: no reference "
    "counterpart — timeseries tier.",
)
def q_timeseries_page_trend(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), F.col("event_type").alias("et")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("v"))
    daily = daily.localCheckpoint(eager=False)  # grid + domains read it
    days = daily.select("d").distinct()
    ets = (
        daily.select("et")
        .distinct()
        .select("et", F.row_number().over(Window.orderBy("et")).cast("long").alias("j"))
    )
    grid = (
        days.crossJoin(F.broadcast(ets))
        .join(daily, ["d", "et"], "left")
        .select("d", "et", "j", F.coalesce("v", F.lit(0)).alias("v"))
    )
    dmr = (
        2 * F.rank().over(Window.partitionBy("d").orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("d", "v"))
        - 1
    )
    rk = grid.select("d", "et", "j", dmr.alias("dmr"))
    rj = rk.groupBy("et").agg(
        F.max("j").cast("long").alias("j"), F.sum("dmr").cast("long").alias("r2")
    )
    bb = days.agg(F.count(F.lit(1)).cast("long").alias("b"))
    kk = ets.agg(F.count(F.lit(1)).cast("long").alias("k"))
    ll = rj.agg(F.sum(F.col("j") * F.col("r2")).cast("long").alias("l2"))
    bd, kd = F.col("b").cast("double"), F.col("k").cast("double")
    zval = (
        F.col("l2") - bd * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1) / 2.0
    ) / F.sqrt(
        bd * F.col("k") * F.col("k") * (F.col("k") + 1) * (kd * F.col("k") - 1) / 36.0
    )
    z = bb.crossJoin(kk).crossJoin(ll).select("b", "k", "l2", zval.alias("zval"))
    return z.select(
        F.col("b").alias("b_days"),
        F.col("k").alias("k_groups"),
        (F.round(F.col("l2").cast("double") / 2, 1) + 0.0).alias("page_l"),
        (F.round("zval", 6) + 0.0).alias("z"),
        (
            F.round(F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")), 6) + 0.0
        ).alias("p_value"),
    )


@register(
    "q_events_journey_entropy",
    family="events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    rowt AS (
      SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM trans
      GROUP BY prev_type
    ),
    hrow AS (
      SELECT t.prev_type, r.tot,
             CAST(sum(CAST(round(-1e9 * (CAST(t.n AS DOUBLE) / r.tot)
                   * ln(CAST(t.n AS DOUBLE) / r.tot)) AS BIGINT)) AS DOUBLE)
               / 1e9 AS h
      FROM trans t JOIN rowt r ON r.prev_type = t.prev_type
      GROUP BY t.prev_type, r.tot
    ),
    gt AS (SELECT CAST(sum(tot) AS BIGINT) AS g FROM rowt)
    SELECT hrow.prev_type AS state,
           hrow.tot AS n_transitions,
           round(hrow.h, 6) + 0.0 AS state_entropy,
           round(CAST(sum(CAST(round(1e9 * (CAST(h2.tot AS DOUBLE) / gt.g)
                     * h2.h) AS BIGINT)) AS DOUBLE) / 1e9, 6) + 0.0
             AS entropy_rate
    FROM hrow CROSS JOIN gt
    CROSS JOIN hrow h2
    GROUP BY hrow.prev_type, hrow.tot, hrow.h, gt.g
    ORDER BY state
    """,
    doc="Markov entropy rate of user journeys: per-state transition "
    "entropy H(next|state) = -sum p ln p over q_events_markov's "
    "transition rows, plus the chain's entropy rate sum_i pi_i H_i "
    "(pi = empirical state occupancy) repeated on every row — the "
    "PREDICTABILITY number behind the transition matrix (near 0 = "
    "deterministic funnels, near ln(k) = users wander uniformly; "
    "the single scalar to monitor for behavior drift where "
    "q_text_jsd_drift monitors token drift). Per-cell p ln p and "
    "per-state pi*H terms are quantized 1e-9 and BIGINT-summed "
    "(the q_agg_entropy discipline, applied at both levels). "
    "Scale: one user-partitioned lag window (the markov shuffle), "
    "then everything runs on the <=k^2-row transition table. Ref: "
    "no reference counterpart — events tier.",
)
def q_events_journey_entropy(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    trans = trans.localCheckpoint(eager=False)  # rowt + hrow read it
    rowt = trans.groupBy("prev_type").agg(F.sum("n").cast("long").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    hrow = (
        trans.join(rowt, "prev_type")
        .groupBy("prev_type", "tot")
        .agg(
            (
                F.sum(F.round(-1e9 * p * F.log(p)).cast("long")).cast("double")
                / 1e9
            ).alias("h")
        )
    )
    hrow = hrow.localCheckpoint(eager=False)  # read as both sides below
    gt = rowt.agg(F.sum("tot").cast("long").alias("g"))
    h2 = hrow.select(
        F.col("tot").alias("tot2"), F.col("h").alias("hh")
    )
    rate_term = F.round(
        1e9 * (F.col("tot2").cast("double") / F.col("g")) * F.col("hh")
    ).cast("long")
    return (
        hrow.crossJoin(F.broadcast(gt))
        .crossJoin(h2)
        .groupBy("prev_type", "tot", "h", "g")
        .agg((F.sum(rate_term).cast("double") / 1e9).alias("rate"))
        .select(
            F.col("prev_type").alias("state"),
            F.col("tot").alias("n_transitions"),
            (F.round("h", 6) + 0.0).alias("state_entropy"),
            (F.round("rate", 6) + 0.0).alias("entropy_rate"),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# Round-10 wave 14: EWMA control chart (the small-shift complement to
# q_timeseries_spc_control's Shewhart chart).
# ---------------------------------------------------------------------------

_EWC_L = 0.2     # EWMA lambda
_EWC_LAGS = 30   # (1-L)^30 ~ 0.0012 — bounded-EWMA truncation tail
_EWC_K = 3.0     # control-limit width


def _ewc_terms():
    """(weight_k for k=0..LAGS) of the bounded EWMA."""
    return [(k, _EWC_L * (1 - _EWC_L) ** k) for k in range(_EWC_LAGS + 1)]


def _ewc_sql() -> str:
    num = []
    den = []
    for k, wt in _ewc_terms():
        if k == 0:
            num.append(f"c * {wt!r}")
            den.append(f"{wt!r}")
        else:
            num.append(f"coalesce(lag(c, {k}) OVER win, 0) * {wt!r}")
            den.append(
                f"(CASE WHEN lag(c, {k}) OVER win IS NULL THEN 0.0 ELSE {wt!r} END)"
            )
    return f"(({' + '.join(num)}) / ({' + '.join(den)}))"


@register(
    "q_timeseries_ewma_control",
    family="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY et, d
    ),
    st AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
      FROM daily GROUP BY et
    ),
    z AS (
      SELECT et, d, c,
             CAST(row_number() OVER win AS BIGINT) AS rn,
             {_ewc_sql()} AS z
      FROM daily
      WINDOW win AS (PARTITION BY et ORDER BY d)
    ),
    flags AS (
      SELECT z.et, st.n,
             abs(z.z - CAST(st.s AS DOUBLE) / st.n)
             / (sqrt((CAST(st.ss AS DOUBLE) - CAST(st.s AS DOUBLE) * st.s / st.n)
                     / (st.n - 1))
                * sqrt({_EWC_L!r} / (2.0 - {_EWC_L!r})
                       * (1.0 - power({(1 - _EWC_L) ** 2!r}, z.rn))))
               AS zscore
      FROM z JOIN st ON st.et = z.et
    )
    SELECT et AS event_type, CAST(max(n) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN zscore > {_EWC_K!r} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_of_control,
           round(max(zscore), 6) + 0.0 AS max_zscore
    FROM flags GROUP BY et ORDER BY event_type
    """,
    doc="EWMA control chart per event type on the daily count series "
    f"(lambda = {_EWC_L}, L = {_EWC_K}-sigma limits): the bounded "
    "EWMA of q_timeseries_ewma applied to process control — Shewhart "
    "(q_timeseries_spc_control) catches LARGE isolated shifts, the "
    "EWMA chart accumulates evidence and catches small SUSTAINED "
    "drifts (~0.5-1 sigma) far sooner; running both is standard SPC "
    "practice. z_t is a fixed renormalized lag combination (exact "
    "integer counts x literal weights, the q_timeseries_ewma "
    "contract — no recurrence), the time-varying limit "
    "sigma*sqrt(lambda/(2-lambda)(1-(1-lambda)^2t)) is one identical "
    "float expression (the asymptotic-variance form; the bounded "
    "truncation tail ~0.1% is common-mode both engines), and sigma "
    "rides exact (n, sum, HUGEINT sum-of-squares). Emits per-series "
    "out-of-control day counts + the worst z-score. Scale: one "
    "combinable daily rollup; lag windows on the <=366-row grid; "
    "constant tail. Ref: no reference counterpart — timeseries "
    "tier.",
)
def q_timeseries_ewma_control(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    daily = daily.localCheckpoint(eager=False)  # st + z read it
    st = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    w = Window.partitionBy("et").orderBy("d")
    num = F.col("c") * F.lit(_ewc_terms()[0][1])
    den = F.lit(_ewc_terms()[0][1])
    for k, wt in _ewc_terms()[1:]:
        lagv = F.lag("c", k).over(w)
        num = num + F.coalesce(lagv, F.lit(0)) * F.lit(wt)
        den = den + F.when(lagv.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    z = daily.select(
        "et",
        "d",
        "c",
        F.row_number().over(w).cast("long").alias("rn"),
        (num / den).alias("z"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sig = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    lim = sig * F.sqrt(
        F.lit(_EWC_L / (2.0 - _EWC_L))
        * (1.0 - F.pow(F.lit((1 - _EWC_L) ** 2), F.col("rn")))
    )
    flags = z.join(st, "et").select(
        "et", "n", (F.abs(F.col("z") - mu) / lim).alias("zscore")
    )
    return (
        flags.groupBy("et")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.sum(F.when(F.col("zscore") > _EWC_K, 1).otherwise(0))
            .cast("long")
            .alias("n_out_of_control"),
            (F.round(F.max("zscore"), 6) + 0.0).alias("max_zscore"),
        )
        .select(
            F.col("et").alias("event_type"),
            "n_days",
            "n_out_of_control",
            "max_zscore",
        )
        .orderBy("event_type")
    )
