"""Window functions (SURVEY.md §2B windows).

All window orderings carry a unique tie-break key so results are
deterministic and identical across engines. Running float sums are
rounded: DuckDB computes windowed sums with segment trees, Spark with
sequential accumulation — same math, different FP association.

Scale note: a window over partitionBy(k) is one shuffle on k. Keys here
(customer, user, brand, segment) are high-cardinality, so partitions
stay balanced; skewed key domains would call for pre-aggregation or
two-level windowing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_window_rank",
    family="windows",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 25
    """,
    doc="rank/dense_rank/row_number per partition, top-25 per segment.",
)
def q_window_rank(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 25)
    )


@register(
    "q_window_running",
    family="windows",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
    doc="Running sum per customer (ROWS unbounded-preceding→current).",
)
def q_window_running(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


@register(
    "q_window_lag",
    family="windows",
    oracle="""
    SELECT user_id, event_id, ts,
           round(value - lag(value) OVER w, 6) AS value_delta,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_to_next_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead analytics: per-user event deltas and inter-event gaps.",
)
def q_window_lag(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("gap_to_next_us"),
    )


@register(
    "q_window_range_frame",
    family="windows",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           count(*) OVER (
             PARTITION BY p_brand ORDER BY p_retailprice
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_cheaper_near,
           round(sum(p_retailprice) OVER (
             PARTITION BY p_brand ORDER BY p_retailprice
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS near_price_sum
    FROM part
    """,
    doc="RANGE frame over a numeric ordering (value-based moving window).",
)
def q_window_range_frame(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rangeBetween(-5, Window.currentRow)
    )
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.count("*").over(w).alias("n_cheaper_near"),
        F.round(F.sum("p_retailprice").over(w), 2).alias("near_price_sum"),
    )


@register(
    "q_window_ntile",
    family="windows",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    """,
    doc="ntile quartile bucketing per segment.",
)
def q_window_ntile(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment", "c_custkey", F.ntile(4).over(w).alias("bal_quartile")
    )


@register(
    "q_window_distribution",
    family="windows",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6)    AS cd,
           nth_value(o_orderkey, 3) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution analytics: percent_rank / cume_dist / nth_value "
    "per priority class (rank-normalized position — the building block "
    "for per-group percentile filtering). One keyed shuffle + "
    "partition-local sort; deterministic total order via the "
    "(totalprice, orderkey) tie-break.",
)
def q_window_distribution(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_cheapest"),
    )


@register(
    "q_window_islands",
    family="windows",
    oracle="""
    WITH hourly AS (
      SELECT DISTINCT user_id,
             datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                      date_trunc('hour', ts)) AS hr
      FROM events
    ),
    tagged AS (
      SELECT user_id, hr,
             hr - row_number() OVER (PARTITION BY user_id ORDER BY hr)
               AS island
      FROM hourly
    )
    SELECT user_id,
           CAST(min(hr) AS BIGINT)  AS start_hr,
           CAST(max(hr) AS BIGINT)  AS end_hr,
           count(*)                 AS n_hours
    FROM tagged
    GROUP BY user_id, island
    """,
    doc="Gaps-and-islands: per user, maximal streaks of consecutive "
    "active hours via the classic value-minus-row_number trick — "
    "consecutive hours share (hr - rn), one grouped count per island. "
    "Entirely integer arithmetic against a fixed anchor (no epoch/"
    "timezone dependence), so cross-engine exact. The window "
    "partitions by user_id — millions of small per-user partitions "
    "spread across the cluster, never a global sort; the dedup, the "
    "window, and the island groupBy all share the user_id hash "
    "partitioning, which AQE coalesces to back-to-back stages with "
    "one real exchange.",
)
def q_window_islands(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = ev.select(
        "user_id",
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00',"
            " date_trunc('hour', ts))"
        ).alias("hr"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    tagged = hourly.withColumn("island", F.col("hr") - F.row_number().over(w))
    return (
        tagged.groupBy("user_id", "island")
        .agg(
            F.min("hr").cast("bigint").alias("start_hr"),
            F.max("hr").cast("bigint").alias("end_hr"),
            F.count("*").alias("n_hours"),
        )
        .drop("island")
    )


@register(
    "q_window_running_distinct",
    family="windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, ts, event_id, event_type,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    ORDER BY user_id, ts, event_id
    LIMIT 5000
    """,
    doc="Running DISTINCT count per user (how many distinct event "
    "types has each user produced so far) — neither engine supports "
    "count(DISTINCT) over an ordered window, so it is rewritten as "
    "first-occurrence flag (row_number over (user, type) = 1) + "
    "running SUM of the flag: exact, incremental, and window-able. "
    "Scale: both windows hash-partition by user_id (the second "
    "reuses the first's exchange — (user_id, event_type) is a "
    "refinement, Spark re-sorts without re-shuffling only when "
    "partitioning matches; here pass 1 keys by (user,type) so one "
    "exchange each, both keyed — no global window anywhere). State "
    "per row is O(1), unlike a naive collect_set-over-window whose "
    "per-row set grows with history.",
)
def q_window_running_distinct(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(5000)
    )


@register(
    "q_window_rolling_features",
    family="windows",
    oracle="""
    SELECT user_id, ts, event_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') OVER h24
                AS BIGINT) AS purchases_24h,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2))
                    END) OVER h24 AS DOUBLE) AS spend_24h,
           CAST(count(*) OVER d7 AS BIGINT) AS events_7d
    FROM events
    WINDOW
      h24 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
      d7 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    LIMIT 5000
    """,
    doc="Point-in-time rolling feature aggregates — the feature-store "
    "primitive (trailing 24h purchase count/spend, trailing 7d "
    "activity) computed per event with NO future leakage: RANGE "
    "frames over event-time microseconds, so each row sees exactly "
    "the interval ending at itself regardless of event spacing (a "
    "ROWS frame would leak or starve on irregular series). Sums ride "
    "exact decimals (cent-quantized values) — no rounding needed. "
    "Scale: one user_id exchange shared by both frames; RANGE frame "
    "state is the in-window slice per user — bounded by event rate x "
    "window span, the same bound a streaming watermark version "
    "carries.",
)
def q_window_rolling_features(spark, sf_dir):
    e = t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    h24 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-86400000000, Window.currentRow)
    )
    d7 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-604800000000, Window.currentRow)
    )
    is_buy = F.col("event_type") == "purchase"
    vdec = F.col("value").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.sum(F.when(is_buy, 1).otherwise(0)).over(h24).cast("long").alias("purchases_24h"),
            F.sum(F.when(is_buy, vdec).otherwise(zero)).over(h24).cast("double").alias("spend_24h"),
            F.count("*").over(d7).cast("long").alias("events_7d"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(5000)
    )


@register(
    "q_window_drawdown",
    family="windows",
    oracle="""
    WITH series AS (
      SELECT user_id, ts, event_id,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100) AS BIGINT)
                 ELSE -CAST(round(value * 100) AS BIGINT) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM events
    ),
    dd AS (
      SELECT user_id, cum_cents,
             max(cum_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS peak_cents
      FROM series
    )
    SELECT user_id,
           CAST(max(peak_cents) AS BIGINT) AS peak_cents,
           CAST(max(peak_cents - cum_cents) AS BIGINT) AS max_drawdown_cents
    FROM dd
    GROUP BY user_id
    """,
    doc="Maximum drawdown per user over a signed cumulative-value "
    "series (purchases add, everything else subtracts — a stand-in "
    "P&L): running sum → running peak → max(peak − current). The "
    "canonical path-dependent financial statistic, computed with "
    "three ROWS-frame windows sharing ONE user_id sort (Spark "
    "collapses same-spec windows into a single Window exec). Every "
    "value is exact integer cents — no float anywhere, bitwise "
    "trivially. Scale: one keyed exchange, O(1) frame state.",
)
def q_window_drawdown(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    signed = F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = e.select(
        "user_id", "ts", "event_id", F.sum(signed).over(w).alias("cum_cents")
    )
    dd = series.select(
        "user_id",
        "cum_cents",
        F.max("cum_cents").over(w).alias("peak_cents"),
    )
    return dd.groupBy("user_id").agg(
        F.max("peak_cents").cast("long").alias("peak_cents"),
        F.max(F.col("peak_cents") - F.col("cum_cents"))
        .cast("long")
        .alias("max_drawdown_cents"),
    )


@register(
    "q_window_regr_slope",
    family="windows",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(ts AS DATE) - DATE '2020-01-01' AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER w AS BIGINT)        AS n_7d,
             CAST(sum(x) OVER w AS BIGINT)          AS sx,
             CAST(sum(y) OVER w AS BIGINT)          AS sy,
             CAST(sum(x * y) OVER w AS BIGINT)      AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT)      AS sxx
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY x
                   RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id, n_7d,
           CASE WHEN n_7d * sxx - sx * sx > 0 THEN
             round((CAST(n_7d AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n_7d AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                   6)
           END AS slope_cents_per_day
    FROM s ORDER BY user_id, ts, event_id
    LIMIT 5000
    """,
    doc="Per-event trailing-7-day OLS spend-trend slope — the "
    "point-in-time trend feature (is this user's spend rising or "
    "falling?) that churn/propensity models consume, with NO future "
    "leakage. x is an exact integer day index, y exact cents; the "
    "five sufficient statistics (n, Sx, Sy, Sxy, Sxx) are windowed "
    "integer sums over ONE shared RANGE frame (7 preceding days on "
    "the day index), so every engine sums the same integers — the "
    "slope is then a single float division of exact integers, NULL "
    "when the frame has no x-variance (all purchases same day). "
    "This is the windowed sibling of q_agg_ols: same closed form, "
    "per-row frames instead of one global fit. Scale: one user-keyed "
    "exchange shared by all five sums (same window spec collapses "
    "into a single WindowExec); frame state is the in-window slice, "
    "bounded by purchase rate x 7 days.",
)
def q_window_regr_slope(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = e.select(
        "user_id",
        "ts",
        "event_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2020-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rangeBetween(-7, Window.currentRow)
    )
    s = p.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n_7d"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = F.when(
        n * sxx - sx * sx > 0,
        F.round(
            (n.cast("double") * sxy - sx.cast("double") * sy)
            / (n.cast("double") * sxx - sx.cast("double") * sx),
            6,
        ),
    )
    return (
        s.select(
            "user_id",
            "ts",
            "event_id",
            "n_7d",
            slope.alias("slope_cents_per_day"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(5000)
    )


@register(
    "q_window_alert_debounce",
    family="windows",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM seq
    WHERE prev_type IS NULL OR prev_type <> event_type
    ORDER BY user_id, ts, event_id
    """,
    doc="Alert debounce / state-change suppression: per user, emit an "
    "event only when its type DIFFERS from the previous one — the "
    "monitoring-pipeline primitive that turns a firing-alert firehose "
    "into state transitions (and the same lag-compare shape as CDC "
    "change suppression on audit logs). One lag window per user "
    "partition with a total order (ts, event_id) so ties are "
    "deterministic; first event always emits (NULL prev). Scale: one "
    "hash shuffle on user_id, window runs inside each user's "
    "partition (bounded per-user history), output shrinks to the "
    "transition count — map-side nothing, but nothing global either.",
)
def q_window_alert_debounce(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "ts", "event_type")
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "q_window_pareto",
    family="windows",
    oracle="""
    WITH srev AS (
      SELECT n.n_name, l.l_suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name, l.l_suppkey
    ),
    ranked AS (
      SELECT n_name, cents,
             sum(cents) OVER (
               PARTITION BY n_name ORDER BY cents DESC, l_suppkey
               ROWS UNBOUNDED PRECEDING
             ) AS cum,
             sum(cents) OVER (PARTITION BY n_name) AS tot
      FROM srev
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CASE WHEN (cum - cents) * 5 < tot * 4 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_top80,
           round(CAST(sum(CASE WHEN (cum - cents) * 5 < tot * 4
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS top80_frac
    FROM ranked GROUP BY n_name ORDER BY n_name
    """,
    doc="Pareto concentration cut per nation: how many suppliers carry "
    "80% of revenue — the 'is this market 80/20' readout behind "
    "vendor-risk and inventory ABC analysis. The crossing test is "
    "ALL-INTEGER: a supplier is inside the top-80 set iff the "
    "cumulative cents BEFORE it are under 4/5 of the total "
    "((cum−cents)·5 < tot·4 — no float shares anywhere); only the "
    "final fraction divides. Scale: one supplier-rollup shuffle, then "
    "windows partitioned by nation over supplier-count-bounded "
    "groups; both window specs share one Exchange.",
)
def q_window_pareto(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w_cum = Window.partitionBy("n_name").orderBy(
        F.col("cents").desc(), "l_suppkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy("n_name")
    inside = (F.col("cum") - F.col("cents")) * 5 < F.col("tot") * 4
    return (
        srev.withColumn("cum", F.sum("cents").over(w_cum))
        .withColumn("tot", F.sum("cents").over(w_tot))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.sum(F.when(inside, 1).otherwise(0)).cast("long").alias("n_top80"),
            F.round(
                F.sum(F.when(inside, 1).otherwise(0)).cast("double") / F.count("*"), 6
            ).alias("top80_frac"),
        )
        .orderBy("n_name")
    )


_PEAK_MIN = 3  # a peak must be at least this many events in the hour


@register(
    "q_window_peak_detect",
    family="windows",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, 2
    ),
    x AS (
      SELECT user_id, h, n,
             lag(n)  OVER (PARTITION BY user_id ORDER BY h) AS prev_n,
             lead(n) OVER (PARTITION BY user_id ORDER BY h) AS next_n
      FROM hourly
    )
    SELECT user_id, h AS hour, n AS n_events,
           CAST(n - greatest(coalesce(prev_n, 0), coalesce(next_n, 0))
             AS BIGINT) AS prominence
    FROM x
    WHERE n >= {_PEAK_MIN}
      AND (prev_n IS NULL OR n > prev_n)
      AND (next_n IS NULL OR n >= next_n)
    ORDER BY user_id, hour
    """,
    doc="Local-maximum peak detection over each user's hourly activity "
    "series: an hour is a peak when it strictly beats its predecessor, "
    "is >= its successor (the tie rule keeps exactly the FIRST hour of "
    "a plateau, a total decision on integers), and clears a floor of "
    f"{_PEAK_MIN} events — the burst-detector primitive behind rate "
    "alerting and engagement-spike mining, complementary to "
    "q_events_anomaly's z-score (shape, not deviation). Prominence is "
    "the integer margin over the taller neighbor. Exactness: counts "
    "and comparisons are all integers — nothing to round. Scale: one "
    "combinable hourly rollup, then lag/lead over (user, hour) — "
    "one shuffle on user_id, series bounded by the calendar. Note the "
    "gap semantics: neighbors are ADJACENT OBSERVED hours (empty hours "
    "are absent, not zero) — q_timeseries_gapfill is the zero-filled "
    "front-end when true adjacency matters. Ref: no reference "
    "counterpart — timeseries/alerting tier.",
)
def q_window_peak_detect(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy("h")
    x = hourly.select(
        "user_id",
        "h",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return (
        x.filter(
            (F.col("n") >= _PEAK_MIN)
            & (F.col("prev_n").isNull() | (F.col("n") > F.col("prev_n")))
            & (F.col("next_n").isNull() | (F.col("n") >= F.col("next_n")))
        )
        .select(
            "user_id",
            F.col("h").alias("hour"),
            F.col("n").alias("n_events"),
            (
                F.col("n")
                - F.greatest(
                    F.coalesce(F.col("prev_n"), F.lit(0)),
                    F.coalesce(F.col("next_n"), F.lit(0)),
                )
            )
            .cast("long")
            .alias("prominence"),
        )
        .orderBy("user_id", "hour")
    )
