"""Joins (SURVEY.md §2B joins).

Scale notes per query in docstrings: broadcast for dimension tables,
sort-merge with AQE skew handling for fact-fact joins, and banded /
windowed strategies for the non-equi shapes so nothing degenerates to a
cartesian product at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_join_broadcast",
    family="joins",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
    doc="Dimension equi-join, explicitly broadcast: `part` is tiny "
    "relative to `lineitem` at every SF, so we ship the dim to every "
    "executor and avoid shuffling the 100 TB fact side entirely.",
)
def q_join_broadcast(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "q_join_shuffle",
    family="joins",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc="Fact-fact equi-join: sort-merge on the join key; AQE splits "
    "skewed key ranges at runtime. Both sides shuffle exactly once on "
    "l_orderkey/o_orderkey.",
)
def q_join_shuffle(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "q_join_multiway",
    family="joins",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(o.o_orderkey)         AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_sales
    FROM customer c
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="4-table star join: tiny dims (nation/region) broadcast; the "
    "single real shuffle is orders⋈customer. Catalyst reorders so "
    "broadcasts happen after the selective join.",
)
def q_join_multiway(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
        )
    )


@register(
    "q_join_left",
    family="joins",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left outer join preserving customers with no orders.",
)
def q_join_left(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total_spend"),
        )
    )


@register(
    "q_join_full",
    family="joins",
    oracle="""
    WITH ue AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    )
    SELECT coalesce(c.c_custkey, ue.user_id) AS entity_id,
           CASE WHEN c.c_custkey IS NULL THEN 'event_only'
                WHEN ue.user_id IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence,
           coalesce(ue.n_events, 0) AS n_events
    FROM customer c FULL OUTER JOIN ue ON c.c_custkey = ue.user_id
    """,
    doc="Full outer join: event actors vs customer dimension, keeping "
    "unmatched rows from both sides.",
)
def q_join_full(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    ue = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    j = c.join(ue, c.c_custkey == ue.user_id, "full")
    return j.select(
        F.coalesce("c_custkey", "user_id").alias("entity_id"),
        F.when(F.col("c_custkey").isNull(), "event_only")
        .when(F.col("user_id").isNull(), "customer_only")
        .otherwise("both")
        .alias("presence"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@register(
    "q_join_semi",
    family="joins",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="Left-semi join (EXISTS): ships only the join key of the probe "
    "side; no fact columns cross the shuffle.",
)
def q_join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    family="joins",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers that never ordered.",
)
def q_join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_theta_range",
    family="joins",
    oracle="""
    SELECT s.s_suppkey,
           count(*) AS n_near_customers,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_near_bal
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
    GROUP BY s.s_suppkey
    """,
    doc="Non-equi band join (value within ±100). Naive Spark executes "
    "the raw theta predicate as broadcast-nested-loop — O(n*m) compares "
    "and dead at 100 TB with two large sides — so this query is DEFINED "
    "by the theta predicate but EXECUTED banded: both sides bucket by "
    "floor(bal/100), the probe side replicates into buckets ±1, the "
    "join is a hash equi-join on the bucket id, and the exact predicate "
    "is re-applied (functions.range_join.banded_range_join; identical "
    "semantics, pinned BNLJ-free by tests/test_plans.py). "
    "q_join_range_banded below applies the same strategy to a big x big "
    "event-time range join where no side is broadcastable.",
)
def q_join_theta_range(spark, sf_dir):
    from ..functions.range_join import banded_range_join

    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = t(spark, sf_dir, "customer").select("c_acctbal")
    return (
        banded_range_join(c, s, "c_acctbal", "s_acctbal", 100.0)
        .groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_near_customers"),
            # decimal sum is exact (order-insensitive), so the single FP
            # division is bitwise-identical to the oracle's — round(avg,6)
            # over doubles was not (summation order flipped the 6th decimal)
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_near_bal"),
        )
    )


@register(
    "q_join_asof",
    family="joins",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             CAST(epoch_us(p.p_ts) - epoch_us(c.c_ts) AS BIGINT) AS gap_us,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
    )
    SELECT p_id, user_id, c_id AS last_click_id, c_value AS last_click_value,
           gap_us
    FROM ranked WHERE rn = 1
    """,
    doc="As-of join: for each purchase, the latest click at-or-before it "
    "per user (backward as-of, ties broken by event_id). Implemented as "
    "equi-join on user + time inequality + per-left row_number()=1 — "
    "Spark has no native ASOF. Scale path: repartition by user, "
    "sortWithinPartitions(ts), mapInPandas merge-scan (pandas "
    "merge_asof per partition) to avoid the quadratic pair blow-up.",
)
def q_join_asof(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    j = p.join(c, (p.user_id == c.c_user) & (c.c_ts <= p.p_ts))
    w = Window.partitionBy("p_id").orderBy(F.col("c_ts").desc(), F.col("c_id").desc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_id",
            "user_id",
            F.col("c_id").alias("last_click_id"),
            F.col("c_value").alias("last_click_value"),
            (
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("c_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


@register(
    "q_join_range_banded",
    family="joins",
    oracle="""
    SELECT p.event_id AS p_id,
           count(*) AS n_near_clicks,
           round(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS near_click_value
    FROM events p
    JOIN events c
      ON c.event_type = 'click'
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 1800000000
                            AND epoch_us(p.ts) + 1800000000
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="Big x big time-range join — the case banding exists for: every "
    "purchase joined to ALL clicks (any user) within ±30 min. Neither "
    "side is a broadcastable dim at scale, so nested-loop is not an "
    "option; both sides bucket by floor(epoch_us/width), purchases "
    "replicate into buckets ±1, hash equi-join on the bucket, exact "
    "integer-microsecond predicate re-applied. One keyed shuffle, each "
    "row meets only rows within one band. Same banded_range_join "
    "helper as q_join_theta_range; exact decimal sum keeps the float "
    "aggregate order-insensitive for the oracle hash.",
)
def q_join_range_banded(spark, sf_dir):
    from ..functions.range_join import banded_range_join

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so this matches
        # the oracle's epoch_us() on the naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"), "value"
    )
    return (
        banded_range_join(p, c, "p_us", "c_us", 1800000000.0)
        .groupBy("p_id")
        .agg(
            F.count("*").alias("n_near_clicks"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("near_click_value"),
        )
    )


@register(
    "q_join_cross",
    family="joins",
    oracle="""
    SELECT r.r_name, n.n_name,
           (r.r_regionkey * 100 + n.n_nationkey) AS pair_code
    FROM region r CROSS JOIN nation n
    """,
    doc="Cartesian product (small inputs only — guarded by design).",
)
def q_join_cross(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") * 100 + F.col("n_nationkey")).alias("pair_code"),
    )


@register(
    "q_join_salted",
    family="joins",
    oracle="""
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Salted shuffle join (functions.skew.salted_join): lineitem "
    "salted per-row, orders replicated x8, join on (orderkey, salt) — "
    "the rewrite for ONE monster key that AQE cannot split and a dim "
    "too big to broadcast. The oracle is the PLAIN join+agg: salting "
    "must be a pure physical rewrite with identical results.",
)
def q_join_salted(spark, sf_dir):
    from ..functions.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, ["l_orderkey"], n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM {orders} o
WHERE o.o_totalprice >= (
    SELECT max(o2.o_totalprice) FROM {orders} o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


@register(
    "q_sql_correlated",
    family="joins",
    oracle=_CORR_SQL.format(orders="orders"),
    doc="Correlated scalar subquery — per customer, the order(s) at "
    "that customer's max price, written as ANSI SQL with the subquery "
    "referencing the outer row. Catalyst DECORRELATES it: the inner "
    "max() becomes one grouped aggregate joined back on o_custkey, so "
    "execution is two scans + one shuffle join, never a per-row "
    "re-scan (the naive nested-loop reading would be O(n·groups) and "
    "dead at 100 TB). max() is exact on doubles — no summation, no "
    "rounding, bitwise cross-engine. The identical SQL string runs on "
    "DuckDB as the oracle, pinning the engine's SQL-surface parity, "
    "not just the DataFrame API.",
)
def q_sql_correlated(spark, sf_dir):
    from ._util import t as _t

    _t(spark, sf_dir, "orders").createOrReplaceTempView("mis_corr_orders")
    return spark.sql(_CORR_SQL.format(orders="mis_corr_orders"))


@register(
    "q_join_null_safe",
    family="joins",
    oracle="""
    WITH ev AS (
      SELECT event_id, nullif(event_type, 'error') AS k, value
      FROM events
    ),
    dim AS (
      SELECT DISTINCT k, coalesce(k, '(none)') AS label FROM ev
    )
    SELECT d.label,
           count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE), 4)
             AS sum_value
    FROM ev e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.label
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): rows whose "
    "join key is NULL still match the NULL dim row instead of "
    "silently dropping — the semantics every enrichment join against "
    "a dimension with an 'unknown' bucket needs ('error' events here "
    "null out their type and must land in '(none)'). Spark plans "
    "eqNullSafe as a HASH join on the null-safe key wrapper, not a "
    "cartesian fallback, so it shuffles and broadcasts exactly like a "
    "plain equi-join at 100 TB.",
)
def q_join_null_safe(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("k"),
        "value",
    )
    dim = ev.select(
        "k", F.coalesce(F.col("k"), F.lit("(none)")).alias("label")
    ).distinct()
    e, d = ev.alias("e"), dim.alias("d")
    return (
        e.join(F.broadcast(d), F.col("e.k").eqNullSafe(F.col("d.k")))
        .groupBy("d.label")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("e.value").cast("decimal(28,10)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )


@register(
    "q_join_interval_overlap",
    family="joins",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             o_orderdate AS a_s,
             (o_orderdate + INTERVAL 7 DAY)::DATE AS a_e
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-02-01'
    ),
    b AS (
      SELECT l_orderkey, l_linenumber,
             l_shipdate AS b_s,
             (l_shipdate + INTERVAL (1 + l_suppkey % 14) DAY)::DATE AS b_e
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-02-01'
    )
    SELECT a.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(date_diff('day', greatest(a_s, b_s), least(a_e, b_e)))
                AS BIGINT) AS overlap_days
    FROM a JOIN b ON a_s < b_e AND b_s < a_e
    GROUP BY a.o_orderkey
    """,
    doc="UNKEYED interval-overlap join (interval × interval, not the "
    "point-in-range shape of q_join_range_banded): order fulfillment "
    "windows [orderdate, +7d) × shipment transit windows [shipdate, "
    "+1..14d), pairs that overlap in time. No equi-key exists, so the "
    "naive plan is a cartesian product; instead both interval sets are "
    "exploded onto a 7-day epoch-week grid (an interval lands in every "
    "week it touches — bounded fan-out: ≤2 buckets for A, ≤3 for B), "
    "the join becomes an equi-join on the week bucket, the exact "
    "overlap predicate filters residually, and the report-once rule "
    "(only the week containing the overlap start emits a pair) makes "
    "dedup a MAP-SIDE filter instead of a distinct() shuffle over the "
    "joined stream. This is the 1-D version of "
    "the spatial grid join (q_sim_spatial_join): shuffle volume is "
    "O(intervals × spanned weeks), never O(|A|·|B|), and the grid "
    "width tunes fan-out vs bucket selectivity at 100 TB.",
)
def q_join_interval_overlap(spark, sf_dir):
    epoch_week = lambda d: F.floor(F.datediff(d, F.lit("1970-01-01")) / 7)  # noqa: E731
    a = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-02-01")
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("a_s"),
            F.date_add("o_orderdate", 7).alias("a_e"),
        )
    )
    b = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-02-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("b_s"),
            F.expr("date_add(l_shipdate, int(1 + l_suppkey % 14))").alias("b_e"),
        )
    )
    # explode each interval onto the weeks it touches ([s, e) exclusive
    # end -> last bucket is the week of e-1)
    a_g = a.withColumn(
        "bkt",
        F.explode(
            F.sequence(epoch_week(F.col("a_s")), epoch_week(F.date_sub("a_e", 1)))
        ),
    )
    b_g = b.withColumn(
        "bkt",
        F.explode(
            F.sequence(epoch_week(F.col("b_s")), epoch_week(F.date_sub("b_e", 1)))
        ),
    )
    # report-once rule: a pair co-occurs in up to min(spans) weeks, but
    # only the week containing the overlap START emits it — a map-side
    # filter, so no distinct() shuffle over the joined pair stream
    pairs = (
        a_g.join(b_g, "bkt")
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .filter(F.col("bkt") == epoch_week(F.greatest("a_s", "b_s")))
        .drop("bkt")
    )
    return pairs.groupBy("o_orderkey").agg(
        F.count("*").alias("n_overlaps"),
        F.sum(
            F.datediff(
                F.least("a_e", "b_e"), F.greatest("a_s", "b_s")
            ).cast("long")
        ).alias("overlap_days"),
    )


_CTE_WINDOW_SQL = """
WITH nat_rev AS (
  SELECT n.n_name, c.c_custkey,
         round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS spend
  FROM {orders} o
  JOIN {customer} c ON o.o_custkey = c.c_custkey
  JOIN {nation} n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey
),
ranked AS (
  SELECT n_name, c_custkey, spend,
         rank() OVER (PARTITION BY n_name ORDER BY spend DESC, c_custkey) AS rnk
  FROM nat_rev
)
SELECT n_name, c_custkey, spend, rnk FROM ranked WHERE rnk <= 5
"""


@register(
    "q_sql_window_cte",
    family="joins",
    oracle=_CTE_WINDOW_SQL.format(
        orders="orders", customer="customer", nation="nation"
    ),
    doc="SQL-surface parity for the full analyst shape: chained CTEs + "
    "a 3-way join + decimal-exact grouped aggregate + ranked window + "
    "late filter, as ONE ANSI string that runs verbatim on both "
    "engines (like q_sql_correlated, this pins spark.sql() parity, "
    "not just the DataFrame API). Catalyst inlines the CTEs, pushes "
    "the rank<=5 filter into a windowed top-k per nation, broadcasts "
    "the nation dim, and plans customer⋈orders as one keyed shuffle; "
    "the window partitions by nation (25 groups of ~corpus/25 — no "
    "global window). Decimal sum + final round keeps the spend values "
    "bitwise cross-engine; rank's (spend DESC, custkey) order is a "
    "total order so ties cannot reshuffle rows between engines.",
)
def q_sql_window_cte(spark, sf_dir):
    for name in ("orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"mis_cte_{name}")
    return spark.sql(
        _CTE_WINDOW_SQL.format(
            orders="mis_cte_orders",
            customer="mis_cte_customer",
            nation="mis_cte_nation",
        )
    )


_RECURSIVE_SQL = """
WITH RECURSIVE anc AS (
  SELECT o_orderkey AS start_key, o_orderkey AS cur, 0 AS depth
  FROM {orders} WHERE o_orderkey <= 100
  UNION ALL
  SELECT start_key, CAST(floor(cur / 2) AS BIGINT), depth + 1
  FROM anc WHERE cur > 1
)
SELECT start_key,
       CAST(max(depth) AS BIGINT) AS depth_to_root,
       CAST(count(*) AS BIGINT) AS chain_len
FROM anc
GROUP BY start_key
ORDER BY start_key
"""


@register(
    "q_sql_recursive",
    family="joins",
    oracle=_RECURSIVE_SQL.format(orders="orders"),
    doc="Recursive CTE (WITH RECURSIVE, Spark 4 SPARK-24497): walk the "
    "synthetic binary-tree hierarchy parent(k)=floor(k/2) from each "
    "low orderkey to the root, returning depth and chain length — "
    "the org-chart/BOM-traversal shape, as ONE ANSI string run "
    "verbatim on both engines (spark.sql parity like "
    "q_sql_window_cte). Only integer arithmetic, so results are "
    "engine-exact. Scale: Spark executes the recursion as iterative "
    "UNION ALL steps — each step is a filtered map of the previous "
    "frontier (no shuffle inside a step here), frontier size is "
    "bounded by the seed set, and depth is log2(maxkey) ≈ 17 steps "
    "at any SF; the alternative hand-rolled loop (q_dedup_clusters' "
    "pointer-doubling) remains the shape for UNBOUNDED-depth graphs.",
)
def q_sql_recursive(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("mis_rec_orders")
    return spark.sql(_RECURSIVE_SQL.format(orders="mis_rec_orders"))


@register(
    "q_join_asof_forward",
    family="joins",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             CAST(epoch_us(c.c_ts) - epoch_us(p.p_ts) AS BIGINT) AS gap_us,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY c.c_ts, c.c_id) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.c_ts > p.p_ts
    )
    SELECT p_id, user_id, c_id AS next_click_id, c_value AS next_click_value,
           gap_us
    FROM ranked WHERE rn = 1
    """,
    doc="FORWARD as-of join: for each purchase, the first click "
    "strictly AFTER it per user — the follow-up-behavior twin of "
    "q_join_asof's backward lookup (together they give the "
    "surrounding-context pair a feature pipeline wants). Same shape: "
    "user equi-join + time inequality residual + per-left "
    "row_number()=1 with a deterministic (ts, id) tie-break; same "
    "100 TB path: repartition by user, sortWithinPartitions(ts), "
    "mapInPandas merge-scan when the pair fan-out warrants it.",
)
def q_join_asof_forward(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    j = p.join(c, (p.user_id == c.c_user) & (c.c_ts > p.p_ts))
    w = Window.partitionBy("p_id").orderBy(F.col("c_ts"), F.col("c_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_id",
            "user_id",
            F.col("c_id").alias("next_click_id"),
            F.col("c_value").alias("next_click_value"),
            (
                F.unix_micros(F.col("c_ts").cast("timestamp"))
                - F.unix_micros(F.col("p_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


@register(
    "q_join_bucketed",
    family="joins",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0 AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Bucketed co-located fact-fact join: both lineitem and orders "
    "are written ONCE as bucketBy(8, orderkey).sortBy(orderkey) "
    "tables, so the join executes with ZERO shuffle on either side — "
    "the bucket layout IS the exchange, amortized across every "
    "downstream join on the key. At 100 TB this is the difference "
    "between re-shuffling ~100 TB per query and reading co-located "
    "buckets; the per-order partial aggregate also reuses the bucket "
    "partitioning (no exchange), leaving only the final tiny "
    "per-priority rollup to shuffle (5 groups). Plan-pinned in "
    "tests/test_plans.py::test_bucketed_join_shuffles_nothing: "
    "SortMergeJoin with no Exchange on either input. The bucketed "
    "tables are session-cached per sf_dir (Hive-style layout under "
    "the Spark warehouse), mirroring how a lakehouse would maintain "
    "them as standing tables.",
)
def q_join_bucketed(spark, sf_dir):
    li_name, o_name = _bucketed_pair(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(o_name)
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    # per-order partial rides the bucket partitioning (hash(l_orderkey)
    # satisfies clustering on the superset grouping key — no exchange);
    # only the ~n_orders partial rows shuffle into the 5-group rollup
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.count("*").alias("_n"), F.sum(rev).alias("_rev"))
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.sum("_n").cast("long").alias("n_lines"),
        F.count("*").cast("long").alias("n_orders"),
        (F.sum("_rev") / 10000.0).alias("revenue"),
    )


def _bucketed_pair(spark, sf_dir) -> tuple[str, str]:
    """Write-once bucketed lineitem/orders tables for ``sf_dir`` (names
    carry an sf tag so scale factors coexist in one warehouse)."""
    import hashlib

    from ._util import session_tmpdir

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    li_name, o_name = f"mis_bkt_li_{tag}", f"mis_bkt_ord_{tag}"
    # EXTERNAL tables (explicit path under the atexit-cleaned session
    # root): the bucket files never land in the process cwd's
    # spark-warehouse, and the in-memory catalog entry dies with the
    # session while the next session rebuilds under a fresh root
    if not spark.catalog.tableExists(li_name):
        (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", session_tmpdir("mis_bkt_li_"))
            .mode("overwrite")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", session_tmpdir("mis_bkt_ord_"))
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


@register(
    "q_join_asof_tolerance",
    family="joins",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts, value AS c_value
      FROM events WHERE event_type = 'click'
    ),
    best AS (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gap_us,
             row_number() OVER (
               PARTITION BY p.p_id ORDER BY c.c_ts DESC, c.c_id DESC
             ) AS rn
      FROM p JOIN c
        ON p.user_id = c.c_user
       AND c.c_ts <= p.p_ts
       AND epoch_us(p.p_ts) - epoch_us(c.c_ts) <= 3600000000
    )
    SELECT p.p_id, p.user_id, b.c_id AS last_click_id,
           b.c_value AS last_click_value, b.gap_us
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (p_id, user_id)
    """,
    doc="As-of join with a STALENESS TOLERANCE (feature-store "
    "semantics): each purchase matches its latest preceding click "
    "only if it is at most 1 hour old — older state is stale and the "
    "row keeps NULL features rather than silently training on "
    "outdated values (pandas merge_asof(tolerance=...) semantics). "
    "Same shape as q_join_asof — the tolerance RIDES the user_id "
    "equi-join as a residual band predicate, which also SHRINKS the "
    "join's intermediate (only in-window clicks survive to the "
    "window), then a left join restores tolerance-orphaned "
    "purchases. Never a nested loop; at 100 TB the band predicate is "
    "the difference between per-user full history fan-out and a "
    "bounded 1-hour window per probe.",
)
def q_join_asof_tolerance(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (us("p_ts") - us("c_ts") <= 3_600_000_000),
    )
    w = Window.partitionBy("p_id").orderBy(F.col("c_ts").desc(), F.col("c_id").desc())
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_id",
            "user_id",
            F.col("c_id").alias("last_click_id"),
            F.col("c_value").alias("last_click_value"),
            (us("p_ts") - us("c_ts")).alias("gap_us"),
        )
    )
    return p.select("p_id", "user_id").join(best, ["p_id", "user_id"], "left")


@register(
    "q_join_asof_nearest",
    family="joins",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.p_id, p.user_id, c.c_id, c.c_value,
             CAST(epoch_us(c.c_ts) - epoch_us(p.p_ts) AS BIGINT)
               AS signed_gap_us,
             row_number() OVER (
               PARTITION BY p.p_id
               ORDER BY abs(epoch_us(c.c_ts) - epoch_us(p.p_ts)),
                        c.c_ts, c.c_id) AS rn
      FROM purchases p JOIN clicks c ON p.user_id = c.user_id
    )
    SELECT p_id, user_id, c_id AS near_click_id,
           c_value AS near_click_value, signed_gap_us
    FROM ranked WHERE rn = 1
    """,
    doc="NEAREST as-of join: for each purchase, the click closest in "
    "time in EITHER direction per user (pandas "
    "merge_asof(direction='nearest') semantics) — completes the "
    "backward/forward/tolerance as-of family. Deterministic total "
    "order: |gap| first, then (ts, id) so an exact before/after tie "
    "picks the earlier click. The signed gap is exact integer "
    "microseconds (negative = click preceded the purchase). Same "
    "shape and same 100 TB path as q_join_asof: user equi-join + "
    "per-left row_number()=1 here; repartition by user, "
    "sortWithinPartitions(ts), one mapInPandas merge-scan when the "
    "per-user pair fan-out warrants it.",
)
def q_join_asof_nearest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    j = p.join(c, p.user_id == c.c_user).withColumn(
        "signed_gap_us",
        F.unix_micros(F.col("c_ts").cast("timestamp"))
        - F.unix_micros(F.col("p_ts").cast("timestamp")),
    )
    w = Window.partitionBy("p_id").orderBy(
        F.abs(F.col("signed_gap_us")), F.col("c_ts"), F.col("c_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_id",
            "user_id",
            F.col("c_id").alias("near_click_id"),
            F.col("c_value").alias("near_click_value"),
            "signed_gap_us",
        )
    )


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) o
WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
"""


@register(
    "q_sql_lateral",
    family="joins",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT — "
    "the ANSI 'top-N per outer row' idiom (SQL:1999 lateral derived "
    "table; the form every BI tool emits for 'top 3 orders per "
    "account'). Catalyst DECORRELATES it into a DomainJoin: the inner "
    "query becomes ONE grouped window/group-limit over orders "
    "pre-filtered to the surviving customer domain, joined back on "
    "o_custkey — two scans + one shuffle join, never a per-outer-row "
    "re-scan (nested-loop semantics, hash-join execution; the naive "
    "reading is O(customers x orders) and dead at 100 TB). "
    "Deterministic: the LIMIT rides a total order (totalprice DESC, "
    "orderkey) of per-row doubles — no aggregation, no rounding "
    "needed. The identical SQL string runs on DuckDB as the oracle, "
    "pinning SQL-surface parity like q_sql_correlated/q_sql_recursive.",
)
def q_sql_lateral(spark, sf_dir):
    from ._util import t as _t

    _t(spark, sf_dir, "customer").createOrReplaceTempView("mis_lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("mis_lat_orders")
    return spark.sql(
        _LATERAL_SQL.format(customer="mis_lat_customer", orders="mis_lat_orders")
    )


@register(
    "q_sql_scripting",
    family="joins",
    oracle="""
    WITH thr AS (
      SELECT CAST(sum(CAST(round(value * 100) AS BIGINT))
               // count(*) AS BIGINT) AS thr_cents
      FROM events
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS cents_above,
           t.thr_cents AS threshold_cents
    FROM events e CROSS JOIN thr t
    WHERE CAST(round(e.value * 100) AS BIGINT) > t.thr_cents
    GROUP BY e.event_type, t.thr_cents
    ORDER BY e.event_type
    """,
    doc="SQL scripting (Spark 4.1, BEGIN...END compound statements): a "
    "procedural script DECLAREs a variable, SETs it from one query "
    "(the global mean value in exact integer cents — BIGINT floor "
    "division, no float threshold to diverge on), then uses it as a "
    "dynamic predicate in a second query — the "
    "'compute-threshold-then-filter' idiom every BI migration from "
    "T-SQL/PLSQL stored procedures needs, expressed in the engine's "
    "own scripting surface instead of driver-side glue. The script's "
    "final SELECT is the result; the oracle folds both steps into one "
    "CTE query, pinning that scripting is sugar over the same "
    "dataflow. Scale: each statement is an ordinary Catalyst plan "
    "(two scans here); the scalar variable is driver-held, like a "
    "broadcast of one value.",
)
def q_sql_scripting(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE thr_cents BIGINT;
          SET thr_cents = (
            SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) DIV COUNT(*)
            FROM events_script_v
          );
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_above,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents_above,
                 thr_cents AS threshold_cents
          FROM events_script_v
          WHERE CAST(ROUND(value * 100) AS BIGINT) > thr_cents
          GROUP BY event_type
          ORDER BY event_type;
        END
        """
    )


@register(
    "q_join_nn_1d",
    family="joins",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    nb AS (
      SELECT o_orderkey, o_orderpriority, c,
             lag(c)  OVER w AS prev_c,
             lead(c) OVER w AS next_c
      FROM cents
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY c, o_orderkey)
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(least(coalesce(abs(c - prev_c), 9223372036854775807),
                          coalesce(abs(next_c - c), 9223372036854775807)))
             AS BIGINT) AS min_nn_gap_cents,
           round(avg(least(coalesce(abs(c - prev_c), 9223372036854775807),
                           coalesce(abs(next_c - c), 9223372036854775807))
                     * 1.0), 4) AS avg_nn_gap_cents
    FROM nb
    WHERE prev_c IS NOT NULL OR next_c IS NOT NULL
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="1-D nearest-neighbor join via SORT, not cross join: each "
    "order's closest other order by price within its priority class is "
    "one of its two SORTED NEIGHBORS (lag/lead after ordering by the "
    "value) — the O(n log n) trick that replaces the naive O(n²) "
    "|a.price − b.price| self-join for any single-dimension nearest "
    "query (dedupe candidates by amount, price-band outlier checks). "
    "Values are exact integer cents with (c, o_orderkey) as the total "
    "window order; gap summary per class. Scale: one hash shuffle on "
    "the class key, window sorts within bounded groups; the naive "
    "alternative this replaces is quadratic in class size.",
)
def q_join_nn_1d(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("c", "o_orderkey")
    big = F.lit(9223372036854775807)
    nn = F.least(
        F.coalesce(F.abs(F.col("c") - F.lag("c").over(w)), big),
        F.coalesce(F.abs(F.lead("c").over(w) - F.col("c")), big),
    )
    return (
        cents.select(
            "o_orderpriority",
            "c",
            F.lag("c").over(w).alias("prev_c"),
            F.lead("c").over(w).alias("next_c"),
            nn.alias("nn_gap"),
        )
        .filter(F.col("prev_c").isNotNull() | F.col("next_c").isNotNull())
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("nn_gap").cast("long").alias("min_nn_gap_cents"),
            F.round(F.avg(F.col("nn_gap") * 1.0), 4).alias("avg_nn_gap_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_sql_pivot",
    family="joins",
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN extract(dow FROM ts) IN (0, 6)
                         THEN CAST(round(value * 100) AS BIGINT) END)
             AS BIGINT) AS weekend_cents,
           CAST(sum(CASE WHEN extract(dow FROM ts) NOT IN (0, 6)
                         THEN CAST(round(value * 100) AS BIGINT) END)
             AS BIGINT) AS weekday_cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="SQL PIVOT clause (the ANSI-ish surface BI tools emit, vs "
    "q_agg_pivot's DataFrame .pivot()): rows pivot on a computed "
    "weekend/weekday label into two exact-integer-cents columns. "
    "Catalyst compiles PIVOT to the same single hash aggregate with "
    "conditional sums the oracle spells out — pinning that the "
    "syntax adds no extra pass. Scale: one map-side-combined "
    "aggregation, pivot width fixed at plan time.",
)
def q_sql_pivot(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events_pivot_v")
    return spark.sql(
        """
        SELECT event_type, weekend AS weekend_cents, weekday AS weekday_cents
        FROM (
          SELECT event_type,
                 CASE WHEN dayofweek(ts) IN (1, 7) THEN 'weekend'
                      ELSE 'weekday' END AS slot,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events_pivot_v
        )
        PIVOT (SUM(cents) FOR slot IN ('weekend' AS weekend,
                                       'weekday' AS weekday))
        ORDER BY event_type
        """
    )


# Runtime bloom filter injection (InjectRuntimeFilter). The two
# thresholds exist only because the FIXTURE is tiny: at target scale the
# defaults (10 GB application-side scan) trigger on their own; forcing
# SMJ matters only to keep the demo from degenerating to broadcast.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _runtime_bloom_df(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            (F.sum(cents) / 10000.0).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_join_runtime_bloom",
    family="joins",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0 AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Runtime row-level BLOOM FILTER join (InjectRuntimeFilter — "
    "DPP's sibling for non-partition keys): the selective dim side's "
    "join keys are sketched into a bloom filter at runtime and pushed "
    "as might_contain(xxhash64(l_orderkey)) into the FACT SCAN'S "
    "FILTER, so ~80% of lineitem rows die before the shuffle instead "
    "of after the join — the mechanism that rescues selective "
    "fact-dim SMJs on unpartitioned keys at 100 TB (plan-pinned: "
    "might_contain in the fact-side filter, "
    "tests/test_plans.py::test_runtime_bloom_filter_injected). "
    "Executed EAGERLY under scoped session confs (restored in "
    "finally) so the threshold overrides — needed only because the "
    "fixture is far below the 10 GB default trigger — never leak "
    "into other queries; the 5-row result returns as a local "
    "DataFrame, the bounded-collect pattern.",
)
def q_join_runtime_bloom(spark, sf_dir):
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        rows = _runtime_bloom_df(spark, sf_dir).collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        rows, "o_orderpriority string, n_lines long, revenue double"
    )


@register(
    "q_sql_unpivot",
    family="joins",
    oracle="""
    WITH wide AS (
      SELECT l_linestatus,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_price_cents,
             CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS sum_disc_bp
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, measure, val
    FROM wide UNPIVOT (val FOR measure IN
      (sum_qty, sum_price_cents, sum_disc_bp))
    ORDER BY l_linestatus, measure
    """,
    doc="ANSI UNPIVOT (wide metrics -> long key/value rows), the "
    "inverse surface of q_sql_pivot and the melt() every metrics "
    "export pipeline runs: one per-status rollup produces three exact "
    "BIGINT measure columns (units / cents / basis points — no floats "
    "cross the unpivot so the long rows are bitwise), then Spark's "
    "native DataFrame.unpivot (Expand operator) matches DuckDB's "
    "UNPIVOT clause row-for-row including the measure-name column. "
    "Scale: the rollup is one map-side-combinable hash agg; Expand "
    "multiplies only the AGGREGATED table (rows = statuses x 3), so "
    "the unpivot itself is free at any corpus size — the pattern to "
    "teach is unpivot-after-aggregate, never unpivot-then-aggregate "
    "(which triples the shuffle). Ref: no reference counterpart — "
    "SQL-surface tier.",
)
def q_sql_unpivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_price_cents"),
        F.sum(F.round(F.col("l_discount") * 10000).cast("long"))
        .cast("long")
        .alias("sum_disc_bp"),
    )
    return wide.unpivot(
        ids=["l_linestatus"],
        values=["sum_qty", "sum_price_cents", "sum_disc_bp"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("l_linestatus", "measure")


@register(
    "q_sql_qualify",
    family="joins",
    oracle="""
    SELECT c.c_mktsegment, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                                   ORDER BY o.o_totalprice DESC, o.o_orderkey)
             AS BIGINT) AS rn
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    QUALIFY rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    doc="QUALIFY-clause parity: top-3 orders per market segment by "
    "total price. DuckDB (like Snowflake/BigQuery) filters on a window "
    "result in ONE clause; Spark SQL has no QUALIFY, and this operator "
    "IS the translation recipe — window then filter on its alias, "
    "which Catalyst plans BETTER than a naive window: the rank filter "
    "becomes WindowGroupLimit (Partial before the shuffle, Final "
    "after), so each map task forwards at most k rows per group and "
    "the exchange carries k*groups rows, not the fact table. The "
    "window carries a unique (price DESC, orderkey) total order so "
    "the kept rows are deterministic. Scale: one shuffle on the "
    "partition key; the customer dim joins as an explicit broadcast. "
    "Ref: no reference counterpart — SQL-surface parity tier.",
)
def q_sql_qualify(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        j.select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


_SKEW_TOPK = 5


@register(
    "q_profile_join_skew",
    family="joins",
    oracle=f"""
    WITH k AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_cnt FROM k)
    SELECT k.key, k.cnt,
           round(CAST(k.cnt AS DOUBLE) / t.n_rows, 6) AS share,
           round(k.cnt * 1.0 * t.n_keys / t.n_rows, 6) AS skew_x,
           t.n_keys, t.n_rows,
           round(CAST(t.max_cnt AS DOUBLE) * t.n_keys / t.n_rows, 6)
             AS max_skew_x
    FROM k CROSS JOIN tot t
    ORDER BY k.cnt DESC, k.key
    LIMIT {_SKEW_TOPK}
    """,
    doc="Join-key skew profiler: the top-5 heaviest lineitem join keys "
    "with per-key share and skew factor (cnt*n_keys/n_rows — how many "
    "times the average key this one is), plus the global max skew "
    "factor — the diagnostic run BEFORE choosing between a plain "
    "shuffle join, q_join_salted's salting, or AQE skew-join hints "
    "(skew_x ~ 1 means don't bother; skew_x >> shuffle parallelism "
    "means one straggler task owns the join). Exactness: counts are "
    "exact; share and skew are cross-multiplied rationals of exact "
    "integers, one rounded division each. Scale: one combinable "
    "per-key rollup (the profile costs one aggregation of the fact), "
    "a 1-row totals broadcast, TakeOrderedAndProject top-k — never a "
    "global sort. Ref: no reference counterpart — ops-diagnostics "
    "tier.",
)
def q_profile_join_skew(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = k.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    return (
        k.join(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_rows"), 6).alias(
                "share"
            ),
            F.round(F.col("cnt") * 1.0 * F.col("n_keys") / F.col("n_rows"), 6).alias(
                "skew_x"
            ),
            "n_keys",
            "n_rows",
            F.round(
                F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows"),
                6,
            ).alias("max_skew_x"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(_SKEW_TOPK)
    )


@register(
    "q_sql_groupby_all",
    family="sql",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL — the analyst-ergonomics SQL "
    "surface (Spark 3.4+/DuckDB both infer the grouping keys from "
    "the non-aggregate select items and the sort keys from the full "
    "select list): the same rollup as q_agg_groupby but exercising "
    "the resolver path, proving the inferred plan is byte-identical "
    "to the explicit one (same hash agg, same exchange — pinned). "
    "Exact integer cents; counts exact. Scale: one combinable hash "
    "agg, ≤|flags×status| groups. Ref: reference ships no SQL "
    "surface; lake-analytics ergonomics tier.",
)
def q_sql_groupby_all(spark, sf_dir):
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("mis_gba_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS price_cents
        FROM mis_gba_lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q_sql_distinct_on",
    family="sql",
    oracle="""
    SELECT user_id, last_ts, last_type, last_event_id
    FROM (
      SELECT DISTINCT ON (user_id)
             user_id, ts AS last_ts, event_type AS last_type,
             event_id AS last_event_id
      FROM events
      ORDER BY user_id, ts DESC, event_id DESC
    )
    ORDER BY user_id
    """,
    doc="DISTINCT ON semantics (latest event per user) — the "
    "Postgres/DuckDB idiom Spark lacks natively, expressed as the "
    "canonical row_number()=1 window (the translation any migration "
    "off DuckDB/Postgres needs; same dedup core as q_cdc_latest but "
    "surfaced as the SQL-portability operator). Determinism: the "
    "ORDER BY carries event_id as a total tie-break (two events can "
    "share a timestamp), so 'the' latest row is engine-independent. "
    "Scale: one hash shuffle on user_id with per-user top-1 state — "
    "no global sort; the window's partition key is the dedup key. "
    "Ref: reference upserts by _id (docs/design.md:291-300) — same "
    "latest-wins shape; SQL-portability tier.",
)
def q_sql_distinct_on(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("event_id").alias("last_event_id"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@register(
    "q_sql_order_all",
    family="sql",
    oracle="""
    SELECT event_type,
           CAST(dayofweek(ts) AS BIGINT) AS dw,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="GROUP BY ALL + ORDER BY ALL — the remaining modern-SQL "
    "shorthand pair after q_sql_groupby_all (r8 covered the grouping "
    "side alone): every non-aggregate column groups, every output "
    "column orders, IDENTICAL SQL text on both engines (Spark 4 and "
    "DuckDB both implement the duckdb-pioneered shorthand). The "
    "portability claim is the operator: a user's dashboard query "
    "moves between the engines verbatim. Scale: one combinable "
    "rollup + a bounded 35-row sort. Ref: no reference counterpart — "
    "SQL-portability tier.",
)
def q_sql_order_all(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(dayofweek(ts) - 1 AS BIGINT) AS dw,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events
        GROUP BY ALL
        ORDER BY ALL
        """
    )
