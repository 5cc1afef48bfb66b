"""Composite TPC-H-style analytic queries (multi-join + agg + top-k).

The single-operator families (joins.py, aggregates.py, sorts_sets.py)
each pin one physical pattern; these composites exercise several in ONE
Catalyst plan — selective filters feeding a join tree feeding a hash
aggregate feeding a bounded top-k — which is what a real reporting
query against the synced Iceberg lake looks like (reference analog:
the lake these queries would run on is the output of the sync daemon,
docs/design.md:128-137; the reference itself ships no query surface,
src/main is config+CLI only).

Determinism: every revenue aggregate is computed in EXACT integer
arithmetic. All money columns in the test data are cent-quantized
(max |x*100 - round(x*100)| ~ 1e-9 over every SF), so
``CAST(round(x*100) AS BIGINT)`` reconstructs exact cents in both
engines; revenue = Σ price_cents·(100 − disc_cents) is an exact
BIGINT in units of 1e-4 dollars, the ORDER BY rides on that integer,
and the final /10000.0 is a single FP division of identical inputs —
bitwise identical cross-engine. This avoids the float-summation-order
trap that bit q_join_theta_range in round 1.

Scale notes (100 TB): no explicit broadcast hints here on purpose —
customer/orders/lineitem are all fact-sized at scale, so the right
physical plan is filter-pushdown → shuffle hash/SMJ joins on the fact
keys, with AQE converting any post-filter-small side to broadcast at
runtime. The date/segment filters reach the parquet scan (pinned in
tests/test_plans.py), so the join inputs are already pruned; the
top-k is TakeOrderedAndProject (per-partition partial top-k, O(k)
rows to the driver-side final), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ._util import t


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# revenue in 1e-4 dollar units: exact integer, order-insensitive.
_REV_E4 = "_rev_e4"


def _rev_e4_col() -> F.Column:
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


_Q3_DATE = "1998-03-15"


@register(
    "q_tpch_q3",
    family="tpch",
    oracle=f"""
    WITH rev AS (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_e4
      FROM customer c
      JOIN orders o   ON o.o_custkey  = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
        AND l.l_shipdate  > TIMESTAMP '{_Q3_DATE}'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT o_orderkey,
           rev_e4 / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM rev
    ORDER BY rev_e4 DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): segment-filtered customers ⋈ "
    "date-filtered orders ⋈ date-filtered lineitem → per-order revenue "
    "→ top-10. One plan exercising pushed filters on three scans, two "
    "key joins, partial hash agg, and TakeOrderedAndProject. Revenue "
    "is an exact integer sum of cents×(100−disc), so the top-k order "
    "and values are engine-independent.",
)
def q_tpch_q3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp_ntz")
    )
    return (
        c.select("c_custkey")
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_e4_col()).alias(_REV_E4))
        .orderBy(F.col(_REV_E4).desc(), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            (F.col(_REV_E4) / 10000.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"


@register(
    "q_tpch_q5",
    family="tpch",
    oracle=f"""
    SELECT n.n_name,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
             AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q5_HI}'
    GROUP BY n.n_name
    ORDER BY sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) DESC,
             n.n_name
    """,
    doc="TPC-H Q5 (local supplier volume): 6-table join with the "
    "classic c_nationkey = s_nationkey 'local' constraint, region "
    "filter, year window, per-nation revenue. nation/region/supplier "
    "are explicit broadcasts (genuinely dim-sized at any SF — "
    "supplier is 1e-4 × lineitem); the customer⋈orders⋈lineitem spine "
    "shuffles on its keys. The local constraint lands as a join-side "
    "filter after the supplier broadcast, not a second shuffle.",
)
def q_tpch_q5(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev_e4_col()).alias(_REV_E4))
        .orderBy(F.col(_REV_E4).desc(), "n_name")
        .select("n_name", (F.col(_REV_E4) / 10000.0).alias("revenue"))
    )


_Q10_LO, _Q10_HI = "1997-01-01", "1997-04-01"


@register(
    "q_tpch_q10",
    family="tpch",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
             AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q10_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) DESC,
             c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): quarter of orders ⋈ "
    "returned lineitems ⋈ customer ⋈ nation → top-20 customers by "
    "lost revenue. The returnflag + date filters prune ~92% of the "
    "join input at the scans; nation broadcasts; the group key is the "
    "customer PK so the aggregate shuffles once on c_custkey.",
)
def q_tpch_q10(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.select("o_orderkey", "o_custkey")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_e4_col()).alias(_REV_E4))
        .orderBy(F.col(_REV_E4).desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col(_REV_E4) / 10000.0).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


_Q14_LO, _Q14_HI = "1997-06-01", "1997-07-01"


@register(
    "q_tpch_q14",
    family="tpch",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ELSE 0 END) AS BIGINT) AS promo_rev_e4,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS total_rev_e4,
           100.0 * sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q14_HI}'
    GROUP BY 1=1
    """,
    doc="TPC-H Q14 (promotion effect): share of one month's revenue "
    "from PROMO parts. Both revenue legs are exact integer sums and "
    "the share is ONE float division of two exact integers — bitwise "
    "cross-engine with no rounding. Plan: the month filter prunes "
    "~99% of lineitem at the scan; part joins on its PK (broadcast "
    "at test SF, SMJ at 100 TB — left to AQE on purpose since part "
    "is 1/5 of lineitem's cardinality, borderline either way); one "
    "ungrouped aggregate, map-side combined.",
)
def q_tpch_q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_e4_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(promo_rev).cast("long").alias("promo_rev_e4"),
            F.sum(rev).cast("long").alias("total_rev_e4"),
            (100.0 * F.sum(promo_rev) / F.sum(rev)).alias("promo_share_pct"),
        )
    )


@register(
    "q_tpch_q19",
    family="tpch",
    oracle="""
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS rev_e4,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    doc="TPC-H Q19 (discounted revenue): three OR'd brand/size/quantity "
    "predicate branches over lineitem⋈part — the classic test that "
    "the optimizer derives the IMPLIED single-side filters from a "
    "cross-side disjunction: Catalyst pushes "
    "brand∈{...} ∧ size∈[1,50] to the part scan and quantity∈[1,40] "
    "to the lineitem scan (each branch's condition can't prune alone, "
    "but their union can), leaving the exact disjunction as a "
    "post-join residual. Revenue is an exact integer sum; one "
    "ungrouped aggregate.",
)
def q_tpch_q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & (q >= 10)
            & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & (q >= 20)
            & (q <= 40)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(_rev_e4_col()).cast("long").alias("rev_e4"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


_Q18_QTY = 180


@register(
    "q_tpch_q18",
    family="tpch",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {_Q18_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY round(o.o_totalprice * 100) DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 (large-volume customers): orders whose total "
    f"quantity exceeds {_Q18_QTY}, joined back to orders+customer, "
    "top-20 by order value. The HAVING subquery is the selective "
    "driver — at any SF it reduces lineitem to a tiny key set "
    "(~10% of orders here, far less at TPC-H spec thresholds), so "
    "the right plan aggregates lineitem FIRST (map-side partial on "
    "integral quantities — exact bigint sums), then joins the "
    "survivors to orders/customer; Spark's join reorder + AQE "
    "broadcast the shrunken side. ORDER rides on exact integer "
    "cents; top-20 is TakeOrderedAndProject.",
)
def q_tpch_q18(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(_cents("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"


@register(
    "q_tpch_q4",
    family="tpch",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 (order-priority checking, adapted to the available "
    "columns: 'late' = any line shipped >60 days after the order "
    "date): one quarter of orders, EXISTS semi-join against "
    "lineitem, counts per priority. The EXISTS decorrelates to a "
    "LEFT SEMI join on l_orderkey with the date comparison as a "
    "residual — never a per-row subquery; the quarter filter prunes "
    "orders at the scan and the semi join emits each order at most "
    "once (no fan-out to dedup).",
)
def q_tpch_q4(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"


@register(
    "q_tpch_q6",
    family="tpch",
    oracle=f"""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS forecast_rev_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q6_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    GROUP BY 1=1
    """,
    doc="TPC-H Q6 (forecast revenue change): revenue that would be "
    "gained by eliminating mid-band discounts on small orders in one "
    "year — the canonical scan-dominated query: every predicate "
    "pushes to the parquet scan (date range + discount band + "
    "quantity), the aggregate is one exact integer sum, and the "
    "whole plan is a single map-side-combined pass with zero joins. "
    "At 100 TB this runs at storage throughput; it is the query "
    "min/max page indexes and partition pruning exist for.",
)
def q_tpch_q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _cents("l_extendedprice") * _cents("l_discount")
    return li.agg(
        F.sum(rev).cast("long").alias("forecast_rev_e4"),
        F.count("*").cast("long").alias("n_lines"),
    )


_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


@register(
    "q_tpch_q15",
    family="tpch",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
        AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
      GROUP BY l_suppkey
    ),
    m AS (SELECT max(rev_e4) AS mx FROM srev)
    SELECT s.s_suppkey, s.s_name,
           r.rev_e4 / 10000.0 AS total_revenue
    FROM srev r
    JOIN m ON r.rev_e4 = m.mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 (top supplier): per-supplier quarter revenue, keep "
    "the maximum (ties kept, ordered by key — the spec's 'in case of "
    "ties' clause). The max is a 1-row aggregate joined back as a "
    "broadcast equality on the EXACT integer revenue — float revenue "
    "would make 'equals the max' engine-dependent, integer cents "
    "make it exact. Supplier dim broadcasts; one suppkey agg "
    "shuffle.",
)
def q_tpch_q15(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp_ntz"))
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4_col()).alias("rev_e4"))
    m = srev.agg(F.max("rev_e4").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(m), F.col("rev_e4") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4") / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "q_tpch_q17",
    family="tpch",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS nq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS small_order_rev_e2,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.2 * (pq.sq * 1.0 / pq.nq)
    GROUP BY 1=1
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lines whose quantity "
    "is below 20% of their part's average — the classic correlated "
    "aggregate subquery, decorrelated to a per-part aggregate joined "
    "back on the part key (one extra suppkey-free agg pass instead "
    "of a per-row subquery; Spark and DuckDB both plan exactly "
    "this). The threshold comparison is a float expression of exact "
    "integer sums — identical both engines; revenue is exact cents. "
    "Brand filter pushes to the part scan and AQE broadcasts the "
    "shrunken part side into both joins.",
)
def q_tpch_q17(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_key")).agg(
        F.sum(F.round("l_quantity").cast("long")).alias("sq"),
        F.count("*").alias("nq"),
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * (F.col("sq") * 1.0 / F.col("nq")))
        .agg(
            F.sum(_cents("l_extendedprice")).cast("long").alias("small_order_rev_e2"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q22",
    family="tpch",
    oracle="""
    WITH avg_bal AS (
      SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.0
             / count(*) AS cents_avg
      FROM customer WHERE c_acctbal > 0.0
    ),
    rich_idle AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
      FROM customer c CROSS JOIN avg_bal a
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > a.cents_avg
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM rich_idle r
    JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="TPC-H Q22 (global sales opportunity, adapted: nation instead "
    "of phone country code): customers with above-average positive "
    "balance who have NEVER ordered — per nation. Three optimizer "
    "patterns in one plan: a 1-row global aggregate broadcast as a "
    "threshold (exact integer cents so the comparison is "
    "engine-independent), NOT EXISTS decorrelated to a LEFT ANTI "
    "join on the customer key, and a broadcast nation dim. At "
    "100 TB the anti join is the only fact-sized shuffle; the "
    "threshold costs one scalar.",
)
def q_tpch_q22(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.col("c_acctbal"),
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum("cents") * 1.0 / F.count("*")).alias("cents_avg"))
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("cents") > F.col("cents_avg")
    )
    idle = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        idle.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("n_name")
    )


_Q8_LO, _Q8_HI = "1996-01-01", "1998-01-01"


@register(
    "q_tpch_q8",
    family="tpch",
    oracle=f"""
    WITH base AS (
      SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey  = l.l_orderkey
      JOIN customer c ON c.c_custkey   = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey   = l.l_partkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '{_Q8_LO}'
        AND o.o_orderdate <  TIMESTAMP '{_Q8_HI}'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_6' THEN rev_e4 ELSE 0 END)
                AS BIGINT) AS focus_rev_e4,
           CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
           sum(CASE WHEN supp_nation = 'NATION_6' THEN rev_e4 ELSE 0 END) * 1.0
             / sum(rev_e4) AS mkt_share
    FROM base
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 (national market share): one nation's (NATION_6) share of AMERICA's "
    "ECONOMY-part revenue per year — an 8-table join with selective "
    "filters on three different dimensions feeding one conditional "
    "aggregate. The share per year is one float division of two "
    "exact integer sums. Plan: part/supplier/nation/region broadcast "
    "(explicitly — all dim-sized at any SF), the "
    "lineitem⋈orders⋈customer spine shuffles on its keys, and the "
    "p_type + r_name + date filters prune before the spine joins.",
)
def q_tpch_q8(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q8_HI).cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    rev = _rev_e4_col()
    base = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev.alias("rev_e4"),
            "supp_nation",
        )
    )
    focus = F.when(F.col("supp_nation") == "NATION_6", F.col("rev_e4")).otherwise(0)
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(focus).cast("long").alias("focus_rev_e4"),
            F.sum("rev_e4").cast("long").alias("total_rev_e4"),
            (F.sum(focus) * 1.0 / F.sum("rev_e4")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_Q7_A, _Q7_B = "NATION_1", "NATION_6"


@register(
    "q_tpch_q7",
    family="tpch",
    oracle=f"""
    SELECT n2.n_name AS supp_nation,
           n1.n_name AS cust_nation,
           CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
             AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE ((n1.n_name = '{_Q7_A}' AND n2.n_name = '{_Q7_B}')
        OR (n1.n_name = '{_Q7_B}' AND n2.n_name = '{_Q7_A}'))
    GROUP BY n2.n_name, n1.n_name,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, o_year
    """,
    doc="TPC-H Q7 (volume shipping): revenue flowing between two "
    "trading nations in both directions, per year. The symmetric "
    "nation-pair disjunction spans both legs of the join tree — "
    "Catalyst derives the implied n_name ∈ {A,B} filter for EACH "
    "nation dim (pushed to both tiny scans) and keeps the exact "
    "cross-condition as a residual, so the fact spine only carries "
    "rows touching the two nations. Revenue exact-integer as "
    "everywhere in this family.",
)
def q_tpch_q7(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == _Q7_A) & (F.col("supp_nation") == _Q7_B)
    ) | ((F.col("cust_nation") == _Q7_B) & (F.col("supp_nation") == _Q7_A))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(_rev_e4_col()) / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


_Q12_LO, _Q12_HI = "1997-01-01", "1998-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q_tpch_q12",
    family="tpch",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q12_HI}'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 (shipping-priority classification, adapted to the "
    "available columns: the schema has no l_shipmode/commit/receipt "
    "dates, so the group key is l_returnflag and the date window is "
    "on l_shipdate). Physical shape is Q12's: the year filter prunes "
    "lineitem AT THE SCAN (pushed filter), the orders side carries "
    "only (o_orderkey, o_orderpriority), and the priority split is a "
    "map-side conditional count — partial aggregation runs before the "
    "3-group exchange, so the shuffle moves six counter rows per "
    "task, not lines. At 100 TB both sides are fact-sized: SMJ on "
    "l_orderkey with AQE free to broadcast the post-filter side.",
)
def q_tpch_q12(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_tpch_q13",
    family="tpch",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer order-count distribution, adapted: the "
    "schema has no o_comment, so the exclusion predicate is "
    "o_orderpriority <> '1-URGENT'). The double aggregation is the "
    "point: LEFT OUTER customer->orders with the exclusion in the "
    "JOIN condition (zero-order customers must survive with count 0, "
    "so the filter CANNOT be a WHERE), count per customer, then "
    "re-aggregate the counts into a distribution. First agg shuffles "
    "on c_custkey (same key as the join — one exchange serves both "
    "under AQE), second agg is over ~dozens of distinct counts and is "
    "map-side combinable to near-nothing. Output ordered by custdist "
    "then c_count (both integers — total order, no float ties).",
)
def q_tpch_q13(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q21_NATIONS = ("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")


@register(
    "q_tpch_q21",
    family="tpch",
    oracle=f"""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name IN {_Q21_NATIONS!r}
      AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting, adapted: no "
    "commit/receipt dates in the schema, so 'late' := l_returnflag = "
    "'R'). The textbook plan decorrelates EXISTS + NOT EXISTS into a "
    "semi join and an anti join against the same fact; the Spark form "
    "here goes one better and folds BOTH into one per-order aggregate "
    "— n_supp = distinct suppliers on the order, n_late = distinct "
    "suppliers with an 'R' line — then a single equi-join back to the "
    "candidate lines with the residual (n_supp >= 2 AND n_late = 1). "
    "Row-for-row identical to the double-subquery form (each "
    "candidate line survives iff another supplier exists and no OTHER "
    "supplier shipped late: since the candidate itself is late, "
    "n_late = 1 pins it as the sole late one), but it scans lineitem "
    "twice total instead of three times and replaces two shuffled "
    "semi/anti joins with one agg + one join, both keyed on "
    "l_orderkey so AQE can reuse the exchange. Supplier/nation dims "
    "broadcast.",
)
def q_tpch_q21(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_late"),
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q21_NATIONS))
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    cand = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(n.select("n_nationkey")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        cand.join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)).select(
                F.col("l_orderkey").alias("po_orderkey")
            ),
            F.col("po_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# Round-8 completions: Q2/Q9/Q11/Q16/Q20 — the five classic queries that
# need PARTSUPP, which the fixture does not ship. Convention (already set
# by Q4/Q12, which lack commitdate/receiptdate): ADAPT, keeping the
# query's optimizer shape intact. The part↔supplier relation and its
# costs are DERIVED from lineitem ("the catalog is what was ever
# shipped"): unit_cost_e4 = min over lines of price_cents*10000 div qty —
# exact integer division of exact integers, identical both engines (both
# truncate for positive operands), so every min/sum/threshold below rides
# on exact ints. At 100 TB the derived catalog is a map-side-combinable
# agg over lineitem, orders-of-magnitude smaller than the fact, and every
# real dimension (part, supplier, nation, region) broadcasts.
# ---------------------------------------------------------------------------


def _q2_offers(spark, sf_dir):
    """Q2's offer table (catalog x filtered part x European supplier) —
    factored so the plan pin can assert the part-filter pushdown on THIS
    plan (the query checkpoints it, which hides the scan downstream)."""
    li = t(spark, sf_dir, "lineitem")
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT) * 10000 "
                "div CAST(round(l_quantity) AS BIGINT)"
            )
        ).alias("unit_cost_e4")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    return catalog.join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")
    ).join(F.broadcast(euro), F.col("s_suppkey") == F.col("l_suppkey"))


@register(
    "q_tpch_q2",
    family="tpch",
    oracle="""
    WITH catalog AS (
      SELECT l_partkey, l_suppkey,
             min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
                 // CAST(round(l_quantity) AS BIGINT)) AS unit_cost_e4
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
      SELECT p.p_partkey, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name,
             c.unit_cost_e4
      FROM part p
      JOIN catalog c ON c.l_partkey = p.p_partkey
      JOIN euro e    ON e.s_suppkey = c.l_suppkey
      WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
    ),
    mins AS (
      SELECT p_partkey, min(unit_cost_e4) AS min_cost_e4
      FROM offers GROUP BY p_partkey
    )
    SELECT o.s_acctbal, o.s_name, o.n_name, o.p_partkey,
           o.unit_cost_e4 / 10000.0 AS supply_cost
    FROM offers o JOIN mins m
      ON m.p_partkey = o.p_partkey AND o.unit_cost_e4 = m.min_cost_e4
    ORDER BY o.s_acctbal DESC, o.n_name, o.s_name, o.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier, adapted: the part↔supplier "
    "catalog and unit costs derive from lineitem — the fixture ships "
    "no partsupp): for size-10..20 LARGE parts, the EUROPE supplier(s) "
    "achieving each part's minimum unit cost, top-100 by account "
    "balance. The spec's correlated MIN subquery decorrelates to a "
    "per-part min agg joined back on (partkey, cost) — the same "
    "decorrelation both engines plan. unit_cost_e4 is exact integer "
    "division (truncating, positive operands) so the min and the "
    "equality join-back are engine-exact; the only floats are the "
    "final display division. Plan at scale: catalog = one "
    "map-combinable agg over lineitem; part filter pushes to the "
    "scan; supplier⋈nation⋈region broadcasts; top-100 is "
    "TakeOrderedAndProject. Ref: reference ships no query surface "
    "(docs/plan.md phases 3-10 unchecked); lake-analytics tier.",
)
def q_tpch_q2(spark, sf_dir):
    # consumed twice (mins agg + min-cost join-back): cut lineage so the
    # catalog aggregation isn't recomputed per consumer
    offers = _q2_offers(spark, sf_dir).localCheckpoint(eager=False)
    mins = offers.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("unit_cost_e4").alias("min_cost_e4")
    )
    return (
        offers.join(
            mins,
            (F.col("m_partkey") == F.col("p_partkey"))
            & (F.col("unit_cost_e4") == F.col("min_cost_e4")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("unit_cost_e4") / 10000.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q9",
    family="tpch",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
             - CAST(round(p.p_retailprice * 100) AS BIGINT) * 60
               * CAST(round(l.l_quantity) AS BIGINT)
           ) AS BIGINT) AS profit_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey   = l.l_partkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY n.n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (product-type profit, adapted: supply cost := 60% of "
    "p_retailprice — the fixture ships no partsupp/ps_supplycost): "
    "profit per supplier-nation per order-year over 'red%' parts. "
    "profit_e4 = price_cents*(100-disc_cents) - retail_cents*60*qty "
    "is an exact BIGINT per line (order-insensitive integer sum). "
    "Plan at scale: the LIKE prefix filter pushes to the part scan "
    "as a range (StartsWith → >= 'red' AND < 'ree'), part/supplier/"
    "nation broadcast, and the only fact-sized shuffles are "
    "lineitem⋈orders on orderkey and the final (nation, year) hash "
    "agg (25 nations x ~7 years = tiny, map-side combinable). Ref: "
    "reference ships no query surface; lake-analytics tier.",
)
def q_tpch_q9(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", _cents("p_retailprice").alias("retail_cents"))
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    profit = _rev_e4_col() - F.col("retail_cents") * 60 * F.round(
        "l_quantity"
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.sum(profit).cast("long").alias("profit_e4"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q_tpch_q11",
    family="tpch",
    oracle="""
    WITH held AS (
      SELECT l.l_partkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l.l_quantity) AS BIGINT)) AS value_e2
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT sum(value_e2) AS total_e2 FROM held)
    SELECT h.l_partkey AS p_partkey,
           CAST(h.value_e2 AS BIGINT) AS value_e2
    FROM held h CROSS JOIN tot t
    WHERE h.value_e2 * 10000 > t.total_e2
    ORDER BY value_e2 DESC, p_partkey
    """,
    doc="TPC-H Q11 (important stock identification, adapted: held value "
    "per part := Σ price_cents·qty over lines shipped by NATION_7 "
    "suppliers — no partsupp availqty/supplycost in the fixture): "
    "parts whose held value exceeds 0.01% of the nation's total. The "
    "spec's scalar HAVING subquery becomes a 1-row global aggregate "
    "broadcast against the per-part agg; the threshold compare is "
    "exact-integer cross-multiplication (value*10000 > total), no "
    "float fraction — engine-exact at any scale (HUGEINT on DuckDB, "
    "DECIMAL-safe LONG here: value_e2 < 2^63/1e4 up to ~1e15 dollar-"
    "cents held). Plan at scale: supplier⋈nation broadcast prunes "
    "lineitem BEFORE its only shuffle (the partkey agg); the total "
    "is a second pass over the tiny per-part table. Ref: reference "
    "ships no query surface; lake-analytics tier.",
)
def q_tpch_q11(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    held = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(n.select("n_nationkey")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _cents("l_extendedprice") * F.round("l_quantity").cast("long")
            ).alias("value_e2")
        )
    )
    tot = held.agg(F.sum("value_e2").alias("total_e2"))
    return (
        held.join(F.broadcast(tot))
        .filter(F.col("value_e2") * 10000 > F.col("total_e2"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_e2").cast("long").alias("value_e2"),
        )
        .orderBy(F.desc("value_e2"), "p_partkey")
    )


@register(
    "q_tpch_q16",
    family="tpch",
    oracle="""
    WITH rel AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok_supp AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT r.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM rel r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN ok_supp s ON s.s_suppkey = r.l_suppkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship, adapted: the relation "
    "is DISTINCT (partkey, suppkey) from lineitem; the spec's "
    "'complaints in s_comment' supplier exclusion becomes negative "
    "account balance — the fixture ships neither partsupp nor "
    "s_comment): distinct supplier count per (brand, type, size) "
    "for non-PROMO, non-Brand#45 parts of 8 listed sizes. Plan at "
    "scale: the DISTINCT pair projection is the only fact-sized "
    "shuffle (two hash columns, map-side combinable); part's "
    "brand/type/size filters push to its scan and the pruned part "
    "side plus the anti-filtered supplier keys broadcast; "
    "count(DISTINCT) re-shuffles only the pre-shrunk relation. The "
    "NOT IN of the spec is a broadcast semi/anti in both engines. "
    "Ref: reference ships no query surface; lake-analytics tier.",
)
def q_tpch_q16(spark, sf_dir):
    rel = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ok = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    return (
        rel.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(ok), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q20_LO, _Q20_HI = "1997-01-01", "1998-01-01"


@register(
    "q_tpch_q20",
    family="tpch",
    oracle=f"""
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '{_Q20_LO}'
                       AND l_shipdate <  TIMESTAMP '{_Q20_HI}'
                      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
               AS qty_1997
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT q.l_suppkey
      FROM qty q
      JOIN part p ON p.p_partkey = q.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND q.total_qty > 2 * q.qty_1997
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN excess e ON e.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_3'
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 (potential part promotion, adapted: availability := "
    "all-time shipped quantity per (part, supplier), demand := 1997 "
    "shipments — no partsupp availqty in the fixture): NATION_3 "
    "suppliers holding a 'small%' part whose 1997 demand was under "
    "half its availability. The spec's doubly-nested IN subqueries "
    "decorrelate to ONE conditional aggregate over lineitem (both "
    "quantities in the same pass — no second scan) followed by a "
    "DISTINCT semi join into the broadcast supplier⋈nation dim. All "
    "quantities are exact BIGINTs; the half threshold is the "
    "cross-multiplied total > 2*demand, no floats anywhere. Plan at "
    "scale: one map-combinable (part,supp) agg is the only "
    "fact-sized shuffle; the name-prefix part filter broadcasts. "
    "Ref: reference ships no query surface; lake-analytics tier.",
)
def q_tpch_q20(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    qlong = F.round("l_quantity").cast("long")
    in97 = (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp_ntz")) & (
        F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp_ntz")
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qlong).alias("total_qty"),
        F.sum(F.when(in97, qlong).otherwise(F.lit(0))).alias("qty_1997"),
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        qty.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("total_qty") > 2 * F.col("qty_1997"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(excess, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
