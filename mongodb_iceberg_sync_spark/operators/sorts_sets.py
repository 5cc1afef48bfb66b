"""Sorts, limits, top-k, set operations (SURVEY.md §2B).

Top-k queries always carry a unique tie-break so the selected row SET is
deterministic (the driver's hash is order-insensitive, but LIMIT
membership must not depend on engine sort stability).

Scale note: orderBy().limit(k) compiles to TakeOrderedAndProject —
per-partition top-k then a k-sized merge on the driver; no global sort
materializes. Top-k per group is a single window shuffle on the group
key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_sort_multi",
    family="sorts",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc="Multi-key sort (asc/desc mix) with LIMIT making order matter.",
)
def q_sort_multi(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "q_topk",
    family="sorts",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
    doc="Global top-k (TakeOrderedAndProject: no full sort at scale).",
)
def q_topk(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(50)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "q_topk_per_group",
    family="sorts",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS order_rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via ranked window (generalizes "
    "reference A14 last-writer-wins to k>1).",
)
def q_topk_per_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice", F.col("rn").alias("order_rank")
        )
    )


_YEAR_CUST = """
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = {yr}
"""


@register(
    "q_set_union",
    family="set_ops",
    oracle=f"""
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1995)})
    UNION
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1996)})
    """,
    doc="UNION (distinct) of 1995 vs 1996 purchaser sets.",
)
def q_set_union(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return a.union(b).distinct()


@register(
    "q_set_intersect",
    family="set_ops",
    oracle=f"""
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1995)})
    INTERSECT
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1996)})
    """,
    doc="INTERSECT: customers purchasing in both years.",
)
def q_set_intersect(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return a.intersect(b)


@register(
    "q_set_except",
    family="set_ops",
    oracle=f"""
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1995)})
    EXCEPT
    SELECT o_custkey FROM ({_YEAR_CUST.format(yr=1996)})
    """,
    doc="EXCEPT: 1995 purchasers that lapsed in 1996.",
)
def q_set_except(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return a.exceptAll(b)


from ..functions.zorder import morton_sql as _morton_sql


@register(
    "q_sort_zorder",
    family="sorts",
    oracle=f"""
    SELECT p_partkey, p_size,
           {_morton_sql("p_size", "p_partkey % 65536")} AS z
    FROM part
    ORDER BY z, p_partkey
    LIMIT 100
    """,
    doc="Z-order (Morton) clustering key: interleave the bits of "
    "(p_size, p_partkey) and sort by the code — the Delta Z-ORDER / "
    "Iceberg z-ordered-rewrite trick. A file sorted this way holds a "
    "small rectangle of the 2-D key space, so min/max footer stats "
    "prune scans filtered on EITHER column (a single-column sort "
    "prunes only its own). Pure bit arithmetic "
    "(functions.zorder.morton_code), identical in both engines, so "
    "exact-hash-checked; top-100 via TakeOrderedAndProject, no global "
    "sort. At 100 TB this is a write-time sortWithinPartitions(z) "
    "before the sink — the query demonstrates the key itself.",
)
def q_sort_zorder(spark, sf_dir):
    from ..functions.zorder import morton_code

    p = t(spark, sf_dir, "part")
    z = morton_code(F.col("p_size"), F.col("p_partkey") % 65536)
    return (
        p.select("p_partkey", "p_size", z.alias("z"))
        .orderBy("z", "p_partkey")
        .limit(100)
    )



@register(
    "q_sort_global_rank",
    family="sorts",
    oracle="""
    SELECT event_id, value,
           row_number() OVER (ORDER BY value DESC, event_id) AS rank
    FROM events
    """,
    doc="GLOBAL ranking without a global window: row_number() OVER "
    "(ORDER BY ...) with no PARTITION BY moves every row to one "
    "reducer — dead at 100 TB. Instead: range-repartition on the sort "
    "key (sampled balanced boundaries, the same machinery as a "
    "distributed ORDER BY), count each partition (ONE long per "
    "partition to the driver), exclusive-prefix the counts into "
    "offsets, then a partition-LOCAL row_number plus the broadcast "
    "offset. Identical math to the single window, fully parallel — "
    "the same two-pass shape as q_pack_tokens' prefix sum, applied "
    "to ranking. localCheckpoint pins the partitioning so the count "
    "job and the rank job see the same layout.",
)
def q_sort_global_rank(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "value")
    return global_rank(ev, F.col("value").desc(), F.col("event_id")).select(
        "event_id", "value", "rank"
    )


def global_rank(df, *order_cols):
    """Two-pass distributed global rank (df-level core shared by
    q_sort_global_rank and q_sample_systematic): range-repartition on
    the order, per-partition counts to the driver (one long each),
    exclusive-prefix offsets broadcast back, partition-local
    row_number. Adds a ``rank`` column; identical math to the
    single-reducer global window, fully parallel."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = {
        r["pid"]: r["n"]
        for r in parted.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = spark.createDataFrame(offsets, "pid int, offset long")
    w = Window.partitionBy("pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(off), "pid")
        .withColumn("rank", (F.col("offset") + F.row_number().over(w)).cast("long"))
        .drop("pid", "offset")
    )


_SYS_EVERY = 50


@register(
    "q_sample_systematic",
    family="sampling",
    oracle=f"""
    WITH ranked AS (
      SELECT event_id, value,
             row_number() OVER (ORDER BY value DESC, event_id) AS rank
      FROM events
    )
    SELECT event_id, value, rank
    FROM ranked WHERE (rank - 1) % {_SYS_EVERY} = 0
    """,
    doc=f"Systematic sampling: every {_SYS_EVERY}th row of the "
    "value-ordered population — the stratified-by-order design "
    "surveys use when a sorted frame exists (guarantees coverage of "
    "the whole value range, unlike a Bernoulli sample which can "
    "miss the tails). Rides the SAME two-pass global-rank core as "
    "q_sort_global_rank (range partition → prefix offsets → local "
    "row_number): no single-reducer window; the modulo filter is "
    "map-side after the rank attaches.",
)
def q_sample_systematic(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "value")
    ranked = global_rank(ev, F.col("value").desc(), F.col("event_id"))
    return ranked.filter((F.col("rank") - 1) % _SYS_EVERY == 0).select(
        "event_id", "value", "rank"
    )


@register(
    "q_set_bag_ops",
    family="set_ops",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
    b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
    ia AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
    ea AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
    SELECT 'intersect_all' AS op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys
    FROM ia
    UNION ALL
    SELECT 'except_all', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM ea
    ORDER BY op
    """,
    doc="BAG-semantics set operations — INTERSECT ALL / EXCEPT ALL "
    "over per-year purchaser multisets (one row per ORDER, so a "
    "customer with 3 orders in 1995 and 1 in 1996 contributes 1 to "
    "the intersection and 2 to the difference — multiplicity "
    "min/subtraction, which the DISTINCT forms q_set_intersect/"
    "q_set_except cannot express). Spark's intersectAll/exceptAll "
    "compile to the same count-min/count-subtract hash aggregation "
    "DuckDB uses for ALL semantics: one shuffle keyed on the value, "
    "multiplicities as partial counts — never a sort, never a "
    "row-pairing join. Output is the (op, row count, key count) "
    "summary so the multiset arithmetic itself is inside the hash "
    "check.",
)
def q_set_bag_ops(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    ia = a.intersectAll(b)
    ea = a.exceptAll(b)
    out = None
    for op, df in (("except_all", ea), ("intersect_all", ia)):
        one = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("o_custkey").cast("long").alias("n_keys"),
        ).select(F.lit(op).alias("op"), "n_rows", "n_keys")
        out = one if out is None else out.unionByName(one)
    return out.orderBy("op")


_HILBERT_BITS = 8  # 8-bit axes: a 256 x 256 curve, d in [0, 65536)


def _hilbert_steps():
    return [1 << i for i in range(_HILBERT_BITS - 1, -1, -1)]


def _hilbert_oracle_sql(x_expr: str, y_expr: str) -> str:
    """Chained-CTE DuckDB text of the classic xy2d walk — the SAME
    per-step expressions the Spark select chain applies, generated from
    the same loop so the two engines cannot drift."""
    lines = [
        f"s0 AS (SELECT *, CAST({x_expr} AS BIGINT) AS hx,"
        f" CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM src)"
    ]
    for i, s in enumerate(_hilbert_steps(), start=1):
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        nx = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s} - 1 - hy ELSE hy END) ELSE hx END)"
        )
        ny = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s} - 1 - hx ELSE hx END) ELSE hy END)"
        )
        lines.append(
            f"s{i} AS (SELECT * REPLACE ("
            f"{nx} AS hx, {ny} AS hy,"
            f" hd + {s} * {s} * {quad} AS hd) FROM s{i - 1})"
        )
    return ",\n    ".join(lines)


@register(
    "q_sort_hilbert",
    family="sorts",
    oracle=f"""
    WITH src AS (
      SELECT p_partkey, p_size FROM part
    ),
    {_hilbert_oracle_sql("p_size & 255", "p_partkey % 256")}
    SELECT p_partkey, p_size, hd AS h
    FROM s{_HILBERT_BITS}
    ORDER BY h, p_partkey
    LIMIT 100
    """,
    doc="Hilbert-curve clustering key over (p_size, p_partkey mod 256): "
    "the locality-preserving sibling of q_sort_zorder's Morton code — "
    "consecutive Hilbert indices are ALWAYS spatially adjacent "
    "(Morton has long diagonal jumps at quadrant boundaries), so "
    "files sorted by it hold tighter key-space rectangles and min/max "
    "stats prune better; it is the documented preference over "
    "Z-order in Iceberg/Delta clustering discussions for exactly "
    "this reason. The classic xy2d walk (8 rotate-and-accumulate "
    "steps) runs as a chain of 8 small integer projections — Spark "
    "select chain and DuckDB CTE chain are GENERATED FROM THE SAME "
    "LOOP, so the per-step expression text cannot drift; everything "
    "is exact integer CASE arithmetic (the quadrant is a 4-way CASE, "
    "not an engine-specific XOR). Top-100 under a (h, p_partkey) "
    "total order via TakeOrderedAndProject. At 100 TB this is a "
    "write-time sortWithinPartitions(h) before the sink, exactly "
    "like zorder. Ref: no reference counterpart — lakehouse tier.",
)
def q_sort_hilbert(spark, sf_dir):
    p = t(spark, sf_dir, "part").select("p_partkey", "p_size")
    df = p.select(
        "p_partkey",
        "p_size",
        (F.col("p_size").cast("long").bitwiseAND(F.lit(255))).alias("hx"),
        (F.col("p_partkey") % 256).cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )
    for s in _hilbert_steps():
        rx = F.when(F.col("hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 1, 2)
            .otherwise(3)
        )
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s) - 1 - F.col("hy")).otherwise(F.col("hy")),
        ).otherwise(F.col("hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s) - 1 - F.col("hx")).otherwise(F.col("hx")),
        ).otherwise(F.col("hy"))
        df = df.select(
            "p_partkey",
            "p_size",
            nx.alias("hx"),
            ny.alias("hy"),
            (F.col("hd") + s * s * quad).alias("hd"),
        )
    return (
        df.select("p_partkey", "p_size", F.col("hd").alias("h"))
        .orderBy("h", "p_partkey")
        .limit(100)
    )
