"""Aggregations (SURVEY.md §2B aggregations).

Scale notes: all of these are hash aggregations with map-side partial
aggregation (Spark does partial_→final automatically); low-cardinality
group keys (returnflag×linestatus = 6 groups) make the shuffle tiny
regardless of input size. Float sums are rounded because summation
order is nondeterministic across partitions/engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ._util import spread, t

# Flagship: TPC-H Q1-style pricing summary (SURVEY.md §7 stage 0).
Q1_CUTOFF = "1998-09-02"


@register(
    "q_agg_groupby",
    family="aggregates",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                   AS avg_qty,
           round(avg(l_extendedprice), 6)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filter→hash agg→6 groups.",
)
def q_agg_groupby(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_having",
    family="aggregates",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) > 20 AND sum(c_acctbal) > 0
    """,
    doc="Post-aggregation filter (HAVING).",
)
def q_agg_having(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.sum("c_acctbal").alias("_raw_bal"),
        )
        .filter((F.col("n_customers") > 20) & (F.col("_raw_bal") > 0))
        .drop("_raw_bal")
    )


@register(
    "q_agg_distinct",
    family="aggregates",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)            AS n_suppliers,
           count(DISTINCT l_partkey)            AS n_parts,
           round(sum(DISTINCT l_quantity), 2)   AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="COUNT(DISTINCT) / SUM(DISTINCT). Spark expands to a partial "
    "de-dup shuffle per distinct column (expand+two-phase agg).",
)
def q_agg_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@register(
    "q_agg_approx",
    family="aggregates",
    oracle=None,  # HLL sketch values are engine-specific → rows-only
    doc="Approximate distinct count (HyperLogLog++). At 100 TB this "
    "replaces exact distinct's full shuffle with a fixed-size sketch "
    "mergeable map-side.",
)
def q_agg_approx(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_rollup",
    family="aggregates",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical totals (ROLLUP).",
)
def q_agg_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "q_agg_cube",
    family="aggregates",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Full grouping-set lattice (CUBE).",
)
def q_agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "q_agg_grouping_sets",
    family="aggregates",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS.",
)
def q_agg_grouping_sets(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("mis_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM mis_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_agg_stats",
    family="aggregates",
    oracle="""
    SELECT l_returnflag,
           round(min(l_extendedprice), 2)          AS min_price,
           round(max(l_extendedprice), 2)          AS max_price,
           round(stddev_samp(l_extendedprice), 6)  AS sd_price,
           round(median(l_extendedprice), 6)       AS med_price,
           round(var_samp(l_quantity), 6)          AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: min/max/stddev/variance/median "
    "(median = exact interpolated 0.5-quantile in both engines).",
)
def q_agg_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        F.round(F.median("l_extendedprice"), 6).alias("med_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
    )


@register(
    "q_agg_salted",
    family="aggregates",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2)           AS sum_qty,
           count(l_orderkey)                   AS n_items,
           round(min(l_extendedprice), 2)      AS min_price,
           round(max(l_extendedprice), 2)      AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-proof salted aggregation (functions.skew.salted_agg): "
    "3 group keys over the whole fact table is the textbook skewed "
    "reduce — every row funnels into 3 reducers. Phase 1 groups by "
    "(key, hash-salt mod 16) spreading each hot key over 16 reducers; "
    "phase 2 merges the ≤16 partials per key. The oracle is the PLAIN "
    "group-by: salting must be a pure physical rewrite, bit-identical "
    "results (sums rounded once at the end, as everywhere).",
)
def q_agg_salted(spark, sf_dir):
    from ..functions.skew import salted_agg

    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li.select("l_returnflag", "l_quantity", "l_orderkey", "l_extendedprice"),
        ["l_returnflag"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("count", "l_orderkey", "n_items"),
            ("min", "l_extendedprice", "min_price"),
            ("max", "l_extendedprice", "max_price"),
        ],
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_items",
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q_agg_pivot",
    family="aggregates",
    oracle="""
    SELECT date_trunc('month', ts)::TIMESTAMP AS month,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events
    GROUP BY 1
    """,
    doc="Pivot (long->wide): month x event_type sum(value). Values are "
    "declared EXPLICITLY (pivot(col, values)) — the implicit form runs "
    "an extra distinct-collect job over the fact table to discover "
    "them, a full scan you never want at 100 TB. With explicit values "
    "the pivot is two hash aggregations: reduce by (month, type) "
    "first — tiny after the first map-side combine — then pack wide "
    "by month; semantically the CASE-WHEN plan the oracle spells out.",
)
def q_agg_pivot(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("month", "ts").alias("month"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


@register(
    "q_agg_percentile",
    family="aggregates",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact linear-interpolation percentiles per group: Spark "
    "`percentile` and DuckDB `quantile_cont` share the definition, so "
    "this is hash-checkable exactly. Exact percentiles sort each "
    "group's values in the aggregation buffer — fine for bounded "
    "groups; at 100 TB swap `percentile` for `approx_percentile` "
    "(t-digest sketch, map-side mergeable, no buffering) and accept "
    "epsilon error: same query shape, sketch aggregation.",
)
def q_agg_percentile(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 4).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


@register(
    "q_agg_hll",
    family="aggregates",
    oracle=None,  # sketch estimate is implementation-specific → rows-only
    doc="HyperLogLog distinct-count sketch per group "
    "(hll_sketch_agg/hll_sketch_estimate): the 100 TB idiom for "
    "COUNT(DISTINCT) — the sketch is a few KB, map-side mergeable, "
    "and reusable (union sketches across partitions/days instead of "
    "re-scanning). tests/test_scale_patterns.py pins the estimate "
    "within 5% of exact (computing the exact count test-side: until "
    "r6 the operator shipped count_distinct alongside the sketch, and "
    "that exact-distinct key shuffle buried the sketch's entire win — "
    "228s of its 100x wall was the comparison column, not the sketch; "
    "caught by the r6 probe sweep). Rows-only: the estimate is "
    "implementation-defined, DuckDB's HLL differs.",
)
def q_agg_hll(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("l_orderkey"), F.lit(14))
        ).alias("approx_distinct_orders")
    )


@register(
    "q_agg_unpivot",
    family="aggregates",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           count(*) AS n,
           round(sum(CAST(val AS DECIMAL(18,6))), 2) AS total
    FROM long GROUP BY l_returnflag, measure
    """,
    doc="Unpivot (wide->long, pivot's inverse) via DataFrame.unpivot / "
    "melt: three measure columns become (measure, val) rows, then one "
    "hash agg. Physically a zero-shuffle row expansion (x3 rows, "
    "narrow) feeding a partial-aggregated groupBy — the UNION ALL "
    "plan the oracle writes would scan the fact three times; unpivot "
    "scans once.",
)
def q_agg_unpivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn(
        "measure", F.expr("substring(measure, 3)")  # l_quantity -> quantity
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("val").cast("decimal(18,6)")).cast("double"), 2).alias(
            "total"
        ),
    )


@register(
    "q_agg_corr",
    family="aggregates",
    oracle="""
    -- every rounded stat gets "+ 0.0": IEEE x + 0.0 collapses -0.0 to
    -- +0.0, which otherwise renders as "-0" vs "0" in the driver's %.6g
    -- value hash (round(covar_pop(...)) of a ~-1e-9 covariance hit this)
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) + 0.0       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS cov_qty_price,
           round(covar_pop(l_discount, l_tax), 6) + 0.0            AS cov_disc_tax,
           round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope_price_per_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bivariate statistics per group: Pearson correlation, "
    "sample/population covariance, regression slope — all single-pass "
    "algebraic aggregates (Welford-style merge states), so they "
    "partial-aggregate map-side like any sum; no second pass over the "
    "data, no window.",
)
def q_agg_corr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + 0.0).alias(
            "corr_qty_price"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + 0.0).alias(
            "cov_qty_price"
        ),
        (F.round(F.covar_pop("l_discount", "l_tax"), 6) + 0.0).alias("cov_disc_tax"),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4) + 0.0).alias(
            "slope_price_per_qty"
        ),
    )


@register(
    "q_agg_collect",
    family="aggregates",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
             AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Set collection per group (collect_set), emitted as a SORTED "
    "joined string: collection order is nondeterministic in any "
    "distributed engine, so the deterministic contract is the sorted "
    "rendering, not the raw array. collect_set state is bounded by "
    "distinct-value cardinality — fine for enum-like columns, a "
    "memory bomb for high-cardinality ones (use approx sketches "
    "there).",
)
def q_agg_collect(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "q_agg_histogram",
    family="aggregates",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 2) AS avg_price
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width histogram build over order totals: bucket id, "
    "count, decimal-exact mean per bucket. One map-side-combinable "
    "aggregation keyed on the bucket id — the distribution-profiling "
    "primitive (bucket count is bounded, so the reduce side is tiny "
    "no matter the corpus size). Decimal sums keep the per-bucket "
    "means engine-identical before rounding.",
)
def q_agg_histogram(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                2,
            ).alias("avg_price"),
        )
    )


@register(
    "q_agg_mode",
    family="aggregates",
    oracle="""
    WITH freq AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS c
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderpriority, c,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY c DESC, o_orderpriority) AS rn
      FROM freq
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, c AS mode_count
    FROM ranked WHERE rn = 1
    """,
    doc="Deterministic mode (most frequent value) per group: two-level "
    "aggregate — count per (group, value), then keep the top value "
    "with an explicit value tie-break (a bare mode() is "
    "nondeterministic on ties in every engine). The first groupBy "
    "partial-aggregates map-side, so the shuffle carries (group, "
    "value) counts, not rows; the second level sees only "
    "O(groups x distinct values) rows — trivially small. This "
    "composition is how mode stays exact at 100 TB; sketch-based "
    "heavy-hitters (q_agg_approx) is the alternative when the value "
    "domain itself explodes.",
)
def q_agg_mode(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    freq = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("c").desc(), F.col("o_orderpriority")
    )
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("c").alias("mode_count"),
        )
    )


@register(
    "q_agg_weighted_median",
    family="aggregates",
    oracle="""
    WITH wq AS (
      SELECT l_returnflag, l_extendedprice AS p,
             CAST(round(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, p,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY p) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM wq
    )
    SELECT l_returnflag,
           min(p) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
    doc="Weighted median (50th weighted percentile): smallest price at "
    "which cumulative quantity-weight reaches half the group total — "
    "the robust 'typical price per unit sold' statistic percentile_"
    "approx can only approximate. Weights are exact integers "
    "(quantity is integral), the cumulative sum is a keyed RANGE "
    "window (ties accumulate together, so the crossing price is "
    "well-defined and engine-independent), and the median is a raw "
    "column passthrough — no float aggregation anywhere, no rounding "
    "needed. Scale: one shuffle on the group key; the window sorts "
    "within partitions only. For a 100 TB single-group variant the "
    "same statistic falls out of a fixed-width histogram sketch + one "
    "refinement pass; with real group keys this keyed-window form is "
    "the right shape.",
)
def q_agg_weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.round("l_quantity").cast("long").alias("w"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy("p")
    wa = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "p",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wa).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("p").alias("weighted_median_price"),
            F.min("tw").cast("long").alias("total_weight"),
        )
    )


@register(
    "q_agg_entropy",
    family="aggregates",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tok2 AS (SELECT source, w FROM tok WHERE w <> ''),
    cnt AS (SELECT source, w, count(*) AS c FROM tok2 GROUP BY source, w),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY source)
    SELECT c.source,
           CAST(max(t.t) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CAST(round(-(c.c * 1.0 / t.t) * ln(c.c * 1.0 / t.t), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) + 0.0 AS entropy
    FROM cnt c JOIN tot t USING (source)
    GROUP BY c.source
    """,
    doc="Per-domain token Shannon entropy (nats) + vocabulary size — "
    "the corpus-diversity diagnostic behind mixture decisions (a "
    "low-entropy domain is boilerplate-heavy and over-weighted by raw "
    "token counts; Dolma/Pile-style recipes inspect exactly this). "
    "Determinism: each -p·ln(p) term is a float product of "
    "bitwise-identical inputs (int/int division + ln), rounded to 6 "
    "and decimal-summed (the lm_score pattern) so the per-group sum "
    "is order-insensitive cross-engine. Scale: (source, token) counts "
    "partial-aggregate map-side; per-source totals are O(#domains) "
    "and broadcast back; no driver materialization.",
)
def q_agg_entropy(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    p = F.col("c") * 1.0 / F.col("t")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("t").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("vocab"),
            (F.sum(term).cast("double") + 0.0).alias("entropy"),
        )
    )


@register(
    "q_agg_ttest",
    family="aggregates",
    oracle="""
    WITH s AS (
      SELECT
        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
        CAST(sum(CASE WHEN event_type = 'click'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
        CAST(sum(CASE WHEN event_type = 'click'
                 THEN CAST(CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))
                 END) AS DOUBLE) AS q1,
        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
        CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
        CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(CAST(value AS DECIMAL(18,2))
                           * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))
                 END) AS DOUBLE) AS q2
      FROM events
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase,
           (s1 / n1) AS mean_click,
           (s2 / n2) AS mean_purchase,
           ((q1 - (s1 * s1) / n1) / (n1 - 1)) AS var_click,
           ((q2 - (s2 * s2) / n2) / (n2 - 1)) AS var_purchase,
           ((s1 / n1) - (s2 / n2))
             / sqrt(((q1 - (s1 * s1) / n1) / (n1 - 1)) / n1
                    + ((q2 - (s2 * s2) / n2) / (n2 - 1)) / n2) AS t_stat
    FROM s
    """,
    doc="Welch two-sample t-statistic between click and purchase "
    "values — the A/B-experiment primitive. Every statistic derives "
    "from THREE exact decimal sums per group (n, Σv, Σv² — v is "
    "cent-quantized so v and v² are exact decimals), then identical "
    "float expression trees on both engines: no rounding anywhere, "
    "results are bitwise (sqrt is IEEE-correctly-rounded). Scale: "
    "one map-side-combined aggregation over the fact — the sufficient "
    "statistics are 6 numbers, the canonical 'don't ship data to the "
    "stats library' pattern (same trick as q_agg_stats's moments).",
)
def q_agg_ttest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    vsq = (vdec * vdec).cast("decimal(28,4)")
    click = F.col("event_type") == "click"
    buy = F.col("event_type") == "purchase"
    s = ev.agg(
        F.sum(F.when(click, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(click, vdec)).cast("double").alias("s1"),
        F.sum(F.when(click, vsq)).cast("double").alias("q1"),
        F.sum(F.when(buy, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(buy, vdec)).cast("double").alias("s2"),
        F.sum(F.when(buy, vsq)).cast("double").alias("q2"),
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    var1 = (q1 - (s1 * s1) / n1) / (n1 - 1)
    var2 = (q2 - (s2 * s2) / n2) / (n2 - 1)
    return s.select(
        n1.cast("long").alias("n_click"),
        n2.cast("long").alias("n_purchase"),
        (s1 / n1).alias("mean_click"),
        (s2 / n2).alias("mean_purchase"),
        var1.alias("var_click"),
        var2.alias("var_purchase"),
        (((s1 / n1) - (s2 / n2)) / F.sqrt(var1 / n1 + var2 / n2)).alias("t_stat"),
    )


@register(
    "q_agg_gini",
    family="aggregates",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY round(o_totalprice * 100), o_orderkey
             ) AS rk
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           (2.0 * sum(rk * cents)) / (count(*) * 1.0 * sum(cents))
             - (count(*) + 1.0) / count(*) AS gini
    FROM ranked
    GROUP BY o_orderpriority
    """,
    doc="Gini coefficient of order-value concentration per priority "
    "class — the inequality statistic behind 'top-x% of orders carry "
    "y% of revenue' dashboards. Uses the rank formulation "
    "G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-ranked exact "
    "cents: both sums accumulate in DECIMAL(38,0) — the analog of "
    "DuckDB's automatic HUGEINT sum — so every intermediate is an "
    "exact integer and the final expression is identical float "
    "arithmetic on identical integers, bitwise cross-engine. Scale: one "
    "keyed window (rank within priority class) + one hash agg — the "
    "same per-group-sort shape as q_window_rank; for a single "
    "astronomically-hot group the two-pass global-rank machinery "
    "(q_sort_global_rank) substitutes directly.",
)
def q_agg_gini(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.round(F.col("o_totalprice") * 100), "o_orderkey"
    )
    ranked = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.row_number().over(w).alias("rk"),
    )
    n = F.count("*")
    # rank x cents summed over a group exceeds int64 once group rows pass
    # ~3M (caught by the r6 100x probe: try_add overflow) — ride the
    # DECIMAL(38,0) accumulator, the analog of DuckDB's automatic HUGEINT
    # sum, and convert to double at the same point DuckDB does. s0 gets
    # the same treatment for symmetry: sum(cents) clears int64 too once a
    # group passes ~10^10 rows, and DuckDB is HUGEINT there as well.
    s0 = F.sum(F.col("cents").cast("decimal(38,0)"))
    s1 = F.sum((F.col("rk") * F.col("cents")).cast("decimal(38,0)")).cast("double")
    return ranked.groupBy("o_orderpriority").agg(
        n.cast("long").alias("n_orders"),
        s0.cast("long").alias("total_cents"),
        ((2.0 * s1) / (n * 1.0 * s0.cast("double")) - (n + 1.0) / n).alias("gini"),
    )


@register(
    "q_agg_benford",
    family="aggregates",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, count(*) AS obs FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM c)
    SELECT c.digit,
           CAST(c.obs AS BIGINT) AS observed,
           (c.obs * 1.0 / t.n) AS observed_share,
           log10(1.0 + 1.0 / c.digit) AS benford_share,
           ((c.obs * 1.0 / t.n) - log10(1.0 + 1.0 / c.digit))
             * ((c.obs * 1.0 / t.n) - log10(1.0 + 1.0 / c.digit))
             / log10(1.0 + 1.0 / c.digit) AS chi2_term
    FROM c CROSS JOIN tot t
    ORDER BY c.digit
    """,
    doc="Benford's-law first-digit audit over order values — the "
    "classic fraud / synthetic-data / unit-mixup detector: observed "
    "leading-digit shares vs log10(1+1/d), with the per-digit "
    "chi-square contribution. First digits come from the exact-cents "
    "INTEGER rendered as a string (float formatting differs across "
    "engines; integer rendering cannot), counts are exact, and every "
    "float column is the same expression of the same exact integers "
    "— bitwise. Scale: one map-side-combined 9-group aggregation + a "
    "broadcast scalar; runs at scan throughput.",
)
def q_agg_benford(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(F.count("*").alias("obs"))
    tot = c.agg(F.sum("obs").cast("long").alias("n"))
    share = F.col("obs") * 1.0 / F.col("n")
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.join(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("obs").cast("long").alias("observed"),
            share.alias("observed_share"),
            benford.alias("benford_share"),
            ((share - benford) * (share - benford) / benford).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@register(
    "q_agg_ols",
    family="aggregates",
    oracle="""
    WITH u AS (
      SELECT CAST(round(l_quantity) AS DECIMAL(38,0)) AS x1,
             CAST(round(l_discount * 100) AS DECIMAL(38,0)) AS x2,
             CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS sx1,
             CAST(sum(x2) AS DOUBLE) AS sx2,
             CAST(sum(y)  AS DOUBLE) AS sy,
             CAST(sum(x1 * x1) AS DOUBLE) AS sx1x1,
             CAST(sum(x2 * x2) AS DOUBLE) AS sx2x2,
             CAST(sum(x1 * x2) AS DOUBLE) AS sx1x2,
             CAST(sum(x1 * y)  AS DOUBLE) AS sx1y,
             CAST(sum(x2 * y)  AS DOUBLE) AS sx2y
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ((sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
             - sx1 * (sx1y * sx2x2 - sx1x2 * sx2y)
             + sx2 * (sx1y * sx1x2 - sx1x1 * sx2y))
            / (n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
               - sx1 * (sx1 * sx2x2 - sx2 * sx1x2)
               + sx2 * (sx1 * sx1x2 - sx2 * sx1x1))) AS beta0,
           ((n * (sx1y * sx2x2 - sx1x2 * sx2y)
             - sy * (sx1 * sx2x2 - sx2 * sx1x2)
             + sx2 * (sx1 * sx2y - sx2 * sx1y))
            / (n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
               - sx1 * (sx1 * sx2x2 - sx2 * sx1x2)
               + sx2 * (sx1 * sx1x2 - sx2 * sx1x1))) AS beta1,
           ((n * (sx1x1 * sx2y - sx1y * sx1x2)
             - sx1 * (sx1 * sx2y - sx2 * sx1y)
             + sy * (sx1 * sx1x2 - sx2 * sx1x1))
            / (n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
               - sx1 * (sx1 * sx2x2 - sx2 * sx1x2)
               + sx2 * (sx1 * sx1x2 - sx2 * sx1x1))) AS beta2
    FROM s
    """,
    doc="Closed-form multivariate OLS — price_cents ~ quantity + "
    "discount_cents — trained in ONE distributed aggregation: the "
    "normal equations need only 9 sufficient statistics, all exact "
    "DECIMAL(38,0) sums of integer units (no float accumulates "
    "anywhere, immune to both summation order and long overflow), "
    "then a driver-free Cramer's-rule solve as identical float "
    "expressions of identical exact inputs — bitwise cross-engine. "
    "This is the 'ship sufficient statistics, not data' pattern that "
    "trains linear/GLM-ish models at 100 TB with zero extra "
    "infrastructure: map-side partial sums, a 9-number reduce, O(1) "
    "driver math.",
)
def q_agg_ols(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    x1 = F.round("l_quantity").cast("decimal(38,0)")
    x2 = F.round(F.col("l_discount") * 100).cast("decimal(38,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    u = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    s = u.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
    )
    n, sx1, sx2, sy = F.col("n"), F.col("sx1"), F.col("sx2"), F.col("sy")
    sx1x1, sx2x2, sx1x2 = F.col("sx1x1"), F.col("sx2x2"), F.col("sx1x2")
    sx1y, sx2y = F.col("sx1y"), F.col("sx2y")
    det = (
        n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
        - sx1 * (sx1 * sx2x2 - sx2 * sx1x2)
        + sx2 * (sx1 * sx1x2 - sx2 * sx1x1)
    )
    det0 = (
        sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
        - sx1 * (sx1y * sx2x2 - sx1x2 * sx2y)
        + sx2 * (sx1y * sx1x2 - sx1x1 * sx2y)
    )
    det1 = (
        n * (sx1y * sx2x2 - sx1x2 * sx2y)
        - sy * (sx1 * sx2x2 - sx2 * sx1x2)
        + sx2 * (sx1 * sx2y - sx2 * sx1y)
    )
    det2 = (
        n * (sx1x1 * sx2y - sx1y * sx1x2)
        - sx1 * (sx1 * sx2y - sx2 * sx1y)
        + sy * (sx1 * sx1x2 - sx2 * sx1x1)
    )
    return s.select(
        n.cast("long").alias("n_rows"),
        (det0 / det).alias("beta0"),
        (det1 / det).alias("beta1"),
        (det2 / det).alias("beta2"),
    )


@register(
    "q_agg_chisq",
    family="aggregates",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(extract(hour FROM ts) // 6 AS BIGINT) AS day_quarter,
             count(*) AS obs
      FROM events
      GROUP BY event_type, CAST(extract(hour FROM ts) // 6 AS BIGINT)
    ),
    rows_t AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
               FROM cells GROUP BY event_type),
    cols_t AS (SELECT day_quarter, CAST(sum(obs) AS BIGINT) AS ct
               FROM cells GROUP BY day_quarter),
    tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CAST(round(
             (c.obs - (r.rt * 1.0 * co.ct) / t.n)
             * (c.obs - (r.rt * 1.0 * co.ct) / t.n)
             / ((r.rt * 1.0 * co.ct) / t.n), 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS chi2
    FROM cells c
    JOIN rows_t r ON r.event_type = c.event_type
    JOIN cols_t co ON co.day_quarter = c.day_quarter
    CROSS JOIN tot t
    """,
    doc="Chi-square test of independence: event type × quarter-of-day "
    "contingency table — 'does behavior depend on time of day?', the "
    "categorical-association workhorse. Observed counts and both "
    "marginals are exact integers; each cell's (O−E)²/E term is an "
    "identical float expression of exact integers, rounded and "
    "decimal-summed so the statistic is order-insensitive "
    "cross-engine. Scale: one map-side-combined aggregation to the "
    "contingency cells (|types|×4 rows), then everything is "
    "broadcast-sized — the 'reduce to sufficient statistics first' "
    "pattern again.",
)
def q_agg_chisq(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dq = (F.hour("ts") / 6).cast("long")
    cells = (
        ev.groupBy(F.col("event_type"), dq.alias("day_quarter"))
        .agg(F.count("*").alias("obs"))
    )
    rows_t = cells.groupBy("event_type").agg(F.sum("obs").cast("long").alias("rt"))
    cols_t = cells.groupBy("day_quarter").agg(F.sum("obs").cast("long").alias("ct"))
    tot = cells.agg(F.sum("obs").cast("long").alias("n"))
    e = (F.col("rt") * 1.0 * F.col("ct")) / F.col("n")
    term = F.round((F.col("obs") - e) * (F.col("obs") - e) / e, 6).cast(
        "decimal(18,6)"
    )
    return (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "day_quarter")
        .join(F.broadcast(tot))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(term).cast("double").alias("chi2"),
        )
    )


@register(
    "q_agg_cramers_v",
    family="aggregates",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(extract(hour FROM ts) // 6 AS BIGINT) AS day_quarter,
             count(*) AS obs
      FROM events
      GROUP BY event_type, CAST(extract(hour FROM ts) // 6 AS BIGINT)
    ),
    rows_t AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
               FROM cells GROUP BY event_type),
    cols_t AS (SELECT day_quarter, CAST(sum(obs) AS BIGINT) AS ct
               FROM cells GROUP BY day_quarter),
    tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS r,
                   CAST(count(DISTINCT day_quarter) AS BIGINT) AS c
            FROM cells),
    chi AS (
      SELECT t.n, t.r, t.c,
             CAST(sum(CAST(round(
               (cl.obs - (rr.rt * 1.0 * co.ct) / t.n)
               * (cl.obs - (rr.rt * 1.0 * co.ct) / t.n)
               / ((rr.rt * 1.0 * co.ct) / t.n), 6) AS DECIMAL(18,6)))
               AS DOUBLE) AS chi2
      FROM cells cl
      JOIN rows_t rr ON rr.event_type = cl.event_type
      JOIN cols_t co ON co.day_quarter = cl.day_quarter
      CROSS JOIN tot t
      GROUP BY t.n, t.r, t.c
    )
    SELECT r AS n_rows_, c AS n_cols_, round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM chi
    """,
    doc="Cramér's V — the [0,1]-normalized effect size of the "
    "event-type × quarter-of-day association: V = sqrt(χ² / (n · "
    "min(r−1, c−1))). χ² alone grows with n, so two tables of "
    "different sizes can't be compared by it; V is what feature "
    "selection and data-card tooling actually report for "
    "categorical-categorical dependence. Reuses q_agg_chisq's "
    "decimal-summed statistic (each (O−E)²/E term is an identical "
    "float expression of exact integers, rounded then decimal-summed, "
    "so the sum is order-insensitive); sqrt of the identical double "
    "is IEEE-deterministic cross-engine. Scale: one map-side-combined "
    "agg to the contingency cells, everything after is "
    "broadcast-sized.",
)
def q_agg_cramers_v(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dq = (F.hour("ts") / 6).cast("long")
    cells = ev.groupBy(F.col("event_type"), dq.alias("day_quarter")).agg(
        F.count("*").alias("obs")
    )
    rows_t = cells.groupBy("event_type").agg(F.sum("obs").cast("long").alias("rt"))
    cols_t = cells.groupBy("day_quarter").agg(F.sum("obs").cast("long").alias("ct"))
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("event_type").cast("long").alias("r"),
        F.countDistinct("day_quarter").cast("long").alias("c"),
    )
    e = (F.col("rt") * 1.0 * F.col("ct")) / F.col("n")
    term = F.round((F.col("obs") - e) * (F.col("obs") - e) / e, 6).cast(
        "decimal(18,6)"
    )
    chi = (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "day_quarter")
        .join(F.broadcast(tot))
        .groupBy("n", "r", "c")
        .agg(F.sum(term).cast("double").alias("chi2"))
    )
    return chi.select(
        F.col("r").alias("n_rows_"),
        F.col("c").alias("n_cols_"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


@register(
    "q_agg_mannwhitney",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1v,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2v
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY CAST(round(value * 100) AS BIGINT)
    ),
    c AS (
      SELECT n1v, n2v,
             sum(n1v + n2v) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS cumtot
      FROM g
    ),
    s AS (
      SELECT CAST(sum(n1v) AS BIGINT) AS n1,
             CAST(sum(n2v) AS BIGINT) AS n2,
             CAST(sum(n1v * (2 * (cumtot - (n1v + n2v)) + (n1v + n2v) + 1))
                  AS BIGINT) AS r1x2
      FROM c
    )
    SELECT n1, n2,
           (r1x2 - n1 * (n1 + 1)) / 2.0 AS u_stat,
           ((r1x2 - n1 * (n1 + 1)) / 2.0 - (n1 * 1.0 * n2) / 2.0)
             / sqrt((n1 * 1.0 * n2) * (n1 + n2 + 1) / 12.0) AS z_approx
    FROM s
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) between click and purchase "
    "values — the nonparametric A/B test for non-normal metrics, "
    "complementing q_agg_ttest. Ranks never materialize per row: "
    "values collapse to the cent-quantized DOMAIN (one row per "
    "distinct value with per-group counts), midranks come from a "
    "cumulative count over that domain, and DOUBLED midranks keep "
    "every quantity an exact BIGINT (ties produce half-ranks; 2x "
    "clears the fraction) — so U is exact and z is one float "
    "expression of exact integers (large-sample normal approx, no "
    "tie-variance correction; same formula both engines). Scale: "
    "per-value counts partial-aggregate; the unpartitioned cumsum "
    "window runs over |value domain| rows (~5k for cent-quantized "
    "bounded values), not the event count — domain-bounded, not "
    "corpus-bounded.",
)
def q_agg_mannwhitney(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy(cents.alias("cents")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("n1v"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n2v"),
    )
    # BOUNDED global window: runs over the distinct CENTS-value table
    # (value domain, not row count — SCALE.md §global-windows).
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = F.col("n1v") + F.col("n2v")
    c = g.select("n1v", "n2v", F.sum(tot).over(w).alias("cumtot"))
    dmid = 2 * (F.col("cumtot") - (F.col("n1v") + F.col("n2v"))) + (
        F.col("n1v") + F.col("n2v")
    ) + 1
    s = c.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("n2v").cast("long").alias("n2"),
        F.sum(F.col("n1v") * dmid).cast("long").alias("r1x2"),
    )
    n1, n2, r1x2 = F.col("n1"), F.col("n2"), F.col("r1x2")
    u = (r1x2 - n1 * (n1 + 1)) / 2.0
    z = (u - (n1 * 1.0 * n2) / 2.0) / F.sqrt(
        (n1 * 1.0 * n2) * (n1 + n2 + 1) / 12.0
    )
    return s.select(n1, n2, u.alias("u_stat"), z.alias("z_approx"))


@register(
    "q_agg_ks_test",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1v,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2v
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY CAST(round(value * 100) AS BIGINT)
    ),
    c AS (
      SELECT
        sum(n1v) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c1,
        sum(n2v) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c2
      FROM g
    ),
    t AS (SELECT CAST(max(c1) AS BIGINT) AS n1, CAST(max(c2) AS BIGINT) AS n2
          FROM c)
    SELECT t.n1, t.n2,
           max(abs(c.c1 * 1.0 / t.n1 - c.c2 * 1.0 / t.n2)) AS d_stat,
           max(abs(c.c1 * 1.0 / t.n1 - c.c2 * 1.0 / t.n2))
             * sqrt((t.n1 * 1.0 * t.n2) / (t.n1 + t.n2)) AS ks_stat
    FROM c CROSS JOIN t
    GROUP BY t.n1, t.n2
    """,
    doc="Two-sample Kolmogorov-Smirnov test (click vs purchase value "
    "distributions): D = max CDF gap over the cent-quantized value "
    "DOMAIN — each per-value CDF point is one float division of "
    "exact cumulative counts (bitwise), and max is order-insensitive, "
    "so D and the scaled KS statistic are exact with zero rounding. "
    "Completes the A/B toolkit: t-test (means), Mann-Whitney "
    "(ranks), KS (whole distribution). Scale: same domain-bounded "
    "shape as q_agg_mannwhitney — per-value counts partial-aggregate, "
    "the cumsum window runs over |value domain| rows.",
)
def q_agg_ks_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy(cents.alias("cents")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("n1v"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n2v"),
    )
    # BOUNDED global window: runs over the distinct CENTS-value table
    # (value domain, not row count — SCALE.md §global-windows).
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        F.sum("n1v").over(w).alias("c1"), F.sum("n2v").over(w).alias("c2")
    )
    tt = c.agg(
        F.max("c1").cast("long").alias("n1"), F.max("c2").cast("long").alias("n2")
    )
    gap = F.abs(F.col("c1") * 1.0 / F.col("n1") - F.col("c2") * 1.0 / F.col("n2"))
    return (
        c.join(F.broadcast(tt))
        .groupBy("n1", "n2")
        .agg(
            F.max(gap).alias("d_stat"),
            (
                F.max(gap)
                * F.sqrt((F.col("n1") * 1.0 * F.col("n2")) / (F.col("n1") + F.col("n2")))
            ).alias("ks_stat"),
        )
    )


# (column, cross-engine-safe min/max rendering). Money renders as exact
# cents (float formatting differs between engines); everything else has
# an identical VARCHAR cast on both sides.
_PROFILE_COLS = (
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "cents":
            lo = f"CAST(CAST(round(min({c}) * 100) AS BIGINT) AS VARCHAR)"
            hi = f"CAST(CAST(round(max({c}) * 100) AS BIGINT) AS VARCHAR)"
        else:
            lo, hi = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col, CAST(count({c}) AS BIGINT) AS n_nonnull, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{lo} AS min_val, {hi} AS max_val FROM orders"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col"


@register(
    "q_profile_columns",
    family="aggregates",
    oracle=_profile_oracle(),
    doc="Table profiling: per-column non-null/null/distinct counts and "
    "min/max in ONE aggregate pass over the table, stacked to a "
    "(col, stats) long form on the single result row — the "
    "data-quality summary every lake onboarding step runs. The six "
    "exact countDistincts share ONE Expand (7x in-partition row "
    "multiplication collapsed by partial aggregation before anything "
    "moves), then exactly two exchanges: the distinct-key shuffle and "
    "a single-row gather; min/max/count are map-side combinable. "
    "Min/max render "
    "cross-engine-safely: money as exact cents, the rest via "
    "identical VARCHAR casts. At 100 TB swap the exact distincts for "
    "approx_count_distinct (HLL, no Expand, one pass) — the oracle "
    "pins the exact form at test SF.",
)
def q_profile_columns(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c, kind in _PROFILE_COLS:
        if kind == "cents":
            lo = F.round(F.min(c) * 100).cast("long").cast("string")
            hi = F.round(F.max(c) * 100).cast("long").cast("string")
        else:
            lo, hi = F.min(c).cast("string"), F.max(c).cast("string")
        aggs += [
            F.count(c).alias(f"_n_{c}"),
            F.countDistinct(c).alias(f"_d_{c}"),
            lo.alias(f"_lo_{c}"),
            hi.alias(f"_hi_{c}"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"_n_{c}").alias("n_nonnull"),
                (F.col("_total") - F.col(f"_n_{c}")).alias("n_null"),
                F.col(f"_d_{c}").alias("n_distinct"),
                F.col(f"_lo_{c}").alias("min_val"),
                F.col(f"_hi_{c}").alias("max_val"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("col")
    )


@register(
    "q_profile_columns_sketch",
    family="aggregates",
    oracle=None,  # HLL sketch values are engine-specific; pytest pins the
    # relative error vs the exact profile instead
    doc="Table profiling, 100 TB default: identical long-form output to "
    "q_profile_columns but distinct counts come from "
    "approx_count_distinct (HyperLogLog++, rsd=0.02). The exact "
    "variant's countDistinct on the table's unique key shuffles every "
    "key (its own 1x/10x/100x probe is linear in distincts); the "
    "sketch folds each column into a fixed few-KB register set that "
    "merges map-side, so the whole profile is ONE pass, NO Expand, "
    "and exactly one partial->final aggregate exchange regardless of "
    "cardinality. Deterministic (hash-based, no rng) so repeated runs "
    "hash-stably. tests/test_scale_patterns.py pins each approx count "
    "within 3*rsd of the exact operator and test_plans pins the "
    "Expand-free single-exchange shape.",
)
def q_profile_columns_sketch(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c, kind in _PROFILE_COLS:
        if kind == "cents":
            lo = F.round(F.min(c) * 100).cast("long").cast("string")
            hi = F.round(F.max(c) * 100).cast("long").cast("string")
        else:
            lo, hi = F.min(c).cast("string"), F.max(c).cast("string")
        aggs += [
            F.count(c).alias(f"_n_{c}"),
            F.approx_count_distinct(c, 0.02).alias(f"_d_{c}"),
            lo.alias(f"_lo_{c}"),
            hi.alias(f"_hi_{c}"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"_n_{c}").alias("n_nonnull"),
                (F.col("_total") - F.col(f"_n_{c}")).alias("n_null"),
                F.col(f"_d_{c}").alias("n_distinct_approx"),
                F.col(f"_lo_{c}").alias("min_val"),
                F.col(f"_hi_{c}").alias("max_val"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*").orderBy("col")


_BOOT_R = 32          # bootstrap replicates
_BOOT_A = 2654435761  # Knuth multiplicative-hash constant
_BOOT_B = 40503
_BOOT_M = 100000
# inverse-CDF thresholds of Poisson(1) scaled to _BOOT_M:
# P(0)=.36788 P(<=1)=.73576 P(<=2)=.91970 P(<=3)=.98101
_BOOT_W = ((36788, 0), (73576, 1), (91970, 2), (98101, 3))


def _boot_oracle() -> str:
    w = "CASE " + " ".join(
        f"WHEN u < {thr} THEN {val}" for thr, val in _BOOT_W
    ) + " ELSE 4 END"
    return f"""
    WITH x AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), expanded AS (
      -- event_id is reduced mod M BEFORE the multiply: (e%M)*A == e*A (mod M)
      -- exactly, and e*A overflows int64 once ids pass ~3.5e9 (caught by the
      -- r6 100x probe, where replica ids reach 1e10)
      SELECT r, cents,
             (((event_id % {_BOOT_M}) * {_BOOT_A} + r * {_BOOT_B})
              % {_BOOT_M}) AS u
      FROM x CROSS JOIN (SELECT unnest(range({_BOOT_R})) AS r)
    ), weighted AS (SELECT r, cents, {w} AS w FROM expanded)
    SELECT CAST(r AS BIGINT)                    AS replicate,
           CAST(sum(w) AS BIGINT)               AS n_eff,
           sum(w * cents) / (100.0 * sum(w))    AS mean_value
    FROM weighted GROUP BY r ORDER BY r
    """


@register(
    "q_agg_bootstrap",
    family="aggregates",
    oracle=_boot_oracle(),
    doc="Distributed Poisson bootstrap of a mean (the resampling "
    "scheme that works when n doesn't fit anywhere: each row draws "
    "an independent Poisson(1) multiplicity per replicate instead of "
    "sampling WITH replacement globally — Chamandy et al., "
    "'Estimating Uncertainty for Massive Data Streams', Google 2012). "
    "One pass: explode R=32 replicate ids per row (map-side, no "
    "shuffle of the base), weight w ~ inverse-CDF of Poisson(1), one "
    "keyed aggregation to R rows of (n_eff, mean). DETERMINISM is "
    "the engine trick: the multiplicity comes from integer "
    "arithmetic on (event_id, replicate) — a multiplicative-hash "
    "LCG, identical in any engine — not from rand() or an "
    "engine-specific hash, so the bootstrap distribution is exactly "
    "reproducible cross-engine (hash-checked) and across retries/ "
    "repartitions, which a rand()-based bootstrap can never be. "
    "Means stay exact-integer until one final float division. The "
    "consumer reads the 32-row output as the sampling distribution "
    "(CI = its quantiles).",
)
def q_agg_bootstrap(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    x = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rep = x.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    )
    # (e % M) * A == e * A (mod M) exactly — the pre-reduction keeps the
    # multiply inside int64 for arbitrarily large ids (raw e*A overflows
    # once ids pass ~3.5e9; caught by the r6 100x probe at replica-shifted
    # ids ~1e10). Mirrored in the oracle.
    u = ((F.col("event_id") % _BOOT_M) * _BOOT_A + F.col("r") * _BOOT_B) % _BOOT_M
    w = F.when(u < _BOOT_W[0][0], _BOOT_W[0][1])
    for thr, val in _BOOT_W[1:]:
        w = w.when(u < thr, val)
    w = w.otherwise(4)
    return (
        rep.select("r", "cents", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            (F.sum(F.col("w") * F.col("cents")) / (100.0 * F.sum("w"))).alias(
                "mean_value"
            ),
        )
        .select(F.col("r").cast("long").alias("replicate"), "n_eff", "mean_value")
        .orderBy("replicate")
    )


@register(
    "q_agg_percentile_sketch",
    family="aggregates",
    oracle=None,  # sketch estimates are implementation-specific; pytest
    # pins them against the exact percentiles instead
    doc="Per-group quantiles, 100 TB default: approx_percentile "
    "(Greenwald-Khanna sketch, accuracy=10000) over the same groups "
    "as q_agg_percentile. The exact form buffers and sorts every "
    "group's values in the aggregation buffer — memory grows with "
    "group size; the sketch holds O(accuracy) entries per group and "
    "merges map-side, so a billion-row group costs the same buffer "
    "as a thousand-row one. Deterministic (no rng). "
    "tests/test_scale_patterns.py pins each sketch quantile inside "
    "the one-sided GK rank-error bound vs the exact operator.",
)
def q_agg_percentile_sketch(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(
                F.expr(f"approx_percentile(o_totalprice, {q}, 10000)"), 4
            ).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


@register(
    "q_agg_moments",
    family="aggregates",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS c
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)        AS n,
             CAST(sum(c)             AS DOUBLE) AS s1,
             CAST(sum(c*c)           AS DOUBLE) AS s2,
             CAST(sum(c*c*c)         AS DOUBLE) AS s3,
             CAST(sum(c*c*c*c)       AS DOUBLE) AS s4
      FROM c GROUP BY 1
    ),
    m AS (
      SELECT event_type, n,
             s1 / n                                          AS mean,
             s2 / n - (s1 / n) * (s1 / n)                    AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                    + 2 * (s1 / n) * (s1 / n) * (s1 / n)     AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT event_type, n,
           round(mean, 6)                    AS mean_cents,
           round(m2, 6)                      AS var_cents,
           round(m3 / (m2 * sqrt(m2)), 6)    AS skewness,
           round(m4 / (m2 * m2) - 3, 6)      AS excess_kurtosis
    FROM m
    """,
    doc="Exact distribution moments (mean/variance/skewness/excess "
    "kurtosis) per series — the profiling stats a data-quality monitor "
    "tracks per batch. Built-in skewness()/kurtosis() would diverge "
    "cross-engine (sample-vs-population conventions AND float "
    "summation order), so the operator aggregates exact integer POWER "
    "SUMS instead — cents as DECIMAL(38,0), c..c^4 all exact up to "
    "~1e38, mergeable map-side like any sum — and derives the moments "
    "with an identical floating expression tree in both engines: "
    "divisions/multiplies of exactly-equal doubles plus sqrt (IEEE "
    "correctly-rounded; never pow(), whose libm vs JVM results differ "
    "by 1 ulp — registry trap 5). Scale: one map-side-combinable "
    "groupBy; the shuffle carries 6 numbers per series. The power-sum "
    "vector is also the mergeable per-shard sketch a 100 TB profiler "
    "would store per file/partition and fold — same math as "
    "q_profile_columns_sketch's HLL but for moments.",
)
def q_agg_moments(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("decimal(19,0)")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = ev.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("c"))).cast("double").alias("s1"),
        F.sum(dec(F.col("c") * F.col("c"))).cast("double").alias("s2"),
        F.sum(dec(F.col("c") * F.col("c") * F.col("c"))).cast("double").alias("s3"),
        F.sum(
            dec(F.col("c") * F.col("c") * F.col("c") * F.col("c"))
        ).cast("double").alias("s4"),
    )
    s1n = F.col("s1") / F.col("n")
    s2n = F.col("s2") / F.col("n")
    s3n = F.col("s3") / F.col("n")
    s4n = F.col("s4") / F.col("n")
    m = s.select(
        "event_type",
        "n",
        s1n.alias("mean"),
        (s2n - s1n * s1n).alias("m2"),
        (s3n - F.lit(3) * s1n * s2n + F.lit(2) * s1n * s1n * s1n).alias("m3"),
        (
            s4n
            - F.lit(4) * s1n * s3n
            + F.lit(6) * s1n * s1n * s2n
            - F.lit(3) * s1n * s1n * s1n * s1n
        ).alias("m4"),
    )
    m2 = F.col("m2")
    return m.select(
        "event_type",
        "n",
        F.round("mean", 6).alias("mean_cents"),
        F.round(m2, 6).alias("var_cents"),
        F.round(F.col("m3") / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(F.col("m4") / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


# Pairs for the one-pass covariance matrix: exact integer encodings of the
# four lineitem measures (unit factor = what one integer step is worth).
_COVAR_COLS = (
    ("qty", 1),        # whole units
    ("price_c", 100),  # cents
    ("disc_b", 100),   # basis points of 1.0 (0.01 steps)
    ("tax_b", 100),
)
_COVAR_PAIRS = [
    (_COVAR_COLS[i], _COVAR_COLS[j])
    for i in range(len(_COVAR_COLS))
    for j in range(i, len(_COVAR_COLS))
]


def _covar_oracle() -> str:
    terms = ",\n           ".join(
        f"CAST(sum(CAST({a} AS HUGEINT) * {b}) AS DOUBLE) AS s_{a}_{b}"
        for (a, _), (b, _) in _COVAR_PAIRS
    )
    sums = ",\n           ".join(
        f"CAST(sum(CAST({c} AS HUGEINT)) AS DOUBLE) AS s_{c}"
        for c, _ in _COVAR_COLS
    )
    rows = "\n      UNION ALL\n      ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        f" round((n * s_{a}_{b} - s_{a} * s_{b}) / (n * n * {fa} * {fb}), 6)"
        f" AS covar,"
        f" round((n * s_{a}_{b} - s_{a} * s_{b})"
        f" / (sqrt(n * s_{a}_{a} - s_{a} * s_{a})"
        f"    * sqrt(n * s_{b}_{b} - s_{b} * s_{b})), 6) AS corr"
        f" FROM s"
        for (a, fa), (b, fb) in _COVAR_PAIRS
    )
    return f"""
    WITH enc AS (
      SELECT CAST(round(l_quantity) AS BIGINT)            AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(round(l_discount * 100) AS BIGINT)      AS disc_b,
             CAST(round(l_tax * 100) AS BIGINT)           AS tax_b
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
           {sums},
           {terms}
      FROM enc
    )
    SELECT * FROM (
      {rows}
    ) ORDER BY col_x, col_y
    """


@register(
    "q_agg_covar_matrix",
    family="aggregates",
    oracle=_covar_oracle(),
    doc="Full covariance/correlation matrix of the four lineitem "
    "measures in ONE aggregation pass — the feature-correlation "
    "screen every modeling pipeline runs before training. Each "
    "measure is encoded as exact integers (units/cents/basis "
    "points), all 10 upper-triangle cross-product sums ride "
    "decimal(38,0) accumulators in a single hash agg (map-side "
    "partial, one row out), and covar/corr come from the exact "
    "sufficient statistics with one float division per cell — "
    "no covar_pop/corr builtin, whose float accumulation order "
    "differs per engine. Scale: one pass, zero shuffle beyond the "
    "single-row final agg; 10 extra multiply-adds per row is free "
    "inside whole-stage codegen. The long-form output is a "
    "constant 10 rows regardless of input size.",
)
def q_agg_covar_matrix(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    enc = li.select(
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_b"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_b"),
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c, _ in _COVAR_COLS:
        aggs.append(
            F.sum(F.col(c).cast("decimal(38,0)")).cast("double").alias(f"s_{c}")
        )
    for (a, _), (b, _) in _COVAR_PAIRS:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"s_{a}_{b}")
        )
    s = enc.agg(*aggs)
    cells = []
    n = F.col("n")
    for (a, fa), (b, fb) in _COVAR_PAIRS:
        sxy, sx, sy = F.col(f"s_{a}_{b}"), F.col(f"s_{a}"), F.col(f"s_{b}")
        sxx, syy = F.col(f"s_{a}_{a}"), F.col(f"s_{b}_{b}")
        cells.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.round(
                    (n * sxy - sx * sy) / (n * n * F.lit(float(fa * fb))), 6
                ).alias("covar"),
                F.round(
                    (n * sxy - sx * sy)
                    / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
                    6,
                ).alias("corr"),
            )
        )
    return (
        s.select(F.explode(F.array(*cells)).alias("cell"))
        .select("cell.*")
        .orderBy("col_x", "col_y")
    )


_BASKET_TOPK = 20


@register(
    "q_agg_basket_lift",
    family="aggregates",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets
    ),
    brand_n AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_b
      FROM baskets GROUP BY p_brand
    ),
    pair_n AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.brand_a, p.brand_b, p.n_ab,
             round(CAST(p.n_ab AS DOUBLE) / o.n, 6) AS support,
             round(CAST(p.n_ab AS DOUBLE) * o.n
                   / (CAST(na.n_b AS DOUBLE) * nb.n_b), 6) AS lift
      FROM pair_n p
      JOIN brand_n na ON p.brand_a = na.p_brand
      JOIN brand_n nb ON p.brand_b = nb.p_brand
      CROSS JOIN n_orders o
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY n_ab DESC, brand_a, brand_b) AS r
      FROM scored
    )
    SELECT brand_a, brand_b, n_ab, support, lift
    FROM rk WHERE r <= {_BASKET_TOPK}
    ORDER BY n_ab DESC, brand_a, brand_b
    """,
    doc="Market-basket co-occurrence with support and lift — the "
    "association-rule screen over order contents. Baskets are "
    "DISTINCT (order, brand) rows (brand via a BROADCAST join to "
    "the tiny part dim); the pair count is a self-equi-join on "
    "l_orderkey with brand_a < brand_b, so the blow-up per order is "
    "C(k,2) where k is bounded by order size (<= 7 lines in TPC-H, "
    "<= distinct brands in general) — never cross-corpus quadratic. "
    "Brand marginals and the order total join back as broadcasts "
    "(25 brands, 1 scalar). Counts are exact integers; "
    "support/lift are one float division each, rounded. Top-k "
    "carries a total order (n_ab desc, then pair) so the cut is "
    "deterministic. Scale: shuffles are keyed on l_orderkey "
    "(bounded fan-out) and the 300-ish brand-pair key — both safe "
    "at any corpus size.",
)
def q_agg_basket_lift(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    # r12: repartition on the basket key before the distinct —
    # HashPartitioning(l_orderkey) satisfies the distinct AND both
    # pair-join legs (AQE reuses the identical shuffle stage), so one
    # exchange replaces three (the q_graph_adamic_adar treatment)
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .repartition("l_orderkey")
        .distinct()
    )
    n_orders = baskets.select(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    brand_n = baskets.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb")
    )
    scored = (
        pair_n.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )
    # top-k via orderBy().limit() → TakeOrderedAndProject: distributed
    # partial top-k per partition, never a single-partition WindowExec
    # (the repo-wide probe-pick convention set by q_agg_countmin in r5;
    # the pair table is domain-bounded at C(|brands|,2) so this is
    # consistency, not a scale fix — VERDICT r5 task #4)
    return (
        scored.select("brand_a", "brand_b", "n_ab", "support", "lift")
        .orderBy(F.desc("n_ab"), "brand_a", "brand_b")
        .limit(_BASKET_TOPK)
    )


_CMS_D = 4    # hash rows
_CMS_W = 256  # counters per row
_CMS_PROBE = 10


@register(
    "q_agg_countmin",
    family="aggregates",
    oracle=f"""
    WITH keyed AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
    cells AS (
      SELECT d.seed,
             CAST(('0x' || substr(md5(d.seed || ':' || k), 1, 6)) AS BIGINT)
               % {_CMS_W} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM keyed CROSS JOIN (SELECT unnest(range(1, {_CMS_D} + 1)) AS seed) d
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT k, CAST(count(*) AS BIGINT) AS true_n
      FROM keyed GROUP BY k
    ),
    probe AS (
      SELECT k, true_n,
             row_number() OVER (ORDER BY true_n DESC, k) AS rk
      FROM truth
    ),
    est AS (
      SELECT p.k, p.true_n, p.rk,
             min(c.cnt) AS cms_est
      FROM probe p
      JOIN (SELECT unnest(range(1, {_CMS_D} + 1)) AS seed) d ON true
      JOIN cells c
        ON c.seed = d.seed
       AND c.bucket = CAST(('0x' || substr(md5(d.seed || ':' || p.k), 1, 6))
                           AS BIGINT) % {_CMS_W}
      WHERE p.rk <= {_CMS_PROBE}
      GROUP BY p.k, p.true_n, p.rk
    )
    SELECT CAST(k AS BIGINT) AS l_partkey, true_n, CAST(cms_est AS BIGINT) AS cms_est
    FROM est ORDER BY true_n DESC, l_partkey
    """,
    doc="Count-min sketch — the mergeable frequency-estimation "
    "structure for unbounded key domains (the counter-array sibling "
    "of q_agg_heavy_hitters_sketch's Misra-Gries): 4 hash rows x 256 "
    "counters built in ONE corpus pass (map-side x4 seed explode "
    "collapsing straight into a 1024-cell hash agg — the shuffle "
    "carries cells, never keys), then point estimates for the 10 "
    "hottest keys as min over the 4 addressed counters. The hash is "
    "engine-neutral (first 6 md5 hex digits, the q_text_feature_hash "
    "contract), so the ENTIRE sketch — not just a bound — is "
    "hash-checked against the oracle, overestimation arithmetic "
    "included. Scale: sketch size is a constant 1024 cells whatever "
    "the corpus; merging shards is cell-wise addition (the partial "
    "agg IS the merge); the probe join broadcasts the sketch. "
    "CMS guarantee (est >= true, within eps*N w.h.p.) is visible in "
    "the output columns.",
)
def q_agg_countmin(spark, sf_dir):
    # spread(): the d x md5-per-row bucket compute below otherwise runs
    # entirely inside the parquet file's single input split (the groupBy
    # does its partial agg map-side, i.e. in that one task). The md5
    # family itself must stay — bucket VALUES are part of the sketch.
    li = spread(
        t(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("k")
        )
    )
    seeds = F.array(*[F.lit(i) for i in range(1, _CMS_D + 1)])

    def bucket(seed_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(seed_col.cast("string"), F.lit(":"), key_col)),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    cells = (
        li.select("k", F.explode(seeds).alias("seed"))
        .groupBy("seed", bucket(F.col("seed"), F.col("k")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    truth = li.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    # top-k probe pick as orderBy+limit -> TakeOrderedAndProject: every
    # partition keeps its own k candidates, the driver merges k*P rows —
    # never a single-task sort of the whole distinct-key table (the
    # Window.partitionBy(lit(0)) row_number it replaces funneled every
    # distinct l_partkey through ONE reducer).
    probe = (
        truth.orderBy(F.desc("true_n"), "k")
        .limit(_CMS_PROBE)
        .withColumn("seed", F.explode(seeds))
        .withColumn("bucket", bucket(F.col("seed"), F.col("k")))
    )
    est = (
        probe.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("k", "true_n")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return est.select(
        F.col("k").cast("long").alias("l_partkey"), "true_n", "cms_est"
    ).orderBy(F.desc("true_n"), "l_partkey")


@register(
    "q_agg_countmin_fast",
    family="aggregates",
    oracle=None,  # engine-specific xxhash64: pinned vs the md5 twin
    doc="Production twin of q_agg_countmin: identical 4x256 count-min "
    "sketch and probe shape, but hashed with Spark's native xxhash64 "
    "— one 64-bit JVM hash per (seed, key) instead of four md5 hex "
    "parses, the ~5x-cheaper swap SCALE.md documents for 100 TB "
    "runs. xxhash64 is engine-specific, so this variant is "
    "rows-only for the driver; tests/test_rows_only_pins.py pins "
    "the CMS guarantee (est >= true for every probe key) and that "
    "the probe-key set and true counts agree exactly with the "
    "oracle-checked md5 twin — the two variants differ only in "
    "which buckets collide. Scale: identical plan to the twin "
    "(map-side x4 explode into a 1024-cell agg, broadcast probe "
    "join), minus the md5+conv expression cost.",
)
def q_agg_countmin_fast(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    seeds = F.array(*[F.lit(i) for i in range(1, _CMS_D + 1)])

    def bucket(seed_col, key_col):
        return F.pmod(F.xxhash64(seed_col, key_col), F.lit(_CMS_W))

    cells = (
        li.select("k", F.explode(seeds).alias("seed"))
        .groupBy("seed", bucket(F.col("seed"), F.col("k")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    truth = li.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    # distributed top-k (TakeOrderedAndProject), mirroring the md5 twin —
    # no single-partition window over the distinct-key table.
    probe = (
        truth.orderBy(F.desc("true_n"), "k")
        .limit(_CMS_PROBE)
        .withColumn("seed", F.explode(seeds))
        .withColumn("bucket", bucket(F.col("seed"), F.col("k")))
    )
    est = (
        probe.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("k", "true_n")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return est.select(
        F.col("k").cast("long").alias("l_partkey"), "true_n", "cms_est"
    ).orderBy(F.desc("true_n"), "l_partkey")


@register(
    "q_agg_tail_ratio",
    family="aggregates",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(round(quantile_cont(value, 0.99), 4)
                 / round(quantile_cont(value, 0.50), 4), 6) AS tail_ratio
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Tail ratio p99/p50 per event type — the SLO-dashboard number "
    "that separates 'slow on average' from 'slow in the tail' (a "
    "ratio near 1 is uniform load; 10+ means a long tail that "
    "averages hide). Exact linear-interpolation percentiles (Spark "
    "`percentile` == DuckDB `quantile_cont`), each rounded to 4 "
    "BEFORE the ratio so the division's operands — not just its "
    "result — are identical cross-engine. Scale: same contract as "
    "q_agg_percentile — exact percentile buffers per group; the "
    "documented 100 TB swap is approx_percentile's t-digest with the "
    "identical query shape.",
)
def q_agg_tail_ratio(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    p50 = F.round(F.expr("percentile(value, 0.50)"), 4)
    p99 = F.round(F.expr("percentile(value, 0.99)"), 4)
    return (
        ev.groupBy("event_type")
        .agg(p50.alias("p50"), p99.alias("p99"))
        .select(
            "event_type",
            "p50",
            "p99",
            F.round(F.col("p99") / F.col("p50"), 6).alias("tail_ratio"),
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_mad_outliers",
    family="aggregates",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.50) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.50) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           round(m.med, 4) AS med,
           round(m.mad, 4) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs(e.value - m.med)
                              > 3.5 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type, m.med, m.mad
    ORDER BY e.event_type
    """,
    doc="Robust outlier count per event type via the MAD rule "
    "(|x − median| > 3.5 · 1.4826 · MAD — the modified z-score every "
    "data-quality monitor prefers over q_events_anomaly's mean/stddev "
    "z, because median and MAD have a 50% breakdown point where one "
    "giant outlier poisons a mean-based threshold). Two aggregation "
    "passes (median, then median absolute deviation) joined back as "
    "broadcast scalars per group; Spark percentile == DuckDB "
    "quantile_cont so the thresholds are identical doubles and the "
    "comparison is deterministic. Scale: per-group exact percentile "
    "buffers — approx_percentile is the documented unbounded swap, "
    "same as q_agg_percentile.",
)
def q_agg_mad_outliers(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.50)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.50)").alias("mad"))
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 3.5 * 1.4826 * F.col("mad")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_winsorized",
    family="aggregates",
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(
             least(greatest(e.value, c.p05), c.p95) * 10000, 0) AS BIGINT))
             AS DOUBLE) / (count(*) * 10000.0), 6) AS winsorized_mean,
           CAST(sum(CASE WHEN e.value < c.p05 OR e.value > c.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN cuts c USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Winsorized mean per event type: values clipped to [p5, p95] "
    "before averaging — the standard tail-robust mean for metrics "
    "with heavy outliers (revenue-per-user, latency). Cut points are "
    "exact interpolated percentiles (identical doubles both engines); "
    "each CLIPPED value is quantized to an exact 1e4-scaled BIGINT "
    "before summing so the mean is order-independent cross-engine, "
    "one final division. Scale: one percentile pass + one "
    "broadcast-join pass; same exact-percentile caveat and "
    "approx_percentile swap as q_agg_percentile.",
)
def q_agg_winsorized(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped_q = F.round(
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")) * 10000, 0
    ).cast("long")
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(clipped_q).cast("double") / (F.count("*") * 10000.0), 6
            ).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_theil",
    family="aggregates",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
      WHERE CAST(round(value * 100) AS BIGINT) > 0
    ),
    tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s
      FROM cents GROUP BY event_type
    )
    SELECT c.event_type, t.n,
           round(CAST(sum(CAST(round(
             (c.x * 1.0 * t.n / t.s)
             * (ln(c.x * 1.0 * t.n) - ln(t.s)) * 1e9, 0) AS BIGINT))
             AS DOUBLE) / (t.n * 1e9), 6) AS theil
    FROM cents c JOIN tot t USING (event_type)
    GROUP BY c.event_type, t.n
    ORDER BY c.event_type
    """,
    doc="Theil index of value inequality per event type — the "
    "entropy-based inequality measure that, unlike q_agg_gini, "
    "DECOMPOSES additively into within-group + between-group terms "
    "(why economists and data-balance audits prefer it for nested "
    "populations). T = (1/n)Σ(x/μ)ln(x/μ) with x in exact integer "
    "cents; the ratio is cross-multiplied (x·n/s) and the log split "
    "as ln(x·n)−ln(s) so both transcendental arguments are exact "
    "doubles, each row's term quantized to 1e-9 then BIGINT-summed — "
    "order-independent cross-engine. Scale: one map-side rollup for "
    "(n, s) per group, then a map-side term pass; no sort (the Gini "
    "rank approach needs one — this is also the cheaper statistic).",
)
def q_agg_theil(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("x")
    ).filter(F.col("x") > 0)
    tot = cents.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    term = (
        (F.col("x") * 1.0 * F.col("n") / F.col("s"))
        * (F.log(F.col("x") * 1.0 * F.col("n")) - F.log(F.col("s")))
        * 1e9
    )
    return (
        cents.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.round(
                F.sum(F.round(term, 0).cast("long")).cast("double")
                / (F.col("n") * 1e9),
                6,
            ).alias("theil")
        )
        .select("event_type", "n", "theil")
        .orderBy("event_type")
    )


@register(
    "q_agg_hll_union",
    family="aggregates",
    oracle=None,  # sketch internals are Datasketches-specific → rows-only;
    # the estimate-vs-exact error bound is pinned in
    # tests/test_sketches.py::test_hll_union_error_bound
    doc="Datasketches HLL with SKETCH UNION (Spark 4 hll_sketch_agg / "
    "hll_union_agg): per-source user sketches built independently, "
    "then UNIONED into corpus-wide distinct estimates — the mechanic "
    "q_agg_hll (approx_count_distinct) hides: sketches are MERGEABLE "
    "STATE, so per-partition/per-day/per-source sketches can be "
    "persisted once and re-aggregated along any rollup path without "
    "rescanning data — THE pattern for distinct-count cubes at "
    "100 TB (store 365 daily sketches, answer any date range by "
    "union). Returns per-source estimates plus the unioned total; "
    "pinned within the sketch's published error (lgK=12 → ~1.6% rse) "
    "against exact distincts.",
)
def q_agg_hll_union(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_src = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("exact"),
    )
    per_rows = per_src.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
        "exact",
    )
    total = per_src.agg(
        F.lit("__ALL__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users"),
        F.lit(None).cast("long").alias("exact"),
    )
    return per_rows.unionByName(total).orderBy("event_type")


@register(
    "q_agg_grouping_id",
    family="aggregates",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
             AS BIGINT) AS level_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    ORDER BY level_id, rf, ls
    """,
    doc="GROUPING SETS with grouping_id(): the bitmask that tells a "
    "report row apart from a subtotal row when the rollup's NULLs "
    "collide with real NULLs in the data — the piece BI generators "
    "rely on that q_agg_grouping_sets (values only) leaves implicit. "
    "level_id 0 = leaf cell, 1 = per-flag subtotal, 3 = grand total; "
    "labels coalesce to '(all)' so the oracle hash covers the mask "
    "semantics, not engine NULL renderings. Scale: one Expand + hash "
    "aggregate exactly like the plain grouping-sets plan — the id is "
    "a free virtual column.",
)
def q_agg_grouping_id(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gid_v")
    return li.sparkSession.sql(
        """
        SELECT coalesce(l_returnflag, '(all)') AS rf,
               coalesce(l_linestatus, '(all)') AS ls,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                 AS level_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM li_gid_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY level_id, rf, ls
        """
    )


@register(
    "q_agg_cohens_d",
    family="aggregates",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 1 ELSE 0 END AS g,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT event_type, g,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM cents GROUP BY event_type, g
    ),
    wide AS (
      SELECT a.event_type,
             a.n AS n1, a.s1 AS a1, a.s2 AS a2,
             b.n AS n0, b.s1 AS b1, b.s2 AS b2
      FROM (SELECT * FROM s WHERE g = 1) a
      JOIN (SELECT * FROM s WHERE g = 0) b USING (event_type)
    )
    SELECT event_type, n1 AS n_weekend, n0 AS n_weekday,
           round(
             ((a1 * 1.0 / n1) - (b1 * 1.0 / n0))
             / sqrt(
                 ((a2 * 1.0 - a1 * 1.0 * a1 / n1)
                  + (b2 * 1.0 - b1 * 1.0 * b1 / n0))
                 / (n1 + n0 - 2)
               ), 6) AS cohens_d
    FROM wide
    ORDER BY event_type
    """,
    doc="Cohen's d effect size of weekend vs weekday value per event "
    "type — the magnitude companion to q_agg_ttest's significance "
    "(p-values shrink with n; d answers 'is the difference BIG': 0.2 "
    "small / 0.8 large), the number experiment reviews actually "
    "gate on. d = (m1−m0)/pooled_sd with every moment an exact "
    "BIGINT sum of integer cents, so the whole expression — means, "
    "pooled variance via the Σx²−(Σx)²/n identity, sqrt — is an "
    "identical float expression tree cross-engine (cents scaling "
    "cancels in the ratio). Scale: one map-side rollup to "
    "2×|types| rows; constant-size arithmetic after.",
)
def q_agg_cohens_d(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    g = F.when((F.dayofweek("ts") - 1).isin(0, 6), 1).otherwise(0)
    cents = ev.select(
        "event_type",
        g.alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    s = cents.groupBy("event_type", "g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    a = s.filter(F.col("g") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s1").alias("a1"),
        F.col("s2").alias("a2"),
    )
    b = s.filter(F.col("g") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("s1").alias("b1"),
        F.col("s2").alias("b2"),
    )
    pooled = F.sqrt(
        (
            (F.col("a2") * 1.0 - F.col("a1") * 1.0 * F.col("a1") / F.col("n1"))
            + (F.col("b2") * 1.0 - F.col("b1") * 1.0 * F.col("b1") / F.col("n0"))
        )
        / (F.col("n1") + F.col("n0") - 2)
    )
    d = (
        (F.col("a1") * 1.0 / F.col("n1")) - (F.col("b1") * 1.0 / F.col("n0"))
    ) / pooled
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            F.col("n1").alias("n_weekend"),
            F.col("n0").alias("n_weekday"),
            F.round(d, 6).alias("cohens_d"),
        )
        .orderBy("event_type")
    )


@register(
    "q_agg_odds_ratio",
    family="aggregates",
    oracle="""
    WITH c AS (
      SELECT CAST(sum(CASE WHEN extract(dow FROM ts) IN (0, 6)
                            AND event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN extract(dow FROM ts) IN (0, 6)
                            AND event_type <> 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN extract(dow FROM ts) NOT IN (0, 6)
                            AND event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN extract(dow FROM ts) NOT IN (0, 6)
                            AND event_type <> 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events
    )
    SELECT a, b, c, d,
           round(a * 1.0 * d / (b * 1.0 * c), 6) AS odds_ratio,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_lo,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_hi
    FROM c
    """,
    doc="Odds ratio with a Wald 95% CI: odds of an event being a "
    "purchase on weekends vs weekdays, from one 2×2 contingency table "
    "— the epidemiology/marketing lift statistic whose CI crossing "
    "1.0 is the no-effect read. OR = a·d/(b·c) is a single division "
    "of exact BIGINT cross-products; the CI is the standard "
    "exp(ln OR ± z·sqrt(Σ1/cell)) — every transcendental's argument "
    "derives from exact integers, so the expression trees match "
    "bitwise. Scale: one map-side pass to four counters.",
)
def q_agg_odds_ratio(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    wkend = (F.dayofweek("ts") - 1).isin(0, 6)
    purch = F.col("event_type") == "purchase"
    c = ev.agg(
        F.sum(F.when(wkend & purch, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(wkend & ~purch, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~wkend & purch, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~wkend & ~purch, 1).otherwise(0)).cast("long").alias("d"),
    )
    orr = F.col("a") * 1.0 * F.col("d") / (F.col("b") * 1.0 * F.col("c"))
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - 1.959964 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + 1.959964 * se), 6).alias("ci_hi"),
    )


@register(
    "q_agg_hdr_histogram",
    family="aggregates",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE value > 0
    ),
    b AS (
      SELECT event_type,
             CAST(length(printf('%b', c)) AS BIGINT) AS bucket,
             c
      FROM cents
    ),
    h AS (
      SELECT event_type, bucket,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(c) AS BIGINT) AS min_cents,
             CAST(max(c) AS BIGINT) AS max_cents
      FROM b GROUP BY event_type, bucket
    )
    SELECT event_type, bucket,
           CAST(2 ** (bucket - 1) AS BIGINT) AS bucket_lo,
           n_events, min_cents, max_cents,
           CAST(sum(n_events) OVER (
             PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum_events,
           round(CAST(sum(n_events) OVER (
                   PARTITION BY event_type ORDER BY bucket) AS DOUBLE)
                 / sum(n_events) OVER (PARTITION BY event_type), 6) AS pct_le
    FROM h ORDER BY event_type, bucket
    """,
    doc="HDR-style log2-bucketed value histogram per event type — the "
    "fixed-memory latency/value-distribution primitive (HdrHistogram, "
    "Prometheus exponential buckets): bucket = bit_length of the exact "
    "cent value, so ~25 buckets cover any int64 domain at <2x relative "
    "error, and UNLIKE approximate quantile sketches the layout is "
    "fully deterministic — every bucket count, bound and cumulative "
    "share is exact integer math (Spark length(bin(c)) == DuckDB "
    "length(printf('%b', c)) bit-for-bit), so the whole histogram is "
    "hash-checked, not rows-only. Percentiles read off pct_le per "
    "bucket. Scale: one map-side bucket expression + a (type, bucket) "
    "hash agg whose output is <=types*64 rows — the cumulative window "
    "runs on that bounded table, never the corpus; mergeable across "
    "shards by construction (counts add). Ref: no reference "
    "counterpart — observability/metrics tier.",
)
def q_agg_hdr_histogram(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    b = ev.filter(F.col("value") > 0).select(
        "event_type",
        c.alias("c"),
        F.length(F.bin(c)).cast("long").alias("bucket"),
    )
    h = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("c").cast("long").alias("min_cents"),
        F.max("c").cast("long").alias("max_cents"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    wall = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "bucket",
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT)) AS BIGINT)"
        ).alias("bucket_lo"),
        "n_events",
        "min_cents",
        "max_cents",
        F.sum("n_events").over(w).cast("long").alias("cum_events"),
        F.round(
            F.sum("n_events").over(w).cast("double")
            / F.sum("n_events").over(wall),
            6,
        ).alias("pct_le"),
    ).orderBy("event_type", "bucket")


@register(
    "q_agg_spearman",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    vx AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY g, x),
    rx AS (
      SELECT g, x,
             CAST(2 * (sum(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1
               AS BIGINT) AS r2
      FROM vx
    ),
    vy AS (SELECT g, y, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY g, y),
    ry AS (
      SELECT g, y,
             CAST(2 * (sum(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1
               AS BIGINT) AS r2
      FROM vy
    ),
    j AS (
      SELECT r.g, rx.r2 AS a, ry.r2 AS b
      FROM r JOIN rx ON rx.g = r.g AND rx.x = r.x
             JOIN ry ON ry.g = r.g AND ry.y = r.y
    ),
    st AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS DOUBLE) AS sx, CAST(sum(b) AS DOUBLE) AS sy,
             CAST(sum(a * b) AS DOUBLE) AS sxy,
             CAST(sum(a * a) AS DOUBLE) AS sxx,
             CAST(sum(b * b) AS DOUBLE) AS syy
      FROM j GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0
             AS spearman_rho
    FROM st ORDER BY l_returnflag
    """,
    doc="Spearman rank correlation (tie-corrected, average ranks) "
    "between quantity and price per return flag — the robust "
    "monotonic-association twin of q_agg_corr's Pearson, the stat a "
    "feature-selection pass runs when the relationship need not be "
    "linear. Exactness: ties get AVERAGE ranks, carried as the exact "
    "integer 2*rank_avg = 2*cum_before + n_ties + 1 (never a .5 "
    "float), so every sufficient statistic (sums of rank products) is "
    "an exact integer; both engines cast the exact sums to double and "
    "run the identical Pearson formula on them — one rounded float "
    "expression per group. Scale: the fact is aggregated ONCE into "
    "the (g,x,y) contingency cells (map-side combine — the only "
    "fact-scale shuffle carries distinct cells); both rank maps "
    "derive from the cells and join back to the cells, never to "
    "rows (sum over rows of f(a,b) == sum over cells of c*f(a,b), "
    "exact integers either way); no row-level window, no sort of "
    "the fact table. Int64 holds to ~2^53/4 rows per group; the "
    "DECIMAL sums guard Spark beyond that. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_spearman(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    # r12 (guide §2.3/§2.4): the old shape joined the two rank maps back
    # onto every FACT row — Catalyst planned two sort-merge joins that
    # hash-shuffled all of lineitem onto (g,x) and again onto (g,y). The
    # sufficient statistics only need the JOINT (g,x,y) contingency
    # cells: sum over rows of f(a,b) == sum over cells of c*f(a,b)
    # (exact integer arithmetic, identical decimal sums, identical
    # doubles out). So aggregate the fact ONCE into cells (partial
    # map-side combine — the only fact-scale exchange carries distinct
    # cells, not rows), derive both rank maps FROM the cells, and join
    # them back to cells only.
    cells = r.groupBy("g", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cells = cells.localCheckpoint(eager=False)  # rank maps + stats read it

    def rank_map(col):
        v = cells.groupBy("g", col).agg(F.sum("c").cast("long").alias("c"))
        w = Window.partitionBy("g").orderBy(col)
        return v.select(
            "g",
            col,
            (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1)
            .cast("long")
            .alias("r2"),
        )

    # x = l_quantity (domain 1..50 in TPC-H): the x rank map is bounded
    # at |groups| x 50 rows at ANY scale — broadcast unconditionally.
    # The y (price-cents) domain grows with the corpus: keep that join
    # keyed but build the small rank-map side as a hash table
    # (shuffle_hash) instead of sorting the cell stream.
    rx = rank_map("x").withColumnRenamed("r2", "a")
    ry = rank_map("y").withColumnRenamed("r2", "b")
    j = cells.join(F.broadcast(rx), ["g", "x"]).join(
        ry.hint("shuffle_hash"), ["g", "y"]
    )
    dec = "decimal(38,0)"
    # cast the COUNT up before every product: c*a*b grows O(n^3) per
    # group and would overflow LONG far below the decimal(38,0) ceiling
    cd = F.col("c").cast(dec)
    st = j.groupBy("g").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(cd * F.col("a")).cast("double").alias("sx"),
        F.sum(cd * F.col("b")).cast("double").alias("sy"),
        F.sum(cd * F.col("a") * F.col("b")).cast("double").alias("sxy"),
        F.sum(cd * F.col("a") * F.col("a")).cast("double").alias("sxx"),
        F.sum(cd * F.col("b") * F.col("b")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    rho = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return st.select(
        F.col("g").alias("l_returnflag"),
        "n",
        (F.round(rho, 6) + 0.0).alias("spearman_rho"),
    ).orderBy("l_returnflag")


@register(
    "q_agg_kendall",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_discount * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (
      SELECT g, x, y, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY g, x, y
    ),
    cd AS (
      SELECT a.g,
             -- pair counts grow O(n^2) per group: accumulate in HUGEINT
             -- (cast each factor up BEFORE the product) and only narrow
             -- to BIGINT at output, where the count is display-exact to
             -- 2^63 pairs; the tau_b math casts straight to DOUBLE
             sum(CASE WHEN b.y > a.y THEN CAST(a.c AS HUGEINT) * b.c
                 ELSE 0 END) AS conc,
             sum(CASE WHEN b.y < a.y THEN CAST(a.c AS HUGEINT) * b.c
                 ELSE 0 END) AS disc
      FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x
      GROUP BY a.g
    ),
    ties AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY g
    ),
    tx AS (
      SELECT g, sum(CAST(nx AS HUGEINT) * (nx - 1) // 2) AS tx
      FROM (SELECT g, x, CAST(sum(c) AS BIGINT) AS nx FROM cells GROUP BY g, x)
      GROUP BY g
    ),
    ty AS (
      SELECT g, sum(CAST(ny AS HUGEINT) * (ny - 1) // 2) AS ty
      FROM (SELECT g, y, CAST(sum(c) AS BIGINT) AS ny FROM cells GROUP BY g, y)
      GROUP BY g
    )
    SELECT t.g AS l_returnflag, t.n,
           CAST(cd.conc AS BIGINT) AS concordant,
           CAST(cd.disc AS BIGINT) AS discordant,
           round((CAST(cd.conc AS DOUBLE) - CAST(cd.disc AS DOUBLE))
                 / (sqrt(CAST(CAST(t.n AS HUGEINT) * (t.n - 1) // 2 - tx.tx
                      AS DOUBLE))
                  * sqrt(CAST(CAST(t.n AS HUGEINT) * (t.n - 1) // 2 - ty.ty
                      AS DOUBLE))), 6) + 0.0
             AS tau_b
    FROM ties t JOIN cd ON cd.g = t.g JOIN tx ON tx.g = t.g JOIN ty ON ty.g = t.g
    ORDER BY l_returnflag
    """,
    doc="Kendall tau-b (tie-corrected) between quantity and discount "
    "per return flag. The naive statistic is O(n^2) pairwise — here "
    "the value domain is BOUNDED (50 quantities x 11 discount cents), "
    "so concordant/discordant pairs come from the CONTINGENCY TABLE: "
    "one hash agg to <=550 cells per group, then a cell self-join "
    "(<=550^2 tiny rows, broadcast) sums c_a*c_b per orientation — "
    "compute is O(cells^2), not O(rows^2), the identical trick at any "
    "corpus size. All pair counts are exact integers accumulated in "
    "DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — they grow O(n^2) per "
    "group, so LONG would overflow past ~4.3e9 rows/group; ties via "
    "c*(c-1)/2 (always even) are halved while still LONG then widened. "
    "tau_b is one float expression over the exact wide ints, identical "
    "on both engines. Ref: no reference counterpart — statistics tier.",
)
def q_agg_kendall(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    cells = r.groupBy("g", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cells = cells.localCheckpoint(eager=False)  # 5 consumers below
    # conc/disc and the tie corrections grow O(n^2) per group — accumulate
    # in DECIMAL(38,0) (the Spark twin of DuckDB's HUGEINT), casting each
    # FACTOR up before the product so no intermediate ever sits in LONG.
    # half_pairs(k) = k*(k-1)/2 without `div` (Spark's IntegralDivide
    # returns LONG, which would re-narrow): k*(k-1) is always even, so
    # halve whichever factor is even while still a LONG, then widen.
    dec = "decimal(38,0)"

    def half_pairs(k: str):
        return F.expr(
            f"CASE WHEN {k} % 2 = 0 "
            f"THEN CAST({k} div 2 AS DECIMAL(38,0)) * ({k} - 1) "
            f"ELSE CAST({k} AS DECIMAL(38,0)) * (({k} - 1) div 2) END"
        ).cast(dec)

    a, b = cells.alias("a"), cells.alias("b")
    pair = F.col("a.c").cast(dec) * F.col("b.c").cast(dec)
    zero = F.lit(0).cast(dec)
    cd = (
        a.join(
            F.broadcast(b),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x")),
        )
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            F.sum(F.when(F.col("b.y") > F.col("a.y"), pair).otherwise(zero))
            .cast(dec).alias("conc"),
            F.sum(F.when(F.col("b.y") < F.col("a.y"), pair).otherwise(zero))
            .cast(dec).alias("disc"),
        )
    )
    ties = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    tx = (
        cells.groupBy("g", "x")
        .agg(F.sum("c").cast("long").alias("nx"))
        .groupBy("g")
        .agg(F.sum(half_pairs("nx")).cast(dec).alias("tx"))
    )
    ty = (
        cells.groupBy("g", "y")
        .agg(F.sum("c").cast("long").alias("ny"))
        .groupBy("g")
        .agg(F.sum(half_pairs("ny")).cast(dec).alias("ty"))
    )
    st = ties.join(cd, "g").join(tx, "g").join(ty, "g")
    n0 = half_pairs("n")
    tau = (F.col("conc").cast("double") - F.col("disc").cast("double")) / (
        F.sqrt((n0 - F.col("tx")).cast("double"))
        * F.sqrt((n0 - F.col("ty")).cast("double"))
    )
    return st.select(
        F.col("g").alias("l_returnflag"),
        "n",
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        (F.round(tau, 6) + 0.0).alias("tau_b"),
    ).orderBy("l_returnflag")


@register(
    "q_agg_mutual_info",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT event_type AS et,
             CAST(length(printf('%b', CAST(round(value * 100) AS BIGINT)))
               AS BIGINT) AS b
      FROM events WHERE value > 0
    ),
    cells AS (
      SELECT et, b, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY et, b
    ),
    mi_ AS (SELECT et, CAST(sum(c) AS BIGINT) AS ni FROM cells GROUP BY et),
    mj_ AS (SELECT b, CAST(sum(c) AS BIGINT) AS nj FROM cells GROUP BY b),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_cells FROM cells),
    q AS (
      SELECT CAST(sum(CAST(round(
               c * (ln(CAST(t.n * c AS DOUBLE)) - ln(CAST(ni * nj AS DOUBLE)))
               * 1e9) AS BIGINT)) AS BIGINT) AS mi_q
      FROM cells JOIN mi_ USING (et) JOIN mj_ USING (b) CROSS JOIN tot t
    ),
    hx AS (SELECT CAST(sum(CAST(round(ni * ln(CAST(ni AS DOUBLE)) * 1e9)
                 AS BIGINT)) AS BIGINT) AS x_q FROM mi_),
    hy AS (SELECT CAST(sum(CAST(round(nj * ln(CAST(nj AS DOUBLE)) * 1e9)
                 AS BIGINT)) AS BIGINT) AS y_q FROM mj_)
    SELECT t.n AS n_events,
           (SELECT count(*) FROM mi_) AS n_types,
           (SELECT count(*) FROM mj_) AS n_buckets,
           round(CAST(q.mi_q AS DOUBLE) / 1e9 / t.n, 6) + 0.0 AS mi_nats,
           round((CAST(q.mi_q AS DOUBLE) / 1e9 / t.n)
                 / sqrt((ln(CAST(t.n AS DOUBLE)) - CAST(hx.x_q AS DOUBLE) / 1e9 / t.n)
                      * (ln(CAST(t.n AS DOUBLE)) - CAST(hy.y_q AS DOUBLE) / 1e9 / t.n)),
                 6) + 0.0 AS nmi
    FROM tot t CROSS JOIN q CROSS JOIN hx CROSS JOIN hy
    """,
    doc="Mutual information between event type and value magnitude "
    "(log2 bucket = bit_length of exact cents, the q_agg_hdr_histogram "
    "bucketing) plus normalized MI — the model-free dependence measure "
    "feature-selection and drift pipelines use where correlation "
    "assumes linearity. Identity-quantized like q_text_entropy: every "
    "ln argument is an exact integer (N*c and ni*nj as int64 — ln "
    "agrees bitwise on exact ints), each cell's contribution is "
    "quantized to a 1e-9 long before summing (order-independent), and "
    "MI/NMI are single float expressions over the exact sums. Scale: "
    "one map-side bucket expression, one (type,bucket) hash agg to a "
    "<=types*64-cell table; margins, entropies and MI all run on that "
    "bounded table — corpus cost is one combinable aggregation. Ref: "
    "no reference counterpart — statistics tier.",
)
def q_agg_mutual_info(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    r = ev.filter(F.col("value") > 0).select(
        F.col("event_type").alias("et"),
        F.length(F.bin(cents)).cast("long").alias("b"),
    )
    cells = r.groupBy("et", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cells = cells.localCheckpoint(eager=False)  # margins + MI read this
    mi_ = cells.groupBy("et").agg(F.sum("c").cast("long").alias("ni"))
    mj_ = cells.groupBy("b").agg(F.sum("c").cast("long").alias("nj"))
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    q = (
        cells.join(F.broadcast(mi_), "et")
        .join(F.broadcast(mj_), "b")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    F.col("c")
                    * (
                        F.log((F.col("n") * F.col("c")).cast("double"))
                        - F.log((F.col("ni") * F.col("nj")).cast("double"))
                    )
                    * 1e9
                ).cast("long")
            )
            .cast("long")
            .alias("mi_q")
        )
    )
    hx = mi_.agg(
        F.sum(F.round(F.col("ni") * F.log(F.col("ni").cast("double")) * 1e9)
              .cast("long")).cast("long").alias("x_q")
    )
    hy = mj_.agg(
        F.sum(F.round(F.col("nj") * F.log(F.col("nj").cast("double")) * 1e9)
              .cast("long")).cast("long").alias("y_q")
    )
    n_types = mi_.agg(F.count(F.lit(1)).alias("n_types"))
    n_buckets = mj_.agg(F.count(F.lit(1)).alias("n_buckets"))
    st = (
        tot.join(F.broadcast(q))
        .join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .join(F.broadcast(n_types))
        .join(F.broadcast(n_buckets))
    )
    nd = F.col("n").cast("double")
    mi = F.col("mi_q").cast("double") / 1e9 / F.col("n")
    hx_v = F.log(nd) - F.col("x_q").cast("double") / 1e9 / F.col("n")
    hy_v = F.log(nd) - F.col("y_q").cast("double") / 1e9 / F.col("n")
    return st.select(
        F.col("n").alias("n_events"),
        "n_types",
        "n_buckets",
        (F.round(mi, 6) + 0.0).alias("mi_nats"),
        (F.round(mi / F.sqrt(hx_v * hy_v), 6) + 0.0).alias("nmi"),
    )


@register(
    "q_agg_gmean",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice > 0
    ),
    st AS (
      -- sums stay in DuckDB's HUGEINT accumulator (no BIGINT narrowing:
      -- s_inv alone can pass 2^63 near ~1e6 rows of small values) and
      -- cast straight to DOUBLE in the final expressions, mirroring the
      -- Spark DECIMAL(38,0) path
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(cents) AS s_cents,
             sum(CAST(round(ln(CAST(cents AS DOUBLE)) * 1e9) AS BIGINT))
               AS s_ln,
             sum(CAST(round(1e15 / cents) AS BIGINT)) AS s_inv
      FROM r GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           round(CAST(s_cents AS DOUBLE) / n / 100, 6) AS mean_arith,
           round(exp(CAST(s_ln AS DOUBLE) / 1e9 / n) / 100, 6) AS mean_geo,
           round(CAST(n AS DOUBLE) * 1e15 / CAST(s_inv AS DOUBLE) / 100, 6)
             AS mean_harm
    FROM st ORDER BY l_returnflag
    """,
    doc="Pythagorean means per group: arithmetic, geometric (the right "
    "mean for ratios/growth rates) and harmonic (the right mean for "
    "rates) of extended price — AM >= GM >= HM is a free sanity "
    "invariant. Exactness discipline: prices become exact integer "
    "cents; the geometric mean rides quantized ln terms (ln of an "
    "exact int is bitwise; each term rounds to a 1e-9 long before the "
    "order-independent integer sum); the harmonic mean rides quantized "
    "reciprocals (1e15/cents is ONE double division of exact ints — "
    "bitwise — then rounds to a long). Spark accumulates in "
    "DECIMAL(38,0) (s_inv alone can pass 2^63 near ~1e6 rows of small "
    "values), DuckDB in HUGEINT — exact on both, then identical float "
    "expressions. Scale: one map-side-combinable hash agg, constant "
    "state per group, no second pass. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_gmean(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    r = li.filter(F.col("l_extendedprice") > 0).select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    st = r.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s_cents"),
        F.sum(
            F.round(F.log(F.col("cents").cast("double")) * 1e9)
            .cast("long").cast(dec)
        ).alias("s_ln"),
        F.sum(F.round(F.lit(1e15) / F.col("cents")).cast("long").cast(dec)).alias(
            "s_inv"
        ),
    )
    nd = F.col("n").cast("double")
    return st.select(
        F.col("g").alias("l_returnflag"),
        "n",
        F.round(F.col("s_cents").cast("double") / F.col("n") / 100, 6).alias(
            "mean_arith"
        ),
        F.round(
            F.exp(F.col("s_ln").cast("double") / 1e9 / F.col("n")) / 100, 6
        ).alias("mean_geo"),
        F.round(nd * 1e15 / F.col("s_inv").cast("double") / 100, 6).alias(
            "mean_harm"
        ),
    ).orderBy("l_returnflag")


@register(
    "q_agg_ols_multi",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    st AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1 * x1) AS DOUBLE) AS sx1x1,
             CAST(sum(x2 * x2) AS DOUBLE) AS sx2x2,
             CAST(sum(x1 * x2) AS DOUBLE) AS sx1x2,
             CAST(sum(x1 * y) AS DOUBLE) AS sx1y,
             CAST(sum(x2 * y) AS DOUBLE) AS sx2y,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM r GROUP BY g
    ),
    m AS (
      SELECT g, n, sx1, sx2, sy,
             CAST(n AS DOUBLE) * sx1x1 - sx1 * sx1 AS m11,
             CAST(n AS DOUBLE) * sx2x2 - sx2 * sx2 AS m22,
             CAST(n AS DOUBLE) * sx1x2 - sx1 * sx2 AS m12,
             CAST(n AS DOUBLE) * sx1y - sx1 * sy AS v1,
             CAST(n AS DOUBLE) * sx2y - sx2 * sy AS v2,
             CAST(n AS DOUBLE) * syy - sy * sy AS tss
      FROM st
    ),
    b AS (
      SELECT g, n, sx1, sx2, sy, v1, v2, tss,
             (v1 * m22 - v2 * m12) / (m11 * m22 - m12 * m12) AS b1,
             (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) AS b2
      FROM m
    )
    SELECT g AS l_returnflag, n,
           round((sy - b1 * sx1 - b2 * sx2) / n / 100, 6) AS intercept,
           round(b1 / 100, 6) + 0.0 AS beta_qty,
           round(b2 / 100, 6) + 0.0 AS beta_disc_cent,
           round((b1 * v1 + b2 * v2) / tss, 6) + 0.0 AS r2
    FROM b ORDER BY l_returnflag
    """,
    doc="Two-predictor OLS per group (price ~ quantity + discount) via "
    "the closed-form normal equations — q_agg_ols's multiple-"
    "regression upgrade, the 'controlling for X' attribution readout "
    "single regression can't give. Exactness: all nine sufficient "
    "statistics are exact integer sums (DECIMAL(38,0) on Spark, "
    "HUGEINT in DuckDB), cast to double ONCE, then the centered 2x2 "
    "Cramer solve is the identical float expression on both engines — "
    "the q_agg_spearman discipline applied to regression. Scale: one "
    "map-side-combinable hash agg carrying 10 numbers per group; the "
    "solve is O(1) arithmetic on the bounded group table — a 100 TB "
    "regression costs exactly one aggregation pass. The same pattern "
    "extends to k predictors with a k x k driver-side solve on exact "
    "sums. Ref: no reference counterpart — statistics tier.",
)
def q_agg_ols_multi(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    r = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )

    def s(expr, name):
        return F.sum(expr.cast(dec)).cast("double").alias(name)

    st = r.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        s(F.col("x1"), "sx1"),
        s(F.col("x2"), "sx2"),
        s(F.col("y"), "sy"),
        s(F.col("x1") * F.col("x1"), "sx1x1"),
        s(F.col("x2") * F.col("x2"), "sx2x2"),
        s(F.col("x1") * F.col("x2"), "sx1x2"),
        s(F.col("x1") * F.col("y"), "sx1y"),
        s(F.col("x2") * F.col("y"), "sx2y"),
        s(F.col("y") * F.col("y"), "syy"),
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
    return st.select(
        F.col("g").alias("l_returnflag"),
        "n",
        F.round(
            (F.col("sy") - b1 * F.col("sx1") - b2 * F.col("sx2")) / F.col("n") / 100,
            6,
        ).alias("intercept"),
        (F.round(b1 / 100, 6) + 0.0).alias("beta_qty"),
        (F.round(b2 / 100, 6) + 0.0).alias("beta_disc_cent"),
        (F.round((b1 * v1 + b2 * v2) / tss, 6) + 0.0).alias("r2"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Round-8 wave 2: inferential statistics that stay one-pass at 100 TB.
# Shared discipline: sufficient statistics are exact integers (DECIMAL/
# HUGEINT where quadratic), per-group float terms are quantized to fixed-
# point BIGINTs BEFORE any cross-group sum (order-insensitive), and the
# final test statistic is one float expression of identical inputs.
# ---------------------------------------------------------------------------

# ln(k!) for k<=12 as exact decimal literals (identical doubles in both
# engines); beyond 12 the Stirling series with three correction terms is
# accurate to ~1e-12 relative — far inside the 1e-6 output rounding.
_LNFACT_SMALL = (
    "0.0", "0.0", "0.6931471805599453", "1.791759469228055",
    "3.1780538303479458", "4.787491742782046", "6.579251212010101",
    "8.525161361065415", "10.60460290274525", "12.801827480081469",
    "15.104412573075516", "17.502307845873887", "19.987214495661885",
)


def _lf_sql(x: str) -> str:
    """SQL text for ln((x)!), valid in BOTH Spark SQL and DuckDB.

    CASE over exact literals to 12!, then Stirling:
      n ln n - n + 0.5 ln(2 pi n) + 1/(12n) - 1/(360 n^3) + 1/(1260 n^5)
    Engines may differ by ~1 ulp in ln/exp; every consumer rounds at 1e-6
    with a 1e-7 comparison slack, so ulp noise cannot flip a result.
    """
    cases = " ".join(
        f"WHEN {k} THEN {v}" for k, v in enumerate(_LNFACT_SMALL)
    )
    n = f"CAST({x} AS DOUBLE)"
    return (
        f"(CASE CAST({x} AS BIGINT) {cases} ELSE "
        f"{n}*ln({n}) - {n} + 0.5*ln(2*pi()*{n}) "
        f"+ 1.0/(12*{n}) - 1.0/(360*{n}*{n}*{n}) "
        f"+ 1.0/(1260*{n}*{n}*{n}*{n}*{n}) END)"
    )


@register(
    "q_agg_anova",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS x
      FROM lineitem
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             sum(CAST(x AS HUGEINT) * x) AS ss
      FROM r GROUP BY g
    ),
    gq AS (
      SELECT g, n, s, ss,
             CAST(s AS DOUBLE) / n AS m,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
               / nullif(n - 1, 0) AS s2
      FROM grp
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s) AS BIGINT) AS stot,
             CAST(sum(ss) AS DOUBLE) AS sstot,
             -- n-scaling quantized terms: HUGEINT accumulators (a term
             -- alone passes 2^63 near n_i ~ 3.7e9 rows/group)
             sum(CAST(round(n * m * m * 1e6) AS HUGEINT)) AS qb,
             sum(CAST(round(n / s2 * 1e9) AS HUGEINT)) AS qw,
             sum(CAST(round(n / s2 * m * 1e9) AS HUGEINT)) AS qwm
      FROM gq
    ),
    welch2 AS (
      SELECT t.k,
             sum(CAST(round(
               (n / s2) * pow(m - (t.qwm * 1.0 / t.qw), 2) * 1e9
             ) AS HUGEINT)) AS qa,
             sum(CAST(round(
               pow(1.0 - (n / s2 * 1e9) / t.qw, 2) / (n - 1) * 1e12
             ) AS HUGEINT)) AS qh
      FROM gq CROSS JOIN tot t GROUP BY t.k
    )
    SELECT t.k AS k_groups, t.nn AS n_total,
           round(
             ((t.qb / 1e6 - CAST(t.stot AS DOUBLE) * t.stot / t.nn)
                / (t.k - 1))
             / nullif((t.sstot - t.qb / 1e6) / (t.nn - t.k), 0), 6) + 0.0
             AS f_classic,
           round(
             (w2.qa / 1e9 / (t.k - 1))
             / (1.0 + (2.0 * (t.k - 2) / (t.k * t.k - 1))
                      * (w2.qh / 1e12)), 6) + 0.0 AS f_welch
    FROM tot t CROSS JOIN welch2 w2
    """,
    doc="One-way ANOVA (classic F) + Welch's heteroscedastic F of "
    "quantity across return-flag groups — the does-the-mean-differ "
    "gate run before any segmentation claim; Welch is the variant "
    "robust to unequal group variances. Exactness: per-group "
    "sufficient stats (n, Σx, Σx²) are exact ints (Σx² in DECIMAL/"
    "HUGEINT — quadratic in the value bound, not the row count, but "
    "guarded anyway); every cross-group FLOAT term (n·m², w=n/s², "
    "w·m, Welch's A and h terms) is quantized to fixed-point BIGINT "
    "before its order-insensitive integer sum, so group iteration "
    "order cannot move a bit. The two-pass Welch shape (means pass, "
    "then deviations-from-weighted-mean pass) runs on the ≤|groups| "
    "row table — free at any corpus size. Scale: ONE "
    "map-side-combinable pass over the fact; everything after is "
    "arithmetic on k rows. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_anova(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_returnflag").alias("g"),
        F.round("l_quantity").cast("long").alias("x"),
    )
    dec = "decimal(38,0)"
    grp = r.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("ss"),
    )
    gq = grp.select(
        "g",
        "n",
        "s",
        "ss",
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
        ).alias("s2"),
    )
    gq = gq.localCheckpoint(eager=False)  # consumed by tot and welch2
    tot = gq.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("stot"),
        F.sum(F.col("ss")).cast("double").alias("sstot"),
        # n-scaling quantized terms: DECIMAL(38,0) accumulators (a term
        # alone passes 2^63 near n_i ~ 3.7e9 rows/group)
        F.sum(
            F.round(F.col("n") * F.col("m") * F.col("m") * 1e6)
            .cast("decimal(38,0)")
        ).alias("qb"),
        F.sum(
            F.round(F.col("n") / F.col("s2") * 1e9).cast("decimal(38,0)")
        ).alias("qw"),
        F.sum(
            F.round(F.col("n") / F.col("s2") * F.col("m") * 1e9)
            .cast("decimal(38,0)")
        ).alias("qwm"),
    )
    welch2 = (
        gq.join(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(
                    (F.col("n") / F.col("s2"))
                    * F.pow(
                        F.col("m") - F.col("qwm") * 1.0 / F.col("qw"), F.lit(2.0)
                    )
                    * 1e9
                ).cast("decimal(38,0)")
            ).alias("qa"),
            F.sum(
                F.round(
                    F.pow(
                        1.0 - (F.col("n") / F.col("s2") * 1e9) / F.col("qw"),
                        F.lit(2.0),
                    )
                    / (F.col("n") - 1)
                    * 1e12
                ).cast("decimal(38,0)")
            ).alias("qh"),
        )
        .withColumnRenamed("k", "k2")
    )
    f_classic = (
        (
            F.col("qb") / 1e6
            - F.col("stot").cast("double") * F.col("stot") / F.col("nn")
        )
        / (F.col("k") - 1)
    ) / F.nullif(
        (F.col("sstot") - F.col("qb") / 1e6) / (F.col("nn") - F.col("k")),
        F.lit(0.0),
    )
    f_welch = (F.col("qa") / 1e9 / (F.col("k") - 1)) / (
        1.0
        + (2.0 * (F.col("k") - 2) / (F.col("k") * F.col("k") - 1))
        * (F.col("qh") / 1e12)
    )
    return (
        tot.join(F.broadcast(welch2))
        .select(
            F.col("k").alias("k_groups"),
            F.col("nn").alias("n_total"),
            (F.round(f_classic, 6) + 0.0).alias("f_classic"),
            (F.round(f_welch, 6) + 0.0).alias("f_welch"),
        )
    )


@register(
    "q_agg_levene_bf",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS x
      FROM lineitem
    ),
    vc AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY g, x),
    cum AS (
      SELECT g, x, c,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY x) AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM vc
    ),
    med AS (
      SELECT g, min(x) AS med
      FROM cum WHERE cc >= (n + 1) // 2 GROUP BY g
    ),
    dev AS (
      SELECT r.g, abs(r.x - m.med) AS y
      FROM r JOIN med m ON m.g = r.g
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             sum(CAST(y AS HUGEINT) * y) AS ss
      FROM dev GROUP BY g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s) AS BIGINT) AS stot,
             CAST(sum(ss) AS DOUBLE) AS sstot,
             sum(CAST(round(
               n * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n) * 1e6
             ) AS HUGEINT)) AS qb
      FROM grp
    )
    SELECT gr.g AS l_returnflag, gr.n,
           m.med AS median_qty,
           round(CAST(gr.s AS DOUBLE) / gr.n, 6) + 0.0 AS mean_abs_dev,
           round(
             ((t.qb / 1e6 - CAST(t.stot AS DOUBLE) * t.stot / t.nn)
                / (t.k - 1))
             / nullif((t.sstot - t.qb / 1e6) / (t.nn - t.k), 0), 6) + 0.0
             AS bf_stat
    FROM grp gr JOIN med m ON m.g = gr.g CROSS JOIN tot t
    ORDER BY l_returnflag
    """,
    doc="Brown-Forsythe (median-based Levene) test for equality of "
    "variances of quantity across return-flag groups — the "
    "check-before-you-pool gate that decides between q_agg_anova's "
    "classic and Welch F. Exactness: the per-group median is the "
    "LOWER median (smallest value whose cumulative count reaches "
    "ceil(n/2)) computed from the bounded value-count table (<=50 "
    "distinct quantities), so median and every deviation |x-med| are "
    "exact integers — no interpolation ambiguity cross-engine; the "
    "one-way F on deviations reuses the quantized-term discipline "
    "(n·m² fixed-point before the cross-group sum). Scale: one "
    "value-count agg (bounded cells) + one broadcast join-back + one "
    "combinable sufficient-stats agg; the windows run on the "
    "<=|groups|x50 cell table, never the fact. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_levene_bf(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_returnflag").alias("g"),
        F.round("l_quantity").cast("long").alias("x"),
    )
    vc = r.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = Window.partitionBy("g").orderBy("x")
    w_all = Window.partitionBy("g")
    cum = vc.select(
        "g",
        "x",
        F.sum("c").over(w_cum).cast("long").alias("cc"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    med = (
        # integer ceil(n/2) — `div`, not `/`: float division would make
        # the even-n threshold m+0.5 and skip the value sitting exactly
        # at cumulative count n/2 (DuckDB's (n+1)//2 keeps it)
        cum.filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .groupBy("g")
        .agg(F.min("x").alias("med"))
    )
    dev = r.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("x") - F.col("med")).alias("y")
    )
    dec = "decimal(38,0)"
    grp = dev.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("ss"),
    )
    grp = grp.localCheckpoint(eager=False)  # consumed twice below
    m_d = F.col("s").cast("double") / F.col("n")
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("stot"),
        F.sum("ss").cast("double").alias("sstot"),
        # n-scaling quantized term: DECIMAL accumulator (see q_agg_anova)
        F.sum(F.round(F.col("n") * m_d * m_d * 1e6).cast("decimal(38,0)"))
        .alias("qb"),
    )
    bf = (
        (
            F.col("qb") / 1e6
            - F.col("stot").cast("double") * F.col("stot") / F.col("nn")
        )
        / (F.col("k") - 1)
    ) / F.nullif(
        (F.col("sstot") - F.col("qb") / 1e6) / (F.col("nn") - F.col("k")),
        F.lit(0.0),
    )
    return (
        grp.join(F.broadcast(med), "g")
        .join(F.broadcast(tot))
        .select(
            F.col("g").alias("l_returnflag"),
            "n",
            F.col("med").alias("median_qty"),
            (F.round(F.col("s").cast("double") / F.col("n"), 6) + 0.0).alias(
                "mean_abs_dev"
            ),
            (F.round(bf, 6) + 0.0).alias("bf_stat"),
        )
        .orderBy("l_returnflag")
    )


def _fisher_oracle() -> str:
    lf = _lf_sql
    # log P(k) for the hypergeometric cell count k, margins r1/r2/c1, total nn
    lp = (
        f"({lf('r1')} - {lf('k')} - {lf('r1 - k')} "
        f"+ {lf('r2')} - {lf('c1 - k')} - {lf('r2 - c1 + k')} "
        f"- ({lf('nn')} - {lf('c1')} - {lf('nn - c1')}))"
    )
    return f"""
    WITH cells AS (
      SELECT CAST(count(*) FILTER (hi AND ur) AS BIGINT)         AS a,
             CAST(count(*) FILTER (hi AND NOT ur) AS BIGINT)     AS b,
             CAST(count(*) FILTER (NOT hi AND ur) AS BIGINT)     AS c,
             CAST(count(*) FILTER (NOT hi AND NOT ur) AS BIGINT) AS d
      FROM (SELECT o_totalprice > 300000 AS hi,
                   o_orderpriority = '1-URGENT' AS ur
            FROM orders)
    ),
    marg AS (
      SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
             a + b + c + d AS nn
      FROM cells
    ),
    win AS (
      -- enumerate only mode +/- 12 sigma: the tail outside is < 1e-30,
      -- invisible at 1e-6 rounding, and the window is O(sqrt(N)) terms
      SELECT m.*,
             greatest(greatest(0, c1 - r2),
               CAST(floor(c1*1.0*r1/nn
                 - 12*sqrt(c1*1.0*r1/nn * (r2*1.0/nn)
                           * ((nn-c1)*1.0/greatest(nn-1,1))) - 2) AS BIGINT))
               AS klo,
             least(least(c1, r1),
               CAST(ceil(c1*1.0*r1/nn
                 + 12*sqrt(c1*1.0*r1/nn * (r2*1.0/nn)
                           * ((nn-c1)*1.0/greatest(nn-1,1))) + 2) AS BIGINT))
               AS khi
      FROM marg m
    ),
    obs AS (
      SELECT w.*,
             ({lf('r1')} - {lf('a')} - {lf('r1 - a')}
              + {lf('r2')} - {lf('c1 - a')} - {lf('r2 - c1 + a')}
              - ({lf('nn')} - {lf('c1')} - {lf('nn - c1')})) AS lpa
      FROM win w
    ),
    terms AS (
      SELECT a, b, c, d, nn, lpa, exp({lp}) AS pk
      FROM (SELECT o.*, unnest(generate_series(o.klo, o.khi)) AS k
            FROM obs o)
    )
    SELECT any_value(a) AS a, any_value(b) AS b,
           any_value(c) AS c, any_value(d) AS d,
           any_value(nn) AS n_total,
           round(any_value(exp(lpa)), 6) + 0.0 AS p_observed,
           round(sum(CASE WHEN pk <= exp(lpa) * (1 + 1e-7)
                          THEN pk ELSE 0 END), 6) + 0.0 AS p_two_sided
    FROM terms
    GROUP BY a
    """


@register(
    "q_agg_fisher_exact",
    family="aggregates",
    oracle=_fisher_oracle(),
    doc="Fisher's exact test (two-sided) on the 2x2 of high-value "
    "(totalprice>300k) x urgent-priority orders — the "
    "contingency-independence test that stays valid when chi-square's "
    "expected-count assumptions fail. The hypergeometric tail is "
    "enumerated, not approximated — but only over mode±12σ of the "
    "cell distribution (O(sqrt N) terms; the excluded tail is <1e-30, "
    "invisible at 1e-6 rounding), so the enumeration stays feasible "
    "at any corpus size where the test is still meaningful. "
    "log-probabilities ride a shared ln(k!) kernel: exact literals to "
    "12!, then a 3-term Stirling series (~1e-12 relative) — the "
    "IDENTICAL SQL text runs on both engines, and the R-convention "
    "(1+1e-7) inclusion slack absorbs cross-engine ulp noise in "
    "ln/exp. Scale: one conditional-count pass over the fact → a "
    "1-row margins table → a generated k-series; nothing after the "
    "first agg touches the fact. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_fisher_exact(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_totalprice") > 300000
    ur = F.col("o_orderpriority") == "1-URGENT"
    cells = o.agg(
        F.sum(F.when(hi & ur, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(hi & ~ur, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~hi & ur, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~hi & ~ur, 1).otherwise(0)).cast("long").alias("d"),
    )
    marg = cells.select(
        "a", "b", "c", "d",
        F.expr("a + b").alias("r1"),
        F.expr("c + d").alias("r2"),
        F.expr("a + c").alias("c1"),
        F.expr("a + b + c + d").alias("nn"),
    )
    win = marg.select(
        "*",
        F.expr(
            "greatest(greatest(0L, c1 - r2), CAST(floor(c1*1.0*r1/nn"
            " - 12*sqrt(c1*1.0*r1/nn * (r2*1.0/nn)"
            " * ((nn-c1)*1.0/greatest(nn-1,1))) - 2) AS BIGINT))"
        ).alias("klo"),
        F.expr(
            "least(least(c1, r1), CAST(ceil(c1*1.0*r1/nn"
            " + 12*sqrt(c1*1.0*r1/nn * (r2*1.0/nn)"
            " * ((nn-c1)*1.0/greatest(nn-1,1))) + 2) AS BIGINT))"
        ).alias("khi"),
    )
    lf = _lf_sql
    lp_obs = (
        f"({lf('r1')} - {lf('a')} - {lf('r1 - a')}"
        f" + {lf('r2')} - {lf('c1 - a')} - {lf('r2 - c1 + a')}"
        f" - ({lf('nn')} - {lf('c1')} - {lf('nn - c1')}))"
    )
    lp_k = (
        f"({lf('r1')} - {lf('k')} - {lf('r1 - k')}"
        f" + {lf('r2')} - {lf('c1 - k')} - {lf('r2 - c1 + k')}"
        f" - ({lf('nn')} - {lf('c1')} - {lf('nn - c1')}))"
    )
    obs = win.select("*", F.expr(lp_obs).alias("lpa"))
    terms = obs.select(
        "a", "b", "c", "d", "nn", "lpa", "r1", "r2", "c1",
        F.explode(F.expr("sequence(klo, khi)")).alias("k"),
    ).select("*", F.expr(f"exp({lp_k})").alias("pk"))
    return terms.groupBy("a").agg(
        F.any_value("b").alias("b"),
        F.any_value("c").alias("c"),
        F.any_value("d").alias("d"),
        F.any_value("nn").alias("n_total"),
        (F.round(F.exp(F.any_value("lpa")), 6) + 0.0).alias("p_observed"),
        (
            F.round(
                F.sum(
                    F.when(
                        F.col("pk") <= F.exp(F.col("lpa")) * (1 + 1e-7),
                        F.col("pk"),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            )
            + 0.0
        ).alias("p_two_sided"),
    ).select("a", "b", "c", "d", "n_total", "p_observed", "p_two_sided")


@register(
    "q_agg_jackknife",
    family="aggregates",
    oracle="""
    WITH b AS (
      SELECT user_id % 32 AS bkt,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(sv) AS BIGINT) AS svt
      FROM b
    ),
    pseudo AS (
      SELECT t.nb, t.nn, t.svt,
             -- leave-one-out theta converted back to ORIGINAL value
             -- units (/1e4) BEFORE the 1e9 quantization: quantizing the
             -- scaled theta made the squared-deviation sum overflow LONG
             CAST(round(
               (CAST(t.svt - b.sv AS DOUBLE) / (t.nn - b.n)) / 1e4 * 1e9
             ) AS BIGINT) AS q_theta
      FROM b CROSS JOIN tot t
    ),
    jk AS (
      SELECT any_value(nb) AS nb, any_value(nn) AS nn,
             any_value(svt) AS svt,
             CAST(sum(q_theta) AS BIGINT) AS q_sum
      FROM pseudo GROUP BY nb
    ),
    var_ AS (
      SELECT j.nb, j.nn, j.svt,
             sum(CAST(round(
               pow(p.q_theta / 1e9 - j.q_sum / 1e9 / j.nb, 2) * 1e12
             ) AS BIGINT)) AS q_var
      FROM pseudo p CROSS JOIN jk j GROUP BY j.nb, j.nn, j.svt
    )
    SELECT nb AS n_buckets, nn AS n_events,
           round(CAST(svt AS DOUBLE) / nn / 1e4, 6) + 0.0 AS theta,
           round(sqrt((nb - 1.0) / nb * (q_var / 1e12)), 6) + 0.0
             AS jk_se
    FROM var_
    """,
    doc="Delete-one-bucket jackknife standard error of a ratio "
    "estimator (mean event value = Σvalue/Σcount) over 32 "
    "deterministic user_id%32 buckets — the one-extra-agg way to put "
    "an error bar on ANY pipeline metric without bootstrap replicas "
    "or a second data pass; user-level bucketing keeps within-user "
    "correlation inside a bucket so the SE is honest under repeated "
    "measures. Exactness: bucket sufficient stats are exact ints "
    "(values quantized 1e4 at ingest); each leave-one-out theta is "
    "ONE float division of exact ints, quantized 1e9 before the "
    "cross-bucket sum; the variance pass re-reads only the 32-row "
    "pseudo-value table (broadcast totals, zero extra fact passes). "
    "Scale: one map-combinable 32-group agg over the fact; bucket "
    "count fixed → driver-side arithmetic is O(1). Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_jackknife(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    b = ev.groupBy((F.col("user_id") % 32).alias("bkt")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 1e4).cast("long")).cast("long").alias("sv"),
    )
    b = b.localCheckpoint(eager=False)  # totals + pseudo both read it
    tot = b.agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sv").cast("long").alias("svt"),
    )
    pseudo = b.join(F.broadcast(tot)).select(
        "nb", "nn", "svt",
        F.round(
            ((F.col("svt") - F.col("sv")).cast("double") / (F.col("nn") - F.col("n")))
            / 1e4
            * 1e9
        ).cast("long").alias("q_theta"),
    )
    pseudo = pseudo.localCheckpoint(eager=False)  # jk + var_ both read it
    jk = pseudo.groupBy("nb").agg(
        F.any_value("nn").alias("nn"),
        F.any_value("svt").alias("svt"),
        F.sum("q_theta").cast("long").alias("q_sum"),
    ).withColumnRenamed("nb", "nb2")
    var_ = (
        pseudo.select("q_theta")
        .join(F.broadcast(jk))
        .groupBy("nb2", "nn", "svt")
        .agg(
            F.sum(
                F.round(
                    F.pow(
                        F.col("q_theta") / 1e9
                        - F.col("q_sum") / 1e9 / F.col("nb2"),
                        F.lit(2.0),
                    )
                    * 1e12
                ).cast("long")
            ).alias("q_var")
        )
    )
    return var_.select(
        F.col("nb2").alias("n_buckets"),
        F.col("nn").alias("n_events"),
        (F.round(F.col("svt").cast("double") / F.col("nn") / 1e4, 6) + 0.0).alias(
            "theta"
        ),
        (
            F.round(
                F.sqrt(
                    (F.col("nb2") - 1.0) / F.col("nb2") * (F.col("q_var") / 1e12)
                ),
                6,
            )
            + 0.0
        ).alias("jk_se"),
    )


@register(
    "q_agg_hellinger",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT event_type AS et,
             least(greatest(CAST(floor(ln(value + 1.0) * 4) AS BIGINT), 0),
                   39) AS bin
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    cells AS (
      SELECT bin,
             CAST(count(*) FILTER (et = 'purchase') AS BIGINT) AS cp,
             CAST(count(*) FILTER (et = 'click') AS BIGINT) AS cq
      FROM r GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM cells
    ),
    q AS (
      SELECT t.np, t.nq, t.n_bins,
             CAST(sum(CAST(round(
               sqrt((c.cp * 1.0 / t.np) * (c.cq * 1.0 / t.nq)) * 1e9
             ) AS BIGINT)) AS BIGINT) AS q_bc
      FROM cells c CROSS JOIN tot t
      GROUP BY t.np, t.nq, t.n_bins
    )
    SELECT np AS n_p, nq AS n_q, n_bins,
           round(sqrt(greatest(1.0 - q_bc / 1e9, 0.0)), 6) + 0.0
             AS hellinger,
           round(1.0 - q_bc / 1e9, 6) + 0.0 AS h_squared
    FROM q
    """,
    doc="Hellinger distance between the value distributions of two "
    "event types over a fixed 40-bin log grid — the bounded-[0,1] "
    "distribution-drift metric (sibling of q_text_jsd_drift for "
    "numeric columns): symmetric, metric (triangle inequality holds, "
    "unlike JSD's square root caveats), and the standard gate for "
    "'did this segment's spend distribution shift'. Exactness: bin "
    "ids are floor(ln(v+1)·4) clamped to [0,39] — floor of a float "
    "is ulp-stable away from integer boundaries (measure-zero risk, "
    "same stance as every binned query here); bin counts are exact "
    "ints; each per-bin sqrt(p·q) term is quantized 1e9 before the "
    "order-insensitive integer sum; BC→H is one final float "
    "expression. Scale: one combinable 40-cell conditional-count "
    "agg over the fact; everything after is arithmetic on ≤40 rows. "
    "Ref: no reference counterpart — statistics tier.",
)
def q_agg_hellinger(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    r = ev.filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    ).select(
        F.col("event_type").alias("et"),
        F.least(
            F.greatest(
                F.floor(F.log(F.col("value") + 1.0) * 4).cast("long"), F.lit(0)
            ),
            F.lit(39),
        ).alias("bin"),
    )
    cells = r.groupBy("bin").agg(
        F.sum(F.when(F.col("et") == "purchase", 1).otherwise(0))
        .cast("long").alias("cp"),
        F.sum(F.when(F.col("et") == "click", 1).otherwise(0))
        .cast("long").alias("cq"),
    )
    cells = cells.localCheckpoint(eager=False)  # tot + q both read it
    tot = cells.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cq").cast("long").alias("nq"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    q = (
        cells.join(F.broadcast(tot))
        .groupBy("np", "nq", "n_bins")
        .agg(
            F.sum(
                F.round(
                    F.sqrt(
                        (F.col("cp") * 1.0 / F.col("np"))
                        * (F.col("cq") * 1.0 / F.col("nq"))
                    )
                    * 1e9
                ).cast("long")
            ).cast("long").alias("q_bc")
        )
    )
    return q.select(
        F.col("np").alias("n_p"),
        F.col("nq").alias("n_q"),
        "n_bins",
        (
            F.round(F.sqrt(F.greatest(1.0 - F.col("q_bc") / 1e9, F.lit(0.0))), 6)
            + 0.0
        ).alias("hellinger"),
        (F.round(1.0 - F.col("q_bc") / 1e9, 6) + 0.0).alias("h_squared"),
    )


def _erfc_sql(x: str) -> str:
    """SQL text for erfc(x), x >= 0 — Abramowitz-Stegun 7.1.26
    (|eps| <= 1.5e-7). As with _lf_sql, the IDENTICAL expression text
    runs on both engines, so cross-engine parity is exact-by-
    construction even where the approximation differs from true erfc.
    """
    # Bind the argument as DOUBLE once: a bare high-scale decimal literal
    # (e.g. repr() of a small float) parses as DECIMAL in DuckDB, and the
    # textual square below would need scale > 38 -> OutOfRangeException.
    xd = f"CAST(({x}) AS DOUBLE)"
    t = f"(1.0 / (1.0 + 0.3275911 * {xd}))"
    poly = (
        f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * (1.421413741 "
        f"+ {t} * (-1.453152027 + {t} * 1.061405429)))))"
    )
    return f"({poly} * exp(-({xd} * {xd})))"


_BH_Q = 0.05  # target false-discovery rate


@register(
    "q_agg_bh_fdr",
    family="aggregates",
    oracle=f"""
    WITH dow AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS c
      FROM events GROUP BY dw
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(c) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS m
      FROM dow
    ),
    z AS (
      SELECT d.dw, d.n, d.c, t.m,
             (CAST(d.c AS DOUBLE)/d.n - CAST(t.ct - d.c AS DOUBLE)/(t.nt - d.n))
             / sqrt((CAST(t.ct AS DOUBLE)/t.nt) * (1.0 - CAST(t.ct AS DOUBLE)/t.nt)
                    * (1.0/d.n + 1.0/(t.nt - d.n))) AS zval
      FROM dow d CROSS JOIN tot t
    ),
    p AS (
      SELECT dw, n, c, m, zval,
             {_erfc_sql('abs(zval) / 1.4142135623730951')} AS pval
      FROM z
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY pval, dw) AS BIGINT) AS rnk
      FROM p
    ),
    flagged AS (
      SELECT *,
             CASE WHEN pval <= rnk * {_BH_Q} / m THEN rnk ELSE 0 END AS ok_rnk
      FROM ranked
    ),
    cut AS (SELECT max(ok_rnk) AS max_ok FROM flagged)
    SELECT f.dw AS day_of_week, f.n, f.c AS conversions,
           round(CAST(f.c AS DOUBLE) / f.n, 6) + 0.0 AS conv_rate,
           round(f.zval, 6) + 0.0 AS z_score,
           round(f.pval, 6) + 0.0 AS p_value,
           f.rnk AS p_rank,
           round(f.rnk * {_BH_Q} / f.m, 6) + 0.0 AS bh_threshold,
           CAST(f.rnk <= cu.max_ok AS BOOLEAN) AS rejected
    FROM flagged f CROSS JOIN cut cu
    ORDER BY day_of_week
    """,
    doc="Benjamini-Hochberg FDR correction over the 7 day-of-week "
    "conversion-rate tests (each dow vs the rest, two-proportion z) — "
    "the multiple-testing discipline that stops a 20-segment dashboard "
    "from 'finding' one spurious effect per page: rank p-values, "
    "reject every rank up to the largest r with p_(r) <= r·q/m. "
    "p-values ride a shared erfc kernel (A&S 7.1.26) whose IDENTICAL "
    "SQL text runs on both engines — parity is by construction, the "
    "1.5e-7 approximation error is common-mode. Exactness: counts "
    "exact; z is one float expression of exact ints; the BH cutoff "
    "windows run on the FIXED 7-row test table (bounded by the test "
    "count, never the data — the SCALE.md global-window ledger "
    "applies). Scale: one combinable 7-group pass over the fact; "
    "everything after is arithmetic on 7 rows. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_bh_fdr(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    # dayofweek−1: Spark is 1-based Sunday=1, DuckDB 0-based Sunday=0
    dow = ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("c"),
    )
    dow = dow.localCheckpoint(eager=False)  # tot + z share it
    tot = dow.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("c").cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    p0 = F.col("ct").cast("double") / F.col("nt")
    zval = (
        F.col("c").cast("double") / F.col("n")
        - (F.col("ct") - F.col("c")).cast("double") / (F.col("nt") - F.col("n"))
    ) / F.sqrt(
        p0 * (1.0 - p0) * (1.0 / F.col("n") + 1.0 / (F.col("nt") - F.col("n")))
    )
    z = dow.join(F.broadcast(tot)).select(
        "dw", "n", "c", "m", zval.alias("zval")
    )
    p = z.select(
        "*",
        F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")).alias("pval"),
    )
    # BOUNDED global windows: the test table has exactly m (=7) rows —
    # bounded by the number of TESTS, not the corpus (SCALE.md ledger)
    ranked = p.select(
        "*",
        F.row_number().over(Window.orderBy("pval", "dw")).cast("long").alias("rnk"),
    )
    flagged = ranked.select(
        "*",
        F.when(
            F.col("pval") <= F.col("rnk") * _BH_Q / F.col("m"), F.col("rnk")
        ).otherwise(F.lit(0)).alias("ok_rnk"),
    )
    flagged = flagged.localCheckpoint(eager=False)  # cut + output share it
    cut = flagged.agg(F.max("ok_rnk").alias("max_ok"))
    return (
        flagged.join(F.broadcast(cut))
        .select(
            F.col("dw").alias("day_of_week"),
            "n",
            F.col("c").alias("conversions"),
            (F.round(F.col("c").cast("double") / F.col("n"), 6) + 0.0).alias(
                "conv_rate"
            ),
            (F.round(F.col("zval"), 6) + 0.0).alias("z_score"),
            (F.round(F.col("pval"), 6) + 0.0).alias("p_value"),
            F.col("rnk").alias("p_rank"),
            (F.round(F.col("rnk") * _BH_Q / F.col("m"), 6) + 0.0).alias(
                "bh_threshold"
            ),
            (F.col("rnk") <= F.col("max_ok")).alias("rejected"),
        )
        .orderBy("day_of_week")
    )


@register(
    "q_agg_raking",
    family="aggregates",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et, CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY et, dw
    ),
    dims AS (
      SELECT CAST(count(DISTINCT et) AS BIGINT) AS nr,
             CAST(count(DISTINCT dw) AS BIGINT) AS nc,
             CAST(sum(n) AS BIGINT) AS nt
      FROM cells
    ),
    w0 AS (SELECT c.*, d.nr, d.nc, d.nt, n * 1.0 AS w
           FROM cells c CROSS JOIN dims d),
    -- iteration 1: scale rows to uniform target nt/nr, then columns
    r1 AS (SELECT et, sum(w) AS rw FROM w0 GROUP BY et),
    w1 AS (SELECT w0.et, w0.dw, w0.n, w0.nr, w0.nc, w0.nt,
                  w0.w * (w0.nt * 1.0 / w0.nr) / r1.rw AS w
           FROM w0 JOIN r1 ON r1.et = w0.et),
    c1 AS (SELECT dw, sum(w) AS cw FROM w1 GROUP BY dw),
    w2 AS (SELECT w1.et, w1.dw, w1.n, w1.nr, w1.nc, w1.nt,
                  w1.w * (w1.nt * 1.0 / w1.nc) / c1.cw AS w
           FROM w1 JOIN c1 ON c1.dw = w1.dw),
    -- iteration 2
    r2 AS (SELECT et, sum(w) AS rw FROM w2 GROUP BY et),
    w3 AS (SELECT w2.et, w2.dw, w2.n, w2.nr, w2.nc, w2.nt,
                  w2.w * (w2.nt * 1.0 / w2.nr) / r2.rw AS w
           FROM w2 JOIN r2 ON r2.et = w2.et),
    c2 AS (SELECT dw, sum(w) AS cw FROM w3 GROUP BY dw),
    w4 AS (SELECT w3.et, w3.dw, w3.n, w3.nr, w3.nc, w3.nt,
                  w3.w * (w3.nt * 1.0 / w3.nc) / c2.cw AS w
           FROM w3 JOIN c2 ON c2.dw = w3.dw)
    SELECT et AS event_type, dw AS day_of_week, n,
           round(w / n, 6) + 0.0 AS rake_weight,
           round(w, 4) + 0.0 AS raked_count
    FROM w4 ORDER BY event_type, day_of_week
    """,
    doc="Iterative proportional fitting (raking) of the (event_type × "
    "day-of-week) contingency table to uniform row AND column margins "
    "— the survey-calibration / post-stratification weighting every "
    "analytics team reaches for when a sample's margins drift from "
    "the population's: two IPF iterations (row-scale, column-scale, "
    "repeat), each a grouped sum + ratio join on the BOUNDED grid. "
    "Two iterations are the fixed, documented contract (IPF converges "
    "geometrically; fixture margins are near-uniform already and the "
    "oracle mirrors the exact same unrolled schedule — parity tests "
    "the machinery, not a convergence claim). Exactness: cell counts "
    "exact; every scale factor is a float ratio of identically-"
    "computed sums over the ≤|types×7| grid — the iteration order is "
    "FIXED by the CTE chain on both engines, and grouped float sums "
    "over ≤7 rows are too few to reorder (single partial per group). "
    "Scale: one combinable grid rollup over the fact; iterations "
    "touch only the grid. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_raking(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.dayofweek("ts") - 1).cast("long").alias("dw"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = cells.localCheckpoint(eager=False)  # dims + w0 share it
    dims = cells.agg(
        F.countDistinct("et").cast("long").alias("nr"),
        F.countDistinct("dw").cast("long").alias("nc"),
        F.sum("n").cast("long").alias("nt"),
    )
    w = cells.join(F.broadcast(dims)).select(
        "et", "dw", "n", "nr", "nc", "nt", (F.col("n") * 1.0).alias("w")
    )
    for _ in range(2):  # two IPF iterations, fixed contract
        rw = w.groupBy(F.col("et").alias("r_et")).agg(F.sum("w").alias("rw"))
        w = w.join(F.broadcast(rw), F.col("r_et") == F.col("et")).select(
            "et", "dw", "n", "nr", "nc", "nt",
            (
                F.col("w") * (F.col("nt") * 1.0 / F.col("nr")) / F.col("rw")
            ).alias("w"),
        )
        cw = w.groupBy(F.col("dw").alias("c_dw")).agg(F.sum("w").alias("cw"))
        w = w.join(F.broadcast(cw), F.col("c_dw") == F.col("dw")).select(
            "et", "dw", "n", "nr", "nc", "nt",
            (
                F.col("w") * (F.col("nt") * 1.0 / F.col("nc")) / F.col("cw")
            ).alias("w"),
        )
    return w.select(
        F.col("et").alias("event_type"),
        F.col("dw").alias("day_of_week"),
        "n",
        (F.round(F.col("w") / F.col("n"), 6) + 0.0).alias("rake_weight"),
        (F.round(F.col("w"), 4) + 0.0).alias("raked_count"),
    ).orderBy("event_type", "day_of_week")


@register(
    "q_agg_expected_shortfall",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    vc AS (SELECT g, cents, CAST(count(*) AS BIGINT) AS c
           FROM r GROUP BY g, cents),
    cum AS (
      SELECT g, cents, c,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY cents) AS BIGINT)
               AS cc,
             CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM vc
    ),
    var_ AS (
      -- VaR_95 = the exact lower 95th percentile (percentile_disc):
      -- smallest value whose cumulative count reaches ceil(0.95 n)
      SELECT g, min(cents) AS var_cents
      FROM cum WHERE cc * 100 >= n * 95 GROUP BY g
    ),
    tail AS (
      SELECT r.g, CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(r.cents) AS BIGINT) AS s_tail,
             CAST(any_value(v.var_cents) AS BIGINT) AS var_cents,
             CAST(any_value(n.n) AS BIGINT) AS n
      FROM r
      JOIN var_ v ON v.g = r.g
      JOIN (SELECT g, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY g) n
        ON n.g = r.g
      WHERE r.cents >= v.var_cents
      GROUP BY r.g
    )
    SELECT g AS o_orderpriority, n, n_tail,
           round(var_cents / 100.0, 2) + 0.0 AS var_95,
           round(CAST(s_tail AS DOUBLE) / n_tail / 100, 6) + 0.0 AS es_95
    FROM tail ORDER BY o_orderpriority
    """,
    doc="Value-at-Risk + Expected Shortfall (CVaR) at the 95th "
    "percentile of order value per priority class — the tail-risk "
    "pair (VaR: the threshold; ES: the mean BEYOND it, the coherent "
    "risk measure Basel/actuarial work standardized on) that "
    "q_agg_percentile alone can't give. Exactness: VaR is the exact "
    "discrete percentile (smallest cent value whose cumulative count "
    "reaches ceil(0.95n), via integer cross-multiplication cc·100 ≥ "
    "n·95 — no interpolation, no float rank); the tail mean is one "
    "division of exact integer sums over the ≥VaR rows. Scale: the "
    "percentile rides the bounded distinct-value table per group "
    "(money domain); the tail re-scan is filter-pushed; both aggs "
    "combinable. Ref: no reference counterpart — statistics tier.",
)
def q_agg_expected_shortfall(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    r = o.select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    r = r.localCheckpoint(eager=False)  # vc + tail share it
    vc = r.groupBy("g", "cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = vc.select(
        "g",
        "cents",
        F.sum("c").over(Window.partitionBy("g").orderBy("cents"))
        .cast("long").alias("cc"),
        F.sum("c").over(Window.partitionBy("g")).cast("long").alias("n"),
    )
    var_ = (
        cum.filter(F.col("cc") * 100 >= F.col("n") * 95)
        .groupBy("g")
        .agg(F.min("cents").alias("var_cents"))
    )
    nn = r.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tail = (
        r.join(F.broadcast(var_), "g")
        .filter(F.col("cents") >= F.col("var_cents"))
        .join(F.broadcast(nn), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.sum("cents").cast("long").alias("s_tail"),
            F.any_value("var_cents").cast("long").alias("var_cents"),
            F.any_value("n").cast("long").alias("n"),
        )
    )
    return tail.select(
        F.col("g").alias("o_orderpriority"),
        "n",
        "n_tail",
        (F.round(F.col("var_cents") / 100.0, 2) + 0.0).alias("var_95"),
        (
            F.round(F.col("s_tail").cast("double") / F.col("n_tail") / 100, 6)
            + 0.0
        ).alias("es_95"),
    ).orderBy("o_orderpriority")


_TOST_DELTA_E4 = 50000  # equivalence margin: ±5.0 in value units (1e4 scale)


@register(
    "q_agg_tost_equivalence",
    family="aggregates",
    oracle=f"""
    WITH v AS (
      SELECT user_id % 2 AS variant,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS s,
             sum(CAST(CAST(round(value * 1e4) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 1e4) AS BIGINT)) AS ss
      FROM events GROUP BY variant
    ),
    w AS (
      SELECT
        max(CASE WHEN variant = 0 THEN n END) AS n0,
        max(CASE WHEN variant = 1 THEN n END) AS n1,
        max(CASE WHEN variant = 0 THEN CAST(s AS DOUBLE)/n END) AS m0,
        max(CASE WHEN variant = 1 THEN CAST(s AS DOUBLE)/n END) AS m1,
        max(CASE WHEN variant = 0 THEN
          (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n) / (n-1) END) AS v0,
        max(CASE WHEN variant = 1 THEN
          (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n) / (n-1) END) AS v1
      FROM v
    ),
    tt AS (
      SELECT n0, n1, m1 - m0 AS diff,
             sqrt(v0/n0 + v1/n1) AS se
      FROM w
    )
    SELECT n0, n1,
           round(diff / 1e4, 6) + 0.0 AS diff,
           round(se / 1e4, 6) + 0.0 AS se,
           round(0.5 * {_erfc_sql(f'((diff + {_TOST_DELTA_E4}) / se) / 1.4142135623730951')}, 6)
             + 0.0 AS p_lower,
           round(0.5 * {_erfc_sql(f'(({_TOST_DELTA_E4} - diff) / se) / 1.4142135623730951')}, 6)
             + 0.0 AS p_upper,
           CAST(greatest(
             0.5 * {_erfc_sql(f'((diff + {_TOST_DELTA_E4}) / se) / 1.4142135623730951')},
             0.5 * {_erfc_sql(f'(({_TOST_DELTA_E4} - diff) / se) / 1.4142135623730951')}
           ) < 0.05 AS BOOLEAN) AS equivalent
    FROM tt
    """,
    doc="TOST equivalence test (two one-sided tests) on the mean event "
    "value between the user_id%2 variants with a ±5.0 margin — the "
    "non-inferiority question ('prove the change did NOT move the "
    "metric') that a plain t-test can never answer (failing to reject "
    "≠ equivalence). p_lower tests diff > −δ, p_upper tests diff < "
    "+δ; equivalent iff max(p) < α. Normal approximation through the "
    "shared erfc kernel (identical SQL text both engines). "
    "Exactness: per-variant sufficient stats exact ints (Σ² HUGEINT/"
    "DECIMAL); diff/se/z are single float expressions of exact ints. "
    "Scale: one combinable 2-group pass; arithmetic on one row "
    "after. Ref: no reference counterpart — experimentation tier.",
)
def q_agg_tost_equivalence(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    vq = F.round(F.col("value") * 1e4).cast("long")
    v = ev.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(vq).cast("long").alias("s"),
        F.sum(vq.cast(dec) * vq.cast(dec)).alias("ss"),
    )
    mean_ = F.col("s").cast("double") / F.col("n")
    var_ = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    w = v.select("variant", "n", mean_.alias("m"), var_.alias("vv")).agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("variant") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("variant") == 0, F.col("vv"))).alias("v0"),
        F.max(F.when(F.col("variant") == 1, F.col("vv"))).alias("v1"),
    )
    tt = w.select(
        "n0", "n1",
        (F.col("m1") - F.col("m0")).alias("diff_q"),
        F.sqrt(F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")).alias(
            "se_q"
        ),
    )
    p_lo = F.expr(
        "0.5 * " + _erfc_sql(
            f"((diff_q + {_TOST_DELTA_E4}) / se_q) / 1.4142135623730951"
        )
    )
    p_hi = F.expr(
        "0.5 * " + _erfc_sql(
            f"(({_TOST_DELTA_E4} - diff_q) / se_q) / 1.4142135623730951"
        )
    )
    return tt.select(
        "n0",
        "n1",
        (F.round(F.col("diff_q") / 1e4, 6) + 0.0).alias("diff"),
        (F.round(F.col("se_q") / 1e4, 6) + 0.0).alias("se"),
        (F.round(p_lo, 6) + 0.0).alias("p_lower"),
        (F.round(p_hi, 6) + 0.0).alias("p_upper"),
        (F.greatest(p_lo, p_hi) < 0.05).alias("equivalent"),
    )


@register(
    "q_agg_partial_corr",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(z) AS BIGINT) AS sz,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(z AS HUGEINT) * z) AS szz,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * z) AS sxz,
             sum(CAST(y AS HUGEINT) * z) AS syz
      FROM r
    ),
    c AS (
      SELECT n,
        (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
         * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) AS rxy,
        (n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz)
        / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
         * sqrt(n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz)) AS rxz,
        (n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz)
        / (sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
         * sqrt(n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz)) AS ryz
      FROM st
    )
    SELECT n,
           round(rxy, 6) + 0.0 AS r_xy,
           round(rxz, 6) + 0.0 AS r_xz,
           round(ryz, 6) + 0.0 AS r_yz,
           round((rxy - rxz * ryz)
                 / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz)), 6) + 0.0
             AS partial_r_xy_given_z
    FROM c
    """,
    doc="Partial correlation of quantity and price CONTROLLING for "
    "discount — r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), "
    "the is-the-association-real-or-confounded question that raw "
    "q_agg_corr cannot answer; the scalar special case of the "
    "precision-matrix reading of q_agg_covar_matrix. Exactness: all "
    "nine sufficient statistics are exact ints in one pass "
    "(quadratics HUGEINT/DECIMAL); the three Pearson r's and the "
    "partial r are single float expressions of them — no "
    "intermediate rounding. Scale: ONE map-side-combinable pass, "
    "1-row output. Ref: no reference counterpart — statistics tier.",
)
def q_agg_partial_corr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    x = F.round("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    z = F.round(F.col("l_discount") * 100).cast("long")
    r = li.select(x.alias("x"), y.alias("y"), z.alias("z"))
    st = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
        F.sum(F.col("z").cast(dec) * F.col("z").cast(dec)).alias("szz"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("z").cast(dec)).alias("sxz"),
        F.sum(F.col("y").cast(dec) * F.col("z").cast(dec)).alias("syz"),
    )

    def pearson(sab, sa, sb, saa, sbb):
        return (
            F.col("n") * F.col(sab).cast("double")
            - F.col(sa).cast("double") * F.col(sb)
        ) / (
            F.sqrt(
                F.col("n") * F.col(saa).cast("double")
                - F.col(sa).cast("double") * F.col(sa)
            )
            * F.sqrt(
                F.col("n") * F.col(sbb).cast("double")
                - F.col(sb).cast("double") * F.col(sb)
            )
        )

    c = st.select(
        "n",
        pearson("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        pearson("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        pearson("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return c.select(
        "n",
        (F.round(F.col("rxy"), 6) + 0.0).alias("r_xy"),
        (F.round(F.col("rxz"), 6) + 0.0).alias("r_xz"),
        (F.round(F.col("ryz"), 6) + 0.0).alias("r_yz"),
        (
            F.round(
                (F.col("rxy") - F.col("rxz") * F.col("ryz"))
                / (
                    F.sqrt(1.0 - F.col("rxz") * F.col("rxz"))
                    * F.sqrt(1.0 - F.col("ryz") * F.col("ryz"))
                ),
                6,
            )
            + 0.0
        ).alias("partial_r_xy_given_z"),
    )


@register(
    "q_agg_elasticity",
    family="aggregates",
    oracle="""
    WITH r AS (
      -- per (type, part): total qty at that part's price point — the
      -- cross-sectional demand observation; ln terms quantized 1e9 so
      -- the OLS sufficient statistics are exact integer sums
      SELECT p.p_type AS g,
             CAST(round(ln(CAST(round(p.p_retailprice * 100) AS BIGINT)
                           * 1.0) * 1e9) AS BIGINT) AS lx,
             CAST(round(ln(CAST(sum(CAST(round(l.l_quantity) AS BIGINT))
                           AS DOUBLE)) * 1e9) AS BIGINT) AS ly
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type, p.p_partkey, p.p_retailprice
    ),
    st AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             sum(CAST(lx AS HUGEINT) * lx) AS sxx,
             sum(CAST(lx AS HUGEINT) * ly) AS sxy
      FROM r GROUP BY g
    )
    SELECT g AS p_type, n AS n_parts,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / nullif(n * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * sx, 0), 6) + 0.0 AS elasticity
    FROM st ORDER BY p_type
    """,
    doc="Price elasticity of demand per part type: OLS slope of "
    "ln(total quantity) on ln(price) across a type's parts — the "
    "log-log regression whose coefficient IS the elasticity "
    "(%Δdemand per %Δprice), the pricing-analytics staple; a "
    "domain-framed sibling of q_agg_ols on the same quantized-log "
    "machinery. Exactness: both log terms quantize to 1e9 ints at "
    "the per-part level, so the per-type OLS sufficient statistics "
    "are exact integer sums (quadratics HUGEINT/DECIMAL) and the "
    "slope is one float expression. Scale: one combinable per-part "
    "rollup (the only fact shuffle) + a per-type stats agg on the "
    "part-sized table. Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_elasticity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_retailprice"
    )
    r = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "p_partkey", "p_retailprice")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
        .select(
            F.col("p_type").alias("g"),
            F.round(
                F.log(
                    F.round(F.col("p_retailprice") * 100).cast("long") * 1.0
                )
                * 1e9
            ).cast("long").alias("lx"),
            F.round(F.log(F.col("q").cast("double")) * 1e9)
            .cast("long").alias("ly"),
        )
    )
    dec = "decimal(38,0)"
    st = r.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx").cast(dec) * F.col("lx").cast(dec)).alias("sxx"),
        F.sum(F.col("lx").cast(dec) * F.col("ly").cast(dec)).alias("sxy"),
    )
    return st.select(
        F.col("g").alias("p_type"),
        F.col("n").alias("n_parts"),
        (
            F.round(
                (
                    F.col("n") * F.col("sxy").cast("double")
                    - F.col("sx").cast("double") * F.col("sy")
                )
                / F.nullif(
                    F.col("n") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx"),
                    F.lit(0.0),
                ),
                6,
            )
            + 0.0
        ).alias("elasticity"),
    ).orderBy("p_type")


@register(
    "q_agg_mcnemar",
    family="aggregates",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(max(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS pre_c,
             CAST(max(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS post_c
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(*) FILTER (pre_c = 1 AND post_c = 0) AS BIGINT) AS b,
             CAST(count(*) FILTER (pre_c = 0 AND post_c = 1) AS BIGINT) AS c
      FROM per_user
    ),
    win AS (
      -- exact binomial(n=b+c, p=1/2) tail; enumerate only the 12σ
      -- window below min(b,c) — the excluded head is < 1e-30
      SELECT n_pairs, b, c, least(b, c) AS m, b + c AS nd,
             greatest(CAST(0 AS BIGINT),
               CAST(floor(least(b, c) - 12 * sqrt((b + c) / 4.0) - 2)
                 AS BIGINT)) AS klo
      FROM cells
    ),
    terms AS (
      SELECT n_pairs, b, c, m, nd,
             exp({_lf_sql('nd')} - {_lf_sql('k')} - {_lf_sql('nd - k')}
                 - nd * 0.6931471805599453) AS pk
      FROM (SELECT w.*, unnest(generate_series(w.klo, w.m)) AS k FROM win w)
    )
    SELECT any_value(n_pairs) AS n_pairs, any_value(b) AS b,
           any_value(c) AS c,
           round(CASE WHEN any_value(nd) = 0 THEN 0.0 ELSE
             pow(abs(any_value(b) - any_value(c)) - 1.0, 2)
             / any_value(nd) END, 6) + 0.0 AS chi2_cc,
           round(least(1.0, 2.0 * sum(pk)), 6) + 0.0 AS p_exact
    FROM terms GROUP BY n_pairs
    """,
    doc="McNemar's test on paired pre/post per-user conversion (did "
    "each user purchase before vs after the midpoint) — the "
    "PAIRED-nominal test a two-proportion z gets wrong when both "
    "columns come from the same subjects: only the discordant cells "
    "b (pre-only) and c (post-only) carry information. Reports the "
    "continuity-corrected chi² AND the exact binomial(b+c, 1/2) "
    "two-sided p through the shared ln(k!) kernel, enumerating only "
    "the 12σ window below min(b,c) (excluded head < 1e-30 — the "
    "same honest cap as q_agg_fisher_exact). Exactness: cells are "
    "exact ints from one per-user max-flag pass; ln(2) is a shared "
    "literal; the tail sum's terms are identical expressions both "
    "engines. Scale: one combinable per-user agg + O(σ)-term "
    "generated series. Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_mcnemar(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    isp = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when((F.col("ts") < cut) & isp, 1).otherwise(0))
        .cast("long").alias("pre_c"),
        F.max(F.when((F.col("ts") >= cut) & isp, 1).otherwise(0))
        .cast("long").alias("post_c"),
    )
    cells = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when((F.col("pre_c") == 1) & (F.col("post_c") == 0), 1).otherwise(0))
        .cast("long").alias("b"),
        F.sum(F.when((F.col("pre_c") == 0) & (F.col("post_c") == 1), 1).otherwise(0))
        .cast("long").alias("c"),
    )
    win = cells.select(
        "n_pairs", "b", "c",
        F.least("b", "c").alias("m"),
        (F.col("b") + F.col("c")).alias("nd"),
        F.greatest(
            F.lit(0).cast("long"),
            F.expr(
                "CAST(floor(least(b, c) - 12 * sqrt((b + c) / 4.0) - 2)"
                " AS BIGINT)"
            ),
        ).alias("klo"),
    )
    lf = _lf_sql
    pk = F.expr(
        f"exp({lf('nd')} - {lf('k')} - {lf('nd - k')}"
        " - nd * 0.6931471805599453)"
    )
    terms = win.select(
        "n_pairs", "b", "c", "m", "nd",
        F.explode(F.expr("sequence(klo, m)")).alias("k"),
    ).select("*", pk.alias("pk"))
    chi2 = F.when(F.any_value("nd") == 0, F.lit(0.0)).otherwise(
        F.pow(F.abs(F.any_value("b") - F.any_value("c")) - 1.0, F.lit(2.0))
        / F.any_value("nd")
    )
    return terms.groupBy("n_pairs").agg(
        F.any_value("b").alias("b"),
        F.any_value("c").alias("c"),
        (F.round(chi2, 6) + 0.0).alias("chi2_cc"),
        (
            F.round(F.least(F.lit(1.0), 2.0 * F.sum("pk")), 6) + 0.0
        ).alias("p_exact"),
    ).select("n_pairs", "b", "c", "chi2_cc", "p_exact")


@register(
    "q_agg_diversity_hill",
    family="aggregates",
    oracle="""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(*) AS BIGINT) AS k FROM src),
    q AS (
      SELECT t.k, t.nt,
             CAST(sum(CAST(round(
               (s.n * 1.0 / t.nt) * ln(s.n * 1.0 / t.nt) * 1e12
             ) AS BIGINT)) AS BIGINT) AS q_plnp,
             -- plug-in Simpson (Σn², not the unbiased Σn(n-1)): the
             -- plug-in keeps the Hill ladder richness >= h1 >= h2 an
             -- EXACT invariant (pinned); the unbiased form overshoots
             -- it by O(k/N) on near-uniform samples
             sum(CAST(s.n AS HUGEINT) * s.n) AS sq_mass
      FROM src s CROSS JOIN tot t GROUP BY t.k, t.nt
    )
    SELECT k AS richness, nt AS n_docs,
           round(exp(-q_plnp / 1e12), 6) + 0.0 AS hill_1,
           round(CAST(nt AS DOUBLE) * nt
                 / CAST(sq_mass AS DOUBLE), 6) + 0.0 AS hill_2,
           round(exp(-q_plnp / 1e12) / k, 6) + 0.0 AS evenness
    FROM q
    """,
    doc="Hill-number diversity profile of the source mixture — the "
    "'effective number of sources' ladder: q=0 richness (count), "
    "q=1 exp(Shannon) (weights sources by share), q=2 inverse "
    "Simpson (weights by share², punishing dominance) plus Pielou-"
    "style evenness = hill₁/richness — the corpus-health readout "
    "that q_agg_entropy's nats don't make comparable across corpora "
    "('effective 3.2 sources out of 5' is actionable; '1.16 nats' "
    "is not). Exactness: each p·ln p term is quantized 1e12 before "
    "the cross-source integer sum; inverse Simpson is the exact "
    "rational N²/Σn² (the PLUG-IN form, chosen over the unbiased "
    "N(N−1)/Σn(n−1) because plug-in keeps the Hill ladder richness "
    "≥ h₁ ≥ h₂ an exact invariant — pinned — where the unbiased "
    "estimator overshoots it by O(k/N) on near-uniform samples) "
    "with the square mass in HUGEINT/DECIMAL. Scale: one combinable "
    "per-source rollup + arithmetic on |sources| rows. Ref: no "
    "reference counterpart — statistics tier.",
)
def q_agg_diversity_hill(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    src = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    src = src.localCheckpoint(eager=False)  # tot + q share it
    tot = src.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p = F.col("n") * 1.0 / F.col("nt")
    q = (
        src.join(F.broadcast(tot))
        .groupBy("k", "nt")
        .agg(
            F.sum(F.round(p * F.log(p) * 1e12).cast("long"))
            .cast("long").alias("q_plnp"),
            F.sum(F.col("n").cast(dec) * F.col("n").cast(dec)).alias(
                "sq_mass"
            ),
        )
    )
    return q.select(
        F.col("k").alias("richness"),
        F.col("nt").alias("n_docs"),
        (F.round(F.exp(-F.col("q_plnp") / 1e12), 6) + 0.0).alias("hill_1"),
        (
            F.round(
                F.col("nt").cast("double") * F.col("nt")
                / F.col("sq_mass").cast("double"),
                6,
            )
            + 0.0
        ).alias("hill_2"),
        (
            F.round(F.exp(-F.col("q_plnp") / 1e12) / F.col("k"), 6) + 0.0
        ).alias("evenness"),
    )


# ---------------------------------------------------------------------------
# Round-9 wave 1: inferential statistics (Kruskal-Wallis, Jarque-Bera,
# Tukey HSD, Hodges-Lehmann, G-test). Same discipline as the r8 wave:
# exact integer sufficient statistics (DECIMAL/HUGEINT where quadratic+),
# quantize-before-sum for any cross-row float term, and one identical
# float expression tree on both engines.
# ---------------------------------------------------------------------------


def _chi2_sf_even_sql(x: str, m: int) -> str:
    """SQL text for the chi-square survival function with EVEN df = 2m:
    P(X > x) = exp(-x/2) * sum_{i=0}^{m-1} (x/2)^i / i! — the exact
    closed form (no approximation), identical expression text on both
    engines. The argument is bound as DOUBLE once (the r8 erfc lesson:
    a bare high-scale DECIMAL literal overflows scale 38 under textual
    powering).
    """
    import math as _math

    xd = f"(CAST(({x}) AS DOUBLE) / 2.0)"
    terms = " + ".join(
        "1.0" if i == 0 else f"({' * '.join([xd] * i)}) / {float(_math.factorial(i))!r}"
        for i in range(m)
    )
    return f"(exp(-{xd}) * ({terms}))"


@register(
    "q_agg_kruskal",
    family="aggregates",
    oracle=f"""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
    ),
    cells AS (
      SELECT cents, et, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY cents, et
    ),
    vtot AS (
      SELECT cents, CAST(sum(cnt) AS BIGINT) AS tc FROM cells GROUP BY cents
    ),
    mr AS (
      SELECT cents, tc,
             2 * (sum(tc) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - tc)
               + tc + 1 AS dmr
      FROM vtot
    ),
    rj AS (
      SELECT c.et, CAST(sum(c.cnt) AS BIGINT) AS nj,
             CAST(sum(c.cnt * m.dmr) AS BIGINT) AS r2j
      FROM cells c JOIN mr m ON m.cents = c.cents
      GROUP BY c.et
    ),
    tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k FROM rj),
    tq AS (
      SELECT CAST(sum(CAST(round(CAST(r2j AS DOUBLE) * r2j / (4.0 * nj))
                           AS HUGEINT)) AS DOUBLE) AS t
      FROM rj
    ),
    ties AS (SELECT CAST(sum(tc * tc * tc - tc) AS BIGINT) AS t3 FROM vtot),
    h AS (
      SELECT tot.n, tot.k,
             12.0 * tq.t / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
               - 3.0 * (tot.n + 1) AS h_raw,
             1.0 - CAST(ties.t3 AS DOUBLE)
               / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n) AS cc
      FROM tot CROSS JOIN tq CROSS JOIN ties
    )
    SELECT n AS n_total, k AS k_groups,
           round(h_raw, 6) + 0.0 AS h_stat,
           round(h_raw / cc, 6) + 0.0 AS h_corrected,
           round({_chi2_sf_even_sql("h_raw / cc", 2)}, 6) + 0.0 AS p_value
    FROM h
    """,
    doc="Kruskal-Wallis H across the five event types on value — the "
    "k-group generalization of q_agg_mannwhitney (rank-based one-way "
    "ANOVA, no normality assumption), with the tie correction and an "
    "EXACT chi-square p-value (df = k-1 = 4 is even, so the survival "
    "function is the closed form exp(-x/2)(1+x/2) — no approximation, "
    "via the shared _chi2_sf_even_sql kernel). Ranks never "
    "materialize per row: the mannwhitney discipline — values "
    "collapse to the cent-quantized domain, DOUBLED midranks keep "
    "ties integral, per-group doubled rank sums are exact BIGINTs. "
    "R_j^2/n_j (which exceeds int64) is computed in double from "
    "exactly-equal ints and re-quantized to HUGEINT/DECIMAL(38,0) "
    "BEFORE the cross-group sum, so group order cannot perturb H. "
    "Scale: one combinable (value,group) cell rollup; the cumsum "
    "window is DOMAIN-bounded (distinct cents, not rows); everything "
    "after runs on k rows. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_kruskal(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.col("event_type").alias("et"),
        )
        .groupBy("cents", "et")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # vtot + rj read it
    vtot = cells.groupBy("cents").agg(F.sum("cnt").cast("long").alias("tc"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    # domain-bounded window: one row per distinct cent value, never per event
    mr = vtot.select(
        "cents",
        "tc",
        (2 * (F.sum("tc").over(w) - F.col("tc")) + F.col("tc") + 1).alias("dmr"),
    )
    rj = (
        cells.join(mr.select("cents", "dmr"), "cents")
        .groupBy("et")
        .agg(
            F.sum("cnt").cast("long").alias("nj"),
            F.sum(F.col("cnt") * F.col("dmr")).cast("long").alias("r2j"),
        )
    )
    rj = rj.localCheckpoint(eager=False)  # tot + tq read it
    tot = rj.agg(
        F.sum("nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    tq = rj.agg(
        F.sum(
            F.round(
                F.col("r2j").cast("double") * F.col("r2j") / (4.0 * F.col("nj"))
            ).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("t")
    )
    ties = vtot.agg(
        F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
        .cast("long")
        .alias("t3")
    )
    nd = F.col("n").cast("double")
    h_raw = 12.0 * F.col("t") / (nd * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)
    cc = 1.0 - F.col("t3").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    hc = (h_raw / cc).alias("hc")
    out = (
        tot.crossJoin(tq)
        .crossJoin(ties)
        .select(F.col("n"), F.col("k"), h_raw.alias("h_raw"), hc)
    )
    return out.select(
        F.col("n").alias("n_total"),
        F.col("k").alias("k_groups"),
        (F.round(F.col("h_raw"), 6) + 0.0).alias("h_stat"),
        (F.round(F.col("hc"), 6) + 0.0).alias("h_corrected"),
        (F.round(F.expr(_chi2_sf_even_sql("hc", 2)), 6) + 0.0).alias("p_value"),
    )


@register(
    "q_agg_jarque_bera",
    family="aggregates",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS c
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)        AS n,
             CAST(sum(c)             AS DOUBLE) AS s1,
             CAST(sum(c*c)           AS DOUBLE) AS s2,
             CAST(sum(c*c*c)         AS DOUBLE) AS s3,
             CAST(sum(c*c*c*c)       AS DOUBLE) AS s4
      FROM c GROUP BY 1
    ),
    m AS (
      SELECT event_type, n,
             s2 / n - (s1 / n) * (s1 / n)                    AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                    + 2 * (s1 / n) * (s1 / n) * (s1 / n)     AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    ),
    jb AS (
      SELECT event_type, n,
             m3 / (m2 * sqrt(m2))  AS skew,
             m4 / (m2 * m2) - 3    AS kurt,
             n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                        + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4.0)
               AS jb_stat
      FROM m
    )
    SELECT event_type, n,
           round(skew, 6) + 0.0 AS skewness,
           round(kurt, 6) + 0.0 AS kurtosis_excess,
           round(jb_stat, 6) + 0.0 AS jb_stat,
           round({_chi2_sf_even_sql("jb_stat", 1)}, 6) + 0.0 AS p_value
    FROM jb ORDER BY event_type
    """,
    doc="Jarque-Bera normality test per event type — the is-this-"
    "metric-normal gate that decides whether q_agg_ttest's "
    "assumptions hold or q_agg_mannwhitney should be used instead; "
    "pairs with q_agg_moments exactly the way q_agg_tukey_hsd pairs "
    "with q_agg_anova (moments describe, JB tests). JB = n/6 "
    "(skew^2 + kurtosis^2/4) from the same exact integer power sums "
    "as q_agg_moments (cents as DECIMAL(38,0)/HUGEINT, c..c^4 exact), "
    "and the p-value is the EXACT chi-square survival at df=2 "
    "(exp(-JB/2), the m=1 case of the shared _chi2_sf_even_sql "
    "kernel — no approximation). Scale: one map-side-combinable "
    "groupBy carrying 5 numbers per series; constant work after. "
    "Ref: no reference counterpart — statistics tier.",
)
def q_agg_jarque_bera(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("decimal(19,0)")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = ev.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("c"))).cast("double").alias("s1"),
        F.sum(dec(F.col("c") * F.col("c"))).cast("double").alias("s2"),
        F.sum(dec(F.col("c") * F.col("c") * F.col("c"))).cast("double").alias("s3"),
        F.sum(
            dec(F.col("c") * F.col("c") * F.col("c") * F.col("c"))
        ).cast("double").alias("s4"),
    )
    s1n = F.col("s1") / F.col("n")
    s2n = F.col("s2") / F.col("n")
    s3n = F.col("s3") / F.col("n")
    s4n = F.col("s4") / F.col("n")
    m = s.select(
        "event_type",
        "n",
        (s2n - s1n * s1n).alias("m2"),
        (s3n - F.lit(3) * s1n * s2n + F.lit(2) * s1n * s1n * s1n).alias("m3"),
        (
            s4n
            - F.lit(4) * s1n * s3n
            + F.lit(6) * s1n * s1n * s2n
            - F.lit(3) * s1n * s1n * s1n * s1n
        ).alias("m4"),
    )
    m2 = F.col("m2")
    skew = F.col("m3") / (m2 * F.sqrt(m2))
    kurt = F.col("m4") / (m2 * m2) - 3
    jb = m.select(
        "event_type",
        "n",
        skew.alias("skew"),
        kurt.alias("kurt"),
        (F.col("n") / 6.0 * (skew * skew + kurt * kurt / 4.0)).alias("jb_stat"),
    )
    return jb.select(
        "event_type",
        "n",
        (F.round("skew", 6) + 0.0).alias("skewness"),
        (F.round("kurt", 6) + 0.0).alias("kurtosis_excess"),
        (F.round("jb_stat", 6) + 0.0).alias("jb_stat"),
        (F.round(F.expr(_chi2_sf_even_sql("jb_stat", 1)), 6) + 0.0).alias(
            "p_value"
        ),
    ).orderBy("event_type")


# q_{0.05, k=5, df=inf} — the studentized-range critical value for five
# groups at alpha=0.05 with large within-group df (every fixture group
# has n >> 1000, so the inf-df row of the published table applies).
_TUKEY_Q_CRIT = 3.858


@register(
    "q_agg_tukey_hsd",
    family="aggregates",
    oracle=f"""
    WITH c AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    st AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
                        - CAST(sum(c) AS DOUBLE) * sum(c) / count(*))
                  AS HUGEINT) AS sswj
      FROM c GROUP BY g
    ),
    msw AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(sswj) AS DOUBLE) AS ssw
      FROM st
    ),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
             CAST(a.s1 AS DOUBLE) / a.n - CAST(b.s1 AS DOUBLE) / b.n AS diff,
             sqrt(m.ssw / (m.nn - m.k) / 2.0 * (1.0 / a.n + 1.0 / b.n)) AS se
      FROM st a JOIN st b ON a.g < b.g CROSS JOIN msw m
    )
    SELECT g1, g2, n1, n2,
           round(diff / 100, 6) + 0.0 AS mean_diff,
           round(abs(diff) / se, 6) + 0.0 AS q_stat,
           abs(diff) / se > {_TUKEY_Q_CRIT} AS significant
    FROM pairs ORDER BY g1, g2
    """,
    doc="Tukey HSD post-hoc pairwise comparisons after q_agg_anova — "
    "WHICH groups differ once the omnibus F says some do; the "
    "studentized-range q statistic |mean_i - mean_j| / "
    "sqrt(MSW/2 (1/n_i + 1/n_j)) for all k(k-1)/2 pairs, judged "
    f"against the published q_(0.05, k=5, inf) = {_TUKEY_Q_CRIT} "
    "(within-group df is >>1000 at every fixture scale, so the "
    "inf-df row applies; emitting q itself keeps the operator "
    "critical-value-table-free). Exactness: per-group (n, sum, "
    "sumsq) are exact ints; each group's within-SS is quantized to "
    "HUGEINT/DECIMAL(38,0) BEFORE the cross-group sum (group order "
    "cannot perturb MSW); q is one float expression of exact ints. "
    "Scale: one combinable pass over the fact; the pair join runs "
    "on the k-row group table. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_tukey_hsd(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    st = c.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.round(
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).cast("double")
            - F.sum("c").cast("double") * F.sum("c") / F.count(F.lit(1))
        )
        .cast("decimal(38,0)")
        .alias("sswj"),
    )
    st = st.localCheckpoint(eager=False)  # msw + both pair sides read it
    msw = st.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sswj").cast("double").alias("ssw"),
    )
    a, b = st.alias("a"), st.alias("b")
    diff = F.col("a.s1").cast("double") / F.col("a.n") - F.col(
        "b.s1"
    ).cast("double") / F.col("b.n")
    se = F.sqrt(
        F.col("ssw")
        / (F.col("nn") - F.col("k"))
        / 2.0
        * (1.0 / F.col("a.n") + 1.0 / F.col("b.n"))
    )
    return (
        a.join(b, F.col("a.g") < F.col("b.g"))
        .crossJoin(F.broadcast(msw))
        .select(
            F.col("a.g").alias("g1"),
            F.col("b.g").alias("g2"),
            F.col("a.n").alias("n1"),
            F.col("b.n").alias("n2"),
            (F.round(diff / 100, 6) + 0.0).alias("mean_diff"),
            (F.round(F.abs(diff) / se, 6) + 0.0).alias("q_stat"),
            (F.abs(diff) / se > _TUKEY_Q_CRIT).alias("significant"),
        )
        .orderBy("g1", "g2")
    )


@register(
    "q_agg_hodges_lehmann",
    family="aggregates",
    oracle="""
    WITH d1 AS (
      SELECT CAST(round(value * 10) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM events WHERE event_type = 'click' GROUP BY v
    ),
    d2 AS (
      SELECT CAST(round(value * 10) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM events WHERE event_type = 'purchase' GROUP BY v
    ),
    diffs AS (
      SELECT d1.v - d2.v AS d, CAST(sum(d1.w * d2.w) AS BIGINT) AS w
      FROM d1 CROSS JOIN d2 GROUP BY d1.v - d2.v
    ),
    tot AS (
      SELECT CAST(sum(w) AS BIGINT) AS t,
             (SELECT CAST(sum(w) AS BIGINT) FROM d1) AS n1,
             (SELECT CAST(sum(w) AS BIGINT) FROM d2) AS n2
      FROM diffs
    ),
    cum AS (
      SELECT d, sum(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cw
      FROM diffs
    )
    SELECT tot.n1, tot.n2, tot.t AS n_pairs,
           round(((SELECT min(d) FROM cum WHERE cw >= (tot.t + 1) // 2)
                  + (SELECT min(d) FROM cum WHERE cw >= tot.t // 2 + 1))
                 / 2.0 / 10.0, 6) + 0.0 AS hl_shift
    FROM tot
    """,
    doc="Hodges-Lehmann shift estimator between click and purchase "
    "values — the median of ALL n1*n2 pairwise differences, the "
    "robust effect-SIZE companion to q_agg_mannwhitney's test (U "
    "says the distributions differ; HL says by how much, immune to "
    "outliers that wreck a difference of means). The pairwise set "
    "never materializes per row: values collapse to the dime-"
    "quantized DOMAIN (the estimator's documented 0.1 resolution), "
    "the difference distribution is the weighted cross of the two "
    "domain tables — O(|domain|^2) cells bounded by the VALUE RANGE, "
    "never O(rows^2) — and the median is an exact weighted-median "
    "walk over the cumulated cells (lower+upper convention, exact "
    "integers throughout). Scale: two combinable per-value rollups; "
    "the domain cross is ~6k x 6k worst case regardless of corpus "
    "size; the cumsum window is domain-bounded. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_hodges_lehmann(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    dime = F.round(F.col("value") * 10).cast("long").alias("v")

    def dom(et):
        return (
            ev.filter(F.col("event_type") == et)
            .select(dime)
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
        )

    d1, d2 = dom("click"), dom("purchase")
    # each domain feeds the cross AND its n_j total: cut lineage once
    d1 = d1.localCheckpoint(eager=False)
    d2 = d2.localCheckpoint(eager=False)
    diffs = (
        d1.crossJoin(d2.select(F.col("v").alias("v2"), F.col("w").alias("w2")))
        .groupBy((F.col("v") - F.col("v2")).alias("d"))
        .agg(F.sum(F.col("w") * F.col("w2")).cast("long").alias("w"))
    )
    diffs = diffs.localCheckpoint(eager=False)  # tot + cum read it
    tot = (
        diffs.agg(F.sum("w").cast("long").alias("t"))
        .crossJoin(d1.agg(F.sum("w").cast("long").alias("n1")))
        .crossJoin(d2.agg(F.sum("w").cast("long").alias("n2")))
    )
    tot = tot.localCheckpoint(eager=False)  # 1 row, three consumers
    # domain-bounded window: one row per distinct dime difference
    cum = diffs.select(
        "d",
        F.sum("w")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
    )
    cum = cum.localCheckpoint(eager=False)  # two median walks read it
    lo = (
        cum.crossJoin(F.broadcast(tot.select("t")))
        .filter(F.col("cw") >= F.expr("(t + 1) div 2"))
        .agg(F.min("d").alias("lo"))
    )
    hi = (
        cum.crossJoin(F.broadcast(tot.select(F.col("t").alias("t2"))))
        .filter(F.col("cw") >= F.expr("t2 div 2 + 1"))
        .agg(F.min("d").alias("hi"))
    )
    return (
        tot.crossJoin(lo)
        .crossJoin(hi)
        .select(
            "n1",
            "n2",
            F.col("t").alias("n_pairs"),
            (
                F.round((F.col("lo") + F.col("hi")) / 2.0 / 10.0, 6) + 0.0
            ).alias("hl_shift"),
        )
    )


@register(
    "q_agg_g_test",
    family="aggregates",
    oracle=f"""
    WITH cells AS (
      SELECT event_type AS et, CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY et, dw
    ),
    rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY et),
    ct AS (SELECT dw, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY dw),
    nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT CAST(round(2e9 * o * ln(CAST(o AS DOUBLE) * nn.n
                                     / (CAST(rt.r AS DOUBLE) * ct.c)))
                  AS BIGINT) AS tq
      FROM cells JOIN rt ON rt.et = cells.et
                 JOIN ct ON ct.dw = cells.dw
                 CROSS JOIN nn
    ),
    g AS (
      SELECT CAST(sum(tq) AS DOUBLE) / 1e9 AS g_stat,
             (SELECT (count(*) - 1) FROM rt)
               * (SELECT (count(*) - 1) FROM ct) AS df
      FROM terms
    )
    SELECT CAST(df AS BIGINT) AS df,
           round(g_stat, 6) + 0.0 AS g_stat,
           round({_chi2_sf_even_sql("g_stat", 12)}, 6) + 0.0 AS p_value
    FROM g
    """,
    doc="G-test (log-likelihood-ratio test) of independence on the "
    "event_type x day-of-week contingency table — the additive "
    "sibling of q_agg_chisq (G decomposes exactly across table "
    "collapses, chi-square does not; it is 2n x the mutual "
    "information q_agg_mutual_info reports). Each cell's "
    "2 O ln(O n / (r c)) term is an identical float expression of "
    "exact integer margins, quantized to 1e-9 and BIGINT-summed — "
    "cross-engine order-independent (the q_ml_brier discipline). "
    "The p-value is the EXACT even-df chi-square survival via the "
    "shared _chi2_sf_even_sql kernel at df = (5-1)(7-1) = 24 (m=12; "
    "df is also emitted as data-derived so a fixture change is "
    "visible). Scale: one combinable <=35-cell rollup; arithmetic "
    "after. Ref: no reference counterpart — statistics tier.",
)
def q_agg_g_test(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.dayofweek("ts") - 1).cast("long").alias("dw"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    cells = cells.localCheckpoint(eager=False)  # margins + terms read it
    rt = cells.groupBy("et").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("dw").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "dw")
        .crossJoin(F.broadcast(nn))
        .select(
            F.round(
                2e9
                * F.col("o")
                * F.log(
                    F.col("o").cast("double")
                    * F.col("n")
                    / (F.col("r").cast("double") * F.col("c"))
                )
            )
            .cast("long")
            .alias("tq")
        )
    )
    dfree = (
        rt.agg((F.count(F.lit(1)) - 1).alias("r1"))
        .crossJoin(ct.agg((F.count(F.lit(1)) - 1).alias("c1")))
        .select((F.col("r1") * F.col("c1")).cast("long").alias("df"))
    )
    g = terms.agg((F.sum("tq").cast("double") / 1e9).alias("g_stat"))
    return dfree.crossJoin(g).select(
        "df",
        (F.round("g_stat", 6) + 0.0).alias("g_stat"),
        (F.round(F.expr(_chi2_sf_even_sql("g_stat", 12)), 6) + 0.0).alias(
            "p_value"
        ),
    )


@register(
    "q_agg_ancova",
    family="aggregates",
    oracle="""
    WITH r AS (
      SELECT event_type AS g,
             CAST(extract(hour FROM ts) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    st AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(round((CAST(sum(x * x) AS DOUBLE)
                         - CAST(sum(x) AS DOUBLE) * sum(x) / count(*)) * 1e6)
                  AS HUGEINT) AS sxx6,
             CAST(round((CAST(sum(x * y) AS DOUBLE)
                         - CAST(sum(x) AS DOUBLE) * sum(y) / count(*)) * 1e6)
                  AS HUGEINT) AS sxy6,
             CAST(round((CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE)
                         - CAST(sum(y) AS DOUBLE) * sum(y) / count(*)) * 1e6)
                  AS HUGEINT) AS syy6
      FROM r GROUP BY g
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(sx) AS BIGINT) AS tsx, CAST(sum(sy) AS BIGINT) AS tsy,
             CAST(sum(sxx6) AS DOUBLE) / 1e6 AS sxx_w,
             CAST(sum(sxy6) AS DOUBLE) / 1e6 AS sxy_w,
             CAST(sum(syy6) AS DOUBLE) / 1e6 AS syy_w
      FROM st
    ),
    gt AS (
      SELECT CAST(count(*) AS BIGINT) AS nn2,
             CAST(sum(x) AS BIGINT) AS gx, CAST(sum(y) AS BIGINT) AS gy,
             CAST(sum(x * x) AS BIGINT) AS gxx,
             CAST(sum(x * y) AS BIGINT) AS gxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS gyy
      FROM r
    ),
    f AS (
      SELECT t.nn, t.k,
             t.sxy_w / t.sxx_w AS bw,
             t.syy_w - t.sxy_w * t.sxy_w / t.sxx_w AS sse_full,
             (CAST(gt.gyy AS DOUBLE) - CAST(gt.gy AS DOUBLE) * gt.gy / gt.nn2)
             - (CAST(gt.gxy AS DOUBLE) - CAST(gt.gx AS DOUBLE) * gt.gy / gt.nn2)
               * (CAST(gt.gxy AS DOUBLE) - CAST(gt.gx AS DOUBLE) * gt.gy / gt.nn2)
               / (CAST(gt.gxx AS DOUBLE) - CAST(gt.gx AS DOUBLE) * gt.gx / gt.nn2)
               AS sse_red,
             CAST(gt.gx AS DOUBLE) / gt.nn2 AS xbar
      FROM tot t CROSS JOIN gt
    )
    SELECT st.g AS event_type, st.n,
           round((CAST(st.sy AS DOUBLE) / st.n
                  - f.bw * (CAST(st.sx AS DOUBLE) / st.n - f.xbar)) / 100,
                 6) + 0.0 AS adj_mean_value,
           round(f.bw / 100, 6) + 0.0 AS slope_within,
           round(((f.sse_red - f.sse_full) / (f.k - 1))
                 / (f.sse_full / (f.nn - f.k - 1)), 6) + 0.0 AS f_groups
    FROM st CROSS JOIN f ORDER BY event_type
    """,
    doc="One-covariate ANCOVA: per-event-type mean value ADJUSTED for "
    "hour-of-day (the pooled within-group regression slope removes "
    "the shared time-of-day effect before groups are compared), plus "
    "the F test of the group effect given the covariate — the "
    "are-groups-different-once-X-is-controlled readout that raw "
    "ANOVA (q_agg_anova) cannot give; completes the "
    "describe(moments) -> omnibus(anova) -> covariate-adjust(ancova) "
    "-> post-hoc(tukey_hsd) inference ladder. Exactness: per-group "
    "centered S-terms are floats of exact integer sums, quantized to "
    "1e-6 HUGEINT/DECIMAL(38,0) BEFORE the cross-group pooling "
    "(group order cannot perturb the pooled slope or either SSE); "
    "the F ratio and adjusted means are single float expressions. "
    "Scale: one combinable pass carrying 6 numbers per group + one "
    "grand-total pass over the same scan; k-row arithmetic after. "
    "Ref: no reference counterpart — statistics tier.",
)
def q_agg_ancova(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    r = ev.select(
        F.col("event_type").alias("g"),
        F.hour("ts").cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    r = r.localCheckpoint(eager=False)  # per-group + grand passes read it
    n_, sx, sy = F.count(F.lit(1)), F.sum("x"), F.sum("y")
    st = r.groupBy("g").agg(
        n_.cast("long").alias("n"),
        sx.cast("long").alias("sx"),
        sy.cast("long").alias("sy"),
        F.round(
            (
                F.sum(F.col("x") * F.col("x")).cast("double")
                - F.sum("x").cast("double") * F.sum("x") / F.count(F.lit(1))
            )
            * 1e6
        ).cast("decimal(38,0)").alias("sxx6"),
        F.round(
            (
                F.sum(F.col("x") * F.col("y")).cast("double")
                - F.sum("x").cast("double") * F.sum("y") / F.count(F.lit(1))
            )
            * 1e6
        ).cast("decimal(38,0)").alias("sxy6"),
        F.round(
            (
                F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).cast("double")
                - F.sum("y").cast("double") * F.sum("y") / F.count(F.lit(1))
            )
            * 1e6
        ).cast("decimal(38,0)").alias("syy6"),
    )
    st = st.localCheckpoint(eager=False)  # tot + output rows read it
    tot = st.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum("sxx6").cast("double") / 1e6).alias("sxx_w"),
        (F.sum("sxy6").cast("double") / 1e6).alias("sxy_w"),
        (F.sum("syy6").cast("double") / 1e6).alias("syy_w"),
    )
    gt = r.agg(
        F.count(F.lit(1)).cast("long").alias("nn2"),
        F.sum("x").cast("long").alias("gx"),
        F.sum("y").cast("long").alias("gy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("gxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("gxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("gyy"),
    )
    bw = F.col("sxy_w") / F.col("sxx_w")
    sse_full = F.col("syy_w") - F.col("sxy_w") * F.col("sxy_w") / F.col("sxx_w")
    gsxy = F.col("gxy").cast("double") - F.col("gx").cast("double") * F.col("gy") / F.col("nn2")
    gsxx = F.col("gxx").cast("double") - F.col("gx").cast("double") * F.col("gx") / F.col("nn2")
    gsyy = F.col("gyy").cast("double") - F.col("gy").cast("double") * F.col("gy") / F.col("nn2")
    sse_red = gsyy - gsxy * gsxy / gsxx
    xbar = F.col("gx").cast("double") / F.col("nn2")
    f = tot.crossJoin(gt).select(
        "nn",
        "k",
        bw.alias("bw"),
        sse_full.alias("sse_full"),
        sse_red.alias("sse_red"),
        xbar.alias("xbar"),
    )
    return (
        st.crossJoin(F.broadcast(f))
        .select(
            F.col("g").alias("event_type"),
            "n",
            (
                F.round(
                    (
                        F.col("sy").cast("double") / F.col("n")
                        - F.col("bw")
                        * (F.col("sx").cast("double") / F.col("n") - F.col("xbar"))
                    )
                    / 100,
                    6,
                )
                + 0.0
            ).alias("adj_mean_value"),
            (F.round(F.col("bw") / 100, 6) + 0.0).alias("slope_within"),
            (
                F.round(
                    ((F.col("sse_red") - F.col("sse_full")) / (F.col("k") - 1))
                    / (F.col("sse_full") / (F.col("nn") - F.col("k") - 1)),
                    6,
                )
                + 0.0
            ).alias("f_groups"),
        )
        .orderBy("event_type")
    )


_WILSON_Z = 1.959963984540054  # two-sided 95% normal quantile


@register(
    "q_agg_wilson_ci",
    family="aggregates",
    oracle=f"""
    WITH c AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS s
      FROM events GROUP BY dw
    )
    SELECT dw, n, s,
           round(CAST(s AS DOUBLE) / n, 6) + 0.0 AS rate,
           round(((CAST(s AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
                  - {_WILSON_Z} * sqrt((CAST(s AS DOUBLE) / n)
                        * (1.0 - CAST(s AS DOUBLE) / n) / n
                        + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) + 0.0 AS ci_lo,
           round(((CAST(s AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
                  + {_WILSON_Z} * sqrt((CAST(s AS DOUBLE) / n)
                        * (1.0 - CAST(s AS DOUBLE) / n) / n
                        + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) + 0.0 AS ci_hi
    FROM c ORDER BY dw
    """,
    doc="Wilson score 95% confidence interval for the purchase rate per "
    "day of week — the binomial CI that stays inside [0,1] and "
    "behaves at small n / extreme p where the naive Wald interval "
    "collapses (the dashboard-error-bar primitive; Wald is what "
    "spreadsheet pipelines get wrong). Counts are exact integers "
    "from one <=7-cell conditional rollup; the interval is one float "
    "expression per cell with the z quantile embedded as an exact "
    "literal (identical text both engines). Scale: one combinable "
    "pass; constant cells after. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_wilson_ci(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    z = F.lit(_WILSON_Z)
    p = F.col("s").cast("double") / F.col("n")
    center = p + z * z / (2.0 * F.col("n"))
    half = z * F.sqrt(
        p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1.0 + z * z / F.col("n")
    return c.select(
        "dw",
        "n",
        "s",
        (F.round(p, 6) + 0.0).alias("rate"),
        (F.round((center - half) / denom, 6) + 0.0).alias("ci_lo"),
        (F.round((center + half) / denom, 6) + 0.0).alias("ci_hi"),
    ).orderBy("dw")


_DUNN_Z_CRIT = 2.807  # two-sided 0.05 Bonferroni-adjusted for 10 pairs


@register(
    "q_agg_dunn",
    family="aggregates",
    oracle=f"""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
    ),
    cells AS (
      SELECT cents, et, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY cents, et
    ),
    vtot AS (
      SELECT cents, CAST(sum(cnt) AS BIGINT) AS tc FROM cells GROUP BY cents
    ),
    mr AS (
      SELECT cents, tc,
             2 * (sum(tc) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - tc)
               + tc + 1 AS dmr
      FROM vtot
    ),
    rj AS (
      SELECT c.et, CAST(sum(c.cnt) AS BIGINT) AS nj,
             CAST(sum(c.cnt * m.dmr) AS BIGINT) AS r2j
      FROM cells c JOIN mr m ON m.cents = c.cents
      GROUP BY c.et
    ),
    tot AS (
      SELECT CAST(sum(nj) AS BIGINT) AS n,
             (SELECT CAST(sum(tc * tc * tc - tc) AS BIGINT) FROM vtot) AS t3
      FROM rj
    ),
    pairs AS (
      SELECT a.et AS g1, b.et AS g2, a.nj AS n1, b.nj AS n2,
             CAST(a.r2j AS DOUBLE) / (2.0 * a.nj)
               - CAST(b.r2j AS DOUBLE) / (2.0 * b.nj) AS rdiff,
             sqrt((CAST(t.n AS DOUBLE) * (t.n + 1) / 12.0
                   - CAST(t.t3 AS DOUBLE) / (12.0 * (t.n - 1)))
                  * (1.0 / a.nj + 1.0 / b.nj)) AS se
      FROM rj a JOIN rj b ON a.et < b.et CROSS JOIN tot t
    )
    SELECT g1, g2, n1, n2,
           round(rdiff / se, 6) + 0.0 AS z_dunn,
           abs(rdiff / se) > {_DUNN_Z_CRIT} AS significant
    FROM pairs ORDER BY g1, g2
    """,
    doc="Dunn's post-hoc pairwise rank test after q_agg_kruskal — WHICH "
    "groups differ once the omnibus H says some do, on ranks (the "
    "nonparametric sibling of q_agg_tukey_hsd's mean-based q): "
    "z_ij = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 - Sum(t^3-t)/(12(N-1))) "
    "(1/n_i + 1/n_j)), judged against the Bonferroni-adjusted "
    f"two-sided critical value {_DUNN_Z_CRIT} for the 10 pairs of 5 "
    "groups. Reuses the kruskal machinery verbatim: doubled midranks "
    "over the cent-quantized domain keep every rank sum an exact "
    "BIGINT (mean rank = R2/(2n), one division); the tie term is the "
    "same exact integer. Scale: one combinable cell rollup + the "
    "domain-bounded cumsum; the pair join runs on the k-row rank "
    "table. Ref: no reference counterpart — statistics tier.",
)
def q_agg_dunn(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.col("event_type").alias("et"),
        )
        .groupBy("cents", "et")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # vtot + rj read it
    vtot = cells.groupBy("cents").agg(F.sum("cnt").cast("long").alias("tc"))
    vtot = vtot.localCheckpoint(eager=False)  # midranks + tie term read it
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    # domain-bounded window: one row per distinct cent value
    mr = vtot.select(
        "cents",
        (2 * (F.sum("tc").over(w) - F.col("tc")) + F.col("tc") + 1).alias("dmr"),
    )
    rj = (
        cells.join(mr, "cents")
        .groupBy("et")
        .agg(
            F.sum("cnt").cast("long").alias("nj"),
            F.sum(F.col("cnt") * F.col("dmr")).cast("long").alias("r2j"),
        )
    )
    rj = rj.localCheckpoint(eager=False)  # tot + both pair sides read it
    tot = rj.agg(F.sum("nj").cast("long").alias("n")).crossJoin(
        vtot.agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .cast("long")
            .alias("t3")
        )
    )
    a, b = rj.alias("a"), rj.alias("b")
    rdiff = F.col("a.r2j").cast("double") / (2.0 * F.col("a.nj")) - F.col(
        "b.r2j"
    ).cast("double") / (2.0 * F.col("b.nj"))
    se = F.sqrt(
        (
            F.col("n").cast("double") * (F.col("n") + 1) / 12.0
            - F.col("t3").cast("double") / (12.0 * (F.col("n") - 1))
        )
        * (1.0 / F.col("a.nj") + 1.0 / F.col("b.nj"))
    )
    return (
        a.join(b, F.col("a.et") < F.col("b.et"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a.et").alias("g1"),
            F.col("b.et").alias("g2"),
            F.col("a.nj").alias("n1"),
            F.col("b.nj").alias("n2"),
            (F.round(rdiff / se, 6) + 0.0).alias("z_dunn"),
            (F.abs(rdiff / se) > _DUNN_Z_CRIT).alias("significant"),
        )
        .orderBy("g1", "g2")
    )


@register(
    "q_agg_cmh_test",
    family="aggregates",
    oracle=f"""
    WITH base AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS stratum,
             CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                               1, 4)) AS BIGINT) % 100 < 50
                  THEN 0 ELSE 1 END AS treated,
             CASE WHEN event_type = 'purchase' AND value >= 200
                  THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    cells AS (
      SELECT stratum,
             CAST(sum(CASE WHEN treated = 1 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN treated = 1 AND hit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN treated = 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN treated = 0 AND hit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM base GROUP BY stratum
    ),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(a) AS BIGINT) AS sa,
             CAST(sum(CAST(round(CAST(a + b AS DOUBLE) * (a + c)
                                 / (a + b + c + d) * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6 AS se_,
             CAST(sum(CAST(round(CAST(a + b AS DOUBLE) * (c + d) * (a + c)
                                 * (b + d)
                                 / ((a + b + c + d) * 1.0 * (a + b + c + d)
                                    * (a + b + c + d - 1)) * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6 AS sv,
             CAST(sum(CAST(round(CAST(a AS DOUBLE) * d / (a + b + c + d) * 1e6)
                           AS BIGINT)) AS DOUBLE) / 1e6 AS sad,
             CAST(sum(CAST(round(CAST(b AS DOUBLE) * c / (a + b + c + d) * 1e6)
                           AS BIGINT)) AS DOUBLE) / 1e6 AS sbc
      FROM cells
    )
    SELECT k AS k_strata,
           round(sad / sbc, 6) + 0.0 AS or_mh,
           round((abs(sa - se_) - 0.5) * (abs(sa - se_) - 0.5) / sv, 6) + 0.0
             AS cmh_chi2,
           round({_erfc_sql("sqrt((abs(sa - se_) - 0.5) * (abs(sa - se_) - 0.5) / sv / 2.0)")},
                 6) + 0.0 AS p_value
    FROM terms
    """,
    doc="Cochran-Mantel-Haenszel test of the treatment-conversion "
    "association STRATIFIED by day of week, plus the Mantel-Haenszel "
    "common odds ratio — the confound-proof 2x2 analysis that "
    "collapses strata WITHOUT Simpson's-paradox bias (q_agg_chisq on "
    "the pooled table would conflate the dow mix with the effect); "
    "pairs with q_events_meta_i2 (which asks whether one common "
    "effect even exists). Continuity-corrected chi2 with the EXACT "
    "df=1 p-value erfc(sqrt(x/2)) via the shared erfc kernel. Every "
    "per-stratum expectation/variance/odds term is a float of exact "
    "integer cells quantized to 1e-6 BIGINTs before the cross-"
    "stratum sums. Scale: one combinable <=7x4-cell rollup; "
    "constant arithmetic after. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_cmh_test(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    base = ev.select(
        (F.dayofweek("ts") - 1).cast("long").alias("stratum"),
        F.when(bucket < 50, 0).otherwise(1).alias("treated"),
        F.when(
            (F.col("event_type") == "purchase") & (F.col("value") >= 200), 1
        ).otherwise(0).alias("hit"),
    )
    cells = base.groupBy("stratum").agg(
        F.sum(F.when((F.col("treated") == 1) & (F.col("hit") == 1), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("hit") == 0), 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("hit") == 1), 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("hit") == 0), 1).otherwise(0)).cast("long").alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    e_a = (F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c")) / n
    v_a = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
        / (n * n * (n - 1))
    )
    terms = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("a").cast("long").alias("sa"),
        (F.sum(F.round(e_a * 1e6).cast("long")).cast("double") / 1e6).alias("se_"),
        (F.sum(F.round(v_a * 1e6).cast("long")).cast("double") / 1e6).alias("sv"),
        (
            F.sum(
                F.round(F.col("a").cast("double") * F.col("d") / n * 1e6).cast("long")
            ).cast("double") / 1e6
        ).alias("sad"),
        (
            F.sum(
                F.round(F.col("b").cast("double") * F.col("c") / n * 1e6).cast("long")
            ).cast("double") / 1e6
        ).alias("sbc"),
    )
    dev = F.abs(F.col("sa") - F.col("se_")) - 0.5
    chi2 = dev * dev / F.col("sv")
    return terms.select(
        F.col("k").alias("k_strata"),
        (F.round(F.col("sad") / F.col("sbc"), 6) + 0.0).alias("or_mh"),
        (F.round(chi2, 6) + 0.0).alias("cmh_chi2"),
        (
            F.round(
                F.expr(
                    _erfc_sql(
                        "sqrt((abs(sa - se_) - 0.5) * (abs(sa - se_) - 0.5)"
                        " / sv / 2.0)"
                    )
                ),
                6,
            )
            + 0.0
        ).alias("p_value"),
    )


_CRC_CUTOFF = "2024-01-16"  # period split: days 1-15 vs 16-30
_CRC_Z = 1.959963984540054


@register(
    "q_agg_capture_recapture",
    family="aggregates",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN ts <  TIMESTAMP '{_CRC_CUTOFF}' THEN 1 ELSE 0 END)
               AS s1,
             max(CASE WHEN ts >= TIMESTAMP '{_CRC_CUTOFF}' THEN 1 ELSE 0 END)
               AS s2
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT CAST(sum(s1) AS BIGINT) AS n1,
             CAST(sum(s2) AS BIGINT) AS n2,
             CAST(sum(s1 * s2) AS BIGINT) AS m
      FROM u
    )
    SELECT n1, n2, m,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1, 6) + 0.0
             AS n_hat,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1
                 - {_CRC_Z} * sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
                                   * (n1 - m) * (n2 - m)
                                   / ((m + 1) * 1.0 * (m + 1) * (m + 2))),
                 6) + 0.0 AS ci_lo,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1
                 + {_CRC_Z} * sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
                                   * (n1 - m) * (n2 - m)
                                   / ((m + 1) * 1.0 * (m + 1) * (m + 2))),
                 6) + 0.0 AS ci_hi
    FROM c
    """,
    doc="Capture-recapture population estimate (Chapman's "
    "bias-corrected Lincoln-Petersen): users active in the first "
    "half-month are the 'marked' sample, the second half is the "
    "recapture, and the overlap estimates the TOTAL user population "
    "including never-seen users — the how-big-is-the-universe "
    "estimator behind reach/dedup-rate projections when no id "
    "universe exists (same math ecologists use for fish). N_hat = "
    "(n1+1)(n2+1)/(m+1) - 1 with the Seber variance CI; every count "
    "is an exact integer from ONE per-user two-flag rollup; the "
    "estimate and CI are single float expressions (z as an exact "
    "literal). Scale: one combinable per-user pass; constant "
    "arithmetic after. Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_capture_recapture(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit(_CRC_CUTOFF).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("s1"),
        F.max(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("s2"),
    )
    c = u.agg(
        F.sum("s1").cast("long").alias("n1"),
        F.sum("s2").cast("long").alias("n2"),
        F.sum(F.col("s1") * F.col("s2")).cast("long").alias("m"),
    )
    n_hat = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (
        F.col("m") + 1
    ) - 1
    half = F.lit(_CRC_Z) * F.sqrt(
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / ((F.col("m") + 1) * 1.0 * (F.col("m") + 1) * (F.col("m") + 2))
    )
    return c.select(
        "n1",
        "n2",
        "m",
        (F.round(n_hat, 6) + 0.0).alias("n_hat"),
        (F.round(n_hat - half, 6) + 0.0).alias("ci_lo"),
        (F.round(n_hat + half, 6) + 0.0).alias("ci_hi"),
    )


_PERM_R = 40          # label permutations (deterministic hash LCG)
_PERM_A = 2654435761  # Knuth multiplicative-hash constant
_PERM_B = 40503
_PERM_M = 100000


@register(
    "q_agg_permutation_test",
    family="aggregates",
    oracle=f"""
    WITH base AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    obs AS (
      SELECT CAST(sum(g1) AS BIGINT) AS n1,
             CAST(sum(1 - g1) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g1 = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN g1 = 0 THEN c ELSE 0 END) AS BIGINT) AS s2
      FROM base
    ),
    perm AS (
      SELECT r.r,
             CAST(sum(CASE WHEN ((b.event_id % {_PERM_M}) * {_PERM_A}
                                 + r.r * {_PERM_B}) % {_PERM_M}
                                * (o.n1 + o.n2) < o.n1 * {_PERM_M}
                           THEN 1 ELSE 0 END) AS BIGINT) AS pn1,
             CAST(sum(CASE WHEN ((b.event_id % {_PERM_M}) * {_PERM_A}
                                 + r.r * {_PERM_B}) % {_PERM_M}
                                * (o.n1 + o.n2) < o.n1 * {_PERM_M}
                           THEN b.c ELSE 0 END) AS BIGINT) AS ps1,
             CAST(sum(b.c) AS BIGINT) AS st
      FROM base b
      CROSS JOIN (SELECT unnest(range(1, {_PERM_R} + 1)) AS r) r
      CROSS JOIN obs o
      GROUP BY r.r
    ),
    diffs AS (
      SELECT p.r,
             abs(CAST(p.ps1 AS DOUBLE) / p.pn1
                 - CAST(p.st - p.ps1 AS DOUBLE)
                   / ((o.n1 + o.n2) - p.pn1)) AS adiff,
             abs(CAST(o.s1 AS DOUBLE) / o.n1
                 - CAST(o.s2 AS DOUBLE) / o.n2) AS aobs
      FROM perm p CROSS JOIN obs o
    )
    SELECT CAST(count(*) AS BIGINT) AS n_perms,
           round(max(aobs) * 0.01, 6) + 0.0 AS obs_diff_value,
           round((1.0 + sum(CASE WHEN adiff >= aobs THEN 1 ELSE 0 END))
                 / (count(*) + 1.0), 6) + 0.0 AS p_value
    FROM diffs
    """,
    doc="Permutation test of the click-vs-purchase mean value "
    f"difference: {_PERM_R} deterministic label permutations (the "
    "q_agg_bootstrap multiplicative-hash LCG on (event_id, "
    "replicate) — reproducible cross-engine and across retries, "
    "which rand() can never be), each re-splitting rows into "
    "pseudo-groups of the observed proportions; the p-value is the "
    "add-one-smoothed share of permuted |mean diffs| at least the "
    "observed one — the assumption-free inference companion to "
    "q_agg_ttest (no normality) and q_agg_mannwhitney (tests the "
    "MEAN, not stochastic dominance). Every per-replicate sum is an "
    "exact BIGINT from one map-side-combinable exploded pass; the "
    "group-size proportion rides an integer cross-multiplication "
    "(no float threshold). Scale: one R-way explode of the filtered "
    "fact into a keyed agg of R rows; O(1) after. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_permutation_test(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
    )
    base = base.localCheckpoint(eager=False)  # obs + permutation pass
    obs = base.agg(
        F.sum("g1").cast("long").alias("n1"),
        F.sum(1 - F.col("g1")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g1") == 1, F.col("c")).otherwise(0))
        .cast("long").alias("s1"),
        F.sum(F.when(F.col("g1") == 0, F.col("c")).otherwise(0))
        .cast("long").alias("s2"),
    )
    fan = base.withColumn(
        "r", F.explode(F.sequence(F.lit(1), F.lit(_PERM_R)))
    ).crossJoin(F.broadcast(obs))
    h = (
        (F.col("event_id") % _PERM_M) * _PERM_A + F.col("r") * _PERM_B
    ) % _PERM_M
    in1 = h * (F.col("n1") + F.col("n2")) < F.col("n1") * _PERM_M
    perm = fan.groupBy("r").agg(
        F.sum(F.when(in1, 1).otherwise(0)).cast("long").alias("pn1"),
        F.sum(F.when(in1, F.col("c")).otherwise(0)).cast("long").alias("ps1"),
        F.sum("c").cast("long").alias("st"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("s1").alias("s1"),
        F.max("s2").alias("s2"),
    )
    adiff = F.abs(
        F.col("ps1").cast("double") / F.col("pn1")
        - (F.col("st") - F.col("ps1")).cast("double")
        / ((F.col("n1") + F.col("n2")) - F.col("pn1"))
    )
    aobs = F.abs(
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s2").cast("double") / F.col("n2")
    )
    diffs = perm.select(adiff.alias("adiff"), aobs.alias("aobs"))
    return diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_perms"),
        (F.round(F.max("aobs") * 0.01, 6) + 0.0).alias("obs_diff_value"),
        (
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(F.col("adiff") >= F.col("aobs"), 1).otherwise(0)
                    )
                )
                / (F.count(F.lit(1)) + 1.0),
                6,
            )
            + 0.0
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Round-10 wave 2: nonparametric k-group inference (Mood's median test,
# Cochran's Q, Friedman, Jonckheere-Terpstra trend, Cliff's delta). Same
# discipline as the r8/r9 statistics waves: exact integer sufficient
# statistics on cent-quantized domains, quantize-before-sum for any
# cross-row float term, identical float expression trees on both engines,
# exact even-df chi-square / shared-erfc p-values.
# ---------------------------------------------------------------------------


@register(
    "q_agg_mood_median",
    family="aggregates",
    oracle=f"""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
    ),
    cells AS (
      SELECT cents, et, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY cents, et
    ),
    vtot AS (
      SELECT cents, CAST(sum(cnt) AS BIGINT) AS tc FROM cells GROUP BY cents
    ),
    tot AS (SELECT CAST(sum(tc) AS BIGINT) AS n FROM vtot),
    med AS (
      SELECT min(cents) AS med FROM (
        SELECT cents,
               sum(tc) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
        FROM vtot
      ) CROSS JOIN tot WHERE 2 * cum >= tot.n
    ),
    gr AS (
      SELECT et,
             CAST(sum(cnt) AS BIGINT) AS nj,
             CAST(sum(CASE WHEN cents <= med.med THEN cnt ELSE 0 END)
                  AS BIGINT) AS aj
      FROM cells CROSS JOIN med GROUP BY et
    ),
    ab AS (SELECT CAST(sum(aj) AS BIGINT) AS a,
                  CAST(sum(nj) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS k FROM gr),
    terms AS (
      SELECT CAST(sum(CAST(round(1e9 * (
               (aj - CAST(nj AS DOUBLE) * ab.a / ab.n)
             * (aj - CAST(nj AS DOUBLE) * ab.a / ab.n)
             / (CAST(nj AS DOUBLE) * ab.a / ab.n)
             + ((nj - aj) - CAST(nj AS DOUBLE) * (ab.n - ab.a) / ab.n)
             * ((nj - aj) - CAST(nj AS DOUBLE) * (ab.n - ab.a) / ab.n)
             / (CAST(nj AS DOUBLE) * (ab.n - ab.a) / ab.n)))
             AS BIGINT)) AS DOUBLE) / 1e9 AS chi2
      FROM gr CROSS JOIN ab
    )
    SELECT ab.n AS n_total, ab.k AS k_groups, med.med AS median_cents,
           round(terms.chi2, 6) + 0.0 AS chi2_stat,
           round({_chi2_sf_even_sql("terms.chi2", 2)}, 6) + 0.0 AS p_value
    FROM ab CROSS JOIN med CROSS JOIN terms
    """,
    doc="Mood's median test across the five event types: dichotomize "
    "every value at the pooled median (the lower median on the "
    "cent-quantized domain — min cents with 2*cum >= n, an integer "
    "rule, no float median ever exists), then chi-square the k x 2 "
    "above/below table. The rank-free sibling of q_agg_kruskal — "
    "robust to ANY monotone transform and to unequal tails; each "
    "group's chi-square term is an identical float expression of "
    "exact integer counts, quantized 1e-9 before the cross-group sum "
    "(the q_ml_brier discipline), p-value EXACT via the shared "
    "even-df chi-square kernel at df = k-1 = 4 (m=2; k is emitted "
    "data-derived so a fixture change is visible — the "
    "tests/test_r9_invariants.py domain pin). Scale: one combinable "
    "(cents, group) cell rollup; the median cumsum is DOMAIN-bounded; "
    "everything after runs on k rows. Ref: no reference counterpart "
    "— statistics tier.",
)
def q_agg_mood_median(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.col("event_type").alias("et"),
        )
        .groupBy("cents", "et")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # vtot + gr read it
    vtot = cells.groupBy("cents").agg(F.sum("cnt").cast("long").alias("tc"))
    tot = vtot.agg(F.sum("tc").cast("long").alias("n"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        vtot.select("cents", F.sum("tc").over(w).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("cents").alias("med"))
    )
    gr = (
        cells.crossJoin(F.broadcast(med))
        .groupBy("et")
        .agg(
            F.sum("cnt").cast("long").alias("nj"),
            F.sum(F.when(F.col("cents") <= F.col("med"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("aj"),
        )
    )
    gr = gr.localCheckpoint(eager=False)  # ab + terms read it
    ab = gr.agg(
        F.sum("aj").cast("long").alias("a"),
        F.sum("nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ea = F.col("nj").cast("double") * F.col("a") / F.col("n")
    eb = F.col("nj").cast("double") * (F.col("n") - F.col("a")) / F.col("n")
    term = (F.col("aj") - ea) * (F.col("aj") - ea) / ea + (
        (F.col("nj") - F.col("aj")) - eb
    ) * ((F.col("nj") - F.col("aj")) - eb) / eb
    terms = (
        gr.crossJoin(F.broadcast(ab))
        .agg(
            (F.sum(F.round(1e9 * term).cast("long")).cast("double") / 1e9).alias(
                "chi2"
            )
        )
    )
    return (
        ab.crossJoin(med)
        .crossJoin(terms)
        .select(
            F.col("n").alias("n_total"),
            F.col("k").alias("k_groups"),
            F.col("med").alias("median_cents"),
            (F.round(F.col("chi2"), 6) + 0.0).alias("chi2_stat"),
            (F.round(F.expr(_chi2_sf_even_sql("chi2", 2)), 6) + 0.0).alias(
                "p_value"
            ),
        )
    )


@register(
    "q_agg_cochran_q",
    family="aggregates",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM c),
    ut AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY user_id),
    x AS (
      SELECT c.user_id, c.event_type,
             CASE WHEN kk.k * c.cnt > ut.tot THEN 1 ELSE 0 END AS x
      FROM c JOIN ut ON ut.user_id = c.user_id CROSS JOIN kk
    ),
    ri AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS r FROM x GROUP BY user_id),
    cj AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS cc FROM x GROUP BY event_type),
    s1 AS (SELECT CAST(sum(cc * cc) AS BIGINT) AS sc2,
                  CAST(sum(cc) AS BIGINT) AS t FROM cj),
    s2 AS (SELECT CAST(sum(r * r) AS BIGINT) AS sr2,
                  CAST(count(*) AS BIGINT) AS b FROM ri),
    q AS (
      SELECT s2.b, kk.k,
             (kk.k - 1) * (kk.k * CAST(s1.sc2 AS DOUBLE) - CAST(s1.t AS DOUBLE) * s1.t)
             / (kk.k * CAST(s1.t AS DOUBLE) - s2.sr2) AS q_raw
      FROM s1 CROSS JOIN s2 CROSS JOIN kk
    )
    SELECT b AS n_users, k AS k_treatments,
           round(q_raw, 6) + 0.0 AS q_stat,
           round({_chi2_sf_even_sql("q_raw", 2)}, 6) + 0.0 AS p_value
    FROM q
    """,
    doc="Cochran's Q across the five event types on per-user binary "
    "responses x_ij = [type j is ABOVE user i's own mean share] — "
    "decided by integer cross-multiplication (k*cnt_ij > total_i, no "
    "float mean ever exists; plain has-type flags saturate at this "
    "event density and degenerate Q's denominator). Q = (k-1)(k*SC2 "
    "- T^2)/(kT - SR2) is a single float expression of four exact "
    "BIGINT sums — the repeated-measures sibling of q_agg_mcnemar "
    "(k=2 Q IS McNemar) and the binary Friedman. p-value EXACT via "
    "the shared even-df chi-square kernel at df = k-1 = 4 (m=2, "
    "domain-pinned). Scale: one combinable (user,type) rollup, two "
    "k/user-keyed rollups, constant tail. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_cochran_q(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    c = c.localCheckpoint(eager=False)  # kk + ut + x read it
    kk = c.agg(F.count_distinct("event_type").cast("long").alias("k"))
    ut = c.groupBy("user_id").agg(F.sum("cnt").cast("long").alias("tot"))
    x = (
        c.join(ut, "user_id")
        .crossJoin(F.broadcast(kk))
        .select(
            "user_id",
            "event_type",
            F.when(F.col("k") * F.col("cnt") > F.col("tot"), 1)
            .otherwise(0)
            .alias("x"),
        )
    )
    x = x.localCheckpoint(eager=False)  # ri + cj read it
    ri = x.groupBy("user_id").agg(F.sum("x").cast("long").alias("r"))
    cj = x.groupBy("event_type").agg(F.sum("x").cast("long").alias("cc"))
    s1 = cj.agg(
        F.sum(F.col("cc") * F.col("cc")).cast("long").alias("sc2"),
        F.sum("cc").cast("long").alias("t"),
    )
    s2 = ri.agg(
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sr2"),
        F.count(F.lit(1)).cast("long").alias("b"),
    )
    q_raw = (
        (F.col("k") - 1)
        * (F.col("k") * F.col("sc2").cast("double") - F.col("t").cast("double") * F.col("t"))
        / (F.col("k") * F.col("t").cast("double") - F.col("sr2"))
    )
    return (
        s1.crossJoin(s2)
        .crossJoin(kk)
        .select(
            F.col("b").alias("n_users"),
            F.col("k").alias("k_treatments"),
            q_raw.alias("q_raw"),
        )
        .select(
            "n_users",
            "k_treatments",
            (F.round(F.col("q_raw"), 6) + 0.0).alias("q_stat"),
            (F.round(F.expr(_chi2_sf_even_sql("q_raw", 2)), 6) + 0.0).alias(
                "p_value"
            ),
        )
    )


@register(
    "q_agg_friedman",
    family="aggregates",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type AS et,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY d, et
    ),
    days AS (SELECT DISTINCT d FROM daily),
    ets AS (SELECT DISTINCT et FROM daily),
    grid AS (
      SELECT days.d, ets.et, coalesce(daily.v, 0) AS v
      FROM days CROSS JOIN ets
      LEFT JOIN daily ON daily.d = days.d AND daily.et = ets.et
    ),
    rk AS (
      SELECT d, et, v,
             2 * rank() OVER (PARTITION BY d ORDER BY v)
               + count(*) OVER (PARTITION BY d, v) - 1 AS dmr
      FROM grid
    ),
    rj AS (SELECT et, CAST(sum(dmr) AS BIGINT) AS r2 FROM rk GROUP BY et),
    bb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM days),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ets),
    ties AS (
      SELECT CAST(sum(tt * tt * tt - tt) AS BIGINT) AS t3
      FROM (SELECT d, v, CAST(count(*) AS BIGINT) AS tt FROM grid GROUP BY d, v)
    ),
    s AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS sr22 FROM rj),
    f AS (
      SELECT bb.b, kk.k,
             3.0 * s.sr22 / (CAST(bb.b AS DOUBLE) * kk.k * (kk.k + 1))
               - 3.0 * bb.b * (kk.k + 1) AS chi2_raw,
             1.0 - CAST(ties.t3 AS DOUBLE)
               / (CAST(bb.b AS DOUBLE) * (CAST(kk.k AS DOUBLE) * kk.k * kk.k - kk.k))
               AS cc
      FROM bb CROSS JOIN kk CROSS JOIN ties CROSS JOIN s
    )
    SELECT b AS b_days, k AS k_groups,
           round(chi2_raw, 6) + 0.0 AS chi2_f,
           round(chi2_raw / cc, 6) + 0.0 AS chi2_f_corrected,
           round({_chi2_sf_even_sql("chi2_raw / cc", 2)}, 6) + 0.0 AS p_value
    FROM f
    """,
    doc="Friedman test on the calendar-day x event-type block design "
    "(blocks = days, treatments = the five types, response = each "
    "day's cent-quantized value total; absent cells are exact zero — "
    "the complete-block grid q_timeseries_gapfill's convention): "
    "within-day DOUBLED midranks (2*rank + ties - 1 keeps ties "
    "integral — the kruskal discipline applied per block), per-type "
    "doubled rank sums are exact BIGINTs, chi2_F = 3*SR2/(bk(k+1)) - "
    "3b(k+1) and the tie correction 1 - sum(t^3-t)/(b(k^3-k)) are "
    "single float expressions of exact ints. The repeated-measures "
    "kruskal: kruskal asks 'do the types differ overall', Friedman "
    "asks 'do they differ CONSISTENTLY day after day' — blocking "
    "removes day-level nuisance variation. p-value EXACT via the "
    "even-df chi-square kernel at df = k-1 = 4 (m=2, domain-pinned). "
    "Scale: one combinable (day,type) rollup; windows ride the "
    "<=366*k grid, never the fact. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_friedman(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), F.col("event_type").alias("et")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("v"))
    daily = daily.localCheckpoint(eager=False)  # grid + domains read it
    days = daily.select("d").distinct()
    ets = daily.select("et").distinct()
    grid = (
        days.crossJoin(F.broadcast(ets))
        .join(daily, ["d", "et"], "left")
        .select("d", "et", F.coalesce("v", F.lit(0)).alias("v"))
    )
    grid = grid.localCheckpoint(eager=False)  # rk + ties read it
    dmr = (
        2 * F.rank().over(Window.partitionBy("d").orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("d", "v"))
        - 1
    )
    rk = grid.select("d", "et", "v", dmr.alias("dmr"))
    rj = rk.groupBy("et").agg(F.sum("dmr").cast("long").alias("r2"))
    bb = days.agg(F.count(F.lit(1)).cast("long").alias("b"))
    kk = ets.agg(F.count(F.lit(1)).cast("long").alias("k"))
    ties = (
        grid.groupBy("d", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("tt"))
        .agg(
            F.sum(F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt"))
            .cast("long")
            .alias("t3")
        )
    )
    s = rj.agg(F.sum(F.col("r2") * F.col("r2")).cast("long").alias("sr22"))
    bd = F.col("b").cast("double")
    kd = F.col("k").cast("double")
    chi2_raw = 3.0 * F.col("sr22") / (bd * F.col("k") * (F.col("k") + 1)) - 3.0 * F.col(
        "b"
    ) * (F.col("k") + 1)
    cc = 1.0 - F.col("t3").cast("double") / (bd * (kd * F.col("k") * F.col("k") - F.col("k")))
    out = (
        bb.crossJoin(kk)
        .crossJoin(ties)
        .crossJoin(s)
        .select("b", "k", chi2_raw.alias("chi2_raw"), cc.alias("cc"))
    )
    return out.select(
        F.col("b").alias("b_days"),
        F.col("k").alias("k_groups"),
        (F.round(F.col("chi2_raw"), 6) + 0.0).alias("chi2_f"),
        (F.round(F.col("chi2_raw") / F.col("cc"), 6) + 0.0).alias("chi2_f_corrected"),
        (
            F.round(F.expr(_chi2_sf_even_sql("chi2_raw / cc", 2)), 6) + 0.0
        ).alias("p_value"),
    )


@register(
    "q_agg_jonckheere",
    family="aggregates",
    oracle=f"""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS et
      FROM events
    ),
    cells AS (
      SELECT cents, et, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY cents, et
    ),
    dom AS (SELECT DISTINCT cents FROM cells),
    ets AS (SELECT DISTINCT et FROM cells),
    grid AS (
      SELECT dom.cents, ets.et, coalesce(cells.cnt, 0) AS cnt
      FROM dom CROSS JOIN ets
      LEFT JOIN cells ON cells.cents = dom.cents AND cells.et = ets.et
    ),
    cum AS (
      SELECT cents, et, cnt,
             sum(cnt) OVER (PARTITION BY et ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - cnt AS clt
      FROM grid
    ),
    jj AS (
      SELECT CAST(sum(b.cnt * (2 * a.clt + a.cnt)) AS BIGINT) AS j2
      FROM cum a JOIN cum b ON a.cents = b.cents AND a.et < b.et
    ),
    nj AS (SELECT et, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY et),
    tt AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                  CAST(sum(n * n) AS BIGINT) AS sn2,
                  CAST(sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS HUGEINT)
                    AS sn23
           FROM nj),
    z AS (
      SELECT tt.n, jj.j2,
             (CAST(jj.j2 AS DOUBLE)
              - (CAST(tt.n AS DOUBLE) * tt.n - tt.sn2) / 2.0)
             / sqrt((CAST(tt.n AS DOUBLE) * tt.n * (2.0 * tt.n + 3)
                     - CAST(tt.sn23 AS DOUBLE)) / 18.0) AS zval
      FROM tt CROSS JOIN jj
    )
    SELECT n AS n_total,
           round(CAST(j2 AS DOUBLE) / 2, 2) + 0.0 AS j_stat,
           round(zval, 6) + 0.0 AS z,
           round({_erfc_sql("abs(zval) / 1.4142135623730951")}, 6) + 0.0
             AS p_value
    FROM z
    """,
    doc="Jonckheere-Terpstra trend test across the five event types "
    "under their alphabetical ordering (the deterministic stand-in "
    "for a dose ordering — the machinery, not the ordering, is the "
    "operator): J = sum over ordered group pairs of Mann-Whitney "
    "'later group wins' counts, ties at half weight. DOUBLED J stays "
    "integral (2J = sum cnt_b*(2*clt_a + cnt_a) — the kruskal "
    "doubled-midrank discipline); per-group strictly-less cumsums "
    "ride the DOMAIN-bounded (cents x k) grid, and the pair sum is "
    "one equi-join of that grid with itself on cents (k(k-1)/2 pairs "
    "per domain point, never per row). More powerful than kruskal "
    "when the alternative is MONOTONE in the group order. z uses the "
    "exact no-tie null variance [n^2(2n+3) - sum n_j^2(2n_j+3)]/72 "
    "(documented choice; tie-corrected variance differs in the 3rd "
    "digit at this tie density), two-sided p via the shared erfc "
    "kernel. Scale: cell rollup + domain windows + one domain-keyed "
    "join; constant tail. Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_jonckheere(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.col("event_type").alias("et"),
        )
        .groupBy("cents", "et")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # grid + nj read it
    dom = cells.select("cents").distinct()
    ets = cells.select("et").distinct()
    grid = (
        dom.crossJoin(F.broadcast(ets))
        .join(cells, ["cents", "et"], "left")
        .select("cents", "et", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w = (
        Window.partitionBy("et")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "cents", "et", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("clt")
    )
    cum = cum.localCheckpoint(eager=False)  # both join sides read it
    a, b = cum.alias("a"), cum.alias("b")
    jj = a.join(
        b,
        (F.col("a.cents") == F.col("b.cents")) & (F.col("a.et") < F.col("b.et")),
    ).agg(
        F.sum(F.col("b.cnt") * (2 * F.col("a.clt") + F.col("a.cnt")))
        .cast("long")
        .alias("j2")
    )
    nj = cells.groupBy("et").agg(F.sum("cnt").cast("long").alias("n"))
    tt = nj.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sn2"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n") * (2 * F.col("n") + 3))
        .cast("decimal(38,0)")
        .alias("sn23"),
    )
    nd = F.col("n").cast("double")
    zval = (
        F.col("j2").cast("double") - (nd * F.col("n") - F.col("sn2")) / 2.0
    ) / F.sqrt(
        (nd * F.col("n") * (2.0 * F.col("n") + 3) - F.col("sn23").cast("double"))
        / 18.0
    )
    z = tt.crossJoin(jj).select("n", "j2", zval.alias("zval"))
    return z.select(
        F.col("n").alias("n_total"),
        (F.round(F.col("j2").cast("double") / 2, 2) + 0.0).alias("j_stat"),
        (F.round(F.col("zval"), 6) + 0.0).alias("z"),
        (
            F.round(
                F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")), 6
            )
            + 0.0
        ).alias("p_value"),
    )


@register(
    "q_agg_cliffs_delta",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT cents, grp, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY cents, grp
    ),
    dom AS (SELECT DISTINCT cents FROM cells),
    grid AS (
      SELECT dom.cents, gg.grp, coalesce(cells.cnt, 0) AS cnt
      FROM dom CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) gg
      LEFT JOIN cells ON cells.cents = dom.cents AND cells.grp = gg.grp
    ),
    cum AS (
      SELECT cents, grp, cnt,
             sum(cnt) OVER (PARTITION BY grp ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - cnt AS clt
      FROM grid
    ),
    ns AS (
      SELECT CAST(sum(CASE WHEN grp = 1 THEN cnt ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN grp = 0 THEN cnt ELSE 0 END) AS BIGINT) AS n0
      FROM cells
    ),
    pairs AS (
      SELECT CAST(sum(a.cnt * b.clt) AS BIGINT) AS gt,
             CAST(sum(a.cnt * (ns.n0 - b.clt - b.cnt)) AS BIGINT) AS lt
      FROM cum a JOIN cum b ON a.cents = b.cents
                 AND a.grp = 1 AND b.grp = 0
      CROSS JOIN ns
    ),
    d AS (
      SELECT ns.n1, ns.n0, pairs.gt, pairs.lt,
             (CAST(pairs.gt AS DOUBLE) - pairs.lt)
               / (CAST(ns.n1 AS DOUBLE) * ns.n0) AS delta
      FROM ns CROSS JOIN pairs
    )
    SELECT n1 AS n_purchase, n0 AS n_other,
           CAST(n1 * n0 AS BIGINT) AS n_pairs,
           round(delta, 6) + 0.0 AS cliffs_delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33  THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM d
    """,
    doc="Cliff's delta between purchase and non-purchase values: the "
    "ordinal effect size delta = (#(x>y) - #(x<y)) / (n1*n0) that "
    "q_agg_mannwhitney's p-value does not report (delta = 2U/(n1*n0) "
    "- 1 up to tie handling) — at 100 TB every test is 'significant', "
    "so the EFFECT SIZE is the decision variable. Dominance counts "
    "come from the same DOMAIN-bounded per-group strictly-less "
    "cumsum machinery as jonckheere (one equi-join of the cent grid "
    "with itself — never the n1*n0 pair space), all exact BIGINTs; "
    "delta is one float division, and the Romano(2006) magnitude "
    "labels (.147/.33/.474) branch on that single double identically "
    "in both engines. Scale: cell rollup + domain windows + one "
    "domain-keyed join; constant tail. Ref: no reference counterpart "
    "— statistics tier.",
)
def q_agg_cliffs_delta(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("cents", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # grid + ns read it
    dom = cells.select("cents").distinct()
    gg = cells.sparkSession.createDataFrame([(0,), (1,)], "grp int")
    grid = (
        dom.crossJoin(F.broadcast(gg))
        .join(cells, ["cents", "grp"], "left")
        .select("cents", "grp", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "cents", "grp", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("clt")
    )
    cum = cum.localCheckpoint(eager=False)  # both join sides read it
    ns = cells.agg(
        F.sum(F.when(F.col("grp") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    a, b = cum.alias("a"), cum.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.grp") == 1)
            & (F.col("b.grp") == 0),
        )
        .crossJoin(F.broadcast(ns))
        .agg(
            F.sum(F.col("a.cnt") * F.col("b.clt")).cast("long").alias("gt"),
            F.sum(
                F.col("a.cnt") * (F.col("n0") - F.col("b.clt") - F.col("b.cnt"))
            )
            .cast("long")
            .alias("lt"),
        )
    )
    delta = (F.col("gt").cast("double") - F.col("lt")) / (
        F.col("n1").cast("double") * F.col("n0")
    )
    d = ns.crossJoin(pairs).select("n1", "n0", "gt", "lt", delta.alias("delta"))
    mag = (
        F.when(F.abs(F.col("delta")) < 0.147, "negligible")
        .when(F.abs(F.col("delta")) < 0.33, "small")
        .when(F.abs(F.col("delta")) < 0.474, "medium")
        .otherwise("large")
    )
    return d.select(
        F.col("n1").alias("n_purchase"),
        F.col("n0").alias("n_other"),
        (F.col("n1") * F.col("n0")).cast("long").alias("n_pairs"),
        (F.round(F.col("delta"), 6) + 0.0).alias("cliffs_delta"),
        mag.alias("magnitude"),
    )


# ---------------------------------------------------------------------------
# Round-10 wave 6: ordinal association (gamma / Somers' D), the Q-Q
# decile table, and the trimmed mean — all on the exact cent domain.
# ---------------------------------------------------------------------------


@register(
    "q_agg_gamma_somers",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT dw, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY dw, cents
    ),
    dom AS (SELECT DISTINCT cents FROM cells),
    dws AS (SELECT DISTINCT dw FROM cells),
    grid AS (
      SELECT dom.cents, dws.dw, coalesce(cells.cnt, 0) AS cnt
      FROM dom CROSS JOIN dws
      LEFT JOIN cells ON cells.cents = dom.cents AND cells.dw = dws.dw
    ),
    cum AS (
      SELECT cents, dw, cnt,
             sum(cnt) OVER (PARTITION BY dw ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - cnt AS clt,
             sum(cnt) OVER (PARTITION BY dw) AS ntot
      FROM grid
    ),
    cd AS (
      SELECT CAST(sum(b.cnt * a.clt) AS BIGINT) AS c,
             CAST(sum(b.cnt * (a.ntot - a.clt - a.cnt)) AS BIGINT) AS d
      FROM cum a JOIN cum b ON a.cents = b.cents AND a.dw < b.dw
    ),
    px AS (
      SELECT CAST(sum(nd) AS BIGINT) AS n,
             CAST(sum(CAST(nd AS HUGEINT) * nd) AS HUGEINT) AS sn2
      FROM (SELECT sum(cnt) AS nd FROM cells GROUP BY dw)
    )
    SELECT cd.c AS concordant, cd.d AS discordant,
           round((CAST(cd.c AS DOUBLE) - cd.d) / (CAST(cd.c AS DOUBLE) + cd.d),
                 6) + 0.0 AS gamma,
           round((CAST(cd.c AS DOUBLE) - cd.d)
                 / ((CAST(px.n AS DOUBLE) * px.n - CAST(px.sn2 AS DOUBLE)) / 2),
                 6) + 0.0 AS somers_dyx
    FROM cd CROSS JOIN px
    """,
    doc="Goodman-Kruskal gamma + Somers' D(Y|X) between day-of-week "
    "(X, ordered 0-6) and value (Y, cent domain): concordant/"
    "discordant pair counts via the SAME domain-grid strictly-less "
    "cumsum machinery as jonckheere (one equi-join of the "
    "(cents x 7) grid with itself — never the n^2 pair space). "
    "Gamma ignores ties ((C-D)/(C+D)); Somers' D(Y|X) divides by "
    "all X-differing pairs ((n^2 - sum n_d^2)/2, exact integers) — "
    "the asymmetric version a predictive reading wants "
    "(= gamma x how often Y breaks ties given X differs). The "
    "ordinal-ordinal association complement to q_agg_kendall's "
    "tau-b on the same machinery family. Scale: one cell rollup; "
    "windows + one join on the bounded domain grid; constant "
    "tail. Ref: no reference counterpart — statistics tier.",
)
def q_agg_gamma_somers(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.dayofweek("ts") - 1).cast("long").alias("dw"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("dw", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # grid + px read it
    dom = cells.select("cents").distinct()
    dws = cells.select("dw").distinct()
    grid = (
        dom.crossJoin(F.broadcast(dws))
        .join(cells, ["cents", "dw"], "left")
        .select("cents", "dw", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    wlt = (
        Window.partitionBy("dw")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "cents",
        "dw",
        "cnt",
        (F.sum("cnt").over(wlt) - F.col("cnt")).alias("clt"),
        F.sum("cnt").over(Window.partitionBy("dw")).alias("ntot"),
    )
    cum = cum.localCheckpoint(eager=False)  # both join sides read it
    a, b = cum.alias("a"), cum.alias("b")
    cd = a.join(
        b, (F.col("a.cents") == F.col("b.cents")) & (F.col("a.dw") < F.col("b.dw"))
    ).agg(
        F.sum(F.col("b.cnt") * F.col("a.clt")).cast("long").alias("c"),
        F.sum(
            F.col("b.cnt") * (F.col("a.ntot") - F.col("a.clt") - F.col("a.cnt"))
        )
        .cast("long")
        .alias("d"),
    )
    nd_tab = cells.groupBy("dw").agg(F.sum("cnt").alias("nd"))
    px = nd_tab.agg(
        F.sum("nd").cast("long").alias("n"),
        F.sum(F.col("nd").cast("decimal(38,0)") * F.col("nd"))
        .cast("decimal(38,0)")
        .alias("sn2"),
    )
    cdd = F.col("c").cast("double")
    pairs_x = (
        F.col("n").cast("double") * F.col("n") - F.col("sn2").cast("double")
    ) / 2
    return cd.crossJoin(px).select(
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        (F.round((cdd - F.col("d")) / (cdd + F.col("d")), 6) + 0.0).alias("gamma"),
        (F.round((cdd - F.col("d")) / pairs_x, 6) + 0.0).alias("somers_dyx"),
    )


@register(
    "q_agg_qq_table",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT grp, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY grp, cents
    ),
    cum AS (
      SELECT grp, cents,
             sum(cnt) OVER (PARTITION BY grp ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cm,
             sum(cnt) OVER (PARTITION BY grp) AS n
      FROM cells
    ),
    dec AS (SELECT CAST(p AS BIGINT) AS p
            FROM (VALUES (10),(20),(30),(40),(50),(60),(70),(80),(90)) t(p)),
    q AS (
      -- type-1 quantile: min cents with 100*cum >= p*n (integer rule)
      SELECT dec.p, cum.grp, min(cum.cents) AS qv
      FROM dec JOIN cum ON 100 * cum.cm >= dec.p * cum.n
      GROUP BY dec.p, cum.grp
    )
    SELECT a.p AS percentile,
           a.qv AS q_purchase_cents,
           b.qv AS q_other_cents,
           CAST(a.qv - b.qv AS BIGINT) AS diff_cents
    FROM q a JOIN q b ON a.p = b.p AND a.grp = 1 AND b.grp = 0
    ORDER BY percentile
    """,
    doc="Quantile-quantile decile table, purchase vs non-purchase "
    "values: the type-1 (inverse-CDF) quantile at p = 10..90 for "
    "each group via the INTEGER rule min{{v : 100*cum >= p*n}} on "
    "the cent domain — no float quantile ever exists, so the table "
    "is exact on both engines. The distribution-shape readout "
    "BEHIND the tests: mannwhitney/cliffs say the groups differ; "
    "the Q-Q diffs say WHERE (uniform shift = location, growing "
    "diff = scale/tail). Scale: one (group, cents) cell rollup; "
    "cumsums on the domain; the decile scan is a 9-row broadcast "
    "against the domain table. Ref: no reference counterpart — "
    "statistics tier.",
)
def q_agg_qq_table(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("grp", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "grp",
        "cents",
        F.sum("cnt").over(w).alias("cm"),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("n"),
    )
    cum = cum.localCheckpoint(eager=False)  # both decile sides read it
    dec = cum.sparkSession.createDataFrame(
        [(p,) for p in range(10, 100, 10)], "p long"
    )
    q = (
        F.broadcast(dec)
        .join(cum, 100 * F.col("cm") >= F.col("p") * F.col("n"))
        .groupBy("p", "grp")
        .agg(F.min("cents").alias("qv"))
    )
    a = q.filter(F.col("grp") == 1).select(
        F.col("p").alias("percentile"), F.col("qv").alias("q_purchase_cents")
    )
    b = q.filter(F.col("grp") == 0).select(
        F.col("p").alias("pb"), F.col("qv").alias("q_other_cents")
    )
    return (
        a.join(b, F.col("percentile") == F.col("pb"))
        .select(
            "percentile",
            "q_purchase_cents",
            "q_other_cents",
            (F.col("q_purchase_cents") - F.col("q_other_cents"))
            .cast("long")
            .alias("diff_cents"),
        )
        .orderBy("percentile")
    )


# ---------------------------------------------------------------------------
# Round-10 wave 7: distribution-shape inference (two-sample Cramér-von
# Mises) and the trimmed mean.
# ---------------------------------------------------------------------------


@register(
    "q_agg_cvm_test",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS ca,
             CAST(sum(1 - grp) AS BIGINT) AS cb
      FROM g GROUP BY cents
    ),
    cum AS (
      SELECT cents, ca + cb AS tc,
             sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cua,
             sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cub
      FROM cells
    ),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
                  CAST(sum(cb) AS BIGINT) AS m FROM cells),
    s AS (
      SELECT nn.n, nn.m,
             CAST(sum(CAST(tc AS HUGEINT)
                      * CAST(nn.m * cua - nn.n * cub AS HUGEINT)
                      * CAST(nn.m * cua - nn.n * cub AS HUGEINT))
                  AS DOUBLE) AS u
      FROM cum CROSS JOIN nn GROUP BY nn.n, nn.m
    )
    SELECT n AS n_purchase, m AS n_other,
           round(u / (CAST(n AS DOUBLE) * m
                      * (CAST(n AS DOUBLE) + m) * (CAST(n AS DOUBLE) + m)),
                 6) + 0.0 AS cvm_stat,
           u / (CAST(n AS DOUBLE) * m
                * (CAST(n AS DOUBLE) + m) * (CAST(n AS DOUBLE) + m))
             > 0.461 AS significant_5pct
    FROM s
    """,
    doc="Two-sample Cramér-von Mises test, purchase vs non-purchase "
    "values: T = sum over pooled observations of (F_n - G_m)^2 "
    "weighted nm/(n+m)^2 — algebraically cleared to the ALL-INTEGER "
    "form sum(tc * (m*cumA - n*cumB)^2) / (nm(n+m)^2), so the whole "
    "statistic is one float division of an exact HUGEINT sum over "
    "the cent domain (no per-cell float ever exists). CvM weighs the "
    "WHOLE CDF gap where q_agg_ks_test takes only the maximum — more "
    "power against spread/shape differences that never produce one "
    "big gap. Flagged at the 0.461 5% critical value (nonstandard "
    "limit distribution — the dickey_fuller flag convention). Scale: "
    "one cell rollup; cumsums on the bounded cent domain; constant "
    "tail. Ref: no reference counterpart — statistics tier.",
)
def q_agg_cvm_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("cents")
        .agg(
            F.sum("grp").cast("long").alias("ca"),
            F.sum(1 - F.col("grp")).cast("long").alias("cb"),
        )
    )
    cells = cells.localCheckpoint(eager=False)  # cum + nn read it
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "cents",
        (F.col("ca") + F.col("cb")).alias("tc"),
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
    )
    nn = cells.agg(
        F.sum("ca").cast("long").alias("n"), F.sum("cb").cast("long").alias("m")
    )
    d = (F.col("m") * F.col("cua") - F.col("n") * F.col("cub")).cast("decimal(38,0)")
    s = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n", "m")
        .agg(F.sum(F.col("tc").cast("decimal(38,0)") * d * d).cast("double").alias("u"))
    )
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    tstat = F.col("u") / (nd * F.col("m") * (nd + F.col("m")) * (nd + F.col("m")))
    return s.select(
        F.col("n").alias("n_purchase"),
        F.col("m").alias("n_other"),
        (F.round(tstat, 6) + 0.0).alias("cvm_stat"),
        (tstat > 0.461).alias("significant_5pct"),
    )


_TRIM_PCT = 10  # trim 10% from each tail


@register(
    "q_agg_trimmed_mean",
    family="aggregates",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT et, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY et, cents
    ),
    cum AS (
      SELECT et, cents, cnt,
             sum(cnt) OVER (PARTITION BY et ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cm,
             sum(cnt) OVER (PARTITION BY et) AS n
      FROM cells
    ),
    kept AS (
      -- per-cell kept mass after dropping g = floor(n/10) from each
      -- tail: overlap of [cm-cnt, cm) with [g, n-g) — pure integers
      SELECT et, cents, n, n // {_TRIM_PCT} AS gg,
             greatest(0, least(cm, n - n // {_TRIM_PCT})
                         - greatest(cm - cnt, n // {_TRIM_PCT})) AS k
      FROM cum
    ),
    s AS (
      SELECT et, CAST(max(n) AS BIGINT) AS n,
             CAST(max(gg) AS BIGINT) AS trimmed_each,
             CAST(sum(k) AS BIGINT) AS nk,
             CAST(sum(k * cents) AS BIGINT) AS sv
      FROM kept GROUP BY et
    )
    SELECT et AS event_type, n, trimmed_each,
           round(CAST(sv AS DOUBLE) / nk / 100, 6) + 0.0 AS trimmed_mean
    FROM s ORDER BY event_type
    """,
    doc=f"{_TRIM_PCT}%-trimmed mean per event type on the cent domain: "
    "drop the g = floor(n/10) smallest and largest observations by "
    "the pure-integer interval-overlap rule (each value cell keeps "
    "max(0, min(cum, n-g) - max(cum-cnt, g)) of its mass), then one "
    "exact integer sum — no sort of the data, no float quantile, no "
    "per-row rank. The robust-location sibling of q_agg_winsorized "
    "(winsorizing CLAMPS the tails into the estimate; trimming "
    "REMOVES them — less bias when tails are junk, the common case "
    "in telemetry). Scale: one (group, cents) cell rollup; cumsum "
    "windows on the bounded domain; constant tail. Ref: no "
    "reference counterpart — statistics tier.",
)
def q_agg_trimmed_mean(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("event_type").alias("et"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("et", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("et")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "et",
        "cents",
        "cnt",
        F.sum("cnt").over(w).alias("cm"),
        F.sum("cnt").over(Window.partitionBy("et")).alias("n"),
    )
    gg = F.floor(F.col("n") / _TRIM_PCT).cast("long")
    k = F.greatest(
        F.lit(0),
        F.least(F.col("cm"), F.col("n") - gg) - F.greatest(F.col("cm") - F.col("cnt"), gg),
    )
    kept = cum.select("et", "cents", "n", gg.alias("gg"), k.alias("k"))
    s = kept.groupBy("et").agg(
        F.max("n").cast("long").alias("n"),
        F.max("gg").cast("long").alias("trimmed_each"),
        F.sum("k").cast("long").alias("nk"),
        F.sum(F.col("k") * F.col("cents")).cast("long").alias("sv"),
    )
    return s.select(
        F.col("et").alias("event_type"),
        "n",
        "trimmed_each",
        (
            F.round(F.col("sv").cast("double") / F.col("nk") / 100, 6) + 0.0
        ).alias("trimmed_mean"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-10 wave 8: CDF-distance family completion (Kuiper, Wasserstein-1)
# + the distribution-free median CI.
# ---------------------------------------------------------------------------


@register(
    "q_agg_kuiper",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS ca,
             CAST(sum(1 - grp) AS BIGINT) AS cb
      FROM g GROUP BY cents
    ),
    cum AS (
      SELECT cents,
             sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cua,
             sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cub
      FROM cells
    ),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
                  CAST(sum(cb) AS BIGINT) AS m FROM cells),
    dd AS (
      SELECT nn.n, nn.m,
             CAST(max(nn.m * cua - nn.n * cub) AS BIGINT) AS dplus_i,
             CAST(max(nn.n * cub - nn.m * cua) AS BIGINT) AS dminus_i
      FROM cum CROSS JOIN nn GROUP BY nn.n, nn.m
    )
    SELECT n AS n_purchase, m AS n_other,
           round(CAST(greatest(dplus_i, 0) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * m), 6) + 0.0 AS d_plus,
           round(CAST(greatest(dminus_i, 0) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * m), 6) + 0.0 AS d_minus,
           round((CAST(greatest(dplus_i, 0) AS DOUBLE)
                  + greatest(dminus_i, 0))
                 / (CAST(n AS DOUBLE) * m), 6) + 0.0 AS kuiper_v
    FROM dd
    """,
    doc="Kuiper's two-sample V = D+ + D- between purchase and "
    "non-purchase values: where q_agg_ks_test takes the single "
    "largest CDF gap, Kuiper adds the largest gaps in BOTH "
    "directions — equally sensitive across the whole support "
    "(including both tails, KS's blind spot) and the standard choice "
    "for circular/wrapped domains. The directed gaps are maxima of "
    "the exact INTEGER differences m*cumA - n*cumB over the cent "
    "domain (clamped at 0 — empty direction contributes nothing), so "
    "V is two float divisions of exact BIGINTs. Scale: one cell "
    "rollup; domain cumsums; a 2-scalar max. Ref: no reference "
    "counterpart — statistics tier.",
)
def q_agg_kuiper(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("cents")
        .agg(
            F.sum("grp").cast("long").alias("ca"),
            F.sum(1 - F.col("grp")).cast("long").alias("cb"),
        )
    )
    cells = cells.localCheckpoint(eager=False)  # cum + nn read it
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "cents",
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
    )
    nn = cells.agg(
        F.sum("ca").cast("long").alias("n"), F.sum("cb").cast("long").alias("m")
    )
    dd = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n", "m")
        .agg(
            F.max(F.col("m") * F.col("cua") - F.col("n") * F.col("cub"))
            .cast("long")
            .alias("dplus_i"),
            F.max(F.col("n") * F.col("cub") - F.col("m") * F.col("cua"))
            .cast("long")
            .alias("dminus_i"),
        )
    )
    nm = F.col("n").cast("double") * F.col("m")
    dp = F.greatest(F.col("dplus_i"), F.lit(0)).cast("double")
    dm = F.greatest(F.col("dminus_i"), F.lit(0)).cast("double")
    return dd.select(
        F.col("n").alias("n_purchase"),
        F.col("m").alias("n_other"),
        (F.round(dp / nm, 6) + 0.0).alias("d_plus"),
        (F.round(dm / nm, 6) + 0.0).alias("d_minus"),
        (F.round((dp + dm) / nm, 6) + 0.0).alias("kuiper_v"),
    )


@register(
    "q_agg_wasserstein",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS ca,
             CAST(sum(1 - grp) AS BIGINT) AS cb
      FROM g GROUP BY cents
    ),
    cum AS (
      SELECT cents,
             lead(cents) OVER (ORDER BY cents) AS nxt,
             sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cua,
             sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cub
      FROM cells
    ),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
                  CAST(sum(cb) AS BIGINT) AS m FROM cells),
    s AS (
      SELECT nn.n, nn.m,
             CAST(sum(CASE WHEN nxt IS NULL THEN 0
                      ELSE abs(CAST(nn.m * cua - nn.n * cub AS HUGEINT))
                           * (nxt - cents) END) AS DOUBLE) AS u
      FROM cum CROSS JOIN nn GROUP BY nn.n, nn.m
    )
    SELECT n AS n_purchase, m AS n_other,
           round(u / (CAST(n AS DOUBLE) * m) / 100, 6) + 0.0
             AS wasserstein_1
    FROM s
    """,
    doc="1-Wasserstein (earth-mover) distance between the purchase and "
    "non-purchase value distributions: W1 = integral |F - G| dx, "
    "discretized EXACTLY on the cent domain as sum over consecutive "
    "domain points of |m*cumA - n*cumB| * gap — an exact HUGEINT sum "
    "with ONE float division (and /100 back to value units). W1 is "
    "the drift metric with UNITS (the average value-distance mass "
    "must move): KS/CvM/Kuiper say distributions differ; W1 says by "
    "how many dollars — the quantity a drift alarm thresholds on "
    "(and the 1D optimal-transport quantity embedding-drift monitors "
    "approximate). Scale: one cell rollup; domain cumsums + lead; "
    "constant tail. Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_wasserstein(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("cents")
        .agg(
            F.sum("grp").cast("long").alias("ca"),
            F.sum(1 - F.col("grp")).cast("long").alias("cb"),
        )
    )
    cells = cells.localCheckpoint(eager=False)  # cum + nn read it
    wo = Window.orderBy("cents")
    w = wo.rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "cents",
        F.lead("cents").over(wo).alias("nxt"),
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
    )
    nn = cells.agg(
        F.sum("ca").cast("long").alias("n"), F.sum("cb").cast("long").alias("m")
    )
    term = F.when(F.col("nxt").isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
        F.abs((F.col("m") * F.col("cua") - F.col("n") * F.col("cub")).cast("decimal(38,0)"))
        * (F.col("nxt") - F.col("cents"))
    )
    s = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n", "m")
        .agg(F.sum(term).cast("double").alias("u"))
    )
    return s.select(
        F.col("n").alias("n_purchase"),
        F.col("m").alias("n_other"),
        (
            F.round(F.col("u") / (F.col("n").cast("double") * F.col("m")) / 100, 6)
            + 0.0
        ).alias("wasserstein_1"),
    )


@register(
    "q_agg_median_ci",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT et, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY et, cents
    ),
    cum AS (
      SELECT et, cents,
             sum(cnt) OVER (PARTITION BY et ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cm,
             sum(cnt) OVER (PARTITION BY et) AS n
      FROM cells
    ),
    -- distribution-free order-statistic bounds (normal approx to the
    -- binomial(n, 1/2)): ranks l = floor(n/2 - 0.98*sqrt(n)),
    -- u = ceil(n/2 + 1 + 0.98*sqrt(n)); 0.98 = z(0.975)/2
    ranks AS (
      SELECT et, CAST(max(n) AS BIGINT) AS n,
             CAST(floor(max(n) / 2.0 - 0.98 * sqrt(max(n))) AS BIGINT) AS lr,
             CAST(ceil(max(n) / 2.0 + 1 + 0.98 * sqrt(max(n))) AS BIGINT)
               AS ur
      FROM cum GROUP BY et
    ),
    med AS (
      SELECT c.et, min(c.cents) AS v FROM cum c JOIN ranks r ON r.et = c.et
      WHERE 2 * c.cm >= r.n GROUP BY c.et
    ),
    lo AS (
      SELECT c.et, min(c.cents) AS v FROM cum c JOIN ranks r ON r.et = c.et
      WHERE c.cm >= r.lr GROUP BY c.et
    ),
    hi AS (
      SELECT c.et, min(c.cents) AS v FROM cum c JOIN ranks r ON r.et = c.et
      WHERE c.cm >= r.ur GROUP BY c.et
    )
    SELECT ranks.et AS event_type, ranks.n,
           med.v AS median_cents, lo.v AS ci_lo_cents, hi.v AS ci_hi_cents
    FROM ranks JOIN med ON med.et = ranks.et
               JOIN lo ON lo.et = ranks.et
               JOIN hi ON hi.et = ranks.et
    ORDER BY event_type
    """,
    doc="Distribution-free 95% confidence interval for the median per "
    "event type via binomial order statistics: the interval "
    "[X_(l), X_(u)] with l = floor(n/2 - z/2*sqrt(n)), u = ceil(n/2 "
    "+ 1 + z/2*sqrt(n)) covers the true median at ~95% for ANY "
    "continuous distribution — no normality, no bootstrap resamples "
    "(q_agg_bootstrap's job done in closed form for this one "
    "statistic). Rank lookups are integer rules against the "
    "domain cumsum (the q_agg_qq_table machinery); the only floats "
    "are the two rank cutoffs, identical expressions both engines. "
    "Scale: one cell rollup; domain cumsums; three k-row rank "
    "lookups. Ref: no reference counterpart — statistics tier.",
)
def q_agg_median_ci(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("event_type").alias("et"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("et", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("et")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "et",
        "cents",
        F.sum("cnt").over(w).alias("cm"),
        F.sum("cnt").over(Window.partitionBy("et")).alias("n"),
    )
    cum = cum.localCheckpoint(eager=False)  # ranks + 3 lookups read it
    ranks = cum.groupBy("et").agg(
        F.max("n").cast("long").alias("n"),
        F.floor(F.max("n") / 2.0 - 0.98 * F.sqrt(F.max("n")))
        .cast("long")
        .alias("lr"),
        F.ceil(F.max("n") / 2.0 + 1 + 0.98 * F.sqrt(F.max("n")))
        .cast("long")
        .alias("ur"),
    )
    j = cum.select("et", "cents", "cm").join(F.broadcast(ranks), "et")
    med = j.filter(2 * F.col("cm") >= F.col("n")).groupBy("et").agg(
        F.min("cents").alias("median_cents")
    )
    lo = j.filter(F.col("cm") >= F.col("lr")).groupBy("et").agg(
        F.min("cents").alias("ci_lo_cents")
    )
    hi = j.filter(F.col("cm") >= F.col("ur")).groupBy("et").agg(
        F.min("cents").alias("ci_hi_cents")
    )
    return (
        ranks.join(med, "et")
        .join(lo, "et")
        .join(hi, "et")
        .select(
            F.col("et").alias("event_type"),
            "n",
            "median_cents",
            "ci_lo_cents",
            "ci_hi_cents",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-10 wave 9: family-wise error control (Holm step-down vs plain
# Bonferroni) beside q_agg_bh_fdr's FDR control.
# ---------------------------------------------------------------------------

_HOLM_ALPHA = 0.05


@register(
    "q_agg_holm",
    family="aggregates",
    oracle=f"""
    WITH dow AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS c
      FROM events GROUP BY dw
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(c) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS m
      FROM dow
    ),
    z AS (
      SELECT d.dw, d.n, d.c, t.m,
             (CAST(d.c AS DOUBLE)/d.n - CAST(t.ct - d.c AS DOUBLE)/(t.nt - d.n))
             / sqrt((CAST(t.ct AS DOUBLE)/t.nt) * (1.0 - CAST(t.ct AS DOUBLE)/t.nt)
                    * (1.0/d.n + 1.0/(t.nt - d.n))) AS zval
      FROM dow d CROSS JOIN tot t
    ),
    p AS (
      SELECT dw, m, zval,
             {_erfc_sql("abs(zval) / 1.4142135623730951")} AS pval
      FROM z
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY pval, dw) AS BIGINT) AS rnk
      FROM p
    ),
    stepped AS (
      -- Holm is step-DOWN: a rank is rejected only if ITS threshold
      -- holds AND every smaller rank's did (running AND via min over
      -- the preceding prefix of the 0/1 pass flag)
      SELECT *,
             min(CASE WHEN pval <= {_HOLM_ALPHA} / (m - rnk + 1)
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING) AS holm_ok
      FROM ranked
    )
    SELECT dw AS day_of_week,
           round(zval, 6) + 0.0 AS z_score,
           round(pval, 6) + 0.0 AS p_value,
           rnk AS p_rank,
           round({_HOLM_ALPHA} / (m - rnk + 1), 6) + 0.0 AS holm_threshold,
           CAST(holm_ok AS BOOLEAN) AS holm_rejected,
           pval <= {_HOLM_ALPHA} / m AS bonferroni_rejected
    FROM stepped ORDER BY day_of_week
    """,
    doc="Holm step-down multiple-testing correction over the same 7 "
    "day-of-week conversion tests as q_agg_bh_fdr — the FWER side of "
    "the multiple-testing coin (BH controls the expected FALSE-"
    "DISCOVERY share; Holm controls the chance of ANY false "
    "positive, uniformly more powerful than plain Bonferroni, whose "
    "flag is emitted beside it for the contrast: bonferroni ⊆ holm "
    "⊆ bh is the textbook rejection-set nesting, pinned in "
    "tests/test_r10_invariants.py). The step-down rule 'reject rank "
    "r iff p_(s) <= alpha/(m-s+1) for ALL s <= r' is a running min "
    "of the 0/1 pass flag over the m-row ranked table. Same exact-"
    "integer z, same shared erfc kernel. Scale: one combinable "
    "7-group pass; everything after is arithmetic on m rows (bounded "
    "by the TEST count). Ref: no reference counterpart — statistics "
    "tier.",
)
def q_agg_holm(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    dow = ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    dow = dow.localCheckpoint(eager=False)  # tot + z share it
    tot = dow.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("c").cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    p0 = F.col("ct").cast("double") / F.col("nt")
    zval = (
        F.col("c").cast("double") / F.col("n")
        - (F.col("ct") - F.col("c")).cast("double") / (F.col("nt") - F.col("n"))
    ) / F.sqrt(
        p0 * (1.0 - p0) * (1.0 / F.col("n") + 1.0 / (F.col("nt") - F.col("n")))
    )
    z = dow.join(F.broadcast(tot)).select("dw", "m", zval.alias("zval"))
    p = z.select(
        "*", F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")).alias("pval")
    )
    ranked = p.select(
        "*",
        F.row_number().over(Window.orderBy("pval", "dw")).cast("long").alias("rnk"),
    )
    pass_flag = F.when(
        F.col("pval") <= _HOLM_ALPHA / (F.col("m") - F.col("rnk") + 1), 1
    ).otherwise(0)
    stepped = ranked.select(
        "*",
        F.min(pass_flag)
        .over(Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0))
        .alias("holm_ok"),
    )
    return stepped.select(
        F.col("dw").alias("day_of_week"),
        (F.round("zval", 6) + 0.0).alias("z_score"),
        (F.round("pval", 6) + 0.0).alias("p_value"),
        F.col("rnk").alias("p_rank"),
        (
            F.round(_HOLM_ALPHA / (F.col("m") - F.col("rnk") + 1), 6) + 0.0
        ).alias("holm_threshold"),
        F.col("holm_ok").cast("boolean").alias("holm_rejected"),
        (F.col("pval") <= _HOLM_ALPHA / F.col("m")).alias("bonferroni_rejected"),
    ).orderBy("day_of_week")


# ---------------------------------------------------------------------------
# Round-10 wave 12: the Anderson-Darling member of the CDF-distance family.
# ---------------------------------------------------------------------------


@register(
    "q_agg_ad_test",
    family="aggregates",
    oracle="""
    WITH g AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    cells AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS ca,
             CAST(sum(1 - grp) AS BIGINT) AS cb
      FROM g GROUP BY cents
    ),
    cum AS (
      SELECT cents, ca + cb AS tc,
             sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cua,
             sum(ca + cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               AS cub
      FROM cells
    ),
    nn AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
                  CAST(sum(ca + cb) AS BIGINT) AS nt FROM cells),
    s AS (
      -- quantize the per-cell RATIO (term already divided by n*m): the
      -- raw numerator tc*d^2 overflows BIGINT at ~1e6 rows (caught by
      -- the 100x probe); the ratio is bounded by A^2 itself (~O(10)),
      -- so 1e9-quantized cell terms sum safely at any corpus size
      SELECT nn.n, nn.nt,
             CAST(sum(CASE WHEN cub = nn.nt THEN 0
                   ELSE CAST(round(1e9 * tc
                        * (CAST(nn.nt AS DOUBLE) * cua - CAST(nn.n AS DOUBLE) * cub)
                        * (CAST(nn.nt AS DOUBLE) * cua - CAST(nn.n AS DOUBLE) * cub)
                        / (CAST(cub AS DOUBLE) * (nn.nt - cub))
                        / (CAST(nn.n AS DOUBLE) * (nn.nt - nn.n))) AS BIGINT)
                   END) AS DOUBLE) / 1e9 AS ad
      FROM cum CROSS JOIN nn GROUP BY nn.n, nn.nt
    )
    SELECT n AS n_purchase, CAST(nt - n AS BIGINT) AS n_other,
           round(ad, 6) + 0.0 AS ad_stat,
           ad > 2.492 AS significant_5pct
    FROM s
    """,
    doc="Two-sample Anderson-Darling statistic, purchase vs "
    "non-purchase values (Pettitt's right-continuous discrete form): "
    "A^2 = (1/(nm)) sum over pooled distinct values (except the "
    "last) of tc * (N*cumA - n*cumPooled)^2 / (cumPooled*(N-"
    "cumPooled)) — the CDF gap WEIGHTED BY 1/(B(N-B)), which blows "
    "up at the tails: AD is the tail-sensitive member of the "
    "distance family (KS = max gap, CvM = mean square gap, Kuiper = "
    "both directions, W1 = gap with units, AD = tail-weighted), the "
    "standard choice when tail risk is the question. Each cell's "
    "term is an identical float expression of exact integers; the "
    "quantized quantity is the RATIO term/(nm) — bounded by A^2 "
    "itself — because the 100x probe caught the raw tc*d^2 form "
    "overflowing BIGINT at ~1e6 rows (CAST_OVERFLOW; the same probe "
    "class that caught the r9 IVF draft). Flagged at the 2.492 asymptotic "
    "5% critical value (nonstandard distribution — the dickey_fuller "
    "convention). Scale: one cell rollup; domain cumsums; constant "
    "tail. Ref: no reference counterpart — statistics tier.",
)
def q_agg_ad_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        )
        .groupBy("cents")
        .agg(
            F.sum("grp").cast("long").alias("ca"),
            F.sum(1 - F.col("grp")).cast("long").alias("cb"),
        )
    )
    cells = cells.localCheckpoint(eager=False)  # cum + nn read it
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "cents",
        (F.col("ca") + F.col("cb")).alias("tc"),
        F.sum("ca").over(w).alias("cua"),
        F.sum(F.col("ca") + F.col("cb")).over(w).alias("cub"),
    )
    nn = cells.agg(
        F.sum("ca").cast("long").alias("n"),
        F.sum(F.col("ca") + F.col("cb")).cast("long").alias("nt"),
    )
    d = F.col("nt").cast("double") * F.col("cua") - F.col("n").cast(
        "double"
    ) * F.col("cub")
    term = F.when(F.col("cub") == F.col("nt"), F.lit(0).cast("long")).otherwise(
        F.round(
            1e9
            * F.col("tc")
            * d
            * d
            / (F.col("cub").cast("double") * (F.col("nt") - F.col("cub")))
            / (F.col("n").cast("double") * (F.col("nt") - F.col("n")))
        ).cast("long")
    )
    s = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n", "nt")
        .agg((F.sum(term).cast("double") / 1e9).alias("ad"))
    )
    return s.select(
        F.col("n").alias("n_purchase"),
        (F.col("nt") - F.col("n")).cast("long").alias("n_other"),
        (F.round("ad", 6) + 0.0).alias("ad_stat"),
        (F.col("ad") > 2.492).alias("significant_5pct"),
    )


# ---------------------------------------------------------------------------
# Round-10 wave 16: the Theil between/within decomposition.
# ---------------------------------------------------------------------------


@register(
    "q_agg_theil_decomp",
    family="aggregates",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et,
             CAST(round(value * 100) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events
      WHERE CAST(round(value * 100) AS BIGINT) > 0
      GROUP BY et, x
    ),
    gr AS (
      SELECT et, CAST(sum(cnt) AS BIGINT) AS ng,
             CAST(sum(cnt * x) AS BIGINT) AS sg
      FROM cells GROUP BY et
    ),
    tt AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                  CAST(sum(sg) AS BIGINT) AS s FROM gr),
    tg AS (
      -- per-group Theil over the (value, group) cells: exact-int log
      -- arguments, 1e-9-quantized cell terms (cell order independent)
      SELECT c.et,
             CAST(sum(CAST(round(1e9 * c.cnt
                   * (c.x * 1.0 * g.ng / g.sg)
                   * (ln(c.x * 1.0 * g.ng) - ln(g.sg))) AS BIGINT))
                  AS DOUBLE) / 1e9 / g.ng AS t_g
      FROM cells c JOIN gr g ON g.et = c.et
      GROUP BY c.et, g.ng
    ),
    tot AS (
      SELECT CAST(sum(CAST(round(1e9 * c.cnt
                   * (c.x * 1.0 * tt.n / tt.s)
                   * (ln(c.x * 1.0 * tt.n) - ln(tt.s))) AS BIGINT))
                  AS DOUBLE) / 1e9 / max(tt.n) AS t_total
      FROM cells c CROSS JOIN tt
    ),
    btw AS (
      SELECT CAST(sum(CAST(round(1e9 * (g.sg * 1.0 / tt.s)
                   * (ln(g.sg * 1.0 * tt.n) - ln(tt.s * 1.0 * g.ng)))
                   AS BIGINT)) AS DOUBLE) / 1e9 AS t_between
      FROM gr g CROSS JOIN tt
    )
    SELECT g.et AS event_type, g.ng AS n,
           round(g.sg * 1.0 / tt.s, 6) + 0.0 AS value_share,
           round(tg.t_g, 6) + 0.0 AS theil_g,
           round((g.sg * 1.0 / tt.s) * tg.t_g, 6) + 0.0 AS within_contrib,
           round(tot.t_total, 6) + 0.0 AS theil_total,
           round(btw.t_between, 6) + 0.0 AS theil_between
    FROM gr g JOIN tg ON tg.et = g.et
    CROSS JOIN tt CROSS JOIN tot CROSS JOIN btw
    ORDER BY event_type
    """,
    doc="Theil between/within decomposition of value inequality by "
    "event type: the additive identity T_total = T_between + "
    "sum_g (s_g/S) T_g that is WHY the Theil index exists "
    "(q_agg_theil reports per-group T; this answers 'is the "
    "inequality BETWEEN the types or INSIDE them' — for a data "
    "mixture: is imbalance across sources or within each source). "
    "All three terms ride exact-integer log arguments (cross-"
    "multiplied ratios, logs split) with 1e-9-quantized cell terms "
    "over the (cents, group) domain; the additivity identity is "
    "pinned numerically in tests/test_r10_invariants.py — a shared "
    "formula bug would break it. Scale: one (cents, group) cell "
    "rollup; everything after runs on cells and k rows. Ref: no "
    "reference counterpart — statistics tier.",
)
def q_agg_theil_decomp(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.col("event_type").alias("et"),
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
        .filter(F.col("x") > 0)
        .groupBy("et", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)  # gr + tg + tot read it
    gr = cells.groupBy("et").agg(
        F.sum("cnt").cast("long").alias("ng"),
        F.sum(F.col("cnt") * F.col("x")).cast("long").alias("sg"),
    )
    gr = gr.localCheckpoint(eager=False)  # tt + tg + btw + output read it
    tt = gr.agg(
        F.sum("ng").cast("long").alias("n"), F.sum("sg").cast("long").alias("s")
    )
    tg_term = F.round(
        1e9
        * F.col("cnt")
        * (F.col("x") * 1.0 * F.col("ng") / F.col("sg"))
        * (F.log(F.col("x") * 1.0 * F.col("ng")) - F.log(F.col("sg")))
    ).cast("long")
    tg = (
        cells.join(F.broadcast(gr), "et")
        .groupBy("et", "ng")
        .agg((F.sum(tg_term).cast("double") / 1e9 / F.col("ng")).alias("t_g"))
        .select("et", "t_g")
    )
    tot_term = F.round(
        1e9
        * F.col("cnt")
        * (F.col("x") * 1.0 * F.col("n") / F.col("s"))
        * (F.log(F.col("x") * 1.0 * F.col("n")) - F.log(F.col("s")))
    ).cast("long")
    tot = (
        cells.crossJoin(F.broadcast(tt))
        .agg(
            (F.sum(tot_term).cast("double") / 1e9 / F.max("n")).alias("t_total")
        )
    )
    btw_term = F.round(
        1e9
        * (F.col("sg") * 1.0 / F.col("s"))
        * (
            F.log(F.col("sg") * 1.0 * F.col("n"))
            - F.log(F.col("s") * 1.0 * F.col("ng"))
        )
    ).cast("long")
    btw = (
        gr.crossJoin(F.broadcast(tt))
        .agg((F.sum(btw_term).cast("double") / 1e9).alias("t_between"))
    )
    return (
        gr.join(tg, "et")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btw))
        .select(
            F.col("et").alias("event_type"),
            F.col("ng").alias("n"),
            (F.round(F.col("sg") * 1.0 / F.col("s"), 6) + 0.0).alias(
                "value_share"
            ),
            (F.round("t_g", 6) + 0.0).alias("theil_g"),
            (
                F.round((F.col("sg") * 1.0 / F.col("s")) * F.col("t_g"), 6) + 0.0
            ).alias("within_contrib"),
            (F.round("t_total", 6) + 0.0).alias("theil_total"),
            (F.round("t_between", 6) + 0.0).alias("theil_between"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-10 wave 17 (final window slots): Benjamini-Yekutieli FDR under
# arbitrary dependence — completing the multiple-testing trio.
# ---------------------------------------------------------------------------


@register(
    "q_agg_benjamini_yekutieli",
    family="aggregates",
    oracle=f"""
    WITH dow AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS c
      FROM events GROUP BY dw
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(c) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS m
      FROM dow
    ),
    z AS (
      SELECT d.dw, t.m,
             (CAST(d.c AS DOUBLE)/d.n - CAST(t.ct - d.c AS DOUBLE)/(t.nt - d.n))
             / sqrt((CAST(t.ct AS DOUBLE)/t.nt) * (1.0 - CAST(t.ct AS DOUBLE)/t.nt)
                    * (1.0/d.n + 1.0/(t.nt - d.n))) AS zval
      FROM dow d CROSS JOIN tot t
    ),
    p AS (
      SELECT dw, m, zval,
             {_erfc_sql("abs(zval) / 1.4142135623730951")} AS pval,
             -- harmonic number H_m computed from data-derived m by the
             -- SAME ascending fold both engines
             list_sum(list_transform(range(1, m + 1), i -> 1.0 / i)) AS hm
      FROM z
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY pval, dw) AS BIGINT) AS rnk
      FROM p
    ),
    flagged AS (
      SELECT *,
             CASE WHEN pval <= rnk * {_BH_Q} / (m * hm) THEN rnk ELSE 0 END
               AS ok_rnk
      FROM ranked
    ),
    cut AS (SELECT max(ok_rnk) AS max_ok FROM flagged)
    SELECT f.dw AS day_of_week,
           round(f.zval, 6) + 0.0 AS z_score,
           round(f.pval, 6) + 0.0 AS p_value,
           f.rnk AS p_rank,
           round(f.rnk * {_BH_Q} / (f.m * f.hm), 6) + 0.0 AS by_threshold,
           CAST(f.rnk <= cu.max_ok AS BOOLEAN) AS rejected
    FROM flagged f CROSS JOIN cut cu
    ORDER BY day_of_week
    """,
    doc="Benjamini-Yekutieli FDR correction on the same 7 day-of-week "
    "tests as q_agg_bh_fdr/q_agg_holm, completing the multiple-"
    "testing trio: BH's FDR guarantee assumes independence (or PRDS); "
    "BY divides every threshold by the harmonic number H_m and holds "
    "under ARBITRARY dependence — the honest choice when the tests "
    "share data, as segment dashboards always do (each dow is tested "
    "against the pooled rest). H_m is computed from the DATA-DERIVED "
    "m by the same ascending 1/i fold on both engines (no stale "
    "hardcoded literal — the ADVICE-r9 df lesson applied "
    "preemptively). Rejection nesting BY <= BH is invariant-pinned. "
    "Scale: one combinable 7-group pass; arithmetic on m rows. Ref: "
    "no reference counterpart — statistics tier.",
)
def q_agg_benjamini_yekutieli(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    dow = ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dw")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    dow = dow.localCheckpoint(eager=False)  # tot + z share it
    tot = dow.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("c").cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    p0 = F.col("ct").cast("double") / F.col("nt")
    zval = (
        F.col("c").cast("double") / F.col("n")
        - (F.col("ct") - F.col("c")).cast("double") / (F.col("nt") - F.col("n"))
    ) / F.sqrt(
        p0 * (1.0 - p0) * (1.0 / F.col("n") + 1.0 / (F.col("nt") - F.col("n")))
    )
    hm = F.aggregate(
        F.sequence(F.lit(1), F.col("m")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / i.cast("double"),
    )
    z = dow.join(F.broadcast(tot)).select(
        "dw", "m", zval.alias("zval"), hm.alias("hm")
    )
    p = z.select(
        "*", F.expr(_erfc_sql("abs(zval) / 1.4142135623730951")).alias("pval")
    )
    ranked = p.select(
        "*",
        F.row_number().over(Window.orderBy("pval", "dw")).cast("long").alias("rnk"),
    )
    flagged = ranked.select(
        "*",
        F.when(
            F.col("pval") <= F.col("rnk") * _BH_Q / (F.col("m") * F.col("hm")),
            F.col("rnk"),
        )
        .otherwise(F.lit(0))
        .alias("ok_rnk"),
    )
    flagged = flagged.localCheckpoint(eager=False)  # cut + output share it
    cut = flagged.agg(F.max("ok_rnk").alias("max_ok"))
    return (
        flagged.join(F.broadcast(cut))
        .select(
            F.col("dw").alias("day_of_week"),
            (F.round(F.col("zval"), 6) + 0.0).alias("z_score"),
            (F.round(F.col("pval"), 6) + 0.0).alias("p_value"),
            F.col("rnk").alias("p_rank"),
            (
                F.round(F.col("rnk") * _BH_Q / (F.col("m") * F.col("hm")), 6)
                + 0.0
            ).alias("by_threshold"),
            (F.col("rnk") <= F.col("max_ok")).alias("rejected"),
        )
        .orderBy("day_of_week")
    )
