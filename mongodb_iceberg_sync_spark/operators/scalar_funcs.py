"""Scalar function families (SURVEY.md §2B): string/date/math/array/json/map.

Everything stays JVM-side (built-in pyspark.sql.functions) so the
expressions live inside whole-stage codegen — no Python in the hot path.
Transcendental results (ln/pow/sqrt) are rounded: libm implementations
may differ in the last ulp between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q_string_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           substr(p_name, 1, 8)                            AS name_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           trim(p_name)                                    AS name_trim,
           length(p_name)                                  AS name_len,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
           (p_type LIKE '%ECONOMY%')                       AS is_economy
    FROM part
    """,
    doc="upper/substr/concat/trim/length/regexp_extract/LIKE.",
)
def q_string_funcs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.col("p_type").like("%ECONOMY%").alias("is_economy"),
    )


@register(
    "q_date_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)     AS order_year,
           CAST(month(o_orderdate) AS INTEGER)    AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER)  AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch0,
           o_orderdate + INTERVAL 3 MONTH         AS due_date
    FROM orders
    """,
    doc="year/month/quarter/date_trunc/datediff/add_months.",
)
def q_date_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch0"),
        F.add_months(F.col("o_orderdate").cast("date"), 3)
        .cast("timestamp_ntz")
        .alias("due_date"),
    )


@register(
    "q_math_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1)              AS price_r1,
           abs(o_totalprice - 200000)          AS dist_from_200k,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)  AS price_kilo_ceil,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kilo_floor,
           round(ln(o_totalprice), 6)          AS price_ln,
           round(sqrt(o_totalprice), 6)        AS price_sqrt,
           round(pow(o_totalprice / 100000, 2), 6) AS price_sq
    FROM orders
    WHERE o_totalprice > 0
    """,
    doc="round/abs/ceil/floor/ln/sqrt/pow (rounded: libm last-ulp).",
)
def q_math_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 200000).alias("dist_from_200k"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_kilo_ceil"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_kilo_floor"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("price_ln"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.pow(F.col("o_totalprice") / 100000, 2), 6).alias("price_sq"),
    )


@register(
    "q_array_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                       AS dim,
           embedding[1]                         AS first_elem,
           round(embedding[1]::DOUBLE + embedding[2]::DOUBLE
                 + embedding[3]::DOUBLE + embedding[4]::DOUBLE, 6) AS head4_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    doc="size/element_at/slice-sum/filter over array<float> embeddings.",
)
def q_array_funcs(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    head4 = F.aggregate(
        F.slice("embedding", 1, 4),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.round(head4, 6).alias("head4_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "q_json_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_high
    FROM events
    """,
    doc="get_json_object / from_json over the events.props JSON column.",
)
def q_json_funcs(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k * 2).alias("k2"),
        (k > 50).alias("k_high"),
    )


@register(
    "q_map_funcs",
    family="scalar_funcs",
    oracle="""
    SELECT event_id, 'k' AS map_key,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS map_value,
           1 AS map_size
    FROM events
    """,
    doc="Map construction (create_map), map_keys/map_values + explode; "
    "oracle states the equivalent flat contract (DuckDB MAP differs).",
)
def q_map_funcs(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("int"))
    exploded = ev.withColumn("m", m).select(
        "event_id", F.size("m").alias("map_size"), F.explode("m").alias("map_key", "map_value")
    )
    return exploded.select("event_id", "map_key", "map_value", "map_size")


@register(
    "q_json_shred",
    family="scalar_funcs",
    oracle="""
    WITH shredded AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)  AS n,
           CAST(sum(k) AS BIGINT)    AS sum_k,
           CAST(min(k) AS BIGINT)    AS min_k,
           CAST(max(k) AS BIGINT)    AS max_k,
           round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS avg_k
    FROM shredded GROUP BY event_type ORDER BY event_type
    """,
    doc="Semi-structured shredding: parse the events.props JSON string "
    "into typed columns with an EXPLICIT schema (from_json with "
    "'k BIGINT' — never schema inference in the hot path, which "
    "would cost a sampling pass and produce run-dependent types), "
    "then aggregate the shredded integer like any native column. "
    "This is the lakehouse VARIANT-column pattern: JSON stays "
    "opaque in storage, the scan projects just the parsed field, "
    "and everything downstream is codegen arithmetic on exact "
    "integers (one rounded division for the mean). Scale: map-side "
    "parse + map-side partial agg into a |event_types|-row result — "
    "the parse cost is the scan, nothing else grows.",
)
def q_json_shred(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    shredded = e.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_json_variant",
    family="scalar_funcs",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_high,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
             AS BIGINT) AS max_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
             AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="VARIANT semi-structured type (Spark 4): events.props parsed "
    "ONCE with parse_json into the binary VARIANT encoding, then "
    "typed paths extracted with variant_get('$.k', 'int') for a "
    "filter and three aggregates — the open-table-format answer to "
    "schemaless columns (Iceberg v3 adopts the same variant spec), "
    "replacing per-expression get_json_object re-parsing "
    "(q_json_funcs' shape) with one decode + cheap typed access. "
    "Results are exact integers, so the DuckDB json_extract oracle "
    "hash-matches. Scale: parse_json is map-side codegen; the "
    "variant binary never shuffles here (extraction happens before "
    "the aggregate), and the groupBy carries only typed ints.",
)
def q_json_variant(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "int").alias("k"),
    )
    return (
        v.filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_high"),
            F.max("k").cast("long").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
        .orderBy("event_type")
    )
