"""Scans, projections, filters (SURVEY.md §2B scans/filters).

Mirrors reference pipeline ops A4 (projection+rename, reference
docs/design.md:213-230) and A9 (resume predicate, docs/design.md:92) as
relational queries. All expressed declaratively so Catalyst pushes
filters and prunes columns into the parquet scan (verified via
.explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ._util import session_fixture, t


@register(
    "q_scan_project",
    family="scans",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
    FROM lineitem
    """,
    doc="Parquet scan + column projection (pruned ReadSchema).",
)
def q_scan_project(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
    )


@register(
    "q_scan_pruned",
    family="scans",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 10
    """,
    doc="Scan with predicates that push down to the parquet reader.",
)
def q_scan_pruned(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "q_filter_pred",
    family="filters",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax <= 0.02)
      AND l_shipdate IS NOT NULL
    """,
    doc="Conjunctive/disjunctive predicates, BETWEEN, IN, IS NULL.",
)
def q_filter_pred(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") <= 0.02))
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_returnflag"
    )


@register(
    "q_project_nested",
    family="filters",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           user_id AS uid
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
    doc="Nested/JSON path extraction + rename (reference A4 dot-paths, "
    "docs/design.md:215-230).",
)
def q_project_nested(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_id",
            prop_k.alias("prop_k"),
            F.col("user_id").alias("uid"),
        )
        .filter(F.col("prop_k") >= 50)
    )


@register(
    "q_case_when",
    family="filters",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                ELSE 'partial' END AS status_name,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_bucket
    FROM orders
    """,
    doc="Conditional projection (CASE WHEN chains).",
)
def q_case_when(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
        .alias("status_name"),
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
    )


@register(
    "q_sink_partitioned",
    family="sinks",
    oracle=None,  # side-effecting write; driver does a rows-only check
    doc="Partitioned write (reference A17 transforms month+bucket, "
    "docs/design.md:185) then read-back aggregation. At scale the same "
    "code lands month/bucket directories that Spark partition-prunes.",
)
def q_sink_partitioned(spark, sf_dir):
    derived = (
        t(spark, sf_dir, "events")
        .withColumn("m", F.month("ts"))
        .withColumn("b", F.pmod(F.hash("user_id"), F.lit(8)))
    )

    def build(out):
        derived.write.mode("overwrite").partitionBy("m", "b").parquet(out)

    out = session_fixture(("mis_sink", sf_dir), build)
    # explicit schema: an EMPTY input writes zero partition directories,
    # and schema inference on a fileless dir fails — the read-back must
    # behave like any other empty table (empty in -> empty out)
    back = spark.read.schema(derived.schema).parquet(out)
    return (
        back.groupBy("m", "b")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("m", "b")
    )


@register(
    "q_scan_json",
    family="scans",
    oracle="""
    SELECT event_type,
           count(*)                    AS n,
           round(sum(CAST(value AS DECIMAL(18,2))) / count(*), 4) AS avg_value,
           max(ts)                     AS max_ts
    FROM events
    GROUP BY event_type
    """,
    doc="JSON-lines source ingestion with an EXPLICIT schema (never "
    "inferSchema in production — a schema scan reads the whole input "
    "twice and locks in sampled guesses): events round-trip through "
    "ndjson and must aggregate identically to the parquet oracle. "
    "Timestamps serialize as ISO-8601 micros; decimal-exact avg keeps "
    "the float aggregate order-insensitive.",
)
def q_scan_json(spark, sf_dir):
    # TIMESTAMP_NTZ serialization is governed by timestampNTZFormat
    # (timestampFormat only covers the LTZ type) — default format drops
    # to millis and silently loses microsecond precision on round-trip
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

    def build(out):
        ev = t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
        ev.write.mode("overwrite").option("timestampNTZFormat", fmt).json(out)

    out = session_fixture(("mis_json", sf_dir), build)
    back = (
        spark.read.schema(
            "event_id bigint, ts timestamp_ntz, event_type string, value double"
        )
        .option("timestampNTZFormat", fmt)
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"),
            4,
        ).alias("avg_value"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "q_scan_csv",
    family="scans",
    oracle="""
    SELECT event_type,
           count(*)                    AS n,
           round(sum(CAST(value AS DECIMAL(18,2))) / count(*), 4) AS avg_value,
           count(DISTINCT user_id)     AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="CSV source ingestion, explicit schema + header: events round-"
    "trip through CSV and must aggregate identically to the parquet "
    "oracle. CSV is the interchange format every pipeline eventually "
    "meets; the explicit schema avoids both the double read of "
    "inferSchema and silent type drift.",
)
def q_scan_csv(spark, sf_dir):
    def build(out):
        ev = t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        ev.write.mode("overwrite").option("header", True).csv(out)

    out = session_fixture(("mis_csv", sf_dir), build)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).option("header", True).csv(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"),
            4,
        ).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_scan_orc",
    family="scans",
    oracle="""
    SELECT l_returnflag,
           count(*)                          AS n,
           CAST(sum(l_quantity) AS BIGINT)   AS sum_qty,
           round(sum(l_extendedprice), 2)    AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="ORC source ingestion: lineitem columns round-trip through ORC "
    "and must aggregate identically to the parquet oracle. ORC is the "
    "other columnar interchange format (Hive/Trino ecosystems); "
    "Spark's reader gives the same pushdown/pruning surface as "
    "parquet, so the scan-side design notes transfer unchanged.",
)
def q_scan_orc(spark, sf_dir):
    def build(out):
        li = t(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
        li.write.mode("overwrite").orc(out)

    out = session_fixture(("mis_orc", sf_dir), build)
    back = spark.read.schema(
        "l_returnflag string, l_quantity double, l_extendedprice double"
    ).orc(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "q_scan_text",
    family="scans",
    oracle="""
    SELECT count(*)                        AS n_lines,
           count(DISTINCT text)            AS n_distinct,
           CAST(sum(len(text)) AS BIGINT)  AS sum_chars,
           min(text)                       AS min_text,
           max(text)                       AS max_text
    FROM documents
    """,
    doc="Line-oriented text source: documents round-trip through plain "
    ".txt files (spark.read.text) and must aggregate identically to "
    "the parquet oracle. Raw text is the arrival format of most web "
    "corpora; line-per-record keeps the reader splittable, so a 100 TB "
    "dump still fans out to one task per 128 MB split with no parse "
    "coordination.",
)
def q_scan_text(spark, sf_dir):
    def build(out):
        docs = t(spark, sf_dir, "documents").select("text")
        docs.write.mode("overwrite").text(out)

    out = session_fixture(("mis_txt", sf_dir), build)
    back = spark.read.text(out).withColumnRenamed("value", "text")
    return back.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("text").alias("n_distinct"),
        F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
        F.min("text").alias("min_text"),
        F.max("text").alias("max_text"),
    )


@register(
    "q_scan_binaryfile",
    family="scans",
    oracle="""
    SELECT count(*)                        AS n_lines,
           count(DISTINCT text)            AS n_distinct,
           CAST(sum(len(text)) AS BIGINT)  AS sum_chars
    FROM documents
    """,
    doc="Opaque-binary source (format='binaryFile') — the ingestion "
    "path for multimodal blobs (images/audio/shards): whole files "
    "arrive as (path, length, content: binary) rows. Here the blobs "
    "are UTF-8 text shards written by the text sink; decode + "
    "line-split + per-line aggregates must match the parquet oracle, "
    "proving the binary plumbing is lossless. At 100 TB each blob is "
    "one row (files are the unit of parallelism — no splitting inside "
    "a blob), so shard sizing on write IS the partition sizing on "
    "read; maxPartitionBytes packs small blobs into shared tasks.",
)
def q_scan_binaryfile(spark, sf_dir):
    def build(out):
        docs = t(spark, sf_dir, "documents").select("text")
        docs.coalesce(4).write.mode("overwrite").text(out)

    out = session_fixture(("mis_bin", sf_dir), build)
    blobs = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(out)
    )
    lines = (
        blobs.select(F.decode("content", "UTF-8").alias("body"))
        .select(F.explode(F.split("body", "\n")).alias("text"))
        .filter(F.col("text") != "")
    )
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("text").alias("n_distinct"),
        F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
    )


@register(
    "q_scan_schema_merge",
    family="scans",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT count(*)                                       AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2)
             AS sum_price,
           count(o_orderpriority)                         AS n_with_priority,
           count(DISTINCT o_orderpriority)                AS n_priorities
    FROM unioned
    """,
    doc="Schema-evolution read (mergeSchema): two parquet generations "
    "of the same table — an old one written BEFORE a column existed "
    "and a new one carrying it — read as one relation, old rows "
    "null-filled for the added column. This is the reader half of the "
    "sync engine's additive schema evolution (sync/evolution.py, "
    "reference A8): the lake accretes columns without rewriting "
    "history. mergeSchema reconciles footers at planning time "
    "(per-file, parallel); the scan itself stays predicate/projection "
    "pushdown-capable per file, so at 100 TB the cost of N schema "
    "generations is N footer reads, not a table rewrite.",
)
def q_scan_schema_merge(spark, sf_dir):
    def build(out):
        o = t(spark, sf_dir, "orders")
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(f"{out}/gen=1")
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(f"{out}/gen=2")

    out = session_fixture(("mis_sm", sf_dir), build)
    back = spark.read.option("mergeSchema", True).parquet(
        f"{out}/gen=1", f"{out}/gen=2"
    )
    return back.agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")).cast("double"), 2
        ).alias("sum_price"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


_SORTED_MAX_RECS = 10000
# Range-shuffle width for the sorted sink. Fixed (not defaultParallelism)
# so the oracle's file-count bound is environment-independent; on a real
# cluster this is sized to executor count × a few, and the bound below
# scales with it automatically.
_SORTED_RANGE_TASKS = 8


@register(
    "q_sink_sorted_files",
    family="sinks",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT)  AS ship_year,
           CAST(count(*) AS BIGINT)          AS n_rows,
           TRUE                              AS files_in_bound
    FROM lineitem
    GROUP BY year(l_shipdate)
    ORDER BY ship_year
    """,
    doc="Write-layout sink: repartitionByRange(N, ship_year, l_shipdate) "
    "+ sortWithinPartitions(ship_year, l_shipdate) + partitionBy + "
    "maxRecordsPerFile — the clustered, size-bounded file layout that "
    "makes min/max row-group skipping fire on a 100 TB table (an "
    "unsorted partition has every file spanning the whole key range; "
    "sorted files have tight disjoint ranges, so a date-range query "
    "prunes to O(range) files). The RANGE shuffle is the scale-safe "
    "part: a plain repartition(ship_year) funnels each year — ~14 TB "
    "at target scale — through ONE task (straggler/OOM); ranging on "
    "(ship_year, l_shipdate) spreads every year across many tasks "
    "while keeping files range-disjoint, because range-partition "
    "slices nest inside the year directories and the sort key "
    "prefixes the partition column (partitionBy would otherwise "
    "re-sort and destroy clustering). File count per year is then "
    "bounded, not exact: ceil(rows/maxRecs) <= n_files <= "
    "ceil(rows/maxRecs) + N tasks; the query emits the bound check as "
    "a column the oracle pins to TRUE, and per-file range "
    "disjointness is pinned by "
    "tests/test_plans.py::test_sink_sorted_files_ranges_disjoint.",
)
def q_sink_sorted_files(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("long")
    )

    def build(out):
        (
            li.repartitionByRange(_SORTED_RANGE_TASKS, "ship_year", "l_shipdate")
            .sortWithinPartitions("ship_year", "l_shipdate")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", _SORTED_MAX_RECS)
            .partitionBy("ship_year")
            .parquet(out)
        )

    out = session_fixture(("mis_sorted", sf_dir), build)
    # explicit schema: empty input writes no directories (see q_sink_partitioned)
    back = spark.read.schema(li.schema).parquet(out)
    files = back.select("ship_year", F.input_file_name().alias("f"))
    min_files = F.ceil(F.count("*") / F.lit(float(_SORTED_MAX_RECS)))
    return (
        files.groupBy("ship_year")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            (
                (F.countDistinct("f") >= min_files)
                & (F.countDistinct("f") <= min_files + F.lit(_SORTED_RANGE_TASKS))
            ).alias("files_in_bound"),
        )
        .orderBy("ship_year")
    )


@register(
    "q_scan_dpp",
    family="scans",
    oracle="""
    WITH yrs AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y
      FROM orders GROUP BY year(o_orderdate)
      HAVING count(*) % 2 = 1
    )
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(count(*) AS BIGINT)           AS n_lines,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0                        AS revenue
    FROM lineitem l JOIN yrs ON CAST(year(l.l_shipdate) AS BIGINT) = yrs.y
    GROUP BY year(l.l_shipdate)
    ORDER BY ship_year
    """,
    doc="Dynamic partition pruning: the fact is laid out "
    "partitionBy(ship_year) and joined to a dim whose qualifying "
    "years are DATA-DEPENDENT (years with an odd order count — "
    "nothing Catalyst can constant-fold at plan time), so static "
    "partition pruning is impossible; Spark instead injects a "
    "dynamicpruning#N subquery into the fact scan's "
    "PartitionFilters, reusing the dim's broadcast exchange, and "
    "entire year directories are SKIPPED at runtime before a single "
    "row is read (pinned in test_plans). THE mechanism for "
    "dim-filtered scans of a date-partitioned 100 TB fact table — "
    "without it this query reads every partition and filters after "
    "the join. Revenue stays exact integer cents through the parquet "
    "round-trip (doubles round-trip bit-exactly).",
)
def q_scan_dpp(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    )

    def build(out):
        li.repartitionByRange(
            _SORTED_RANGE_TASKS, "ship_year", "l_shipdate"
        ).write.mode("overwrite").partitionBy("ship_year").parquet(out)

    out = session_fixture(("mis_dpp", sf_dir), build)
    # explicit schema: empty input writes no directories (see q_sink_partitioned);
    # partition columns still resolve by name, so DPP pruning is unchanged
    fact = spark.read.schema(li.schema).parquet(out)
    dim = (
        t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") % 2 == 1)
        .select("y")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        fact.join(F.broadcast(dim), F.col("ship_year").cast("long") == F.col("y"))
        .groupBy(F.col("ship_year").cast("long").alias("ship_year"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            (F.sum(rev) / 10000.0).alias("revenue"),
        )
        .orderBy("ship_year")
    )


_PYDS_OPS = 2000
_PYDS_DOCS = 50


@register(
    "q_scan_pyds",
    family="scans",
    oracle=f"""
    WITH i AS (SELECT unnest(range(0, {_PYDS_OPS})) AS i),
    ops AS (
      SELECT i,
             CASE WHEN i > 0 AND i % 7 = 0 THEN 'delete'
                  WHEN i < {_PYDS_DOCS}    THEN 'insert'
                  WHEN i % 11 = 0          THEN 'replace'
                  ELSE 'update' END AS op_type
      FROM i
    )
    SELECT op_type,
           CAST(count(*) AS BIGINT)   AS n_ops,
           CAST(min(i + 1) AS BIGINT) AS first_seq,
           CAST(max(i + 1) AS BIGINT) AS last_seq
    FROM ops GROUP BY op_type
    """,
    doc="Python Data Source scan through the driver gate: read the "
    "registered `mongo_cdc_sim` format (sources/pyds.py — the CDC "
    "feed as a NATIVE Spark source: engine-planned input partitions, "
    "streaming offsets as resume tokens) and aggregate the op-type "
    "census. The oracle rebuilds the identical deterministic log from "
    "generate_series, so the hash check covers the source's partition "
    "planning and row generation end to end — every input partition "
    "must produce exactly its op_seq slice, no dupes, no gaps "
    "(a short-read or double-read source shifts a count and fails). "
    "Scale: the scan parallelizes across input partitions like any "
    "file source; a real deployment swaps the generator for a pymongo "
    "cursor per partition (sources/mongo_live.py) with the same "
    "Spark-facing contract.",
)
def q_scan_pyds(spark, sf_dir):
    from ..sources.pyds import register_cdc_sim

    register_cdc_sim(spark)
    df = (
        spark.read.format("mongo_cdc_sim")
        .option("n_ops", _PYDS_OPS)
        .option("n_docs", _PYDS_DOCS)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("op_type").agg(
        F.count("*").alias("n_ops"),
        F.min("op_seq").alias("first_seq"),
        F.max("op_seq").alias("last_seq"),
    )


@register(
    "q_sink_pyds",
    family="sinks",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS cents
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Python Data Source WRITER round-trip (`manifest_sink`, Spark 4 "
    "SPARK-44076 write path): a lineitem slice is written through a "
    "REGISTERED native sink whose tasks emit JSON-lines part files and "
    "whose driver commit publishes an atomic manifest (temp+rename "
    "snapshot-pointer swap) — the Iceberg commit protocol expressed in "
    "the engine's own sink API (reference A15/A21). The read-back is "
    "MANIFEST-SCOPED: an orphan file planted in data/ (simulating a "
    "failed attempt) is invisible, which is exactly the torn-write "
    "guarantee; the oracle aggregates the SOURCE slice directly, so a "
    "green row proves the commit-protocol round-trip lossless. "
    "Layout built once per session (session_fixture); classes pickle "
    "by value so executor workers need no repo on sys.path. Scale: "
    "one writer task per partition, commit cost is O(#files) driver "
    "JSON — the same contract a real catalog commit has.",
)
def q_sink_pyds(spark, sf_dir):
    import os

    from ..sources.pyds_sink import manifest_sink_datasource, read_manifest_scoped

    spark.dataSource.register(manifest_sink_datasource())
    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 97 == 0)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_returnflag").alias("l_returnflag"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
    )

    def build(out):
        (
            src.write.format("manifest_sink")
            .option("path", out)
            .option("columns", "l_orderkey,l_returnflag,cents")
            .mode("append")
            .save()
        )
        # plant an orphan: a part file no manifest lists (failed-attempt
        # debris). The manifest-scoped read below must not see it.
        with open(os.path.join(out, "data", "part-orphan-0.jsonl"), "w") as fh:
            fh.write('{"l_orderkey": -1, "l_returnflag": "X", "cents": 999}\n')

    out = session_fixture(("mis_pyds_sink", sf_dir), build)
    back = read_manifest_scoped(
        spark, out, "l_orderkey long, l_returnflag string, cents long"
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_stream_pyds_sink",
    family="streaming",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Streaming Python Data Source WRITER round-trip "
    "(`manifest_stream_sink`): the events table streamed through a "
    "registered native stream sink (DataSourceStreamWriter, Spark 4) "
    "that commits ONE ATOMIC MANIFEST PER MICRO-BATCH and skips "
    "replayed batchIds idempotently — exactly-once at the sink-API "
    "level instead of a hand-rolled foreachBatch MERGE (reference "
    "A15/A21). The batch oracle aggregates the source directly, so a "
    "green row proves no micro-batch was lost, duplicated, or torn "
    "across the stream; the id_sum checksum catches silent row "
    "corruption. Stream runs once per session (availableNow + "
    "session_fixture); replay idempotence is separately pinned in "
    "tests/test_pyds_sink.py. Scale: one part file per task per "
    "batch, O(#files) driver JSON per commit — the same cost model "
    "as a catalog commit.",
)
def q_stream_pyds_sink(spark, sf_dir):
    import os

    from ..sources.pyds_sink import (
        manifest_stream_sink_datasource,
        read_stream_manifests,
    )

    def build(out):
        spark.dataSource.register(manifest_stream_sink_datasource())
        src_dir = os.path.join(out, "src")
        sink_dir = os.path.join(out, "sink")
        ckpt = os.path.join(out, "ckpt")
        # file streams need a DIRECTORY source with >1 file for real
        # micro-batching; the fixture tables ship as single files
        ev = t(spark, sf_dir, "events")
        ev.repartition(4).write.mode("overwrite").parquet(src_dir)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
            .select(
                F.col("event_id").cast("long").alias("event_id"),
                F.col("event_type"),
            )
        )
        q = (
            stream.writeStream.format("manifest_stream_sink")
            .option("path", sink_dir)
            .option("columns", "event_id,event_type")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    out = session_fixture(("mis_pyds_stream", sf_dir), build)
    back = read_stream_manifests(
        spark, os.path.join(out, "sink"), "event_id long, event_type string"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("event_id").cast("long").alias("id_sum"),
        )
        .orderBy("event_type")
    )


_CSV_BAD_LINES = 3


@register(
    "q_scan_csv_corrupt",
    family="scans",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST({_CSV_BAD_LINES} AS BIGINT) AS n_corrupt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
    doc="PERMISSIVE corrupt-record quarantine: a CSV landing zone with "
    f"{_CSV_BAD_LINES} malformed lines (wrong arity, unparseable "
    "number, raw garbage) is read with "
    "columnNameOfCorruptRecord — bad lines land WHOLE in the "
    "quarantine column with every data column null instead of failing "
    "the job (FAILFAST) or vanishing (DROPMALFORMED), the ingest "
    "pattern for untrusted feeds: load everything, count and route "
    "the rejects (reference A3's dead-letter semantics at the scan "
    "layer; sync/quarantine.py routes the same way for CDC events). "
    "The oracle recomputes the expected good-row count and key "
    "checksum from the clean source slice plus the planted bad-line "
    "constant, so both the parse and the quarantine split are "
    "hash-pinned. Scale: CSV parsing is per-task streaming; the "
    "corrupt column adds one string per BAD row only. Caveat pinned "
    "by Spark semantics: the corrupt column must be materialized "
    "together with the data columns (cached here), never filtered "
    "alone.",
)
def q_scan_csv_corrupt(spark, sf_dir):
    import os

    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )

    def build(out):
        rows = src.collect()  # bounded slice (1/101 of orders) for a CSV fixture
        path = os.path.join(out, "landing.csv")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(f"{r.o_orderkey},{r.o_orderpriority},{r.o_totalprice}\n")
            fh.write("1,2\n")  # wrong arity
            fh.write("not_a_number,X,1.0\n")  # unparseable key
            fh.write("garbage line with no commas at all ???\n")

    out = session_fixture(("mis_csv_corrupt", sf_dir), build)
    schema = (
        "o_orderkey long, o_orderpriority string, o_totalprice double, "
        "_corrupt string"
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(f"{out}/landing.csv")
        .cache()  # Spark requires referencing corrupt col with data cols
    )
    return df.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_good"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("o_orderkey")))
        .cast("long")
        .alias("key_sum"),
    )


_META_FILES = 4


@register(
    "q_scan_metadata_cols",
    family="scans",
    oracle=f"""
    SELECT CAST({_META_FILES} AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS total_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           TRUE AS files_disjoint
    FROM orders
    """,
    doc="Hidden _metadata columns (_metadata.file_path / row_index): a "
    f"{_META_FILES}-file range-partitioned layout audited FROM THE "
    "SCAN ITSELF — per-file row counts and key ranges grouped on the "
    "file-path virtual column, no manifest or catalog consulted; the "
    "same mechanism q_cdc_pos_delete uses to address rows as (file, "
    "row_index) for Iceberg positional deletes. The query then "
    "verifies the layout contract relationally: file count, total "
    "rows, global key range, and that per-file key ranges are "
    "DISJOINT (bool_and over a self-window — TRUE rides to the "
    "oracle, which recomputes totals from the logical table; a torn "
    "or overlapping layout fails the hash). Scale: _metadata is "
    "generated per split at scan time (no extra I/O); the per-file "
    "rollup is one hash agg keyed on ~#files values. The disjointness "
    "window is unpartitioned BY DESIGN: it runs over the PER-FILE "
    "rollup (one row per data file, ~10^6 rows at 100 TB through one "
    "task for an offline audit), never over data rows; bucketing the "
    "running max by coarse key ranges would distribute it if audits "
    "ever need to be interactive.",
)
def q_scan_metadata_cols(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").select("o_orderkey")

    def build(out):
        o.repartitionByRange(_META_FILES, "o_orderkey").write.mode(
            "overwrite"
        ).parquet(out)

    out = session_fixture(("mis_meta_cols", sf_dir), build)
    back = spark.read.schema("o_orderkey long").parquet(out)
    per_file = (
        back.select("o_orderkey", F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
        )
    )
    # BOUNDED global window: one row per FILE (the layout audit table) —
    # file count is rows/maxRecordsPerFile (SCALE.md §global-windows).
    w = Window.orderBy("lo").rowsBetween(Window.unboundedPreceding, -1)
    audited = per_file.withColumn(
        "disjoint", F.col("lo") > F.coalesce(F.max("hi").over(w), F.lit(-1))
    )
    return audited.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n").cast("long").alias("total_rows"),
        F.min("lo").cast("long").alias("min_key"),
        F.max("hi").cast("long").alias("max_key"),
        F.min(F.col("disjoint").cast("boolean")).alias("files_disjoint"),
    )
