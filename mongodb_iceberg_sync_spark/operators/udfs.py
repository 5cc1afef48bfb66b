"""UDF / UDAF / UDTF surface (SURVEY.md §2B).

Demonstrates the three Python extension points the engine supports —
always Arrow-batched (pandas_udf / applyInPandas / Spark-4 UDTF), never
row-at-a-time Python UDFs: at 100 TB the 10-100× Arrow batching win is
the difference between feasible and not. Built-ins remain the first
choice (see scalar_funcs); these exist for logic Spark can't express.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ._util import t


def _tok_count_udf():
    # created lazily: pandas_udf needs an active SparkSession to parse
    # its DDL return type
    @pandas_udf("long")
    def tok_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").map(len).astype("int64")

    return tok_count


@register(
    "q_udf_scalar",
    family="udfs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS udf_tokens,
           lang
    FROM documents
    """,
    doc="Vectorized scalar pandas_udf (Arrow batches): token count per "
    "doc. The oracle proves the UDF agrees with the SQL equivalent.",
)
def q_udf_scalar(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", _tok_count_udf()("text").alias("udf_tokens"), "lang")


@register(
    "q_udaf_grouped",
    family="udfs",
    oracle="""
    SELECT c_nationkey,
           round(sum(c_acctbal * (c_custkey % 10 + 1))
                 / sum(c_custkey % 10 + 1), 6) AS weighted_bal,
           count(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Grouped custom aggregation via applyInPandas: weighted mean "
    "account balance (weight = custkey%10+1). Rounded: pandas uses "
    "pairwise summation vs SQL's sequential.",
)
def q_udaf_grouped(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_nationkey", "c_custkey", "c_acctbal")

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        w = (pdf["c_custkey"] % 10 + 1).astype("float64")
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "weighted_bal": [round((pdf["c_acctbal"] * w).sum() / w.sum(), 6)],
                "n": [len(pdf)],
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        weighted, "c_nationkey int, weighted_bal double, n bigint"
    )


@register(
    "q_udtf_explode",
    family="udfs",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
    doc="Python UDTF (Spark 4 table function, 1 row → N rows): tokenize "
    "docs via LATERAL join. Falls back to explode() if the UDTF API is "
    "unavailable (same contract either way).",
)
def q_udtf_explode(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="token string")
        class SplitTokens:
            def eval(self, text: str):
                for tok in (text or "").split(" "):
                    yield (tok,)

        spark.udtf.register("mis_split_tokens", SplitTokens)
        d.createOrReplaceTempView("mis_udtf_docs")
        return spark.sql(
            """
            SELECT t.doc_id, s.token
            FROM mis_udtf_docs t, LATERAL mis_split_tokens(t.text) s
            """
        )
    except Exception:
        return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register(
    "q_udf_map_arrow",
    family="udfs",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="mapInArrow — the fourth and fastest rung of the Python "
    "extension ladder (after pandas_udf / applyInPandas / UDTF): the "
    "transform receives raw pyarrow RecordBatches with NO pandas "
    "conversion on either side, so per-batch overhead is pure Arrow "
    "compute (here: cents quantization via pyarrow.compute on the "
    "zero-copy column). The aggregation after it is plain codegen, "
    "and the oracle checks the Arrow kernel's arithmetic exactly — "
    "values are cents-quantized so round() ties cannot occur and "
    "Arrow's default rounding agrees with both engines. Scale: "
    "map-only over batches, pipeline-parallel with the scan; the "
    "pattern to reach for when a 100 TB pass needs Python but "
    "pandas materialization would double the memory.",
)
def q_udf_map_arrow(spark, sf_dir):
    e = t(spark, sf_dir, "events").select("event_type", "value")

    def cents_kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(
                        pc.round(pc.multiply(batch.column(1), 100.0)),
                        pa.int64(),
                    ),
                ],
                names=["event_type", "cents"],
            )

    mapped = e.mapInArrow(cents_kernel, "event_type string, cents long")
    return (
        mapped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "q_udtf_polymorphic",
    family="udfs",
    oracle="""
    WITH mx AS (SELECT max(length(text)) AS m FROM documents),
    pos AS (SELECT unnest(range(1, (SELECT m FROM mx))) AS i),
    grams AS (
      SELECT d.doc_id, substr(d.text, pos.i::INTEGER, 3) AS gram_3
      FROM documents d JOIN pos ON pos.i <= length(d.text) - 2
      WHERE d.doc_id < 50
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(DISTINCT gram_3) AS BIGINT) AS n_distinct
    FROM grams GROUP BY doc_id ORDER BY doc_id
    """,
    doc="POLYMORPHIC Python UDTF (Spark 4 `analyze` static method): the "
    "table function's output schema is computed at PLAN time from its "
    "literal argument — mis_char_ngrams(text, 3) returns a column "
    "named gram_3, mis_char_ngrams(text, 5) would return gram_5 — the "
    "dynamic-schema contract that lets one UDTF serve a family of "
    "shapes (Spark's own read_files/variant_explode helpers use the "
    "same mechanism). eval() slides a character window; the relational "
    "layer does all counting (the UDTF only EMITS — no per-partition "
    "state, so results are partitioning-independent). Oracle replays "
    "the window with substr over a position range. Falls back to a "
    "substring explode when the UDTF API is unavailable. Scale: "
    "row-local generation pipelined with the scan; the distinct/count "
    "aggregation is the only shuffle.",
)
def q_udtf_polymorphic(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    n = 3
    try:
        from pyspark.sql.functions import udtf
        from pyspark.sql.types import IntegerType, StringType, StructType

        @udtf
        class CharNgrams:
            @staticmethod
            def analyze(text, n_arg):
                # plan-time schema from the literal width argument
                width = int(n_arg.value)
                from pyspark.sql.udtf import AnalyzeResult

                return AnalyzeResult(
                    StructType().add(f"gram_{width}", StringType())
                )

            def eval(self, text: str, n_arg: int):
                s = text or ""
                for i in range(max(len(s) - n_arg + 1, 0)):
                    yield (s[i : i + n_arg],)

        spark.udtf.register("mis_char_ngrams", CharNgrams)
        d.createOrReplaceTempView("mis_udtf_poly_docs")
        grams = spark.sql(
            f"""
            SELECT t.doc_id, s.gram_{n}
            FROM mis_udtf_poly_docs t,
                 LATERAL mis_char_ngrams(t.text, {n}) s
            """
        )
    except Exception:
        grams = (
            d.select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.length("text") - n + 1)
                ).alias("i"),
                "text",
            )
            .select("doc_id", F.expr(f"substring(text, i, {n})").alias(f"gram_{n}"))
        )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.countDistinct(f"gram_{n}").cast("long").alias("n_distinct"),
        )
        .orderBy("doc_id")
    )
