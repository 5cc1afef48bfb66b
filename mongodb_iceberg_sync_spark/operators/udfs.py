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
