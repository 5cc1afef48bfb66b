"""Loaders for the driver-generated test tables (TESTDATA.md).

Each loader returns a plain DataFrame scan so Catalyst predicate pushdown
and column pruning reach the parquet reader untouched. The only
massaging is `events.ts`: stored as parquet INT64 TIMESTAMP(NANOS),
which Spark 4 cannot read natively — we read it as a raw long
(`spark.sql.legacy.parquet.nanosAsLong`) and integer-divide to µs,
matching DuckDB's own ns→µs truncation so both engines see identical
timestamps (verified: floor division, not rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts ns→µs TimestampNTZ."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            # INT64 TIMESTAMP(NANOS) layout: ts div 1000 keeps integer
            # precision (ns ≈ 1.7e18 overflows the 53-bit double mantissa,
            # so `/` would corrupt the low digits).
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif not ts_type.startswith("timestamp_ntz"):
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
