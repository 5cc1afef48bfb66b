"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship TPC-H-Q1-style aggregation on sf0.001.
queries()      — every implemented operator from SURVEY.md §2 (registry).
oracle_sql()   — matching DuckDB SQL for the differential correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongodb_iceberg_sync_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mongodb_iceberg_sync_spark.operators.aggregates import q_agg_groupby

    return q_agg_groupby(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-checkable query."""
    return _registry.oracle_sql()
