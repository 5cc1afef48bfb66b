"""Physical-plan assertions — the "is this the plan I'd want at 100 TB"
checks (tests/test_plans.py uses these; SURVEY.md optimization goals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(c.split(":")[0].strip() for c in inner.split(",") if c)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Unique Exchange nodes (the formatted output names each node once
    in the tree and once in the details section — count node ids)."""
    import re

    plan = formatted_plan(df)
    return len(set(re.findall(r"^\((\d+)\) (?:Broadcast)?Exchange", plan, re.M)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
