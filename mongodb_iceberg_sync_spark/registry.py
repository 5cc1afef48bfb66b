"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 Part B registers here with:
  - a pure function (spark, sf_dir) -> DataFrame (the Spark-first impl)
  - optionally, the equivalent ANSI SQL for the DuckDB oracle

Determinism rules (so the driver's order-insensitive value-hash matches):
  - alias every computed column identically on both sides
  - round every float AGGREGATE (summation order differs between engines);
    raw per-row float arithmetic is bitwise-identical and needs no rounding
  - any LIMIT/top-k carries a total order (unique tie-break key)
  - cast DuckDB's HUGEINT sums to BIGINT
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    func: QueryFn
    oracle: str | None  # None → driver records rows-only check
    family: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, family: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering an operator query under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, func=fn, oracle=oracle, family=family, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all_operator_modules() -> None:
    # Import for side effect: each module registers its queries.
    from .operators import (  # noqa: F401
        aggregates,
        cdc,
        dedup,
        joins,
        multimodal,
        scalar_funcs,
        scans,
        similarity,
        sorts_sets,
        stream_batch_equiv,
        text,
        udfs,
        windows,
    )


def all_specs() -> dict[str, QuerySpec]:
    _load_all_operator_modules()
    return dict(REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.func for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
