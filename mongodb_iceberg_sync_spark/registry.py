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
    #
    # ORDER MATTERS for the driver contract: the correctness sweep runs
    # queries in registration order under a time budget, so modules the
    # round-1 sweep never reached (windows, sorts_sets, text, udfs,
    # stream_batch_equiv) register FIRST; the round-1-verified families
    # come after. Keep cheap/plan-only families early, the real-
    # StreamingQuery and heavy dedup families last.
    from .operators import windows  # noqa: F401
    from .operators import sorts_sets  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import sampling  # noqa: F401
    from .operators import pipeline  # noqa: F401
    from .operators import udfs  # noqa: F401
    from .operators import stream_batch_equiv  # noqa: F401
    from .operators import scans  # noqa: F401
    from .operators import scalar_funcs  # noqa: F401
    from .operators import aggregates  # noqa: F401
    from .operators import joins  # noqa: F401
    from .operators import cdc  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import dedup  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all_operator_modules()
    return dict(REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.func for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
