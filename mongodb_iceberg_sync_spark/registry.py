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
  - NEVER re-round an exact decimal sum to FEWER digits: Spark rounds
    doubles via the shortest decimal repr with HALF_UP while DuckDB
    rounds the binary value (half-even-ish), so a value whose shortest
    repr ends in ...5 at the target digit diverges (bit
    q_events_attribution: 5.70025 → 5.7003 vs 5.7002). Rounding an
    exact DECIMAL(p,s) to d >= s digits is identity and safe; rounding
    a float DIVISION result is near-safe (ties are measure-zero) but
    rounding an exact decimal to d < s is a loaded gun — just cast the
    exact decimal to double and compare unrounded.
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
    from .operators import graph  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import mixture  # noqa: F401
    from .operators import tpch  # noqa: F401


# ORDER MATTERS for the driver contract: the correctness sweep runs queries
# in registration order under a 50-query cap, so queries with no green driver
# row yet must come FIRST.
#
# ROUND-START TASK: rotate this list against the latest CORRECTNESS_r{N}.json
# — drop (to the back) every name with a green driver row, promote the
# never-checked tail to the front, keep any FAIL rows first of all.
#
# Two buckets:
#   1. the two round-1 hash-fails (decimal-sum fix committed round 2, never
#      re-swept by the driver),
#   2. the 20 round-2 additions that neither sweep reached.
# Everything else follows in module order (all driver-green in r1/r2).
_SWEEP_PRIORITY: tuple[str, ...] = (
    # stale r1 FAIL, fix committed — must be re-verified first
    "q_join_theta_range",
    "q_join_range_banded",
    # round-2 additions never reached by a driver sweep
    "q_agg_pivot",
    "q_agg_percentile",
    "q_agg_hll",
    "q_agg_unpivot",
    "q_agg_salted",
    "q_agg_corr",
    "q_agg_collect",
    "q_cdc_scd2",
    "q_cdc_time_travel",
    "q_cdc_changefeed",
    "q_join_salted",
    "q_dedup_clusters",
    "q_dedup_incremental",
    "q_sim_ann_lsh",
    "q_sim_knn_join",
    "q_sim_pq",
    "q_cluster_kmeans",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_scan_orc",
    # round-3 additions (never driver-checked yet)
    "q_text_decontaminate",
    "q_text_repetition",
    "q_agg_histogram",
    "q_timeseries_interp",
    "q_events_retention",
    "q_scan_text",
    "q_scan_binaryfile",
    "q_text_pii_redact",
    "q_timeseries_ohlc",
    "q_sql_correlated",
    "q_window_islands",
    "q_events_anomaly",
    "q_text_lm_score",
    "q_agg_mode",
    "q_graph_pagerank",
    "q_dedup_bloom",
    "q_sim_spatial_join",
    "q_cdc_ivm_agg",
    "q_text_containment",
    "q_events_markov",
    "q_join_scd2_asof",
    "q_scan_schema_merge",
    "q_text_normalize",
    "q_join_null_safe",
    "q_multimodal_dedup",
    "q_sort_global_rank",
    "q_stream_ivm",
    # round-3 late additions — whatever the 50-query cap doesn't reach
    # this round rides the front of the r4 sweep
    "q_dedup_chunks",
    "q_sample_temperature",
    "q_agg_heavy_hitters",
    "q_shuffle_train",
    "q_join_interval_overlap",
    "q_sql_window_cte",
    "q_agg_heavy_hitters_sketch",
    "q_sample_priority",
    "q_mix_domains",
    "q_text_chunk_rag",
    "q_embed_quantize",
    "q_curriculum_order",
    # round-3 session-2 additions
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_text_inverted_index",
    "q_sample_reservoir",
    "q_timeseries_ewma",
    "q_agg_weighted_median",
    "q_graph_triangles",
    "q_text_bm25",
    "q_agg_entropy",
    "q_window_running_distinct",
    "q_sql_recursive",
    "q_events_attribution",
    "q_agg_ttest",
    "q_multimodal_phash",
    "q_window_rolling_features",
    "q_tpch_q14",
    "q_tpch_q19",
    "q_tpch_q18",
    "q_text_collocations",
    "q_agg_gini",
    "q_agg_benford",
    "q_agg_ols",
    "q_text_zipf",
    "q_text_compress_ratio",
    "q_join_asof_forward",
    "q_agg_chisq",
    "q_window_drawdown",
    "q_agg_mannwhitney",
    "q_agg_ks_test",
    "q_sample_systematic",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q22",
    "q_tpch_q8",
    "q_tpch_q7",
    "q_events_survival",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q21",
    "q_profile_columns",
    "q_cdc_ivm_join",
    "q_agg_bootstrap",
    "q_graph_bfs",
    "q_sink_sorted_files",
    "q_scan_dpp",
    "q_events_rfm",
    "q_events_cohort_ltv",
)


def all_specs() -> dict[str, QuerySpec]:
    _load_all_operator_modules()
    ordered: dict[str, QuerySpec] = {}
    for name in _SWEEP_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.func for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
