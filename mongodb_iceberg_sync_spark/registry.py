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
    from .operators import mleval  # noqa: F401


# ORDER MATTERS for the driver contract: the correctness sweep runs queries
# in registration order under a 50-query cap, so queries with no green driver
# row yet must come FIRST.
#
# ROUND-START TASK: rotate this list against the latest CORRECTNESS_r{N}.json
# — drop (to the back) every name with a green driver row, promote the
# never-checked tail to the front, keep any FAIL rows first of all.
#
# Round-10 rotation: CORRECTNESS_r09 delivered the r9 window 50/50 green
# (cumulative 427/427 across nine rounds, zero failures). Every r1-r9
# name is driver-stamped, so the r10 window is pure debuts + the
# youngest-stamp rotation: the 50 r10 debuts exactly fill the window (oracle-backed, zero
# new rows-only entries), then the r9 debuts fill the remaining window
# slots for a re-check. All r10 debuts were swept green against the
# DuckDB oracle at sf0.01 in-session (tools/sweep.py) before entering
# the window.
_SWEEP_PRIORITY: tuple[str, ...] = (
    # --- r10 debuts lead the window (every r1-r9 name is driver-checked
    #     as of CORRECTNESS_r09: 427/427 green; each r10 row arrives
    #     checklist-complete: oracle + plan pin + bench entry + 100x
    #     probe + SURVEY row) ---
    # wave 1: the md5-MinHash oracle-checkable twin, the LSH bucket
    # audit, multi-probe IVF (VERDICT r9 task #4 a/b/c)
    "q_dedup_minhash",
    "q_profile_lsh_buckets",
    "q_dedup_semantic_ivf_mp",
    # wave 2: nonparametric k-group inference
    "q_agg_mood_median",
    "q_agg_cochran_q",
    "q_agg_friedman",
    "q_agg_jonckheere",
    "q_agg_cliffs_delta",
    # wave 3: proper scoring rules + retrieval ranking metrics
    "q_ml_log_loss",
    "q_ml_spiegelhalter_z",
    "q_ml_fbeta",
    "q_ml_youden_optimal",
    "q_ml_mrr",
    "q_ml_map",
    # wave 4: timeseries diagnostics (changepoint, random walk,
    # randomness, unit root, stationarity, complexity)
    "q_timeseries_pettitt",
    "q_timeseries_variance_ratio",
    "q_timeseries_turning_points",
    "q_timeseries_dickey_fuller",
    "q_timeseries_kpss",
    "q_timeseries_permutation_entropy",
    # wave 5: corpus richness + graph link-prediction + experiment gate
    "q_text_lexical_richness",
    "q_text_source_vocab_overlap",
    "q_graph_preferential_attachment",
    "q_graph_rich_club",
    "q_events_srm",
    # wave 6: ordinal association + distribution shape + concentration
    "q_agg_gamma_somers",
    "q_agg_qq_table",
    "q_events_lorenz_users",
    # wave 7: CDF-distance inference + robust location + ordered blocks
    # + retrieval hit rate
    "q_agg_cvm_test",
    "q_agg_trimmed_mean",
    "q_timeseries_page_trend",
    "q_ml_topk_accuracy",
    # wave 8: CDF-distance completion + median CI + dedup yield +
    # journey predictability
    "q_agg_kuiper",
    "q_agg_wasserstein",
    "q_agg_median_ci",
    "q_dedup_cluster_sizes",
    "q_events_journey_entropy",
    # wave 9: FWER control + SQL portability
    "q_agg_holm",
    "q_sql_order_all",
    # wave 10: dedup yield curve + corpus sizing panel
    "q_dedup_threshold_curve",
    "q_text_length_profile",
    # wave 11: Hilbert-curve clustering (the locality-preserving zorder)
    "q_sort_hilbert",
    # wave 12: tail-weighted CDF distance + token-level dedup impact
    "q_agg_ad_test",
    "q_text_dedup_impact",
    # wave 13: embedding drift monitor
    "q_embed_centroid_drift",
    # wave 14: EWMA control chart (small-shift SPC)
    "q_timeseries_ewma_control",
    # wave 15: the distributed (Poisson) bootstrap
    "q_sample_poisson_bootstrap",
    # wave 16: Theil between/within decomposition
    "q_agg_theil_decomp",
    # wave 17 (final window slots — 50 debuts exactly fill the sweep
    # window): BY-FDR under dependence + the temperature mixing plan
    "q_agg_benjamini_yekutieli",
    "q_mix_temperature_plan",
    # --- r9 debuts (all driver-checked green in CORRECTNESS_r09) ---
    # wave 1: inferential statistics
    "q_agg_kruskal",
    "q_agg_jarque_bera",
    "q_agg_tukey_hsd",
    "q_agg_hodges_lehmann",
    "q_agg_g_test",
    # wave 2: timeseries diagnostics on the calendar grid
    "q_timeseries_seasonal_mk",
    "q_timeseries_ljung_box",
    "q_timeseries_durbin_watson",
    "q_timeseries_granger",
    "q_timeseries_runs_test",
    # wave 3: experiments + eval + graph
    "q_events_uplift",
    "q_events_bass",
    "q_ml_brier_decomp",
    "q_ml_kappa",
    "q_graph_reciprocity",
    # wave 4: ANN/dedup backlog (VERDICT r8 task #5)
    "q_dedup_semantic_ivf",
    "q_sim_rerank_ce",
    # wave 5: covariate adjustment + intervals + cycles + meta-analysis
    "q_agg_ancova",
    "q_agg_wilson_ci",
    "q_agg_dunn",
    "q_timeseries_periodogram",
    "q_events_meta_i2",
    # wave 6: stratified association + levels cointegration + corpus
    # diversity + population estimation + link analysis
    "q_agg_cmh_test",
    "q_timeseries_cointegration",
    "q_text_self_bleu",
    "q_agg_capture_recapture",
    "q_graph_hits",
    # wave 7: embedding ablation + assumption-free inference + fairness
    # error-rate parity + data-sufficiency coverage
    "q_embed_matryoshka",
    "q_agg_permutation_test",
    "q_ml_equalized_odds",
    "q_text_ngram_coverage",
    # wave 8: target-matched data selection + media dedup clusters
    "q_mix_dsir",
    "q_multimodal_dup_clusters",
    # wave 9: process control + experiment sizing
    "q_timeseries_spc_control",
    "q_events_power_analysis",
    # --- r8 window (all driver-checked green in CORRECTNESS_r08) ---
    "q_events_heatmap_dow_hour",
    "q_sim_cos_histogram",
    "q_profile_join_skew",
    "q_timeseries_wow",
    # --- r8 debuts (window slots 5..), checklist-complete on arrival ---
    # (registered below as they land; each carries oracle-or-pin + plan
    #  pin + bench entry + 100x probe + SURVEY row on arrival)
    # wave 1: TPC-H completion — all 22 classic queries now present
    # (Q2/Q9/Q11/Q16/Q20 adapted: part↔supplier catalog derived from
    #  lineitem; the fixture ships no partsupp)
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    # wave 2: inferential statistics (one-pass sufficient stats +
    # quantized cross-group terms)
    "q_agg_anova",
    "q_agg_levene_bf",
    "q_agg_fisher_exact",
    "q_agg_jackknife",
    "q_agg_hellinger",
    "q_timeseries_mann_kendall",
    # wave 3: windowed momentum/volatility + pipeline assignment ops
    "q_timeseries_bollinger",
    "q_timeseries_rsi",
    "q_multimodal_aspect_bucket",
    "q_sample_kfold",
    "q_graph_jaccard",
    # wave 4: LLM-pipeline quality + SQL-portability surface
    "q_dedup_softdedup",
    "q_sim_recall_at_k",
    "q_sql_groupby_all",
    "q_sql_distinct_on",
    "q_events_cuped",
    # wave 5: multiple-testing + sequential inference + coverage audits
    "q_agg_bh_fdr",
    "q_events_sequential_msprt",
    "q_profile_freshness",
    "q_profile_eval_slices",
    # wave 6: in-lake ML + long-memory diagnostics
    "q_ml_naive_bayes",
    "q_timeseries_hurst",
    "q_ml_silhouette",
    # wave 7: calibration weighting + tail risk + partition quality
    "q_agg_raking",
    "q_agg_expected_shortfall",
    "q_graph_modularity",
    "q_sample_importance",
    "q_text_fertility",
    # wave 8: changepoint localization + extreme values + AUC error bars
    "q_timeseries_changepoint",
    "q_timeseries_extreme_value",
    "q_ml_bootstrap_auc_ci",
    # wave 9: equivalence/confound/decision-theory inference
    "q_agg_tost_equivalence",
    "q_agg_partial_corr",
    "q_timeseries_stl_strength",
    "q_ml_threshold_cost",
    "q_events_propensity_strata",
    # wave 10: metric decomposition + pricing
    "q_timeseries_contribution",
    "q_agg_elasticity",
    # wave 11 (final 3 — window closes at exactly 50): paired test,
    # calibration scalars, diversity profile
    "q_agg_mcnemar",
    "q_ml_ece",
    "q_agg_diversity_hill",
    # --- driver-checked r7 (all green) — rotated behind the debuts ---
    "q_events_interpurchase",
    "q_join_nn_1d",
    "q_text_burstiness",
    "q_timeseries_interval_union",
    "q_agg_hll_union",
    "q_sql_pivot",
    "q_events_abandonment",
    "q_timeseries_dow_index",
    "q_agg_grouping_id",
    "q_events_velocity",
    "q_scan_metadata_cols",
    "q_sample_weighted",
    "q_text_heaps_law",
    "q_join_runtime_bloom",
    "q_agg_cohens_d",
    "q_agg_odds_ratio",
    "q_events_tte_labels",
    "q_ml_pr_curve",
    "q_ml_brier",
    "q_ml_regression_metrics",
    "q_dedup_url",
    "q_text_suffix_dup",
    "q_sim_rerank",
    "q_graph_labelprop",
    "q_text_winnowing",
    "q_sample_coreset",
    "q_text_entropy",
    "q_agg_hdr_histogram",
    "q_sql_unpivot",
    "q_timeseries_holt",
    "q_agg_spearman",
    "q_agg_kendall",
    "q_agg_mutual_info",
    "q_agg_gmean",
    "q_timeseries_theilsen",
    "q_timeseries_sma_crossover",
    "q_window_peak_detect",
    "q_ml_mcc",
    "q_ml_group_fairness",
    "q_graph_clustering_coeff",
    "q_text_novelty",
    "q_text_mattr",
    "q_sql_qualify",
    "q_embed_anisotropy",
    "q_agg_ols_multi",
    "q_stream_late_audit",
    "q_embed_outliers",
    "q_ml_auc_by_group",
    "q_graph_summary",
    "q_events_new_vs_returning",
    # --- driver-checked r6 (all green) — rotated behind the debuts ---
    "q_cdc_pos_delete",
    "q_corpus_datacard",
    "q_text_bpe_encode",
    "q_agg_countmin",
    "q_text_substring_dup",
    "q_json_shred",
    "q_events_funnel_timed",
    "q_cdc_merge_into",
    "q_cdc_wap_publish",
    "q_ml_logreg",
    "q_graph_degree_dist",
    "q_udf_map_arrow",
    "q_set_bag_ops",
    "q_cdc_eq_delete",
    "q_cdc_stats_skipping",
    "q_agg_countmin_fast",
    "q_events_conversion_ci",
    "q_graph_adamic_adar",
    "q_graph_kcore",
    "q_ml_auc",
    "q_ml_confusion",
    "q_ml_calibration",
    "q_ml_psi",
    "q_agg_cramers_v",
    "q_ml_ks_separation",
    "q_ml_lift",
    "q_text_jsd_drift",
    "q_ml_ndcg",
    "q_events_stickiness",
    "q_window_alert_debounce",
    "q_text_source_hhi",
    "q_text_keywords",
    "q_agg_tail_ratio",
    "q_mix_dedup_priority",
    "q_events_concurrency",
    "q_window_pareto",
    "q_ml_centroid_classify",
    "q_sink_pyds",
    "q_stream_pyds_sink",
    "q_json_variant",
    "q_sql_scripting",
    "q_agg_mad_outliers",
    "q_agg_winsorized",
    "q_scan_csv_corrupt",
    "q_graph_assortativity",
    "q_events_error_budget",
    "q_sample_neyman",
    "q_events_power",
    "q_agg_theil",
    "q_udtf_polymorphic",
    # --- driver-checked r1-r5 (all green) — rotated to the back ---
    "q_tpch_q18",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q22",
    "q_tpch_q8",
    "q_tpch_q7",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q21",
    "q_profile_columns_sketch",
    "q_join_bucketed",
    "q_sample_balanced",
    "q_events_sessionize",
    "q_agg_percentile_sketch",
    "q_mix_token_budget",
    "q_events_ab_assign",
    "q_sim_range_search",
    "q_multimodal_shard_pack",
    "q_join_asof_tolerance",
    "q_text_bpe_pairs",
    "q_text_feature_hash",
    "q_sample_entity",
    "q_events_decay",
    "q_timeseries_backtest",
    "q_events_did",
    "q_timeseries_cusum",
    "q_timeseries_seasonal",
    "q_events_pathing",
    "q_timeseries_autocorr",
    "q_scan_pyds",
    "q_agg_moments",
    "q_join_asof_nearest",
    "q_sql_lateral",
    "q_cdc_store_meta",
    "q_cdc_compact_meta",
    "q_cdc_branch_diff",
    "q_embed_pca",
    "q_sim_maxsim",
    "q_dedup_semantic",
    "q_graph_components",
    "q_graph_common_neighbors",
    "q_text_scrub_chunks",
    "q_mix_epochs",
    "q_agg_covar_matrix",
    "q_agg_basket_lift",
    "q_events_sequence_match",
    "q_text_readability",
    "q_window_regr_slope",
    "q_window_running_distinct",
    "q_window_rolling_features",
    "q_window_drawdown",
    "q_sample_systematic",
    "q_text_inverted_index",
    "q_text_bm25",
    "q_text_collocations",
    "q_text_zipf",
    "q_text_compress_ratio",
    "q_sample_reservoir",
    "q_timeseries_ewma",
    "q_events_attribution",
    "q_events_survival",
    "q_events_rfm",
    "q_events_cohort_ltv",
    "q_sink_sorted_files",
    "q_scan_dpp",
    "q_agg_weighted_median",
    "q_agg_entropy",
    "q_agg_ttest",
    "q_agg_gini",
    "q_agg_benford",
    "q_agg_ols",
    "q_agg_chisq",
    "q_agg_mannwhitney",
    "q_agg_ks_test",
    "q_profile_columns",
    "q_agg_bootstrap",
    "q_join_interval_overlap",
    "q_sql_window_cte",
    "q_sql_recursive",
    "q_join_asof_forward",
    "q_cdc_ivm_join",
    "q_multimodal_phash",
    "q_graph_triangles",
    "q_graph_bfs",
    "q_sample_temperature",
    "q_agg_heavy_hitters",
    "q_shuffle_train",
    "q_agg_heavy_hitters_sketch",
    "q_sample_priority",
    "q_mix_domains",
    "q_text_chunk_rag",
    "q_embed_quantize",
    "q_curriculum_order",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_tpch_q14",
    "q_tpch_q19",
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
