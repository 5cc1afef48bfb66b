"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE compact JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {slowest-10},
 "n_queries": N, "queries_full": "BENCH_local.json", "sf": ...,
 "canary": {query, start_sec, middle_sec, end_sec, spread}}
and writes the full per-query timing map to BENCH_local.json (the single
line must stay small enough for the round driver's output capture).

The canary block makes capture drift self-adjudicating: the same cheap
query is timed solo at capture start/middle/end; a spread past ~1.3x
marks the whole capture co-tenant-skewed (identical code + plan measured
three times — the only variable is ambient machine load). Read the
PROFILE, not just the spread: monotone decreasing start>middle>end is
residual session warm-up (discount the start point); a spike at middle
or end is genuine co-tenancy inside the capture window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.session import get_spark

HEADLINE = [
    "q_agg_groupby",
    "q_join_shuffle",
    "q_join_multiway",
    "q_join_asof",
    "q_join_range_banded",
    "q_window_running",
    "q_topk_per_group",
    "q_cdc_latest",
    "q_sync_automap",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_ngram_jaccard",
    "q_sim_topk",
    "q_text_tokenize",
    "q_agg_pivot",
    "q_events_funnel",
    "q_pack_tokens",
    "q_stream_stream_join",
    "q_sim_ann_lsh",
    # round-3 additions
    "q_text_pii_redact",
    "q_timeseries_ohlc",
    "q_window_islands",
    "q_sql_correlated",
    "q_events_anomaly",
    "q_text_lm_score",
    "q_sim_spatial_join",
    "q_multimodal_dedup",
    "q_cdc_ivm_agg",
    "q_events_markov",
    "q_join_scd2_asof",
    # round-3 session-2 additions
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_text_inverted_index",
    "q_timeseries_ewma",
    "q_tpch_q18",
    "q_text_collocations",
    # round-3 session-3 additions
    "q_tpch_q13",
    "q_cdc_ivm_join",
    "q_agg_bootstrap",
    "q_scan_dpp",
    "q_events_cohort_ltv",
    # round-4 additions
    "q_join_bucketed",
    "q_events_sessionize",
    "q_profile_columns_sketch",
    "q_agg_percentile_sketch",
    "q_sample_balanced",
    "q_mix_token_budget",
    "q_events_ab_assign",
    "q_dedup_clusters",
    # round-4 session-2 additions
    "q_graph_components",
    "q_join_asof_nearest",
    "q_events_decay",
    "q_text_bpe_pairs",
    "q_embed_pca",
    "q_timeseries_backtest",
    "q_text_feature_hash",
    "q_events_did",
    "q_graph_common_neighbors",
    "q_text_scrub_chunks",
    "q_dedup_semantic",
    "q_sim_maxsim",
    "q_mix_epochs",
    "q_timeseries_cusum",
    "q_timeseries_seasonal",
    "q_agg_moments",
    "q_events_pathing",
    "q_timeseries_autocorr",
    # round-4 session-4 additions
    "q_agg_covar_matrix",
    "q_agg_basket_lift",
    "q_events_sequence_match",
    "q_text_readability",
    "q_window_regr_slope",
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
    "q_ml_psi",
    "q_ml_lift",
    "q_text_jsd_drift",
    "q_ml_ndcg",
    "q_events_stickiness",
    "q_text_keywords",
    "q_events_concurrency",
    "q_window_pareto",
    "q_ml_centroid_classify",
    "q_sink_pyds",
    "q_stream_pyds_sink",
    "q_json_variant",
    "q_sql_scripting",
    "q_agg_mad_outliers",
    "q_graph_assortativity",
    "q_sample_neyman",
    "q_agg_theil",
    "q_udtf_polymorphic",
    "q_join_nn_1d",
    "q_text_burstiness",
    "q_timeseries_interval_union",
    "q_agg_hll_union",
    "q_events_abandonment",
    "q_events_velocity",
    "q_text_heaps_law",
    "q_join_runtime_bloom",
    "q_agg_cohens_d",
    "q_events_tte_labels",
    "q_ml_pr_curve",
    # round-5 additions
    "q_ml_regression_metrics",
    "q_dedup_url",
    # round-7 debuts
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
    "q_events_heatmap_dow_hour",
    "q_sim_cos_histogram",
    "q_profile_join_skew",
    "q_timeseries_wow",
    # round-8 debuts (wave 1: TPC-H completion — all 22 now present)
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    # round-8 debuts (wave 2: inferential statistics)
    "q_agg_anova",
    "q_agg_levene_bf",
    "q_agg_fisher_exact",
    "q_agg_jackknife",
    "q_agg_hellinger",
    "q_timeseries_mann_kendall",
    # round-8 debuts (wave 3: momentum/volatility + assignment ops)
    "q_timeseries_bollinger",
    "q_timeseries_rsi",
    "q_multimodal_aspect_bucket",
    "q_sample_kfold",
    "q_graph_jaccard",
    # round-8 debuts (wave 4: pipeline quality + SQL portability)
    "q_dedup_softdedup",
    "q_sim_recall_at_k",
    "q_sql_groupby_all",
    "q_sql_distinct_on",
    "q_events_cuped",
    # round-8 debuts (wave 5: sequential inference + audits)
    "q_agg_bh_fdr",
    "q_events_sequential_msprt",
    "q_profile_freshness",
    "q_profile_eval_slices",
    # round-8 debuts (wave 6: in-lake ML + long-memory diagnostics)
    "q_ml_naive_bayes",
    "q_timeseries_hurst",
    "q_ml_silhouette",
    # round-8 debuts (wave 7: calibration + tail risk + partition quality)
    "q_agg_raking",
    "q_agg_expected_shortfall",
    "q_graph_modularity",
    "q_sample_importance",
    "q_text_fertility",
    # round-8 debuts (wave 8: changepoints + extremes + AUC error bars)
    "q_timeseries_changepoint",
    "q_timeseries_extreme_value",
    "q_ml_bootstrap_auc_ci",
    # round-8 debuts (wave 9: equivalence/confound/decision inference)
    "q_agg_tost_equivalence",
    "q_agg_partial_corr",
    "q_timeseries_stl_strength",
    "q_ml_threshold_cost",
    "q_events_propensity_strata",
    # round-8 debuts (wave 10: metric decomposition + pricing)
    "q_timeseries_contribution",
    "q_agg_elasticity",
    # round-8 debuts (wave 11: paired test + calibration + diversity)
    "q_agg_mcnemar",
    "q_ml_ece",
    "q_agg_diversity_hill",
    # round-9 debuts (wave 1: inferential statistics)
    "q_agg_kruskal",
    "q_agg_jarque_bera",
    "q_agg_tukey_hsd",
    "q_agg_hodges_lehmann",
    "q_agg_g_test",
    # round-9 debuts (wave 2: timeseries diagnostics)
    "q_timeseries_seasonal_mk",
    "q_timeseries_ljung_box",
    "q_timeseries_durbin_watson",
    "q_timeseries_granger",
    "q_timeseries_runs_test",
    # round-9 debuts (wave 3: experiments + eval + graph)
    "q_events_uplift",
    "q_events_bass",
    "q_ml_brier_decomp",
    "q_ml_kappa",
    "q_graph_reciprocity",
    # round-9 debuts (wave 4: ANN/dedup backlog)
    "q_dedup_semantic_ivf",
    "q_sim_rerank_ce",
    # round-9 debuts (wave 5: covariate adjustment + intervals + cycles)
    "q_agg_ancova",
    "q_agg_wilson_ci",
    "q_agg_dunn",
    "q_timeseries_periodogram",
    "q_events_meta_i2",
    # round-9 debuts (wave 6: stratified association + levels + diversity)
    "q_agg_cmh_test",
    "q_timeseries_cointegration",
    "q_text_self_bleu",
    "q_agg_capture_recapture",
    "q_graph_hits",
    # round-9 debuts (wave 7: MRL ablation + permutation + fairness)
    "q_embed_matryoshka",
    "q_agg_permutation_test",
    "q_ml_equalized_odds",
    "q_text_ngram_coverage",
    # round-9 debuts (wave 8: DSIR selection + media dedup clusters)
    "q_mix_dsir",
    "q_multimodal_dup_clusters",
    # round-9 debuts (wave 9: process control + experiment sizing)
    "q_timeseries_spc_control",
    "q_events_power_analysis",
    # round-10 debuts (wave 1: oracle-checkable MinHash + LSH audit +
    # multi-probe IVF)
    "q_dedup_minhash",
    "q_profile_lsh_buckets",
    "q_dedup_semantic_ivf_mp",
    # round-10 debuts (wave 2: nonparametric k-group inference)
    "q_agg_mood_median",
    "q_agg_cochran_q",
    "q_agg_friedman",
    "q_agg_jonckheere",
    "q_agg_cliffs_delta",
    # round-10 debuts (wave 3: scoring rules + retrieval ranking)
    "q_ml_log_loss",
    "q_ml_spiegelhalter_z",
    "q_ml_fbeta",
    "q_ml_youden_optimal",
    "q_ml_mrr",
    "q_ml_map",
    # round-10 debuts (wave 4: timeseries diagnostics)
    "q_timeseries_pettitt",
    "q_timeseries_variance_ratio",
    "q_timeseries_turning_points",
    "q_timeseries_dickey_fuller",
    "q_timeseries_kpss",
    "q_timeseries_permutation_entropy",
    # round-10 debuts (wave 5: corpus richness + link prediction + SRM)
    "q_text_lexical_richness",
    "q_text_source_vocab_overlap",
    "q_graph_preferential_attachment",
    "q_graph_rich_club",
    "q_events_srm",
    # round-10 debuts (wave 6: ordinal association + shape + concentration)
    "q_agg_gamma_somers",
    "q_agg_qq_table",
    "q_events_lorenz_users",
    # round-10 debuts (wave 7: CDF distance + robust location + ordered
    # blocks + retrieval hit rate)
    "q_agg_cvm_test",
    "q_agg_trimmed_mean",
    "q_timeseries_page_trend",
    "q_ml_topk_accuracy",
    # round-10 debuts (wave 8: CDF distances + median CI + dedup yield +
    # journey predictability)
    "q_agg_kuiper",
    "q_agg_wasserstein",
    "q_agg_median_ci",
    "q_dedup_cluster_sizes",
    "q_events_journey_entropy",
    # round-10 debuts (wave 9: FWER control + SQL portability)
    "q_agg_holm",
    "q_sql_order_all",
    # round-10 debuts (wave 10: dedup yield curve + corpus sizing)
    "q_dedup_threshold_curve",
    "q_text_length_profile",
    # round-10 debuts (wave 11: Hilbert clustering)
    "q_sort_hilbert",
    # round-10 debuts (wave 12: tail-weighted CDF distance + dedup tokens)
    "q_agg_ad_test",
    "q_text_dedup_impact",
    # round-10 debuts (wave 13: embedding drift monitor)
    "q_embed_centroid_drift",
    # round-10 debuts (wave 14: EWMA control chart)
    "q_timeseries_ewma_control",
    # round-10 debuts (wave 15: the distributed Poisson bootstrap)
    "q_sample_poisson_bootstrap",
    # round-10 debuts (wave 16: Theil decomposition)
    "q_agg_theil_decomp",
    # round-10 debuts (wave 17: BY-FDR + temperature mixing plan)
    "q_agg_benjamini_yekutieli",
    "q_mix_temperature_plan",
]


def compact_payloads(
    timings: dict[str, float],
    sf,
    canary: dict | None = None,
    spreads: dict[str, float] | None = None,
) -> tuple[dict, dict]:
    """(single-line payload, sidecar payload). The single line must stay
    SMALL whatever the query count — r4's full per-query map overflowed
    the round driver's output capture (BENCH parsed null); pinned by
    tests/test_bench_output.py. ``spreads`` (r12, sidecar-only) records
    each query's max/min ratio over its repeats so a co-tenant spike on
    one query self-adjudicates per query instead of per capture."""
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
    }
    if spreads is not None:
        full["query_spreads"] = spreads
    line = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "queries_full": "BENCH_local.json",
        "sf": sf,
    }
    if canary is not None:
        full["canary"] = canary
        line["canary"] = canary
    return line, full


def _run_once(spark, specs, name: str, sf_dir: str) -> float:
    """One timed execution through the noop sink (forces full evaluation
    of every column JVM-side; df.count() would let Catalyst prune)."""
    start = time.perf_counter()
    specs[name].func(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mis-bench")
    specs = all_specs()
    timings: dict[str, float] = {}
    # Warm-up (UNTIMED): the first heavy queries of a cold session absorb
    # ~2x cold-path cost (JVM JIT, parquet footer caches, shuffle service,
    # Python/Arrow worker pool). Warm all three execution paths TWICE
    # through the same noop sink the timed loop uses (one pass left the
    # r10 start canary ~1.7x the end canary — JIT keeps warming through
    # the first dozen queries).
    for _ in range(2):
        for warm in ("q_agg_groupby", "q_join_shuffle", "q_udf_map_arrow"):
            _run_once(spark, specs, warm, sf_dir)
    # Canary: one fixed cheap query timed solo at capture start / middle /
    # end. The spread adjudicates co-tenancy drift mechanically: identical
    # code, identical plan, three points in time — a spread past ~1.3x
    # marks the WHOLE capture co-tenant-skewed (see SCALE.md drift ledger).
    canary_q = "q_agg_groupby"

    def canary_point() -> float:
        # min-of-2, symmetric with the timed loop (a single cold-ish run
        # at capture start would systematically inflate the spread)
        return round(min(_run_once(spark, specs, canary_q, sf_dir) for _ in range(2)), 3)

    canary_times = [canary_point()]
    spreads: dict[str, float] = {}
    half = len(HEADLINE) // 2
    for i, name in enumerate(HEADLINE):
        if i == half:
            canary_times.append(canary_point())
        # best of 2: this single-JVM box shares CPUs with co-tenants and
        # shows 2x run-to-run noise on wide 32-task stages; min-of-
        # repeats is the standard way to report the machine-limited
        # number rather than the noisiest co-tenant's
        runs = [_run_once(spark, specs, name, sf_dir) for _ in range(2)]
        timings[name] = round(min(runs), 3)
        # per-query repeat spread (sidecar-only): a ratio far above the
        # capture canary's marks THIS query's number co-tenant-spiked
        spreads[name] = round(max(runs) / max(min(runs), 1e-9), 3)
    canary_times.append(canary_point())
    canary = {
        "query": canary_q,
        "start_sec": canary_times[0],
        "middle_sec": canary_times[1],
        "end_sec": canary_times[2],
        "spread": round(max(canary_times) / max(min(canary_times), 1e-9), 3),
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
    line, full = compact_payloads(
        timings,
        float(sf) if sf.replace(".", "").isdigit() else sf,
        canary,
        spreads,
    )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
