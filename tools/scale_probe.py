"""Dev tool: measure how headline operators scale with input size.

Synthesizes a ~10x-sf0.1 copy of the tables the headline queries touch
(documents/embeddings/lineitem/orders/events replicated with shifted
ids so dup/join structure is preserved), then times a subset of
queries at sf0.01, sf0.1 and the 10x copy. Near-linear wall-clock
growth (and flat time-per-row) is the evidence the 100 TB design
notes in SCALE.md rest on; a super-linear jump flags a shape that
breaks at scale (quadratic candidate sets, global sorts, driver
collects).

  python tools/scale_probe.py [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.registry import all_specs
from mongodb_iceberg_sync_spark.session import get_spark

PROBE_QUERIES = [
    "q_agg_groupby",
    "q_join_shuffle",
    "q_join_multiway",
    "q_join_asof",
    "q_cdc_latest",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_sim_ann_lsh",
    "q_sim_knn_join",
    "q_text_tokenize",
    "q_pack_tokens",
    "q_events_funnel",
    "q_timeseries_gapfill",
    "q_join_salted",
    "q_cdc_changefeed",
    "q_sort_zorder",
    "q_sim_pq",
    "q_text_decontaminate",
    "q_text_repetition",
    "q_timeseries_interp",
    "q_events_retention",
    "q_text_pii_redact",
    "q_timeseries_ohlc",
    "q_window_islands",
    "q_sql_correlated",
    "q_events_anomaly",
    "q_text_lm_score",
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
    "q_dedup_chunks",
    "q_sample_temperature",
    "q_agg_heavy_hitters",
    "q_shuffle_train",
    "q_join_interval_overlap",
    "q_sample_priority",
    "q_mix_domains",
    "q_text_chunk_rag",
    "q_embed_quantize",
    "q_curriculum_order",
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
    "q_tpch_q14",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_window_rolling_features",
    "q_multimodal_phash",
    "q_text_collocations",
    "q_agg_gini",
    "q_agg_benford",
    "q_agg_ols",
    "q_agg_ttest",
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
    # r7 debuts
    "q_text_suffix_dup",
    "q_sim_rerank",
    "q_graph_labelprop",
    "q_text_winnowing",
    "q_sample_coreset",
    "q_text_entropy",
    "q_agg_hdr_histogram",
    "q_sql_unpivot",
    "q_timeseries_holt",
]
REPLICAS = 10

# 100x tier: the ~10 heaviest operators whose failure class (single-reducer
# residue, constant-bound driver work, exact-distinct growth) only shows
# past the 10x tier. ngram_jaccard is deliberately EXCLUDED: under
# replica synthesis every text gains 99 exact copies, so its pair-output
# is C(replicas,2)-degenerate — not a measurement of the operator;
# q_dedup_clusters (linear output per dup group) probes the same shape.
HEAVY_100X = [
    "q_events_rfm",
    "q_profile_columns",
    "q_profile_columns_sketch",
    "q_tpch_q21",
    "q_graph_bfs",
    "q_graph_pagerank",
    "q_dedup_clusters",
    "q_sink_sorted_files",
    "q_pack_tokens",
    "q_sort_global_rank",
    "q_agg_groupby",  # linear baseline for the tier
    "q_graph_common_neighbors",
    "q_graph_components",
    "q_agg_countmin",
    "q_text_substring_dup",
    "q_graph_degree_dist",
    "q_graph_adamic_adar",
    "q_graph_kcore",
    # r5: heaviest round-4 additions with only 1x/10x rows (VERDICT r4
    # task #5) + the two single-reducer rewrites (tasks #3/#4)
    "q_text_bpe_encode",
    "q_agg_basket_lift",
    "q_ml_ndcg",
    "q_dedup_semantic",
    "q_sim_maxsim",
    "q_ml_logreg",
    "q_join_runtime_bloom",
    "q_text_heaps_law",
    "q_agg_countmin_fast",
]
# all ten tables are synthesized at the 100x tier — the dims (region/
# nation/supplier) copy as-is and the rest replicate, so ANY --only
# query can run at the big tier without a missing-parquet crash
TABLES_100X = {"events", "orders", "lineitem", "supplier", "nation",
               "customer", "documents", "embeddings", "part", "region"}

TABLES = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "nation": None,
    "region": None,
    "events": "event_id",
}


def synthesize(
    spark, src_dir: str, out_dir: str, replicas: int = REPLICAS,
    tables: set[str] | None = None, distinct_text: bool = False,
    distinct_vector: bool = False,
) -> None:
    """Replicate the sf0.1 tables with shifted ids.

    ``distinct_text=True`` additionally tags every 3rd word of each
    document-text replica with the replica index: by default every text
    gains (replicas-1) exact copies, which makes PAIR-output dedup
    operators C(replicas,2)-degenerate (a synthesis artifact, not a
    measurement — why ngram_jaccard is excluded from the plain 100x
    tier); tagging 1/3 of words kills ~every word-shingle, so replicas
    are genuinely distinct in signature space and the corpus is
    realistically mostly-unique at 100x. Within-replica duplicate
    structure is preserved exactly (identical texts in one replica stay
    identical after the same tagging).

    ``distinct_vector=True`` is the embeddings twin (VERDICT r5 task #3):
    plain replication copies VECTORS verbatim, so identical embeddings
    pile into the same sign-bit buckets regardless of adaptive bits and
    every cosine ANN/dedup pair-output is C(replicas,2)-degenerate. Each
    row adds a deterministic per-dim offset sin(hash(vec_id, i)) seeded
    by the SHIFTED vec_id, so the noise is iid-like across replicas AND
    rows (a replica-seeded-only phase was tried first and rejected: two
    replicas r,s then share one noise realization for every row, and for
    some r-s deltas the noise cosines approach 0.999 — a different
    degeneracy, measured, not guessed). Amplitude ~|v| per dim makes the
    noise dominate (expected replica-pair cos ~0.03, sigma 1/sqrt(64));
    residual pairs above the 0.25 dedup tau are the honest tail any real
    200k-vector 64-dim corpus has, not a synthesis pile-up.
    """
    os.makedirs(out_dir, exist_ok=True)
    for name, key in TABLES.items():
        if tables is not None and name not in tables:
            continue
        src = spark.read.parquet(f"{src_dir}/{name}.parquet")
        if key is None:  # tiny dims stay as-is
            out = src
        else:
            # replicate with shifted ids: joins/dedup keep their
            # within-replica structure, ids stay globally unique
            shift = 100_000_000
            k = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("_r")
            out = src.select("*", k).withColumn(
                key, F.col(key) + F.col("_r").cast("long") * shift
            )
            # foreign keys shift with their parent table
            for fk, parent in {
                "o_custkey": "customer",
                "l_orderkey": "orders",
                "l_partkey": "part",
                "l_suppkey": "supplier",
                "user_id": None,
            }.items():
                if fk in out.columns and fk != key:
                    out = out.withColumn(
                        fk, F.col(fk) + F.col("_r").cast("long") * shift
                    )
            if distinct_text and name == "documents":
                out = out.withColumn(
                    "text",
                    F.expr(
                        "concat_ws(' ', transform(split(text, ' '), "
                        "(w, i) -> CASE WHEN i % 3 = 0 "
                        "THEN concat(w, '_', CAST(_r AS STRING)) "
                        "ELSE w END))"
                    ),
                )
            if distinct_vector and name == "embeddings":
                # element type stays FLOAT so the synthesized schema is
                # byte-identical to the fixture's; vec_id is already
                # shifted here so hash(vec_id, i) differs per replica
                out = out.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, i) -> CAST(x + "
                        "sin(CAST(hash(vec_id, i) AS DOUBLE)) AS FLOAT))"
                    ),
                )
            out = out.drop("_r")
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    # completion marker: an interrupted synthesis leaves a partial dir
    # that must not be mistaken for a finished copy on the next run
    with open(f"{out_dir}/_SYNTH_OK", "w") as fh:
        fh.write("ok\n")


def main() -> int:
    # argparse so --help prints usage (pre-r8 an unrecognized flag fell
    # through to the positional out_dir and synthesized ~100 MB into a
    # dash-prefixed directory in the CWD — ADVICE r7)
    import argparse

    ap = argparse.ArgumentParser(
        description="Synthesize N-replica copies of the sf0.1 fixture and "
        "time probe queries at both tiers to catch super-linear scaling."
    )
    ap.add_argument("out_dir", nargs="?", default="/tmp/mis_scale_probe",
                    help="directory for synthesized replica tables")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to run verbatim")
    ap.add_argument("--tier", default=None, choices=["100"],
                    help="run the 100x heavy tier instead of the 10x default")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized copy after the run")
    ap.add_argument("--distinct-text", action="store_true",
                    help="perturb document text per replica (no duplicate inflation)")
    ap.add_argument("--distinct-vector", action="store_true",
                    help="perturb embeddings per replica")
    ns = ap.parse_args()
    if ns.out_dir.startswith("-"):
        ap.error(f"out_dir may not start with '-': {ns.out_dir!r}")
    only = ns.only.split(",") if ns.only is not None else None
    tier100 = ns.tier == "100"
    keep = ns.keep
    distinct_text = ns.distinct_text
    distinct_vector = ns.distinct_vector
    # --only names run verbatim (they need not appear in the tier's
    # default list); without it the tier's default list runs in full
    base = only if only is not None else (HEAVY_100X if tier100 else PROBE_QUERIES)
    queries = list(dict.fromkeys(base))
    unknown = [q for q in queries if q not in all_specs()]
    if unknown:
        print(f"unknown query names: {unknown}", file=sys.stderr)
        return 2
    out_dir = ns.out_dir
    spark = get_spark(app_name="mis-scale-probe")
    specs = all_specs()

    # distinct-mode replicas get their own subdir per combination so a
    # plain run never reads (or deletes) a distinct run's copy and both
    # tiers honor the flags (pre-r6 the 10x tier silently ignored them)
    suffix = ("dt" if distinct_text else "") + ("dv" if distinct_vector else "")
    mode = " ".join(
        m for m, on in (("distinct-text", distinct_text),
                        ("distinct-vector", distinct_vector)) if on
    )
    if tier100:
        big = f"{out_dir}/sf1x100{suffix}"
        if not os.path.exists(f"{big}/_SYNTH_OK"):
            t0 = time.time()
            synthesize(spark, "/root/testdata/sf0.1", big, replicas=100,
                       tables=TABLES_100X, distinct_text=distinct_text,
                       distinct_vector=distinct_vector)
            print(f"synthesized 100x copy in {time.time()-t0:.1f}s", flush=True)
        label = f"sf10 (100x {mode})" if mode else "sf10 (100x)"
        tiers = [("sf0.1", "/root/testdata/sf0.1"), (label, big)]
        repeats = 1  # one pass: the 100x signal is orders, not noise
    else:
        big = f"{out_dir}/sf1x10{suffix}"
        if not os.path.exists(f"{big}/_SYNTH_OK"):
            t0 = time.time()
            synthesize(spark, "/root/testdata/sf0.1", big,
                       distinct_text=distinct_text,
                       distinct_vector=distinct_vector)
            print(f"synthesized 10x copy in {time.time()-t0:.1f}s", flush=True)
        label = f"sf1 (10x {mode})" if mode else "sf1 (10x)"
        tiers = [
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", "/root/testdata/sf0.1"),
            (label, big),
        ]
        repeats = 2

    results: dict[str, dict[str, float]] = {}
    for label, sf_dir in tiers:
        for q in queries:
            best = float("inf")
            err: str | None = None
            # try/except INSIDE the repeat loop: a failure on a later
            # repeat must not discard a valid earlier best-of timing —
            # and a big-tier failure (OOM, disk) is itself the probe's
            # finding and must not discard the rest of the batch
            for _ in range(repeats):
                try:
                    t0 = time.perf_counter()
                    specs[q].func(spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                except Exception as exc:
                    err = f"ERROR: {exc}"[:200]
                    break
            if best != float("inf"):
                results.setdefault(q, {})[label] = round(best, 2)
                note = f" ({err[:80]} on a later repeat)" if err else ""
                print(f"{label:12s} {q:28s} {best:6.2f}s{note}", flush=True)
            else:
                results.setdefault(q, {})[label] = err or "ERROR: no repeats ran"
                print(f"{label:12s} {q:28s} {(err or 'ERROR')[:126]}", flush=True)
    print(json.dumps(results))
    spark.stop()
    if not keep:
        # only delete THIS run's replica subdir — never the (possibly
        # user-supplied, possibly shared) out_dir, and never another
        # tier's copy that an earlier --keep run paid to synthesize
        shutil.rmtree(big, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
