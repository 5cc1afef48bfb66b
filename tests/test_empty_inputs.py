"""Empty-input robustness: every operator must return an EMPTY result
(never crash) when its tables are empty — at 100 TB "empty input" is
an everyday event (a filter matching nothing, a fresh partition, a
source gap), and a pipeline that dies on it pages someone at 3am.

Covers the operators that historically crashed on empty input (probe
collects, codebook samples, schema inference, partitioned-write
read-backs, division by node count) plus shape representatives of
every family; the full-registry empty sweep lives in
tools/empty_sweep.py."""

from __future__ import annotations

import os

import pytest

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the 14 that crashed before the round-4 guards, plus representatives
_PINNED = [
    "q_sink_partitioned",
    "q_sink_sorted_files",
    "q_scan_dpp",
    "q_sync_automap",
    "q_sync_explicit_map",
    "q_cdc_store_meta",
    "q_cdc_compact_meta",
    "q_sim_topk",
    "q_sim_topk_ivf",
    "q_sim_knn_join",
    "q_sim_pq",
    "q_cluster_kmeans",
    "q_embed_pca",
    "q_graph_pagerank",
    # representatives: one per major family/shape
    "q_agg_groupby",
    "q_join_shuffle",
    "q_window_running",
    "q_dedup_near",
    "q_text_bpe_pairs",
    "q_graph_components",
    "q_events_decay",
    "q_pack_tokens",
    "q_sample_entity",
    "q_timeseries_backtest",
    "q_tpch_q3",
    # r9: the IVF path collects a codebook — the empty-corpus guard is
    # load-bearing (caught by tools/empty_sweep.py in-round). Global
    # aggregates (kruskal etc.) are NOT pinned here: one all-NULL row
    # over an empty input is correct SQL semantics on both engines.
    "q_dedup_semantic_ivf",
    "q_graph_hits",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for name in _TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


@pytest.mark.parametrize("name", _PINNED)
def test_empty_input_yields_empty_output(spark, empty_sf_dir, name):
    df = SPECS[name].func(spark, empty_sf_dir)
    assert df.count() == 0
    assert len(df.schema.fields) > 0
