"""Physical-plan regression tests: the plans must be the ones we'd want
at 100 TB — filters pushed to the scan, columns pruned, dims broadcast,
facts sort-merged, top-k not globally sorted."""

from __future__ import annotations

from mongodb_iceberg_sync_spark.plans.explain import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    uses_sort_merge_join,
)
from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def test_scan_pruned_pushes_filters(spark, sf_dir):
    df = SPECS["q_scan_pruned"].func(spark, sf_dir)
    assert has_pushed_filters(df)


def test_scan_project_prunes_columns(spark, sf_dir):
    df = SPECS["q_scan_project"].func(spark, sf_dir)
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"}


def test_agg_groupby_prunes_to_needed_columns(spark, sf_dir):
    df = SPECS["q_agg_groupby"].func(spark, sf_dir)
    cols = set(read_schema_columns(df))
    assert "l_orderkey" not in cols  # unused fact columns must not be read
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_dim_join_broadcasts(spark, sf_dir):
    assert uses_broadcast_join(SPECS["q_join_broadcast"].func(spark, sf_dir))
    assert uses_broadcast_join(SPECS["q_join_multiway"].func(spark, sf_dir))


def test_fact_join_sort_merges(spark, sf_dir):
    # lineitem⋈orders: both sides large at scale → sort-merge, not BHJ
    # (at sf0.001 AQE may still broadcast; assert the non-AQE intent via
    # autoBroadcastJoinThreshold=-1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_join_shuffle"].func(spark, sf_dir)
        assert uses_sort_merge_join(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = formatted_plan(SPECS["q_topk"].func(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global Sort for LIMIT k
