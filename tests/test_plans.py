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


def test_banded_range_join_is_equi_join(spark, sf_dir):
    # both range-join queries must execute as a HASH equi-join on the
    # band key, never the nested-loop the raw theta predicate would
    # force (BNLJ is O(n*m) and dead at 100 TB with two large sides)
    for q in ("q_join_range_banded", "q_join_theta_range"):
        plan = formatted_plan(SPECS[q].func(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert "Join" in plan, q


def test_dedup_near_shuffle_budget(spark, sf_dir):
    # map-side signatures: barrier repartition + band self-join + pair
    # dedup — a regression re-introducing explode->groupBy would add
    # corpus-sized aggregation exchanges on both sides of the join
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    # 4 = barrier x2 (self-join sides) + band-join broadcast + pair dedup
    assert count_shuffles(SPECS["q_dedup_near"].func(spark, sf_dir)) <= 4


def test_dedup_simhash_no_aggregation_exchange(spark, sf_dir):
    # simhash folds bit contributions map-side; the only shuffles are
    # the spread repartition, the band self-join, and the pair dedup
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    assert count_shuffles(SPECS["q_dedup_simhash"].func(spark, sf_dir)) <= 4


def test_pairwise_gemm_no_driver_collect(spark, sf_dir, monkeypatch):
    # the block-GEMM must never materialize the corpus on the driver:
    # building AND running the query with toPandas forbidden must work
    # (the old implementation toPandas'd the full table at build time)
    import pyspark.sql as pysql

    def _boom(self):
        raise AssertionError("driver-side toPandas in pairwise GEMM path")

    monkeypatch.setattr(pysql.DataFrame, "toPandas", _boom)
    for key in ("q_sim_pairwise", "q_dedup_embedding"):
        df = SPECS[key].func(spark, sf_dir)
        assert "FlatMapGroupsInPandas" in formatted_plan(df)
        assert df.count() > 0


def test_sim_topk_take_ordered_no_join(spark, sf_dir):
    # probe vector folds in as a literal: no join, and top-k via
    # per-partition heap (TakeOrderedAndProject), not a global sort
    plan = formatted_plan(SPECS["q_sim_topk"].func(spark, sf_dir))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_sample_hash_is_shuffle_free(spark, sf_dir):
    # content-hash sampling must stay a pure map-side predicate: scan ->
    # filter -> project, zero exchanges (embarrassingly parallel at 100 TB)
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    assert count_shuffles(SPECS["q_sample_hash"].func(spark, sf_dir)) == 0


def test_salted_agg_two_phase(spark, sf_dir):
    # exactly two exchanges: (key, salt) phase then key merge phase —
    # and phase 2's input is <= n_salts rows per key, so no reducer skew
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_agg_salted"].func(spark, sf_dir)
    assert count_shuffles(df) == 2


def test_salted_agg_rejects_holistic():
    import pytest as _pytest

    from mongodb_iceberg_sync_spark.functions.skew import salted_agg

    with _pytest.raises(ValueError, match="algebraic"):
        salted_agg(None, ["k"], [("median", "v", "m")])


def test_knn_join_shuffles_only_partials(spark, sf_dir):
    # per-batch partial top-k: the only exchange is the final window
    # over (k x n_batches) partial rows — the corpus itself never
    # shuffles, and no per-probe hot key sees corpus-sized input
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_sim_knn_join"].func(spark, sf_dir)
    assert count_shuffles(df) == 1
    assert df.count() > 0


def test_pivot_is_two_phase_agg(spark, sf_dir):
    # explicit pivot values → exactly two hash aggregations: reduce by
    # (month, event_type) first, then pack wide by month. The implicit
    # form would ALSO run a distinct-collect job over the fact to
    # discover values; explicit values keep it to these two shuffles.
    df = SPECS["q_agg_pivot"].func(spark, sf_dir)
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    assert count_shuffles(df) == 2, formatted_plan(df)[:1200]


def test_funnel_joins_are_equi_not_nested_loop(spark, sf_dir):
    # the ts >= signup_ts predicate must ride the user_id equi-join as
    # a residual filter, never degrade to BNLJ/cartesian
    plan = formatted_plan(SPECS["q_events_funnel"].func(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_lsh_candidates_are_equi_join(spark, sf_dir):
    # band-bucket candidates come from a hash equi-join; any
    # nested-loop shape would be all-pairs at 100 TB
    plan = formatted_plan(SPECS["q_sim_ann_lsh"].func(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_join_matches_plain_join(spark, sf_dir):
    # physical rewrite only: salted result == plain join result
    from pyspark.sql import functions as F

    from mongodb_iceberg_sync_spark.operators._util import t as _t

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
    )
    salted = SPECS["q_join_salted"].func(spark, sf_dir)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_pack_tokens_window_is_partitioned(spark, sf_dir):
    # the prefix-sum must be a partition-LOCAL window (two-pass form) —
    # an empty windowspec partition clause means the whole corpus moves
    # to one reducer (the r2 'WindowExec: No Partition Defined' warning)
    df = SPECS["q_pack_tokens"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line, line


def test_lateral_subquery_is_decorrelated(spark, sf_dir):
    # the per-outer-row ORDER BY + LIMIT 3 must become a per-group
    # WindowGroupLimit (early top-3 per custkey) feeding ONE equi-join
    # — never a nested-loop re-scan of orders per customer
    df = SPECS["q_sql_lateral"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "WindowGroupLimit" in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_correlated_subquery_is_decorrelated(spark, sf_dir):
    # Catalyst must rewrite the correlated scalar subquery into a
    # grouped aggregate + equi-join — a nested-loop (re-scan per outer
    # row) plan would be O(n * groups) and unusable at scale
    df = SPECS["q_sql_correlated"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashAggregate" in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_pii_redact_is_map_only(spark, sf_dir):
    # docstring claim: zero exchanges — the redaction must fuse into
    # the scan (any shuffle here would be a 100 TB regression)
    df = SPECS["q_text_pii_redact"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_anomaly_stats_join_broadcasts(spark, sf_dir):
    # per-user stats are tiny vs the event stream: the join back must
    # broadcast so the fact side never shuffles
    df = SPECS["q_events_anomaly"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_null_safe_join_is_hash_not_bnlj(spark, sf_dir):
    # eqNullSafe must plan as a hash join on the null-safe key — a
    # BroadcastNestedLoopJoin fallback would be O(n*dim) at scale
    df = SPECS["q_join_null_safe"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan


def test_scd2_asof_join_is_keyed(spark, sf_dir):
    # the interval predicate must ride a user_id equi-join as residual,
    # never degrade to a cartesian/nested-loop plan
    df = SPECS["q_join_scd2_asof"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_spatial_join_is_cell_equi_join(spark, sf_dir):
    # candidates come from the (cellx, celly) equi-join — a cross
    # product would be the O(n^2) shape the grid exists to avoid
    df = SPECS["q_sim_spatial_join"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_ohlc_aggregate_is_partial(spark, sf_dir):
    # min_by/max_by candles must partial-aggregate map-side: the
    # exchange carries per-group candle states, not raw events
    df = SPECS["q_timeseries_ohlc"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan or "partial_minby" in plan.lower()


def test_global_rank_window_is_partitioned(spark, sf_dir):
    # like pack_tokens: the two-pass global rank must keep its window
    # partition-LOCAL (pid) — an empty partition clause is the
    # single-reducer shape the operator exists to avoid
    df = SPECS["q_sort_global_rank"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line, line


def test_heavy_hitters_aggregate_is_partial(spark, sf_dir):
    # token counts must fold map-side: the exchange carries O(vocab)
    # partial counts per task, never the raw token stream
    df = SPECS["q_agg_heavy_hitters"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan


def test_shuffle_train_window_is_shard_partitioned(spark, sf_dir):
    # per-shard position must be a partition-LOCAL window keyed on the
    # shard — an empty partition clause would serialize the corpus
    df = SPECS["q_shuffle_train"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(shard" in line, line


def test_temperature_sample_broadcasts_rates(spark, sf_dir):
    # the per-source rate dim is k rows — it must broadcast onto the
    # fact scan, not shuffle the corpus on the group key
    df = SPECS["q_sample_temperature"].func(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_interval_overlap_is_bucket_equi_join(spark, sf_dir):
    # the week-grid equi-join is the whole point: a nested-loop or
    # cartesian fallback would be the O(A*B) shape it replaces
    df = SPECS["q_join_interval_overlap"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "distinct" not in plan.lower()  # report-once rule, no dedup shuffle


def test_chunk_dedup_window_is_chunk_partitioned(spark, sf_dir):
    # occurrence ranking partitions by chunk text (occurrence lists),
    # never an empty partition clause
    df = SPECS["q_dedup_chunks"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(chunk" in line, line


def test_chunk_rag_is_map_only(spark, sf_dir):
    # docstring claim: chunking rides the ingest scan — zero exchanges
    df = SPECS["q_text_chunk_rag"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_priority_sample_is_take_ordered(spark, sf_dir):
    # top-(k+1) selection must be TakeOrderedAndProject (per-partition
    # partial top-k, O(k) to the final task) — a global Sort would
    # shuffle the corpus
    df = SPECS["q_sample_priority"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row tau scalar


def test_mix_domains_aggregate_is_partial(spark, sf_dir):
    # token counting must partial-aggregate map-side: the exchange
    # carries O(#domains) rows, not the corpus
    df = SPECS["q_mix_domains"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan


def test_embed_quantize_is_map_only(spark, sf_dir):
    # per-vector quantization is embarrassingly parallel — no exchange
    df = SPECS["q_embed_quantize"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curriculum_order_window_is_partitioned(spark, sf_dir):
    # global curriculum position must come from the two-pass prefix
    # form: every window partitions by pid, never an empty clause
    df = SPECS["q_curriculum_order"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line, line


def test_tpch_q3_plan_shape(spark, sf_dir):
    # all three scans must receive their pushed filter; the top-10 must
    # be TakeOrderedAndProject (never a global Sort); the fact joins
    # must be key joins (no nested-loop anywhere)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_tpch_q3"].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "TakeOrderedAndProject" in plan
        assert "EqualTo(c_mktsegment,BUILDING)" in plan
        assert "LessThan(o_orderdate" in plan
        assert "GreaterThan(l_shipdate" in plan
        assert "NestedLoop" not in plan
        assert uses_sort_merge_join(df)  # fact⋈fact with broadcasts off
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_tpch_q5_broadcasts_dims_only(spark, sf_dir):
    # supplier/nation/region broadcast explicitly even with auto-
    # broadcast off; the customer⋈orders⋈lineitem spine sort-merges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_tpch_q5"].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert plan.count("BroadcastHashJoin") >= 3
        assert uses_sort_merge_join(df)
        assert "EqualTo(r_name,ASIA)" in plan  # region filter pushed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_tpch_q10_filters_reach_scans(spark, sf_dir):
    df = SPECS["q_tpch_q10"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan


def test_inverted_index_windows_are_term_keyed(spark, sf_dir):
    # posting-list cap must come from a term-partitioned window (bounded
    # state per term), and the final top-20 must be TakeOrderedAndProject
    df = SPECS["q_text_inverted_index"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(term" in line, line


def test_reservoir_window_is_stratum_keyed(spark, sf_dir):
    df = SPECS["q_sample_reservoir"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(source" in line, line


def test_ewma_single_user_shuffle(spark, sf_dir):
    # one keyed window over user_id; the lag chain must all ride the
    # SAME window spec (one Window node, not eight)
    df = SPECS["q_timeseries_ewma"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one Window exec node: the 7-lag chain shares one spec
    assert len([ln for ln in plan.splitlines() if ln.lstrip("+- :*(0123456789) ").startswith("Window ")]) <= 1
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(user_id" in line, line
    assert "TakeOrderedAndProject" in plan  # ORDER+LIMIT never global-sorts


def test_bm25_is_two_scan_no_wide_shuffle(spark, sf_dir):
    # tf/dl are map-side HOFs; corpus stats are a 1-row broadcast; the
    # only "exchange" allowed is the single-partition one feeding the
    # scalar aggregate — never a corpus-wide keyed shuffle
    df = SPECS["q_text_bm25"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    import re
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert not hash_exchanges, hash_exchanges


def test_tpch_q19_derives_implied_scan_filters(spark, sf_dir):
    # the OR-of-ANDs predicate spans both join sides; Catalyst must
    # derive the union-of-branches filter for EACH side and push it to
    # that side's scan (brand/size on part, quantity on lineitem)
    df = SPECS["q_tpch_q19"].func(spark, sf_dir)
    plan = formatted_plan(df)
    part_pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "p_brand" in ln
    ]
    li_pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "l_quantity" in ln
    ]
    assert part_pushed, "brand/size disjunction not pushed to part scan"
    assert li_pushed, "quantity disjunction not pushed to lineitem scan"


def test_sufficient_statistics_aggs_are_single_pass(spark, sf_dir):
    # OLS / t-test / Benford ship statistics, not data: exactly one
    # partial-aggregated pass over the fact, no joins back to raw rows
    import re

    for q in ("q_agg_ols", "q_agg_ttest"):
        plan = formatted_plan(SPECS[q].func(spark, sf_dir))
        assert "partial" in plan.lower(), q
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, q
    # benford joins only the 1-row total back (broadcast), never the fact
    plan = formatted_plan(SPECS["q_agg_benford"].func(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_collocations_bigram_agg_is_pinned_once(spark, sf_dir):
    # the bigram explode+agg feeds four consumers through ONE pinned
    # relation: no Generate (explode) may appear more than once
    df = SPECS["q_text_collocations"].func(spark, sf_dir)
    # force the checkpoint so the executed plan reflects the pin
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") <= 1, plan[:800]


def test_tpch_q4_exists_decorrelates_to_semi_join(spark, sf_dir):
    df = SPECS["q_tpch_q4"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # quarter pushed


def test_tpch_q6_all_predicates_reach_scan(spark, sf_dir):
    df = SPECS["q_tpch_q6"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan  # pure scan+agg
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity",
                 "GreaterThanOrEqual(l_discount"):
        assert frag in plan, frag


def test_tpch_q12_year_filter_reaches_lineitem_scan(spark, sf_dir):
    df = SPECS["q_tpch_q12"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "NestedLoop" not in plan


def test_tpch_q13_left_join_keeps_zero_order_customers(spark, sf_dir):
    # the exclusion predicate lives in the JOIN condition, which lets
    # Catalyst push it into the ORDERS scan while customers with no
    # (remaining) orders still survive the LeftOuter with count 0
    df = SPECS["q_tpch_q13"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_tpch_q21_single_agg_replaces_double_subquery(spark, sf_dir):
    # the EXISTS + NOT EXISTS pair is folded into ONE per-order
    # aggregate: lineitem is scanned exactly twice (candidates + agg),
    # never three times, and the supplier/nation dims broadcast
    df = SPECS["q_tpch_q21"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("lineitem") == 2, plan.count("lineitem")
    assert "EqualTo(l_returnflag,R)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_profile_columns_single_expand_two_exchanges(spark, sf_dir):
    # six exact countDistincts must share ONE Expand (never one
    # aggregate pass per column) and the whole profile is two
    # exchanges: the distinct-key shuffle plus a single-row gather
    df = SPECS["q_profile_columns"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count(") Expand") == 1, plan.count(") Expand")
    exchanges = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    ]
    assert len(exchanges) == 2, exchanges


def test_cdc_ivm_join_deltas_broadcast_base_shuffles(spark, sf_dir):
    # the three delta terms broadcast the ~1% delta sides even with
    # auto-broadcast off (explicit hints); the base term is the one
    # fact-joins-fact SMJ — the stored materialization in steady state
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_cdc_ivm_join"].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert plan.count("BroadcastHashJoin") >= 3
        assert uses_sort_merge_join(df)
        assert "Union" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_agg_bootstrap_one_shuffle_no_rand(spark, sf_dir):
    # the replicate explode is map-side; the only exchange is the
    # 32-group aggregation, and nothing in the plan is nondeterministic
    # (the whole point of arithmetic weights over rand())
    df = SPECS["q_agg_bootstrap"].func(spark, sf_dir)
    plan = formatted_plan(df)
    exchanges = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    ]
    assert len(exchanges) <= 2, exchanges  # partial->final agg + ordering
    assert "rand" not in plan.lower()
    assert ") Generate" in plan  # map-side replicate explode


def test_sink_sorted_files_ranges_disjoint(spark, sf_dir):
    # the layout claim: within a partition, per-file [min,max] of the
    # sort key must not overlap — that disjointness is exactly what
    # lets min/max skipping prune a date-range query to O(range) files.
    # Uses the operator's own recipe (repartitionByRange across MANY
    # tasks per year — no single-task partition writes) at a smaller
    # maxRecordsPerFile so the sizing split actually kicks in at sf0.001.
    df = SPECS["q_sink_sorted_files"].func(spark, sf_dir)
    assert all(r.files_in_bound for r in df.collect())
    import pyspark.sql.functions as F
    import tempfile
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate").cast("long")
    )
    out = tempfile.mkdtemp(prefix="mis_sorted_pin_")
    writer_df = li.repartitionByRange(
        8, "ship_year", "l_shipdate"
    ).sortWithinPartitions("ship_year", "l_shipdate")
    # scale pin: the shuffle feeding the writer is RANGE on
    # (ship_year, l_shipdate) — many tasks per year directory — not a
    # hash repartition on ship_year alone (one ~14TB task per year at
    # target scale)
    shuffle_plan = writer_df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(ship_year" in shuffle_plan.lower(), shuffle_plan
    (
        writer_df.write.mode("overwrite")
        .option("maxRecordsPerFile", 500)
        .partitionBy("ship_year")
        .parquet(out)
    )
    stats = (
        spark.read.parquet(out)
        .groupBy("ship_year", F.input_file_name().alias("f"))
        .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
        .collect()
    )
    by_year = {}
    for r in stats:
        by_year.setdefault(r.ship_year, []).append((r.lo, r.hi))
    assert any(len(v) > 1 for v in by_year.values())  # sizing actually split
    for year, ranges in by_year.items():
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (year, hi1, lo2)


def test_scan_dpp_injects_dynamic_pruning(spark, sf_dir):
    # the data-dependent dim filter can't be constant-folded, so the
    # partitioned fact scan must carry a dynamicpruning subquery in its
    # PartitionFilters — runtime directory skipping, not post-join filter
    df = SPECS["q_scan_dpp"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("dynamicpruning" in l for l in pf), pf


def test_profile_sketch_no_expand_single_exchange(spark, sf_dir):
    # the 100 TB profiling default: HLL registers merge map-side, so the
    # plan must carry NO Expand (the exact variant multiplies rows 7x
    # through one) and only the partial->final aggregate exchange
    df = SPECS["q_profile_columns_sketch"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" not in plan, plan
    exchanges = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    ]
    assert len(exchanges) <= 1, exchanges


def test_bucketed_join_shuffles_nothing(spark, sf_dir):
    # both sides bucketed on the join key: the SMJ must read co-located
    # buckets with NO Exchange on either input, and the per-order
    # partial agg must reuse the bucket partitioning — the only
    # exchange in the whole plan is the final tiny priority rollup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_join_bucketed"].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan, plan[:1500]
        from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

        assert count_shuffles(df) == 1, plan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

def _hash_exchange_ids(plan: str) -> list[int]:
    """Node ids of hash-shuffle Exchanges (formatted details put the
    partitioning on the Arguments line, not the node header)."""
    import re

    ids = []
    for m in re.finditer(r"^\((\d+)\) Exchange\n(?:[^\n]*\n){0,3}?Arguments: hashpartitioning", plan, re.M):
        ids.append(int(m.group(1)))
    return ids


def test_events_decay_single_hash_shuffle_pushed_filter(spark, sf_dir):
    # the purchase filter must reach the scan; the whole feature is one
    # map-side-combinable agg -> exactly one hashpartitioning exchange
    # (the trailing rangepartitioning is the presentation sort)
    df = SPECS["q_events_decay"].func(spark, sf_dir)
    assert has_pushed_filters(df)
    plan = formatted_plan(df)
    assert len(_hash_exchange_ids(plan)) == 1, plan
    assert ") Expand" not in plan


def test_bpe_pairs_explode_runs_over_vocab_not_corpus(spark, sf_dir):
    # two-level BPE shape: corpus collapses to the word-frequency table
    # FIRST, and the char-pair Generate consumes that aggregate — node
    # ids grow leaf->root, so the order must be
    #   word Generate < vocab Exchange < pair Generate,
    # with exactly two hash exchanges (vocab, pair counts) and the
    # top-50 as TakeOrdered, never a global sort
    df = SPECS["q_text_bpe_pairs"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    exchanges = _hash_exchange_ids(plan)
    assert len(exchanges) == 2, plan
    import re

    generates = [int(m) for m in re.findall(r"^\((\d+)\) Generate", plan, re.M)]
    assert len(generates) == 2, plan
    assert min(generates) < min(exchanges) < max(generates), (generates, exchanges)


def test_join_asof_nearest_filters_reach_scans(spark, sf_dir):
    # both event_type residuals push into the parquet scans, and the
    # rank<=1 filter must become a WindowGroupLimit (per-group early
    # top-1 during the sort, not a full window then filter)
    df = SPECS["q_join_asof_nearest"].func(spark, sf_dir)
    assert has_pushed_filters(df)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert len(_hash_exchange_ids(plan)) <= 2, plan


def test_embed_pca_projection_stays_jvm_side(spark, sf_dir):
    # the RETURNED projection plan must be pure codegen over the scan:
    # the Gramian mapInPandas ran during operator construction, so no
    # Python eval node may appear in the per-vector projection
    df = SPECS["q_embed_pca"].func(spark, sf_dir)
    plan = formatted_plan(df)
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
    # the dot products are zip_with/aggregate expressions inside a
    # Project over the scan — a JVM expression, not a Python stage
    assert "zip_with" in plan and ") Project" in plan


def test_feature_hash_two_shuffles_no_join(spark, sf_dir):
    # hashing-trick featurizer: (doc,bucket) count shuffle + per-doc
    # window shuffle — the L2 norm must be a window over the counts,
    # never a groupBy + self-join (which would add a third exchange)
    df = SPECS["q_text_feature_hash"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(_hash_exchange_ids(plan)) == 2, plan
    assert "Join" not in plan, plan


def test_timeseries_backtest_scans_events_once(spark, sf_dir):
    # the daily grid is checkpointed: the seasonal self-join runs on
    # the days x types table, so the corpus is scanned exactly once
    # (during construction) and the returned plan reads no parquet
    df = SPECS["q_timeseries_backtest"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert ") Scan parquet" not in plan, plan


def test_covar_matrix_single_agg_pass(spark, sf_dir):
    # One hash-agg pass over lineitem: exactly one scan, and the only
    # exchange is the single-row final agg (SinglePartition), never a
    # data-sized shuffle.
    import re

    df = SPECS["q_agg_covar_matrix"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    exchanges = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    ]
    assert len(exchanges) <= 1, exchanges  # the single-row final agg only
    assert "SinglePartition" in plan
    assert "hashpartitioning" not in plan  # never a data-sized keyed shuffle


def test_basket_lift_dims_broadcast_pairs_bounded(spark, sf_dir):
    # part dim and both brand marginals broadcast; the pair self-join is
    # an equi-join on l_orderkey, never a cross product.
    df = SPECS["q_agg_basket_lift"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert "CartesianProduct" not in plan
    import re

    bnl = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    assert len(bnl) <= 1, bnl  # the 1-row order-total scalar only


def test_sequence_match_single_user_shuffle(spark, sf_dir):
    # Path assembly + stage classification happen inside ONE user-keyed
    # exchange; the stage rollup shuffles <= |stages| rows.
    import re

    df = SPECS["q_events_sequence_match"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "hashpartitioning(user_id" in plan


def test_readability_is_map_only(spark, sf_dir):
    # Zero joins, zero aggregations — regexp counting runs inside codegen
    # on the single documents scan (the ORDER BY is presentation only).
    import re

    df = SPECS["q_text_readability"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regr_slope_one_window_exec(spark, sf_dir):
    # All five sufficient-stat sums share one window spec -> exactly one
    # Window node, one user-keyed exchange; the purchase filter reaches
    # the scan.
    df = SPECS["q_window_regr_slope"].func(spark, sf_dir)
    plan = formatted_plan(df)
    n_window = len(
        [ln for ln in plan.splitlines()
         if ln.lstrip("+- :*(0123456789) ").startswith("Window ")]
    )
    assert n_window == 1
    assert has_pushed_filters(df)


def test_countmin_sketch_broadcasts_to_probe(spark, sf_dir):
    # the 1024-cell sketch is the broadcast side of the probe join;
    # no cross product anywhere
    df = SPECS["q_agg_countmin"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_substring_dup_shuffles_hashes_not_text(spark, sf_dir):
    # every KEYED exchange's output schema must carry the 16-byte
    # shingle md5 (or doc-keyed aggregates) — never the raw text
    # column. The one exception is the r12 spread() exchange: a
    # round-robin repartition of the NARROW pre-expansion documents
    # (5k rows) that buys the per-position explode its parallelism —
    # that one may carry text, but it must be RoundRobin, and there
    # may be at most one.
    import re

    df = SPECS["q_text_substring_dup"].func(spark, sf_dir)
    plan = formatted_plan(df)
    text_exchanges = [
        m.group(0)
        for m in re.finditer(r"^\(\d+\) Exchange\n(?:.*\n){1,3}", plan, re.M)
        if "text#" in m.group(0)
    ]
    # the static plan repeats the spread subtree once per consumer of
    # the shingle stream (AQE reuses the shuffle stage at runtime), so
    # pin the KIND of exchange, not the count
    assert text_exchanges, "expected the spread() exchange in the plan"
    for ex in text_exchanges:
        assert "RoundRobinPartitioning" in ex, ex


def test_datacard_rollups_are_source_keyed(spark, sf_dir):
    df = SPECS["q_corpus_datacard"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan


def test_json_shred_is_single_pass_map_side(spark, sf_dir):
    # explicit-schema from_json + partial agg: one scan, one exchange
    # keyed on the tiny event_type domain
    import re

    df = SPECS["q_json_shred"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "from_json" in plan
    exchanges = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    ]
    assert len(exchanges) <= 2  # event_type agg + presentation sort


def test_funnel_timed_joins_stay_user_keyed(spark, sf_dir):
    # all three stage joins are equi-joins on user_id; the window
    # predicate rides as a post-join filter, never a theta join
    df = SPECS["q_events_funnel_timed"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_adamic_adar_topk_not_global_sort(spark, sf_dir):
    # top-50 must be TakeOrderedAndProject (per-partition heaps + one
    # k-row merge), never a global rangepartition sort of all pairs.
    df = SPECS["q_graph_adamic_adar"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_ml_centroid_scoring_broadcasts_centroids(spark, sf_dir):
    # the corpus must never shuffle: centroids (k·d rows) broadcast
    # into the scoring join.
    df = SPECS["q_ml_centroid_classify"].func(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_ml_ndcg_probe_block_broadcasts(spark, sf_dir):
    df = SPECS["q_ml_ndcg"].func(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_events_concurrency_windows_partition_by_day(spark, sf_dir):
    # the sweep-line must never be a global sort: the running-sum
    # window partitions by day.
    df = SPECS["q_events_concurrency"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # every window is keyed (day for the sweep, user_id for the
    # sessionize lag/cumsum) — none is an unpartitioned global sort
    assert all(("day#" in s) or ("user_id#" in s) for s in specs), specs


def test_window_pareto_single_exchange_for_both_windows(spark, sf_dir):
    # cum-sum and total windows share the nation partitioning — one
    # hashpartitioning(n_name) Exchange feeds both (plus the rollup
    # aggregate reuses it; orderBy adds a range exchange at the end).
    df = SPECS["q_window_pareto"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    # exactly ONE exchange partitioned by n_name alone feeds both
    # stacked Window nodes and the final rollup (the other n_name
    # match is the (n_name, l_suppkey) pre-agg exchange)
    solo = re.findall(r"hashpartitioning\(n_name#\d+, \d+\)", plan)
    assert len(solo) == 1, plan


def test_runtime_bloom_filter_injected(spark, sf_dir):
    # the fact scan must carry might_contain(xxhash64(l_orderkey)) —
    # the dim side's runtime bloom pushed below the shuffle.
    from mongodb_iceberg_sync_spark.operators.joins import (
        _BLOOM_CONFS,
        _runtime_bloom_df,
    )

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        plan = (
            _runtime_bloom_df(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert "might_contain" in plan, plan
    assert "xxhash64(l_orderkey" in plan, plan


def test_countmin_probe_pick_is_distributed_topk(spark, sf_dir):
    # the 10 probe keys must come from TakeOrderedAndProject (partial
    # per-partition top-k merged on the driver) — the r4 verdict flagged
    # the previous Window.partitionBy(lit(0)) row_number, which shuffled
    # every distinct l_partkey to ONE task
    # q_agg_basket_lift's top-20 pair pick follows the same convention
    # (r5 verdict task #4 — its pair table is domain-bounded, so this is
    # consistency with the countmin fix, not a scale repair)
    for q in ("q_agg_countmin", "q_agg_countmin_fast", "q_agg_basket_lift"):
        df = SPECS[q].func(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (q, plan[:1200])
        assert "windowspecdefinition" not in plan, (q, plan[:1200])


def test_ndcg_rank_window_reads_capped_candidates(spark, sf_dir):
    # the per-probe rank window must consume the mapInPandas partial
    # top-k (~batches·probes·k rows), not the raw probes×corpus join —
    # the r5 verdict watch item #3, closed in r6. MapInPandas must sit
    # BELOW the window in the executed plan (plans print top-down, so
    # the window's input appears after it in the string).
    df = SPECS["q_ml_ndcg"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:1500]
    w = plan.find("Window")
    m = plan.find("MapInPandas")
    assert 0 <= w < m, f"window does not read the capped candidates: {plan[:1500]}"


def test_heaps_law_rank_window_is_partition_local(spark, sf_dir):
    # decile boundaries ride the shared two-pass global-rank core: any
    # window in the plan must be pid-partitioned — an empty partition
    # clause would funnel the whole documents table through one task
    df = SPECS["q_text_heaps_law"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line, line


def test_dedup_url_single_exchange_map_side_partials(spark, sf_dir):
    # the canonicalization chain must fuse into the scan as codegen
    # string ops (no UDF) and the ONE groupBy must partial-aggregate
    # map-side — the shuffle carries canonical urls, never documents
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_dedup_url"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(df) == 1, plan[:1200]
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regression_metrics_single_rollup_broadcast_totals(spark, sf_dir):
    # examples shuffle ONCE (the user rollup); the totals row joins back
    # as a broadcast; the metric fold is constant-size
    df = SPECS["q_ml_regression_metrics"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:1200]
    assert "partial_sum" in plan


def test_suffix_dup_shuffles_hashes_not_text(spark, sf_dir):
    # the stride-1 shingle explode must shuffle only (hash, doc, pos)
    # tuples — document text stays inside the scan stage — and the
    # df-cap filter must run BEFORE the pair self-join (an unfiltered
    # self-join is the quadratic boilerplate trap)
    df = SPECS["q_text_suffix_dup"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # df-cap + span aggs partial map-side


def test_sim_rerank_broadcasts_probes_on_bucket(spark, sf_dir):
    # stage-1 candidates must come from ONE bucket equi-join with the
    # 8-probe side broadcast — never a cartesian probes x corpus
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_sim_rerank"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_labelprop_supersteps_are_hash_aggs_not_windows(spark, sf_dir):
    # every vote round must be equi-join + hash agg (map-side
    # combinable); a window over the corpus would serialize per node
    df = SPECS["q_graph_labelprop"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1200]
    assert "partial_count" in plan or "partial_max" in plan


def test_winnowing_is_map_only(spark, sf_dir):
    # gram hashing, window minima and the distinct count are row-local
    # array expressions: no hash exchange and no aggregate anywhere —
    # the only shuffles allowed are the r11 compute-spread round-robin
    # (parallelizes the per-char md5 off the single input split) and the
    # final presentation range sort
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_text_winnowing"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(df) <= 2, plan[:1200]
    assert "roundrobin" in plan.lower(), plan[:1200]
    assert "hashpartitioning" not in plan, plan[:1200]
    assert "HashAggregate" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_coreset_single_bounded_rollup(spark, sf_dir):
    # one map pass + one grouped agg on <= 256 cell keys; the
    # countDistinct(label) expand is the only extra exchange allowed
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_sample_coreset"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(df) <= 3, plan[:1200]
    assert "partial_min" in plan or "partial_count" in plan


def test_text_entropy_row_local_histogram(spark, sf_dir):
    # r11: the per-doc char histogram is row-local (sorted-array run
    # lengths) — NO aggregate, NO hash exchange, no window, no Python;
    # only the compute-spread round-robin and the presentation sort move
    # rows (was: a per-char explode shuffled into two HashAggregates)
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_text_entropy"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1200]
    assert "HashAggregate" not in plan, plan[:1200]
    assert "hashpartitioning" not in plan, plan[:1200]
    assert count_shuffles(df) <= 2, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hdr_histogram_bounded_window_after_agg(spark, sf_dir):
    # the bucket expression is map-side; the only window runs on the
    # aggregated (type, bucket) table (<= types*64 rows), never events
    df = SPECS["q_agg_hdr_histogram"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_min" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unpivot_expands_after_aggregate(spark, sf_dir):
    # Expand must sit ABOVE the rollup: unpivot-then-aggregate would
    # triple the shuffle; here the exchange count stays at the single
    # rollup + presentation sort
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_sql_unpivot"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan, plan[:1200]
    assert count_shuffles(df) <= 2, plan[:1200]


def test_holt_fold_is_jvm_array_expression(spark, sf_dir):
    # the recurrence must fold inside a JVM aggregate expression over
    # the per-user hourly rollup — no Python, no per-step window
    df = SPECS["q_timeseries_holt"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan or "partial_collect" in plan or "objHashAggregate" in plan.lower() or "ObjectHashAggregate" in plan


# --- round-7 wave-2 debuts -------------------------------------------


def test_spearman_rank_maps_on_distinct_tables(spark, sf_dir):
    # r12 shape: the fact is aggregated ONCE into checkpointed (g,x,y)
    # contingency cells; the rank windows run on cell rollups and join
    # back to CELLS, never to fact rows. The static plan therefore
    # starts at the cells checkpoint scan and must never re-shuffle
    # anything fact-scale: the bounded x rank map (quantity domain,
    # <=50 values/group) rides a broadcast join, and every remaining
    # exchange carries cell-table rollups (9 statically: 2 per rank
    # map, 2 for the y join's re-key, stats partial->g, final sort,
    # +1 AQE copy).
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_agg_spearman"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan[:1200]
    # no fact-row columns may cross an exchange: the cells checkpoint
    # is the only fact-derived input and it is already aggregated
    assert "l_extendedprice" not in plan and "l_quantity" not in plan
    assert count_shuffles(df) <= 9, plan[:1200]


def test_kendall_contingency_self_join_is_broadcast(spark, sf_dir):
    # pairs come from the <=550-cell contingency table; its self-join
    # must broadcast, never shuffle the fact twice
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_agg_kendall"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mutual_info_margins_broadcast(spark, sf_dir):
    # one combinable cell rollup; margins/totals join back as
    # broadcasts onto the bounded cell table — no fact re-shuffle
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_agg_mutual_info"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "Window" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gmean_single_combinable_agg(spark, sf_dir):
    # one hash agg with map-side partials; no window, no Python, no join
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_agg_gmean"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "Window" not in plan and "Join" not in plan, plan[:1200]
    assert count_shuffles(df) <= 2, plan[:1200]


def test_theilsen_pair_join_on_daily_rollup(spark, sf_dir):
    # the O(days^2) pair join must consume the DAILY ROLLUP (hash agg
    # below the join), never raw events; median via per-user window on
    # the bounded pair table
    df = SPECS["q_timeseries_theilsen"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan[:1200]


def test_sma_crossover_window_on_calendar_rollup(spark, sf_dir):
    # the unpartitioned window is allowed ONLY because it runs on the
    # daily rollup (calendar-bounded); the rollup below must combine
    # map-side
    df = SPECS["q_timeseries_sma_crossover"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, plan[:1200]
    assert "Window" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_peak_detect_partitioned_window(spark, sf_dir):
    # lag/lead windows must be PARTITIONED by user (no global window),
    # fed by a combinable hourly rollup
    df = SPECS["q_window_peak_detect"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan[:1200]
    assert "hashpartitioning(user_id" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ml_mcc_constant_after_user_rollup(spark, sf_dir):
    # per-user rollup (combinable) -> 1-row totals broadcast -> 4-counter
    # agg; nothing after the first groupBy scales with the corpus
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_ml_mcc"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_group_fairness_constant_after_user_rollup(spark, sf_dir):
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_ml_group_fairness"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_clustering_coeff_takeordered(spark, sf_dir):
    # top-k must be TakeOrderedAndProject (never a global sort of all
    # nodes); the degree broadcasts live BELOW the localCheckpoint cut
    # (same shape q_graph_triangles pins), so this plan only shows the
    # wedge joins + rollup
    df = SPECS["q_graph_clustering_coeff"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_novelty_shuffles_hashes_not_strings(spark, sf_dir):
    # the exploded shingle table must carry md5 hashes into the
    # exchange — no raw shingle string may cross a shuffle boundary
    df = SPECS["q_text_novelty"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(h" in plan, plan[:1200]
    assert "partial_min" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mattr_row_local_zero_shuffle(spark, sf_dir):
    # slice + array_distinct per window are row-local JVM expressions:
    # no aggregate, no window, only the presentation sort may exchange
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_text_mattr"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_shuffles(df) <= 1, plan[:1200]
    assert "HashAggregate" not in plan and "Window" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_qualify_window_group_limit_pushdown(spark, sf_dir):
    # QUALIFY translation: broadcast dim join, then Catalyst's
    # WindowGroupLimit must prune to k rows per partition BEFORE the
    # window shuffle (Partial) and again after (Final) — the rank
    # filter never materializes full groups
    from mongodb_iceberg_sync_spark.plans.explain import (
        count_shuffles,
        uses_broadcast_join,
    )

    df = SPECS["q_sql_qualify"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "WindowGroupLimit" in plan, plan[:1200]
    assert count_shuffles(df) <= 3, plan[:1200]


def test_anisotropy_centroids_broadcast_back(spark, sf_dir):
    # component rollup is combinable; the k-label centroid table must
    # come back as a BROADCAST (never shuffle the corpus onto labels);
    # per-row cosine stays a JVM fold
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_embed_anisotropy"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ols_multi_single_combinable_agg(spark, sf_dir):
    # nine sufficient stats ride ONE hash agg with map-side partials;
    # the 2x2 solve is projection arithmetic — no window, no join
    from mongodb_iceberg_sync_spark.plans.explain import count_shuffles

    df = SPECS["q_agg_ols_multi"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan[:1200]
    assert "Window" not in plan and "Join" not in plan, plan[:1200]
    assert count_shuffles(df) <= 2, plan[:1200]


def test_late_audit_two_pass_no_global_window(spark, sf_dir):
    # the running max must NEVER be a single-partition window over the
    # fact: the only fact-side window partitions by arrival block, and
    # the prefix max runs on the bounded block table broadcast back
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_stream_late_audit"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "hashpartitioning(blk" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embed_outliers_window_group_limit(spark, sf_dir):
    # centroids broadcast back; the per-label top-k rank must engage
    # WindowGroupLimit so each map task forwards <= k rows per label
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_embed_outliers"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "WindowGroupLimit" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_auc_by_group_window_on_bounded_table(spark, sf_dir):
    # cumulative neg runs over (groups x distinct scores), PARTITIONED
    # by grp; the only corpus pass is the combinable per-user rollup
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_ml_auc_by_group"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "hashpartitioning(grp" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_graph_summary_single_agg_over_degrees(spark, sf_dir):
    # the profile is one combinable agg over the O(V) degree table; no
    # window, no Python, no triangle join
    df = SPECS["q_graph_summary"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_sum" in plan, plan[:1200]
    assert "Window" not in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_new_vs_returning_no_window(spark, sf_dir):
    # distinct-activity rollup + per-user min + co-partitioned join +
    # day rollup: combinable aggs only, zero windows
    df = SPECS["q_events_new_vs_returning"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1200]
    assert "partial_min" in plan or "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_heatmap_bounded_cell_rollup(spark, sf_dir):
    # one combinable rollup to <=168 cells; totals broadcast back
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_events_heatmap_dow_hour"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_count" in plan or "partial_sum" in plan, plan[:1200]
    assert "Window" not in plan, plan[:1200]


def test_cos_histogram_equi_join_no_cross(spark, sf_dir):
    # the stride pair sample must be ONE equi-join — never a nested
    # loop / cartesian — feeding a bounded bucket rollup
    df = SPECS["q_sim_cos_histogram"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:1200]
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight" in plan, plan[:1200]
    assert "partial_count" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_join_skew_takeordered(spark, sf_dir):
    # profile = one combinable rollup + 1-row totals broadcast +
    # TakeOrderedAndProject — never a global sort of the key table
    from mongodb_iceberg_sync_spark.plans.explain import uses_broadcast_join

    df = SPECS["q_profile_join_skew"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    assert uses_broadcast_join(df), plan[:1200]
    assert "partial_count" in plan, plan[:1200]


def test_wow_window_on_weekly_rollup(spark, sf_dir):
    # the lag window must consume the (type, week) rollup — combinable
    # partials below, window partitioned by event_type above
    df = SPECS["q_timeseries_wow"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_sum" in plan, plan[:1200]
    assert "hashpartitioning(event_type" in plan, plan[:1200]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_q2_catalog_min_decorrelated(spark, sf_dir):
    # offers is checkpointed (r9 advice fix: the twice-consumed catalog
    # agg must not recompute per consumer), so the part-filter pushdown
    # sits in the checkpoint's OWN plan; assert it there, and keep the
    # downstream contract: equi join-back (no nested loop), top-100 as
    # TakeOrderedAndProject over the checkpointed offers.
    df = SPECS["q_tpch_q2"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "ExistingRDD" in plan  # offers folded into the checkpoint
    assert "NestedLoop" not in plan
    from mongodb_iceberg_sync_spark.operators.tpch import _q2_offers

    offers_plan = formatted_plan(_q2_offers(spark, sf_dir))
    assert "EqualTo(p_type,LARGE)" in offers_plan
    assert "GreaterThanOrEqual(p_size,10)" in offers_plan


def test_tpch_q9_prefix_filter_pushes_and_dims_broadcast(spark, sf_dir):
    # the 'red%' LIKE prefix must reach the part scan as StringStartsWith;
    # part/supplier/nation broadcast even with auto-broadcast off
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_tpch_q9"].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "StringStartsWith(p_name,red)" in plan
        assert plan.count("BroadcastHashJoin") >= 3
        assert uses_sort_merge_join(df)  # lineitem⋈orders spine
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_tpch_q11_threshold_is_broadcast_scalar(spark, sf_dir):
    # the grand-total HAVING threshold must be a broadcast 1-row join
    # against the per-part agg, never a shuffled join or a second
    # fact-table pass (exactly one Exchange over lineitem columns)
    df = SPECS["q_tpch_q11"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "EqualTo(n_name,NATION_7)" in plan


def test_tpch_q16_distinct_pair_shuffle_only(spark, sf_dir):
    # part's brand/type/size filters all push to its scan; the fact-side
    # work is the DISTINCT pair agg (hash agg, map-side combinable)
    df = SPECS["q_tpch_q16"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "In(p_size, [1,4,9,14,19,23,36,45])" in plan or "In(p_size" in plan
    assert "Not(EqualTo(p_type,PROMO))" in plan
    assert "NestedLoop" not in plan


def test_tpch_q20_single_pass_conditional_agg(spark, sf_dir):
    # both quantity sums (all-time + 1997) must come from ONE pass over
    # lineitem — exactly one scan of the fact table in the plan — and
    # the supplier membership must be a left-semi join
    df = SPECS["q_tpch_q20"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    assert "StringStartsWith(p_name,small)" in plan


def test_anova_single_fact_pass(spark, sf_dir):
    # sufficient stats must come from ONE scan of lineitem; everything
    # after runs on the <=|groups| row table
    # the per-group stats table is localCheckpointed, so the final plan
    # reads the cached k-row RDD — the fact parquet never reappears
    df = SPECS["q_agg_anova"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "lineitem.parquet" not in plan  # fact folded into checkpoint
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_levene_bf_windows_on_cell_table(spark, sf_dir):
    # the median windows must partition by group over the bounded
    # value-count table; the deviation join-back must be broadcast
    df = SPECS["q_agg_levene_bf"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(g" in line, line
    assert "BroadcastHashJoin" in plan


def test_fisher_exact_one_scan_then_series(spark, sf_dir):
    # one conditional-count pass over orders; the k-series explode runs
    # on the 1-row margins table (no join back to the fact)
    df = SPECS["q_agg_fisher_exact"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("orders.parquet") == 1
    assert "Generate explode" in plan or "Generate" in plan


def test_jackknife_single_fact_pass_broadcast_totals(spark, sf_dir):
    # the 32-bucket rollup is localCheckpointed, so the final plan must
    # read the cached rollup RDD — ZERO parquet re-scans of the fact —
    # and join the 1-row totals via broadcast
    df = SPECS["q_agg_jackknife"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the checkpoint
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_hellinger_single_fact_pass(spark, sf_dir):
    # same checkpoint shape: the 40-cell table is cached, the fact is
    # never re-scanned, and the totals join is broadcast
    df = SPECS["q_agg_hellinger"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mann_kendall_pair_join_on_rollup(spark, sf_dir):
    # the O(days^2) self-join must be on the broadcast daily rollup —
    # exactly one events scan feeds it (localCheckpoint caches the
    # rollup, so the fact is read once)
    df = SPECS["q_timeseries_mann_kendall"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_bollinger_rsi_windows_on_daily_rollup(spark, sf_dir):
    # both windows must partition by event type over the bounded daily
    # rollup (never the fact) — every windowspec carries the et key
    for q in ("q_timeseries_bollinger", "q_timeseries_rsi"):
        df = SPECS[q].func(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition" in line:
                assert "windowspecdefinition(et" in line, (q, line)


def test_aspect_bucket_single_scan_tiny_agg(spark, sf_dir):
    df = SPECS["q_multimodal_aspect_bucket"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("documents.parquet") == 1
    # only doc_id is read — dims derive from the id, nothing else
    cols = read_schema_columns(df)
    assert cols == ["doc_id"]


def test_kfold_single_combinable_agg(spark, sf_dir):
    df = SPECS["q_sample_kfold"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "HashAggregate" in plan


def test_graph_jaccard_topk_and_hub_cap(spark, sf_dir):
    # top-k must be TakeOrderedAndProject; the wedge join must be an
    # equi join on the shared customer (no nested loop)
    df = SPECS["q_graph_jaccard"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_softdedup_hash_agg_joinback(spark, sf_dir):
    # md5 cluster agg + co-keyed join-back; the fact is scanned once per
    # side of the self-join on h (Catalyst may or may not reuse the
    # exchange — assert no nested loop and a hash agg on h)
    df = SPECS["q_dedup_softdedup"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")
    assert "HashAggregate" in plan


def test_recall_at_k_probe_side_broadcast(spark, sf_dir):
    # the brute-force side must be corpus ⋈ BROADCAST(probes) — the
    # corpus is never shuffled for the cross score; the top-k ranking
    # window partitions by probe id
    df = SPECS["q_sim_recall_at_k"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line, line


def test_groupby_all_matches_explicit_plan(spark, sf_dir):
    # GROUP BY ALL must resolve to the same physical agg as the
    # explicit grouping — same keys, one exchange
    df = SPECS["q_sql_groupby_all"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan
    # exactly 2 physical exchanges (agg + sort), each named twice in the
    # formatted output (tree + detail section)
    assert plan.count("Exchange") <= 4


def test_distinct_on_no_global_sort_before_rank(spark, sf_dir):
    # the rank must come from a user_id-partitioned window (hash
    # shuffle on the key), not a global sort of the fact
    df = SPECS["q_sql_distinct_on"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(user_id" in line, line


def test_cuped_single_fact_pass_theta_broadcast(spark, sf_dir):
    # per-user agg is checkpointed (fact read once); θ is a 1-row
    # broadcast join
    df = SPECS["q_events_cuped"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the checkpoint
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bh_fdr_windows_on_test_table(spark, sf_dir):
    # the rank/cutoff windows run on the checkpointed 7-row test table —
    # the fact parquet never reappears in the final plan
    df = SPECS["q_agg_bh_fdr"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan
    assert "ExistingRDD" in plan


def test_msprt_windows_on_daily_grid(spark, sf_dir):
    # cumulative + running-max windows order by the calendar day over
    # the daily rollup; one events scan feeds it
    df = SPECS["q_events_sequential_msprt"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "Window" in plan


def test_freshness_single_pass_broadcast_max(spark, sf_dir):
    df = SPECS["q_profile_freshness"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # two scans: one for the 1-row global max, one for the rollup —
    # both broadcast-joined, never shuffled together
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_eval_slices_grid_agg_totals_broadcast(spark, sf_dir):
    df = SPECS["q_profile_eval_slices"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "documents.parquet" not in plan  # folded into the checkpoint
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_naive_bayes_model_join_scores_combinable(spark, sf_dir):
    # scoring must be a hash join on token feeding a combinable
    # (doc, class) agg; the argmax is a doc-partitioned window
    df = SPECS["q_ml_naive_bayes"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(doc_id" in line, line


def test_hurst_windows_partition_by_block(spark, sf_dir):
    # every frame window after the daily rollup partitions by (k, blk);
    # only the initial row_number over the calendar grid is global
    df = SPECS["q_timeseries_hurst"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_grid = 0
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            if "windowspecdefinition(k" in line:
                continue
            n_grid += 1  # the calendar-bounded global row_number
    assert n_grid <= 2


def test_silhouette_sample_broadcast_quantized(spark, sf_dir):
    # corpus ⋈ BROADCAST(sampled points); the distance agg is a
    # combinable (point, label) hash agg over quantized ints
    df = SPECS["q_ml_silhouette"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "HashAggregate" in plan


def test_raking_iterations_on_grid_only(spark, sf_dir):
    # the IPF iterations join only broadcast margin tables over the
    # checkpointed grid — the fact never reappears
    df = SPECS["q_agg_raking"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan
    assert "BroadcastHashJoin" in plan


def test_expected_shortfall_percentile_on_value_domain(spark, sf_dir):
    # the VaR windows run over the bounded distinct-cents table,
    # partitioned by group; the tail re-scan is a broadcast join
    df = SPECS["q_agg_expected_shortfall"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(g" in line, line
    assert "BroadcastHashJoin" in plan


def test_modularity_single_edge_materialization(spark, sf_dir):
    # edges are checkpointed; m/intra/deg all read the cached table —
    # no parquet re-scan, all tiny joins broadcast
    df = SPECS["q_graph_modularity"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "lineitem.parquet" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_importance_fertility_single_pass(spark, sf_dir):
    plan1 = formatted_plan(SPECS["q_sample_importance"].func(spark, sf_dir))
    assert "documents.parquet" not in plan1  # checkpointed rollup
    plan2 = formatted_plan(SPECS["q_text_fertility"].func(spark, sf_dir))
    assert plan2.count("documents.parquet") == 1
    assert "HashAggregate" in plan2


def test_changepoint_extreme_value_single_pass(spark, sf_dir):
    for q in ("q_timeseries_changepoint", "q_timeseries_extreme_value"):
        plan = formatted_plan(SPECS[q].func(spark, sf_dir))
        assert plan.count("events.parquet") == 1, q


def test_bootstrap_auc_windows_partition_by_replicate(spark, sf_dir):
    # every cumulative window partitions by the replicate id over the
    # bounded score domain; the explode is map-side (no shuffle of the
    # base before the (r, score) agg)
    df = SPECS["q_ml_bootstrap_auc_ci"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    saw_r = False
    for line in plan.splitlines():
        if "windowspecdefinition(r" in line:
            saw_r = True
    assert saw_r


def test_tost_partial_corr_single_pass(spark, sf_dir):
    plan1 = formatted_plan(SPECS["q_agg_tost_equivalence"].func(spark, sf_dir))
    assert plan1.count("events.parquet") == 1
    plan2 = formatted_plan(SPECS["q_agg_partial_corr"].func(spark, sf_dir))
    assert plan2.count("lineitem.parquet") == 1
    assert "Exchange" in plan2  # exactly the one global-agg exchange


def test_stl_strength_grid_windows(spark, sf_dir):
    # the centered-MA window runs on the daily grid; the seasonal means
    # join back via broadcast
    df = SPECS["q_timeseries_stl_strength"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_threshold_cost_one_window_pass(spark, sf_dir):
    # the full threshold sweep must come from cumulative windows over
    # the distinct-score table — two events scans total (the per-user
    # rollup + the 1-row totals broadcast, _examples' standard shape),
    # NOT one scan per threshold
    df = SPECS["q_ml_threshold_cost"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 2


def test_propensity_strata_pool_on_checkpoint(spark, sf_dir):
    df = SPECS["q_events_propensity_strata"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the checkpoint
    assert "BroadcastNestedLoopJoin" in plan


def test_contribution_elasticity_single_pass(spark, sf_dir):
    plan1 = formatted_plan(SPECS["q_timeseries_contribution"].func(spark, sf_dir))
    assert "events.parquet" not in plan1  # folded into the checkpoint
    plan2 = formatted_plan(SPECS["q_agg_elasticity"].func(spark, sf_dir))
    assert plan2.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan2  # part dim broadcast


def test_mcnemar_ece_diversity_single_pass(spark, sf_dir):
    plan1 = formatted_plan(SPECS["q_agg_mcnemar"].func(spark, sf_dir))
    assert plan1.count("events.parquet") == 1
    assert "Generate" in plan1  # the k-series explode on the 1-row cells
    plan2 = formatted_plan(SPECS["q_ml_ece"].func(spark, sf_dir))
    # the example table is checkpointed, so the final plan reads the
    # cached RDD — zero parquet re-scans
    assert "events.parquet" not in plan2
    assert "ExistingRDD" in plan2
    plan3 = formatted_plan(SPECS["q_agg_diversity_hill"].func(spark, sf_dir))
    assert "documents.parquet" not in plan3  # checkpointed rollup


# ---- r9 debut plan pins -----------------------------------------------


def test_kruskal_single_fact_pass_domain_window(spark, sf_dir):
    # the fact is scanned once into (value, group) cells; the midrank
    # cumsum runs over the domain (HashAggregate before any Window)
    df = SPECS["q_agg_kruskal"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the cell checkpoint
    assert "ExistingRDD" in plan
    assert "HashAggregate" in plan


def test_jarque_bera_one_combinable_pass(spark, sf_dir):
    df = SPECS["q_agg_jarque_bera"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "HashAggregate" in plan
    assert "Window" not in plan  # pure sufficient-statistics aggregation


def test_tukey_hsd_pairs_on_group_table(spark, sf_dir):
    # one fact pass -> 5-row group table; the pair join must be broadcast
    df = SPECS["q_agg_tukey_hsd"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the group checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_hodges_lehmann_domain_cross_never_rows(spark, sf_dir):
    # the pairwise set is the DOMAIN cross: both sides are aggregated
    # before any join (HashAggregate feeds the cross), fact scanned <=2x
    # (two filtered branches of one table)
    df = SPECS["q_agg_hodges_lehmann"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # diffs/cum are checkpointed; any residual parquet read is the two
    # filtered domain branches, never the raw pairwise set
    assert plan.count("events.parquet") <= 2
    assert "ExistingRDD" in plan
    assert "HashAggregate" in plan


def test_g_test_broadcast_margins(spark, sf_dir):
    df = SPECS["q_agg_g_test"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the cell checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan


def test_seasonal_mk_grid_self_join_broadcast(spark, sf_dir):
    # one fact rollup; the per-(type,season) pair join rides a broadcast
    df = SPECS["q_timeseries_seasonal_mk"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the grid checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan


def test_ljung_box_banded_lag_join(spark, sf_dir):
    df = SPECS["q_timeseries_ljung_box"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the grid checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_durbin_watson_single_rollup(spark, sf_dir):
    df = SPECS["q_timeseries_durbin_watson"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the grid checkpoint
    assert "ExistingRDD" in plan


def test_granger_one_fact_scan_grid_joins(spark, sf_dir):
    # day grid + two filtered series come from <=3 passes over events;
    # all grid joins are broadcast
    df = SPECS["q_timeseries_granger"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") <= 3
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_runs_test_windows_partitioned(spark, sf_dir):
    # every window is PARTITION BY series (et) — no global window state
    df = SPECS["q_timeseries_runs_test"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


def test_uplift_single_user_rollup(spark, sf_dir):
    df = SPECS["q_events_uplift"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "Window" not in plan  # pure two-level aggregation


def test_kappa_broadcast_totals(spark, sf_dir):
    df = SPECS["q_ml_kappa"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # fact folded into the user checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_brier_decomp_broadcast_range(spark, sf_dir):
    df = SPECS["q_ml_brier_decomp"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # bins are checkpointed; the fact feeds them exactly once upstream
    assert plan.count("events.parquet") <= 1
    assert "ExistingRDD" in plan


def test_reciprocity_user_partitioned_lag(spark, sf_dir):
    df = SPECS["q_graph_reciprocity"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(user_id" in line, line


def test_semantic_ivf_broadcast_centroids_cell_blocked(spark, sf_dir):
    # assignment = corpus x BROADCAST(centroids); the pair join is an
    # equi-join on the cell (never a nested loop over vectors)
    df = SPECS["q_dedup_semantic_ivf"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # the assignment stage folds behind the lazy checkpoint of the
    # assigned table (its own plan carries the broadcast centroid
    # cross); what must hold HERE is that the pairwise stage is an
    # EQUI-join keyed on the cell — never a nested loop over vectors
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_rerank_ce_funnel_windows_per_probe(spark, sf_dir):
    # both ranking windows partition by probe_id; the model stage runs
    # on the shortlist only (no second corpus scan after stage 2)
    df = SPECS["q_sim_rerank_ce"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_win = 0
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            n_win += 1
            assert "windowspecdefinition(probe_id" in line, line
    assert n_win >= 2


# ---- r9 wave-5 plan pins ----------------------------------------------


def test_ancova_two_passes_one_scan_each(spark, sf_dir):
    # per-group + grand sufficient stats both read the checkpointed row
    # projection; the F/adjusted-mean arithmetic rides a broadcast
    df = SPECS["q_agg_ancova"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the row checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_wilson_ci_single_cell_rollup(spark, sf_dir):
    df = SPECS["q_agg_wilson_ci"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_dunn_pairs_on_rank_table(spark, sf_dir):
    df = SPECS["q_agg_dunn"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the cell checkpoint
    assert "ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_periodogram_windows_partitioned(spark, sf_dir):
    # the period fan-out multiplies the grid, and every window
    # partitions by series
    df = SPECS["q_timeseries_periodogram"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


def test_meta_i2_constant_tail(spark, sf_dir):
    df = SPECS["q_events_meta_i2"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the segment checkpoint
    assert "ExistingRDD" in plan
    assert "Window" not in plan


# ---- r9 wave-6 plan pins ----------------------------------------------


def test_cmh_single_cell_rollup(spark, sf_dir):
    df = SPECS["q_agg_cmh_test"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_cointegration_grid_bounded(spark, sf_dir):
    # the fact feeds three filtered rollups at most; residual/DF joins
    # run on checkpointed grids
    df = SPECS["q_timeseries_cointegration"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") <= 3
    assert "ExistingRDD" in plan


def test_self_bleu_bigram_keyed_never_pairwise(spark, sf_dir):
    # df join-back is co-keyed on the bigram; no nested loop anywhere
    df = SPECS["q_text_self_bleu"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "documents.parquet" not in plan  # folded into the bigram checkpoint
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan


def test_capture_recapture_one_user_pass(spark, sf_dir):
    df = SPECS["q_agg_capture_recapture"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "Window" not in plan


def test_hits_edges_checkpointed_once(spark, sf_dir):
    # the per-iteration joins all read the eagerly-checkpointed distinct
    # edge table; the fact never re-scans inside the loop
    df = SPECS["q_graph_hits"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "lineitem.parquet" not in plan
    assert "orders.parquet" not in plan
    assert "ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan


# ---- r9 wave-7 plan pins ----------------------------------------------


def test_matryoshka_probe_broadcast_windows_per_probe(spark, sf_dir):
    df = SPECS["q_embed_matryoshka"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # corpus x broadcast(probes)
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(probe_id" in line, line


def test_permutation_test_single_exploded_agg(spark, sf_dir):
    # one R-way explode into one keyed agg; no window anywhere
    df = SPECS["q_agg_permutation_test"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the base checkpoint
    assert "ExistingRDD" in plan
    assert "Window" not in plan
    assert "Generate" in plan  # the replicate explode


def test_equalized_odds_constant_tail(spark, sf_dir):
    df = SPECS["q_ml_equalized_odds"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "events.parquet" not in plan  # folded into the user checkpoint
    assert "ExistingRDD" in plan
    assert "Window" not in plan


def test_ngram_coverage_bigram_keyed(spark, sf_dir):
    # both halves read the checkpointed bigram table; the coverage join
    # is co-keyed on the bigram, never pairwise
    df = SPECS["q_text_ngram_coverage"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "documents.parquet" not in plan
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


# ---- r9 wave-8 plan pins ----------------------------------------------


def test_dsir_bucket_keyed_model_join(spark, sf_dir):
    # the n-gram model is a bucket-keyed table joined back broadcast;
    # nothing pairwise, no window
    df = SPECS["q_mix_dsir"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "documents.parquet" not in plan  # folded into the ws checkpoint
    assert "ExistingRDD" in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_multimodal_dup_clusters_band_equi_join(spark, sf_dir):
    # candidates ride the band equi-join over the checkpointed 8-byte
    # signatures; payload bytes never join
    df = SPECS["q_multimodal_dup_clusters"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


# ---- r9 wave-9 plan pins ----------------------------------------------


def test_spc_control_windows_partitioned(spark, sf_dir):
    df = SPECS["q_timeseries_spc_control"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


def test_power_analysis_broadcast_baseline(spark, sf_dir):
    # the observed baseline is a 1-row broadcast against the literal
    # MDE grid; the fact feeds one per-user rollup
    df = SPECS["q_events_power_analysis"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


# ---- r10 wave-1 plan pins -----------------------------------------------


def test_minhash_md5_candidates_equi_join_on_checkpointed_sigs(spark, sf_dir):
    # signatures are checkpointed once (ExistingRDD); candidates ride a
    # hash equi-join on (band_id, band_hash) — never a nested loop
    df = SPECS["q_dedup_minhash"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_lsh_bucket_audit_no_joins(spark, sf_dir):
    # the audit is two rollups over the checkpointed banding — strictly
    # cheaper than the dedup it guards: no join of any kind
    df = SPECS["q_profile_lsh_buckets"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_multiprobe_ivf_cell_blocked(spark, sf_dir):
    # same contract as single-probe: assignment folds behind the lazy
    # checkpoint; the pair stage is an EQUI-join keyed on the cell
    df = SPECS["q_dedup_semantic_ivf_mp"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert "NestedLoop" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


# ---- r10 wave-2 plan pins -----------------------------------------------


def test_mood_median_domain_bounded_single_fact_scan(spark, sf_dir):
    df = SPECS["q_agg_mood_median"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # the fact feeds exactly one cell rollup (checkpointed, re-read)
    assert "events.parquet" not in plan or plan.count("events.parquet") == 1
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_cochran_q_constant_tail(spark, sf_dir):
    df = SPECS["q_agg_cochran_q"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure rollups, no windows at all


def test_friedman_windows_ride_the_grid(spark, sf_dir):
    # both windows partition by day (or day,value) — never unpartitioned
    df = SPECS["q_agg_friedman"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(d" in line, line


def test_jonckheere_grid_self_join_is_equi(spark, sf_dir):
    df = SPECS["q_agg_jonckheere"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_cliffs_delta_domain_join_only(spark, sf_dir):
    df = SPECS["q_agg_cliffs_delta"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


# ---- r10 wave-3 plan pins -----------------------------------------------


def test_log_loss_single_fact_rollup(spark, sf_dir):
    # ex is checkpointed once (ExistingRDD); the fact never re-scans
    df = SPECS["q_ml_log_loss"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert plan.count("events.parquet") == 0
    assert "Window" not in plan


def test_spiegelhalter_no_windows(spark, sf_dir):
    df = SPECS["q_ml_spiegelhalter_z"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_youden_sweep_is_one_window_pass(spark, sf_dir):
    # the sweep must ride cumulative windows over the distinct-score
    # table, not re-scan the fact per threshold
    df = SPECS["q_ml_youden_optimal"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert plan.count("events.parquet") == 0


def test_mrr_map_python_stage_is_arrow_batched(spark, sf_dir):
    for name in ("q_ml_mrr", "q_ml_map"):
        df = SPECS[name].func(spark, sf_dir)
        plan = formatted_plan(df)
        # the only Python execution node is the Arrow-batched GEMM map
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
        # rank windows partition by probe_id
        eplan = df._jdf.queryExecution().executedPlan().toString()
        for line in eplan.splitlines():
            if "windowspecdefinition" in line:
                assert "windowspecdefinition(probe_id" in line, line


# ---- r10 wave-4 plan pins -----------------------------------------------


def test_wave4_timeseries_windows_ride_series_grid(spark, sf_dir):
    # every window in the wave-4 diagnostics partitions by the series
    # key (et) — never an unpartitioned corpus-wide window
    for name in (
        "q_timeseries_pettitt",
        "q_timeseries_variance_ratio",
        "q_timeseries_turning_points",
        "q_timeseries_dickey_fuller",
        "q_timeseries_kpss",
        "q_timeseries_permutation_entropy",
    ):
        df = SPECS[name].func(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition" in line:
                assert "windowspecdefinition(et" in line, (name, line)


def test_wave4_lag_joins_are_equi(spark, sf_dir):
    for name in ("q_timeseries_variance_ratio", "q_timeseries_dickey_fuller"):
        df = SPECS[name].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ"), name


# ---- r10 wave-5 plan pins -----------------------------------------------


def test_lexical_richness_two_rollups_no_joins(spark, sf_dir):
    df = SPECS["q_text_lexical_richness"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_vocab_overlap_token_keyed_join(spark, sf_dir):
    df = SPECS["q_text_source_vocab_overlap"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_pa_and_rich_club_valved_wedge(spark, sf_dir):
    for name in ("q_graph_preferential_attachment", "q_graph_rich_club"):
        df = SPECS[name].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "NestedLoop" not in plan.replace(
            "BroadcastNestedLoopJoin", "BNLJ"
        ), name


def test_srm_single_rollup(spark, sf_dir):
    df = SPECS["q_events_srm"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "Window" not in plan


# ---- r10 wave-6 plan pins -----------------------------------------------


def test_gamma_somers_domain_grid_join(spark, sf_dir):
    df = SPECS["q_agg_gamma_somers"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


def test_qq_table_decile_grid_broadcast(spark, sf_dir):
    df = SPECS["q_agg_qq_table"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # the inequality join against the 9-row grid must be the BROADCAST
    # nested loop (9 rows), never a shuffled cartesian
    assert "CartesianProduct" not in plan


def test_lorenz_no_single_reducer_window(spark, sf_dir):
    # ranks come from the two-pass global_rank core: every window in the
    # plan partitions by pid (partition-local row_number) — an
    # unpartitioned window over users would be the single-reducer trap
    df = SPECS["q_events_lorenz_users"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(pid" in line or "decile" in line, line


# ---- r10 wave-7 plan pins -----------------------------------------------


def test_cvm_single_cell_rollup(spark, sf_dir):
    df = SPECS["q_agg_cvm_test"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan  # cells checkpointed once
    assert "events.parquet" not in plan or plan.count("events.parquet") <= 1


def test_trimmed_mean_windows_per_group(spark, sf_dir):
    df = SPECS["q_agg_trimmed_mean"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


def test_page_trend_windows_ride_grid(spark, sf_dir):
    df = SPECS["q_timeseries_page_trend"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert (
                "windowspecdefinition(d" in line
                or "windowspecdefinition(et" in line
            ), line


def test_topk_accuracy_arrow_kernel(spark, sf_dir):
    df = SPECS["q_ml_topk_accuracy"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


# ---- r10 wave-8 plan pins -----------------------------------------------


def test_kuiper_wasserstein_single_cell_rollup(spark, sf_dir):
    for name in ("q_agg_kuiper", "q_agg_wasserstein"):
        df = SPECS[name].func(spark, sf_dir)
        plan = formatted_plan(df)
        assert "ExistingRDD" in plan, name  # cells checkpointed once
        assert plan.count("events.parquet") <= 1, name


def test_median_ci_windows_per_group(spark, sf_dir):
    df = SPECS["q_agg_median_ci"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


def test_journey_entropy_user_partitioned_lag(spark, sf_dir):
    df = SPECS["q_events_journey_entropy"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(user_id" in line, line


# ---- r10 wave-9 plan pins -----------------------------------------------


def test_holm_windows_on_test_table(spark, sf_dir):
    # windows run on the m-row ranked TEST table (bounded by test count)
    df = SPECS["q_agg_holm"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") <= 1


def test_order_all_single_rollup(spark, sf_dir):
    df = SPECS["q_sql_order_all"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan
    assert "Join" not in plan


# ---- r10 wave-10 plan pins ------------------------------------------------


def test_threshold_curve_pair_set_computed_once(spark, sf_dir):
    df = SPECS["q_dedup_threshold_curve"].func(spark, sf_dir)
    plan = formatted_plan(df)
    # the pair-agreement table is checkpointed once and the grid rides
    # broadcast joins — never a re-run of the minhash pipeline per
    # threshold
    assert "ExistingRDD" in plan
    assert "documents.parquet" not in plan


def test_length_profile_windows_per_source(spark, sf_dir):
    df = SPECS["q_text_length_profile"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(source" in line, line


# ---- r10 wave-11 plan pin --------------------------------------------------


def test_hilbert_topk_no_global_sort(spark, sf_dir):
    df = SPECS["q_sort_hilbert"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


# ---- r10 wave-12 plan pins --------------------------------------------------


def test_ad_single_cell_rollup(spark, sf_dir):
    df = SPECS["q_agg_ad_test"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan
    assert plan.count("events.parquet") <= 1


def test_dedup_impact_hash_keyed_shuffle(spark, sf_dir):
    # the group key is (source, sha256) — the shuffle never carries text
    df = SPECS["q_text_dedup_impact"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "sha2" in plan
    assert "Join" not in plan


# ---- r10 wave-13 plan pin ----------------------------------------------------


def test_centroid_drift_single_explode_no_windows(spark, sf_dir):
    df = SPECS["q_embed_centroid_drift"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" in plan  # the 64-way posexplode
    assert "Window" not in plan
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "BNLJ")


# ---- r10 wave-14 plan pin ----------------------------------------------------


def test_ewma_control_windows_per_series(spark, sf_dir):
    df = SPECS["q_timeseries_ewma_control"].func(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(et" in line, line


# ---- r10 wave-15 plan pin ----------------------------------------------------


def test_poisson_bootstrap_single_pass_no_shuffle_of_fact(spark, sf_dir):
    # all replicates ride ONE fanned-out map over one scan into a
    # combinable rollup — no resampling shuffle, no window
    df = SPECS["q_sample_poisson_bootstrap"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") == 1
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 10-row replicate fan-out


# ---- r10 wave-16 plan pin ----------------------------------------------------


def test_theil_decomp_cell_bounded(spark, sf_dir):
    df = SPECS["q_agg_theil_decomp"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ExistingRDD" in plan  # cells + group table checkpointed
    assert "Window" not in plan


# ---- r10 wave-17 plan pins ---------------------------------------------------


def test_by_windows_on_test_table(spark, sf_dir):
    df = SPECS["q_agg_benjamini_yekutieli"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("events.parquet") <= 1


def test_temperature_plan_single_rollup(spark, sf_dir):
    df = SPECS["q_mix_temperature_plan"].func(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "ExistingRDD" in plan  # weight table checkpointed once
