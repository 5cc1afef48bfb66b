"""Scale-pattern tests: bucketed co-located joins, distributed k-means.

These pin the 100 TB mechanics that the query suite can't see at tiny
SF: a bucketed table pair joins WITHOUT any exchange (the co-location
contract), and the IVF quantizer's k-means trains without ever
materializing more than k·d floats on the driver.
"""

from __future__ import annotations

import pytest

from mongodb_iceberg_sync_spark.plans.explain import count_shuffles, formatted_plan


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """Two tables bucketed+sorted by the join key into the same bucket
    count — the write-time layout that makes every future join on that
    key shuffle-free."""
    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.range(0, 1000).selectExpr("id AS o_orderkey", "id % 7 AS o_status")
    li = spark.range(0, 5000).selectExpr(
        "id % 1000 AS l_orderkey", "id AS l_item", "id * 1.5 AS l_price"
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "o"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "li"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    to, tl = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(tl).join(
            spark.table(to),
            spark.table(tl).l_orderkey == spark.table(to).o_orderkey,
        )
        plan = formatted_plan(j)
        # co-located: sort-merge join straight over the bucket files —
        # zero exchanges, and the sortBy makes the per-bucket Sort free
        assert count_shuffles(j) == 0, plan
        assert "SortMergeJoin" in plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    _, tl = bucketed_pair
    g = spark.table(tl).groupBy("l_orderkey").count()
    assert count_shuffles(g) == 0
    assert g.count() == 1000


def test_kmeans_fit_deterministic_and_bounded(spark):
    from mongodb_iceberg_sync_spark.functions.vector import kmeans_fit

    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = kmeans_fit(df, "embedding", "vec_id", k=4, iters=2)
    c2 = kmeans_fit(df, "embedding", "vec_id", k=4, iters=2)
    assert c1 == c2  # same data -> bit-identical centroids
    assert len(c1) == 4 and all(len(c) == 8 for c in c1)
    # iterating must actually move the centroids off the seed vectors
    seeds = [[float(x) for x in r[1]] for r in rows[:4]]
    assert c1 != seeds


def test_salted_agg_equals_plain_groupby_randomized(spark):
    import random

    from pyspark.sql import functions as F

    from mongodb_iceberg_sync_spark.functions.skew import salted_agg

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        # skewed: ~half the rows land on one key
        rows = [
            (
                "hot" if rng.random() < 0.5 else f"k{rng.randint(0, 20)}",
                rng.randint(-1000, 1000),
            )
            for _ in range(2000)
        ]
        df = spark.createDataFrame(rows, "k string, v long")
        got = {
            r.k: (r.s, r.n, r.lo, r.hi)
            for r in salted_agg(
                df,
                ["k"],
                [
                    ("sum", "v", "s"),
                    ("count", "v", "n"),
                    ("min", "v", "lo"),
                    ("max", "v", "hi"),
                ],
                n_salts=8,
            ).collect()
        }
        exp = {
            r.k: (r.s, r.n, r.lo, r.hi)
            for r in df.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count("v").alias("n"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .collect()
        }
        assert got == exp, f"seed {seed}"


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE skew-join posture actually fires: a join with
    one hot key (90% of rows) must show skew=true in the executed
    adaptive plan instead of leaving one straggler partition."""
    from pyspark.sql import functions as F

    conf = {
        # thresholds low enough that the synthetic hot key qualifies
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
        j = left.join(right, "k")
        # execute j's OWN queryExecution — count()/write() build
        # separate plans, leaving j's adaptive plan unfinalized
        assert len(j.collect()) == 180_010
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning: a selective dim filter must
    inject a bloom filter (might_contain) on the fact side, dropping
    non-joining fact rows BEFORE the join shuffle. Off by default for
    small scans (applicationSideScanSizeThreshold=10GB — it exists FOR
    the 100 TB case); lowering the threshold proves the session is
    otherwise eligible and pins the mechanism."""
    from pyspark.sql import functions as F

    from mongodb_iceberg_sync_spark.plans.explain import formatted_plan

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 500000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = formatted_plan(j)
        assert "bloom" in plan.lower(), plan[:1500]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_ann_lsh_recall_vs_exact_knn(spark):
    """q_sim_ann_lsh recall@3 vs the exact GEMM kNN must clear 0.5 on
    the weakly-clustered synthetic embeddings (measured 0.60 at sf0.01
    with 24 bits x 6 bands; real near-dup corpora sit far higher
    because per-bit agreement grows with cosine). Also pins full
    coverage: every vector must surface >=1 candidate."""
    import numpy as np

    from mongodb_iceberg_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    ann = all_specs()["q_sim_ann_lsh"].func(spark, sf).toPandas()

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    ids = emb["vec_id"].to_numpy()
    M = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    np.fill_diagonal(S, -2.0)
    exact = {
        vid: {ids[j] for j in np.argsort(-S[i], kind="stable")[:3]}
        for i, vid in enumerate(ids)
    }

    got: dict[int, set] = {}
    for r in ann.itertuples():
        got.setdefault(r.vec_id, set()).add(r.neighbor_id)

    assert len(got) == len(exact), "every vector must have candidates"
    hits = sum(len(got[v] & exact[v]) for v in exact)
    recall = hits / (3 * len(exact))
    assert recall >= 0.5, f"recall@3 {recall:.3f} below floor"


def test_hll_estimate_within_5pct_of_exact(spark):
    """q_agg_hll's sketch estimate must land within 5% of the exact
    distinct count (lgK=14 gives ~0.8% standard error — 5% is a loose,
    version-stable bound). The exact count is computed HERE, test-side:
    shipping it inside the operator forced an exact-distinct key shuffle
    that dominated the sketch's own cost 50:1 at the 100x tier (r6)."""
    from mongodb_iceberg_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    out = all_specs()["q_agg_hll"].func(spark, sf).collect()
    assert len(out) == 3
    import pyspark.sql.functions as F

    exact_rows = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("exact"))
        .collect()
    )
    exact = {r.l_returnflag: r.exact for r in exact_rows}
    for row in out:
        est = row.approx_distinct_orders
        ex = exact[row.l_returnflag]
        assert abs(est - ex) <= 0.05 * ex, (row, ex)


def test_pq_recall_vs_exact_topk(spark):
    """q_sim_pq's quantized top-10 must recover >=60% of the exact
    top-10 for the fixed probe (measured 0.8 at sf0.01 with 16
    subspaces x 64 centroids on the near-random synthetic embeddings;
    real corpora with structure quantize better)."""
    import numpy as np

    from mongodb_iceberg_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    pq_ids = [r.vec_id for r in all_specs()["q_sim_pq"].func(spark, sf).collect()]

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    ids = emb["vec_id"].to_numpy()
    M = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    probe = Mn[ids == 0][0]
    sims = Mn @ probe
    mask = ids != 0
    exact = set(ids[mask][np.argsort(-sims[mask], kind="stable")[:10]])
    recall = len(set(pq_ids) & exact) / 10
    assert recall >= 0.6, f"PQ recall@10 {recall} below floor"


def test_profile_sketch_within_3rsd_of_exact(spark):
    """q_profile_columns_sketch must agree with the exact profile on
    everything except n_distinct, and each approx count must land
    within 3*rsd (rsd=0.02 -> 6%) of the exact distinct count — the
    bound that makes the sketch a drop-in 100 TB default."""
    from mongodb_iceberg_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    specs = all_specs()
    exact = {r.col: r for r in specs["q_profile_columns"].func(spark, sf).collect()}
    sketch = {
        r.col: r for r in specs["q_profile_columns_sketch"].func(spark, sf).collect()
    }
    assert set(exact) == set(sketch)
    for c, e in exact.items():
        s = sketch[c]
        assert (s.n_nonnull, s.n_null, s.min_val, s.max_val) == (
            e.n_nonnull, e.n_null, e.min_val, e.max_val
        ), c
        assert abs(s.n_distinct_approx - e.n_distinct) <= 0.06 * max(e.n_distinct, 1), (
            c, s.n_distinct_approx, e.n_distinct
        )


def test_percentile_sketch_tracks_exact(spark):
    """approx_percentile(accuracy=10000) must land within the
    Greenwald-Khanna rank-error of the exact per-group percentiles —
    at sf0.01 group sizes (~thousands) the estimate is near-exact, so
    1% relative value error is a loose, version-stable bound."""
    from mongodb_iceberg_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    specs = all_specs()
    exact = {r.o_orderpriority: r for r in specs["q_agg_percentile"].func(spark, sf).collect()}
    sketch = {
        r.o_orderpriority: r
        for r in specs["q_agg_percentile_sketch"].func(spark, sf).collect()
    }
    assert set(exact) == set(sketch)
    for g, e in exact.items():
        s = sketch[g]
        for q in ("p25", "p50", "p75", "p99"):
            assert abs(getattr(s, q) - getattr(e, q)) <= 0.01 * abs(getattr(e, q)), (
                g, q, getattr(s, q), getattr(e, q)
            )
