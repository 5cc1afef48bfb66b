"""PageRank pinned against a dense NumPy power iteration at sf0.001.

The operator has no SQL oracle (iterative fixpoint), so the reference
is an independent dense implementation of the same recurrence:
r' = (1-d)/N + d * P^T r with P row-stochastic over symmetric arcs.
"""

from __future__ import annotations

import numpy as np
import pytest

from mongodb_iceberg_sync_spark.operators.graph import (
    _DAMPING,
    _ITERS,
    _edges,
    q_graph_pagerank,
)


@pytest.fixture(scope="module")
def edge_list(spark, sf_dir):
    return [(r["src"], r["dst"]) for r in _edges(spark, sf_dir).collect()]


def _numpy_pagerank(edge_list):
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    base = (1.0 - _DAMPING) / n
    for _ in range(_ITERS):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[idx[d]] += r[idx[s]] / deg[idx[s]]
        r = base + _DAMPING * inflow
    return {node: r[idx[node]] for node in nodes}


def test_pagerank_matches_numpy(spark, sf_dir, edge_list):
    expected = _numpy_pagerank(edge_list)
    got = q_graph_pagerank(spark, sf_dir).collect()
    assert len(got) == min(50, len(expected))
    # the distributed ranks must match the dense recurrence to float
    # accumulation noise, and the ordering must be the true top-k
    # the operator rounds ranks to 8dp BEFORE the top-k sort, so mirror
    # that here or near-ties order differently
    top = sorted(expected.items(), key=lambda kv: (-round(kv[1], 8), kv[0]))[
        : len(got)
    ]
    for row, (node, rank) in zip(got, top):
        assert row["node"] == node
        assert row["rank"] == pytest.approx(rank, abs=1e-6)


def test_pagerank_mass_conserved(spark, sf_dir, edge_list):
    # with symmetric arcs there are no dangling nodes, so total rank
    # mass stays 1 after every superstep
    expected = _numpy_pagerank(edge_list)
    assert sum(expected.values()) == pytest.approx(1.0, abs=1e-9)


def test_jaccard_supplier_hub_valve(spark, tmp_path):
    """The r9 supplier-side valve drops a mega-hub supplier from the
    wedge input entirely: its pairs never reach the output, while
    normal suppliers' pairs are unaffected (exactness below the cap)."""
    from mongodb_iceberg_sync_spark.operators.graph import (
        _JC_MAX_SDEG,
        q_graph_jaccard,
    )

    # hub supplier 999 -> customers 1..cap+4 (degree > _JC_MAX_SDEG);
    # suppliers 1 and 2 -> customers 1..100 (well below the cap)
    edges = [(999, c) for c in range(1, _JC_MAX_SDEG + 5)]
    edges += [(s, c) for s in (1, 2) for c in range(1, 101)]
    rows = [(i, s, c) for i, (s, c) in enumerate(edges)]
    li = spark.createDataFrame(
        [(ok, s) for ok, s, _ in rows], "l_orderkey long, l_suppkey long"
    )
    o = spark.createDataFrame(
        [(ok, c) for ok, _, c in rows], "o_orderkey long, o_custkey long"
    )
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    o.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = q_graph_jaccard(spark, str(tmp_path)).collect()
    # without the valve, (1,999) and (2,999) would rank in the top-k
    assert all(999 not in (r.s1, r.s2) for r in got)
    assert [(r.s1, r.s2, r.shared) for r in got] == [(1, 2, 100)]
    (r,) = got
    # degrees stay EXACT from the full pair set even with the hub gone
    assert (r.deg1, r.deg2, r.jaccard) == (100, 100, 1.0)


# ---- HITS pinned against a dense numpy power iteration (r9) ----------


def _numpy_hits(edge_list):
    from mongodb_iceberg_sync_spark.operators.graph import (
        _CUST_NS,
        _HITS_ITERS,
    )

    directed = sorted({(s, d) for s, d in edge_list if s < _CUST_NS})
    hubs = sorted({s for s, _ in directed})
    auths = sorted({d for _, d in directed})
    hi = {n: i for i, n in enumerate(hubs)}
    ai = {n: i for i, n in enumerate(auths)}
    # lockstep with the operator's r10 schedule: unnormalized half-steps,
    # one mid-loop rescale (magnitude guard), one final L1 normalization
    h = np.ones(len(hubs))
    for i in range(_HITS_ITERS):
        a = np.zeros(len(auths))
        for s, d in directed:
            a[ai[d]] += h[hi[s]]
        h = np.zeros(len(hubs))
        for s, d in directed:
            h[hi[s]] += a[ai[d]]
        if i == _HITS_ITERS // 2 - 1:
            h /= h.sum()
    h /= h.sum()
    return {n: h[hi[n]] for n in hubs}


def test_hits_matches_numpy(spark, sf_dir, edge_list):
    from mongodb_iceberg_sync_spark.operators.graph import (
        _HITS_TOPK,
        q_graph_hits,
    )

    expected = _numpy_hits(edge_list)
    got = q_graph_hits(spark, sf_dir).collect()
    assert len(got) == min(_HITS_TOPK, len(expected))
    top = sorted(expected.items(), key=lambda kv: (-round(kv[1], 8), kv[0]))[
        : len(got)
    ]
    for row, (node, score) in zip(got, top):
        assert row["node"] == node
        assert row["hub_score"] == pytest.approx(score, abs=1e-6)


def test_hits_scores_normalized(spark, sf_dir):
    from mongodb_iceberg_sync_spark.operators.graph import q_graph_hits

    got = q_graph_hits(spark, sf_dir).collect()
    # L1-normalized hub vector: every score in (0, 1), top-k sums < 1
    assert all(0.0 < r["hub_score"] < 1.0 for r in got)
    assert sum(r["hub_score"] for r in got) < 1.0 + 1e-9
