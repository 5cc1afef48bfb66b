"""Iterative graph analytics (SURVEY.md §2B extension family).

Complements the Pregel-style hash-min label propagation in
``operators/dedup.py`` (connected components) with a weighted
iterative algorithm: PageRank over the supplier<->customer
transaction graph. No oracle — DuckDB has no iterative fixpoint with
damping — so correctness is pinned by ``tests/test_graph.py`` against
a dense NumPy power iteration at sf0.001.

Scale design: each iteration is one equi-join (ranks onto edges, both
hash-partitioned by src) plus one map-side-combinable groupBy — the
classic BSP superstep. Lineage is cut with localCheckpoint every
iteration so the plan stays O(1) deep; the driver never sees rank
vectors, only the final top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ._util import t

_DAMPING = 0.85
_ITERS = 10
_CUST_NS = 1_000_000  # customer node ids offset into their own namespace


def _edges(spark, sf_dir):
    """Symmetric supplier<->customer arcs from lineitem x orders.

    Both directions so no node dangles (every node has out-degree >= 1,
    the power iteration needs no dangling-mass correction).
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("supp"),
            (F.col("o_custkey").cast("long") + _CUST_NS).alias("cust"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    rev = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    return fwd.unionByName(rev)


@register(
    "q_graph_pagerank",
    family="graph",
    oracle=None,  # iterative fixpoint — pinned by tests/test_graph.py vs numpy
    doc="PageRank over the bipartite supplier<->customer graph "
    "(symmetric arcs from co-occurrence in orders). 10 damped power-"
    "iteration supersteps, each = ranks-onto-edges equi-join + "
    "grouped sum — both sides hash-partitioned on the join key, so a "
    "cluster reuses one co-partitioning across all iterations; "
    "localCheckpoint caps lineage depth at O(1). Returns the top-50 "
    "nodes with a node-id tie-break (deterministic). The driver "
    "materializes nothing per-iteration — only the final top-k "
    "crosses to the caller.",
)
def q_graph_pagerank(spark, sf_dir):
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # weighted edges: each arc carries 1/deg of its source's rank
    wedges = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_nodes = nodes.count()  # O(1) driver scalar (graph size)
    base = (1.0 - _DAMPING) / n_nodes

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(_ITERS):
        contribs = (
            wedges.join(ranks, wedges.src == ranks.node)
            .select("dst", (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # symmetric arcs mean every node receives inflow; keep the
        # left join anyway so a degenerate tiny-sf graph can't drop rows
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(_DAMPING) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(50)
    )
