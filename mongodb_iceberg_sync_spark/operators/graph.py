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
from ._util import bcast_gate, t

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
    if n_nodes == 0:  # empty graph: empty ranking
        return spark.createDataFrame([], "node long, rank double")
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


_TRI_TOPK = 20


@register(
    "q_graph_triangles",
    family="graph",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_nodes AS (SELECT unnest([a, b, c]) AS part FROM tri)
    SELECT part, CAST(count(*) AS BIGINT) AS tri_count
    FROM tri_nodes
    GROUP BY part
    ORDER BY tri_count DESC, part
    LIMIT {_TRI_TOPK}
    """,
    doc="Distributed triangle counting over the part co-purchase graph "
    "(parts sharing an order are adjacent): per-node triangle "
    "participation, top-20 — the local-clustering primitive behind "
    "community/bot detection. Spark orients every edge from lower to "
    "higher (degree, id) — the classic compact-forward trick that "
    "bounds each node's out-wedge fan-out by O(sqrt(m)), so the "
    "wedge join stays near-linear even on power-law graphs where "
    "id-ordering would explode the hub's wedge set. The ORACLE "
    "orients by id instead: both orientations enumerate exactly the "
    "same triangle SET (each triangle once, at its smallest vertex "
    "under the respective total order), so results match while the "
    "physical strategies differ — that equality is the point. Scale: "
    "three self-equi-joins on edge keys; the degree table is O(V) "
    "and broadcast here (key-shuffle join once V outgrows the "
    "broadcast threshold — same plan, AQE decides).",
)
def q_graph_triangles(spark, sf_dir):
    # r12: one exchange on the co-occurrence key for distinct + both
    # self-join legs (see q_graph_clustering_coeff)
    pp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
    )
    a, b = pp.alias("a"), pp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # cut lineage: edges feed degree + three join legs
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_dir = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    # the closing leg joins O(wedges) rows against O(E) edges: a
    # shuffled-HASH join builds the edge side per partition instead of
    # sort-merge sorting the wedge stream (the wedge side is ~40x the
    # edge side here and only grows with the graph — guide §3.1)
    e1, e2 = e_dir.alias("e1"), e_dir.alias("e2")
    e3 = e_dir.hint("shuffle_hash").alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count("*").alias("tri_count"))
        .orderBy(F.col("tri_count").desc(), "part")
        .limit(_TRI_TOPK)
    )


_BFS_SRC = 1   # supplier node s_suppkey=1
_BFS_K = 4     # hop bound


@register(
    "q_graph_bfs",
    family="graph",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey + {1_000_000} AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT supp AS src, cust AS dst FROM pairs
      UNION ALL
      SELECT cust AS src, supp AS dst FROM pairs
    ), walk(node, d) AS (
      SELECT CAST({_BFS_SRC} AS BIGINT) AS node, 0 AS d
      UNION
      SELECT e.dst AS node, w.d + 1 AS d
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < {_BFS_K}
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist
    FROM walk GROUP BY node ORDER BY dist, node
    """,
    doc="Bounded-hop BFS shortest hop-distance from one node over the "
    "supplier<->customer graph — the reachability/blast-radius query. "
    "Frontier-style supersteps: each hop is ONE equi-join of the "
    "current frontier onto edges plus a left-anti join against the "
    "visited set (so the frontier only ever carries NEWLY reached "
    "nodes — the BFS invariant that first arrival is minimal "
    "distance makes a min-aggregation unnecessary); localCheckpoint "
    "per hop caps lineage depth at O(1) like the other iterative "
    "operators. Work per superstep is O(frontier ⋈ edges), the "
    "visited set never exceeds the node count, and nothing "
    "per-iteration reaches the driver. The oracle walks the same "
    "graph with a recursive CTE under DISTINCT-state recursion "
    "(UNION, not UNION ALL — path-count explosion is exponential on "
    "a dense bipartite graph) and min-aggregates hop counts.",
)
def q_graph_bfs(spark, sf_dir):
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    dist = spark.range(1).select(
        F.lit(_BFS_SRC).cast("long").alias("node"), F.lit(0).alias("d")
    )
    frontier = dist
    for k in range(1, _BFS_K + 1):
        nxt = (
            frontier.join(edges, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), F.lit(k).alias("d"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist.select(
        "node", F.col("d").cast("long").alias("dist")
    ).orderBy("dist", "node")


_CC_EDGE_CAP = 4000   # keep the STRONGEST ties: smallest co-occurrence
                      # level whose qualifying pair count fits this cap
_CC_MAX_ROUNDS = 30   # pointer doubling => rounds ~ log2(diameter)


@register(
    "q_graph_components",
    family="graph",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT l.l_suppkey AS s, o.o_custkey + {_CUST_NS} AS c,
             count(DISTINCT l.l_orderkey) AS n
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), hist AS (
      SELECT n, count(*) AS cnt FROM pairs GROUP BY n
    ), cum AS (
      SELECT n, sum(cnt) OVER (ORDER BY n DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
      FROM hist
    ), thr AS (
      SELECT coalesce(min(n) FILTER (WHERE cg <= {_CC_EDGE_CAP}), max(n)) AS t
      FROM cum
    ), e0 AS (
      SELECT s AS src, c AS dst FROM pairs WHERE n >= (SELECT t FROM thr)
    ), e AS (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ), walk(node, lab) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, w.lab FROM walk w JOIN e ON e.src = w.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(lab) AS BIGINT) AS comp
    FROM walk GROUP BY node ORDER BY comp, node
    """,
    doc="Connected components over the REPEAT-business graph: supplier "
    "and customer are adjacent when they share enough distinct orders. "
    "'Enough' is ADAPTIVE — the smallest co-occurrence level whose "
    "qualifying pair count fits a fixed edge cap — because any absolute "
    "threshold is wrong at some scale (a fixed >=4 empties the graph at "
    "sf0.1, where the max shared-order count is 3, and drowns it at "
    "sf0.001). The level is chosen from the co-occurrence HISTOGRAM — "
    "one tiny aggregate (rows = distinct levels, ~10), its running "
    "total scanned on the driver — so the strongest-ties edge set is "
    "bounded and deterministic at every scale, which is exactly how a "
    "100 TB co-occurrence graph must be capped before components run. "
    "The standalone, oracle-checked form of the hash-min label "
    "propagation q_dedup_clusters uses internally: each round is ONE "
    "edge join (labels flow to neighbours) + ONE label-of-label "
    "self-join (pointer doubling) + a min-combine, so convergence is "
    "O(log diameter) supersteps, not O(diameter). Labels are node ids "
    "(exact integers), so the component id — min reachable node id — "
    "is bitwise cross-engine. localCheckpoint per round caps lineage; "
    "a non-converged exit raises rather than returning wrong labels. "
    "The oracle picks the identical threshold via a window running "
    "total and walks the same edges with DISTINCT-state recursion.",
)
def q_graph_components(spark, sf_dir):
    from ..functions.graph_algs import connected_components

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            (F.col("o_custkey").cast("long") + _CUST_NS).alias("c"),
            "l_orderkey",
        )
        .distinct()  # (s, c, order) triples -> count distinct orders per pair
        .groupBy("s", "c")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # read twice: histogram + edge filter
    )
    # adaptive strongest-ties threshold: histogram rows = distinct
    # co-occurrence levels (a handful), so the collect is O(levels)
    levels = sorted(
        [(r["n"], r["cnt"]) for r in
         pairs.groupBy("n").agg(F.count("*").alias("cnt")).collect()],
        reverse=True,
    )
    thr, cum = (levels[0][0] if levels else 0), 0
    for n, cnt in levels:
        cum += cnt
        if cum > _CC_EDGE_CAP:
            break
        thr = n
    pairs = pairs.filter(F.col("n") >= thr)
    e0 = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = connected_components(edges, max_rounds=_CC_MAX_ROUNDS)
    return labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("comp").cast("long").alias("comp"),
    ).orderBy("comp", "node")


_CN_TOPK = 50


@register(
    "q_graph_common_neighbors",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT s, count(*) AS d FROM pairs GROUP BY s),
    wedge AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS shared
      FROM pairs a JOIN pairs b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT w.s1, w.s2, CAST(w.shared AS BIGINT) AS shared,
           CAST(w.shared AS DOUBLE) / (d1.d + d2.d - w.shared) AS jaccard
    FROM wedge w
    JOIN deg d1 ON d1.s = w.s1
    JOIN deg d2 ON d2.s = w.s2
    ORDER BY jaccard DESC, s1, s2
    LIMIT {_CN_TOPK}
    """,
    doc="Common-neighbor link prediction: supplier pairs ranked by "
    "Jaccard similarity of their customer neighborhoods — the "
    "related-items / who-competes-with-whom primitive behind "
    "recommendation candidates. One wedge self-join keyed on the "
    "shared customer (the same bounded-fan-out shape as "
    "q_graph_triangles' wedge enumeration), per-pair shared counts "
    "map-side-combinable, degrees joined from the O(V) table "
    "(broadcast here; keyed join when V outgrows it — same plan). "
    "The score is one division of exact integers — bitwise "
    "cross-engine without any rounding — and the top-50 is "
    "TakeOrdered with a full (score, s1, s2) tie-break. At 100 TB "
    "the wedge fan-out is bounded per customer; a hub-customer cap "
    "(drop neighborhoods past k) is the documented skew valve, the "
    "same valve the LSH band caps use.",
)
def q_graph_common_neighbors(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r12: one exchange on the wedge key c serves the distinct, both
    # wedge legs (AQE reuses the identical shuffle stage) and the
    # degree aggregations — see q_graph_adamic_adar for the full
    # rationale (a localCheckpoint would forget the partitioning).
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            F.col("o_custkey").cast("long").alias("c"),
        )
        .repartition("c")
        .distinct()
    )
    deg = pairs.groupBy("s").agg(F.count("*").alias("d"))
    a, b = pairs.alias("a"), pairs.alias("b")
    wedge = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("shared"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    return (
        wedge.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            F.col("shared").cast("long").alias("shared"),
            (
                F.col("shared").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("shared"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "s1", "s2")
        .limit(_CN_TOPK)
    )


@register(
    "q_graph_degree_dist",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS supp,
             o.o_custkey + {_CUST_NS} AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT supp AS src, cust AS dst FROM pairs
      UNION ALL
      SELECT cust AS src, supp AS dst FROM pairs
    ),
    deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src
    )
    SELECT degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN src < {_CUST_NS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers
    FROM deg GROUP BY degree ORDER BY degree
    """,
    doc="Degree distribution of the supplier<->customer transaction "
    "graph (same symmetric edge set as q_graph_pagerank/_bfs) — the "
    "first diagnostic every graph pipeline runs: it sizes skew "
    "before any iterative algorithm (the heavy-tail nodes are "
    "exactly the ones that need the fan-out caps q_graph_common_"
    "neighbors documents). Two map-side-combinable aggregations "
    "(degree per node, then nodes per degree) — the second one's "
    "key domain is the distinct-degree set, tiny under any "
    "power law. Split out per node class (suppliers vs customers "
    "via the id namespace) so bipartite skew is visible directly. "
    "Scale: one join + two keyed rollups, nothing iterative.",
)
def q_graph_degree_dist(spark, sf_dir):
    deg = (
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(
                F.when(F.col("src") < _CUST_NS, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_suppliers"),
        )
        .orderBy("degree")
    )


_AA_TOPK = 50
# Hub-customer cap: customers shared by more than this many suppliers are
# EXCLUDED from wedge enumeration. Adamic-Adar already discounts them to
# ~nothing (1/ln(128) ≈ 0.21 per pair, vs ln-of-median ≈ 0.28 at 10x that
# weight), and they are precisely the degree-d customers that would emit
# d² wedges. At the fixture scales the max degree is 102, so the cap is
# semantically invisible there; on a densified graph it converts quadratic
# wedge growth into a hard per-customer bound (the 10x probe's 15x wall
# came entirely from replica densification — real corpora add customers
# at ~constant degree, but the cap makes even the dense case safe).
_AA_MAX_DEG = 128


@register(
    "q_graph_adamic_adar",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cdeg AS (
      SELECT c, count(*) AS d FROM pairs GROUP BY c
      HAVING count(*) BETWEEN 2 AND {_AA_MAX_DEG}
    ),
    kept AS (
      SELECT p.s, p.c,
             CAST(floor(1000000000.0 / ln(d.d) + 0.5) AS BIGINT) AS w
      FROM pairs p JOIN cdeg d ON d.c = p.c
    )
    SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared,
           round(CAST(sum(a.w) AS DOUBLE) / 1e9, 6) AS adamic_adar
    FROM kept a
    JOIN kept b ON a.c = b.c AND a.s < b.s
    GROUP BY a.s, b.s
    ORDER BY sum(a.w) DESC, s1, s2
    LIMIT {_AA_TOPK}
    """,
    doc="Adamic-Adar link prediction: supplier pairs scored by "
    "sum(1/ln(degree(c))) over shared customers c — the classic "
    "refinement of q_graph_common_neighbors that discounts hub "
    "neighbors (a customer shared with everyone says little; a "
    "rare shared customer says a lot). Wedge enumeration keyed on "
    "the shared customer, with the per-neighbor weight attached to "
    "the pair rows BEFORE the self-join so degree rides the wedge "
    f"rows. Hubs above degree {_AA_MAX_DEG} are dropped before any "
    "wedge is emitted (see _AA_MAX_DEG — they are the d² wedge "
    "emitters AND the neighbors the score discounts toward zero, so "
    "the skew valve is principled, invisible at fixture scale, and "
    "mirrored exactly in the oracle). Determinism across engines: "
    "each contribution 1/ln(d) is quantized to an exact integer "
    "(floor(1e9/ln(d)+0.5)) BEFORE the sum, making the aggregate "
    "order-independent and the top-50 argsort stable (ties broken "
    "on (s1,s2)); only the display value divides back to a rounded "
    "double. Scale: per-customer fan-out hard-bounded by the cap, "
    "map-side-combinable group, TakeOrdered top-k.",
)
def q_graph_adamic_adar(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r12 (guide §2.4 share one exchange): repartition on the wedge key c
    # BEFORE the distinct — HashPartitioning(c) satisfies the distinct's
    # ClusteredDistribution(s,c), the cdeg groupBy(c), the kept join and
    # the wedge self-join, so ONE exchange replaces the old four
    # (distinct (s,c) + cdeg partial + both wedge legs re-keying the
    # checkpointed pairs onto c). No localCheckpoint: under AQE a
    # checkpoint forgets its partitioning (plan shows
    # UnknownPartitioning), while identical shuffle stages are reused
    # (ReusedExchange), so both wedge sides read the same one exchange.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            F.col("o_custkey").cast("long").alias("c"),
        )
        .repartition("c")
        .distinct()
    )
    # d >= 2: a customer with one supplier forms no wedge, and excluding
    # it up front keeps the 1/ln(d) weight's divisor nonzero (ln(1)=0
    # would be an ANSI divide-by-zero now that the weight is computed
    # BEFORE the self-join instead of after it).
    cdeg = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d").between(2, _AA_MAX_DEG))
    )
    kept = pairs.join(cdeg, "c").select(
        "s",
        "c",
        F.floor(F.lit(1_000_000_000.0) / F.log(F.col("d")) + F.lit(0.5))
        .cast("long")
        .alias("w"),
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared"),
            F.sum(F.col("a.w")).alias("w_sum"),
        )
        .orderBy(F.col("w_sum").desc(), "s1", "s2")
        .limit(_AA_TOPK)
        .select(
            "s1",
            "s2",
            "shared",
            F.round(F.col("w_sum").cast("double") / 1e9, 6).alias("adamic_adar"),
        )
    )


_KCORE_K = 3
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    """Generate the bounded-round peel as chained CTEs — the SAME
    fixed iteration count as the Spark side, so the oracle is exact
    whether or not the peel has converged by the last round."""
    parts = [
        """
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey + 1000000 AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT supp AS src, cust AS dst FROM pairs
      UNION ALL
      SELECT cust AS src, supp AS dst FROM pairs
    ),
    n0 AS MATERIALIZED (SELECT DISTINCT src FROM edges)"""
    ]
    prev = "n0"
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
      SELECT e.src, count(*) AS d FROM edges e
      JOIN {prev} a ON e.src = a.src
      JOIN {prev} b ON e.dst = b.src
      GROUP BY e.src
    ),
    n{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE d >= {_KCORE_K})"""
        )
        prev = f"n{i}"
    parts.append(
        f""",
    final AS (
      SELECT e.src, count(*) AS d FROM edges e
      JOIN {prev} a ON e.src = a.src
      JOIN {prev} b ON e.dst = b.src
      GROUP BY e.src
    )
    SELECT CAST(d AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN src < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers
    FROM final GROUP BY d ORDER BY degree"""
    )
    return "".join(parts)


@register(
    "q_graph_kcore",
    family="graph",
    oracle=_kcore_oracle(),
    doc=f"k-core decomposition (k={_KCORE_K}) of the supplier<->"
    "customer graph by iterative degree peel: drop every node with "
    f"degree < {_KCORE_K}, recompute degrees among survivors, repeat "
    f"for a FIXED {_KCORE_ROUNDS} supersteps (fixed, not "
    "until-converged, so the DuckDB oracle — the same peel unrolled "
    "as chained CTEs — is exact even mid-convergence; on this graph "
    "the peel stabilizes in ~3 rounds and the rest are no-ops). "
    "The k-core is the densest-region filter used to find the "
    "engaged subgraph before community detection or embedding "
    "training. Each superstep is one join of the edge list onto the "
    "surviving-node set (hash-partitioned on node id, the same "
    "co-partitioning every round) + a map-side-combinable degree "
    "count; localCheckpoint truncates lineage per round, O(1) "
    "driver traffic. Returns the degree histogram of the final "
    "core split by node class. Scale: edges shrink monotonically "
    "every round, so the first superstep bounds the cost; no "
    "all-pairs anywhere.",
)
def q_graph_kcore(spark, sf_dir):
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = edges.select("src").distinct().localCheckpoint(eager=False)
    # The surviving-node set is O(V) vs the O(E) edge table: broadcast
    # it on both join legs so edges are never shuffled per round — but
    # ONLY while the survivor count (already probed per round for the
    # early exit) stays under the gate: an explicit broadcast hint
    # overrides autoBroadcastJoinThreshold and fails hard past the
    # 8 GB / 512M-row cap, so past bcast_gate's threshold the joins
    # degrade to keyed shuffles instead of aborting. The peel is
    # monotone (nodes only leave), so an unchanged survivor COUNT
    # means an unchanged survivor SET and every remaining round is a
    # no-op — stop early, results identical to the fixed unroll (the
    # oracle's chained CTEs peel to the same fixpoint).
    n = nodes.count()
    prev_n = None
    for _ in range(_KCORE_ROUNDS):
        a = nodes.withColumnRenamed("src", "asrc")
        b = nodes.withColumnRenamed("src", "bsrc")
        deg = (
            edges.join(bcast_gate(a, n), edges.src == a.asrc)
            .join(bcast_gate(b, n), edges.dst == b.bsrc)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        nodes = (
            deg.filter(F.col("d") >= _KCORE_K)
            .select("src")
            .localCheckpoint(eager=False)
        )
        # Probe cadence measured, kept at EVERY round (r12): the count
        # doubles as the materializing action for this round's
        # checkpoint — skipping it (probe every 2nd round) pushed the
        # un-probed round's compute into the next round's
        # broadcast-build job and measured 2.4->4.8s at sf0.1, so the
        # per-round probe is load-bearing, not overhead. It also feeds
        # the broadcast gate and the monotone early exit.
        n = nodes.count()
        if n == prev_n:
            break
        prev_n = n
    a = nodes.withColumnRenamed("src", "asrc")
    b = nodes.withColumnRenamed("src", "bsrc")
    final = (
        edges.join(bcast_gate(a, n), edges.src == a.asrc)
        .join(bcast_gate(b, n), edges.dst == b.bsrc)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        final.groupBy(F.col("d").cast("long").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.when(F.col("src") < _CUST_NS, 1).otherwise(0))
            .cast("long")
            .alias("n_suppliers"),
        )
        .orderBy("degree")
    )


@register(
    "q_graph_assortativity",
    family="graph",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS supp, o.o_custkey + 1000000 AS cust
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT supp AS src, cust AS dst FROM pairs
      UNION ALL
      SELECT cust AS src, supp AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    ed AS (
      SELECT ds.d AS x, dd.d AS y
      FROM edges e
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM ed
    )
    SELECT n AS n_arcs,
           round((n * 1.0 * sxy - sx * 1.0 * sy)
                 / (sqrt(n * 1.0 * sxx - sx * 1.0 * sx)
                    * sqrt(n * 1.0 * syy - sy * 1.0 * sy)), 6)
             AS assortativity
    FROM s
    """,
    doc="Degree assortativity of the supplier<->customer graph: the "
    "Pearson correlation of endpoint degrees across all arcs — "
    "positive means hubs connect to hubs (social nets), negative "
    "means hub-and-spoke (the usual commerce shape); THE one-number "
    "topology fingerprint read before choosing partitioning or "
    "sampling strategies for a graph workload. EXACT: every moment "
    "(Σx, Σy, Σxy, Σx², Σy², n) is a BIGINT sum of integer degrees, "
    "so the correlation is one identical float expression of exact "
    "integers; sqrt is IEEE-deterministic. Scale: degree table joins "
    "onto edges twice by node key (both hash-partitioned); the "
    "moments aggregate map-side to a single row.",
)
def q_graph_assortativity(spark, sf_dir):
    edges = _edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ds = deg.withColumnRenamed("src", "s_node").withColumnRenamed("d", "x")
    dd = deg.withColumnRenamed("src", "d_node").withColumnRenamed("d", "y")
    ed = edges.join(ds, edges.src == ds.s_node).join(dd, edges.dst == dd.d_node)
    s = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy")
    den = F.sqrt(
        F.col("n") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx")
    ) * F.sqrt(F.col("n") * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
    return s.select(
        F.col("n").alias("n_arcs"), F.round(num / den, 6).alias("assortativity")
    )


_LPA_ROUNDS = 4

_LPA_ROUND_SQL = """
    l{n} AS MATERIALIZED (
      SELECT node, lab FROM (
        SELECT e.src AS node, l.lab,
               row_number() OVER (
                 PARTITION BY e.src
                 ORDER BY count(*) DESC, l.lab
               ) AS rn
        FROM edges e JOIN l{p} l ON l.node = e.dst
        GROUP BY e.src, l.lab
      ) WHERE rn = 1
    )"""


@register(
    "q_graph_labelprop",
    family="graph",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey + {_CUST_NS} AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT s AS src, c AS dst FROM pairs
      UNION ALL
      SELECT c AS src, s AS dst FROM pairs
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS lab FROM edges
    ),{",".join(_LPA_ROUND_SQL.format(n=i, p=i - 1) for i in range(1, _LPA_ROUNDS + 1))}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(lab AS BIGINT) AS label
    FROM l{_LPA_ROUNDS} ORDER BY node
    """,
    doc="Synchronous label propagation (community detection), fixed "
    f"{_LPA_ROUNDS} supersteps over the supplier-customer bipartite "
    "graph: labels start as node ids; each round EVERY node "
    "simultaneously adopts the most frequent label among its "
    "neighbors' round-(r-1) labels, smallest label breaking ties — "
    "the deterministic variant of LPA (async/random LPA is "
    "irreproducible; sync + min-tie-break makes every round a pure "
    "function of the last, so the round-4 snapshot is bitwise "
    "cross-engine, oscillation and all). Each superstep is ONE "
    "edge-to-labels equi-join + ONE (node, label) count + ONE "
    "max(struct(cnt, -label)) argmax agg — all map-side-combinable "
    "hash aggs keyed on the node, no windows over the corpus; "
    "localCheckpoint per round keeps lineage flat exactly like "
    "q_graph_components / q_graph_pagerank. Linear in edges x fixed "
    "rounds at any scale. The oracle unrolls the same rounds as "
    "chained AS MATERIALIZED CTEs (non-materialized CTEs re-inline "
    "per reference and re-evaluate 2^rounds times — the k-core "
    "lesson). Ref: no reference counterpart — graph tier.",
)
def q_graph_labelprop(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            (F.col("o_custkey").cast("long") + _CUST_NS).alias("c"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        .unionByName(
            pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        )
        .localCheckpoint(eager=True)  # reused every superstep
    )
    # constant across rounds: the argmax agg emits one row per src and
    # every node appears as src (edges are symmetric), so one count up
    # front gates every superstep's broadcast (eager=False — the count
    # is the materializing action, one job not two)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    labels = nodes.select("node", F.col("node").alias("lab"))
    for rnd in range(_LPA_ROUNDS):
        # label table is O(V) vs O(E) edges: broadcast it so the edge
        # table never shuffles — only the (src, lab) vote aggregate
        # moves per round (partial-agg map-side). Gated on the node
        # count: an explicit broadcast hint overrides
        # autoBroadcastJoinThreshold and aborts past the 8 GB/512M-row
        # cap, so past the gate this degrades to a keyed join.
        votes = (
            edges.join(bcast_gate(labels, n_nodes), edges.dst == labels.node)
            .groupBy(F.col("src"), F.col("lab"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = votes.groupBy("src").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("lab")).alias("nl"))).alias("m")
        ).select(F.col("src").alias("node"), (-F.col("m.nl")).alias("lab"))
        if rnd < _LPA_ROUNDS - 1:
            # flatten lineage between rounds; the LAST round stays
            # un-checkpointed so the returned plan exposes one full
            # superstep (join + partial-agg shapes are plan-pinned)
            labels = labels.localCheckpoint(eager=True)
    return labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("lab").cast("long").alias("label"),
    ).orderBy("node")


_CC_TOPK = 20


@register(
    "q_graph_clustering_coeff",
    family="graph",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tc AS (
      SELECT part, CAST(count(*) AS BIGINT) AS tri_count FROM (
        SELECT unnest([a, b, c]) AS part FROM tri
      ) GROUP BY part
    )
    SELECT deg.node AS part, deg.d AS degree,
           CAST(coalesce(tc.tri_count, 0) AS BIGINT) AS tri_count,
           round(2.0 * coalesce(tc.tri_count, 0) / (deg.d * (deg.d - 1)), 6)
             AS clustering_coeff
    FROM deg LEFT JOIN tc ON tc.part = deg.node
    WHERE deg.d >= 2
    ORDER BY tri_count DESC, clustering_coeff DESC, part
    LIMIT {_CC_TOPK}
    """,
    doc="Local clustering coefficient per node over the part "
    "co-purchase graph: 2*triangles(v) / (deg(v)*(deg(v)-1)) — how "
    "close each node's neighborhood is to a clique, the "
    "community-tightness signal (q_graph_triangles counts the "
    "numerator; this normalizes it into a comparable score, the "
    "small-world / spam-farm readout). Spark reuses the "
    "degree-oriented compact-forward wedge join (hub fan-out bounded "
    "by O(sqrt(m))) while the ORACLE orients by id — same triangle "
    "set, different physical strategy, which is the point. "
    "Coefficient is one rounded division of exact integer counts; "
    "top-k carries a (tri, coeff, part) total order. Scale: the "
    "triangle join dominates and is the same near-linear plan "
    "q_graph_triangles ships; degree join is a broadcast. Ref: no "
    "reference counterpart — graph tier.",
)
def q_graph_clustering_coeff(spark, sf_dir):
    # r12: repartition on the co-occurrence key before the distinct —
    # HashPartitioning(l_orderkey) satisfies the distinct AND both
    # self-join legs (AQE reuses the identical shuffle stage), so one
    # exchange replaces three (see q_graph_adamic_adar)
    pp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
    )
    a, b = pp.alias("a"), pp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_dir = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    # the closing leg joins O(wedges) rows against O(E) edges: a
    # shuffled-HASH join builds the edge side per partition instead of
    # sort-merge sorting the wedge stream (the wedge side is ~40x the
    # edge side here and only grows with the graph — guide §3.1)
    e1, e2 = e_dir.alias("e1"), e_dir.alias("e2")
    e3 = e_dir.hint("shuffle_hash").alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tc = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count("*").cast("long").alias("tri_count"))
    )
    return (
        deg.withColumnRenamed("node", "part")
        .join(tc, "part", "left")
        .filter(F.col("d") >= 2)
        .select(
            "part",
            F.col("d").alias("degree"),
            F.coalesce(F.col("tri_count"), F.lit(0)).cast("long").alias("tri_count"),
            F.round(
                2.0
                * F.coalesce(F.col("tri_count"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy(
            F.col("tri_count").desc(), F.col("clustering_coeff").desc(), "part"
        )
        .limit(_CC_TOPK)
    )


@register(
    "q_graph_summary",
    family="graph",
    oracle="""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    )
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(d) // 2 AS BIGINT) AS n_edges,
           CAST(max(d) AS BIGINT) AS max_degree,
           CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaves,
           round(CAST(sum(d) AS DOUBLE) / count(*), 6) AS avg_degree,
           round(CAST(sum(d) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE) * (count(*) - 1), 0), 6)
             + 0.0 AS density
    FROM deg
    """,
    doc="Graph profile card for the part co-purchase graph: node/edge "
    "counts, max degree, leaf count, average degree and density — the "
    "60-second sanity readout run before any expensive graph "
    "algorithm (a density or max-degree surprise here predicts "
    "whether the triangle/wedge family will be linear or a hub "
    "explosion, and whether LSH-style caps are needed). Everything "
    "derives from the degree table: sum(d)/2 = |E| by handshake, all "
    "counts exact integers, two rounded divisions (density uses the "
    "directed-pair denominator V*(V-1) with a nullif guard). Scale: "
    "edge build is the one co-occurrence self-join; the profile "
    "itself is one combinable agg over the O(V) degree table. Ref: "
    "no reference counterpart — graph tier.",
)
def q_graph_summary(spark, sf_dir):
    # r12: one exchange on the co-occurrence key for distinct + both
    # self-join legs (see q_graph_clustering_coeff)
    pp = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
    )
    a, b = pp.alias("a"), pp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    nd = F.count(F.lit(1)).cast("double")
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("CAST(sum(d) div 2 AS BIGINT)").alias("n_edges"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("n_leaves"),
        F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 6).alias("avg_degree"),
        (
            F.round(
                F.sum("d").cast("double")
                / F.nullif(nd * (F.count(F.lit(1)) - 1), F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("density"),
    )


_JC_MAX_DEG = 128
_JC_TOPK = 20
# supplier-side hub valve (r9, VERDICT r8 task #6): a supplier whose
# neighborhood exceeds this participates in unboundedly many wedge
# centers, so its OUTPUT pair fan-out is unbounded even with the
# customer-side cap. Drop such hubs from the wedge input entirely —
# the same drop-the-hub semantics as the customer valve. Inactive at
# fixture scale (max supplier degree 679 at sf0.1) and under replica
# synthesis (keys shift together -> degrees invariant, scale_probe.py
# synthesize()); binding only at real-world mega-hub skew.
_JC_MAX_SDEG = 4096


@register(
    "q_graph_jaccard",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM pairs GROUP BY s),
    sok AS (SELECT s FROM sdeg WHERE d <= {_JC_MAX_SDEG}),
    cdeg AS (
      SELECT c, count(*) AS d FROM pairs GROUP BY c
      HAVING count(*) BETWEEN 2 AND {_JC_MAX_DEG}
    ),
    kept AS (SELECT p.s, p.c FROM pairs p
             JOIN cdeg d ON d.c = p.c
             JOIN sok ON sok.s = p.s),
    co AS (
      SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared
      FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT co.s1, co.s2, co.shared,
           CAST(d1.d AS BIGINT) AS deg1, CAST(d2.d AS BIGINT) AS deg2,
           round(CAST(co.shared AS DOUBLE)
                 / (d1.d + d2.d - co.shared), 6) + 0.0 AS jaccard
    FROM co JOIN sdeg d1 ON d1.s = co.s1 JOIN sdeg d2 ON d2.s = co.s2
    ORDER BY co.shared * 1000000 // (d1.d + d2.d - co.shared) DESC, s1, s2
    LIMIT {_JC_TOPK}
    """,
    doc="Neighbor-set Jaccard similarity for supplier pairs over shared "
    "customers — |N(a)∩N(b)| / |N(a)∪N(b)|, the normalized sibling of "
    "q_graph_common_neighbors (raw overlap) and q_graph_adamic_adar "
    "(hub-discounted overlap): Jaccard is the one that's comparable "
    "across degree scales, the same measure the dedup tier uses on "
    "shingle sets. Wedge enumeration keyed on the shared customer "
    f"with hubs above degree {_JC_MAX_DEG} dropped BEFORE any wedge "
    "is emitted (the d² emitters; same principled valve as "
    f"adamic_adar), and supplier hubs above degree {_JC_MAX_SDEG} "
    "dropped too (r9: bounds each supplier's OUTPUT pair fan-out, "
    "which the customer cap alone does not; inactive below that "
    "degree, so fixture-scale results are unchanged) — but degrees "
    "for the UNION come from the full pair set, so the denominator "
    "is exact even where hub-mediated intersections are sparsified "
    "away. Determinism: the top-k "
    "ORDER BY rides the exact integer rational shared·1e6/union "
    "(no float argsort), ties broken on (s1,s2). Scale: degree agg + "
    "capped wedge join are combinable; top-k is "
    "TakeOrderedAndProject. Ref: no reference counterpart — graph "
    "tier.",
)
def q_graph_jaccard(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r12: one exchange on the wedge key c serves the distinct, the cdeg
    # groupBy, the kept join and both wedge legs (AQE shuffle-stage
    # reuse) — see q_graph_adamic_adar. sdeg's exchange on s is likewise
    # reused by sok and both join-backs, so the checkpoints only cost
    # partitioning info here.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            F.col("o_custkey").cast("long").alias("c"),
        )
        .repartition("c")
        .distinct()
    )
    sdeg = pairs.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("d"))
    sok = sdeg.filter(F.col("d") <= _JC_MAX_SDEG).select("s")
    cdeg = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).alias("cd"))
        .filter((F.col("cd") >= 2) & (F.col("cd") <= _JC_MAX_DEG))
        .select("c")
    )
    kept = pairs.join(F.broadcast(cdeg), "c").join(F.broadcast(sok), "s")
    a, b = kept.alias("a"), kept.alias("b")
    co = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    d1 = sdeg.select(F.col("s").alias("s1"), F.col("d").alias("deg1"))
    d2 = sdeg.select(F.col("s").alias("s2"), F.col("d").alias("deg2"))
    un = F.col("deg1") + F.col("deg2") - F.col("shared")
    return (
        co.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .orderBy(
            F.desc(F.expr("shared * 1000000 div (deg1 + deg2 - shared)")),
            "s1",
            "s2",
        )
        .limit(_JC_TOPK)
        .select(
            "s1",
            "s2",
            "shared",
            "deg1",
            "deg2",
            (F.round(F.col("shared").cast("double") / un, 6) + 0.0).alias(
                "jaccard"
            ),
        )
    )


@register(
    "q_graph_modularity",
    family="graph",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    -- undirected bipartite edges with community = the SUPPLIER's
    -- nation on both endpoints (customers inherit the supplier side
    -- they connect to most is a harder assignment; here community of
    -- an edge is well-defined per endpoint: supplier nation vs
    -- customer nation)
    edges AS (
      SELECT p.s, p.c,
             sn.s_nationkey AS comm_s,
             cn.c_nationkey AS comm_c
      FROM pairs p
      JOIN supplier sn ON sn.s_suppkey = p.s
      JOIN customer cn ON cn.c_custkey = p.c
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
    intra AS (
      SELECT CAST(count(*) AS BIGINT) AS e_in
      FROM edges WHERE comm_s = comm_c
    ),
    -- degree mass per community: each edge endpoint contributes its
    -- community once (supplier endpoint + customer endpoint)
    deg AS (
      SELECT comm, CAST(sum(cnt) AS BIGINT) AS d FROM (
        SELECT comm_s AS comm, CAST(count(*) AS BIGINT) AS cnt
        FROM edges GROUP BY comm_s
        UNION ALL
        SELECT comm_c AS comm, CAST(count(*) AS BIGINT) AS cnt
        FROM edges GROUP BY comm_c
      ) GROUP BY comm
    ),
    q2 AS (
      SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS DOUBLE) AS sum_d2
      FROM deg
    )
    SELECT m.m AS n_edges,
           i.e_in AS intra_edges,
           round(CAST(i.e_in AS DOUBLE) / m.m
                 - q2.sum_d2 / (4.0 * m.m * m.m), 6) + 0.0 AS modularity
    FROM m CROSS JOIN intra i CROSS JOIN q2
    """,
    doc="Newman modularity Q of the nation partition over the "
    "supplier↔customer graph — Q = e_in/m − Σ_c(d_c/2m)², the "
    "did-the-communities-mean-anything score that validates (or "
    "indicts) a partition BEFORE it's used for locality-aware "
    "placement or blocked processing; pairs with q_graph_labelprop "
    "(which finds communities) as its evaluation half. Exactness: "
    "edge/intra counts and per-community degree masses are exact "
    "ints (Σd² in HUGEINT/DECIMAL — quadratic in degree mass); Q is "
    "ONE float expression of exact ints. Scale: distinct-pair "
    "projection is the only fact shuffle; degree masses are two "
    "combinable rollups of the edge table; the rest is arithmetic on "
    "|communities| rows. Ref: no reference counterpart — graph "
    "tier.",
)
def q_graph_modularity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            F.col("o_custkey").cast("long").alias("c"),
        )
        .distinct()
    )
    sn = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        pairs.join(F.broadcast(sn), F.col("s_suppkey") == F.col("s"))
        .join(F.broadcast(cn), F.col("c_custkey") == F.col("c"))
        .select(
            F.col("s_nationkey").alias("comm_s"),
            F.col("c_nationkey").alias("comm_c"),
        )
    )
    edges = edges.localCheckpoint(eager=False)  # m/intra/deg share it
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    intra = edges.filter(F.col("comm_s") == F.col("comm_c")).agg(
        F.count(F.lit(1)).cast("long").alias("e_in")
    )
    dec = "decimal(38,0)"
    deg = (
        edges.select(F.col("comm_s").alias("comm"))
        .groupBy("comm")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .unionByName(
            edges.select(F.col("comm_c").alias("comm"))
            .groupBy("comm")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        .groupBy("comm")
        .agg(F.sum("cnt").cast("long").alias("d"))
    )
    q2 = deg.agg(
        F.sum(F.col("d").cast(dec) * F.col("d").cast(dec))
        .cast("double").alias("sum_d2")
    )
    return (
        m.join(F.broadcast(intra))
        .join(F.broadcast(q2))
        .select(
            F.col("m").alias("n_edges"),
            F.col("e_in").alias("intra_edges"),
            (
                F.round(
                    F.col("e_in").cast("double") / F.col("m")
                    - F.col("sum_d2") / (4.0 * F.col("m") * F.col("m")),
                    6,
                )
                + 0.0
            ).alias("modularity"),
        )
    )


@register(
    "q_graph_reciprocity",
    family="graph",
    oracle="""
    WITH seq AS (
      SELECT event_type AS et,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    edges AS (
      SELECT prev AS a, et AS b, CAST(count(*) AS BIGINT) AS w
      FROM seq WHERE prev IS NOT NULL AND prev <> et
      GROUP BY prev, et
    ),
    paired AS (
      SELECT e.a, e.b, e.w, CAST(coalesce(r.w, 0) AS BIGINT) AS wr
      FROM edges e LEFT JOIN edges r ON r.a = e.b AND r.b = e.a
    )
    SELECT CAST(count(*) AS BIGINT) AS n_directed_pairs,
           CAST(sum(w) AS BIGINT) AS total_transitions,
           round(CAST(sum(least(w, wr)) AS DOUBLE) / sum(w), 6) + 0.0
             AS reciprocity
    FROM paired
    """,
    doc="Weighted reciprocity of the event-type transition digraph "
    "(consecutive events per user, q_events_markov's edge table): "
    "sum(min(w_ab, w_ba)) / sum(w) — 1.0 means every a->b flow is "
    "matched by an equal b->a flow, near 0 means the journey is a "
    "one-way funnel; THE digraph-shape diagnostic that says whether "
    "markov transition analysis faces a cycle or a DAG-like flow. "
    "Exactness: edge weights are exact ints from one lag window "
    "(partitioned per user, ordered (ts, event_id) — a total order); "
    "reciprocity is one rounded division. Scale: the lag window is "
    "per-user-bounded; the edge table is <=k(k-1) rows (k event "
    "types) so the swap join is trivially broadcast. Ref: no "
    "reference counterpart — graph tier.",
)
def q_graph_reciprocity(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("et"),
        F.lag("event_type").over(w).alias("prev"),
    )
    edges = (
        seq.filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("et")))
        .groupBy(F.col("prev").alias("a"), F.col("et").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = edges.localCheckpoint(eager=False)  # both sides of the swap join
    rev = edges.select(
        F.col("a").alias("ra"), F.col("b").alias("rb"), F.col("w").alias("wr")
    )
    paired = edges.join(
        F.broadcast(rev),
        (F.col("ra") == F.col("b")) & (F.col("rb") == F.col("a")),
        "left",
    ).select("a", "b", "w", F.coalesce("wr", F.lit(0)).cast("long").alias("wr"))
    return paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_directed_pairs"),
        F.sum("w").cast("long").alias("total_transitions"),
        (
            F.round(
                F.sum(F.least("w", "wr")).cast("double") / F.sum("w"), 6
            )
            + 0.0
        ).alias("reciprocity"),
    )


_HITS_ITERS = 10
_HITS_TOPK = 20


@register(
    "q_graph_hits",
    family="graph",
    oracle=None,  # iterative fixpoint — pinned by tests/test_graph.py vs numpy
    doc="HITS hubs-and-authorities over the DIRECTED supplier->customer "
    "purchase graph (suppliers are hubs: they point at the customers "
    "they serve; customers are authorities): 10 synchronized power "
    f"iterations of a = E^T h, h = E a with sum-normalization each "
    "half-step, emitting the top-"
    f"{_HITS_TOPK} hub suppliers — the who-serves-the-important-"
    "customers ranking that PageRank's undirected random walk "
    "(q_graph_pagerank) deliberately erases; the same "
    "mutual-reinforcement recurrence ranks query->document click "
    "graphs in retrieval pipelines. Determinism: fixed iteration "
    "count (no float convergence test), top-k under a "
    "(rounded score DESC, node) total order — the q_graph_pagerank "
    "contract, pinned against an independent dense numpy recurrence. "
    "The half-step updates are LINEAR, so per-iteration L1 "
    "normalization only rescales: it is applied ONCE at the end "
    "(mathematically identical ranked output) plus a single mid-loop "
    "rescale as a double-overflow guard — cutting ~2 agg + 2 "
    "broadcast-crossJoin jobs per iteration vs the r9 shape "
    "(VERDICT r9 task #5). Scale: each half-step is one co-keyed "
    "join + combinable agg on the distinct edge table; lineage is "
    "cut per iteration (localCheckpoint) so the plan stays O(1) "
    "deep; O(iters) shuffles total, same as pagerank.",
)
def q_graph_hits(spark, sf_dir):
    # _edges is symmetric (both directions); keep the supplier->customer
    # direction only (supplier ids live below the customer namespace)
    edges = (
        _edges(spark, sf_dir)
        .filter(F.col("src") < _CUST_NS)
        .select(F.col("src").alias("h"), F.col("dst").alias("a"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hubs = edges.select(F.col("h").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("score")
    )
    # score-vector sizes are constant across iterations (every half-step
    # emits one row per distinct endpoint): one combined count job up
    # front gates every iteration's broadcast hints
    vec_n = edges.agg(
        F.countDistinct("h").alias("nh"), F.countDistinct("a").alias("na")
    ).head()
    n_hub, n_auth = vec_n["nh"], vec_n["na"]
    for i in range(_HITS_ITERS):
        # authority half-step: a(c) = sum of hub scores pointing at c
        # (unnormalized — the update is linear, normalization only
        # rescales and is deferred to the end). The score vector is
        # O(V) while edges are O(E): broadcast the vector so the edge
        # table is never shuffled by the join — only the grouped
        # half-step aggregate moves (partial-agg map-side) per
        # iteration (guide: broadcast the side that fits, 20x smaller
        # here). The hint is gated on the counted vector size: an
        # explicit broadcast hint overrides autoBroadcastJoinThreshold
        # and aborts past the 8 GB/512M-row cap, so past the gate the
        # half-steps degrade to keyed joins instead of failing.
        auth = (
            edges.join(bcast_gate(hubs, n_hub), edges.h == hubs.node)
            .groupBy("a")
            .agg(F.sum("score").alias("score"))
            .withColumnRenamed("a", "node")
        )
        # hub half-step: h(s) = sum of authority scores s points at
        hubs = (
            edges.join(bcast_gate(auth, n_auth), edges.a == auth.node)
            .groupBy("h")
            .agg(F.sum("score").alias("score"))
            .withColumnRenamed("h", "node")
        )
        if i == _HITS_ITERS // 2 - 1:
            # single mid-loop rescale: pure magnitude guard (score grows
            # ~lambda_1(E^T E)^iters unnormalized; one rescale keeps ten
            # iterations far inside double range at any corpus size)
            htot = hubs.agg(F.sum("score").alias("t"))
            hubs = hubs.crossJoin(F.broadcast(htot)).select(
                "node", (F.col("score") / F.col("t")).alias("score")
            )
        hubs = hubs.localCheckpoint(eager=False)
    # one final L1 normalization — mathematically identical to the
    # per-half-step schedule (linear maps commute with scalars)
    htot = hubs.agg(F.sum("score").alias("t"))
    hubs = hubs.crossJoin(F.broadcast(htot)).select(
        "node", (F.col("score") / F.col("t")).alias("score")
    )
    return (
        hubs.select("node", F.round("score", 8).alias("hub_score"))
        .orderBy(F.col("hub_score").desc(), "node")
        .limit(_HITS_TOPK)
    )


# ---------------------------------------------------------------------------
# Round-10 wave 5 (graph): preferential-attachment link prediction +
# rich-club coefficient profile.
# ---------------------------------------------------------------------------


@register(
    "q_graph_preferential_attachment",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM pairs GROUP BY s),
    cdeg AS (
      SELECT c, count(*) AS d FROM pairs GROUP BY c
      HAVING count(*) BETWEEN 2 AND {_AA_MAX_DEG}
    ),
    kept AS (SELECT p.s, p.c FROM pairs p JOIN cdeg d ON d.c = p.c),
    cand AS (
      SELECT DISTINCT a.s AS s1, b.s AS s2
      FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
    )
    SELECT cand.s1, cand.s2,
           d1.d AS deg1, d2.d AS deg2,
           CAST(d1.d * d2.d AS BIGINT) AS pa_score
    FROM cand JOIN sdeg d1 ON d1.s = cand.s1
              JOIN sdeg d2 ON d2.s = cand.s2
    ORDER BY pa_score DESC, s1, s2
    LIMIT {_AA_TOPK}
    """,
    doc="Preferential-attachment link prediction: supplier pairs (from "
    "the shared-customer candidate set, same wedge blocking + "
    f"degree-{_AA_MAX_DEG} hub valve as q_graph_adamic_adar) scored "
    "by deg(s1)*deg(s2) — the volume-driven baseline of the link-"
    "prediction triad: common_neighbors counts evidence, adamic_adar "
    "discounts hub evidence, PA ignores shared structure entirely "
    "and bets on size. Reporting all three lets an analyst see "
    "whether a predicted link is structural or just two big nodes. "
    "EXACT: the score is an integer product of exact degrees "
    "(degrees computed on the FULL pair set, before the valve — the "
    "jaccard convention), top-k under a (score DESC, s1, s2) total "
    "order. Scale: the candidate join is the valved wedge equi-join; "
    "degrees broadcast; TakeOrdered top-k. Ref: no reference "
    "counterpart — graph tier.",
)
def q_graph_preferential_attachment(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r12: one exchange on the wedge key c (see q_graph_adamic_adar);
    # cdeg and the wedge legs reuse it, sdeg re-keys once onto s.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .repartition("c")
        .distinct()
    )
    sdeg = pairs.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("d"))
    cdeg = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= _AA_MAX_DEG))
        .select("c")
    )
    kept = pairs.join(cdeg, "c")
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
    )
    d1 = sdeg.select(F.col("s").alias("s1"), F.col("d").alias("deg1"))
    d2 = sdeg.select(F.col("s").alias("s2"), F.col("d").alias("deg2"))
    # degrees ride a broadcast join-back onto the candidate pairs — the
    # same O(V)-degree-table treatment as common_neighbors/jaccard —
    # instead of re-exchanging the candidate table onto s1 and again s2
    return (
        cand.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            "deg1",
            "deg2",
            (F.col("deg1") * F.col("deg2")).cast("long").alias("pa_score"),
        )
        .orderBy(F.col("pa_score").desc(), "s1", "s2")
        .limit(_AA_TOPK)
    )


_RC_LEVELS = (2, 4, 8, 16, 32, 64)


@register(
    "q_graph_rich_club",
    family="graph",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cdeg AS (
      SELECT c, count(*) AS d FROM pairs GROUP BY c
      HAVING count(*) BETWEEN 2 AND {_AA_MAX_DEG}
    ),
    kept AS (SELECT p.s, p.c FROM pairs p JOIN cdeg d ON d.c = p.c),
    edges AS (
      SELECT DISTINCT a.s AS s1, b.s AS s2
      FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
    ),
    pdeg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT s1 AS s FROM edges UNION ALL SELECT s2 AS s FROM edges
      ) GROUP BY s
    ),
    lv AS (SELECT CAST(k AS BIGINT) AS k
           FROM (VALUES {", ".join(f"({k})" for k in _RC_LEVELS)}) t(k)),
    nk AS (
      SELECT lv.k, CAST(count(*) AS BIGINT) AS n_nodes
      FROM lv JOIN pdeg ON pdeg.d > lv.k GROUP BY lv.k
    ),
    ek AS (
      SELECT lv.k, CAST(count(*) AS BIGINT) AS n_edges
      FROM lv JOIN edges e ON TRUE
      JOIN pdeg p1 ON p1.s = e.s1 AND p1.d > lv.k
      JOIN pdeg p2 ON p2.s = e.s2 AND p2.d > lv.k
      GROUP BY lv.k
    )
    SELECT nk.k AS degree_gt, nk.n_nodes,
           CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
           round(2.0 * coalesce(ek.n_edges, 0)
                 / (CAST(nk.n_nodes AS DOUBLE) * (nk.n_nodes - 1)), 6) + 0.0
             AS phi
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    WHERE nk.n_nodes >= 2
    ORDER BY degree_gt
    """,
    doc="Rich-club coefficient profile of the supplier projection "
    "(suppliers adjacent iff they share a customer, same wedge "
    "blocking + hub valve as adamic_adar/PA): for each degree "
    "threshold k in {2,4,8,16,32,64}, phi(k) = 2 E_k / (N_k (N_k-1)) "
    "— the edge density among nodes of projected degree > k. A "
    "rising phi(k) means high-degree suppliers preferentially "
    "interconnect (a 'rich club' — concentration risk in a supply "
    "graph); q_graph_assortativity gives the single correlation, "
    "this the full profile. EXACT: integer node/edge counts per "
    "level, one division; levels are a literal 6-row grid, rows "
    "with N_k < 2 are dropped (phi undefined). Scale: one valved "
    "wedge equi-join builds the projection; the level scan is a "
    "6-row broadcast against the projected-degree table. Ref: no "
    "reference counterpart — graph tier.",
)
def q_graph_rich_club(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r12: one exchange on the wedge key c (see q_graph_adamic_adar);
    # cdeg and both wedge legs reuse it. BELOW the wedge join the
    # checkpoints stay (A/B'd: dropping them re-plans the pairs subtree
    # into every pdeg/ek branch — 5.5 s vs 3.9 s at sf0.1 — and none of
    # the downstream consumers can use the forgotten partitioning
    # anyway: pdeg re-keys onto s, ek rides broadcast join-backs).
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .repartition("c")
        .distinct()
    )
    cdeg = (
        pairs.groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= _AA_MAX_DEG))
        .select("c")
    )
    kept = pairs.join(cdeg, "c")
    a, b = kept.alias("a"), kept.alias("b")
    edges = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .distinct()
        .localCheckpoint(eager=False)  # pdeg + ek read it
    )
    pdeg = (
        edges.select(F.col("s1").alias("s"))
        .unionAll(edges.select(F.col("s2").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)  # nk + both ek join-backs read it
    )
    lv = edges.sparkSession.createDataFrame(
        [(k,) for k in _RC_LEVELS], "k long"
    )
    nk = (
        F.broadcast(lv)
        .join(pdeg, pdeg.d > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    p1 = pdeg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    p2 = pdeg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    # projected degrees ride broadcast join-backs onto the edge table
    # (the common_neighbors/jaccard deg treatment) instead of
    # re-exchanging the edge table onto s1 and again onto s2
    ek = (
        edges.join(F.broadcast(p1), "s1")
        .join(F.broadcast(p2), "s2")
        .crossJoin(F.broadcast(lv))
        .filter((F.col("d1") > F.col("k")) & (F.col("d2") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    phi = (
        2.0
        * F.coalesce("n_edges", F.lit(0))
        / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1))
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_nodes") >= 2)
        .select(
            F.col("k").alias("degree_gt"),
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            (F.round(phi, 6) + 0.0).alias("phi"),
        )
        .orderBy("degree_gt")
    )
