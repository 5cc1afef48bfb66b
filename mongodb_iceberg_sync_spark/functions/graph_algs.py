"""Distributed connected components: hash-min label propagation with
pointer doubling.

The BSP primitive behind q_graph_components and (in representative
form) q_dedup_clusters' duplicate grouping. Each superstep is one
edge join (labels flow to neighbours) plus one label-of-label
self-join (pointer doubling) and a min-combine — so convergence is
O(log diameter) supersteps rather than O(diameter): on a 100 TB
chain-shaped graph that is the difference between ~6 and ~60 keyed
shuffles. Labels are node ids (exact integers), making the component
id — the min reachable node id — bitwise deterministic across
engines, partitionings, and retries.

Reference has no analog (sync pipeline, not a graph engine); public
precedent: GraphX/GraphFrames connectedComponents and the
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators._util import bcast_gate


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Label every node of an UNDIRECTED graph with its component id.

    ``edges`` must already contain both arc directions (symmetric);
    every node must appear in ``src`` at least once (an isolated node
    with no edges is its own component and can be unioned by the
    caller). Returns (node, comp) where comp = min reachable node id.
    Raises RuntimeError if not converged within ``max_rounds`` —
    pointer doubling makes that bound ~log2(diameter), so 30 covers
    any graph whose diameter fits in a long.
    """
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    # Convergence check: labels only ever DECREASE (cands always contains
    # the current label and the combine is min), so the label sum is
    # strictly monotone — an unchanged sum means an unchanged labelling.
    # That turns the per-round converged? probe into a partial-agg scalar
    # (map-side combine, one number to the driver) instead of a keyed
    # self-join shuffle of both label sets. decimal(38,0) keeps the sum
    # exact for any node-id magnitude, so the test never false-converges.
    def _label_sum(lab):
        return lab.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).head()[0]

    # one probe job yields BOTH the initial fixpoint sum and the node
    # count; the count is constant across rounds (one row per node every
    # round — groupBy node over cands, every node appears in labels), so
    # it gates every superstep's broadcast hints without its own job
    first = labels.agg(
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    prev_sum, n_nodes = first["s"], first["n"]
    for rnd in range(max_rounds):
        # label table is O(V) vs the O(E) edge table: broadcast it so
        # edges are never reshuffled per superstep. Gated on the node
        # count: an explicit broadcast hint overrides
        # autoBroadcastJoinThreshold and fails hard past the
        # 8 GB/512M-row broadcast cap (it does NOT fall back), so past
        # bcast_gate's threshold this degrades to a keyed shuffle join.
        nbr = edges.join(
            bcast_gate(labels, n_nodes), edges.src == F.col("node")
        ).select(
            F.col("dst").alias("node"), "comp"
        )
        cands = labels.unionByName(nbr)
        if rnd > 0:
            # pointer doubling: label-of-label. On round 0 labels are
            # the identity map, so the self-join would reproduce labels
            # verbatim — skip the wasted n x n equi-join that round.
            hop = (
                labels.alias("l1")
                .join(
                    bcast_gate(labels.alias("l2"), n_nodes),
                    F.col("l1.comp") == F.col("l2.node"),
                )
                .select(
                    F.col("l1.node").alias("node"), F.col("l2.comp").alias("comp")
                )
            )
            cands = cands.unionByName(hop)
        # eager=False: the label-sum probe below is the action that
        # materializes this round's checkpoint — one job per probe, not
        # two (the probe and every later reader reuse the stored rows)
        new = (
            cands
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        labels = new
        # Probe cadence measured, kept at EVERY round (r12): halving it
        # (probe every 2nd round, letting two supersteps ride one job)
        # was A/B'd at sf0.1 and did NOT win — 3.0s vs 3.2s min-of-3 —
        # because the broadcast-build jobs materialize each round's
        # checkpoint anyway; the per-round probe stays the cheap
        # materializing action it was designed as.
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components: not converged after {max_rounds} rounds"
    )
