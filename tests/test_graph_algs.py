"""Unit pins for functions.graph_algs.connected_components on
adversarial graph SHAPES the table-backed operator can't produce:
a long chain (the pointer-doubling case — naive propagation needs
diameter rounds, the doubled form log2), multiple components, and
the non-convergence guard."""

from __future__ import annotations

import pytest

from mongodb_iceberg_sync_spark.functions.graph_algs import connected_components


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_long_chain_converges_in_log_rounds(spark):
    # a 200-node path has diameter 199; pointer doubling must label it
    # within ceil(log2(199)) + slack rounds — 12 is generous, and far
    # below the 199 a propagation-only loop would need
    chain = [(i, i + 1) for i in range(199)]
    got = connected_components(_edges(spark, chain), max_rounds=12).collect()
    assert len(got) == 200
    assert {r.comp for r in got} == {0}


def test_multiple_components_and_min_label(spark):
    pairs = [(10, 11), (11, 12), (5, 6), (100, 101), (101, 5)]
    got = {
        r.node: r.comp
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    # {10,11,12} -> 10 ; {5,6,100,101} -> 5
    assert got == {10: 10, 11: 10, 12: 10, 5: 5, 6: 5, 100: 5, 101: 5}


def test_non_convergence_raises(spark):
    chain = [(i, i + 1) for i in range(64)]
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(_edges(spark, chain), max_rounds=1)
