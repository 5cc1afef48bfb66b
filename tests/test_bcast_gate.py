"""r12: the broadcast hints on O(V) tables in the iterative graph ops
are GATED on a row count (operators/_util.bcast_gate) — an explicit
F.broadcast() hint overrides autoBroadcastJoinThreshold and aborts past
the 8 GB / 512M-row relation cap instead of degrading, so past the gate
the joins must fall back to keyed shuffles. These tests pin (a) the gate
mechanics and (b) that the fallback (gate forced to 0 rows) computes
bit-identical results through a real iterative path."""

from __future__ import annotations

from mongodb_iceberg_sync_spark.functions.graph_algs import connected_components
from mongodb_iceberg_sync_spark.operators._util import bcast_gate
from mongodb_iceberg_sync_spark.registry import all_specs


def _hinted(df) -> bool:
    return "UnresolvedHint" in df._jdf.queryExecution().logical().toString()


def test_gate_applies_hint_below_cap(spark):
    df = spark.range(10)
    assert _hinted(bcast_gate(df, 10))


def test_gate_withholds_hint_above_cap_or_unknown(spark, monkeypatch):
    df = spark.range(10)
    assert bcast_gate(df, None) is df
    monkeypatch.setenv("SPARK_GRAFT_BCAST_MAX_ROWS", "5")
    assert bcast_gate(df, 6) is df
    assert _hinted(bcast_gate(df, 5))


def test_cc_fallback_keyed_join_same_labels(spark, monkeypatch):
    # chain + second component; gate forced to 0 -> every superstep join
    # runs as a keyed shuffle join, labels must be identical
    pairs = [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "src long, dst long")
    want = {
        (r.node, r.comp) for r in connected_components(edges).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_BCAST_MAX_ROWS", "0")
    got = {
        (r.node, r.comp) for r in connected_components(edges).collect()
    }
    assert got == want


def test_kcore_fallback_same_histogram(spark, sf_dir, monkeypatch):
    spec = all_specs()["q_graph_kcore"]
    want = [tuple(r) for r in spec.func(spark, sf_dir).collect()]
    monkeypatch.setenv("SPARK_GRAFT_BCAST_MAX_ROWS", "0")
    got = [tuple(r) for r in spec.func(spark, sf_dir).collect()]
    assert got == want
