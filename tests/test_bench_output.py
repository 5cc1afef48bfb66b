"""Pin the bench CLI's output contract: the machine-readable line must
stay small whatever the headline-query count (r4's full per-query map
overflowed the round driver's capture → BENCH_r04 `parsed: null`), and
the sidecar must carry the complete map."""

from __future__ import annotations

import importlib.util
import json
import os

spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_single_line_stays_small_at_any_query_count():
    timings = {f"q_op_with_a_rather_long_name_{i}": i / 7.0 for i in range(500)}
    line, full = bench.compact_payloads(timings, 0.1)
    assert len(json.dumps(line)) < 2048, "single line must fit driver capture"
    assert len(line["queries"]) == 10
    assert line["n_queries"] == 500
    assert line["queries_full"] == "BENCH_local.json"
    assert full["queries"] == timings
    assert line["value"] == full["value"] == round(sum(timings.values()), 3)


def test_canary_rides_both_payloads_and_line_stays_small():
    timings = {f"q{i}": float(i) for i in range(300)}
    canary = {
        "query": "q_agg_groupby",
        "start_sec": 0.21,
        "middle_sec": 0.33,
        "end_sec": 0.25,
        "spread": 1.571,
    }
    line, full = bench.compact_payloads(timings, 0.1, canary)
    assert line["canary"] == canary and full["canary"] == canary
    assert len(json.dumps(line)) < 2048
    # canary omitted → payloads unchanged (back-compat with r1-r9 shape)
    line2, full2 = bench.compact_payloads(timings, 0.1)
    assert "canary" not in line2 and "canary" not in full2


def test_query_spreads_ride_sidecar_only():
    # r12: per-query repeat spreads land in the SIDECAR (per-query
    # co-tenant spikes self-adjudicate) but must never grow the line
    timings = {f"q{i}": float(i) for i in range(300)}
    spreads = {f"q{i}": 1.0 + i / 100.0 for i in range(300)}
    line, full = bench.compact_payloads(timings, 0.1, None, spreads)
    assert full["query_spreads"] == spreads
    assert "query_spreads" not in line
    assert len(json.dumps(line)) < 2048
    # omitted → sidecar unchanged (back-compat)
    _, full2 = bench.compact_payloads(timings, 0.1)
    assert "query_spreads" not in full2


def test_slowest_ten_are_the_actual_slowest():
    timings = {f"q{i}": float(i) for i in range(40)}
    line, _ = bench.compact_payloads(timings, 0.01)
    assert set(line["queries"]) == {f"q{i}" for i in range(30, 40)}


def test_headline_names_are_registered():
    from mongodb_iceberg_sync_spark.registry import all_specs

    specs = all_specs()
    missing = [q for q in bench.HEADLINE if q not in specs]
    assert missing == [], f"bench HEADLINE names not in registry: {missing}"
