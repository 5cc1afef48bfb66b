"""Registry invariants the driver contract rests on.

- `_SWEEP_PRIORITY` must be typo-free (every listed name registered, no
  duplicates) and must be the exact front of `all_specs()` order — the
  driver's 50-query CORRECTNESS window is its first 50 names.
- While never-driver-checked queries remain, the window must contain
  ONLY such names (a checked name in the window wastes a gate slot —
  the r4 verdict's backlog arithmetic).
- Every `oracle=None` registration must point at a dedicated pin test
  (the rows-only driver check alone proves nothing about values).
"""

from __future__ import annotations

import json
import os
import subprocess

from mongodb_iceberg_sync_spark.registry import (
    REGISTRY,
    _SWEEP_PRIORITY,
    all_specs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (pin test file, token to find there); token defaults to the
# query name. Extending the no-oracle surface REQUIRES extending this map.
NO_ORACLE_PINS: dict[str, tuple[str, str]] = {
    "q_profile_columns_sketch": ("tests/test_scale_patterns.py", ""),
    "q_agg_percentile_sketch": ("tests/test_scale_patterns.py", ""),
    "q_embed_pca": ("tests/test_rows_only_pins.py", ""),
    "q_text_bpe_encode": ("tests/test_bpe_encode.py", ""),
    "q_ml_logreg": ("tests/test_ml_logreg.py", ""),
    "q_agg_countmin_fast": ("tests/test_rows_only_pins.py", ""),
    "q_agg_hll_union": ("tests/test_rows_only_pins.py", ""),
    "q_text_compress_ratio": ("tests/test_text.py", ""),
    "q_multimodal_phash": ("tests/test_multimodal.py", ""),
    "q_multimodal_dup_clusters": ("tests/test_multimodal.py", ""),
    "q_stream_foreachbatch_merge": ("tests/test_streaming.py", "foreachbatch_merge"),
    "q_sink_partitioned": ("tests/test_rows_only_pins.py", ""),
    "q_agg_approx": ("tests/test_rows_only_pins.py", ""),
    "q_agg_hll": ("tests/test_scale_patterns.py", ""),
    "q_schema_union": ("tests/test_rows_only_pins.py", ""),
    "q_multimodal_features": ("tests/test_multimodal.py", ""),
    "q_sim_topk_ivf": ("tests/test_rows_only_pins.py", ""),
    "q_sim_ann_lsh": ("tests/test_scale_patterns.py", ""),
    "q_cluster_kmeans": ("tests/test_scale_patterns.py", "kmeans_fit"),
    "q_sim_pq": ("tests/test_scale_patterns.py", ""),
    "q_dedup_near": ("tests/test_rows_only_pins.py", ""),
    "q_dedup_simhash": ("tests/test_rows_only_pins.py", ""),
    "q_dedup_bloom": ("tests/test_dedup_bloom.py", ""),
    "q_graph_pagerank": ("tests/test_graph.py", ""),
    "q_graph_hits": ("tests/test_graph.py", ""),
}


def _correctness_checked() -> set[str]:
    """Names with a driver row in any *committed* CORRECTNESS file.

    Reads CORRECTNESS_r*.json from HEAD (git), not the working tree: the
    driver drops its round file as an untracked artifact at the round
    boundary, before the builder's first commit, and a working-tree glob
    would redden the rotation tripwire with zero code change (r5 verdict,
    What's wrong #1). Reading HEAD means the tripwire flags a builder that
    committed without rotating — never a driver that just delivered.
    Falls back to the working-tree glob outside a git checkout.
    """
    try:
        # Accumulate locally and publish only if the WHOLE git walk
        # succeeds: a mid-loop failure (e.g. one malformed committed JSON)
        # must fall back cleanly to the working-tree view, never union a
        # partial HEAD read with it (the two sources are exclusive).
        head_checked: set[str] = set()
        tracked = subprocess.run(
            ["git", "ls-tree", "-r", "--name-only", "HEAD"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split("\n")
        for fn in tracked:
            if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
                blob = subprocess.run(
                    ["git", "show", f"HEAD:{fn}"],
                    cwd=REPO, capture_output=True, text=True, check=True,
                ).stdout
                head_checked |= set(json.loads(blob))
        return head_checked
    except (subprocess.CalledProcessError, FileNotFoundError, ValueError):
        pass
    checked: set[str] = set()
    for fn in os.listdir(REPO):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(REPO, fn)) as f:
                checked |= set(json.load(f))
    return checked


def test_priority_list_is_clean_and_leads_spec_order():
    specs = all_specs()  # loads all operator modules
    stale = [n for n in _SWEEP_PRIORITY if n not in REGISTRY]
    assert stale == [], f"stale names in _SWEEP_PRIORITY: {stale}"
    assert len(set(_SWEEP_PRIORITY)) == len(_SWEEP_PRIORITY), "duplicates"
    assert list(specs)[: len(_SWEEP_PRIORITY)] == list(_SWEEP_PRIORITY)


def test_driver_window_holds_only_unchecked_names():
    specs = list(all_specs())
    checked = _correctness_checked()
    unchecked = [n for n in specs if n not in checked]
    if not unchecked:  # backlog fully drained: any window content is fine
        return
    window = specs[:50]
    wasted = [n for n in window if n in checked and len(unchecked) > specs.index(n)]
    # every window slot holding a checked name while an unchecked name
    # sits behind it is a wasted CORRECTNESS row
    assert wasted == [], f"checked names ahead of unchecked ones: {wasted}"


def test_fresh_correctness_drop_does_not_redden_the_window():
    """A driver result dropped mid-round (untracked file) must not flip
    the rotation tripwire — only the committed state counts (r5 verdict
    task #2). Simulates the round boundary: write an untracked
    CORRECTNESS_r99.json covering the entire current window, and assert
    the tripwire still reads the committed state only."""
    specs = list(all_specs())
    fake = os.path.join(REPO, "CORRECTNESS_r99.json")
    assert not os.path.exists(fake)
    before = _correctness_checked()
    try:
        with open(fake, "w") as f:
            json.dump({n: {"hash_match": True} for n in specs[:50]}, f)
        assert _correctness_checked() == before, (
            "untracked CORRECTNESS file leaked into the tripwire's view"
        )
        test_driver_window_holds_only_unchecked_names()
    finally:
        os.remove(fake)


def test_every_no_oracle_query_has_a_registered_pin():
    for name, spec in all_specs().items():
        if spec.oracle is not None:
            continue
        assert name in NO_ORACLE_PINS, (
            f"{name}: oracle=None but no pin registered in NO_ORACLE_PINS — "
            "add a dedicated correctness test and map it here"
        )
        path, token = NO_ORACLE_PINS[name]
        token = token or name
        full = os.path.join(REPO, path)
        assert os.path.exists(full), f"{name}: pin file {path} missing"
        with open(full) as f:
            assert token in f.read(), f"{name}: {path} no longer mentions {token}"
