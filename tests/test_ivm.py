"""Incremental view maintenance invariant: after every CDC batch,
the maintained aggregate equals a full recompute over the snapshot.

Randomized (fixed seed) sequence of upsert/delete batches, including
group-migrating updates (a key changing groups must decrement one
group and increment another) and group-emptying deletes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mongodb_iceberg_sync_spark.sync.ivm import (
    group_stats,
    incremental_group_stats,
)

GROUPS = ["g0", "g1", "g2", "g3"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, value double")


def _canon(df):
    return sorted(
        (r["g"], r["n"], float(r["s"])) for r in df.collect()
    )


def test_incremental_equals_recompute_over_random_batches(spark):
    rng = random.Random(7)
    state: dict[int, tuple[str, float]] = {
        k: (rng.choice(GROUPS), round(rng.uniform(-100, 100), 3))
        for k in range(40)
    }
    snap = _df(spark, [(k, g, v) for k, (g, v) in state.items()])
    agg = group_stats(snap, "grp", "value").localCheckpoint(eager=True)

    for step in range(6):
        touched = rng.sample(sorted(set(state) | set(range(100, 110))), 12)
        deletes = {k for k in touched if k in state and rng.random() < 0.3}
        upserts = {
            k: (rng.choice(GROUPS), round(rng.uniform(-100, 100), 3))
            for k in touched
            if k not in deletes
        }
        old_rows = _df(
            spark,
            [(k, *state[k]) for k in touched if k in state],
        )
        new_rows = _df(spark, [(k, g, v) for k, (g, v) in upserts.items()])
        agg = incremental_group_stats(
            agg, old_rows, new_rows, "grp", "value"
        ).localCheckpoint(eager=True)

        for k in deletes:
            state.pop(k, None)
        state.update(upserts)
        snap = _df(spark, [(k, g, v) for k, (g, v) in state.items()])
        expect = group_stats(snap, "grp", "value")
        assert _canon(agg) == _canon(expect), f"diverged at step {step}"


def test_group_emptying_delete_drops_row(spark):
    snap = _df(spark, [(1, "solo", 5.0), (2, "other", 1.0)])
    agg = group_stats(snap, "grp", "value")
    old_rows = _df(spark, [(1, "solo", 5.0)])
    new_rows = _df(spark, []).filter(F.lit(False))
    out = incremental_group_stats(agg, old_rows, new_rows, "grp", "value")
    assert _canon(out) == [("other", 1, 1.0)]
