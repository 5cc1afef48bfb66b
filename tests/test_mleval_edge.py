"""Degenerate-corpus parity pins for the mleval family.

`q_ml_regression_metrics` scores the engagement-rate baseline
y_hat = s * tp / ts; an all-purchase corpus makes ts = 0 and every rate
undefined. Pre-r6 the two engines diverged there: Spark's division by
zero yielded NULL metrics while DuckDB's double division yielded inf and
`CAST(round(inf) AS BIGINT)` raised (ADVICE r5 #2). Both sides now guard
symmetrically with NULLIF, so the degenerate input must produce the SAME
NULL metrics on both engines — pinned here with a synthesized corpus
because no parquet fixture is all-purchase.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from mongodb_iceberg_sync_spark.registry import all_specs

from .parity import duck_connection, run_pair


@pytest.fixture(scope="module")
def degenerate_sf(sf_dir, tmp_path_factory):
    """sf0.001 with every event rewritten to 'purchase' (ts = 0)."""
    deg = str(tmp_path_factory.mktemp("degenerate_sf"))
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, name)
        if name == "events.parquet":
            duckdb.sql(
                f"COPY (SELECT * REPLACE ('purchase' AS event_type) "
                f"FROM '{src}') TO '{deg}/{name}' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(src, os.path.join(deg, name))
    yield deg
    shutil.rmtree(deg, ignore_errors=True)


def test_regression_metrics_all_purchase_corpus_matches_oracle(
    spark, degenerate_sf
):
    spec = all_specs()["q_ml_regression_metrics"]
    problems = run_pair(spark, duck_connection(degenerate_sf), spec, degenerate_sf)
    assert problems == [], problems


def test_regression_metrics_degenerate_metrics_are_null(spark, degenerate_sf):
    spec = all_specs()["q_ml_regression_metrics"]
    row = spec.func(spark, degenerate_sf).collect()[0]
    assert row["n"] > 0
    assert row["mae"] is None and row["rmse"] is None and row["r2"] is None
