"""Differential pin for q_ml_logreg: the distributed quantized-gradient
trainer must produce bit-identical weights and accuracy to an
independent pure-Python implementation of the same algorithm on the
same per-user feature table. Quantizing each row's gradient
contribution to exact 1e-9 integers before summing is what makes this
an EXACT pin — float partial-sum order never enters."""

from __future__ import annotations

import math

import duckdb

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()

_ITERS = 10
_RATE = 0.5
_QUANT = 1_000_000_000


def _round_half_up(v: float) -> int:
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _ref_train(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT count(*) AS n_events,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_buys,
               sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY user_id
        """
    ).fetchall()
    feats = []
    for n_events, n_views, n_buys, value_cents in rows:
        x1 = math.log(float(n_events) + 1.0)
        x2 = float(n_views) / float(n_events)
        x3 = math.log(float(value_cents) / float(n_events) / 100.0 + 1.0)
        y = 1.0 if n_buys > 0 else 0.0
        feats.append((1.0, x1, x2, x3, y))
    n = len(feats)
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_ITERS):
        g = [0, 0, 0, 0]
        for x0, x1, x2, x3, y in feats:
            # same left-fold float expression tree as the Spark side
            z = 0.0 + w[0] * x0 + w[1] * x1 + w[2] * x2 + w[3] * x3
            err = 1.0 / (1.0 + math.exp(-z)) - y
            for j, xj in enumerate((x0, x1, x2, x3)):
                g[j] += _round_half_up(err * xj * _QUANT)
        w = [wj - _RATE * (g[j] / _QUANT) / n for j, wj in enumerate(w)]
    correct = 0
    for x0, x1, x2, x3, y in feats:
        z = 0.0 + w[0] * x0 + w[1] * x1 + w[2] * x2 + w[3] * x3
        correct += 1 if (1.0 if z > 0 else 0.0) == y else 0
    return w, correct / n


def test_logreg_matches_python_reference(spark, sf_dir):
    w, acc = _ref_train(sf_dir)
    got = {
        r.term: r.value
        for r in SPECS["q_ml_logreg"].func(spark, sf_dir).collect()
    }
    assert got["bias"] == round(w[0], 9)
    assert got["w_log_events"] == round(w[1], 9)
    assert got["w_view_share"] == round(w[2], 9)
    assert got["w_log_avg_value"] == round(w[3], 9)
    assert got["train_accuracy"] == round(acc, 6)
    # the model must actually separate something at sf>=0.001
    assert got["train_accuracy"] >= 0.5


def test_logreg_deterministic(spark, sf_dir):
    a = sorted(map(tuple, SPECS["q_ml_logreg"].func(spark, sf_dir).collect()))
    b = sorted(map(tuple, SPECS["q_ml_logreg"].func(spark, sf_dir).collect()))
    assert a == b
