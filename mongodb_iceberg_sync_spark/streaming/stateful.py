"""Arbitrary stateful streaming (SURVEY.md §2B q_stream_stateful twin).

Per-key custom state via applyInPandasWithState: running session stats
per user that survive across micro-batches. The batch twin
(operators.stream_batch_equiv.q_stream_stateful) computes the same
run-length logic on the full log; this version carries (last_type,
current_run, best_run, n_runs) in state between batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, max_run bigint, n_runs bigint"
STATE_SCHEMA = "last_type string, cur bigint, best bigint, n_runs bigint"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_type, cur, best, n_runs = state.get
    else:
        last_type, cur, best, n_runs = None, 0, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for et in pdf["event_type"]:
            if et == last_type:
                cur += 1
            else:
                cur = 1
                n_runs += 1
                last_type = et
            best = max(best, cur)
    state.update((last_type, cur, best, n_runs))
    yield pd.DataFrame(
        {"user_id": [key[0]], "max_run": [best], "n_runs": [n_runs]}
    )


def longest_run_stream(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user longest same-type run, updated
    each micro-batch with carried state."""
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
