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


# --- Spark 4 transformWithStateInPandas variant -----------------------
# The successor API to applyInPandasWithState: an object-oriented
# StatefulProcessor with named, independently-evolvable state variables
# (ValueState here; ListState/MapState/timers available), the shape new
# stateful operators should take going forward. Same longest-run logic
# as _update above, so the test can assert both implementations agree
# with the batch twin.

try:  # pragma: no cover - import guard for older Spark / missing deps
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # TWS runs a state-server protocol between the JVM and a dedicated
    # Python driver worker over protobuf; without protobuf the worker
    # crashes at runtime, so gate availability here (the brief's rule:
    # import-try anything not baked into the environment)
    import google.protobuf  # noqa: F401

    def longest_run_stream_tws(events: DataFrame) -> DataFrame:
        """transformWithStateInPandas version of longest_run_stream.

        The processor class is defined INSIDE this function so
        cloudpickle serializes it BY VALUE: TWS runs a dedicated Python
        "driver worker" process that unpickles the processor without
        this repo on sys.path, so a module-level class (pickled by
        reference) crashes it with ModuleNotFoundError. Also requires
        the RocksDB state store provider (session.py sets it).
        """
        state_schema = STATE_SCHEMA

        class LongestRunProcessor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getValueState("run_state", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                import pandas as pd  # by-value closure: import locally

                got = self._state.get()
                last_type, cur, best, n_runs = (
                    got if got is not None else (None, 0, 0, 0)
                )
                for pdf in rows:
                    pdf = pdf.sort_values(["ts", "event_id"])
                    for et in pdf["event_type"]:
                        if et == last_type:
                            cur += 1
                        else:
                            cur = 1
                            n_runs += 1
                            last_type = et
                        best = max(best, cur)
                self._state.update((last_type, cur, best, n_runs))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "max_run": [best], "n_runs": [n_runs]}
                )

            def close(self) -> None:
                pass

        return (
            events.select("user_id", "event_type", "ts", "event_id")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=LongestRunProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover
    longest_run_stream_tws = None  # type: ignore[assignment]


# --- streaming alert debounce (q_window_alert_debounce's stream twin) --

DEBOUNCE_OUTPUT = "user_id bigint, ts timestamp, event_type string"
DEBOUNCE_STATE = "last_type string"


def _debounce_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit only state CHANGES per user, carrying the last seen type
    across micro-batches (append semantics: each transition is emitted
    exactly once, when it happens)."""
    last_type = state.get[0] if state.exists else None
    out_ts, out_type = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts_v, et in zip(pdf["ts"], pdf["event_type"]):
            if et != last_type:
                out_ts.append(ts_v)
                out_type.append(et)
                last_type = et
    state.update((last_type,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_ts),
            "ts": out_ts,
            "event_type": out_type,
        }
    )


def debounce_stream(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user state transitions only.

    The streaming twin of operators.windows.q_window_alert_debounce:
    because the file source delivers micro-batches in event-time order
    (and rows are sorted within each batch), the carried last_type makes
    the union of all emissions EQUAL to the batch lag-filter — pinned in
    tests/test_streaming.py::test_debounce_stream_matches_batch."""
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _debounce_update,
            outputStructType=DEBOUNCE_OUTPUT,
            stateStructType=DEBOUNCE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
