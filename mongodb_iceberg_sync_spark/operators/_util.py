"""Shared helpers for operator modules."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Hashable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Row-count gate for explicit broadcast hints on tables whose size grows
# with the corpus (O(V) node/label/score tables in the iterative graph
# ops). An explicit F.broadcast() hint OVERRIDES
# spark.sql.autoBroadcastJoinThreshold: Spark attempts the broadcast
# unconditionally up to the hard 8 GB / 512M-row relation cap and fails
# the job (or OOMs the driver) past it — it does NOT degrade to a keyed
# join. So the hint must only be applied when the row count is known
# small. 8M rows of (long, long) builds a hash relation in the low
# hundreds of MB — comfortably inside executor/driver memory while still
# covering any bench-scale table; override per deployment via
# SPARK_GRAFT_BCAST_MAX_ROWS (rows, not bytes, because callers gate on
# counts they already compute for convergence probes).
_BCAST_MAX_ROWS_DEFAULT = 8_000_000


def bcast_gate(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint ``df`` only when ``n_rows`` is known to be small.

    ``n_rows`` is a row count the caller already has (or None when
    unknown — no hint, let the planner decide from its own estimates).
    Returns ``F.broadcast(df)`` under the gate, ``df`` unchanged above
    it, so past the gate the join degrades to a keyed shuffle join
    instead of aborting at the broadcast cap.
    """
    cap = int(os.environ.get("SPARK_GRAFT_BCAST_MAX_ROWS", _BCAST_MAX_ROWS_DEFAULT))
    if n_rows is not None and n_rows <= cap:
        return F.broadcast(df)
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    For compute-bound per-row stages (per-position hashing, shingle
    expansion, char histograms): a small parquet file arrives as ONE
    input split, which would serialize the whole projection on a single
    core. At 100 TB the scan has natural parallelism and AQE would keep
    this exchange no-op-sized relative to the compute it unlocks; on the
    bench files it is the difference between 1 and 32 cores. Spread the
    NARROW input (raw rows) before expansion so the exchange carries the
    cheap representation. Only safe where downstream results do not
    depend on row/partition placement (aggregations, joins, per-row
    projections with a total order on output).
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# ---------------------------------------------------------------------------
# Session-scoped fixture store for write-then-read operators.
#
# Operators that demonstrate a STORAGE layout (scan round-trips through
# json/csv/orc/text, the DPP-partitioned fact, the sorted-file sink) must
# materialize files on local disk. Rebuilding the layout on every sweep /
# bench / pytest invocation both leaks sf-scale parquet copies into /tmp
# (9 mkdtemp sites grew without bound) and pollutes the measured time of
# the READ path the operator exists to showcase. Instead: one temp root
# per process, removed at interpreter exit; layouts cached per key so the
# second invocation within a session reuses the files.
# ---------------------------------------------------------------------------

_FIXTURE_ROOT: str | None = None
_FIXTURE_CACHE: dict[tuple[Hashable, ...], str] = {}


def _fixture_root() -> str:
    global _FIXTURE_ROOT
    if _FIXTURE_ROOT is None:
        _FIXTURE_ROOT = tempfile.mkdtemp(prefix="mis_session_")
        atexit.register(shutil.rmtree, _FIXTURE_ROOT, ignore_errors=True)
    return _FIXTURE_ROOT


def session_tmpdir(prefix: str) -> str:
    """Fresh (uncached) temp dir under the session root — cleaned at exit.

    For fixtures that must NOT be reused (streaming checkpoints, CDC
    source feeds) but should still not accumulate across invocations.
    """
    return tempfile.mkdtemp(prefix=prefix, dir=_fixture_root())


def session_fixture(key: tuple[Hashable, ...], build: Callable[[str], None]) -> str:
    """Build-once-per-session on-disk layout keyed on (op, sf_dir, ...).

    ``build(path)`` writes the layout into ``path`` on first use; later
    calls with the same key return the cached path untouched.
    """
    if key not in _FIXTURE_CACHE:
        out = tempfile.mkdtemp(prefix=str(key[0]) + "_", dir=_fixture_root())
        build(out)
        _FIXTURE_CACHE[key] = out
    return _FIXTURE_CACHE[key]
