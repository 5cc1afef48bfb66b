"""Dead-letter quarantine for malformed CDC events.

The reference's pipeline assumes every change-stream document is
well-formed (docs/design.md:115-126 dispatches on op type only); in
production feeds carry nulls, truncated JSON, and keyless documents,
and a sync daemon must neither crash on them nor silently write null
rows. The lakehouse answer is a dead-letter queue: malformed events
are routed — with a machine-readable reason — to a quarantine table
that is itself queryable, while the well-formed remainder commits
normally and the resume position still advances past the bad events
(they are consumed, not retried forever).

All checks are JVM-side column predicates (from_json returns NULL on
corrupt input in PERMISSIVE mode — no UDF, no exception control
flow), so the split is a map-only pass that fuses into the batch's
existing scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .apply import DELETE_OPS

REASON_COL = "_dlq_reason"


def _reason(key: str, doc_col: str) -> F.Column:
    """NULL for well-formed rows, else the first matching reason.

    Deletes legitimately carry no document (the tombstone is the key),
    so doc checks apply only to upsert-shaped ops.
    """
    is_delete = F.col("op_type").isin(*DELETE_OPS)
    parsed = F.from_json(F.col(doc_col), "map<string,string>")
    return (
        F.when(F.col(key).isNull(), F.lit("missing_key"))
        .when(~is_delete & F.col(doc_col).isNull(), F.lit("missing_document"))
        .when(~is_delete & parsed.isNull(), F.lit("malformed_json"))
    )


def split_malformed(
    events: DataFrame, key: str = "doc_id", doc_col: str = "full_doc"
) -> tuple[DataFrame, DataFrame]:
    """(well_formed, quarantined) — quarantined rows carry REASON_COL."""
    tagged = events.withColumn(REASON_COL, _reason(key, doc_col))
    good = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    bad = tagged.filter(F.col(REASON_COL).isNotNull())
    return good, bad


def write_quarantine(bad: DataFrame, quarantine_dir: str, batch_id: int) -> None:
    """Append quarantined events under batch=N (idempotent: a replayed
    batch overwrites its own partition, mirroring MorTable's
    commit-ordering protocol)."""
    bad.withColumn("_batch_id", F.lit(batch_id).cast("long")).write.mode(
        "overwrite"
    ).parquet(f"{quarantine_dir}/batch={batch_id}")
