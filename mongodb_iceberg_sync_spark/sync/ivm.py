"""Incremental view maintenance for grouped aggregates.

The lakehouse pattern behind reference docs/design.md's continuously-
synced tables: a downstream materialized aggregate (per-group count +
sum) is kept current from CDC batches WITHOUT rescanning the base
table. Classic delta algebra for self-maintainable aggregates
(count/sum — avg derives; min/max need the base on delete):

    agg'  =  agg  ⊕  Δ⁻(old rows of touched keys)  ⊕  Δ⁺(new rows)

Every step is a DataFrame transform: the retraction side is a
semi-join of the previous snapshot against the batch's keys, the
delta is one map-side-combinable groupBy over batch-sized input, and
the merge is a full-outer coalesce on the (tiny) group key — at
100 TB the base table is never touched beyond the old-row lookup,
which is an equi-join on the table's sorted/bucketed key.

Sums ride DECIMAL so retraction is exact: float sums would drift
(a - a != 0 under reordered summation) and the maintained view would
diverge from a recompute; decimal deltas make ⊕ associative and the
invariant `incremental == recompute` testable to equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SUM_T = "decimal(28,10)"


def group_stats(rows: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Full recompute: per-group row count + exact decimal sum."""
    return rows.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(_SUM_T)).alias("s"),
    )


def incremental_group_stats(
    prev_agg: DataFrame,
    old_rows: DataFrame,
    new_rows: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Maintain ``prev_agg`` (schema g, n, s) through one CDC batch.

    ``old_rows``: the previous snapshot's rows for every key the batch
    touches (upserted OR deleted) — these are retracted. ``new_rows``:
    the batch's upsert rows — these are inserted. Groups whose count
    reaches zero drop out, so the maintained view is row-for-row equal
    to a recompute over the post-batch snapshot.
    """
    retract = old_rows.select(
        F.col(group_col).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col(value_col).cast(_SUM_T)).alias("ds"),
    )
    insert = new_rows.select(
        F.col(group_col).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_col).cast(_SUM_T).alias("ds"),
    )
    delta = (
        retract.unionByName(insert)
        .groupBy("g")
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
    )
    merged = prev_agg.alias("a").join(delta.alias("d"), "g", "full")
    zero = F.lit(0).cast(_SUM_T)
    return merged.select(
        "g",
        (
            F.coalesce(F.col("a.n"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0))
        ).alias("n"),
        # re-cast: decimal addition widens precision (28,10 -> 29,10);
        # the maintained state must keep a FIXED schema across batches
        (F.coalesce(F.col("a.s"), zero) + F.coalesce(F.col("d.ds"), zero))
        .cast(_SUM_T)
        .alias("s"),
    ).filter(F.col("n") > 0)
