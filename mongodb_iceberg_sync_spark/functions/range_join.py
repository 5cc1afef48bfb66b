"""Banded range join: the equi-join scale path for interval predicates.

A predicate like `c.value BETWEEN s.value - W AND s.value + W` executes
as broadcast-nested-loop when one side fits in memory — at 100 TB with
two large sides that degenerates to an O(n·m) loop. The standard fix
(used by Databricks' range-join optimization and DuckDB's IEJoin
alternatives) is *banding*: bucket both sides by `floor(value / W)`,
replicate the probe side into its neighbor buckets (±1), equi-join on
the bucket id, then re-apply the exact predicate. The join becomes one
keyed shuffle; each row only meets rows within one band of it, and the
post-filter restores exactness.

Reference has no analog (it is a sync pipeline); this backs
operators.joins.q_join_theta_range's scale path and is exposed as
q_join_range_banded (same oracle SQL as the nested-loop variant —
identical semantics, different physical strategy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_value: str,
    width: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join rows where |left.left_value - right.right_value| <= width.

    Both sides are bucketed by floor(value / width); the LEFT side is
    replicated into buckets b-1, b, b+1 (explode of a 3-element array —
    constant-factor amplification, still linear), so every qualifying
    pair shares a bucket. The returned DataFrame contains all columns
    of both inputs; the exact band predicate is already applied.
    """
    lb = F.floor(F.col(left_value) / F.lit(float(width))).cast("long")
    rb = F.floor(F.col(right_value) / F.lit(float(width))).cast("long")
    l_rep = left.withColumn(
        "_band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_b = right.withColumn("_band", rb)
    cond = (F.col(left_value) >= F.col(right_value) - F.lit(float(width))) & (
        F.col(left_value) <= F.col(right_value) + F.lit(float(width))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return (
        l_rep.join(r_b, "_band")
        .filter(cond)
        .drop("_band")
    )
