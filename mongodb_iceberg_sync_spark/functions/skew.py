"""Salted two-phase aggregation: the standard fix for skewed group keys.

A `groupBy(key)` hash-shuffles every row to its key's reducer. With a
power-law key distribution (one customer with 10% of all orders, one
language with half the corpus) the hot key's reducer becomes the
straggler that dominates the stage — AQE can split skewed JOIN
partitions, but a skewed AGGREGATION partition cannot be split because
all rows of a key must meet at one reducer.

The salting rewrite restores balance for ALGEBRAIC aggregates
(sum/count/min/max — anything with a merge function): phase 1 groups by
`(key, salt)` where salt = hash(row) % N, spreading each hot key over N
reducers that each produce a partial; phase 2 groups the N partials by
`key` and merges. Phase 2's input is at most N rows per key — trivially
small — so the second shuffle cannot be skewed. Spark's built-in
partial aggregation does the same thing per MAP TASK; salting extends
it to the REDUCE side, which partial aggregation cannot fix when one
key's partials are still too many/too heavy for one reducer (e.g.
count-distinct-style states or extreme row counts per key).

No reference analog (sync pipeline); this backs q_agg_salted, which
oracle-proves the rewrite returns bit-identical results to a plain
GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (partial_agg, merge_agg) pairs per supported algebraic aggregate:
# phase 1 computes partial_agg over the raw column, phase 2 merges the
# per-salt partials with merge_agg.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` is a list of (agg_name, value_col, out_alias) with
    agg_name in {sum, count, min, max}. ``salt_col`` defaults to a
    deterministic per-row hash salt (xxhash64 of all columns), so the
    result is reproducible; any expression with enough entropy works —
    the salt only balances, it never affects the merged result.
    """
    unsupported = [a for a, _, _ in aggs if a not in _ALGEBRAIC]
    if unsupported:
        raise ValueError(
            f"salted_agg supports algebraic aggregates {sorted(_ALGEBRAIC)}; "
            f"got {unsupported} (holistic aggregates like median cannot be "
            "salted — they have no merge function)"
        )
    if salt_col is None:
        salt_col = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*key_cols, "_salt")
        .agg(
            *[
                _ALGEBRAIC[name][0](F.col(col)).alias(f"_p_{alias}")
                for name, col, alias in aggs
            ]
        )
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            _ALGEBRAIC[name][1](F.col(f"_p_{alias}")).alias(alias)
            for name, col, alias in aggs
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: the skew fix for a hot JOIN key.

    The fact side gets a deterministic per-row salt; the dim side is
    replicated n_salts times (explode of a literal range — dim rows
    multiply by N, so use this when dim << fact, the usual skew shape).
    Joining on (keys..., _salt) spreads a hot key's fact rows over N
    reducers instead of one straggler. Complements AQE's skew-join
    split (which only kicks in past its partition-size thresholds and
    cannot help a broadcast-ineligible dim with one monster key).

    Pure physical rewrite ONLY for fact-preserving join types
    (inner/left/left_semi/left_anti): each fact row carries exactly one
    salt, so it meets exactly the dim rows it would meet unsalted. For
    right/full/outer the rewrite is WRONG — a replicated dim row whose
    (key, salt) matches no fact row would emit its own null-extended
    output, duplicating unmatched dim keys up to n_salts times — so
    those join types are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only fact-preserving join types "
            "(inner/left/left_semi/left_anti) are a pure rewrite; "
            "right/full joins would duplicate unmatched dim keys per salt"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, on=[*keys, "_salt"], how=how).drop("_salt")
