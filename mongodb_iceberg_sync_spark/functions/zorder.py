"""Z-order (Morton) interleaving — multi-column clustering for data
skipping.

Sorting a table by ONE column gives its min/max file stats perfect
selectivity on that column and none on any other. Interleaving the
bits of two columns into one Morton code and sorting by THAT gives
both columns locality: a file holds a small rectangle of the (x, y)
space, so manifest/footer min-max stats prune scans filtered on x, y,
or both (Delta's Z-ORDER BY, Iceberg's z-ordered rewrite — same
trick). The code is pure bit arithmetic, identically computable in
Spark and DuckDB, so the operator is exact-hash-checkable.

The classic 16-bit spread: after `x = (x | x<<8) & 0x00FF00FF; ...
& 0x55555555`, x's bits occupy even positions; z = spread(x) |
spread(y) << 1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = [  # (shift, mask) — classic Morton magic numbers
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(col: Column) -> Column:
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(x, y) -> Column:
    """64-bit Morton code of two 16-bit-clamped integer columns."""
    return _spread_bits(F.col(x) if isinstance(x, str) else x).bitwiseOR(
        F.shiftleft(_spread_bits(F.col(y) if isinstance(y, str) else y), 1)
    )


def morton_sql(x: str, y: str) -> str:
    """The identical computation as DuckDB SQL text (for oracles)."""

    def spread(expr: str) -> str:
        e = f"(CAST({expr} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD_STEPS:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"
