"""Differential comparison helpers mirroring the driver's oracle check:
row count + schema (column names) + order-insensitive value comparison.
Stricter than a hash: exact cell equality (floats bitwise, NaN==NaN),
with a readable diff on failure so rounding gaps are debuggable.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from mongodb_iceberg_sync_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_cell(v: Any):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if v == 0.0:
            return ("f", 0.0)  # collapse -0.0/0.0
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", float(v))
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, (int,)):
        return ("i", int(v))
    return ("s", str(v))


def _to_sorted_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df.astype(object).where(pd.notnull(df), None).iterrows()
    ]
    return sorted(rows, key=repr)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        return [f"{name}: column mismatch spark={sc} duck={dc}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(
            f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
    srows, drows = _to_sorted_rows(spark_pdf), _to_sorted_rows(duck_pdf)
    n_bad = 0
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} spark={a} duck={b}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} mismatched rows total")
    elif n_bad == 0 and len(srows) != len(drows):
        pass  # row-count problem already recorded
    return problems


def run_pair(spark, con, spec, sf_dir: str) -> list[str]:
    sdf = spec.func(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = con.execute(spec.oracle).fetchdf()
    return compare_frames(spark_pdf, duck_pdf, spec.name)
