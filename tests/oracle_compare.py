"""Local mirror of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame result against a DuckDB result: row count, sorted
column names, and order-insensitive cell values (rows sorted by their string
form). Used by the test suite so oracle drift is caught before the driver's
per-round CORRECTNESS check.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def _norm_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        items = v.tolist() if hasattr(v, "tolist") else list(v)
        return "[" + ",".join(_norm_cell(x) for x in items) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    """Return (match, message). duck_rel is a DuckDB relation/result."""
    sp = spark_df.toPandas()
    dk = duck_rel.df()
    if sorted(sp.columns) != sorted(dk.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
    if len(sp) != len(dk):
        return False, f"row counts differ: spark={len(sp)} duck={len(dk)}"
    a, b = _normalize(sp), _normalize(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first diffs (spark vs duck): {diffs}"
    return True, f"ok ({len(sp)} rows)"
