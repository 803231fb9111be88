"""Driver-faithful result comparison for the oracle differential tests.

The round-1 gate (`CORRECTNESS_r01.json`) hash-failed `events_sessionize_sql`
even though the pure-Python normalization in the old test harness passed:
the driver compares results through *pandas* frames (Spark ``toPandas`` vs
DuckDB ``fetchdf``), so an int64-vs-float64 dtype difference (DuckDB HUGEINT
→ float64) changes the value hash even when every Python-level value is
equal.  This module replicates that comparison path so local green implies
gate green:

- both sides are materialized as pandas DataFrames;
- columns are sorted by name (the driver's documented behavior);
- numpy dtype *kinds* must agree per column (int vs float vs bool vs
  datetime vs object) — width differences (int32/int64) are allowed;
- values are compared exactly after a canonical per-kind rendering.
"""

from __future__ import annotations

import datetime
import math

import numpy as np
import pandas as pd

# dtype-kind equivalence classes: i/u → int, f → float, b → bool,
# M → datetime, O/S/U → object-ish (strings, lists, None).
_KIND_CLASS = {
    "i": "int",
    "u": "int",
    "f": "float",
    "b": "bool",
    "M": "datetime",
    "m": "timedelta",
    "O": "object",
    "S": "object",
    "U": "object",
}


def dtype_class(dtype) -> str:
    return _KIND_CLASS.get(np.dtype(dtype).kind, np.dtype(dtype).kind)


def _column_class(series: pd.Series) -> str:
    """dtype class for comparison, sniffing object columns.

    Spark ``toPandas`` returns DateType columns as object arrays of
    ``datetime.date`` while DuckDB returns datetime64 — the r1 gate
    treated those as equal (every date-bearing diab_gold_* query was
    hash-green), so classify date-valued object columns as datetime.
    """
    cls = dtype_class(series.dtype)
    if cls == "object":
        for v in series:
            if v is None:
                continue
            if isinstance(v, (datetime.datetime, datetime.date, pd.Timestamp)):
                return "datetime"
            return "object"
    return cls


def _render(v) -> str:
    """Canonical string for a cell value (post dtype check)."""
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(int(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        # render as midnight datetime so DATE == datetime64 at 00:00:00
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []

    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"{name}: column mismatch {s_cols} vs {o_cols}"]

    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
        )

    for c in s_cols:
        sk, ok = _column_class(spark_pdf[c]), _column_class(oracle_pdf[c])
        if sk != ok:
            problems.append(
                f"{name}: dtype kind mismatch on {c!r}: spark {spark_pdf[c].dtype}"
                f" ({sk}) vs oracle {oracle_pdf[c].dtype} ({ok})"
            )
    if problems:
        return problems

    s_rows = sorted(
        tuple(_render(v) for v in row)
        for row in spark_pdf[s_cols].itertuples(index=False, name=None)
    )
    o_rows = sorted(
        tuple(_render(v) for v in row)
        for row in oracle_pdf[o_cols].itertuples(index=False, name=None)
    )
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        only_s = [r for r in s_rows if r not in set(o_rows)][:2]
        problems.append(
            f"{name}: value mismatch; first row-wise diffs {diffs}; "
            f"spark-only sample {only_s}"
        )
    return problems
