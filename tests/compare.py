"""Spark-vs-DuckDB result comparison, modeled on the driver's t2 check:
column names (order-insensitive), row count, and an order-insensitive
value-level comparison.  Values must match EXACTLY after normalization —
the driver hashes values, so approximate equality is not good enough; any
float drift is a query bug (fix the query's rounding, not the test)."""

from __future__ import annotations

import datetime
import decimal
import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":  # numpy scalar
        return _norm(v.item())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def normalize_rows(rows, cols):
    """Project each row to sorted-column order, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, duck_con, oracle_sql):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = duck_con.execute(oracle_sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = normalize_rows(s_rows, s_cols)
    dn = normalize_rows(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(
            f"value mismatch ({len([1 for a, b in zip(sn, dn) if a != b])} rows differ); "
            f"first diffs (spark, duck): {diffs}"
        )
