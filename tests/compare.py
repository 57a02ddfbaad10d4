"""Spark-vs-DuckDB result comparison, byte-faithful to the driver's t2 check.

The driver canonicalizes BOTH sides through pandas and hashes values, so
this mirror must reproduce its two sharp edges (round-1 postmortem):

1. DuckDB HUGEINT (sum(BIGINT)) -> pandas float64 -> renders 6.0 while
   Spark emits int64 6.  A value-level int/float mix is therefore a REAL
   mismatch here, never normalized away (round 1's local mirror collapsed
   Decimal->float and let five driver failures through).
2. pandas sort_values crashes on list cells (`unhashable type: 'list'`).
   We run the same sort on the oracle frame so an array-typed output
   column fails loudly in pytest instead of ERR-ing in the driver.

Values must match EXACTLY after normalization — any float drift is a
query bug (fix the query's rounding, not the test).
"""

from __future__ import annotations

import datetime
import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", bool(v))
    if hasattr(v, "item") and type(v).__module__ == "numpy":  # numpy scalar
        return _norm(v.item())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # NO -0.0 collapse: the driver's value hash distinguishes -0.0 from
        # +0.0 (round-4 postmortem: ts_rolling_corr passed locally because
        # this mirror collapsed the sign, then failed the driver).  Ops must
        # normalize on both sides (util.r4 / util.sql_r4).
        # floats and ints never compare equal: the driver's value hash
        # distinguishes 6 from 6.0 (that WAS round 1's failure mode)
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        # DuckDB fetchdf renders DATE as midnight Timestamp; Spark keeps
        # datetime.date — collapse tz-naive midnights to dates so a DATE
        # column compares equal across the two container types.
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (
            0,
            0,
            0,
            0,
        ):
            return ("d", v.date().isoformat())
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
    s_pdf = spark_df.toPandas()
    d_pdf = duck_con.execute(oracle_sql).fetchdf()  # HUGEINT -> float64, as driver

    s_cols, d_cols = list(s_pdf.columns), list(d_pdf.columns)
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    # Reproduce the driver canonicalizer's sort — crashes on list cells.
    for pdf in (s_pdf, d_pdf):
        if len(pdf):
            pdf.sort_values(by=sorted(pdf.columns), key=None)

    s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
    d_rows = [tuple(r) for r in d_pdf.itertuples(index=False, name=None)]
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
