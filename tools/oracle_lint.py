"""Oracle output-type lint: run every registered oracle through DuckDB and
flag output columns whose type the driver's pandas canonicalizer mangles.

The driver canonicalizes the DuckDB side via pandas (fetchdf):
- HUGEINT/INT128 (DuckDB's sum(BIGINT) result) renders as float64 while
  Spark emits int64 -> value-hash mismatch on identical values.
- LIST/STRUCT/MAP columns arrive as Python lists/dicts and crash the
  canonicalizer's sort_values (`unhashable type: 'list'`).

Run:  python tools/oracle_lint.py            # report offenders, exit 1 if any
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biggie_spark.io import TABLES  # noqa: E402
from biggie_spark.registry import ORACLES, load_all_ops  # noqa: E402

BAD_TOKENS = ("HUGEINT", "INT128", "UHUGEINT", "[]", "LIST", "STRUCT(", "MAP(")

SF_DIR = os.environ.get("BIGGIE_TEST_SF", "/root/testdata/sf0.001")


def audit(sf_dir: str = SF_DIR) -> dict[str, list[tuple[str, str]]]:
    """Return {op_name: [(col, bad_type), ...]} for every oracle whose
    relation output types would be mangled by the driver canonicalizer."""
    load_all_ops()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[tuple[str, str]]] = {}
    errs: dict[str, str] = {}
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            errs[name] = str(e).splitlines()[0]
            continue
        hits = [
            (c, t)
            for c, t in cols
            if any(tok in t.upper() for tok in BAD_TOKENS)
        ]
        if hits:
            bad[name] = hits
    con.close()
    if errs:
        bad["__oracle_errors__"] = sorted(errs.items())
    return bad


if __name__ == "__main__":
    offenders = audit()
    if not offenders:
        print("OK: all oracle output types are pandas-canonicalizer-safe")
        sys.exit(0)
    for name, hits in sorted(offenders.items()):
        print(f"{name}: {hits}")
    print(f"\n{len(offenders)} offending oracles")
    sys.exit(1)
