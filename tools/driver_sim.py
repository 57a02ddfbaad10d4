"""Simulate the driver's verify: vanilla SparkSession (none of our factory
confs), call __spark_entry__.entry(), then run every queries() entry at the
given SF against its oracle_sql() in DuckDB with an order-insensitive
value-hash — the same shape of check the driver records in CORRECTNESS_r{N}.

Usage: python tools/driver_sim.py [sf_dir] [name ...]

Hostile-config battery hook: set DRIVER_SIM_CONF="k=v,k=v" to inject extra
session confs (e.g. spark.sql.shuffle.partitions=7,spark.sql.adaptive.
enabled=false) — the SCALE.md execution-config invariance sweeps run this
same script under each hostile config so the check stays driver-faithful.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from tests.compare import normalize_rows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

# deliberately vanilla: the driver makes no promises about session confs
_builder = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
)
for _kv in filter(None, os.environ.get("DRIVER_SIM_CONF", "").split(",")):
    _k, _, _v = _kv.partition("=")
    print(f"hostile conf: {_k}={_v}")
    _builder = _builder.config(_k.strip(), _v.strip())
spark = _builder.getOrCreate()

t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns} ({time.time() - t0:.1f}s)")
assert len(rows) > 0

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = E.queries(), E.oracle_sql()
n_pass = n_fail = n_weak = 0
for name in sorted(qs):
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  WEAK {name}: rows={len(srows)} ({time.time() - t0:.1f}s)")
            n_weak += 1
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        sh = hashlib.md5(repr(normalize_rows(srows, sdf.columns)).encode()).hexdigest()
        dh = hashlib.md5(repr(normalize_rows(drows, dcols)).encode()).hexdigest()
        ok = (
            sorted(sdf.columns) == sorted(dcols)
            and len(srows) == len(drows)
            and sh == dh
        )
        print(
            f"  {'PASS' if ok else 'FAIL'} {name}: rows={len(srows)} hash={'=' if sh == dh else '!='} ({time.time() - t0:.1f}s)"
        )
        n_pass += ok
        n_fail += not ok
    except Exception as ex:
        print(f"  ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
        n_fail += 1
print(f"pass={n_pass} fail={n_fail} weak={n_weak}")
sys.exit(1 if n_fail else 0)
