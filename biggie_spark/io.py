"""Loaders / writers for the driver's parquet corpus (TESTDATA.md).

The reference's Stash is a single HDF5 file; our stash is a Parquet dataset
directory — columnar, splittable, predicate-pushdown-able, the only sane
layout at 100 TB.  Lazy field reads map to Parquet column pruning, which
Catalyst applies automatically when queries project a column subset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize_events(df: DataFrame) -> DataFrame:
    """Repair ``events.ts`` to a proper session-tz TimestampType regardless
    of the physical parquet manifestation.  Three cases observed across
    driver environments:

    * ``timestamp[ns]`` + ``nanosAsLong=true`` → surfaces as ``bigint``
      epoch-nanoseconds; repair via integer division (``div`` keeps the math
      in 64-bit integers — double division loses precision above 2^53 ns).
    * ``timestamp[us]`` with isAdjustedToUTC=false → surfaces as
      ``timestamp_ntz``; Spark 4.1 rejects NTZ input to ``unix_micros`` and
      friends at analysis time, so cast to TIMESTAMP — lossless because the
      session timezone is pinned to UTC (session.py RUNTIME_CONFS).
    * already ``timestamp`` → no-op.

    Centralised here so a physical-schema flip in a future environment is
    absorbed at the loader, not in every downstream operator
    (tests/test_io.py pins the repaired dtype).
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session cache of resolved table plans.  ``spark.read.parquet`` costs
# ~100 ms per call in local mode (file listing + footer/schema fetch over
# Py4J) — q_join_agg alone loads six tables, so re-resolving per query was
# ~40% of its warm wall-clock at sf0.1.  A DataFrame is an immutable logical
# plan, so reuse within a session is exactly what a catalog does; the corpus
# directories are read-only (TESTDATA.md), so the resolved schema/file list
# can never go stale.  Ops that write-then-read their own output use
# spark.read directly and are unaffected.
_TABLE_CACHE = None  # lazy weakref.WeakKeyDictionary[SparkSession, dict]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table (``events.ts`` normalized, see
    :func:`normalize_events`).  Cached per (session, sf_dir, table) — see
    note above."""
    global _TABLE_CACHE
    apply_runtime_confs(spark)
    if _TABLE_CACHE is None:
        import weakref

        _TABLE_CACHE = weakref.WeakKeyDictionary()
    cache = _TABLE_CACHE.get(spark)
    if cache is None:
        cache = _TABLE_CACHE[spark] = {}
    key = (os.path.abspath(sf_dir), name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = normalize_events(df)
        cache[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register corpus tables as temp views (for ``spark.sql`` entry points).

    Mirrors the driver's DuckDB-side registration so SQL-string queries are
    oracle-symmetric by construction (SURVEY.md §3.3).
    """
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def save_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Stash persist.  ``partition_by`` columns become directory partitions —
    the 100 TB analog of the reference's hex-fanout key sharding (partition
    pruning replaces the keymap lookup)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def export(df: DataFrame, path: str, fmt: str = "csv", mode: str = "overwrite") -> None:
    """Export a stash/result to csv or json."""
    w = df.write.mode(mode)
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def parquet_files(path: str) -> list[str]:
    """Data files of a parquet dataset dir (recursive, skips _SUCCESS etc)."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return out


def compact_parquet(
    spark: SparkSession, path: str, out: str, target_bytes: int = 128 << 20
) -> int:
    """Small-files compaction: rewrite a fragmented parquet dataset into
    ceil(total_bytes / target_bytes) files (~HDFS/S3-friendly 128 MB
    default).  The small-files problem is the classic operational failure
    of long-lived stashes at scale — every tiny file costs a namenode/
    listing round-trip and a task launch; compaction restores scan
    parallelism matched to data size, not write history.  Returns the
    target file count."""
    import math

    total = sum(os.path.getsize(f) for f in parquet_files(path))
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    save_parquet(df.repartition(n), out)
    return n
