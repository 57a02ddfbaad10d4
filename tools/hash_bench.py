"""Measure the md5-vs-xxhash64 MinHash signature cost — evidence for the
SCALE.md claim that xxhash64 is the production drop-in for the oracle-pinned
md5 hash family.

Scored queries MUST stay md5 (DuckDB reproduces it byte-for-byte; xxhash64
has no DuckDB twin, SURVEY.md §7.4.8).  But at 100 TB the signature pass is
a per-token hash over the whole corpus, so the hash kernel is the dominant
map-side cost of the dedup family — this probe measures the real ratio on
this box instead of asserting folklore.

Both variants compute k=16 per-token hashes and fold an array_min — the
xxhash64 variant seeds per-row (hash index i rides as a literal second
argument) and min-folds LONGS, where md5 min-folds 32-char hex STRINGS
(the comparison cost difference is part of the honest ratio).

Usage: python tools/hash_bench.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.session import get_spark
from biggie_spark.util import tokens

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 16


def sig_md5(tk):
    return F.transform(
        F.sequence(F.lit(0), F.lit(K - 1)),
        lambda i: F.array_min(
            F.transform(tk, lambda t: F.md5(F.concat(t, F.lit(":"), i.cast("string"))))
        ),
    )


def sig_xxh(tk):
    return F.transform(
        F.sequence(F.lit(0), F.lit(K - 1)),
        lambda i: F.array_min(F.transform(tk, lambda t: F.xxhash64(t, i))),
    )


def main() -> None:
    spark = get_spark(app_name="hash-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # replicate 20x (100k docs at sf0.1) so the hash kernel dominates the
    # fixed per-query overhead — at 5k docs both variants measure ~0.2 s of
    # mostly scheduling, which understates the kernel ratio
    d = (
        load_table(spark, SF, "documents")
        .crossJoin(spark.range(20))
        .select((F.col("doc_id") * 100 + F.col("id")).alias("doc_id"),
                tokens("text").alias("tk"))
        .repartition(32)
    )
    d = d.localCheckpoint()  # isolate the hash kernel from scan/tokenize

    results = {}
    for name, fn in [("md5", sig_md5), ("xxhash64", sig_xxh)]:
        best = None
        for _ in range(3):  # report best-of-3 warm
            t0 = time.perf_counter()
            # max() CONSUMES the signature — a count(*) here lets Catalyst
            # prune the whole hash kernel and measures nothing
            d.select(
                F.md5(F.concat_ws("|", fn(F.col("tk")).cast("array<string>"))).alias("s")
            ).agg(F.max("s")).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = best
        print(f"{name}: {best:.3f}s")
    print(f"ratio md5/xxhash64: {results['md5'] / results['xxhash64']:.2f}x")


if __name__ == "__main__":
    main()
