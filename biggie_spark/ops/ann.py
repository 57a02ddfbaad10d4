"""Approximate nearest-neighbor search — the scale path for similarity
search (north-star extension).

`llm_knn_cosine` (ops/llm.py) is the exact brute-force baseline: O(probes x
corpus) scored pairs.  At 100 TB that cross product is the bottleneck, so
this module implements standard multi-table SimHash LSH:

1. **codes**: L=4 independent hash tables, each an 8-bit signed-random-
   projection (SimHash) code.  Hyperplane sign matrices are derived from
   md5 at plan-build time — deterministic, data-independent, nothing to
   fit or ship, identical on every executor.
2. **candidate generation**: probes join candidates per table on bucket
   equality, with MULTI-PROBE expansion to Hamming distance <= 2 on the
   probe side (1 + 8 + 28 = 37 codes per probe per table — the standard
   multi-probe LSH trick: probe-side fan-out is O(probes), corpus-side
   layout unchanged).  The corpus side is joined on an equi-key — hash
   partitioned by (table, code), never a cross join.
3. **exact rerank**: true cosine on the deduplicated candidates, top-k.

Recall math (P[bit differs] = theta/pi): for true near-duplicates
(cos >= 0.9) a single-bucket table hits with p ~ 0.69, four tables ~ 0.99.
On this synthetic corpus the "nearest" neighbors are only cos ~ 0.3
(random vectors, theta ~ 72 deg, p_diff ~ 0.4), where single-bucket
probing measured recall@5 of only 0.34-0.38; Hamming<=2 multi-probe
lifts it to **0.82 measured** while still reranking only ~46% of the
full pair space at sf0.001 (the pruning sharpens with corpus size —
bucket count is fixed at 256/table, so candidate share falls as corpora
grow past #buckets x avg-occupancy).  tests/test_ann.py pins the recall
floor (>= 0.6) and the pruning factor.

Because of that corpus-dependence, the SimHash tables are registered as
``llm_knn_lsh`` (the right tool when real near-duplicates exist, cos >=
0.9), while the user-facing default ``llm_knn_ann`` routes through the IVF
index (ops/ivf.py — recall@5 = 0.92 on this corpus, pinned >= 0.9 at
sf0.01 in tests/test_ann.py): a caller reaching for "the ANN op" gets the
path that is accurate on corpora with or without cluster structure.

No DuckDB oracle (approximate, parameter-dependent by design): the driver
applies its rows-only check.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import fan_out, topk_by_cosine

N_TABLES = 4
N_BITS = 8
DIM = 64


def _signs(table: int, bit: int) -> list[float]:
    """Deterministic +/-1 hyperplane for (table, bit): one md5 call yields
    128 bits; dimension j uses bit j of the digest."""
    digest = hashlib.md5(f"biggie-ann:{table}:{bit}".encode()).digest()
    return [1.0 if (digest[j // 8] >> (j % 8)) & 1 else -1.0 for j in range(DIM)]


def table_code(emb_col, table: int) -> F.Column:
    """8-bit SimHash code of a vector under hash table `table`."""
    code = F.lit(0)
    for b in range(N_BITS):
        plane = F.array(*[F.lit(s) for s in _signs(table, b)])
        proj = F.aggregate(
            F.zip_with(emb_col, plane, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return code


def _probe_codes(code_col) -> F.Column:
    """Bucket + all buckets at Hamming distance <= 2 (multi-probe
    expansion): 1 exact + 8 one-bit + 28 two-bit codes.  Pure probe-side
    arithmetic — the corpus index never widens."""
    import itertools

    flips = [1 << b for b in range(N_BITS)] + [
        (1 << b1) | (1 << b2)
        for b1, b2 in itertools.combinations(range(N_BITS), 2)
    ]
    return F.array(code_col, *[code_col.bitwiseXOR(F.lit(m)) for m in flips])


def _sql_signs(table: int, bit: int) -> str:
    """The (table, bit) hyperplane as a DuckDB DOUBLE[] literal — the SAME
    md5-derived signs :func:`_signs` gives the Spark side, inlined at
    registration time so both engines project onto identical planes."""
    return (
        "[" + ",".join("1" if s > 0 else "-1" for s in _signs(table, bit)) + "]::DOUBLE[]"
    )


def _sql_table_code(table: int) -> str:
    """DuckDB twin of :func:`table_code`: each bit's projection is a
    sequential list-sum of elementwise products — the same left-to-right
    double fold Spark's F.aggregate runs, so the sign test (proj > 0)
    sees the bit-identical value on both engines."""
    terms = []
    for b in range(N_BITS):
        proj = (
            f"list_aggregate(list_transform(list_zip(a, {_sql_signs(table, b)}),"
            " s -> s[1] * s[2]), 'sum')"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + f" AS INTEGER) AS code{table}"


_SIMHASH_CODES_ORACLE = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings) "
    "SELECT vec_id, "
    + ", ".join(_sql_table_code(t) for t in range(N_TABLES))
    + " FROM e"
)


@register("ann_simhash_codes", oracle=_SIMHASH_CODES_ORACLE)
def ann_simhash_codes(spark, sf_dir) -> DataFrame:
    """Stage 1 of the LSH index as a first-class op: every vector's 8-bit
    SimHash code under each of the 4 hash tables.  Unlike the end-to-end
    ANN search (approximate by design, rows-only check), the codes are
    DETERMINISTIC — md5-derived hyperplanes, sequential double-fold
    projections — so this substage carries a full DuckDB oracle and gives
    the ANN family a real cross-engine driver row (VERDICT r4 item 3).

    Map-only plan: one projection per (vector, table, bit) inside JVM
    higher-order functions, no shuffle at all — at 100 TB this is the
    embarrassingly parallel indexing pass that feeds the (table, code)
    bucket layout."""
    # fan_out (optimization r14, guide §2.5): 32 interpreted double-folds
    # per row over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    return e.select(
        "vec_id",
        *[
            table_code(F.col("embedding"), t).cast("int").alias(f"code{t}")
            for t in range(N_TABLES)
        ],
    )


@register("llm_knn_ann")  # approximate -> rows-only check; recall gated in CI
def llm_knn_ann(spark, sf_dir, k: int = 5, n_probes: int = 10) -> DataFrame:
    """Default ANN entry point — routes to the IVF index (recall@5 = 0.92
    on this corpus vs 0.34-0.38 for the SimHash tables, which remain
    available as ``llm_knn_lsh`` for corpora with true near-duplicates).
    See module docstring for the routing rationale."""
    from biggie_spark.ops.ivf import llm_knn_ivf

    return llm_knn_ivf(spark, sf_dir, k=k, n_probes=n_probes)


@register("llm_knn_lsh")  # approximate -> rows-only check; recall gated in CI
def llm_knn_lsh(spark, sf_dir, k: int = 5, n_probes: int = 10) -> DataFrame:
    # fan_out (optimization r14, guide §2.5): the per-row code kernel
    # otherwise runs inside the single-split scan task.
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    coded = e.select(
        "vec_id",
        "embedding",
        *[table_code(F.col("embedding"), t).alias(f"c{t}") for t in range(N_TABLES)],
    )
    # corpus side: one row per (vector, table) keyed by (table, code)
    cands = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("na"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"c{t}").alias("code"))
                    for t in range(N_TABLES)
                ]
            )
        ).alias("bk"),
    ).select("neighbor_id", "na", "bk.t", "bk.code")
    # probe side: expand each table's code to its Hamming-1 ball.
    # NB: the struct is built by a single-arg closure — a two-arg lambda
    # (even `t=t` defaults) is interpreted by PySpark as (element, index).
    def _tagged_ball(t: int):
        return F.transform(
            _probe_codes(F.col(f"c{t}")),
            lambda c: F.struct(F.lit(t).alias("t"), c.alias("code")),
        )

    probes = coded.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pa"),
        F.explode(
            F.flatten(F.array(*[_tagged_ball(t) for t in range(N_TABLES)]))
        ).alias("bk"),
    ).select("probe_id", "pa", "bk.t", "bk.code")

    pairs = (
        cands.join(F.broadcast(probes), ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "pa", "neighbor_id", "na")
        .distinct()  # a pair can collide in several tables — rerank once
    )
    return topk_by_cosine(pairs, k)
