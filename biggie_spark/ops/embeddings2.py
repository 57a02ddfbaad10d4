"""Embedding-pipeline operators round 2: deterministic random projection
(dimensionality reduction) and centroid-distance outlier flagging.

Scale design (100 TB):
* `llm_embed_project` — Johnson–Lindenstrauss-style signed random
  projection 64 → 8.  The ±1 projection matrix derives from the portable
  md5 idiom on (out_dim, in_dim), so NO matrix is stored or shipped: both
  engines regenerate the identical matrix from the hash family (the same
  trick that makes the MinHash/LSH family engine-portable).  The matrix
  frame is 8×64 = 512 rows built from `spark.range`, broadcast to the
  posexploded vectors; the per-(vec, out-dim) reduction sums EXACT
  integer micros (the input floats quantized at 1e-6), so the projection
  is order-independent on any cluster layout — no float-summation drift.
  One explode (×64) + one hash aggregate on (vec_id, j); at 100 TB the
  explode is map-side and the shuffle carries vecs × 8 rows.
* `llm_embed_outlier` — distance-to-centroid z-scores: the drift /
  corruption detector over an embedding column (a batch of garbage
  vectors from a broken encoder shows up as a fat z tail).  Three exact
  reductions: per-dim integer-micro sums give the centroid (64 values,
  broadcast back); per-row squared distance is a deterministic
  left-fold; the corpus mean/std of the distances re-quantize to integer
  micros for the final exact aggregate.  Everything is hash-agg /
  broadcast shapes — no self-joins, no windows over raw rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import lineage_cap, r4

_IN_DIM = 64
_OUT_DIM = 8


@register(
    "llm_embed_project",
    oracle=f"""
    WITH m AS (
      SELECT j, i,
             CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || 'x'
                             || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM range({_OUT_DIM}) a(j), range({_IN_DIM}) b(i)),
    v AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0)
                  AS BIGINT) AS q
      FROM embeddings, range({_IN_DIM}) t(i)
      WHERE vec_id < 200)
    SELECT v.vec_id, m.j,
           CAST(sum(m.s * v.q) AS BIGINT) AS proj_micros
    FROM v JOIN m ON m.i = v.i
    GROUP BY v.vec_id, m.j
    """,
)
def llm_embed_project(spark, sf_dir):
    """Signed random projection 64 → 8 over the embedding column — the
    cheap JL-style reduction used before LSH bucketing, coarse clustering
    or shipping vectors to a smaller index.  The ±1 matrix regenerates
    from md5 parity on (j, i) in both engines (no stored weights); input
    floats quantize to exact 1e-6 micros so the signed sum stays integer
    end-to-end (scored as micros; a final float division would sit on the
    engines' half-way rounding divergence).  Probe subset vec_id < 200
    keeps the scored frame bounded; the shape (posexplode → broadcast
    matrix join → hash agg) is corpus-linear with a vecs×8 shuffle."""
    sign = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("j").cast("string"),
                            F.lit("x"),
                            F.col("i").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s")
    )
    m = (
        spark.range(_OUT_DIM)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(_IN_DIM).select(F.col("id").cast("int").alias("i")))
        .select("j", "i", sign)
    )
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", F.posexplode("embedding").alias("i", "e"))
        .select(
            "vec_id",
            "i",
            F.round(F.col("e").cast("double") * 1000000, 0).cast("long").alias("q"),
        )
    )
    return (
        v.join(F.broadcast(m), "i")
        .groupBy("vec_id", "j")
        # exact integer micros end-to-end: a final /1e6 + round(4) hits the
        # engines' half-way rounding divergence on values like -0.26335,
        # so the scored column stays integer (callers divide client-side)
        .agg(F.sum(F.col("s") * F.col("q")).alias("proj_micros"))
    )


@register(
    "llm_embed_outlier",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i,
             CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000, 0)
                  AS BIGINT) AS q
      FROM embeddings, range({_IN_DIM}) t(i)),
    cent AS (
      SELECT i, CAST(sum(q) AS DOUBLE) / count(*) / 1000000.0 AS c
      FROM v GROUP BY i),
    cl AS (SELECT list(c ORDER BY i) AS ca FROM cent),
    d AS (
      /* sequential left-to-right list kernel — matches Spark's
         F.aggregate fold (same cross-engine contract as util.dot) */
      SELECT vec_id,
             list_aggregate(
               list_transform(range(1, {_IN_DIM} + 1),
                 k -> (round(CAST(embedding[k] AS DOUBLE) * 1000000)
                         / 1000000.0 - cl.ca[k])
                      * (round(CAST(embedding[k] AS DOUBLE) * 1000000)
                           / 1000000.0 - cl.ca[k])),
               'sum') AS d2
      FROM embeddings CROSS JOIN cl),
    dq AS (SELECT vec_id, CAST(round(d2 * 1000000, 0) AS BIGINT) AS d2q FROM d),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d2q) AS DOUBLE) AS s1,
             CAST(sum(CAST(d2q AS HUGEINT) * d2q) AS DOUBLE) AS s2
      FROM dq)
    SELECT dq.vec_id,
           CAST(round(dq.d2q / 1000000.0, 4) AS DOUBLE) AS dist2,
           CAST(round((dq.d2q - s.s1 / s.n)
                / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4)
                AS DOUBLE) AS z
    FROM dq CROSS JOIN s
    WHERE (dq.d2q - s.s1 / s.n)
          / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) > 2.0
    """,
)
def llm_embed_outlier(spark, sf_dir):
    """Embedding outlier flags: vectors whose squared distance to the
    corpus centroid sits more than 2σ above the mean — the batch-level
    sanity check that catches a broken encoder push or corrupted shard
    before it trains.

    Exactness discipline: inputs quantize to 1e-6 integer micros, so the
    per-dim centroid sums, each row's Σ(vᵢ−cᵢ)² fold (ordered by dim on
    both engines), and the corpus mean/std of the re-quantized distances
    are all order-independent.  Plan shape: one explode + per-dim hash
    agg (64-row centroid, broadcast back), one per-row fold, one 1-row
    moment frame broadcast into the final filter — corpus-linear, no
    window over raw rows, no self-join."""
    v = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i", "e"))
        .select(
            "vec_id",
            "i",
            F.round(F.col("e").cast("double") * 1000000, 0).cast("long").alias("q"),
        )
    )
    cent = v.groupBy("i").agg(
        (F.sum("q").cast("double") / F.count("*") / 1000000.0).alias("c")
    )
    # 64-value centroid folded into ONE array row (i-ascending), broadcast
    # to every vector; the per-row distance is then a sequential zip_with
    # fold over (embedding, centroid) — deterministic order both engines
    cent_arr = cent.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("ca")
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    quant = lambda x: F.round(x.cast("double") * 1000000, 0) / 1000000.0  # noqa: E731
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("ca"),
            lambda e, c: (quant(e) - c) * (quant(e) - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dq = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", F.round(d2 * 1000000, 0).cast("long").alias("d2q")
    )
    dq = dq.transform(lineage_cap)  # feeds moments + final filter
    s = dq.agg(
        F.count("*").alias("n"),
        F.sum("d2q").cast("double").alias("s1"),
        F.sum((F.col("d2q") * F.col("d2q")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    sd = F.sqrt(F.col("s2") / F.col("n") - mu * mu)
    z = (F.col("d2q") - mu) / sd
    return (
        dq.crossJoin(F.broadcast(s))
        .filter(z > 2.0)
        .select(
            "vec_id",
            r4(F.col("d2q") / 1000000.0).alias("dist2"),
            r4(z).alias("z"),
        )
    )
