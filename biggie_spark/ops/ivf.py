"""IVF (inverted-file) approximate nearest-neighbor search — the
clustering-based scale path, complementing the SimHash-LSH tables of
ops/ann.py.

1. **train**: distributed Lloyd k-means (K=16, 3 iterations).  Every step
   is a DataFrame op: assignment is a broadcast cross-join + per-vector
   argmin window; the centroid update is posexplode -> (cluster, dim) hash
   aggregate.  Nothing is collected to the driver — the "model" stays a
   16-row DataFrame that Spark broadcasts into the next iteration, which is
   exactly how the plan scales to a 1000-executor corpus (centroids are
   O(K*dim) regardless of data size).  Init is deterministic: the K
   lowest-vec_id vectors.
2. **index**: each vector lands in its nearest centroid's inverted list;
   the list id is the shuffle/partition key.
3. **search**: a probe ranks centroids, scans only the nprobe=4 nearest
   lists, exact-cosine-reranks the candidates, top-k.

Approximate and float-iteration-dependent -> rows-only driver check;
tests/test_ivf.py gates recall@5 against the exact baseline and asserts
the scan pruning (candidates << corpus).  Measured recall@5 = 0.92 at
sf0.001 AND sf0.01 with nprobe/K = 1/4 — clustering beats hash tables on
this corpus because even weakly-near vectors co-cluster, whereas SimHash
bit agreement degrades fast below cos ~ 0.7 (ops/ann.py: 0.34-0.38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import fan_out, lineage_cap, topk_by_cosine

K = 16
ITERS = 3
NPROBE = 4


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid id per vector: broadcast cross-join + argmin."""
    pairs = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "d", _sq_dist(F.col("embedding"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


def train_ivf(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    """Lloyd k-means over the embeddings table; returns (assignments,
    centroids)."""
    # fan_out (optimization r14, guide §2.5): distance/code folds are
    # per-row CPU over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    centroids = (
        e.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").cast("int").alias("cid"),
                F.col("embedding").alias("cvec"))
    )
    assigned = None
    for _ in range(ITERS):
        assigned = _assign(e, centroids)
        centroids = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        # keep the lineage shallow across iterations (model is tiny)
        centroids = centroids.transform(lineage_cap)
    return assigned, centroids


@register(
    "ivf_assign",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    c AS (SELECT vec_id AS cid, a AS cvec FROM e WHERE vec_id < 16),
    d AS (
      SELECT e.vec_id, c.cid,
             list_aggregate(list_transform(list_zip(e.a, c.cvec),
                            s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum') AS dist
      FROM e, c),
    r AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d)
    SELECT vec_id, CAST(cid AS INTEGER) AS cid FROM r WHERE rn = 1
    """,
)
def ivf_assign(spark, sf_dir) -> DataFrame:
    """Stage 1 of IVF indexing as a first-class op: every vector's nearest
    centroid under the DETERMINISTIC initialization (the K lowest-vec_id
    vectors) — i.e. the first Lloyd assignment.  The iterated k-means is
    float-order-dependent (rows-only check on the end-to-end search), but
    this substage is exactly reproducible: squared L2 via the same
    left-to-right (x-y)^2 double fold in both engines, argmin tie-broken
    by cid — so the IVF family gets a full cross-engine driver row
    (VERDICT r4 item 3).

    Plan shape is the one that scales: K=16 centroids broadcast to every
    executor, one corpus pass, argmin per vector via a vec_id-partitioned
    rank — no corpus shuffle beyond the window's hash partition."""
    # fan_out (optimization r14, guide §2.5): distance/code folds are
    # per-row CPU over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    centroids = e.filter(F.col("vec_id") < K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    return _assign(e, centroids).select("vec_id", F.col("cid").cast("int").alias("cid"))


@register(
    "ivf_search_incremental",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    idx AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
    bat AS (SELECT * FROM e WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id AS cid, a AS cvec FROM idx WHERE vec_id < 18),
    da AS (
      SELECT idx.vec_id, c.cid,
             list_aggregate(list_transform(list_zip(idx.a, c.cvec),
                            s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum') AS dist
      FROM idx, c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cid) AS rn
              FROM da) WHERE rn = 1),
    pb AS (
      SELECT bat.vec_id AS probe_id, bat.a AS pa, c.cid,
             list_aggregate(list_transform(list_zip(bat.a, c.cvec),
                            s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum') AS dist
      FROM bat, c),
    pl AS (SELECT probe_id, pa, cid FROM (
             SELECT probe_id, pa, cid,
                    row_number() OVER (PARTITION BY probe_id
                                       ORDER BY dist, cid) AS rn
             FROM pb) WHERE rn <= 4),
    cand AS (
      SELECT pl.probe_id, pl.pa, i.vec_id AS neighbor_id, i.a AS na
      FROM pl JOIN asg ON asg.cid = pl.cid JOIN idx i ON i.vec_id = asg.vec_id),
    sc AS (
      SELECT probe_id, neighbor_id,
             list_aggregate(list_transform(list_zip(pa, na),
                            s -> s[1] * s[2]), 'sum')
             / (sqrt(list_aggregate(list_transform(pa, x -> x * x), 'sum'))
                * sqrt(list_aggregate(list_transform(na, x -> x * x), 'sum')))
               AS s
      FROM cand),
    top AS (SELECT probe_id, neighbor_id, s,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY s DESC, neighbor_id) AS rn
            FROM sc)
    SELECT probe_id, neighbor_id,
           CAST(round(s, 4) + 0 AS DOUBLE) AS sim
    FROM top WHERE rn <= 5
    """,
)
def ivf_search_incremental(spark, sf_dir) -> DataFrame:
    """Incremental ANN: search a NEW vector batch against the STANDING IVF
    index — the semantic twin of llm_neardup_incremental (a 100 TB vector
    store is never re-searched corpus-vs-corpus; each ingest batch probes
    the existing inverted lists).

    Batch = every 10th vector; index = the rest; centroids = the 16
    lowest-id index vectors (deterministic init, no Lloyd iteration — so
    unlike the end-to-end llm_knn_ivf this is exactly reproducible and
    carries a FULL DuckDB oracle: same left-to-right double folds for
    distance/dot/norm, same (dist, cid) and (sim desc, neighbor) tie
    orders).  Plan: 16-row centroid frame broadcasts to both the index
    assignment and the probe ranking; candidates come from an equi-join
    on the inverted-list id with the probe side broadcast — the index is
    scanned once and never shuffled; probe cost is O(batch x corpus/K x
    NPROBE)."""
    # fan_out (optimization r14, guide §2.5): distance/code folds are
    # per-row CPU over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    idx = e.filter(F.col("vec_id") % 10 != 0)
    bat = e.filter(F.col("vec_id") % 10 == 0)
    cent = idx.filter(F.col("vec_id") < 18).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    asg = _assign(idx, cent)
    probes = bat.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pa")
    )
    pc = probes.crossJoin(F.broadcast(cent)).withColumn(
        "d", _sq_dist(F.col("pa"), F.col("cvec"))
    )
    wp = Window.partitionBy("probe_id").orderBy("d", "cid")
    pl = (
        pc.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "pa", "cid")
    )
    cands = asg.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("na"), "cid"
    )
    pairs = cands.join(F.broadcast(pl), "cid")
    return topk_by_cosine(pairs, 5)


@register("llm_knn_ivf")  # approximate + float-iterative -> rows-only check
def llm_knn_ivf(spark, sf_dir, k: int = 5, n_probes: int = 10) -> DataFrame:
    assigned, centroids = train_ivf(spark, sf_dir)
    probes = assigned.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pa")
    )
    # rank centroids per probe; keep the nprobe nearest lists
    pc = probes.crossJoin(F.broadcast(centroids)).withColumn(
        "d", _sq_dist(F.col("pa"), F.col("cvec"))
    )
    wp = Window.partitionBy("probe_id").orderBy("d", "cid")
    probe_lists = (
        pc.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "pa", "cid")
    )
    # scan only the selected inverted lists (equi-join on list id)
    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("na"), "cid"
    )
    pairs = (
        cands.join(F.broadcast(probe_lists), "cid")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
    )
    return topk_by_cosine(pairs, k)


def _int_mean_centroids(asg: DataFrame) -> DataFrame:
    """Integer-exact Lloyd centroid update: per (cid, dim), accumulate
    round(x * 1e6) as BIGINT (order-independent, shuffle-safe), then ONE
    double division by the count.  Round-6 measurement: recall-identical
    to float-mean Lloyd on this corpus, and unlike float means the result
    is the same on any engine and any partitioning — which is what lets
    the TRAINED index carry a full DuckDB oracle (plain float k-means is
    summation-order-dependent, the reason llm_knn_ivf is rows-only).
    NOTE: the mean deliberately divides in DOUBLE (sum/count/1e6), not
    integer `div`: Spark's `div` truncates toward zero while DuckDB's
    `//` floors, and embedding sums are signed."""
    q = asg.select(
        "cid", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "cid", "pos", F.round(F.col("v").cast("double") * 1000000, 0).cast("long").alias("q")
    )
    per_dim = q.groupBy("cid", "pos").agg(
        (F.sum("q").cast("double") / F.count("*") / F.lit(1000000.0)).alias("m")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


_LLOYD_UPDATES = 2  # centroid updates between the three assignments


def _lloyd_iter_sql(
    prev_asg: str, prev_c: str, out_c: str, out_asg: str, etab: str = "e"
) -> str:
    """One unrolled integer-Lloyd round in DuckDB SQL: integer-mean update
    from ``prev_asg`` -> ``out_c``, then re-assignment -> ``out_asg``.
    ``etab`` names the vector CTE (full table for ivf_train_lloyd, the
    index subset for the persisted-index build)."""
    return f"""
    {out_c} AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM (
        SELECT {prev_asg}.cid, t.pos,
               CAST(sum(CAST(round({etab}.a[t.pos] * 1000000, 0) AS BIGINT))
                    AS DOUBLE) / count(*) / 1000000.0 AS m
        FROM {prev_asg} JOIN {etab} USING (vec_id), range(1, 65) t(pos)
        GROUP BY {prev_asg}.cid, t.pos)
      GROUP BY cid),
    {out_asg} AS (SELECT vec_id, cid FROM (
        SELECT {etab}.vec_id, c.cid,
               row_number() OVER (PARTITION BY {etab}.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip({etab}.a, c.cvec),
                                s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum'),
                 c.cid) AS rn
        FROM {etab} CROSS JOIN {out_c} c) WHERE rn = 1)"""


@register(
    "ivf_train_lloyd",
    oracle="""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cid, a AS cvec FROM e WHERE vec_id < 16),
    a0 AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(e.a, c.cvec),
                                s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum'),
                 c.cid) AS rn
        FROM e CROSS JOIN c0 c) WHERE rn = 1),
    """
    + _lloyd_iter_sql("a0", "c0", "c1", "a1")
    + ","
    + _lloyd_iter_sql("a1", "c1", "c2", "a2")
    + """
    SELECT a2.vec_id, CAST(a2.cid AS INT) AS cid
    FROM a2
    """,
)
def ivf_train_lloyd(spark, sf_dir) -> DataFrame:
    """TRAINED IVF assignment with a full cross-engine oracle — the
    capability the IVF family previously had to split: `ivf_assign` is
    exact but untrained (first Lloyd assignment only), `llm_knn_ivf` is
    trained but rows-only (float k-means means are summation-order-
    dependent).  Integer-exact centroid updates (see _int_mean_centroids)
    close the gap: K=16 deterministic init, 2 integer-mean updates, 3
    assignments, every arithmetic step bit-reproducible on both engines
    and on any cluster partitioning — so Lloyd TRAINING itself now holds
    a hash-checked driver row, and a persisted-index build on top of it
    inherits the round-6-measured recall gain of trained centroids
    (untrained 0.47 -> trained ~0.55-0.59 at nprobe 4 on held-out
    probes; the knob interacts with NPROBE, see ivf_index_persisted).

    Scale shape per iteration: centroids (16 rows) BROADCAST into the
    assignment cross-join (one corpus pass, argmin via vec_id-partitioned
    rank), update is one (cid, dim)-keyed hash aggregate — BIGINT partial
    sums combine map-side, so each Lloyd round is one broadcast pass +
    one bounded shuffle of K*64 rows; centroid frames are lineage-capped
    so the 3-round loop keeps O(1) plan depth (same discipline as
    graph_pagerank / the BPE merge loop)."""
    # fan_out (optimization r14, guide §2.5): distance/code folds are
    # per-row CPU over a single-split scan.
    e = fan_out(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cent = e.filter(F.col("vec_id") < K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("cvec")
    )
    asg = _assign(e, cent)
    for _ in range(_LLOYD_UPDATES):
        cent = _int_mean_centroids(asg).transform(lineage_cap)
        asg = _assign(e, cent)
    return asg.select("vec_id", F.col("cid").cast("int").alias("cid"))
