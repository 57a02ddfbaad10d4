"""Dedup-cluster graph operator: connected components over the near-dup
pair graph.

After MinHash/LSH candidate generation + Jaccard verification
(`llm_neardup_pairs`), a production training-data pipeline does not stop at
pairs — it groups transitively connected near-duplicates into CLUSTERS and
keeps one canonical document per cluster.  Pairs (a,b), (b,c) must collapse
to one cluster {a,b,c} even though (a,c) was never compared.

Scale design (100 TB): connected components is the one genuinely iterative
step in the dedup pipeline.  We use distributed min-label propagation —
every vertex repeatedly adopts the minimum label among itself and its
neighbors — which is a sequence of shuffle-on-vertex-id joins + groupBy
aggregations, converging in O(graph diameter) rounds.  Near-dup cluster
graphs have tiny diameters (docs in one cluster are mutual near-copies),
so convergence is 2-4 rounds in practice.  Each round materializes via
localCheckpoint() to cut lineage growth (on a real cluster use a
checkpoint dir on HDFS/S3); the per-round driver action is a single
count of changed labels — O(1) driver memory, never a collect of the
graph.  For adversarial graphs with long chains the same loop accepts
the large-star/small-star variant; at near-dup workloads plain min-label
wins on simplicity and round count.

Oracle: DuckDB `WITH RECURSIVE` transitive closure over the identical
edge set — an independent formulation (fixpoint set-union vs iterative
relabeling), so agreement is strong evidence of correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.ops.llm import _DUCK_SIG, llm_neardup_pairs
from biggie_spark.registry import register

_MAX_ROUNDS = 25  # >> diameter of any near-dup cluster graph


@register(
    "llm_dedup_clusters",
    oracle="WITH RECURSIVE "
    + _DUCK_SIG.format(flt="")
    + """,
    bands AS (SELECT doc_id, b, md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bkey
              FROM sig, range(4) t(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
                                      AND a.doc_id < b.doc_id),
    tset AS (SELECT doc_id, list_distinct(tk) AS ts, len(list_distinct(tk)) AS n FROM toks),
    edges AS (SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN tset ta ON ta.doc_id = c.doc_a
              JOIN tset tb ON tb.doc_id = c.doc_b
              WHERE len(list_intersect(ta.ts, tb.ts)) * 1.0
                    / (ta.n + tb.n - len(list_intersect(ta.ts, tb.ts))) >= 0.8),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    walk(u, lbl) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym) s
        UNION
        SELECT s.u, w.lbl FROM sym s JOIN walk w ON w.u = s.v
    )
    SELECT u AS doc_id, min(lbl) AS component FROM walk GROUP BY u
    """,
)
def llm_dedup_clusters(spark, sf_dir):
    """Connected components over verified near-dup pairs (Jaccard >= 0.8):
    each document that appears in at least one near-dup pair is labeled with
    its cluster id = the minimum doc_id reachable through near-dup edges
    (which is also the canonical "keep" document of the cluster)."""
    edges = llm_neardup_pairs(spark, sf_dir, threshold=0.8).select("doc_a", "doc_b")
    sym = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint()  # materialize the (expensive) LSH pipeline once
    )
    labels = sym.select("u").distinct().withColumn("lbl", F.col("u"))
    for _ in range(_MAX_ROUNDS):
        nbr_min = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("vlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("vlbl").alias("nbr"))
        )
        new_labels = labels.join(nbr_min, "u", "left").select(
            "u", F.least("lbl", F.coalesce("nbr", "lbl")).alias("lbl")
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("lbl").alias("component"))
