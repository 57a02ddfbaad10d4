"""Dedup-cluster graph operator: connected components over the near-dup
pair graph.

After MinHash/LSH candidate generation + Jaccard verification
(`neardup_edges_shingle`), a production training-data pipeline does not stop at
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
from biggie_spark.util import lineage_cap

from pyspark.sql import functions as F

from biggie_spark.ops.llm import DUCK_SHINGLE_EDGES, neardup_edges_shingle
from biggie_spark.registry import register

_MAX_ROUNDS = 25  # >> diameter of any near-dup cluster graph

_PR_ITERS = 3  # fixed iteration count — unrolled verbatim in the oracle


def _pr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration in DuckDB SQL, all-integer: each node
    keeps rank in units of 1e-12 (BIGINT); contributions use integer
    division rank // out_degree, then r = 0.15/N + 0.85 * contrib — every
    step exact, so Spark and DuckDB agree bit-for-bit."""
    return f"""
    {out} AS (
        SELECT n.k,
               b.base + (85 * coalesce(c.s, 0)) // 100 AS r
        FROM nodes n
        CROSS JOIN pr_base b
        LEFT JOIN (SELECT e.dst AS k, sum({prev}.r // deg.d) AS s
                   FROM edges e
                   JOIN {prev} ON {prev}.k = e.src
                   JOIN deg ON deg.src = e.src
                   GROUP BY e.dst) c ON c.k = n.k)"""


@register(
    "graph_pagerank",
    oracle="""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        WHERE s_nationkey <> c_nationkey
          AND (s_nationkey * s_nationkey + 31 * c_nationkey) % 7 < 3),
    nodes AS (SELECT DISTINCT k FROM
              (SELECT src AS k FROM edges UNION SELECT dst FROM edges)),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    pr_base AS (SELECT count(*) AS n, 150000000000 // count(*) AS base,
                       1000000000000 // count(*) AS init
                FROM nodes),
    r0 AS (SELECT k, b.init AS r FROM nodes CROSS JOIN pr_base b),
    """
    + ",".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))
    + """
    SELECT k AS nationkey, CAST(r AS BIGINT) AS rank_e12 FROM r3
    """,
)
def graph_pagerank(spark, sf_dir):
    """PageRank over the nation-level trade graph (edge = some supplier in
    nation A shipped a lineitem to a customer in nation B), damping 0.85,
    3 fixed iterations.

    The iterative-algorithm pattern at scale: each iteration is one
    shuffle-on-dst join + groupBy — the rank state never leaves the
    cluster, the driver holds no per-vertex data, and the edge set is
    materialized once (localCheckpoint) instead of being recomputed by
    every unrolled iteration's lineage.  Ranks are BIGINTs in units of
    1e-12 with integer division throughout, which makes the fixpoint
    arithmetic exact and engine-portable (float PageRank sums would drift
    below round(,4) only probabilistically; integers deterministically
    never drift).  Oracle: the same 3 iterations unrolled as chained CTEs
    — an independent formulation of the same recurrence."""
    from biggie_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        # Structural sparsifier (round-10 vacuity CI catch, the same flaw
        # the round-9 review fixed in graph_hits_iter): at sf0.01+ the raw
        # trade graph is COMPLETE, making PageRank exactly uniform — every
        # rank the constant 1e12/25, a hash that proves nothing about the
        # iteration.  The quadratic mask keeps a fixed sparse subgraph with
        # genuine degree spread so ranks differentiate at every SF; the
        # data still decides which masked pairs appear.
        .filter(F.expr("(src * src + 31 * dst) % 7 < 3"))
        .distinct()
        .transform(lineage_cap)
    )
    nodes = (
        edges.select(F.col("src").alias("k"))
        .union(edges.select(F.col("dst").alias("k")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    base = nodes.agg(
        F.expr("150000000000 div count(*)").alias("base"),
        F.expr("1000000000000 div count(*)").alias("init"),
    )
    ranks = nodes.crossJoin(F.broadcast(base)).select(
        "k", F.col("init").alias("r"), "base"
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("k").alias("src"), F.col("r").alias("rs")), "src"
            )
            .join(deg, "src")
            .groupBy(F.col("dst").alias("k"))
            .agg(F.sum(F.expr("rs div d")).alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(base))
            .join(contrib, "k", "left")
            .select(
                "k",
                (
                    F.col("base")
                    + F.expr("85 * coalesce(s, 0) div 100")
                ).alias("r"),
                "base",
            )
        )
    return ranks.select(F.col("k").alias("nationkey"), F.col("r").alias("rank_e12"))


# Shared near-dup edge derivation: the SHINGLE-banding path (3-gram
# shingle MinHash -> 2x8 bands -> exact shingle-Jaccard >= 0.8 verify),
# MATERIALIZED so downstream iterative/multi-reference CTEs evaluate it
# once.  Round 6 switched this from the token-set path: token-LSH
# candidates are measured quadratic on this dup-dense corpus (exponent
# 1.98 — an sf0.1 sweep wedged inside the verify stage), shingle-LSH is
# measured linear (exponent 1.00), so the graph ops built on these edges
# now inherit a 100 TB-viable edge source (240 edges at sf0.1 vs the token
# path's 190,925 verified pairs).
_NEARDUP_EDGES_SQL = DUCK_SHINGLE_EDGES


@register(
    "llm_dedup_clusters",
    oracle="WITH RECURSIVE "
    + _NEARDUP_EDGES_SQL
    + """,
    sym AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM edges
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
    """Connected components over verified near-dup pairs (shingle-Jaccard
    >= 0.8): each document that appears in at least one near-dup pair is
    labeled with its cluster id = the minimum doc_id reachable through
    near-dup edges (which is also the canonical "keep" document of the
    cluster).  Edge source = neardup_edges_shingle (linear candidates;
    see _NEARDUP_EDGES_SQL note for the round-6 switch rationale)."""
    edges = neardup_edges_shingle(spark, sf_dir)
    sym = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .transform(lineage_cap)  # materialize the (expensive) LSH pipeline once
    )
    labels = sym.select("u").distinct().withColumn("lbl", F.col("u"))
    # Optimization r14 (guide §2.3 "shuffle fewer bytes"): the change test
    # is fused into the relabeling — labels are monotone non-increasing, so
    # a vertex changed iff its neighbor-min undercuts its current label
    # (coalesce(nbr, lbl) < lbl), and the old per-round NEW-vs-OLD compare
    # join disappears: 3 joins + 1 agg per round -> 2 joins + 1 agg, one
    # fewer shuffle of the full label frame per round.  At sf0.1 this is a
    # measured wash (1.65 s -> 1.63 s — the loop floor here is per-action
    # scheduling, ~0.2 s x 3 rounds, on a 240-edge graph); the removed
    # join is per-round work proportional to |labels|, which is what the
    # round cost tracks on a real corpus.  A two-steps-per-action variant
    # was also measured and REJECTED (1.65 s -> 1.85 s: the doubled plan
    # outweighs the saved driver round-trip).  Exit condition unchanged:
    # fires exactly when a step changes nothing, the same fixpoint.
    for _ in range(_MAX_ROUNDS):
        nbr_min = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("lbl").alias("vlbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("vlbl").alias("nbr"))
        )
        cur = labels.join(nbr_min, "u", "left").select(
            "u",
            F.least("lbl", F.coalesce("nbr", "lbl")).alias("lbl"),
            (F.coalesce("nbr", "lbl") < F.col("lbl")).alias("chg"),
        ).transform(lineage_cap)
        changed = cur.filter("chg").count()
        labels = cur.drop("chg")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("lbl").alias("component"))


@register(
    "graph_triangles",
    oracle="WITH "
    + _NEARDUP_EDGES_SQL
    + """,
    tri AS (SELECT x.doc_a AS a, x.doc_b AS b, y.doc_b AS c
            FROM edges x
            JOIN edges y ON y.doc_a = x.doc_b
            JOIN edges z ON z.doc_a = x.doc_a AND z.doc_b = y.doc_b)
    SELECT u AS doc_id, count(*) AS n_tri
    FROM (SELECT a AS u FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY u
    """,
)
def graph_triangles(spark, sf_dir):
    """Per-document triangle participation count over the near-dup graph
    (Jaccard >= 0.8 edges): a triangle = three documents that are pairwise
    near-duplicates, i.e. the densest redundancy motif in a corpus.  High
    n_tri marks template/boilerplate families worth aggressive pruning.

    Algorithm: edges are stored once in canonical orientation (doc_a <
    doc_b), so each triangle u<v<w is counted exactly once by the
    two-path + closing-edge join (x=(u,v), y=(v,w), z=(u,w)) — the standard
    distributed triangle enumeration.  The join keys are vertex ids, so at
    scale the two joins are plain shuffle-hash joins on the edge list; the
    canonical orientation bounds the candidate two-paths by out-degree
    (the degree-ordering trick that keeps the hub vertices from exploding
    the join).  Edge source = neardup_edges_shingle (linear candidates —
    the round-6 switch, see _NEARDUP_EDGES_SQL note); the edge list is
    lineage-capped so the MinHash/LSH chain runs once, not three times."""
    e = neardup_edges_shingle(spark, sf_dir).transform(lineage_cap)
    tri = (
        e.alias("x")
        .join(e.alias("y"), F.col("y.doc_a") == F.col("x.doc_b"))
        .join(
            e.alias("z"),
            (F.col("z.doc_a") == F.col("x.doc_a"))
            & (F.col("z.doc_b") == F.col("y.doc_b")),
        )
        .select(
            F.col("x.doc_a").alias("a"),
            F.col("x.doc_b").alias("b"),
            F.col("y.doc_b").alias("c"),
        )
    )
    verts = (
        tri.select(F.col("a").alias("doc_id"))
        .union(tri.select("b"))
        .union(tri.select("c"))
    )
    return verts.groupBy("doc_id").agg(F.count("*").alias("n_tri"))


_KC_N = 400  # node universe for the k-core probe graph
_KC_K = 3  # core threshold
_KC_ROUNDS = 4  # fixed peeling rounds — unrolled verbatim in the oracle


def _kcore_round_sql(prev_edges: str, out_nodes: str, out_edges: str) -> str:
    """One unrolled k-core peeling round in DuckDB SQL: degrees over the
    surviving edge set, keep nodes with degree >= k, induce the subgraph."""
    return f"""
    {out_nodes} AS (
        SELECT v FROM (
            SELECT src AS v, count(*) AS d FROM {prev_edges} GROUP BY src)
        WHERE d >= {_KC_K}),
    {out_edges} AS (
        SELECT e.src, e.dst FROM {prev_edges} e
        JOIN {out_nodes} a ON a.v = e.src
        JOIN {out_nodes} b ON b.v = e.dst)"""


@register(
    "graph_kcore",
    oracle=f"""
    WITH nodes AS (SELECT doc_id AS v FROM documents WHERE doc_id < {_KC_N}),
    raw AS (
      SELECT v AS a, (v * 2 + 1) % {_KC_N} AS b FROM nodes
      UNION ALL SELECT v, (v * 3 + 7) % {_KC_N} FROM nodes
      UNION ALL SELECT v, (v * 5 + 11) % {_KC_N} FROM nodes),
    e0 AS (
      /* undirected simple graph: both directions, no self-loops, dedup */
      SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM raw WHERE a <> b
        UNION ALL
        SELECT b, a FROM raw WHERE a <> b)),
    {_kcore_round_sql("e0", "n1", "e1")},
    {_kcore_round_sql("e1", "n2", "e2")},
    {_kcore_round_sql("e2", "n3", "e3")},
    {_kcore_round_sql("e3", "n4", "e4")}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e4 GROUP BY src
    """,
)
def graph_kcore(spark, sf_dir):
    """Bounded k-core decomposition (k = 3, four peeling rounds) over a
    deterministic synthetic undirected graph on the doc_id < 400 node set
    -- the dense-subgraph extractor behind spam-cluster mining and
    community seeding (a node is in the k-core iff it keeps >= k
    neighbors after everyone below k is recursively removed).

    Each round is degree-count -> filter -> induced-subgraph: one groupBy
    on src + two semi-joins on the survivor set, all equi-keyed on vertex
    id, with localCheckpoint() per round to keep lineage linear (the
    Pregel-state rule, same as graph_bfs_distance).  The round count is
    FIXED and unrolled verbatim in the oracle, so both engines compute
    the identical (possibly not-yet-converged) fourth iterate -- on this
    graph the peel stabilizes within the budget, and at 100 TB the same
    static K-stage DAG shape applies with K ~ log(peel depth)."""
    from biggie_spark.io import load_table

    nodes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _KC_N)
        .select(F.col("doc_id").alias("v"))
    )
    raw = (
        nodes.select(F.col("v").alias("a"), ((F.col("v") * 2 + 1) % _KC_N).alias("b"))
        .unionByName(
            nodes.select(
                F.col("v").alias("a"), ((F.col("v") * 3 + 7) % _KC_N).alias("b")
            )
        )
        .unionByName(
            nodes.select(
                F.col("v").alias("a"), ((F.col("v") * 5 + 11) % _KC_N).alias("b")
            )
        )
        .filter(F.col("a") != F.col("b"))
    )
    edges = (
        raw.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(raw.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .transform(lineage_cap)
    )
    for _ in range(_KC_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KC_K)
            .select(F.col("src").alias("v"))
        )
        edges = (
            edges.join(keep.select(F.col("v").alias("src")), "src")
            .join(keep.select(F.col("v").alias("dst")), "dst")
            .select("src", "dst")
            .transform(lineage_cap)
        )
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree")
    )


@register(
    "graph_reciprocity",
    oracle=f"""
    WITH nodes AS (SELECT doc_id AS v FROM documents WHERE doc_id < 400),
    edges AS (
      SELECT DISTINCT v AS src, (v * 2 + 1) % 400 AS dst FROM nodes
      UNION
      SELECT v, (v * 3 + 7) % 400 FROM nodes
      UNION
      /* deliberate reverse edges for half the first family */
      SELECT (v * 2 + 1) % 400, v FROM nodes WHERE v % 2 = 0),
    e AS (SELECT src, dst FROM edges WHERE src <> dst),
    recip AS (
      SELECT count(*) AS n_recip
      FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n_recip FROM recip) AS BIGINT) AS n_reciprocal,
           CAST((SELECT n_recip FROM recip) * 10000
                // (SELECT count(*) FROM e) AS BIGINT) AS reciprocity_bp
    FROM (SELECT 1)
    """,
)
def graph_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity — the fraction of edges whose reverse
    edge also exists (the follower-graph health metric separating
    broadcast networks from mutual ones).  The synthetic digraph plants
    reverse edges for half of one edge family, so the ratio is
    meaningfully between 0 and 1 and fully closed-form.

    Reciprocal detection is ONE self equi-join on the swapped key pair
    (b.src = a.dst AND b.dst = a.src — a hash join on the composite key,
    never a per-edge lookup loop), counting each mutual pair twice by
    convention (both directions count as reciprocated).  Edge dedup
    happens once up front; the ratio is integer basis points."""
    from biggie_spark.io import load_table

    nodes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(F.col("doc_id").alias("v"))
    )
    fam1 = nodes.select(F.col("v").alias("src"), ((F.col("v") * 2 + 1) % 400).alias("dst"))
    fam2 = nodes.select(F.col("v").alias("src"), ((F.col("v") * 3 + 7) % 400).alias("dst"))
    rev = (
        nodes.filter(F.col("v") % 2 == 0)
        .select(((F.col("v") * 2 + 1) % 400).alias("src"), F.col("v").alias("dst"))
    )
    e = (
        fam1.unionByName(fam2)
        .unionByName(rev)
        .distinct()
        .filter(F.col("src") != F.col("dst"))
        .transform(lineage_cap)  # feeds both sides of the swap join + the count
    )
    b = e.select(F.col("src").alias("bsrc"), F.col("dst").alias("bdst"))
    recip = e.join(
        b, (F.col("bsrc") == F.col("dst")) & (F.col("bdst") == F.col("src"))
    ).agg(F.count("*").alias("n_recip"))
    tot = e.agg(F.count("*").alias("n_edges"))
    return (
        tot.crossJoin(F.broadcast(recip))
        .select(
            "n_edges",
            F.col("n_recip").alias("n_reciprocal"),
            F.expr("n_recip * 10000 div n_edges").alias("reciprocity_bp"),
        )
    )
