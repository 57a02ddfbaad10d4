"""§2.G — sorts, limits, top-k, set operations, deduplication.

`limit_topk` compiles to TakeOrderedAndProject (per-partition heap + driver
merge — no global sort at any scale).  Set ops are native; exact dedup is
either full-row distinct (hash aggregate) or windowed keep-min-per-key,
which — unlike dropDuplicates — is deterministic (SURVEY.md §2.G).
"""

from __future__ import annotations
from biggie_spark.util import lineage_cap

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, status_or_null,
           row_number() OVER (
             ORDER BY status_or_null ASC NULLS LAST, o_totalprice DESC, o_orderkey) AS pos
    FROM (
      SELECT o_orderkey, o_totalprice, nullif(o_orderstatus, 'P') AS status_or_null
      FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def sort_multi(spark, sf_dir):
    """Multi-key sort with NULLS LAST — materialized as a global position
    column so the (order-insensitive) oracle hash still pins the ordering."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    o = o.select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )
    w = Window.orderBy(
        F.asc_nulls_last("status_or_null"),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return o.select("o_orderkey", "status_or_null", F.row_number().over(w).alias("pos"))


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def limit_topk(spark, sf_dir):
    """Global top-k: orderBy+limit -> TakeOrderedAndProject physical op
    (per-partition top-k heaps, no full shuffle/sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _status_keys(spark, sf_dir, status):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == status).select("o_custkey")


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_all(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").unionByName(_status_keys(spark, sf_dir, "P"))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_distinct(spark, sf_dir):
    return (
        _status_keys(spark, sf_dir, "F")
        .union(_status_keys(spark, sf_dir, "P"))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").intersect(_status_keys(spark, sf_dir, "P"))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").subtract(_status_keys(spark, sf_dir, "P"))


@register(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
    """,
)
def dedup_exact_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_quantity").distinct()


@register(
    "dedup_by_key",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def dedup_by_key(spark, sf_dir):
    """Keep exactly one deterministic row per key — row_number over an
    explicit order, NOT dropDuplicates (whose survivor is partition-order
    dependent and not reproducible across engines or runs).  The order
    covers every projected column because (l_orderkey, l_linenumber) is not
    unique in the corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect_all(spark, sf_dir):
    """Bag-semantics INTERSECT ALL (min of per-side multiplicities) — the
    variant audits need when duplicate cardinality carries meaning;
    Spark plans it as a counted hash aggregate per side + generate, not
    a distinct, so multiplicity survives."""
    return _status_keys(spark, sf_dir, "F").intersectAll(
        _status_keys(spark, sf_dir, "P")
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark, sf_dir):
    """Bag-semantics EXCEPT ALL (multiplicity subtraction, floored at 0)
    — e.g. 'orders left after netting out one-for-one matches'."""
    return _status_keys(spark, sf_dir, "F").exceptAll(
        _status_keys(spark, sf_dir, "P")
    )


@register(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text || ' zq' FROM documents WHERE doc_id % 4 = 0),
    keyed AS (
      SELECT doc_id, text,
             substr(text, 1, 20) || lpad(CAST(length(text) AS VARCHAR), 5, '0')
               AS sortkey
      FROM corpus),
    ordered AS (
      SELECT doc_id, text, sortkey,
             row_number() OVER (ORDER BY sortkey, doc_id) AS rn
      FROM keyed),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             levenshtein(a.text, b.text) AS dist
      FROM ordered a JOIN ordered b
        ON b.rn BETWEEN a.rn + 1 AND a.rn + 3)
    SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
    FROM pairs WHERE dist <= 4
    """,
)
def dedup_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup -- the THIRD classic near-dup strategy
    alongside key blocking (llm_dedup_editdist) and LSH banding
    (llm_neardup_pairs): sort the corpus by a fuzzy key (text prefix +
    zero-padded length), then compare each record only against its next
    w = 3 neighbors in sort order.  Candidate volume is exactly w·n --
    LINEAR by construction, no block-size skew at all -- at the cost of
    missing pairs whose sort keys diverge (why production systems run
    multiple passes with different keys).

    The window join is `b.rn BETWEEN a.rn+1 AND a.rn+3` -- a range
    self-join on consecutive ranks.  On a cluster the rank assignment is
    the one global-sort stage (range partitioning), and the neighbor
    join co-locates by rank ranges; here the exact Levenshtein <= 4
    verify confirms the mutated twin corpus (every 4th doc + ' zq')
    surfaces through pure sort adjacency -- no blocking key was ever
    declared."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat("text", F.lit(" zq")).alias("text"),
        )
    )
    keyed = corpus.withColumn(
        "sortkey",
        F.concat(
            F.substring("text", 1, 20),
            F.lpad(F.length("text").cast("string"), 5, "0"),
        ),
    )
    from pyspark.sql import Window

    ordered = keyed.withColumn(
        "rn", F.row_number().over(Window.orderBy("sortkey", "doc_id"))
    )
    ordered = ordered.transform(lineage_cap)  # rank frame feeds both join sides
    a = ordered.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("ta"), F.col("rn").alias("ra")
    )
    b = ordered.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("tb"), F.col("rn").alias("rb")
    )
    # consecutive-rank neighbor join: equi-join on the neighbor OFFSET
    # (explode a.ra -> ra+1..ra+3) keeps it hash-joinable, not a range join
    ax = a.withColumn("rb", F.explode(F.expr("sequence(ra + 1, ra + 3)")))
    # Cap = 4 = the emit threshold (optimization r14): rejected pairs
    # return -1, the keep-set is identical, and the single-reference
    # `dist >= 0` filter avoids the double kernel evaluation the old
    # two-conjunct filter paid after alias substitution.
    pairs = ax.join(b, "rb").withColumn(
        "dist", F.expr("levenshtein(ta, tb, 4)").cast("long")
    )
    return pairs.filter(F.col("dist") >= 0).select(
        "id_a", "id_b", "dist"
    )
