"""Bucketed (co-located) joins — the shuffle-elimination story at 100 TB.

A fact-fact join normally shuffles BOTH sides on the join key every query.
Bucketing pays that shuffle once at write time: both tables are hash-
bucketed (and sorted) by the join key into the warehouse, after which every
join on that key is a zero-exchange, zero-sort merge join — per-bucket
streams zip together locally.  This is the Spark analog of the reference's
hex-fanout key sharding, applied to co-location instead of lookup.

tests/test_bucketing.py asserts the plan property (no ShuffleExchange with
broadcast disabled); the DuckDB oracle checks the values (bucketing must be
plan-visible only).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import revenue_sum, temp_conf

N_BUCKETS = 8


def write_bucketed(spark, sf_dir: str) -> tuple[str, str]:
    """Bucket orders+lineitem by the join key into the session warehouse
    (idempotent per sf_dir)."""
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir)
    names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
    existing = {t.name for t in spark.catalog.listTables()}
    if not all(n in existing for n in names):
        # a previous session may have left the managed locations on disk
        # while this session's in-memory catalog has never heard of them
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)
        (
            load_table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(names[0])
        )
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(names[1])
        )
    return names


@register(
    "join_bucketed",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark, sf_dir):
    """Fact-fact join on pre-bucketed tables: no exchange, no sort at query
    time (asserted in tests/test_bucketing.py)."""
    o_name, l_name = write_bucketed(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), revenue_sum().alias("revenue"))
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT l_partkey,
           CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_val,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_partkey
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Two-phase salted aggregation over the corpus's skewed join key
    (l_partkey — see diag_skew_stats): phase 1 groups by (key, salt) to
    fan a power-law hot key across n_salts reducers, phase 2 merges the
    partial states by key.  The salt is a row-unique id, NOT row-content
    hash — a hot key of millions of identical rows must still fan out.
    Values are integer cents so the two-phase sum is associative and the
    result provably equals the single-phase plan (the oracle IS the
    single-phase plan).  Only valid for algebraic aggregates; the helper
    (biggie_spark.skew.salted_sum_count) is the reusable kernel."""
    from biggie_spark.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(round(l_quantity * 100, 0) AS BIGINT)").alias("cents"),
    )
    return salted_sum_count(li, "l_partkey", "cents")


@register(
    "join_salted_skew",
    oracle="""
    SELECT n_name, count(*) AS n,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted replicate join — the skew-buster for when the hot-key side is
    too big for AQE's split AND the other side is too big to broadcast.

    The classic failure: one power-law key routes a third of the fact table
    through a single reducer.  Salting fans it out: the fact side gets a
    row-unique ``salt in [0, n)``, the dim side is replicated n ways (one
    copy per salt via explode of a literal sequence), and the join key
    becomes ``(key, salt)`` — the hot key now spreads across n reducers.
    Replication cost is n × |dim|, paid only when |dim| ≫ broadcast
    threshold; here supplier stands in for that big dim, with
    autoBroadcastJoinThreshold pinned off so the salted exchange is the
    plan that actually runs (tests/test_skew.py asserts the shuffle is on
    (key, salt)).  Result provably equals the unsalted join — the oracle IS
    the unsalted join.  The salt must be row-unique (id-derived), not
    content-derived: a hot key of identical rows must still fan out."""
    n_salts = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("salt"),
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    with temp_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        joined = li.join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt),
        )
        out = (
            joined.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n"), revenue_sum().alias("revenue"))
        )
        return out.localCheckpoint()


@register(
    "join_runtime_bloom",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def join_runtime_bloom(spark, sf_dir):
    """Runtime bloom-filter join pruning — the scan-reduction feature that
    matters most at 100 TB: when one join side carries a selective filter
    (urgent orders ≈ 20% here; often ≪1% in practice), Catalyst builds a
    bloom filter over the filtered side's join keys and injects a
    ``might_contain`` predicate into the OTHER side's scan, so fact rows
    that cannot join are dropped at the scan — before the shuffle — instead
    of after it.  Row-group statistics can't do this (orderkeys are spread
    across every row group); only a key-set filter can.

    Plan shape (pinned by tests/test_plans.py): `bloom_filter_agg` on the
    creation side, `might_contain(...)` in the fact-side Filter.  Thresholds
    are pinned via temp confs because the sf0.01 corpus is below the
    default 10 GB application-side threshold — on a real cluster the
    defaults fire on their own.  Values oracle-checked against the plain
    join."""
    with temp_conf(
        spark,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    ), temp_conf(
        spark, "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    ), temp_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        ords = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
        )
        out = (
            li.join(ords, li.l_orderkey == ords.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), revenue_sum().alias("revenue"))
        )
        return out.localCheckpoint()


@register(
    "join_dynamic_partition_prune",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def join_dynamic_partition_prune(spark, sf_dir):
    """Dynamic partition pruning (DPP) — the partition-level partner of the
    row-level bloom filter: when a directory-partitioned fact joins a dim
    whose filter restricts the partition column, Catalyst injects the dim's
    qualifying key set as a runtime subquery into the fact's file index, so
    whole partitions are never LISTED, let alone scanned.  At 100 TB with
    date-partitioned facts this is the single biggest scan saver there is.

    Here: orders written partitionBy(o_orderpriority) (the stash key-fanout
    layout), joined to a 5-row priority dim filtered to 2 hot classes — the
    plan must carry `dynamicpruning#` on the fact scan (pinned in
    tests/test_plans.py).  Values oracle-checked against the equivalent
    static filter."""
    import shutil
    import tempfile

    from pyspark.sql import Row

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    tmp = tempfile.mkdtemp(prefix="biggie_dpp_")
    try:
        o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
        fact = spark.read.parquet(tmp)
        # the dim filter must be a comparison DPP's hasSelectivePredicate
        # recognizes (string equality here); a bare boolean attribute is
        # not treated as selective and the subquery is never injected
        dim = spark.createDataFrame(
            [
                Row(prio="1-URGENT", tier="hot"),
                Row(prio="2-HIGH", tier="hot"),
                Row(prio="3-MEDIUM", tier="cold"),
                Row(prio="4-NOT SPECIFIED", tier="cold"),
                Row(prio="5-LOW", tier="cold"),
            ]
        ).filter(F.col("tier") == "hot")
        out = (
            fact.join(F.broadcast(dim), fact.o_orderpriority == dim.prio)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("o_custkey").alias("sum_cust"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
