"""Scale-diagnostics + data-layout operators (beyond the SURVEY.md §2
inventory): histogram, join-key skew profiling, heavy hitters, Z-order
layout keys, corpus drift, and a blocked fuzzy string join.

Why these exist: at 100 TB the *first* question is never "what is the
answer" but "what does the key distribution look like" — whether a join
needs salting, whether AQE's skew split will trigger, which keys dominate
a shuffle, and how to lay files out so multi-column predicates prune.
These operators make those production diagnostics first-class, fully
deterministic (integer-scaled arithmetic throughout, no floats), and
oracle-checked against DuckDB like every other operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import dsum, sql_dsum

# ---------------------------------------------------------------------------
# histogram


@register(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) // 1000000 AS bucket,
           count(*) AS n_orders,
           {sql_dsum("o_totalprice")} AS total_price
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram of order value in $10,000 buckets.

    Bucketing is done on integer cents (`round(x*100)::BIGINT // 1e6`), so a
    price sitting exactly on a bucket edge lands identically in any engine —
    float `floor(x/10000)` would not guarantee that.  One map-side groupBy,
    no shuffle beyond the final ~30-bucket aggregate; at 100 TB this is the
    canonical partial-agg-friendly shape (the combiner collapses each
    partition to <=n_buckets rows before the exchange)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.expr("cast(round(o_totalprice * 100, 0) as bigint) div 1000000")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# join-key skew profiling


@register(
    "diag_skew_stats",
    oracle="""
    WITH k AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           CAST(sum(cnt) AS BIGINT) * 1000000 // count(*) AS avg_rows_e6,
           max(cnt) * count(*) * 1000000 // CAST(sum(cnt) AS BIGINT)
               AS max_over_avg_e6
    FROM k
    """,
)
def diag_skew_stats(spark, sf_dir):
    """Join-key skew profile for `lineitem.l_partkey`: key cardinality, max
    key frequency, and the max/avg ratio (e6-scaled integer) that decides
    whether a shuffle join needs salting or AQE skew-split.

    This is the diagnostic you run BEFORE a 100 TB join: if max_over_avg is
    ~1e6 (i.e. 1.0) the hash partitioning is balanced; at >5e6 one reducer
    owns 5x the average and `spark.sql.adaptive.skewJoin` (or explicit
    salting, see skew.salted_sum_count) is warranted.  Two-stage agg:
    per-key counts (partial-agg friendly), then a single-row rollup —
    driver never sees per-key data."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    k = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    return (
        k.agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        .withColumn("avg_rows_e6", F.expr("total_rows * 1000000 div n_keys"))
        .withColumn(
            "max_over_avg_e6", F.expr("max_cnt * n_keys * 1000000 div total_rows")
        )
    )


@register(
    "diag_heavy_hitters",
    oracle="""
    WITH k AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lineitem)
    SELECT l_partkey, cnt, cnt * 1000000 // total AS share_e6
    FROM k CROSS JOIN t
    ORDER BY cnt DESC, l_partkey LIMIT 10
    """,
)
def diag_heavy_hitters(spark, sf_dir):
    """Top-10 heaviest join keys with their e6-scaled share of all rows —
    the keys a salting strategy would split, tie-broken by key for a total
    order.  The global count rides along via a broadcast cross join of a
    1-row aggregate (no second scan shuffle), and the top-k is Spark's
    TakeOrderedAndProject — per-partition heaps, never a full sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    k = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    t = li.agg(F.count("*").alias("total"))
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "l_partkey", "cnt", F.expr("cnt * 1000000 div total").alias("share_e6")
        )
        .orderBy(F.desc("cnt"), "l_partkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Z-order layout key

_ZBITS = 16


def _z_interleave(x: str, y: str, spark_side: bool) -> str:
    """Unrolled 16+16-bit Morton interleave as pure integer arithmetic.

    The same formula is emitted for both engines (only the shift spelling
    differs: Spark `shiftleft/shiftright` builtins, DuckDB `<<`/`>>`), so
    the z-value is bit-identical by construction."""
    terms = []
    for i in range(_ZBITS):
        if spark_side:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZX_SPARK = "(o_custkey & 65535)"
_ZY_SPARK = "(datediff(cast(o_orderdate as date), date'1992-01-01') & 65535)"
_ZX_DUCK = "(o_custkey & 65535)"
_ZY_DUCK = "(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 65535)"


@register(
    "sort_zorder",
    oracle=f"""
    WITH z AS (SELECT o_orderkey,
                      {_z_interleave(_ZX_DUCK, _ZY_DUCK, spark_side=False)} AS zval
               FROM orders)
    SELECT o_orderkey, zval, zval // 4096 AS zbucket FROM z
    """,
)
def sort_zorder(spark, sf_dir):
    """Z-order (Morton) layout key over (o_custkey, o_orderdate): interleave
    the low 16 bits of each dimension so range-partitioning by `zval`
    clusters rows that are close in BOTH dimensions into the same files.

    This is the write-side layout trick behind multi-dimensional data
    skipping: a query filtering on either customer OR date range touches
    O(sqrt(files)) instead of all of them, because parquet min/max footer
    stats on a z-sorted file bound both dimensions at once.  At 100 TB you
    would `repartitionByRange(N, zval).sortWithinPartitions(zval)` before
    the write; here we emit the key + its 4096-wide bucket (the would-be
    file id) and oracle-check the interleave bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    z = o.select(
        "o_orderkey",
        F.expr(_z_interleave(_ZX_SPARK, _ZY_SPARK, spark_side=True)).alias("zval"),
    )
    return z.select("o_orderkey", "zval", F.expr("zval div 4096").alias("zbucket"))


# ---------------------------------------------------------------------------
# range-partition boundary planning


@register(
    "diag_range_bounds",
    oracle="""
    WITH k AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
         r AS (SELECT o_custkey, cnt,
                      sum(cnt) OVER (ORDER BY o_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS run,
                      sum(cnt) OVER () AS total
               FROM k)
    SELECT CAST((run - cnt) * 8 // total AS BIGINT) AS bucket,
           max(o_custkey) AS upper_bound,
           CAST(sum(cnt) AS BIGINT) AS n_rows
    FROM r GROUP BY 1
    """,
)
def diag_range_bounds(spark, sf_dir):
    """Exact range-partition boundaries for an 8-way
    `repartitionByRange(o_custkey)`: each key goes whole into the bucket of
    its first row (keys never split across range partitions), boundaries
    are the per-bucket max key, n_rows shows the achieved balance.

    This is the deterministic spec of what Spark's RangePartitioner
    estimates by reservoir sampling.  The scale-correct shape: the window
    runs over the per-key AGGREGATE (|keys| rows, ~1000x smaller than the
    table), not the raw rows — the global-order window is a planning step
    on summarized data, and the raw table is never globally sorted.  All
    arithmetic is integer (`(run-cnt)*8 div total`), so bucket assignment
    is engine-exact."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    k = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    t = k.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = k.withColumn("run", F.sum("cnt").over(w)).crossJoin(F.broadcast(t))
    return (
        r.withColumn("bucket", F.expr("(run - cnt) * 8 div total"))
        .groupBy("bucket")
        .agg(F.max("o_custkey").alias("upper_bound"), F.sum("cnt").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# corpus drift


@register(
    "llm_source_drift",
    oracle="""
    WITH d AS (SELECT source, lang FROM documents),
         c AS (SELECT source, lang, count(*) AS c FROM d GROUP BY 1, 2),
         t AS (SELECT source, count(*) AS t FROM d GROUP BY 1),
         g AS (SELECT lang, count(*) AS g FROM d GROUP BY 1),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         grid AS (SELECT t.source, g.lang, t.t, g.g, n.n
                  FROM t CROSS JOIN g CROSS JOIN n)
    SELECT grid.source,
           CAST(min(grid.t) AS BIGINT) AS n_docs,
           CAST(sum(abs(coalesce(c.c, 0) * 1000000 // grid.t
                        - grid.g * 1000000 // grid.n)) AS BIGINT) AS drift_e6
    FROM grid LEFT JOIN c ON c.source = grid.source AND c.lang = grid.lang
    GROUP BY grid.source
    """,
)
def llm_source_drift(spark, sf_dir):
    """Per-source language-distribution drift vs the whole corpus: L1
    distance between the source's language mix and the global mix, in
    e6-scaled integer probability units.

    The production use is ingest monitoring — a crawl source whose language
    mix diverges from the corpus (drift_e6 spike) gets quarantined before
    it skews training data.  All probabilities are integer-scaled BEFORE
    subtraction (`c*1e6 // t`), so both engines compute identical BIGINTs —
    a float p would straddle rounding boundaries (determinism rule 7).
    Shape at scale: three partial-agg count passes over one scan + a
    broadcast-able langs x sources grid (|langs| * |sources| rows, tiny)."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    t = d.groupBy("source").agg(F.count("*").alias("t"))
    g = d.groupBy("lang").agg(F.count("*").alias("g"))
    n = d.agg(F.count("*").alias("n"))
    grid = t.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(n))
    return (
        grid.join(c, ["source", "lang"], "left")
        .select(
            "source",
            "t",
            F.expr(
                "abs(coalesce(c, 0) * 1000000 div t - g * 1000000 div n)"
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.min("t").alias("n_docs"), F.sum("term").alias("drift_e6"))
    )


# ---------------------------------------------------------------------------
# blocked fuzzy string join


@register(
    "join_fuzzy_name",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON string_split(a.p_name, ' ')[2] = string_split(b.p_name, ' ')[2]
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def join_fuzzy_name(spark, sf_dir):
    """Blocked fuzzy self-join over distinct part names: candidate pairs
    share a blocking key (the noun token), then exact Levenshtein <= 3
    verifies — the classic entity-resolution shape (block -> verify) that
    turns an O(n^2) fuzzy join into O(sum of block sizes^2).

    At 100 TB the blocking key is the shuffle key, so each block's
    quadratic verify runs locally on one executor; distinct-names-first
    collapses the input to the vocabulary size before any pairing.
    Levenshtein is classic unit-cost edit distance in both engines
    (verified to agree)."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct().withColumn(
        "blk", F.element_at(F.split("p_name", " "), 2)
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("blk").alias("blk_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@register(
    "diag_profile_table",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS col,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min(CAST({c} AS VARCHAR)) AS VARCHAR) AS min_s,
               CAST(max(CAST({c} AS VARCHAR)) AS VARCHAR) AS max_s
        FROM orders''' for c in _PROFILE_COLS)}
    """,
)
def diag_profile_table(spark, sf_dir):
    """One-pass table profile (null count, distinct count, lexical
    min/max per column) -- the df.describe()/data-catalog stats block,
    scored long-format so every number is oracle-checked.

    All four columns profile in ONE aggregate job over one scan: the
    per-column stats are independent aggregate expressions in a single
    groupBy().agg() (Spark fuses them into one partial+final hash
    aggregate), then the wide 1-row result unpivots to long format
    driver-free via stack().  min/max compare the STRING form on both
    engines so one output schema covers numeric and varchar columns
    alike.  At 100 TB this is the stats-collection pass a catalog runs
    after ingest; count(DISTINCT) over multiple columns expands to one
    extra shuffle per column (Spark's expand operator) -- acceptable for
    a profiling pass, and the exact-bitmap variant (agg_bitmap_distinct)
    is the cheaper alternative when only cardinalities matter."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__nd, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
        "(col, n_rows, n_null, n_distinct, min_s, max_s)"
    )


@register(
    "fn_table_checksum",
    oracle="""
    WITH rh AS (
      SELECT CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)),
             1, 12)) AS BIGINT) AS h
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) AS VARCHAR) AS checksum,
           CAST(min(h) AS BIGINT) AS h_min,
           CAST(max(h) AS BIGINT) AS h_max
    FROM rh
    """,
)
def fn_table_checksum(spark, sf_dir):
    """Order-insensitive table checksum -- THE migration-parity
    primitive: hash every row to a 48-bit integer (md5 over a canonical
    '|'-joined rendering with money in exact cents) and SUM the hashes.
    Addition is commutative, so the checksum is independent of row
    order, partitioning, and engine -- two systems holding the same rows
    produce the same (count, sum, min, max) quadruple, and a single
    changed row flips the sum with probability 1 - 2^-48.

    This is exactly how cross-engine backfills and replication checks
    are validated at 100 TB: one map-side hash per row, one associative
    aggregate, no sort, no collect.  The sum accumulates in
    DECIMAL(38,0) and is emitted as a STRING: a 48-bit hash sum blows
    through BIGINT at just ~2^15 rows (caught live by the round-6 sf0.1
    sweep -- ANSI mode raised ARITHMETIC_OVERFLOW at 150 k orders; an
    earlier draft of this docstring got that bound wrong by nine orders
    of magnitude), while DECIMAL(38,0) holds to ~3.6e23 rows; the string
    rendering is digits-exact in both engines (DuckDB HUGEINT and Spark
    DECIMAL both print plain integers), dodging the HUGEINT->float64
    mangle in the driver's pandas canonicalizer."""
    row_h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.round(F.col("o_totalprice") * 100, 0)
                        .cast("long")
                        .cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(row_h)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("checksum"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
    )


@register(
    "agg_histogram_equidepth",
    oracle="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
      FROM orders),
    b AS (
      SELECT cents,
             ntile(8) OVER (ORDER BY cents, o_orderkey) AS bucket
      FROM c)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM b GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark, sf_dir):
    """Equi-DEPTH histogram of order totals (8 buckets of equal row
    count with per-bucket value bounds) -- the statistics structure a
    cost-based optimizer actually stores: unlike the fixed-width twin
    (`agg_histogram`), bucket boundaries adapt to the distribution, so
    selectivity estimates stay accurate under skew.

    Depth assignment is ntile over (cents, orderkey) -- the integer-cent
    + unique-key order makes every bucket boundary deterministic even at
    value ties, the same discipline as ts_rfm_segments.  The global-order
    window IS the cost (one range-partition-style sort); that is inherent
    to exact equi-depth and is why engines build these on a SAMPLE at
    100 TB -- the deterministic hash-sample op (`fn_sample_hash`)
    composes directly in front of this one for that path."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    b = c.withColumn(
        "bucket", F.ntile(8).over(Window.orderBy("cents", "o_orderkey"))
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )
