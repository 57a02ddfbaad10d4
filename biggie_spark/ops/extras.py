"""Supplementary operators beyond the SURVEY.md §2 inventory: exact median
(rank-based, interpolation-free), bitwise functions, struct columns,
distribution window functions, and a correlated scalar subquery through the
SQL entry point (exercising Catalyst's decorrelation, SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table, register_views
from biggie_spark.registry import register
from biggie_spark.util import r4


@register(
    "agg_median_exact",
    oracle="""
    WITH r AS (
      SELECT o_orderstatus, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders)
    SELECT o_orderstatus, round(avg(o_totalprice), 4) AS median_price
    FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY o_orderstatus
    """,
)
def agg_median_exact(spark, sf_dir):
    """Exact median via rank positions (avg of the middle one/two rows).
    Deliberately NOT percentile()/median() builtins: interpolation rules
    differ across engines; rank positions under a total order do not."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
        .filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("o_orderstatus")
        .agg(r4(F.avg("o_totalprice")).alias("median_price"))
    )


@register(
    "agg_quantiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.25), 4) AS q25_cents,
           round(quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5), 4) AS q50_cents,
           round(quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.75), 4) AS q75_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_quantiles(spark, sf_dir):
    """Exact continuous quartiles (Spark `percentile` == DuckDB
    `quantile_cont`: pos = p*(n-1), linear interpolation).  Computed over
    integer CENTS, not dollars: quarter-fraction interpolations of integers
    are exact in binary, so round(,4) agrees across engines — interpolating
    2-decimal doubles would hit the .xxxx5 rounding-boundary divergence."""
    o = load_table(spark, sf_dir, "orders")
    cents = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
    return o.groupBy("o_orderstatus").agg(
        r4(F.expr(f"percentile({cents}, 0.25D)")).alias("q25_cents"),
        r4(F.expr(f"percentile({cents}, 0.5D)")).alias("q50_cents"),
        r4(F.expr(f"percentile({cents}, 0.75D)")).alias("q75_cents"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           l_orderkey & 255 AS b_and,
           l_orderkey | 15 AS b_or,
           xor(l_orderkey, 255) AS b_xor,
           l_orderkey << 2 AS b_shl,
           l_orderkey >> 3 AS b_shr
    FROM lineitem
    """,
)
def fn_bitwise(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(15)).alias("b_or"),
        k.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.expr("shiftleft(l_orderkey, 2)").alias("b_shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("b_shr"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS sk, round(o_totalprice, 4) AS sp,
           o_orderstatus AS nested_status
    FROM orders
    """,
)
def fn_struct(spark, sf_dir):
    """Struct build + (nested) field access; output flattened to scalars
    (the oracle recomputes relationally — struct plumbing is Spark-side)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.struct(F.col("o_orderstatus").alias("st")).alias("inner"),
    )
    return o.withColumn("s", s).select(
        "o_orderkey",
        F.col("s.k").alias("sk"),
        r4(F.col("s.p")).alias("sp"),
        F.col("s.inner.st").alias("nested_status"),
    )


@register(
    "win_cume_percent",
    oracle="""
    SELECT o_orderkey,
           round(cume_dist() OVER w, 4) AS cd,
           round(percent_rank() OVER w, 4) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_cume_percent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        r4(F.cume_dist().over(w)).alias("cd"),
        r4(F.percent_rank().over(w)).alias("pr"),
    )


@register(
    "fn_regexp",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, '[a-z]*key[a-z]*'), '|'), '') AS key_words,
           len(regexp_extract_all(text, 'a[a-z]+')) AS n_a_words,
           regexp_replace(text, '^(\\w+) (\\w+)', '\\2 \\1') AS first_swap,
           regexp_matches(text, '^the ') AS starts_the
    FROM documents
    """,
)
def fn_regexp(spark, sf_dir):
    """Regexp family beyond fn_string's basics: extract-all (list output),
    match counting, backreference replace (Spark `$n` vs DuckDB `\\n`
    syntax, same semantics), anchored match test.  DuckDB regexp_replace
    is non-global by default == Spark with an unanchored pattern applies
    globally — so the pattern here is anchored by using a single leading
    occurrence (first two words)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat_ws(
            "|", F.expr("regexp_extract_all(text, '[a-z]*key[a-z]*', 0)")
        ).alias("key_words"),
        F.size(F.expr("regexp_extract_all(text, 'a[a-z]+', 0)")).alias("n_a_words"),
        F.regexp_replace(
            F.col("text"), r"^(\w+) (\w+)", "$2 $1"
        ).alias("first_swap"),
        F.col("text").rlike("^the ").alias("starts_the"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type),
    ranked AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM counts)
    SELECT user_id, event_type AS mode_event, n AS mode_count
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Deterministic per-group mode (most frequent event_type per user).
    Deliberately NOT the mode() builtin: engines break frequency ties
    arbitrarily; count + row_number under a total order (count desc, value
    asc) is portable and stays a two-shuffle plan (partial-agg'd count,
    then a window on the already-partitioned key)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT o_custkey,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def agg_string_agg(spark, sf_dir):
    """Sorted-distinct string aggregation per group.  The sort inside the
    aggregate is the determinism contract: Spark's collect_set order is
    nondeterministic, so we array_sort before joining — equivalent to
    DuckDB's ORDER BY inside string_agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderstatus")), "|"
        ).alias("statuses"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'error') AS n_error,
           CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT))
                      FILTER (WHERE event_type = 'purchase') / 100.0, 4)
                AS DOUBLE) AS purchase_value,
           bool_or(event_type = 'signup') AS ever_signed_up,
           bool_and(value >= 0) AS all_nonneg
    FROM events GROUP BY user_id
    """,
)
def agg_filtered(spark, sf_dir):
    """Conditional aggregation family: FILTER-clause counts/sums and
    boolean any/every — one pass, no self-joins (the naive formulation
    joins the table to itself once per condition; this stays a single
    partial+final aggregate at any scale).  Spark spells FILTER as
    count_if / sum(CASE WHEN); the money sum keeps the fixed-point
    convention inside the CASE."""
    e = load_table(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100, 0).cast("long"),
    )
    return e.groupBy("user_id").agg(
        F.expr("count_if(event_type = 'purchase')").alias("n_purchase"),
        F.expr("count_if(event_type = 'error')").alias("n_error"),
        F.round(F.sum(cents) / 100.0, 4).cast("double").alias("purchase_value"),
        F.expr("bool_or(event_type = 'signup')").alias("ever_signed_up"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
    )


@register(
    "fn_sample_hash",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    """,
)
def fn_sample_hash(spark, sf_dir):
    """Deterministic ~10% sample by content hash (md5 of the key, first 8
    hex digits mod 10).  Unlike fn_sample's RNG stream this is portable
    across engines AND stable across reruns/cluster sizes — the property a
    reproducible training-data pipeline needs (re-running the pipeline on
    repartitioned data must select the same rows).  md5 is byte-identical
    in both engines (SURVEY.md §7.4.8)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return e.filter(bucket % 10 == 0).select("event_id", "event_type")


@register(
    "agg_percentile_disc",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag,
           round(max(CASE WHEN rn * 10 <= n THEN l_extendedprice END), 4) AS p10,
           round(max(CASE WHEN rn * 10 <= 9 * n THEN l_extendedprice END), 4) AS p90
    FROM r GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark, sf_dir):
    """Discrete percentiles (p10/p90 as actual data values, no
    interpolation) via rank positions under a total order — the
    engine-portable formulation (Spark has no percentile_disc; DuckDB's
    quantile_disc position convention differs — rank arithmetic is
    identical by construction).  Values are existing 2-decimal rows, so
    round(,4) is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    r = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    return r.groupBy("l_returnflag").agg(
        r4(
            F.max(F.when(F.col("rn") * 10 <= F.col("n"), F.col("l_extendedprice")))
        ).alias("p10"),
        r4(
            F.max(
                F.when(F.col("rn") * 10 <= 9 * F.col("n"), F.col("l_extendedprice"))
            )
        ).alias("p90"),
    )


@register(
    "sql_correlated_subquery",
    oracle="""
    SELECT c_custkey,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    """,
)
def sql_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery via the SQL entry point — Catalyst
    decorrelates it into a left outer aggregate join (free optimizer
    behavior, SURVEY.md §4); DuckDB runs the identical SQL."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        """
    )


@register("agg_approx_quantile")  # sketch estimates are engine-specific -> rows-only
def agg_approx_quantile(spark, sf_dir):
    """Approximate quantiles via percentile_approx (GK sketch) — the scale
    path beside the exact rank-based agg_quantiles: the sketch merges
    associatively across partitions with bounded memory, where the exact
    formulation needs a per-group sort.  Estimates are not cross-engine
    portable (DuckDB's approx_quantile uses t-digest), hence rows-only."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile_approx(o_totalprice, 0.5, 1000)").alias("median_est"),
        F.expr("percentile_approx(o_totalprice, 0.99, 1000)").alias("p99_est"),
    )


@register(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%s#%09.2f', o_orderstatus, o_totalprice) AS tagline,
           printf('%05d|%x', o_orderkey, o_orderkey) AS keyfmt
    FROM orders
    """,
)
def fn_format(spark, sf_dir):
    """C-style string formatting (Spark format_string == DuckDB printf):
    zero-padded fixed-width floats and ints, hex rendering.  o_totalprice
    is 2-decimal, so %.2f rounding is exact in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%s#%09.2f", "o_orderstatus", "o_totalprice").alias(
            "tagline"
        ),
        F.format_string("%05d|%x", "o_orderkey", "o_orderkey").alias("keyfmt"),
    )


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT doc_id AS root, doc_id AS cur, 0 AS depth FROM documents
      UNION ALL
      SELECT root, cur // 10, depth + 1 FROM chain WHERE cur > 0
    )
    SELECT root AS doc_id, max(depth) AS depth_to_zero, count(*) AS n_nodes
    FROM chain GROUP BY root
    """,
)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE via the SQL entry point (Spark 4.x WITH RECURSIVE):
    walk each doc_id up its digit-strip hierarchy (id -> id div 10 -> ...
    -> 0), a bounded data-seeded traversal.  Each recursion step is one
    incremental DataFrame union — depth is bounded by key width (~7
    levels), so the unrolled plan stays small; for unbounded iteration
    the engine's iterative-join graph ops (ops/graph.py) are the scale
    path.  DuckDB runs the same query with `//` integer division."""
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT doc_id AS root, doc_id AS cur, 0 AS depth FROM documents
          UNION ALL
          SELECT root, cur DIV 10, depth + 1 FROM chain WHERE cur > 0
        )
        SELECT root AS doc_id, max(depth) AS depth_to_zero, count(*) AS n_nodes
        FROM chain GROUP BY root
        """
    )


@register(
    "fn_trig",
    oracle="""
    SELECT p_partkey,
           /* + 0 normalizes -0.0 (cos near 90/270 deg rounds to a signed
              zero); the driver hash distinguishes signed zeros */
           round(sin(radians(p_partkey % 360)), 4) + 0 AS sin_v,
           round(cos(radians(p_partkey % 360)), 4) + 0 AS cos_v,
           round(atan2(CAST(p_size AS DOUBLE), 10.0), 4) + 0 AS atan2_v,
           round(asin(p_size / 100.0), 4) + 0 AS asin_v,
           round(degrees(atan(1.0)), 4) + 0 AS deg45
    FROM part
    """,
)
def fn_trig(spark, sf_dir):
    """Trigonometric scalar family over deterministic integer inputs.
    Spark (java.lang.Math) and DuckDB (C libm) may differ in the last ulp
    of a transcendental — harmless under the 4-decimal convention unless
    a value sits within ~1e-12 of a rounding boundary, which bounded
    integer-derived inputs avoid (verified at all three SFs)."""
    p = load_table(spark, sf_dir, "part")
    deg = F.col("p_partkey") % 360
    return p.select(
        "p_partkey",
        r4(F.sin(F.radians(deg))).alias("sin_v"),
        r4(F.cos(F.radians(deg))).alias("cos_v"),
        r4(F.atan2(F.col("p_size").cast("double"), F.lit(10.0))).alias("atan2_v"),
        r4(F.asin(F.col("p_size") / 100.0)).alias("asin_v"),
        r4(F.degrees(F.atan(F.lit(1.0)))).alias("deg45"),
    )


@register(
    "agg_cov_exact",
    oracle="""
    WITH b AS (SELECT l_suppkey,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
               FROM lineitem)
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(q * cents) AS BIGINT) AS sum_qc,
           CAST(count(*) * sum(q * cents) - sum(q) * sum(cents) AS BIGINT)
               AS cov_num
    FROM b GROUP BY l_suppkey
    """,
)
def agg_cov_exact(spark, sf_dir):
    """Exact covariance numerator per supplier: n*sum(xy) - sum(x)*sum(y)
    over (quantity, extendedprice-cents) — all-BIGINT, so the statistic is
    bit-identical regardless of partitioning or summation order, unlike
    covar_pop/corr builtins whose float accumulation is order-dependent at
    scale.  cov = cov_num / n^2 (and corr's sqrt) are one deterministic
    float op downstream of the exact integers.

    One hash aggregate with map-side partial sums — the shuffle carries
    five longs per supplier.  Overflow bound: n * sum_qc stays under 2^63
    while a group holds < ~1e5 rows of (<=50-unit, <=1e7-cent) items; past
    that, promote the three product sums to DECIMAL(38,0) — this op is the
    single switch point, exactly like util.dsum."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("sum_q"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.col("q") * F.col("cents")).alias("sum_qc"),
        )
        .select(
            "l_suppkey",
            "n",
            "sum_q",
            "sum_cents",
            "sum_qc",
            (F.col("n") * F.col("sum_qc") - F.col("sum_q") * F.col("sum_cents"))
            .cast("long")
            .alias("cov_num"),
        )
    )


@register(
    "agg_corr_spearman",
    oracle="""
    WITH b AS (SELECT DISTINCT l_suppkey,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
               FROM lineitem),
         r AS (SELECT l_suppkey,
                      row_number() OVER (PARTITION BY l_suppkey
                                         ORDER BY q, cents) AS rx,
                      row_number() OVER (PARTITION BY l_suppkey
                                         ORDER BY cents, q) AS ry
               FROM b)
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
           CAST(1000000 - 6000000 * sum((rx - ry) * (rx - ry))
                // (count(*) * (count(*) * count(*) - 1)) AS BIGINT) AS rho_e6
    FROM r GROUP BY l_suppkey HAVING count(*) >= 2
    """,
)
def agg_corr_spearman(spark, sf_dir):
    """Spearman rank correlation per supplier over (quantity, price),
    ties-collapsed: ranks are computed over DISTINCT (q, cents) pairs so
    both rank orders are strict total orders — with duplicate rows, the
    rank pairing inside a tie block is engine-arbitrary and sum(d^2)
    would be nondeterministic (determinism rule 6 taken one step
    further).  rho = 1 - 6*sum(d^2) / (n(n^2-1)), emitted e6-scaled via
    pure BIGINT arithmetic (rule 7) — float covariance-based corr() is
    order-dependent at scale, this never is.  Overflow: 6e6 * sum_d2 <
    2^63 holds while a group has < ~65k distinct pairs; past that this
    expression is the DECIMAL(38,0) switch point.

    Shape at scale: dedup + two windows all shuffle ONCE on l_suppkey —
    the explicit repartition on the group key satisfies the clustered
    distribution of the distinct-aggregate (whose keys are a superset)
    AND of both windows, so Catalyst inserts no further exchange
    (pinned by test_plans).  This trades the dedup's map-side combine
    for one fewer full shuffle — the right trade when most pairs are
    distinct, as here."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    b = li.repartition("l_suppkey").distinct()
    wx = Window.partitionBy("l_suppkey").orderBy("q", "cents")
    wy = Window.partitionBy("l_suppkey").orderBy("cents", "q")
    r = b.select(
        "l_suppkey",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    return (
        r.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))).alias(
                "sum_d2"
            ),
        )
        .filter(F.col("n") >= 2)
        .select(
            "l_suppkey",
            "n",
            "sum_d2",
            F.expr("CAST(1000000 - 6000000 * sum_d2 div (n * (n * n - 1)) AS BIGINT)")
            .alias("rho_e6"),
        )
    )


@register(
    "fn_redact",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
               AS n_runs,
           md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS redacted_md5
    FROM events
    """,
)
def fn_redact(spark, sf_dir):
    """PII-scrub plumbing: replace every digit run in the event payload
    with a placeholder, count the redactions, and fingerprint the scrubbed
    payload — the shape of an email/phone/ID scrubber (swap the pattern,
    keep the plan).  Pure per-row string kernels inside whole-stage
    codegen: zero shuffles at any scale, the scan's the whole plan.

    Cross-engine traps (rule 8) handled: DuckDB regexp_replace is
    non-global without the 'g' flag (Spark's always is), and Spark
    regexp_extract_all defaults to group 1, so the count uses the whole
    match via extract_all on an unanchored digit-run pattern, explicit
    idx 0."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("redacted"),
        F.expr("CAST(size(regexp_extract_all(props, '[0-9]+', 0)) AS BIGINT)").alias(
            "n_runs"
        ),
        F.md5(F.regexp_replace("props", "[0-9]+", "#")).alias("redacted_md5"),
    )


@register(
    "agg_pareto_half",
    oracle="""
    WITH b AS (SELECT o_orderpriority,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                      o_orderkey
               FROM orders),
         r AS (SELECT o_orderpriority, cents,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY cents DESC, o_orderkey) AS rn,
                      sum(cents) OVER (PARTITION BY o_orderpriority
                                       ORDER BY cents DESC, o_orderkey
                                       ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cents) OVER (PARTITION BY o_orderpriority) AS tot,
                      count(*) OVER (PARTITION BY o_orderpriority) AS n
               FROM b)
    SELECT o_orderpriority,
           CAST(min(n) AS BIGINT) AS n,
           CAST(min(rn) AS BIGINT) AS n_to_half,
           CAST(min(rn) * 1000000 // min(n) AS BIGINT) AS frac_e6
    FROM r WHERE 2 * cum >= tot
    GROUP BY o_orderpriority
    """,
)
def agg_pareto_half(spark, sf_dir):
    """Revenue-concentration (Pareto) analysis: per order priority, the
    minimum number of orders — taken largest-first — whose cumulative value
    reaches half the group total, and that count as an e6-scaled fraction
    of the group ("the top X% of orders carry 50% of revenue").  The
    50%-crossing test is cross-multiplied integers (2*cum >= tot, rule 7)
    on exact cents; the cumulative window runs under a composite total
    order (cents DESC, key — rule 6).  One window sort per priority
    partition, then an all-rows-past-the-crossing min-aggregate —
    shuffle on the group key only."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cents").desc(), "o_orderkey"
    )
    wp = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cents").over(wp).alias("tot"),
        F.count("*").over(wp).alias("n"),
    )
    return (
        r.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("n").cast("long").alias("n"),
            F.min("rn").cast("long").alias("n_to_half"),
        )
        .select(
            "o_orderpriority",
            "n",
            "n_to_half",
            F.expr("CAST(n_to_half * 1000000 div n AS BIGINT)").alias("frac_e6"),
        )
    )


@register(
    "agg_gini",
    oracle="""
    WITH b AS (SELECT o_orderpriority,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                      o_orderkey
               FROM orders),
         r AS (SELECT o_orderpriority, cents,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY cents, o_orderkey) AS rn
               FROM b)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST((2 * sum(rn * cents) - (count(*) + 1) * sum(cents))
                // (count(*) * sum(cents) // 1000000) AS BIGINT) AS gini_e6
    FROM r GROUP BY o_orderpriority
    HAVING count(*) * sum(cents) >= 1000000
    """,
)
def agg_gini(spark, sf_dir):
    """Gini coefficient of order value per priority, in exact integer
    arithmetic: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x
    ascending under a composite total order.  Emitted e6-scaled with the
    DENOMINATOR pre-divided by 1e6 (numerator * 1e6 would overflow int64
    once n*sum(x) passes ~9e12 cents — pre-dividing keeps every
    intermediate in range at the cost of a bounded 1e-6 relative grain,
    identically in both engines; the HAVING guard excludes groups too
    small to scale).  One window rank per group + one hash aggregate —
    the same single-exchange shape as agg_corr_spearman."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    r = o.select("o_orderpriority", "cents", F.row_number().over(w).alias("rn"))
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.col("rn") * F.col("cents")).alias("sum_rc"),
        )
        .filter(F.col("n") * F.col("sum_cents") >= 1000000)
        .select(
            "o_orderpriority",
            "n",
            "sum_cents",
            F.expr(
                "CAST((2 * sum_rc - (n + 1) * sum_cents)"
                " div (n * sum_cents div 1000000) AS BIGINT)"
            ).alias("gini_e6"),
        )
    )


@register(
    "sql_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    """,
)
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT (Spark 4 lateral
    join support) — per-customer best order expressed as the SQL a
    warehouse user would actually write.  Catalyst decorrelates the
    lateral into a window/aggregate join (same physical shape as
    win_topk_per_group, §4 free-optimizer behavior); DuckDB executes the
    byte-identical statement, so the decorrelation is value-checked.
    Customers with no orders drop out (inner lateral), matching DuckDB."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        """
    )


@register(
    "sql_lateral_explode",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                  FROM documents WHERE doc_id < 20),
    pos AS (SELECT doc_id, unnest(range(len(tk))) AS pos, tk FROM toks)
    SELECT doc_id, CAST(pos AS INT) AS pos, tk[pos + 1] AS tok
    FROM pos
    """,
)
def sql_lateral_explode(spark, sf_dir):
    """LATERAL VIEW posexplode via the SQL entry point — the HiveQL-lineage
    table-generating surface (the SQL twin of the DataFrame explode used
    throughout the LLM ops).  Position indexes are value-checked against
    DuckDB's unnest-with-range formulation."""
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT doc_id, pos, tok
        FROM documents
        LATERAL VIEW posexplode(split(lower(text), ' ')) t AS pos, tok
        WHERE doc_id < 20
        """
    )


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS et, value
      FROM events)
    SELECT lower(et) AS event_type_ci, count(*) AS n,
           CAST(sum(CASE WHEN lower(et) = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click_ci
    FROM mixed GROUP BY lower(et)
    """,
)
def fn_collation(spark, sf_dir):
    """Spark 4 collations: group and compare case-insensitively via the
    UTF8_LCASE collation instead of wrapping every expression in lower().
    The mixed-case column is derived deterministically (even event_ids are
    uppercased); grouping on `collate(et, 'UTF8_LCASE')` merges case
    variants engine-side, and the emitted key is normalized with lower()
    because a collated group's representative value is whichever variant
    the engine saw first — never emit the raw representative across
    engines.  DuckDB oracles the same semantics through explicit lower()."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et")
    )
    ci = F.collate(F.col("et"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("et_ci"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(ci == F.lit("click"), 1).otherwise(0)
            ).alias("n_click_ci"),
        )
        .select(
            F.lower(F.col("et_ci").cast("string")).alias("event_type_ci"),
            "n",
            "n_click_ci",
        )
    )


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT doc_id,
                      CASE WHEN doc_id % 7 = 0 THEN NULL
                           ELSE doc_id % 50 END AS k
               FROM documents),
    b AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN NULL
                              ELSE doc_id % 50 END AS k
          FROM documents),
    j AS (SELECT a.k FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k)
    SELECT coalesce(CAST(k AS VARCHAR), '<null>') AS k, count(*) AS n_pairs
    FROM j GROUP BY 1
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — required for dimension
    keys where NULL is a real category (unknown source, unattributed).
    Spark plans `eqNullSafe` as an ordinary hash-partitioned equi join
    (null-safe equality is still a deterministic hash key), so the shape
    is scale-safe; the caveat at 100 TB is that ALL nulls land in ONE
    hash bucket — a known skew hazard, which is why the skew toolkit
    (join_salted_skew, AQE skew split) exists alongside."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("doc_id") % 50)
        .alias("k")
    )
    b = d.select(
        F.when(F.col("doc_id") % 11 == 0, None)
        .otherwise(F.col("doc_id") % 50)
        .alias("kb")
    )
    j = a.join(b, F.col("k").eqNullSafe(F.col("kb")))
    return j.groupBy("k").agg(F.count("*").alias("n_pairs")).select(
        F.coalesce(F.col("k").cast("string"), F.lit("<null>")).alias("k"),
        "n_pairs",
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark, sf_dir):
    """GROUPING()/grouping_id over a cube: the bitmask that tells total
    rows apart from genuine NULL group keys — without it a cube over a
    nullable column is ambiguous.  Emitted as grouping(status)*2 +
    grouping(priority) so Spark's grouping_id bit order is value-checked
    against DuckDB's per-column grouping() bits."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("bigint").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
        )
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE o_orderkey // (o_orderkey % 10) END AS safe_div,
           CASE WHEN o_orderkey > 9223372036854775807 - 1000000
                THEN NULL ELSE o_orderkey + 1000000 END AS safe_add,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(o_orderkey AS VARCHAR) END AS parsed
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_try_arithmetic(spark, sf_dir):
    """ANSI-safe arithmetic (Spark 4 runs ANSI mode by default, where
    division by zero and overflow THROW): try_divide / try_add / try_cast
    return NULL instead of failing the job — the difference between one
    bad row poisoning a 100 TB pipeline stage and a NULL you can audit.
    The oracle states the NULL-producing conditions explicitly (DuckDB has
    no try_* family), so the try-semantics are value-checked: %10==0 rows
    divide by zero -> NULL, and a deliberately un-castable string -> NULL.
    (try_divide performs TRUE division to double; the bigint cast truncates
    toward zero, which equals the oracle's floor division because every
    operand here is non-negative.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_orderkey"), F.col("o_orderkey") % 10)
        .cast("bigint")
        .alias("safe_div"),
        F.try_add(F.col("o_orderkey"), F.lit(1000000)).alias("safe_add"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, "not-a-number").otherwise(
                F.col("o_orderkey").cast("string")
            ),
            F.lit("999999999"),
        )
        .cast("bigint")
        .cast("string")
        .alias("parsed"),
    )


@register(
    "agg_bool_family",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bool_family(spark, sf_dir):
    """Boolean/conditional aggregate family: count_if, every (bool_and),
    some (bool_or), plus a DETERMINISTIC stand-in for any_value — min by
    key — because raw any_value/first are partition-order-dependent and
    banned by determinism rule 4; emitting min instead makes the 'pick a
    representative' pattern value-checkable.  All are single-pass partial
    aggregates (map-side combine)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.min("o_orderkey").alias("first_key"),
    )
