"""§2.D — joins.

All equi/outer/semi/anti/cross joins are native Catalyst (AQE picks
broadcast vs sort-merge at runtime; `join_broadcast` pins the hint for the
small-dim star case).  The one genuinely custom operator is `join_asof` —
Spark has no native as-of join, so it is rewritten as a union-tag + window
`last(ignorenulls)` scan: O(n log n) with a single shuffle on the partition
key, no range explosion, which is the formulation that survives 100 TB
(the naive approach — inequality join + row_number — explodes quadratically
per key).  The DuckDB oracle uses an independent formulation (left join +
row_number) so the two implementations cross-check each other.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import dsum, fan_out, lineage_cap, r4, revenue_sum


@register(
    "join_inner_eq",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'P'
    """,
)
def join_inner_eq(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@register(
    "join_left_right_full",
    oracle="""
    WITH big AS (SELECT * FROM orders WHERE o_totalprice > 450000),
         few AS (SELECT * FROM customer WHERE c_custkey % 10 = 0)
    SELECT 'L' AS jt, c_custkey, o_orderkey
      FROM customer LEFT JOIN big ON c_custkey = o_custkey
    UNION ALL
    SELECT 'R' AS jt, c_custkey, o_orderkey
      FROM few RIGHT JOIN orders ON c_custkey = o_custkey
    UNION ALL
    SELECT 'F' AS jt, c_custkey, o_orderkey
      FROM few FULL JOIN big ON c_custkey = o_custkey
    """,
)
def join_left_right_full(spark, sf_dir):
    """left / right / full outer joins in one tagged output (each branch has
    guaranteed unmatched rows on the relevant side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 450000)
    few = c.filter(F.col("c_custkey") % 10 == 0)
    cols = [F.col("c_custkey"), F.col("o_orderkey")]
    left = c.join(big, c.c_custkey == big.o_custkey, "left").select(
        F.lit("L").alias("jt"), *cols
    )
    right = few.join(o, few.c_custkey == o.o_custkey, "right").select(
        F.lit("R").alias("jt"), *cols
    )
    full = few.join(big, few.c_custkey == big.o_custkey, "full").select(
        F.lit("F").alias("jt"), *cols
    )
    return left.unionByName(right).unionByName(full)


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "join_broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_cust, CAST(round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark, sf_dir):
    """Small-dim broadcast: region/nation are tiny at any scale factor — the
    broadcast hint eliminates both shuffles of the fact side (plan-invisible
    to the oracle, identical results)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("sum_bal"))
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_range",
    oracle="""
    SELECT o1.o_custkey AS o_custkey, count(*) AS n_pairs
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o1.o_orderkey < o2.o_orderkey
     AND o2.o_orderdate >= o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_custkey
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi range join: order pairs of the same customer within 30 days.
    The equi component (custkey) keeps it a shuffled hash/SMJ join with a
    residual range predicate — no nested-loop explosion at scale."""
    o = load_table(spark, sf_dir, "orders")
    o1 = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = o.select(
        F.col("o_custkey").alias("ck2"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    pairs = o1.join(
        o2,
        (F.col("ck") == F.col("ck2"))
        & (F.col("k1") < F.col("k2"))
        & (F.col("d2") >= F.col("d1"))
        & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 30 DAY")),
    )
    return pairs.groupBy(F.col("ck").alias("o_custkey")).agg(
        F.count("*").alias("n_pairs")
    )


@register(
    "join_multiway_star",
    oracle="""
    SELECT r_name, n_name,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway_star(spark, sf_dir):
    """5-table star join + aggregate (the flagship / bench `q_join_agg`).
    Dims are broadcast; the fact-side join chain shuffles once on each fact
    key; AQE handles skew/coalescing."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # fan_out on the join key (optimization r14, guide §2.5 input-skew
    # remedy): the fact parquet is a single row group, so the whole
    # broadcast-join + partial-aggregate codegen span otherwise executes
    # as ONE task on one core.  Hash-spread on l_orderkey (a column the
    # query already reads; no round-robin pre-sort) lets the four hash
    # probes + partial agg use every core — measured 0.70 s -> 0.54 s
    # warm at sf0.1; size-gated, so at real scale (multi-split fact) it
    # is the identity.  Joins and the integer-cents revenue sum are
    # order-insensitive -> bit-identical output.
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(revenue_sum().alias("revenue"), F.count("*").alias("n"))
    )


@register(
    "join_topk_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
)
def join_topk_revenue(spark, sf_dir):
    """TPC-H Q10-style: join + groupBy + global top-10 (bench `q_topk`).
    Ties broken by custkey; the ORDER BY key is the *rounded* revenue so
    both engines rank identical doubles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # No fan_out here (optimization r14, measured): after the returnflag
    # filter only ~150k rows reach the two broadcast probes + partial agg,
    # and the repartition's shuffle of those raw rows costs as much as it
    # saves (baseline 0.44 s vs 0.53 s round-robin / 0.44 s hash at
    # sf0.1) — the single-task span is already near the per-query floor.
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(revenue_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


@register(
    "join_asof",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT e.event_id AS event_id, p.ts AS pts, p.event_id AS peid,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST
             ) AS rn
      FROM events e LEFT JOIN p
        ON e.user_id = p.user_id
       AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
    )
    SELECT event_id,
           CAST(floor(epoch(pts)) AS BIGINT) AS prev_purchase_epoch,
           peid AS prev_purchase_eid
    FROM j WHERE rn = 1
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: for every event, the latest 'purchase' event of the same
    user strictly before it (tie rule: (ts, event_id) lexicographic —
    SURVEY.md §7.3.4).

    Spark rewrite: union-tag + running `last(ignorenulls)` window — one
    shuffle on user_id, linear state, no quadratic pair blow-up.  Probe rows
    sort before purchase-copies at identical (ts, event_id) so the frame
    (unbounded, -1) enforces strict precedence.  The DuckDB oracle is an
    independent inequality-join + row_number formulation.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    probes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_eid"),
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(1).alias("tag"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_eid"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "tag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = probes.unionByName(purchases)
    return (
        tagged.withColumn("prev_ts", F.last("p_ts", ignorenulls=True).over(w))
        .withColumn("prev_eid", F.last("p_eid", ignorenulls=True).over(w))
        .filter(F.col("tag") == 0)
        .select(
            "event_id",
            F.unix_timestamp("prev_ts").alias("prev_purchase_epoch"),
            F.col("prev_eid").alias("prev_purchase_eid"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT e.event_id AS event_id, p.ts AS pts, p.event_id AS peid,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST
             ) AS rn
      FROM events e LEFT JOIN p
        ON e.user_id = p.user_id
       AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
    )
    SELECT event_id,
           CAST(floor(epoch(pts)) AS BIGINT) AS next_purchase_epoch,
           peid AS next_purchase_eid
    FROM j WHERE rn = 1
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join: for every event, the EARLIEST 'purchase' of the
    same user strictly after it — the mirror of `join_asof`, same
    linear-state union-tag + window rewrite (one shuffle on user_id, no
    pair explosion).  Here purchase copies sort BEFORE probes at identical
    (ts, event_id) (tag 0 vs 1) so the (+1, unbounded) frame sees only
    strictly-later purchases — a purchase event never matches itself."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    probes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_eid"),
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("tag"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_eid"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "tag")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    tagged = probes.unionByName(purchases)
    return (
        tagged.withColumn("next_ts", F.first("p_ts", ignorenulls=True).over(w))
        .withColumn("next_eid", F.first("p_eid", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            F.unix_timestamp("next_ts").alias("next_purchase_epoch"),
            F.col("next_eid").alias("next_purchase_eid"),
        )
    )


_GEO_BOX = 100000  # coordinate space [0, 1e5)^2, integer micro-units
_GEO_R = 1500  # neighbor radius; cell size = R so 3x3 cells cover the disk


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             CAST(('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_GEO_BOX} AS x,
             CAST(('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_GEO_BOX} AS y
      FROM customer),
    probe AS (SELECT * FROM pts WHERE k % 37 = 0),
    hits AS (
      SELECT p.k, q.k AS nk,
             (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
      FROM probe p JOIN pts q
        ON q.x // {_GEO_R} BETWEEN p.x // {_GEO_R} - 1 AND p.x // {_GEO_R} + 1
       AND q.y // {_GEO_R} BETWEEN p.y // {_GEO_R} - 1 AND p.y // {_GEO_R} + 1
       AND q.k <> p.k
      WHERE (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
            <= {_GEO_R} * {_GEO_R})
    SELECT p.k AS probe_key,
           CAST(count(h.nk) AS BIGINT) AS n_neighbors,
           CAST(min(h.d2) AS BIGINT) AS nearest_d2
    FROM probe p LEFT JOIN hits h ON h.k = p.k
    GROUP BY p.k
    """,
)
def join_spatial_grid(spark, sf_dir):
    """Fixed-radius spatial neighbor join on a uniform grid -- the
    geo/embedding-2d primitive (points within R of each probe).  A naive
    radius join is a cross product; gridding makes it an EQUI-join:
    every point maps to its R-sized cell, each probe explodes to the 3x3
    cell block covering its disk, the join runs hash-wise on the cell
    key, and the exact integer distance (dx^2 + dy^2 <= R^2, coordinates
    are integer micro-units from the portable hash, so zero float
    anywhere) survives as a residual filter.

    Plan shape: probe side x9 map-side explode, one shuffle on the cell
    key, per-cell candidate products track true point density (uniform
    here, ~1 neighbor per probe) -- the same owner-cell family as
    join_interval_overlap, in 2 dimensions.  At 100 TB with skewed point
    density the cell key is exactly the salt-able shuffle key."""
    def coord(axis: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(axis), F.col("c_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _GEO_BOX
        )

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), coord("x").alias("x"), coord("y").alias("y")
    )
    pts = pts.transform(lineage_cap)  # feeds corpus + probe branches
    corpus = pts.select(
        F.col("k").alias("nk"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        (F.col("x") / _GEO_R).cast("long").alias("cx"),
        (F.col("y") / _GEO_R).cast("long").alias("cy"),
    )
    probe = (
        pts.filter(F.col("k") % 37 == 0)
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "k",
            "x",
            "y",
            ((F.col("x") / _GEO_R).cast("long") + F.col("dx")).alias("cx"),
            ((F.col("y") / _GEO_R).cast("long") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")) + (
        F.col("y") - F.col("qy")
    ) * (F.col("y") - F.col("qy"))
    hits = (
        probe.join(corpus, ["cx", "cy"])
        .filter((F.col("nk") != F.col("k")) & (d2 <= _GEO_R * _GEO_R))
        .select("k", d2.alias("d2"))
    )
    base = pts.filter(F.col("k") % 37 == 0).select(F.col("k").alias("probe_key"))
    agg = hits.groupBy(F.col("k").alias("probe_key")).agg(
        F.count("*").alias("n_neighbors"), F.min("d2").alias("nearest_d2")
    )
    return base.join(agg, "probe_key", "left").select(
        "probe_key",
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        F.col("nearest_d2"),
    )


_QK_LEVEL = 8  # quadkey depth; 2^8 x 2^8 leaf grid over the point box


def _qk_digit_sql(gx: str, gy: str, i: int) -> str:
    """Quadkey digit i (1-based from the MSB) without bit operators:
    2*bit_y + bit_x extracted via integer div/mod powers of two."""
    sh = _QK_LEVEL - i
    return f"(2 * (({gy} // {1 << sh}) % 2) + (({gx} // {1 << sh}) % 2))"


@register(
    "fn_quadkey_rollup",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             CAST(('0x' || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_GEO_BOX} AS x,
             CAST(('0x' || substr(md5('y' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_GEO_BOX} AS y
      FROM customer),
    g AS (
      SELECT k, x * 256 // {_GEO_BOX} AS gx, y * 256 // {_GEO_BOX} AS gy
      FROM pts),
    qk AS (
      SELECT k,
             {" || ".join(f"CAST({_qk_digit_sql('gx', 'gy', i)} AS VARCHAR)" for i in range(1, _QK_LEVEL + 1))}
               AS qk8
      FROM g)
    SELECT substr(qk8, 1, 4) AS qk4,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT qk8) AS BIGINT) AS n_cells8
    FROM qk GROUP BY qk4
    """,
)
def fn_quadkey_rollup(spark, sf_dir):
    """Hierarchical spatial indexing via quadkeys (the Bing-tile / S2 /
    H3 cell-id family): every point encodes to a level-8 quadkey by
    bit-interleaving its grid coordinates, and because a quadkey's
    PREFIX is its ancestor cell, zoom-out rollups are plain string
    prefix aggregations -- no geometry at query time.

    The bit interleave uses only integer div/mod by powers of two
    (portable -- no engine bit-operator quirks), coordinates come from
    the hash idiom, and the output counts points and occupied leaf cells
    per level-4 ancestor.  At 100 TB the quadkey is the storage sort /
    partition key: a viewport or region query becomes a prefix range
    scan, and every zoom level aggregates by truncating the same key --
    the property this op certifies across engines."""
    def coord(axis: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(axis), F.col("c_custkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _GEO_BOX
        )

    g = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (coord("x") * 256 / _GEO_BOX).cast("long").alias("gx"),
        (coord("y") * 256 / _GEO_BOX).cast("long").alias("gy"),
    )
    digits = []
    for i in range(1, _QK_LEVEL + 1):
        sh = 1 << (_QK_LEVEL - i)
        d = (
            2 * ((F.col("gy") / sh).cast("long") % 2)
            + ((F.col("gx") / sh).cast("long") % 2)
        ).cast("string")
        digits.append(d)
    qk = g.select("k", F.concat(*digits).alias("qk8"))
    return qk.groupBy(F.substring("qk8", 1, 4).alias("qk4")).agg(
        F.count("*").alias("n_points"),
        F.countDistinct("qk8").alias("n_cells8"),
    )


@register(
    "join_pit_scd2",
    oracle="""
    WITH hist AS (
      /* 3-version SCD2 history per customer: segment changes at two
         deterministic dates; validity windows tile [0, inf) */
      SELECT c_custkey AS k, v.v AS version,
             CASE v.v WHEN 0 THEN DATE '1990-01-01'
                      WHEN 1 THEN DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER)
                      ELSE DATE '1996-01-01' + CAST(c_custkey % 365 AS INTEGER) END AS valid_from,
             CASE v.v WHEN 0 THEN DATE '1994-01-01' + CAST(c_custkey % 365 AS INTEGER)
                      WHEN 1 THEN DATE '1996-01-01' + CAST(c_custkey % 365 AS INTEGER)
                      ELSE DATE '9999-12-31' END AS valid_to,
             'SEG_' || CAST((c_custkey + v.v) % 5 AS VARCHAR) AS segment
      FROM customer, range(3) v(v)),
    j AS (
      SELECT o.o_orderkey, h.version, h.segment
      FROM orders o JOIN hist h
        ON h.k = o.o_custkey
       AND CAST(o.o_orderdate AS DATE) >= h.valid_from
       AND CAST(o.o_orderdate AS DATE) < h.valid_to)
    SELECT segment, version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM j JOIN orders USING (o_orderkey)
    GROUP BY segment, version
    """,
)
def join_pit_scd2(spark, sf_dir):
    """Point-in-time join against SCD2 dimension history — every fact row
    must see the dimension VERSION that was valid at its event date (the
    correctness rule behind 'which segment was this customer in when
    they ordered'; joining current attributes silently rewrites
    history).  A deterministic 3-version history tiles each customer's
    timeline; facts equi-join on the customer key and the validity
    interval survives as a residual predicate.

    Why this is NOT a scale problem despite the interval predicate: the
    join key is the CUSTOMER KEY, so the hash join is exact on the
    equi part and each probe meets only that key's ≤3 versions — cost is
    |facts|·versions_per_key, linear, no binning needed (contrast
    join_range_binned, where no equi key exists at all).  Every fact
    matches EXACTLY one version (windows tile), which the oracle's
    totals verify — a boundary bug (>= vs >) double-counts or drops
    boundary-date orders and breaks the hash."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    v = spark.range(3).select(F.col("id").cast("int").alias("version"))
    shift = (F.col("k") % 365).cast("int")
    d94 = F.date_add(F.lit("1994-01-01").cast("date"), shift)
    d96 = F.date_add(F.lit("1996-01-01").cast("date"), shift)
    hist = (
        c.crossJoin(F.broadcast(v))
        .select(
            "k",
            "version",
            F.when(F.col("version") == 0, F.lit("1990-01-01").cast("date"))
            .when(F.col("version") == 1, d94)
            .otherwise(d96)
            .alias("valid_from"),
            F.when(F.col("version") == 0, d94)
            .when(F.col("version") == 1, d96)
            .otherwise(F.lit("9999-12-31").cast("date"))
            .alias("valid_to"),
            F.concat(
                F.lit("SEG_"), ((F.col("k") + F.col("version")) % 5).cast("string")
            ).alias("segment"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    j = o.join(hist, "k").filter(
        (F.col("od") >= F.col("valid_from")) & (F.col("od") < F.col("valid_to"))
    )
    return j.groupBy("segment", "version").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
    )
