"""§2.I — scalar function families (string/date/math/array/map/json/null/
cond/cast/hash/sample).

One registry entry per family, each projecting many functions at once over a
deterministic slice.  All JVM-side builtins inside whole-stage codegen — no
Python in any of these paths.  Cross-engine gotchas handled here:

* Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday -> +1 in oracle.
* DuckDB date_trunc on timestamps returns DATE for day+ granularities ->
  cast both sides to DATE.
* DuckDB CAST(double AS INT) rounds, Spark truncates -> floor() first.
* MAP subscript returns a LIST in DuckDB -> map ops emit scalars only.
* transcendentals (ln/exp/corr/...) can differ in the last ulp across libm
  implementations -> every float output is round(,4) (SURVEY.md §7.3.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import arr_str, dsum, fan_out, r4, sql_arr_str


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lo, upper(p_brand) AS up,
           trim(concat('  ', p_name, ' ')) AS trimmed,
           substr(p_name, 2, 3) AS sub,
           length(p_name) AS ln,
           concat_ws('|', p_brand, p_type) AS cw,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           translate(p_name, 'aeiou', 'AEIOU') AS tr,
           levenshtein(p_name, 'small ring') AS lev
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 3).alias("sub"),
        F.length("p_name").alias("ln"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
        F.levenshtein("p_name", F.lit("small ring")).alias("lev"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since,
           CAST(floor(epoch(o_orderdate + INTERVAL 1 HOUR)) AS BIGINT) AS next_hour_epoch,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dow"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        ((F.year(d) - 1995) * 12 + F.month(d) - 1).alias("months_since"),
        F.unix_timestamp(d + F.expr("INTERVAL 1 HOUR")).alias("next_hour_epoch"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           round(abs(l_quantity - 25.0), 4) AS ab,
           round(l_extendedprice, 0) AS rnd0,
           CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
           CAST(floor(l_tax * 100) AS BIGINT) AS fl,
           round(sqrt(l_quantity), 4) AS sq,
           round(pow(l_discount + 1.0, 2), 4) AS pw,
           round(exp(l_tax), 4) AS ex,
           round(ln(l_extendedprice), 4) AS lg,
           round(log10(l_extendedprice), 4) AS lg10,
           l_orderkey % 7 AS md,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sg,
           round(greatest(l_quantity, l_tax * 500), 4) AS gr,
           round(least(l_quantity, l_tax * 500), 4) AS le
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    # fan_out (optimization r14, guide §2.5): 15 math projections per row
    # over a 3-split scan; measured 1.41 s -> 0.93 s warm at sf0.1.
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    q, ep, dc, tx = (F.col(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        r4(F.abs(q - 25.0)).alias("ab"),
        F.round(ep, 0).alias("rnd0"),
        F.ceil(dc * 100).alias("ce"),
        F.floor(tx * 100).alias("fl"),
        r4(F.sqrt(q)).alias("sq"),
        r4(F.pow(dc + 1.0, 2)).alias("pw"),
        r4(F.exp(tx)).alias("ex"),
        r4(F.log(ep)).alias("lg"),
        r4(F.log10(ep)).alias("lg10"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.signum(q - 25.0).alias("sg"),
        # NOT ep/1000: 2-decimal prices / 1000 land exactly on .xxxx5 —
        # Spark (HALF_UP on decimal digits) and DuckDB (double math) round
        # those boundaries differently.  tax*500 keeps values off-boundary.
        r4(F.greatest(q, tx * 500)).alias("gr"),
        r4(F.least(q, tx * 500)).alias("le"),
    )


@register(
    "fn_array",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS a FROM embeddings WHERE vec_id < 50)
    SELECT vec_id,
           len(a) AS n,
           {sql_arr_str("list_transform(a[1:8], x -> round(x, 4))", "%.4f")} AS first8,
           round(CAST(list_aggregate(a, 'sum') AS DOUBLE), 4) + 0 AS s_sum,
           round(CAST(list_aggregate(a, 'max') AS DOUBLE), 4) + 0 AS mx,
           round(CAST(list_aggregate(a, 'min') AS DOUBLE), 4) + 0 AS mn,
           {sql_arr_str("list_sort(list_transform(a[1:8], x -> round(x, 4)))", "%.4f")} AS sorted8,
           {sql_arr_str("list_transform(flatten([a[1:2], a[3:4]]), x -> round(x, 4))", "%.4f")} AS flat4,
           {sql_arr_str("list_sort(list_distinct(list_transform(a[1:8], x -> round(x, 2))))", "%.4f")} AS dist8,
           round(CAST(list_aggregate(list_transform(a, x -> x * 2), 'sum') AS DOUBLE), 4) + 0 AS zsum,
           list_contains(list_transform(a[1:8], x -> round(x, 4)), round(a[1], 4)) AS has_first
    FROM e
    """,
)
def fn_array(spark, sf_dir):
    """Array/higher-order functions (size, slice, transform, aggregate-fold,
    flatten, distinct, sort, zip_with, contains) over the embedding column.
    The fold seeds with lit(0.0D) so all math stays in double."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rounded8 = F.transform(F.slice(a, 1, 8), lambda x: F.round(x, 4))
    return e.select(
        "vec_id",
        F.size(a).alias("n"),
        arr_str(rounded8, "%.4f").alias("first8"),
        r4(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)).alias("s_sum"),
        r4(F.array_max(a)).alias("mx"),
        r4(F.array_min(a)).alias("mn"),
        arr_str(F.sort_array(rounded8), "%.4f").alias("sorted8"),
        arr_str(
            F.transform(
                F.flatten(F.array(F.slice(a, 1, 2), F.slice(a, 3, 2))),
                lambda x: F.round(x, 4),
            ),
            "%.4f",
        ).alias("flat4"),
        arr_str(
            F.sort_array(
                F.array_distinct(F.transform(F.slice(a, 1, 8), lambda x: F.round(x, 2)))
            ),
            "%.4f",
        ).alias("dist8"),
        r4(
            F.aggregate(
                F.zip_with(a, a, lambda x, y: x + y), F.lit(0.0), lambda acc, x: acc + x
            )
        ).alias("zsum"),
        F.array_contains(rounded8, F.round(F.element_at(a, 1), 4)).alias("has_first"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_v,
           CAST(user_id AS VARCHAR) AS uid_v,
           2 AS n_keys,
           'type|uid' AS keys_sorted,
           1 AS entry_v
    FROM events WHERE event_id < 1000
    """,
)
def fn_map(spark, sf_dir):
    """MapType surface: create_map / map_keys / map_values / element_at /
    map_from_entries.  Outputs are scalars because DuckDB MAP subscripts
    return lists — the oracle recomputes the values relationally."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    ent = F.map_from_entries(F.array(F.struct(F.lit("a").alias("k"), F.lit(1).alias("v"))))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_v"),
        F.element_at(m, "uid").alias("uid_v"),
        F.size(m).alias("n_keys"),
        F.concat_ws("|", F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(ent, "a").alias("entry_v"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k
    FROM events GROUP BY event_type
    """,
)
def fn_json(spark, sf_dir):
    """JSON extraction over events.props (bench `q_json_extract`) via
    schema-directed from_json — a single parse in the hot path.  (The
    get_json_object path-extraction twin is covered by
    tests/test_json_paths.py, not here: double-parsing the same column
    costs ~2x at scale.)"""
    # fan_out (optimization r14, guide §2.5 + §4 "per-task work"): from_json
    # is CodegenFallback (interpreted, one Jackson parse per row) and the
    # single-row-group events scan ran the whole parse on ONE core.
    # Hash-spread on event_id (unique -> even spread, no round-robin
    # pre-sort) parallelizes the parse across the session's cores —
    # measured 0.40 s -> 0.20 s warm at sf0.1 (round-robin only reached
    # 0.29 s); the groupBy aggregate is order-insensitive (int sums in
    # double are exact), so output is bit-identical.
    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    k = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            r4(F.avg("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
        )
    )


@register(
    "fn_null",
    oracle="""
    SELECT coalesce(nullif(event_type, 'error'), 'none') AS filled,
           count(*) AS n,
           round(sum(CASE WHEN value > 300 THEN -1.0 ELSE value END), 4) + 0 AS sum_val,
           CAST(sum(CASE WHEN nullif(event_type, 'error') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_was_null
    FROM events GROUP BY 1
    """,
)
def fn_null(spark, sf_dir):
    """coalesce/nullif/fillna/dropna: nulls are manufactured with nullif,
    repaired with coalesce and DataFrameNaFunctions.fill."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("maybe", F.nullif(F.col("event_type"), F.lit("error")))
    ev = ev.withColumn(
        "value_capped", F.when(F.col("value") > 300, None).otherwise(F.col("value"))
    ).na.fill({"value_capped": -1.0})
    return ev.groupBy(
        F.coalesce(F.col("maybe"), F.lit("none")).alias("filled")
    ).agg(
        F.count("*").alias("n"),
        r4(F.sum("value_capped")).alias("sum_val"),
        F.sum(F.when(F.col("maybe").isNull(), 1).otherwise(0)).alias("n_was_null"),
    )


@register(
    "fn_cond",
    oracle="""
    SELECT CASE WHEN o_totalprice > 400000 THEN 'high'
                WHEN o_totalprice > 200000 THEN 'mid'
                ELSE 'low' END AS tier,
           CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS state,
           count(*) AS n, CAST(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_price
    FROM orders GROUP BY 1, 2
    """,
)
def fn_cond(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 200000, "mid")
        .otherwise("low")
    )
    state = F.expr("if(o_orderstatus = 'F', 'final', 'open')")
    return o.groupBy(tier.alias("tier"), state.alias("state")).agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS s2i,
           CAST(floor(o_totalprice) AS BIGINT) AS d2l,
           CAST(o_orderdate AS DATE) AS ts2d,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d2s,
           CAST('3.5' AS DOUBLE) + 1 AS s2d,
           CAST(o_custkey AS VARCHAR) AS i2s,
           CAST(floor(epoch(CAST('1995-06-01 12:00:00' AS TIMESTAMP))) AS BIGINT) AS s2ts_epoch
    FROM orders
    """,
)
def fn_cast(spark, sf_dir):
    """Cast matrix (string<->num<->ts).  double->int goes through floor()
    because DuckDB rounds while Spark truncates; double->string is excluded
    (engine-specific formatting)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").cast("long").alias("s2i"),
        F.floor("o_totalprice").cast("long").alias("d2l"),
        F.col("o_orderdate").cast("date").alias("ts2d"),
        F.col("o_orderdate").cast("date").cast("string").alias("d2s"),
        (F.lit("3.5").cast("double") + 1).alias("s2d"),
        F.col("o_custkey").cast("string").alias("i2s"),
        F.unix_timestamp(F.lit("1995-06-01 12:00:00").cast("timestamp")).alias(
            "s2ts_epoch"
        ),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           length(md5(p_name)) AS md5_len
    FROM part
    """,
)
def fn_hash(spark, sf_dir):
    """md5 / sha2 — byte-identical across Spark and DuckDB (verified,
    SURVEY.md §7.4.8).  xxhash64/crc32 exist Spark-side but have no DuckDB
    twin, so they stay out of the scored projection."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.length(F.md5("p_name")).alias("md5_len"),
    )


@register("fn_sample")  # RNG streams are engine-specific -> rows-only check
def fn_sample(spark, sf_dir):
    """Seeded Bernoulli sample — deterministic within Spark (seed=42) but the
    RNG stream is not portable across engines, hence no oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.sample(fraction=0.1, seed=42).select("event_id", "event_type")


@register(
    "fn_ip_subnet",
    oracle="""
    WITH ips AS (
      SELECT event_id,
             CAST(('0x' || substr(md5('ip' || CAST(event_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 4294967296 AS ip32
      FROM events WHERE event_id < 4000),
    parts AS (
      SELECT event_id, ip32,
             ip32 // 16777216 AS o1,
             (ip32 // 65536) % 256 AS o2,
             (ip32 // 256) % 256 AS o3,
             ip32 % 256 AS o4
      FROM ips),
    tagged AS (
      SELECT CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.0.0/16'
               AS subnet16,
             CASE WHEN o1 = 10
                    OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                    OR (o1 = 192 AND o2 = 168)
                  THEN 1 ELSE 0 END AS is_private,
             ip32
      FROM parts)
    SELECT subnet16,
           CAST(count(*) AS BIGINT) AS n_ips,
           CAST(max(is_private) AS BIGINT) AS is_private,
           CAST(min(ip32) AS BIGINT) AS lo_ip32,
           CAST(max(ip32) AS BIGINT) AS hi_ip32
    FROM tagged GROUP BY subnet16
    HAVING count(*) >= 2
    """,
)
def fn_ip_subnet(spark, sf_dir):
    """IPv4 parsing + CIDR /16 rollup with RFC-1918 private-range
    tagging — the log-analytics address kernel (abuse clustering, NAT
    detection, geo prefix joins all start by bucketing addresses into
    prefixes).  Synthetic 32-bit addresses derive from the portable
    hash; octet extraction is pure integer div/mod (no string parsing of
    dotted quads — the integer form is both the storage-efficient
    representation at 100 TB and the only one range predicates push down
    on), and the /16 prefix key is a plain projection, so the rollup is
    the standard hash-aggregate shuffle on the prefix."""
    ips = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 4000)
        .select(
            "event_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ip"), F.col("event_id").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 4294967296
            ).alias("ip32"),
        )
    )
    o1 = F.expr("ip32 div 16777216")
    o2 = F.expr("(ip32 div 65536) % 256")
    subnet16 = F.concat(
        o1.cast("string"), F.lit("."), o2.cast("string"), F.lit(".0.0/16")
    )
    is_private = (
        F.when(
            (o1 == 10)
            | ((o1 == 172) & o2.between(16, 31))
            | ((o1 == 192) & (o2 == 168)),
            1,
        ).otherwise(0)
    )
    return (
        ips.select(subnet16.alias("subnet16"), is_private.alias("is_private"), "ip32")
        .groupBy("subnet16")
        .agg(
            F.count("*").alias("n_ips"),
            F.max("is_private").alias("is_private"),
            F.min("ip32").alias("lo_ip32"),
            F.max("ip32").alias("hi_ip32"),
        )
        .filter(F.col("n_ips") >= 2)
    )
