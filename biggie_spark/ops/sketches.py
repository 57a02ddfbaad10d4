"""Explicit sketch-structure operators: a count-min frequency sketch and a
Bloom membership filter, built AS DATA (counter/bit-position frames) rather
than opaque binary blobs — so the estimate-vs-truth gap is itself a scored,
oracle-checked output.

These complement the built-in sketch surface already covered elsewhere
(`agg_approx_distinct` HLL estimate, `agg_hll_sketch_union` mergeable
DataSketches, `agg_approx_quantile`, `join_runtime_bloom` Spark's runtime
bloom pushdown): here the hash family is the portable md5 idiom, so BOTH
engines construct bit-identical sketches and the driver hash-checks every
counter, estimate, and false-positive count exactly.

Scale design (100 TB):
* Count-min: the corpus folds to a FIXED d×w counter grid (4×512 = 2048
  rows) via one explode + hash aggregate — the whole sketch is O(d·w)
  regardless of corpus size, the textbook guarantee (ε = e/w overestimate
  bound, never underestimate).  Point queries join the probe set against
  the tiny counter frame broadcast-wise; nothing corpus-sized moves.
* Bloom: the member set folds to ≤ m distinct bit positions (m = 4096);
  probes explode to their k = 3 positions and semi-join the bit frame —
  an equi-join on position, broadcast-sized.  False positives are
  EXPECTED and deterministic here (same hash family both engines), so the
  op emits the measured FP count as a scored value — the honesty check a
  real membership service needs before picking m/k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import fan_out, lineage_cap, r4, tokens

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_BLOOM_M = 4096  # bit positions
_BLOOM_K = 3  # hash functions


@register(
    "agg_cms_topk",
    oracle=f"""
    WITH tk AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    truth AS (SELECT tok, count(*) AS true_c FROM tk GROUP BY tok),
    probes AS (
      SELECT tok, true_c FROM truth
      ORDER BY true_c DESC, tok LIMIT 20),
    counters AS (
      SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8))
                     AS BIGINT) % {_CMS_W} AS bucket,
             count(*) AS c
      FROM tk, range({_CMS_D}) t(r)
      GROUP BY r, bucket),
    est AS (
      SELECT p.tok, p.true_c, min(c.c) AS cms_est
      FROM probes p, range({_CMS_D}) t(r)
      JOIN counters c
        ON c.r = t.r
       AND c.bucket = CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' || p.tok),
                                           1, 8)) AS BIGINT) % {_CMS_W}
      GROUP BY p.tok, p.true_c)
    SELECT tok, CAST(true_c AS BIGINT) AS true_c,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM est
    """,
)
def agg_cms_topk(spark, sf_dir):
    """Count-min sketch point queries for the corpus' 20 most frequent
    tokens, reported against exact truth (cms_est ≥ true_c always; the
    gap measures collision pressure at this d×w).

    The sketch is one explode + hash aggregate into a FIXED 4×512 counter
    grid — sketch size is independent of corpus size, which is the whole
    point: at 100 TB the counter frame is still 2048 rows, mergeable
    across partitions/days by element-wise sum.  Estimates join the
    20-row probe frame to the broadcast counter grid (min over the 4
    rows).  The md5 hash family is the portable idiom, so the oracle
    builds the byte-identical sketch and every counter collision
    reproduces exactly."""
    # fan_out (optimization r14, guide §2.5): the explode + 4-row md5
    # counter kernel otherwise runs inside the single-split scan task.
    tk = fan_out(load_table(spark, sf_dir, "documents")).select(
        F.explode(tokens("text")).alias("tok")
    )
    tk = tk.transform(lineage_cap)  # feeds truth + counters
    truth = tk.groupBy("tok").agg(F.count("*").alias("true_c"))
    probes = truth.orderBy(F.col("true_c").desc(), "tok").limit(20)
    rows = F.array(*[F.lit(i) for i in range(_CMS_D)])

    def bucket(r_col, tok_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(r_col.cast("string"), F.lit(":"), tok_col)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    counters = (
        tk.select("tok", F.explode(rows).alias("r"))
        .select("r", bucket(F.col("r"), F.col("tok")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )
    probe_slots = probes.select(
        "tok", "true_c", F.explode(rows).alias("r")
    ).withColumn("bucket", bucket(F.col("r"), F.col("tok")))
    est = (
        probe_slots.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("tok", "true_c")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select("tok", "true_c", "cms_est")


@register(
    "fn_bloom_probe",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderkey % 101 = 0),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(s AS VARCHAR) || '#'
                                  || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
               % {_BLOOM_M} AS pos
      FROM members, range({_BLOOM_K}) t(s)),
    probes AS (SELECT range AS k FROM range(1, 2001)),
    hits AS (
      SELECT p.k, count(*) AS n_set
      FROM probes p, range({_BLOOM_K}) t(s)
      JOIN bits b
        ON b.pos = CAST(('0x' || substr(md5(CAST(t.s AS VARCHAR) || '#'
                                        || CAST(p.k AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {_BLOOM_M}
      GROUP BY p.k),
    claimed AS (SELECT k FROM hits WHERE n_set = {_BLOOM_K})
    SELECT CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_probes,
           CAST((SELECT count(*) FROM claimed) AS BIGINT) AS n_claimed,
           CAST((SELECT count(*) FROM claimed c JOIN members m ON m.k = c.k)
                AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM claimed) -
                (SELECT count(*) FROM claimed c JOIN members m ON m.k = c.k)
                AS BIGINT) AS n_false_pos,
           CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_bits_set
    FROM (SELECT 1)
    """,
)
def fn_bloom_probe(spark, sf_dir):
    """Bloom-filter membership with a MEASURED false-positive count: a
    member set (custkeys of every 101st order) builds an m=4096 / k=3
    filter from md5-derived bit positions; 2000 probe keys then test
    membership, and the op reports claimed vs true positives.

    The filter is data: ≤ m distinct positions (one distinct-aggregate of
    the member side, fixed size at any scale); probes explode to k
    positions and equi-join the broadcast bit frame, claiming membership
    only when all k hit (groupBy count = k).  No-false-negative is
    structural (a member's positions are all set by construction); the
    false-positive rate is deterministic under the portable hash family,
    so the oracle reproduces the same collisions and the scored
    n_false_pos is exact — the measurement that sizes m/k before rolling
    a filter out as a join-pruning side channel at 100 TB."""
    seeds = F.array(*[F.lit(i) for i in range(_BLOOM_K)])

    def pos(s_col, k_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            s_col.cast("string"), F.lit("#"), k_col.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        )

    members = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    members = members.transform(lineage_cap)  # feeds bits + truth join
    bits = (
        members.select(F.explode(seeds).alias("s"), "k")
        .select(pos(F.col("s"), F.col("k")).alias("pos"))
        .distinct()
    )
    probes = spark.range(1, 2001).select(F.col("id").alias("k"))
    hits = (
        probes.select("k", F.explode(seeds).alias("s"))
        .withColumn("pos", pos(F.col("s"), F.col("k")))
        .join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").alias("n_set"))
    )
    claimed = hits.filter(F.col("n_set") == _BLOOM_K).select("k")
    # one lazy plan, no driver-side actions: tag claimed keys with true
    # membership via a broadcast left join, fold to a 1-row summary, and
    # ride the probe/bit totals in as broadcast scalars
    tagged = claimed.join(
        F.broadcast(members.withColumn("is_m", F.lit(1))), "k", "left"
    )
    summary = tagged.agg(
        F.count("*").cast("long").alias("n_claimed"),
        F.sum(F.coalesce("is_m", F.lit(0))).cast("long").alias("n_true"),
    )
    n_probes = probes.agg(F.count("*").cast("long").alias("n_probes"))
    n_bits = bits.agg(F.count("*").cast("long").alias("n_bits_set"))
    return (
        summary.crossJoin(F.broadcast(n_probes))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_probes",
            "n_claimed",
            "n_true",
            (F.col("n_claimed") - F.col("n_true")).cast("long").alias("n_false_pos"),
            "n_bits_set",
        )
    )


_HLL_M = 64  # 2^6 registers
_HLL_ALPHA = 0.709  # alpha_64 (classic HLL constant for m = 64)


@register(
    "agg_hll_portable",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority AS grp, o_custkey AS k,
             CAST(('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM orders),
    parts AS (
      SELECT grp, k, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h),
    regs AS (
      /* rho = leading-zero count in the 26-bit word + 1, via exact integer
         bit-length: len(bin(w)) = floor(log2 w)+1, no float log */
      SELECT grp, bucket,
             max(CASE WHEN w = 0 THEN 27
                      ELSE 27 - length(printf('%b', w)) END) AS rho
      FROM parts GROUP BY grp, bucket),
    full_regs AS (
      SELECT g.grp, b.v AS bucket, coalesce(r.rho, 0) AS rho
      FROM (SELECT DISTINCT grp FROM h) g
      CROSS JOIN range({_HLL_M}) b(v)
      LEFT JOIN regs r ON r.grp = g.grp AND r.bucket = b.v),
    acc AS (
      /* harmonic denominator as an EXACT integer: sum 2^(27-rho) = 2^27 *
         sum 2^-rho, so the float division happens once per group */
      SELECT grp,
             sum(CAST(pow(2, 27 - rho) AS BIGINT)) AS num,
             sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
      FROM full_regs GROUP BY grp),
    est AS (
      SELECT grp, zeros,
             {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} * pow(2, 27) / num AS e_raw
      FROM acc),
    corrected AS (
      SELECT grp,
             CASE WHEN e_raw < 2.5 * {_HLL_M} AND zeros > 0
                  THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / zeros)
                  ELSE e_raw END AS e
      FROM est),
    truth AS (SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS nd
              FROM orders GROUP BY grp)
    SELECT t.grp, CAST(t.nd AS BIGINT) AS true_nd,
           CAST(round(c.e, 4) AS DOUBLE) AS hll_est,
           CAST(round((c.e - t.nd) * 10000 / t.nd, 4) + 0 AS DOUBLE) AS err_bp
    FROM truth t JOIN corrected c ON c.grp = t.grp
    """,
)
def agg_hll_portable(spark, sf_dir):
    """A HyperLogLog built AS DATA with a fully exact oracle -- unlike the
    engine-native sketches (`agg_approx_distinct`, `agg_hll_sketch_union`,
    both rows-only/approx by contract), this HLL's every register, the
    harmonic accumulator, and the final estimate are hash-checked
    bit-for-bit across engines, because the whole construction rides the
    portable md5 idiom and integer arithmetic:

    * register index = h mod 64, word = h div 64 (26 bits);
    * rho = leading-zero count + 1 via exact integer bit-length
      (`length(conv(w, 10, 2))` / `length(printf('%b', w))`) -- no float
      log anywhere near a boundary;
    * the harmonic denominator Σ2^(-rho) scales to the exact integer
      Σ2^(27-rho) (each term a power of two, the 64-term sum < 2^33), so
      ONE double division per group produces the estimate; the standard
      small-range linear-counting correction applies below 2.5m.

    Scale: registers are a (groups × 64)-row hash aggregate with map-side
    max-combine -- the shuffle carries registers, not rows, and register
    frames from different shards/days MERGE by the same max, which is the
    property that makes HLL columns storable in rollup tables.  The op
    scores estimate vs exact truth per group (err in basis points) -- the
    accuracy audit a team runs before trusting a sketch column."""
    h = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").alias("k"),
        F.conv(
            F.substring(F.md5(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    )
    parts = h.select(
        "grp", (F.col("hv") % _HLL_M).alias("bucket"), (F.col("hv") / _HLL_M).cast("long").alias("w")
    )
    regs = parts.groupBy("grp", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 27).otherwise(
                27 - F.length(F.conv(F.col("w").cast("string"), 10, 2))
            )
        ).alias("rho")
    )
    groups = h.select("grp").distinct()
    buckets = spark.range(_HLL_M).select(F.col("id").cast("long").alias("bucket"))
    full = (
        groups.crossJoin(F.broadcast(buckets))
        .join(regs, ["grp", "bucket"], "left")
        .select("grp", "bucket", F.coalesce("rho", F.lit(0)).alias("rho"))
    )
    acc = full.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2), 27 - F.col("rho")).cast("long")).alias("num"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    )
    e_raw = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M * F.pow(F.lit(2), 27) / F.col("num")
    e = F.when(
        (e_raw < 2.5 * _HLL_M) & (F.col("zeros") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
    ).otherwise(e_raw)
    truth = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.countDistinct("o_custkey").alias("true_nd"))
    )
    est = acc.select("grp", e.alias("e"))
    return truth.join(F.broadcast(est), "grp").select(
        "grp",
        "true_nd",
        r4(F.col("e")).alias("hll_est"),
        r4((F.col("e") - F.col("true_nd")) * 10000 / F.col("true_nd")).alias("err_bp"),
    )
