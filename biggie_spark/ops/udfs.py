"""§2.K — the UDF / UDAF / UDTF extension surface.

Rule (SURVEY.md §2.K): every UDF in a scored query has a pure-SQL oracle
twin — UDFs prove the extension surface, they don't smuggle in unverifiable
logic.  Cost ladder, hot-path guidance:

* row-at-a-time Python UDF — slowest (per-row Python<->JVM serialization);
  exists for parity, never in a hot path.
* pandas_udf — Arrow batch transfer, ~10-100x faster; the acceptable Python
  escape hatch at scale.
* applyInPandas — grouped custom aggregation (here: a rank-trimmed mean;
  rank-based, not percentile-based, because percentile interpolation is
  engine-specific).
* Python UDTF (Spark 4) — table functions via LATERAL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import r4

VOWELS = set("aeiou")


@register(
    "udf_python_scalar",
    oracle="""
    SELECT p_partkey,
           round((length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g')))
                 * 1.0 / length(p_name), 4) AS vowel_ratio
    FROM part
    """,
)
def udf_python_scalar(spark, sf_dir):
    """Row-at-a-time Python UDF (vowel-ratio scorer).  p_name lengths are
    small and never powers of 2 times 5^k, so ratio rounding is boundary-safe."""

    @F.udf("double")
    def vowel_ratio(s: str) -> float:
        if not s:
            return 0.0
        return sum(1 for ch in s if ch in VOWELS) / len(s)

    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", r4(vowel_ratio("p_name")).alias("vowel_ratio"))


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT doc_id,
           (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')))
             * 10000 // length(text) AS vowel_bp
    FROM documents
    """,
)
def udf_pandas_vectorized(spark, sf_dir):
    """Arrow-vectorized pandas UDF — same scorer, batch path.  Output in
    integer basis points: doc lengths like 320/400 hit exact .xxxx5 decimal
    boundaries where cross-engine float rounding diverges, so the contract
    is integer arithmetic end-to-end."""

    @F.pandas_udf("long")
    def vowel_bp(s: pd.Series) -> pd.Series:
        n_vowels = s.str.count("[aeiou]")
        return (n_vowels * 10000) // s.str.len()

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", vowel_bp("text").alias("vowel_bp"))


@register(
    "udaf_pandas_group",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS ra,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority, count(*) AS n_used,
           round(avg(o_totalprice), 4) AS trimmed_mean
    FROM ranked WHERE ra > n // 10 AND rd > n // 10
    GROUP BY o_orderpriority
    """,
)
def udaf_pandas_group(spark, sf_dir):
    """Grouped custom aggregate via applyInPandas: 10% rank-trimmed mean of
    order value per priority.  Trim is by rank with a unique tie-break
    (value, orderkey) — NOT by percentile value, whose interpolation rules
    differ across engines."""

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(["o_totalprice", "o_orderkey"])["o_totalprice"]
        k = len(s) // 10
        kept = s.iloc[k : len(s) - k] if k else s
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n_used": [len(kept)],
                "trimmed_mean": [round(kept.mean(), 4)],
            }
        )

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .groupBy("o_orderpriority")
        .applyInPandas(trimmed, "o_orderpriority string, n_used long, trimmed_mean double")
    )


@register(
    "udtf_python",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents WHERE doc_id < 5),
    x AS (SELECT doc_id,
                 unnest(list_transform(range(len(tk)),
                        i -> struct_pack(idx := i, token := tk[i+1]))) AS s
          FROM t)
    SELECT doc_id, s.idx AS idx, s.token AS token FROM x
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF (Spark 4): explode a document into (position, token) rows
    through a LATERAL table-function call."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, token string")
    class SplitWords:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.token
        FROM _udtf_docs d, LATERAL split_words(d.text) s
        """
    )


@register(
    "udf_arrow_map",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(round(list_reduce(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (a, b) -> a + b), 4) AS DOUBLE) AS sq_norm
    FROM embeddings WHERE vec_id < 300
    """,
)
def udf_arrow_map(spark, sf_dir):
    """`mapInArrow` — the lowest-overhead Python batch path (§2.K family):
    RecordBatches cross the boundary with zero pandas materialization, the
    kernel runs columnar pyarrow.compute ops.  Complements the three other
    Python surfaces (row UDF / pandas_udf / applyInPandas): same squared-
    norm semantics as the JVM higher-order-function path, so the oracle
    also pins that the Arrow kernel agrees with `F.aggregate` semantics.
    Left-to-right float summation matches DuckDB's list_reduce."""
    import pyarrow as pa

    def sq_norm_batches(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            embs = batch.column("embedding")
            dims, norms = [], []
            for emb in embs:
                vals = [float(v.as_py()) for v in emb.values]
                dims.append(len(vals))
                acc = 0.0
                for v in vals:
                    acc += v * v
                norms.append(round(acc, 4))
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(dims, pa.int32()), pa.array(norms, pa.float64())],
                ["vec_id", "dim", "sq_norm"],
            )

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return e.select("vec_id", "embedding").mapInArrow(
        sq_norm_batches, "vec_id bigint, dim int, sq_norm double"
    )


@register(
    "udtf_polymorphic",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents WHERE doc_id < 5),
    x AS (SELECT doc_id, unnest(range(len(tk) - 2)) AS i, tk FROM t)
    SELECT doc_id, CAST(i AS INT) AS idx,
           tk[i + 1] AS w0, tk[i + 2] AS w1, tk[i + 3] AS w2
    FROM x
    """,
)
def udtf_polymorphic(spark, sf_dir):
    """Polymorphic Python UDTF (Spark 4 `analyze()` static method): the
    output schema is computed at PLAN time from the literal n argument —
    ngrams(text, 3) materializes columns (idx, w0, w1, w2); calling it
    with a different n would change the schema without touching the
    class.  This is the dynamic-schema table-function contract (the
    static-schema twin is udtf_python above)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            fields = [StructField("idx", IntegerType())] + [
                StructField(f"w{i}", StringType()) for i in range(n.value)
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield (i, *toks[i : i + n])

    spark.udtf.register("ngrams_poly", NGrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 5
    ).createOrReplaceTempView("_udtf_poly_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.w0, s.w1, s.w2
        FROM _udtf_poly_docs d, LATERAL ngrams_poly(d.text, 3) s
        """
    )


@register(
    "udf_cogroup_pandas",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS k, count(*) AS n_orders,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS spend_cents
      FROM orders GROUP BY o_custkey),
    c AS (
      SELECT c_custkey AS k,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer)
    SELECT c.k AS custkey,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(o.spend_cents, 0) AS BIGINT) AS spend_cents,
           CAST(c.bal_cents AS BIGINT) AS bal_cents,
           CAST(coalesce(o.spend_cents, 0) - c.bal_cents AS BIGINT)
             AS overdraft_cents
    FROM c LEFT JOIN o ON o.k = c.k
    """,
)
def udf_cogroup_pandas(spark, sf_dir):
    """The COGROUP Pandas API surface (`groupBy().cogroup().
    applyInPandas`) -- the two-sided custom kernel: each custkey's
    orders-batch AND customer-batch arrive together as two pandas frames
    in one Python call.  This is the escape hatch for per-key logic that
    genuinely needs both relations at once (custom reconciliation,
    per-entity model scoring against history) -- anything expressible as
    join + agg should stay relational, and the oracle proves this
    kernel's arithmetic IS the relational answer.

    Scale shape: cogroup shuffles BOTH sides on the key (same exchange
    pattern as a shuffle join), then Arrow-ships each key's pair of
    batches to one Python worker call -- per-key state is bounded by that
    key's rows, and skewed keys salt exactly like a skewed join."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )

    def recon(key, orders_pdf, cust_pdf):
        if cust_pdf.empty:  # orders with no customer row: out of scope
            return pd.DataFrame(
                columns=["custkey", "n_orders", "spend_cents", "bal_cents",
                         "overdraft_cents"]
            )
        spend = int(orders_pdf["cents"].sum()) if len(orders_pdf) else 0
        bal = int(cust_pdf["bal_cents"].iloc[0])
        return pd.DataFrame(
            [
                {
                    "custkey": int(key[0]),
                    "n_orders": len(orders_pdf),
                    "spend_cents": spend,
                    "bal_cents": bal,
                    "overdraft_cents": spend - bal,
                }
            ]
        )

    # Widen the cogroup shuffle to session parallelism (optimization r14,
    # guide §4.1: the per-key Python call is the unit of work here — one
    # Arrow round-trip per custkey, ~15k keys at sf0.1).  Under a vanilla
    # session AQE coalesced the tiny exchanges to TWO partitions, so 15k
    # Python calls ran nearly serially: measured 15.3 s -> 2.6 s warm from
    # this one change (AQE-off/8-partition posture: 4.2 -> 1.5 s).  An
    # explicit keyed repartition is exempt from AQE coalescing and
    # satisfies the cogroup's required clustering, so the exchange count
    # is unchanged (2, one per side) — it just runs wide.  Scale-safe: the
    # partition count tracks the session's cores, and a production corpus
    # fills them regardless.
    p = spark.sparkContext.defaultParallelism
    return (
        o.repartition(p, "k")
        .groupBy("k")
        .cogroup(c.repartition(p, "k").groupBy("k"))
        .applyInPandas(
            recon,
            "custkey bigint, n_orders bigint, spend_cents bigint, "
            "bal_cents bigint, overdraft_cents bigint",
        )
    )
