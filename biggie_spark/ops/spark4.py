"""Spark-4-native surfaces: VariantType JSON, schema-evolution reads, and
the Python DataSource API (pyspark.sql.datasource) — the engine features a
pipeline running on Spark 4.x should be using, exercised as scored ops.

* ``fn_variant`` — semi-structured JSON through the VARIANT type
  (`parse_json` once, `try_variant_get` per path) instead of repeated
  string path extraction.  At 100 TB variant's binary encoding is parsed
  once at ingest and every downstream path read is a cheap binary probe,
  vs get_json_object re-parsing the string per call.
* ``src_schema_evolution`` — two parquet generations with different
  schemas unified by ``mergeSchema`` — the read path every long-lived
  table hits after its schema grows a column.
* ``src_python_datasource`` — a custom partition-planned source written
  against the Python DataSource API: the reader declares N input
  partitions, each executor materializes only its own range — the
  contract any external-system connector (REST shard, queue, blob
  manifest) implements.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import dsum, r4


@register(
    "fn_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_u,
           CAST(round(sum(CAST(round(round(value, 4) * 2 * 10000, 0) AS BIGINT))
                      / 10000.0, 4) AS DOUBLE) AS sum_v2
    FROM events GROUP BY event_type
    """,
)
def fn_variant(spark, sf_dir):
    """Semi-structured JSON via Spark 4 VARIANT: build a nested JSON
    payload, `parse_json` it ONCE into a variant column, then read three
    typed paths back with `try_variant_get` ($.u bigint, $.vals[1] double,
    $.meta.t string) and aggregate.  The oracle computes the same values
    from the base columns, so a wrong path, index base, or type coercion
    in the variant round-trip breaks the hash.  One parse + cheap binary
    probes is the pattern that replaces repeated get_json_object string
    re-parses at scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.round("value", 4).alias("value")
    )
    payload = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            F.struct(F.col("event_type").alias("t")).alias("meta"),
        )
    )
    v = ev.select(F.parse_json(payload).alias("var"))
    return (
        v.select(
            F.try_variant_get("var", "$.u", "bigint").alias("u"),
            F.try_variant_get("var", "$.vals[1]", "double").alias("v2"),
            F.try_variant_get("var", "$.meta.t", "string").alias("event_type"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("u").alias("sum_u"),
            dsum("v2", 4).alias("sum_v2"),
        )
    )


@register(
    "src_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT doc_id, lang, NULL AS quality FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, doc_id % 5 AS quality FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang, count(*) AS n,
           CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old_schema,
           CAST(coalesce(sum(quality), 0) AS BIGINT) AS sum_quality
    FROM unioned GROUP BY lang
    """,
)
def src_schema_evolution(spark, sf_dir):
    """Schema evolution on a long-lived table: generation 1 files lack the
    `quality` column, generation 2 files carry it; `mergeSchema=true`
    unifies the footers and back-fills NULL for the missing column — the
    read-path behavior every appended-to 100 TB table depends on after a
    schema change.  Old-generation rows are identified *by the scan* (null
    quality), not by a side channel, so the oracle checks the fill
    semantics exactly."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    base = tempfile.mkdtemp(prefix="biggie_evo_")
    try:
        d.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
            f"{base}/gen=1"
        )
        (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", "lang", (F.col("doc_id") % 5).alias("quality"))
            .write.mode("overwrite")
            .parquet(f"{base}/gen=2")
        )
        back = spark.read.option("mergeSchema", "true").parquet(
            f"{base}/gen=1", f"{base}/gen=2"
        )
        assert "quality" in back.columns, "mergeSchema did not surface the new column"
        return (
            back.groupBy("lang")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.when(F.col("quality").isNull(), 1).otherwise(0)
                ).alias("n_old_schema"),
                F.coalesce(F.sum("quality"), F.lit(0)).alias("sum_quality"),
            )
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


N_SYNTH = 2000
N_PARTS = 8


@register(
    "src_python_datasource",
    oracle=f"""
    SELECT i AS id, CAST(i % 10 AS INT) AS bucket,
           CAST((i * 7) % 100 AS INT) AS score
    FROM range({N_SYNTH}) t(i)
    """,
)
def src_python_datasource(spark, sf_dir):
    """A scored custom source on the Spark 4 Python DataSource API: the
    reader plans {N_PARTS} input partitions up front and each task
    materializes ONLY its own id range — the partition-planning contract
    that any external connector (REST shards, queue offsets, blob
    manifests) implements to parallelize ingest.  Values are closed-form
    in the id, so the oracle checks every generated row, and a partition
    plan that dropped/duplicated a range breaks row count and hash."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", N_SYNTH))
            self.parts = int(options.get("parts", N_PARTS))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, i % 10, (i * 7) % 100)

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "biggie_synth"

        def schema(self):
            return "id bigint, bucket int, score int"

        def reader(self, schema):
            return SynthReader(self.options)

    # register() is idempotent per name (latest registration wins)
    spark.dataSource.register(SynthSource)
    return (
        spark.read.format("biggie_synth")
        .option("n", str(N_SYNTH))
        .option("parts", str(N_PARTS))
        .load()
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal >= 100.0
    GROUP BY c_mktsegment
    """,
)
def sql_parameterized(spark, sf_dir):
    """Named-parameter SQL binding (`spark.sql(query, args=...)`, Spark 4)
    — the injection-safe templating surface: parameters bind as typed
    literals in the parse tree, never string-spliced, so a hostile
    segment value cannot change query structure.  Constant-folds to the
    same plan as inline literals — predicate pushdown still sees the
    bound values."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_prm")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n,
               sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS bal_cents
        FROM cust_prm
        WHERE c_mktsegment IN (:seg1, :seg2) AND c_acctbal >= :lo
        GROUP BY c_mktsegment
        """,
        args={"seg1": "BUILDING", "seg2": "MACHINERY", "lo": 100.0},
    )


@register(
    "sql_variables",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def sql_variables(spark, sf_dir):
    """SQL session variables (`DECLARE VARIABLE` / `SET VAR`, Spark 4) —
    procedural state between statements without any client-side string
    building; the variable reference resolves at analysis time so the
    filter still pushes down to the scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_var")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE prio_filter STRING DEFAULT '1-URGENT'"
    )
    spark.sql("SET VAR prio_filter = '1-URGENT'")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_var
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderpriority = session.prio_filter
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_identifier_clause",
    oracle="""
    SELECT 'region' AS tbl, (SELECT count(*) FROM region) AS n
    UNION ALL
    SELECT 'nation', (SELECT count(*) FROM nation)
    """,
)
def sql_identifier_clause(spark, sf_dir):
    """The `IDENTIFIER(:name)` clause (Spark 4): dynamic table binding
    with identifier semantics — the safe form of "table name as a
    variable" (a catalog-layer concern templating engines otherwise solve
    with string concat).  Each binding compiles to a plain scan of the
    named view."""
    from functools import reduce

    frames = []
    for t in ("region", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"idtest_{t}")
        frames.append(
            spark.sql(
                "SELECT :label AS tbl, count(*) AS n FROM IDENTIFIER(:t)",
                args={"label": t, "t": f"idtest_{t}"},
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


@register(
    "fn_xml_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(round(s_acctbal, 4) AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
)
def fn_xml_roundtrip(spark, sf_dir):
    """Column-level XML codec (`to_xml`/`from_xml`, Spark 4): each supplier
    row serializes to an XML fragment and parses back through an explicit
    schema.  The oracle is the original table, so any serializer/parser
    asymmetry (escaping, numeric formatting, null handling) breaks the
    hash — the same round-trip-against-source contract as the CSV/JSON
    connectors, at expression level for message-queue payloads."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", r4("s_acctbal").alias("s_acctbal")
    )
    xml = s.select(
        F.expr("to_xml(struct(s_suppkey, s_name, s_nationkey, s_acctbal))").alias(
            "x"
        )
    )
    return xml.select(
        F.expr(
            "from_xml(x, 's_suppkey BIGINT, s_name STRING, s_nationkey INT,"
            " s_acctbal DOUBLE')"
        ).alias("st")
    ).select("st.*")


@register(
    "fn_csv_parse",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def fn_csv_parse(spark, sf_dir):
    """Column-level CSV codec (`to_csv`/`from_csv`): the per-record parse
    path for CSV payloads embedded in another stream (log lines, queue
    messages) — distinct from the file-level CSV connector.  Explicit
    schema, no inference; round-trip oracle against the source table."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    csv = n.select(
        F.expr("to_csv(struct(n_nationkey, n_name, n_regionkey))").alias("c")
    )
    return csv.select(
        F.expr(
            "from_csv(c, 'n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT')"
        ).alias("st")
    ).select("st.*")


@register(
    "sql_join_hints",
    oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def sql_join_hints(spark, sf_dir):
    """SQL join-strategy hints (`/*+ BROADCAST(n) */`): the escape hatch
    when statistics mislead the planner — e.g. a dimension behind a view
    whose size estimate exceeds the broadcast threshold.  The hint pins a
    BroadcastHashJoin (asserted in tests/test_analytics4.py); semantics
    are unchanged, so the oracle is the plain join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_h")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nat_h")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n_name, count(*) AS n_cust
        FROM cust_h c JOIN nat_h n ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name
        """
    )
