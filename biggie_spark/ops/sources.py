"""§2.A — scans, sources, sinks.

Reference surface: Stash open/persist over one HDF5 file (SURVEY.md §2.A;
reference mount empty — no file:line cites possible, SURVEY.md §0).  Here a
stash is a Parquet dataset: splittable, predicate-pushdown-able, columnar.
Write paths round-trip through a temp directory and re-read so even the sink
operators get a full value-level oracle.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from biggie_spark.io import export, load_table, save_parquet
from biggie_spark.registry import register
from biggie_spark.util import dsum, r4


@register(
    "src_scan_parquet",
    oracle="SELECT * FROM customer",
)
def src_scan_parquet(spark, sf_dir):
    """Full-table scan, all columns projected."""
    return load_table(spark, sf_dir, "customer")


@register(
    "src_scan_schema",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
           CAST(date_trunc('day', ts) AS DATE) AS ts_day,
           event_type, user_id
    FROM events
    """,
)
def src_scan_schema(spark, sf_dir):
    """Schema-stable load incl. the ns-timestamp repair (SURVEY.md §7.4.1):
    events.ts is parquet timestamp[ns]; the loader surfaces it as a proper
    TimestampType; scored output goes through epoch-seconds / date only."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("ts_day"),
        "event_type",
        "user_id",
    )


@register(
    "src_scan_multi",
    oracle="""
    SELECT r_regionkey AS k, r_name AS name, 'region' AS src FROM region
    UNION ALL
    SELECT n_nationkey AS k, n_name AS name, 'nation' AS src FROM nation
    """,
)
def src_scan_multi(spark, sf_dir):
    """Union scan over several datasets (multi-file stash)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("name"), F.lit("region").alias("src")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name"), F.lit("nation").alias("src")
    )
    return r.unionByName(n)


@register(
    "src_scan_csv",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 4) AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def src_scan_csv(spark, sf_dir):
    """CSV source connector: materialize the customer table as CSV once,
    then scan it back with an explicit schema (never inferSchema — a
    schema-inference pass is a second full read of 100 TB).  Java writes
    doubles in shortest-round-trip form and parses them back to identical
    bits, so the text round-trip is lossless and the scan gets the same
    full value oracle as the parquet path."""
    df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", r4("c_acctbal").alias("c_acctbal"),
        "c_mktsegment",
    )
    tmp = tempfile.mkdtemp(prefix="biggie_src_csv_")
    try:
        export(df, tmp, "csv")
        schema = (
            "c_custkey bigint, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string"
        )
        back = spark.read.schema(schema).option("header", "true").csv(tmp)
        return back.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "src_scan_json",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 4) AS s_acctbal
    FROM supplier
    """,
)
def src_scan_json(spark, sf_dir):
    """JSON-lines source connector: supplier round-trip with explicit
    schema on the read side (same no-inference rule as CSV — and JSON
    field order is not positional, so the schema doubles as the
    projection contract)."""
    df = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", r4("s_acctbal").alias("s_acctbal")
    )
    tmp = tempfile.mkdtemp(prefix="biggie_src_json_")
    try:
        export(df, tmp, "json")
        schema = "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
        back = spark.read.schema(schema).json(tmp)
        return back.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "src_scan_orc",
    oracle="SELECT * FROM part",
)
def src_scan_orc(spark, sf_dir):
    """ORC source/sink connector: binary columnar round-trip of the part
    table — exact for every type, so the oracle is the unmodified parquet
    view.  Like parquet, ORC scans are splittable with predicate pushdown
    and column pruning, so either format is a valid stash encoding at
    100 TB; parquet stays the default for ecosystem reach."""
    df = load_table(spark, sf_dir, "part")
    tmp = tempfile.mkdtemp(prefix="biggie_src_orc_")
    try:
        df.write.mode("overwrite").orc(tmp)
        back = spark.read.orc(tmp)
        return back.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "src_scan_text",
    oracle="""
    SELECT text AS line FROM documents WHERE doc_id < 200 ORDER BY text
    """,
)
def src_scan_text(spark, sf_dir):
    """Raw-text source connector (``spark.read.text``) — the ingest format
    of most web-scale LLM corpora (one document per line, no schema).  The
    round-trip drops all structure by design: write doc texts as lines,
    read them back as a single ``line`` column.  Documents in this corpus
    are single-line, so lines == documents and the value oracle is exact.
    Text scans are splittable by newline at 100 TB; schema/typing is the
    consumer's job (exactly how jsonl/warc-derived dumps are ingested)."""
    df = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("text")
    )
    tmp = tempfile.mkdtemp(prefix="biggie_src_text_")
    try:
        df.write.mode("overwrite").text(tmp)
        back = spark.read.text(tmp).select(F.col("value").alias("line"))
        return back.orderBy("line").localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "snk_write_parquet",
    oracle="""
    SELECT l_returnflag, count(*) AS n, CAST(round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def snk_write_parquet(spark, sf_dir):
    """Stash persist: write lineitem partitioned by l_returnflag (directory
    partition pruning = the reference's key-fanout analog), re-read, verify
    values survived the round trip.  Parquet double round-trip is exact, so
    this sink gets a full value oracle, not just a rows-check."""
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    tmp = tempfile.mkdtemp(prefix="biggie_snk_parquet_")
    try:
        save_parquet(df, tmp, partition_by=["l_returnflag"])
        back = spark.read.parquet(tmp)
        return (
            back.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "snk_write_csv_json",
    oracle="""
    SELECT event_type, count(*) AS n, CAST(round(sum(CAST(round(round(value, 4) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS sum_val
    FROM events GROUP BY event_type
    """,
)
def snk_write_csv_json(spark, sf_dir):
    """Export sink: csv + json round trip.  Values are pre-rounded to 4dp so
    the text round-trip is exact (Java Double.parseDouble is exact on the
    shortest-round-trip representation Spark writes)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value"), 4).alias("value")
    )
    tmp_csv = tempfile.mkdtemp(prefix="biggie_snk_csv_")
    tmp_json = tempfile.mkdtemp(prefix="biggie_snk_json_")
    try:
        export(ev, tmp_csv, "csv")
        export(ev, tmp_json, "json")
        schema = "event_id bigint, event_type string, value double"
        back_csv = spark.read.schema(schema).option("header", "true").csv(tmp_csv)
        back_json = spark.read.schema(schema).json(tmp_json)
        out = (
            back_json.groupBy("event_type")
            .agg(F.count("*").alias("n"), dsum("value", 4).alias("sum_val"))
        )
        n_src, n_csv, n_json = ev.count(), back_csv.count(), back_json.count()
        assert n_csv == n_src, f"csv round-trip lost rows: {n_csv} != {n_src}"
        assert n_json == n_src, f"json round-trip lost rows: {n_json} != {n_src}"
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp_csv, ignore_errors=True)
        shutil.rmtree(tmp_json, ignore_errors=True)


@register(
    "snk_compact",
    oracle="""
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def snk_compact(spark, sf_dir):
    """Small-files compaction round-trip: fragment the documents table into
    64 tiny files (simulating a long history of incremental stash writes),
    compact to size-targeted files via io.compact_parquet, and verify no
    row was lost or duplicated (full value oracle on the re-read).  The
    compacted layout must collapse to a handful of files — asserted here,
    not just eyeballed."""
    from biggie_spark.io import compact_parquet, parquet_files

    df = load_table(spark, sf_dir, "documents")
    frag = tempfile.mkdtemp(prefix="biggie_frag_")
    comp = tempfile.mkdtemp(prefix="biggie_comp_")
    try:
        save_parquet(df.repartition(64), frag)
        n_before = len(parquet_files(frag))
        compact_parquet(spark, frag, comp, target_bytes=128 << 20)
        n_after = len(parquet_files(comp))
        assert n_before == 64, f"fragmentation setup wrote {n_before} files"
        assert n_after < 8, f"compaction left {n_after} files"
        back = spark.read.parquet(comp)
        return (
            back.groupBy("lang")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
            .localCheckpoint()  # materialize before the temp dirs vanish
        )
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(comp, ignore_errors=True)


@register(
    "snk_partition_prune_read",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(round(round(value, 4) * 10000, 0) AS BIGINT))
                      / 10000.0, 4) AS DOUBLE) AS sum_val
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY event_type
    """,
)
def snk_partition_prune_read(spark, sf_dir):
    """Directory-partitioned sink + PRUNED read-back: write events
    partitioned by event_type, then read two partitions back through a
    partition-column predicate and assert the scan's plan carries the
    predicate as a PartitionFilter (directory pruning — untouched
    partitions are never listed or read).  snk_write_parquet proves the
    layout round-trips values; this op proves the layout actually PAYS at
    read time, which is the point of partitioning 100 TB by a hot key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value"), 4).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="biggie_snk_prune_")
    try:
        save_parquet(ev, tmp, partition_by=["event_type"])
        back = spark.read.parquet(tmp).filter(
            F.col("event_type").isin("click", "purchase")
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan.split(
            "PartitionFilters", 1
        )[1][:200], "partition predicate did not reach the scan's PartitionFilters"
        return (
            back.groupBy("event_type")
            .agg(F.count("*").alias("n"), dsum("value", 4).alias("sum_val"))
            .localCheckpoint()  # materialize before the temp dir vanishes
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "src_scan_binary_files",
    oracle="""
    WITH probe AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    dims AS (
      SELECT doc_id, 4 + doc_id % 4 AS w, 3 AS h,
             doc_id % 100 AS rb, (doc_id * 7) % 100 AS gb, (doc_id * 13) % 100 AS bb
      FROM probe)
    SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.ppm' AS fname,
           /* P6\\n# biggie synthetic\\n{w} {h}\\n255\\n is 30 bytes for
              single-digit dims (w in 4..7, h = 3), plus 3*w*h samples */
           CAST(30 + 3 * w * h AS BIGINT) AS n_bytes,
           CAST(w*h*(rb+gb+bb) + 3*(h*(w*(w-1)//2) + w*(h*(h-1)//2)) AS BIGINT)
             AS px_sum
    FROM dims
    """,
)
def src_scan_binary_files(spark, sf_dir):
    """Binary-corpus ingestion through Spark's `binaryFile` source -- the
    format an image/audio training corpus actually arrives in (a
    directory of opaque files), read as (path, length, content) rows with
    the payload isolated in one binary column.

    A deterministic PPM per probe doc (the mm_codec_ppm raster) is
    written to a scratch directory as REAL files; `format("binaryFile")`
    lists and reads them back; the content column round-trips through the
    actual netpbm decoder and the oracle pins file name, EXACT on-disk
    byte length (header grammar + 3wh samples -- a container bug shifts
    it), and the decoded pixel sum.  Scale: binaryFile parallelizes by
    file (maxPartitionBytes-packed bins); the length/path metadata
    columns never touch content (column pruning on the file source), the
    same metadata/payload split as the mm_* family."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from biggie_spark.multimodal import decode_ppm, encode_ppm

    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id")
        .collect()  # 40-row probe id list; file writing is driver-side
    ]
    tmp = tempfile.mkdtemp(prefix="biggie_src_binary_")
    try:
        for doc_id in ids:
            payload = encode_ppm(
                4 + doc_id % 4,
                3,
                (doc_id % 100, (doc_id * 7) % 100, (doc_id * 13) % 100),
            )
            with open(f"{tmp}/img_{doc_id:04d}.ppm", "wb") as fh:
                fh.write(payload)

        # function form, no type hints: `from __future__ import
        # annotations` stringifies hints, which pandas_udf cannot resolve
        def _px_sum_kernel(content):
            out = []
            for b in content:
                _w, _h, _n, sr, sg, sb = decode_ppm(bytes(b))
                out.append(sr + sg + sb)
            return pd.Series(out)

        px_sum_udf = pandas_udf(_px_sum_kernel, "bigint")

        files = spark.read.format("binaryFile").load(tmp)
        out = files.select(
            F.element_at(F.split("path", "/"), -1).alias("fname"),
            F.col("length").cast("long").alias("n_bytes"),
            px_sum_udf("content").alias("px_sum"),
        ).localCheckpoint()
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
