"""§2.B — the reference's own key-value operator set, DataFrame-rewritten.

Stash = the ``documents`` table keyed by ``doc_id``.  Each op here is the
declarative rewrite of the upstream kv surface (Stash.get/add/remove/keys/
len/contains — reconstructed, SURVEY.md §0/§2.B):

* point reads compile to parquet predicate pushdown (row-group skipping at
  100 TB, the analog of the reference's keymap lookup);
* lazy field access compiles to column pruning;
* upsert/delete are anti-join ∪ new — shuffle-free when the key-diff side is
  broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.stash import Stash
from biggie_spark.util import temp_conf


def _stash(spark, sf_dir) -> Stash:
    return Stash(spark, load_table(spark, sf_dir, "documents"), key="doc_id")


@register("kv_get", oracle="SELECT * FROM documents WHERE doc_id = 42")
def kv_get(spark, sf_dir):
    """Exact-key point read; ``doc_id = 42`` reaches parquet PushedFilters."""
    return _stash(spark, sf_dir).get(42)


@register("kv_mget", oracle="SELECT * FROM documents WHERE doc_id IN (3, 7, 11, 19, 42)")
def kv_mget(spark, sf_dir):
    return _stash(spark, sf_dir).mget([3, 7, 11, 19, 42])


@register("kv_keys", oracle="SELECT DISTINCT doc_id AS key FROM documents")
def kv_keys(spark, sf_dir):
    return _stash(spark, sf_dir).keys().select(F.col("doc_id").alias("key"))


@register("kv_len", oracle="SELECT count(*) AS n FROM documents")
def kv_len(spark, sf_dir):
    return _stash(spark, sf_dir).df.agg(F.count("*").alias("n"))


@register(
    "kv_exists",
    oracle="SELECT (count(*) > 0) AS present FROM documents WHERE doc_id = 42",
)
def kv_exists(spark, sf_dir):
    s = _stash(spark, sf_dir)
    return s.get(42).agg((F.count("*") > 0).alias("present"))


@register(
    "kv_put",
    oracle="""
    WITH merged AS (
      SELECT doc_id, text FROM documents WHERE doc_id NOT IN (1, 100000)
      UNION ALL SELECT * FROM (VALUES (1, '__UPDATED__'), (100000, '__NEW__')) v(doc_id, text)
    )
    SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_key,
           CAST(sum(CASE WHEN text = '__UPDATED__' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM merged
    """,
)
def kv_put(spark, sf_dir):
    """Upsert two entities (one replacing doc_id=1, one brand-new) via the
    anti-join ∪ new rewrite, then aggregate the post-state — a full value
    oracle on upsert semantics."""
    s = Stash(spark, load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    incoming = spark.createDataFrame(
        [Row(doc_id=1, text="__UPDATED__"), Row(doc_id=100000, text="__NEW__")]
    )
    merged = s.add(incoming).df
    return merged.agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_key"),
        F.sum(F.when(F.col("text") == "__UPDATED__", 1).otherwise(0)).alias("n_updated"),
    )


@register(
    "kv_delete",
    oracle="""
    SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_key
    FROM documents WHERE doc_id NOT IN (2, 4, 6)
    """,
)
def kv_delete(spark, sf_dir):
    survived = _stash(spark, sf_dir).remove([2, 4, 6]).df
    return survived.agg(F.count("*").alias("n"), F.sum("doc_id").alias("sum_key"))


@register(
    "kv_scan_prefix",
    oracle="SELECT doc_id FROM documents WHERE CAST(doc_id AS VARCHAR) LIKE '1%'",
)
def kv_scan_prefix(spark, sf_dir):
    """Prefix scan over the key space (reference keys() extension)."""
    return _stash(spark, sf_dir).scan_prefix("1").select("doc_id")


@register(
    "kv_field_project",
    oracle="SELECT doc_id, n_chars, md5(text) AS text_md5 FROM documents WHERE doc_id = 7",
)
def kv_field_project(spark, sf_dir):
    """Lazy field materialization: only the touched fields are scanned —
    Catalyst column pruning is the Spark analog of the reference's lazy
    Entity fields."""
    s = _stash(spark, sf_dir)
    return s.get_fields(7, ["n_chars", "text"]).select(
        "doc_id", "n_chars", F.md5("text").alias("text_md5")
    )


@register(
    "kv_put_bucketed",
    oracle="""
    WITH merged AS (
      SELECT doc_id, text FROM documents WHERE doc_id NOT IN (1, 100000)
      UNION ALL SELECT * FROM (VALUES (1, '__UPDATED__'), (100000, '__NEW__')) v(doc_id, text)
    )
    SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_key,
           CAST(sum(CASE WHEN text = '__UPDATED__' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM merged
    """,
)
def kv_put_bucketed(spark, sf_dir):
    """Partition-pruned upsert — the 100 TB-honest kv_put.

    kv_put's anti-join ∪ new is semantically right but rewrites the whole
    stash per call; at scale a two-key put must not touch 100 TB.  Here the
    stash is laid out as directory partitions on ``kbucket = key % N`` (the
    key-fanout analog of the reference's hex sharding), and the put:

    1. computes the incoming keys' buckets driver-side (pure arithmetic on
       keys the caller already holds — no data collect);
    2. reads ONLY those partitions via a literal ``kbucket IN (...)``
       predicate (directory partition pruning: untouched buckets are never
       scanned);
    3. merges (anti-join ∪ incoming) within the touched buckets; and
    4. rewrites only the touched partitions via dynamic partition overwrite
       (``spark.sql.sources.partitionOverwriteMode=dynamic``).

    Cost is O(stash/N × puts), independent of total stash size once N tracks
    the key cardinality.  The untouched-bucket data files are asserted
    byte-identical (same paths+sizes) across the put — the scale claim is
    tested, not narrated.  Oracle = full post-state aggregate (same contract
    as kv_put)."""
    import os
    import shutil
    import tempfile

    N = 16
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="biggie_kvb_")
    try:
        wdf = docs.withColumn("kbucket", F.col("doc_id") % N)
        wdf.write.mode("overwrite").partitionBy("kbucket").parquet(base)

        put_rows = [Row(doc_id=1, text="__UPDATED__"), Row(doc_id=100000, text="__NEW__")]
        touched = sorted({r.doc_id % N for r in put_rows})
        incoming = spark.createDataFrame(put_rows).withColumn(
            "kbucket", F.col("doc_id") % N
        )

        # Explicit schema on both stash read-backs (optimization r14): the
        # writer's schema is in scope, so the driver-side footer/partition
        # schema inference (~0.1 s per read) buys nothing; it also keeps
        # kbucket at the writer's LONG type instead of the directory
        # inference's int.
        stash = spark.read.schema(wdf.schema).parquet(base)
        untouched_files = {
            (p, os.path.getsize(p))
            for p in _bucket_files(base)
            if _bucket_of(p) not in touched
        }

        merged_touched = (
            stash.where(F.col("kbucket").isin(touched))
            .join(F.broadcast(incoming.select("doc_id")), "doc_id", "left_anti")
            .unionByName(incoming)
            # Materialize BEFORE the overwrite: Spark forbids/undefines
            # overwriting a path that is simultaneously being read, and the
            # touched partitions are both source and sink here.  A touched
            # bucket is O(stash/N) by construction, so the checkpoint is
            # small regardless of total stash size.
            .localCheckpoint()
        )
        with temp_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
            merged_touched.write.mode("overwrite").partitionBy("kbucket").parquet(base)

        after = {
            (p, os.path.getsize(p))
            for p in _bucket_files(base)
            if _bucket_of(p) not in touched
        }
        assert after == untouched_files, "untouched buckets were rewritten"

        final = spark.read.schema(wdf.schema).parquet(base)
        return final.agg(
            F.count("*").alias("n"),
            F.sum("doc_id").alias("sum_key"),
            F.sum(F.when(F.col("text") == "__UPDATED__", 1).otherwise(0)).alias(
                "n_updated"
            ),
        ).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _bucket_files(base: str) -> list[str]:
    from biggie_spark.io import parquet_files

    return [p for p in parquet_files(base) if "kbucket=" in p]


def _bucket_of(path: str) -> int:
    part = next(s for s in path.split("/") if s.startswith("kbucket="))
    return int(part.split("=", 1)[1])


@register(
    "kv_merge",
    oracle="""
    WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    b AS (SELECT doc_id, 'B::' || text AS text FROM documents
          WHERE doc_id BETWEEN 200 AND 499),
    merged AS (
      SELECT * FROM a WHERE doc_id NOT IN (SELECT doc_id FROM b)
      UNION ALL SELECT * FROM b)
    SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_key,
           CAST(sum(CASE WHEN text LIKE 'B::%' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_from_b
    FROM merged
    """,
)
def kv_merge(spark, sf_dir):
    """Stash-level merge, newest-wins (Stash.merge): two snapshots with an
    overlapping key range combine into one; for overlapped keys the newer
    stash's entity replaces the older's.  Stash B's texts carry an explicit
    ``B::`` provenance prefix so survivorship is value-visible and exact:
    the oracle counts merged rows whose text starts with the marker — that
    count equals |B| iff every overlap resolved in B's favor with no
    duplicates, with no reliance on incidental value properties of the
    corpus.  One anti-join ∪ append; broadcastable delta = no shuffle of
    the base."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = Stash(spark, docs.filter(F.col("doc_id") < 300), "doc_id")
    b = Stash(
        spark,
        docs.filter(F.col("doc_id").between(200, 499)).withColumn(
            "text", F.concat(F.lit("B::"), F.col("text"))
        ),
        "doc_id",
    )
    merged = a.merge(b).df
    return merged.agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_key"),
        F.sum(
            F.when(F.col("text").startswith("B::"), 1).otherwise(0)
        ).alias("n_from_b"),
    )


@register(
    "kv_tensor_field",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             3 AS n_rows, 4 + doc_id % 3 AS n_cols, doc_id % 50 AS base
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           CAST(n_rows AS INT) AS n_rows, CAST(n_cols AS INT) AS n_cols,
           CAST(n_cols * base + 3 * (n_cols - 1) * n_cols // 2 AS BIGINT) AS row0_sum,
           CAST(n_rows * n_cols * base + 2 * n_cols * 3
                + 3 * n_rows * (n_cols - 1) * n_cols // 2 AS BIGINT) AS total_sum,
           CAST(base + 2 * (n_rows - 1) + 3 * (n_cols - 1) AS BIGINT) AS max_elem
    FROM t
    """,
)
def kv_tensor_field(spark, sf_dir):
    """Rank-2 tensor fields — the reference's core entity payload (numpy
    ndarrays, e.g. spectrograms) in its Spark mapping: ``struct<shape:
    array<int>, data: array<float>>`` with row-major flat data (SURVEY.md
    §1.2).  Demonstrates the three tensor access patterns entirely with
    JVM-side higher-order functions (no UDF, no Python):

    * shape access — struct field projection (never touches data);
    * row slice — ``slice(data, r*cols+1, cols)`` on the flat layout;
    * reduction — ``aggregate`` folds for row/total sums and max.

    Tensors are synthesized deterministically (elem(i,j) = base + 2i + 3j)
    so the oracle can state every reduction in closed form; the integer
    values are float-exact, making the sums BIGINT-comparable.  At 100 TB
    the payloads ride in one parquet column; shape-only queries prune the
    data column exactly like the reference's lazy fields."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    rows = F.lit(3)
    cols = (F.lit(4) + F.col("doc_id") % 3).cast("int")
    base = (F.col("doc_id") % 50).cast("int")
    data = F.transform(
        F.sequence(F.lit(0), rows * cols - 1),
        lambda k: (base + 2 * (k / cols).cast("int") + 3 * (k % cols)).cast(
            "float"
        ),
    )
    t = d.select(
        "doc_id",
        F.struct(
            F.array(rows, cols).alias("shape"), data.alias("data")
        ).alias("tensor"),
    )
    shape = F.col("tensor.shape")
    n_rows = F.element_at(shape, 1)
    n_cols = F.element_at(shape, 2)
    flat = F.col("tensor.data")
    row0 = F.slice(flat, 1, n_cols)
    fsum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    fmax = F.array_max(flat)
    return t.select(
        "doc_id",
        n_rows.alias("n_rows"),
        n_cols.alias("n_cols"),
        fsum(row0).cast("bigint").alias("row0_sum"),
        fsum(flat).cast("bigint").alias("total_sum"),
        fmax.cast("bigint").alias("max_elem"),
    )


@register(
    "kv_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400),
    b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' [edited]' ELSE text END AS text
      FROM documents WHERE doc_id >= 100 AND doc_id < 500),
    j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.text <> b.text THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT change, count(*) AS n,
           CAST(sum(doc_id) AS BIGINT) AS sum_key
    FROM j WHERE change <> 'unchanged' GROUP BY change
    """,
)
def kv_snapshot_diff(spark, sf_dir):
    """Snapshot diff between two stash states (Stash.diff) — the kv-store
    change-capture primitive: which keys were added / removed / changed
    between yesterday's stash and today's.  Snapshot B drops keys < 100,
    adds keys 400-499, and edits every 10th text, so all three change
    classes appear with exact expected counts.  ONE full outer join on the
    key (both sides hash-partitioned, linear at any stash size; bucketed
    layouts make it shuffle-free); change detection compares md5 value
    fingerprints, never full payloads, so the exchange carries 16-byte
    hashes.  The oracle recomputes the diff relationally."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = Stash(spark, docs.filter(F.col("doc_id") < 400), "doc_id")
    b = Stash(
        spark,
        docs.filter(F.col("doc_id").between(100, 499)).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
            ).otherwise(F.col("text")),
        ),
        "doc_id",
    )
    d = a.diff(b)
    return d.groupBy("change").agg(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("sum_key"),
    )


@register(
    "kv_tensor_slice",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             5 AS n_rows, 4 + doc_id % 3 AS n_cols, doc_id % 50 AS base
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           /* rows 2..3 (0-based), all cols: elem(i,j) = base + 2i + 3j */
           CAST(2 * n_cols * base
                + 2 * n_cols * (2 + 3) /* 2*(i=2) + 2*(i=3) summed = 2*5 */
                + 2 * 3 * (n_cols - 1) * n_cols // 2 AS BIGINT) AS slice_sum,
           CAST(2 * n_cols AS BIGINT) AS slice_len,
           CAST(base + 2 * 3 + 3 * (n_cols - 1) AS BIGINT) AS slice_max
    FROM t
    """,
)
def kv_tensor_slice(spark, sf_dir):
    """Row-range slicing of a stored rank-2 tensor — the reference's
    bread-and-butter access pattern (grab frames t0..t1 of a feature
    matrix) on the flat row-major layout: ``slice(data, i0*cols + 1,
    (i1 - i0 + 1)*cols)`` is ONE JVM array kernel — no explode, no UDF,
    no per-element rows — and the slice never materializes the rest of
    the tensor.

    Here rows 2..3 of a 5×cols tensor; the oracle states the slice sum,
    length, and max in closed form over the generating formula
    (elem = base + 2i + 3j), so an off-by-one in the flat-index
    arithmetic — THE classic bug in strided layouts — breaks the hash.
    Shape metadata rides in the struct; a shape-only probe prunes the
    data column as usual."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    rows = F.lit(5)
    cols = (F.lit(4) + F.col("doc_id") % 3).cast("int")
    base = (F.col("doc_id") % 50).cast("int")
    data = F.transform(
        F.sequence(F.lit(0), rows * cols - 1),
        lambda k: (base + 2 * (k / cols).cast("int") + 3 * (k % cols)).cast(
            "float"
        ),
    )
    t = d.select(
        "doc_id",
        F.struct(F.array(rows, cols).alias("shape"), data.alias("data")).alias(
            "tensor"
        ),
    )
    n_cols = F.element_at(F.col("tensor.shape"), 2)
    i0, i1 = F.lit(2), F.lit(3)
    sl = F.slice(
        F.col("tensor.data"), i0 * n_cols + 1, (i1 - i0 + 1) * n_cols
    )
    fsum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return t.select(
        "doc_id",
        fsum(sl).cast("bigint").alias("slice_sum"),
        F.size(sl).cast("bigint").alias("slice_len"),
        F.array_max(sl).cast("bigint").alias("slice_max"),
    )


@register(
    "kv_tensor_reduce_axis",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             3 AS n_rows, 4 + doc_id % 3 AS n_cols, doc_id % 50 AS base
      FROM documents WHERE doc_id < 100),
    cols AS (
      SELECT doc_id, n_rows, n_cols, base, j.v AS j
      FROM t, range(8) j(v) WHERE j.v < n_cols)
    SELECT doc_id, CAST(j AS INTEGER) AS col,
           /* axis-0 sum: sum over i of base + 2i + 3j, i in 0..2 */
           CAST(n_rows * base + 2 * (n_rows - 1) * n_rows // 2
                + n_rows * 3 * j AS BIGINT) AS col_sum
    FROM cols
    """,
)
def kv_tensor_reduce_axis(spark, sf_dir):
    """Axis-0 reduction of a stored rank-2 tensor (per-column sums of a
    time×feature matrix — the 'mean chroma vector' query class in the
    reference's domain): on the flat row-major layout, column j is the
    strided subsequence data[j], data[j+cols], …, folded per column with
    a transform-over-columns × aggregate-over-rows nest — ALL inside one
    JVM expression, emitting one array per tensor, exploded only for the
    scored long format.

    The nested higher-order form is the point: axis reductions on flat
    layouts need index arithmetic (k = i·cols + j), not reshapes, and
    the closed-form oracle pins every (doc, column) sum so a stride bug
    in either index term fails loudly."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    rows = F.lit(3)
    cols = (F.lit(4) + F.col("doc_id") % 3).cast("int")
    base = (F.col("doc_id") % 50).cast("int")
    data = F.transform(
        F.sequence(F.lit(0), rows * cols - 1),
        lambda k: (base + 2 * (k / cols).cast("int") + 3 * (k % cols)).cast(
            "float"
        ),
    )
    t = d.select(
        "doc_id",
        F.struct(F.array(rows, cols).alias("shape"), data.alias("data")).alias(
            "tensor"
        ),
    )
    n_rows = F.element_at(F.col("tensor.shape"), 1)
    n_cols = F.element_at(F.col("tensor.shape"), 2)
    flat = F.col("tensor.data")
    col_sums = F.transform(
        F.sequence(F.lit(0), n_cols - 1),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), n_rows - 1),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(flat, (i * n_cols + j + 1).cast("int")).cast("double"),
        ),
    )
    return (
        t.select("doc_id", F.posexplode(col_sums).alias("col", "s"))
        .select("doc_id", "col", F.col("s").cast("bigint").alias("col_sum"))
    )


@register(
    "kv_tensor_segment_agg",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             6 AS n_rows, 4 + doc_id % 3 AS n_cols, doc_id % 50 AS base,
             2 + doc_id % 2 AS boundary
      FROM documents WHERE doc_id < 100),
    segs AS (
      SELECT doc_id, n_cols, base, boundary, s.v AS seg,
             CASE WHEN s.v = 0 THEN 0 ELSE boundary END AS r0,
             CASE WHEN s.v = 0 THEN boundary ELSE 6 END AS r1
      FROM t, range(2) s(v)),
    px AS (
      SELECT doc_id, seg, r0, r1, n_cols,
             base + 2 * i.v + 3 * j.v AS p
      FROM segs, range(6) i(v), range(8) j(v)
      WHERE i.v >= r0 AND i.v < r1 AND j.v < n_cols)
    SELECT doc_id, CAST(seg AS INTEGER) AS seg,
           CAST(count(*) AS BIGINT) AS n_elems,
           CAST(sum(p) AS BIGINT) AS seg_sum,
           CAST(sum(p) // count(*) AS BIGINT) AS seg_mean_floor
    FROM px GROUP BY doc_id, seg, r0, r1
    """,
)
def kv_tensor_segment_agg(spark, sf_dir):
    """Segment-synchronous tensor aggregation -- the reference domain's
    'beat-synchronous features' op: a stored time x feature matrix
    collapses to per-segment statistics along VARIABLE row boundaries
    (each entity's boundary differs -- here row 2 + doc_id mod 2,
    modeling per-track beat grids).

    Implementation composes the flat-layout primitives: per segment,
    ``slice(data, r0*cols + 1, (r1 - r0)*cols)`` extracts the row span
    and an aggregate fold reduces it -- both JVM higher-order kernels;
    segments explode only the tiny (entity x segment) frame, never the
    elements.  The closed-form oracle re-derives every element from the
    generating formula, so boundary arithmetic errors (the classic
    off-by-one at segment edges) break the hash."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    rows = F.lit(6)
    cols = (F.lit(4) + F.col("doc_id") % 3).cast("int")
    base = (F.col("doc_id") % 50).cast("int")
    boundary = (F.lit(2) + F.col("doc_id") % 2).cast("int")
    data = F.transform(
        F.sequence(F.lit(0), rows * cols - 1),
        lambda k: (base + 2 * (k / cols).cast("int") + 3 * (k % cols)).cast(
            "float"
        ),
    )
    t = d.select(
        "doc_id",
        F.struct(F.array(rows, cols).alias("shape"), data.alias("data")).alias(
            "tensor"
        ),
        boundary.alias("boundary"),
    )
    n_cols = F.element_at(F.col("tensor.shape"), 2)
    n_rows = F.element_at(F.col("tensor.shape"), 1)
    seg = t.select(
        "doc_id",
        "tensor",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("seg"),
        "boundary",
    ).select(
        "doc_id",
        "seg",
        F.when(F.col("seg") == 0, F.lit(0)).otherwise(F.col("boundary")).alias("r0"),
        F.when(F.col("seg") == 0, F.col("boundary")).otherwise(n_rows).alias("r1"),
        F.col("tensor.data").alias("flat"),
        n_cols.alias("nc"),
    )
    span = F.slice(
        F.col("flat"),
        F.col("r0") * F.col("nc") + 1,
        (F.col("r1") - F.col("r0")) * F.col("nc"),
    )
    fsum = F.aggregate(span, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return seg.select(
        "doc_id",
        "seg",
        F.size(span).cast("long").alias("n_elems"),
        fsum.cast("bigint").alias("seg_sum"),
        F.expr(
            "cast(aggregate(slice(flat, r0 * nc + 1, (r1 - r0) * nc), "
            "cast(0.0 as double), (a, x) -> a + cast(x as double)) as bigint) div "
            "size(slice(flat, r0 * nc + 1, (r1 - r0) * nc))"
        ).alias("seg_mean_floor"),
    )


@register(
    "kv_batch_assemble",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             3 * (4 + doc_id % 3) AS n_elems,
             CAST(('0x' || substr(md5('b' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h
      FROM documents WHERE doc_id < 256),
    ordered AS (
      SELECT doc_id, n_elems,
             (row_number() OVER (ORDER BY h, doc_id) - 1) // 8 AS batch_id
      FROM keyed)
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(n_elems) AS BIGINT) AS total_elems,
           CAST(sum(doc_id) AS BIGINT) AS key_sum,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS batch_md5
    FROM ordered GROUP BY batch_id
    """,
)
def kv_batch_assemble(spark, sf_dir):
    """Deterministic minibatch assembly over the stash -- the reference
    ecosystem's training-feed pattern (sample entities, group into
    fixed-size batches, ship each batch's tensors together): entities
    shuffle by the portable hash (a REPRODUCIBLE epoch permutation --
    rerunning the epoch yields identical batches, unlike RNG shuffles),
    rank into batches of 8, and each batch reports its item count, total
    tensor elements (3 x cols per entity here), key sum, and an
    order-insensitive membership fingerprint.

    At 100 TB the hash-rank IS the shuffle: one global rank (range
    partitioning by hash), then batch_id = rank div B keeps whole
    batches within partitions -- the property a downstream mapPartitions
    feeder needs (no cross-partition batch stitching).  The md5-over-
    sorted-keys fingerprint pins exact batch membership, so any drift in
    the permutation or the ranking breaks the hash."""
    from pyspark.sql import Window

    keyed = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 256)
        .select(
            "doc_id",
            (3 * (F.lit(4) + F.col("doc_id") % 3)).cast("long").alias("n_elems"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("b"), F.col("doc_id").cast("string"))), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    ordered = keyed.withColumn(
        "batch_id",
        F.expr("(row_number() OVER (ORDER BY h, doc_id) - 1) div 8"),
    )
    return ordered.groupBy("batch_id").agg(
        F.count("*").alias("n_items"),
        F.sum("n_elems").alias("total_elems"),
        F.sum("doc_id").alias("key_sum"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("doc_id"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("batch_md5"),
    )
