"""§2.H — streaming semantics over the events table.

The scored surface is the **batch-equivalent semantics** of each streaming
op (deterministic, oracle-checkable); each uses exactly the construct the
Structured Streaming twin would (`F.window`, `F.session_window`, static-dim
join), so the same plan incrementalizes under `readStream` unchanged.  The
live micro-batch demos live in biggie_spark/streaming_demo.py (not scored:
streaming output is a function of arrival time, not of the input files).

Watermark note (SURVEY.md §2.H): the reference is a kv-store with no
streaming surface, so late-data semantics follow the Structured Streaming
model wholesale — event-time windows, watermark = max(event time) - delay,
state eviction past the watermark.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import dsum, r4


@register(
    "stream_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
           event_type, count(*) AS n, CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_val
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark, sf_dir):
    """1-hour tumbling windows (bench `q_events_hourly`).  `F.window` is the
    exact construct the streaming twin uses; batch-mode it compiles to a
    plain hash aggregate on the truncated timestamp."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_val"))
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"),
            "event_type",
            "n",
            "sum_val",
        )
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - k * 900 AS win_epoch,
           count(*) AS n, CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_val
    FROM events, range(4) t(k)
    GROUP BY 1
    """,
)
def stream_sliding(spark, sf_dir):
    """1-hour windows sliding every 15 min — each event lands in exactly 4
    windows.  Oracle reproduces Spark's window assignment arithmetically
    (floor-to-slide minus k slides, k in 0..3)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_val"))
        .select(F.unix_timestamp("w.start").alias("win_epoch"), "n", "sum_val")
    )


@register(
    "stream_session",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS session_end,
           count(*) AS n, CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_val
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session(spark, sf_dir):
    """Session windows, 30-minute gap, via native `F.session_window` (the
    streaming-capable construct).  Spark merges sessions while the next
    event starts strictly before prev_ts + gap, so the SQL twin opens a new
    session when the gap is >= 30 min; session end = last ts + gap
    (SURVEY.md §7.3.3 — the classic lag-gap + cumulative-sum rewrite)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_val"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n",
            "sum_val",
        )
    )


@register(
    "stream_watermark_late",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id, count(*) AS n_on_time
    FROM events, m
    WHERE ts >= mx - INTERVAL 7 DAY
    GROUP BY user_id
    """,
)
def stream_watermark_late(spark, sf_dir):
    """Batch twin of watermark-based late-event dropping: watermark =
    max(event time) - 7 days; events older than that are 'late' and
    dropped.  (True watermark progress is per-micro-batch engine state —
    demo in streaming_demo.py; this is the deterministic semantics.)"""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAY"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_on_time"))
    )


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """Batch twin of dropDuplicatesWithinWatermark: keep the first event per
    (user, type) in event-time order — deterministic windowed dedup, same
    state-keying the streaming dedup operator uses."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


@register(
    "stream_stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type, count(*) AS n, CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_val
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def stream_stream_static_join(spark, sf_dir):
    """Stream-static enrichment: the event stream joins a broadcast static
    dimension (customer) — the exact plan a readStream side would produce."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_val"))
    )


@register(
    "stream_stateful_running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_val,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS n_so_far
    FROM events
    """,
)
def stream_stateful_running(spark, sf_dir):
    """Batch twin of a stateful running aggregate (update-mode streaming
    agg / applyInPandasWithState): per-user cumulative value in event-time
    order."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        r4(F.sum("value").over(w)).alias("running_val"),
        F.count("*").over(w).alias("n_so_far"),
    )


@register(
    "stream_join_interval",
    oracle="""
    SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'click'
    """,
)
def stream_join_interval(spark, sf_dir):
    """Batch twin of a stream-stream interval join: every (view, click) pair
    for the same user where the click lands within 30 minutes of the view —
    the canonical event-correlation join (ad attribution, impression ->
    conversion).

    Scale shape: the EQUI key (user_id) carries the join — Spark hashes
    both sides on user_id and applies the time-range bound as a post-join
    predicate inside the same task, so there is no quadratic blow-up and no
    nested-loop join; per-user event lists are small, the range filter is
    local.  The streaming twin (streaming_demo.demo_interval_join) runs the
    identical condition as a watermarked stream-stream join where the time
    bound is what lets Spark evict join state — unbounded stream-stream
    joins cannot GC state, interval-bounded ones can.  gap_s is integer
    microsecond arithmetic (`unix_micros`/`epoch_us`, determinism rule 9)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        "user_id",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("user_id").alias("c_user"),
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            F.expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000").alias(
                "gap_s"
            ),
        )
    )


@register(
    "stream_foreach_batch_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, round(value, 4) AS value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
           CAST(value AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def stream_foreach_batch_upsert(spark, sf_dir):
    """A REAL Structured Streaming run (readStream -> foreachBatch ->
    Trigger.AvailableNow), scored with a full value oracle: the input is
    split into 4 parquet files consumed one micro-batch at a time
    (maxFilesPerTrigger=1), and each batch upserts into an accumulator
    keyed by user_id, keeping the row with the greatest (ts, event_id).

    Keep-greatest merge is associative and commutative, so the final state
    is independent of micro-batch arrival order — which is exactly what
    makes an idempotent foreachBatch sink exactly-once under retries, and
    what makes this streaming op deterministic enough to hash-check against
    a plain window oracle.  The accumulator is localCheckpoint'ed before
    each overwrite (self-overwrite guard, same rule as kv_put_bucketed).

    Scale shape: per batch, one broadcast-sized window over |users| rows;
    state lives in a parquet dir, not executor memory, so accumulated state
    survives restarts (tests/test_streaming_resume.py pins the restart
    path for the checkpointed variant)."""
    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="biggie_fbu_src_")
    acc = tempfile.mkdtemp(prefix="biggie_fbu_acc_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", F.round("value", 4).alias("value")
        )
        ev.repartition(4).write.mode("overwrite").parquet(src)

        schema = spark.read.parquet(src).schema
        acc_has_data = {"v": False}

        def upsert(batch, batch_id):
            merged = batch
            if acc_has_data["v"]:
                # Explicit schema (optimization r14): the accumulator is
                # written with exactly `schema` every batch, so per-batch
                # footer inference (~0.1 s x 3 micro-batches) buys nothing.
                merged = spark.read.schema(schema).parquet(acc).unionByName(
                    batch
                )
            w = Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
            latest = (
                merged.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
                .localCheckpoint()  # materialize the read before overwriting
            )
            latest.write.mode("overwrite").parquet(acc)
            acc_has_data["v"] = True

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        final = spark.read.schema(schema).parquet(acc)
        from biggie_spark.util import epoch_s

        return final.select(
            "user_id",
            epoch_s("ts").alias("last_epoch"),
            F.col("value").alias("last_value"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(acc, ignore_errors=True)


@register(
    "stream_span_dedup_static",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                  FROM documents),
    basewh AS (SELECT DISTINCT md5(array_to_string(tk[p:p+4], ' ')) AS wh
               FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                     FROM toks WHERE len(tk) >= 5 AND doc_id < 400)),
    bw AS (SELECT doc_id, p, md5(array_to_string(tk[p:p+4], ' ')) AS wh
           FROM (SELECT doc_id, unnest(range(1, len(tk)-5+2)) AS p, tk
                 FROM toks WHERE len(tk) >= 5 AND doc_id >= 400)),
    dup AS (SELECT doc_id, p FROM bw WHERE wh IN (SELECT wh FROM basewh)),
    cov AS (SELECT doc_id, p,
                   lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS np
            FROM dup),
    agg AS (SELECT doc_id,
                   sum(CASE WHEN np IS NULL THEN 5
                            ELSE least(np - p, 5) END) AS dt
            FROM cov GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.dt, 0) AS BIGINT) AS dup_vs_base,
           CAST(CASE WHEN 2 * coalesce(a.dt, 0) >= len(t.tk)
                     THEN 1 ELSE 0 END AS BIGINT) AS quarantined
    FROM toks t LEFT JOIN agg a USING (doc_id)
    WHERE t.doc_id >= 400
    """,
)
def stream_span_dedup_static(spark, sf_dir):
    """Batch twin of STREAMING span dedup against a static corpus index —
    the ingest-time filter a 100 TB pipeline runs on every incoming doc:
    the doc's SPAN_W=5 rolling-hash windows probe the BASE corpus's
    duplicated-window posting set (a static frame the stream side
    broadcast-joins), and the doc is quarantined when >= half its tokens
    are covered by base spans.

    Built STRICTLY from streaming-capable constructs — the round-7 span
    ops sweep with lead()/lag() window functions, which Structured
    Streaming cannot run, so this twin computes the per-doc interval
    union WITHOUT them: explode windows -> stream-static LEFT join on the
    window hash -> stateful groupBy(doc_id) collecting matched positions
    -> a single higher-order `aggregate` over the sorted array does the
    union sweep inside the row (state per doc is its own positions,
    bounded by doc length; update-mode emits each doc once).
    `streaming_demo.demo_span_dedup_static` drains the identical plan from
    a readStream source and the test asserts it matches this twin.

    Scale shape: the base posting set is ONE distinct over base windows
    (at 100 TB: the persisted `llm_ingest_pipeline_persisted`-style
    artifact, broadcast or bucket-joined); per incoming doc the probe is
    |doc| hash lookups and O(|doc| log |doc|) local work — nothing scans
    the base per doc, and nothing is pairwise."""
    return _span_static_plan(
        spark, sf_dir, load_table(spark, sf_dir, "documents")
    )


def _span_static_plan(spark, sf_dir, docs_frame):
    """Shared plan builder: `docs_frame` is the incoming-doc side (a batch
    frame here, a readStream frame in streaming_demo.demo_span_dedup_static
    — the SAME lazy plan in both, which is the proof the op
    incrementalizes).  The static base posting set always builds from the
    batch reader."""
    from biggie_spark.util import tokens

    t = docs_frame.select("doc_id", tokens(F.col("text")).alias("tk"))
    base_docs = load_table(spark, sf_dir, "documents")
    tb = base_docs.select("doc_id", tokens(F.col("text")).alias("tk"))
    W = 5

    def windows(frame):
        return (
            frame.filter(F.size("tk") >= W)
            .select(
                "doc_id",
                F.size("tk").alias("n_tokens"),
                F.explode_outer(
                    F.sequence(F.lit(1), F.size("tk") - W + 1)
                ).alias("p"),
                "tk",
            )
            .select(
                "doc_id",
                "n_tokens",
                "p",
                F.md5(F.array_join(F.slice("tk", F.col("p"), W), " ")).alias("wh"),
            )
        )

    base_set = (
        windows(tb.filter(F.col("doc_id") < 400)).select("wh").distinct()
    )
    probe = (
        t.filter(F.col("doc_id") >= 400)
        .select(
            "doc_id",
            F.size("tk").alias("n_tokens"),
            F.explode_outer(
                F.when(
                    F.size("tk") >= W,
                    F.sequence(F.lit(1), F.size("tk") - W + 1),
                )
            ).alias("p"),
            "tk",
        )
        .select(
            "doc_id",
            "n_tokens",
            "p",
            F.md5(F.array_join(F.slice("tk", F.col("p"), W), " ")).alias("wh"),
        )
    )
    hits = probe.join(
        F.broadcast(base_set.withColumn("hit", F.lit(1))), "wh", "left"
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.sort_array(
            F.collect_list(F.when(F.col("hit") == 1, F.col("p")))
        ).alias("ps"),
    )
    # interval-union sweep inside the row: acc = (covered_until, total)
    dup_len = F.aggregate(
        "ps",
        F.struct(F.lit(0).cast("long").alias("cov"), F.lit(0).cast("long").alias("tot")),
        lambda acc, p: F.struct(
            F.greatest(acc["cov"], (p + W - 1).cast("long")).alias("cov"),
            (
                acc["tot"]
                + F.greatest(
                    F.lit(0).cast("long"),
                    (p + W - 1).cast("long")
                    - F.greatest(acc["cov"], (p - 1).cast("long")),
                )
            ).alias("tot"),
        ),
        lambda acc: acc["tot"],
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        dup_len.alias("dup_vs_base"),
        F.when(2 * dup_len >= F.col("n_tokens"), 1)
        .otherwise(0)
        .cast("long")
        .alias("quarantined"),
    )
