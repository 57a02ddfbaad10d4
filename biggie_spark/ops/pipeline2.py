"""Round-4 pipeline extensions: sessionization, rolling regression,
deterministic importance sampling, audio frame energy, URL parsing.

Each op follows the house conventions (registry docstring): exact-integer
or r4-rounded outputs, deterministic tie-breaks, DuckDB oracle computing
identical semantics.  Scale notes per op below — every shape here is a
window / hash-agg / 1:1 pandas_udf; no cross joins, no collects.

Reference provenance: the reference mount is empty (SURVEY.md §0), so
these extend the §2 contract the survey authored; no reference file:line
is citable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import epoch_s, tokens

SESSION_GAP_S = 3600  # 1 hour of inactivity ends a session


@register(
    "ts_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events),
    g AS (
      SELECT user_id, event_id, t,
             CASE WHEN t - lag(t) OVER w > {SESSION_GAP_S} THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    s AS (
      SELECT user_id, t,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM g)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           min(t) AS start_s, max(t) AS end_s,
           max(t) - min(t) AS duration_s
    FROM s GROUP BY user_id, session_idx
    """,
)
def ts_sessionize(spark, sf_dir):
    """Gap-based sessionization — the classic telemetry operator: a user's
    events split into sessions wherever the inactivity gap exceeds 1 hour,
    then per-session stats.  Two windows over (user_id) + one hash agg:
    shuffle key is user_id, so at 100 TB the plan is one shuffle of the
    events table and all window work is partition-local.  Ties on ts break
    by event_id in BOTH engines (duplicate timestamps exist in the corpus).
    The streaming twin of this exact semantics is `F.session_window`
    (stream_session, ops/streaming.py); this is the batch/backfill path
    that also emits session ordinals.  Core rewrite in
    :func:`sessionize_frame` (property-tested against a pure-Python
    reference on adversarial inputs in tests/test_pipeline2_props.py)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_s("ts").alias("t")
    )
    return sessionize_frame(e, gap_s=SESSION_GAP_S)


def sessionize_frame(e, gap_s: int = SESSION_GAP_S):
    """Sessionize any (user_id, event_id, t) frame: lag-gap break flags,
    running-sum session ordinals, per-session stats."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    brk = F.when(
        F.col("t") - F.lag("t").over(w) > gap_s, F.lit(1)
    ).otherwise(F.lit(0))
    s = e.withColumn(
        "session_idx",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("t").alias("start_s"),
        F.max("t").alias("end_s"),
        (F.max("t") - F.min("t")).alias("duration_s"),
    )


@register(
    "win_reg_slope",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_orderkey, l_linenumber,
                                         CAST(l_quantity AS BIGINT),
                                         CAST(round(l_extendedprice * 100, 0) AS BIGINT),
                                         l_partkey, l_suppkey) AS rn
      FROM lineitem),
    wins AS (
      SELECT l_returnflag, rn,
             count(*)  OVER w AS n,
             sum(x)    OVER w AS sx,
             sum(y)    OVER w AS sy,
             sum(x*y)  OVER w AS sxy,
             sum(x*x)  OVER w AS sxx
      FROM r WINDOW w AS (PARTITION BY l_returnflag
                          ORDER BY rn ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT l_returnflag, rn,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
    FROM wins WHERE rn <= 50
    """,
)
def win_reg_slope(spark, sf_dir):
    """Rolling OLS regression slope of price-cents vs quantity over the
    last 10 rows per group — the windowed-regression pattern (trend
    detection over ordered telemetry).  Emitted as the exact integer
    (numerator, denominator) pair of the closed-form slope
    (n·Σxy − Σx·Σy)/(n·Σxx − (Σx)²): integer window sums are
    order-independent and engine-exact, where a float quotient could
    straddle a rounding boundary (SURVEY.md convention (c)).  The sort key
    extends to (x, y, partkey, suppkey) because (l_orderkey, l_linenumber)
    is NOT unique in this synthetic corpus (verified at sf0.01) — remaining
    ties are rows identical in (x, y), whose order cannot change any window
    sum.  One shuffle on the partition key; all five sums share a single
    window frame, so Spark evaluates them in one pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
    )
    wo = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "x", "y", "l_partkey", "l_suppkey"
    )
    r = li.withColumn("rn", F.row_number().over(wo))
    wf = Window.partitionBy("l_returnflag").orderBy("rn").rowsBetween(-9, 0)
    wins = r.select(
        "l_returnflag",
        "rn",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
    )
    return wins.filter(F.col("rn") <= 50).select(
        "l_returnflag",
        "rn",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("slope_den"),
    )


@register(
    "llm_importance_sample",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      FROM documents)
    SELECT doc_id, n_chars
    FROM u
    WHERE h * 558 < n_chars * 4294967296
    """,
)
def llm_importance_sample(spark, sf_dir):
    """Deterministic importance sampling: keep each document with
    probability proportional to its weight (n_chars / max corpus length
    558, FIXTURES.md) — the quality-weighted downsampling step of a
    training-data mix.  The acceptance test is the exact integer
    cross-multiplication  md5_bucket·W_max < weight·2³²  (no float
    threshold to straddle), and, like `fn_sample_hash`, selection is a
    pure function of the KEY: stable across engines, reruns, partitioning
    and cluster size — re-running the pipeline selects the same rows.
    Map-only (no shuffle); the md5 prunes nothing from the scan but the
    filter runs inside codegen."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return d.filter(h * 558 < F.col("n_chars") * F.lit(4294967296)).select(
        "doc_id", "n_chars"
    )


FRAME = 16  # PCM samples per analysis frame


@register(
    "mm_audio_energy",
    oracle=f"""
    WITH docs AS (SELECT doc_id, 50 + doc_id % 20 AS n FROM documents
                  WHERE doc_id < 40),
    samples AS (
      SELECT doc_id, k, ((doc_id * 7 + k * 13) % 200) - 100 AS amp
      FROM docs, LATERAL (SELECT unnest(range(n)) AS k)),
    frames AS (
      SELECT doc_id, CAST(k // {FRAME} AS INT) AS frame_idx,
             CAST(sum(abs(amp)) AS BIGINT) AS sum_abs,
             CAST(max(abs(amp)) AS INT) AS peak,
             count(*) AS n_samples
      FROM samples GROUP BY 1, 2)
    SELECT * FROM frames
    """,
)
def mm_audio_energy(spark, sf_dir):
    """Windowed audio frame energy over REAL codec round-trips: each
    document synthesizes a deterministic int16 PCM series, encodes it into
    a RIFF/WAVE container and decodes it back (biggie_spark/multimodal.py
    encode_wav/decode_wav — actual chunk-walking, not a fake), then emits
    per-16-sample-frame |amplitude| energy.  The kernel is an Arrow-batched
    mapInPandas (fan-out: one row in, n/16 frame rows out — the same batch
    shape a real audio feature extractor has); the oracle states the frame
    sums in closed form from the synthesis formula, so a codec header/stride
    bug breaks the hash.  At 100 TB payload bytes stay in one parquet
    column and the kernel parallelism equals partition count."""
    import pandas as pd

    from biggie_spark.multimodal import decode_wav, encode_wav

    def frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "sum_abs": [], "peak": [],
                   "n_samples": []}
            for doc_id in pdf["doc_id"]:
                n = 50 + int(doc_id) % 20
                pcm = [((int(doc_id) * 7 + k * 13) % 200) - 100 for k in range(n)]
                _, _, n_dec, _, _ = decode_wav(encode_wav(pcm))
                assert n_dec == n, "codec round-trip lost samples"
                for f0 in range(0, n, FRAME):
                    chunk = pcm[f0 : f0 + FRAME]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f0 // FRAME)
                    out["sum_abs"].append(sum(abs(a) for a in chunk))
                    out["peak"].append(max(abs(a) for a in chunk))
                    out["n_samples"].append(len(chunk))
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return d.select("doc_id").mapInPandas(
        frames,
        "doc_id bigint, frame_idx int, sum_abs bigint, peak int, n_samples bigint",
    )


TOL_S = 86400  # as-of tolerance: 1 day


@register(
    "join_asof_tolerance",
    oracle=f"""
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
       AND p.ts >= e.ts - INTERVAL {TOL_S} SECOND
    )
    SELECT event_id,
           CAST(floor(epoch(pts)) AS BIGINT) AS prev_purchase_epoch,
           peid AS prev_purchase_eid
    FROM j WHERE rn = 1
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a max-staleness tolerance (pandas `merge_asof
    tolerance=` / kdb wj semantics): the latest prior purchase per user,
    but only if it happened within the last day — older matches become
    NULL, exactly like a feature-store lookup that refuses stale features.

    Same ONE-shuffle union-tag + running `last(ignorenulls)` rewrite as
    `join_asof` (ops/joins.py — no inequality join, linear state); the
    tolerance is applied as a post-filter on the running result, sound
    because the running last is the LATEST prior match: if it is stale,
    every earlier match is staler.  The oracle keeps the independent
    inequality-join formulation with the tolerance in the ON clause."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    probes = ev.select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_eid"),
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
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
    fresh = F.col("prev_ts") >= F.col("ts") - F.expr(f"INTERVAL {TOL_S} SECOND")
    return (
        tagged.withColumn("prev_ts", F.last("p_ts", ignorenulls=True).over(w))
        .withColumn("prev_eid", F.last("p_eid", ignorenulls=True).over(w))
        .filter(F.col("tag") == 0)
        .select(
            "event_id",
            F.when(fresh, F.unix_timestamp("prev_ts")).alias("prev_purchase_epoch"),
            F.when(fresh, F.col("prev_eid")).alias("prev_purchase_eid"),
        )
    )


@register(
    "stream_topk_windowed",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY hour_epoch
                                   ORDER BY n DESC, event_type) AS rk
      FROM c)
    SELECT hour_epoch, event_type, n, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 2
    """,
)
def stream_topk_windowed(spark, sf_dir):
    """Per-hour top-2 event types by count — the "trending topics" shape.
    Batch-equivalent semantics of the streaming twin (`F.window` rollup
    feeding a per-window rank; under `readStream` the same agg runs
    incrementally and the rank applies per emitted window on completion).
    Two stages: hash agg on (hour, type) with map-side partials, then a
    window over the tiny per-hour group — the second shuffle moves only
    hours × types rows, independent of input size.  Ties break on
    event_type ascending in both engines."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"), "event_type", "n"
        )
    )
    wr = Window.partitionBy("hour_epoch").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 2)
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang AS url
      FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=(.*)$', 1) AS lang_param
    FROM u
    """,
)
def fn_url_parse(spark, sf_dir):
    """URL decomposition with Spark's native `parse_url` (HOST / PATH /
    QUERY-param extraction) — the web-corpus normalization primitive.  The
    oracle re-derives the same components with regexes, so the check pins
    parse_url's exact component semantics, not a shared implementation.
    Pure projection: codegen'd JVM expression, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "ts_cumulative_distinct",
    oracle="""
    WITH f AS (
      SELECT event_type, user_id,
             min(CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)) AS first_h
      FROM events GROUP BY event_type, user_id),
    n AS (SELECT event_type, first_h AS hour_epoch, count(*) AS n_new
          FROM f GROUP BY event_type, first_h)
    SELECT event_type, hour_epoch, n_new,
           CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY hour_epoch
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM n
    """,
)
def ts_cumulative_distinct(spark, sf_dir):
    """Cumulative distinct users per event type by hour — the
    growth-accounting metric ("total users who have ever done X as of
    hour h").  A naive rolling count(distinct) over an expanding frame
    re-scans history per step; the exact linear rewrite is: min
    first-seen hour per (type, user) — one hash agg over the corpus —
    then new-user counts per (type, hour) (tiny), then a running sum
    along the HOURS axis partitioned by type.  All corpus-sized work is
    two partial-aggregated shuffles; the window touches only the
    types × hours frame, independent of input row count — the shape that
    keeps the metric computable at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("event_type", "user_id").agg(
        F.min(epoch_s(F.date_trunc("hour", F.col("ts")))).alias("first_h")
    )
    hourly = first.groupBy(
        "event_type", F.col("first_h").alias("hour_epoch")
    ).agg(F.count("*").alias("n_new"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hourly.withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))


N_FEATURE_BUCKETS = 32


@register(
    "llm_feature_hash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents)
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                % {N_FEATURE_BUCKETS} AS INT) AS bucket,
           count(*) AS n
    FROM toks GROUP BY 1, 2
    """,
)
def llm_feature_hash(spark, sf_dir):
    """Hashing-trick bag-of-words features (sparse long format): each token
    maps to one of 32 buckets by md5 and the per-(doc, bucket) counts are
    the feature values — the fixed-dimension, vocabulary-free featurizer
    a streaming ML pipeline uses (no vocab build, no global state, new
    tokens never resize the space).  One explode + one hash aggregate on
    (doc_id, bucket) with map-side partials; md5 keeps the bucket
    assignment engine-portable (SURVEY.md §7.4.8) where Spark's `hash()`
    would not be."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % N_FEATURE_BUCKETS
    ).cast("int")
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("n")
    )


@register(
    "ts_downsample_minmax",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS bucket,
             CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
             event_id
      FROM events),
    r AS (
      SELECT bucket, v_cents, event_id,
             row_number() OVER (PARTITION BY bucket ORDER BY event_id) AS rf,
             row_number() OVER (PARTITION BY bucket ORDER BY event_id DESC) AS rl
      FROM e)
    SELECT bucket * 21600 AS bucket_epoch,
           count(*) AS n,
           min(v_cents) AS min_cents, max(v_cents) AS max_cents,
           CAST(max(CASE WHEN rf = 1 THEN v_cents END) AS BIGINT) AS first_cents,
           CAST(max(CASE WHEN rl = 1 THEN v_cents END) AS BIGINT) AS last_cents
    FROM r GROUP BY bucket
    """,
)
def ts_downsample_minmax(spark, sf_dir):
    """M4-style downsampling — the lossless-for-plotting reduction every
    time-series dashboard runs at scale: per 6-hour pixel bucket keep
    (min, max, first, last) of the series plus the point count.  min/max
    are plain partial-aggregated hash aggs; first/last are window
    row_numbers ordered by event_id (the deterministic arrival key — ts
    has duplicates), all sharing the one shuffle on the bucket key.
    Values ride as exact integer cents (SURVEY.md convention (a)).  Output
    cardinality = bucket count, independent of input rows — the property
    that makes the 100 TB series renderable."""
    ev = load_table(spark, sf_dir, "events").select(
        (epoch_s("ts") / 21600).cast("bigint").alias("bucket"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
        "event_id",
    )
    wf = Window.partitionBy("bucket").orderBy("event_id")
    wl = Window.partitionBy("bucket").orderBy(F.col("event_id").desc())
    r = ev.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rl", F.row_number().over(wl)
    )
    return r.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("v_cents").alias("min_cents"),
        F.max("v_cents").alias("max_cents"),
        F.max(F.when(F.col("rf") == 1, F.col("v_cents"))).cast("bigint").alias("first_cents"),
        F.max(F.when(F.col("rl") == 1, F.col("v_cents"))).cast("bigint").alias("last_cents"),
    ).select(
        (F.col("bucket") * 21600).alias("bucket_epoch"),
        "n", "min_cents", "max_cents", "first_cents", "last_cents",
    )


@register(
    "win_pattern_match",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
      FROM events),
    s AS (
      SELECT user_id, event_type, t, event_id,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
    SELECT user_id, count(*) AS n_patterns,
           min(t) AS first_match_s
    FROM s
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id
    """,
)
def win_pattern_match(spark, sf_dir):
    """Event-sequence pattern detection (MATCH_RECOGNIZE's most common
    shape): per user, occurrences of the CONSECUTIVE view -> click ->
    purchase sequence — stricter than ts_funnel's eventually-ordered
    funnel, because intervening events break the match.  Pure lead()
    chains over one (user_id) window: single shuffle, no self-joins (the
    naive 3-way self-join is quadratic per key at scale).  Ties on ts
    break by event_id in both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = e.withColumn("t1", F.lead("event_type", 1).over(w)).withColumn(
        "t2", F.lead("event_type", 2).over(w)
    )
    hits = s.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
    )
    return hits.groupBy("user_id").agg(
        F.count("*").alias("n_patterns"),
        F.min("t").alias("first_match_s"),
    )


@register(
    "llm_pipeline_e2e",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang, source, text, n_chars
      FROM documents
      WHERE n_chars BETWEEN 120 AND 400
        AND lang IN ('en', 'de', 'fr')),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
      FROM q),
    survivors AS (SELECT doc_id, lang, source, text FROM d WHERE rn = 1),
    s AS (
      SELECT * FROM survivors
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           count(DISTINCT source) AS n_sources
    FROM s GROUP BY lang
    """,
)
def llm_pipeline_e2e(spark, sf_dir):
    """The composed training-data pipeline, end-to-end in ONE lazy plan:
    quality filter -> exact dedup (min-id survivor) -> deterministic
    hash sample -> per-language token accounting.  Every stage is an
    operator this engine ships individually (llm_quality_filter,
    llm_dedup_exact/keep-best, fn_sample_hash semantics, llm_text_stats);
    composing them in one DataFrame chain is the point: Catalyst fuses
    the filters into the scan, the dedup window and the final agg are the
    only two shuffles, and nothing materializes between stages.  The
    oracle replays the identical four stages as CTEs, so the hash check
    covers the COMPOSITION — stage-order bugs, filter/dedup interaction —
    not just each stage alone."""
    d = load_table(spark, sf_dir, "documents")
    q = d.filter(
        F.col("n_chars").between(120, 400) & F.col("lang").isin("en", "de", "fr")
    ).select("doc_id", "lang", "source", "text")
    wd = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    survivors = (
        q.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    sampled = survivors.filter(h % 2 == 0)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("n_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "llm_topic_lift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    st AS (SELECT source, tok, count(*) AS tf_s FROM tok GROUP BY 1, 2),
    ct AS (SELECT tok, count(*) AS tf_c FROM tok GROUP BY 1),
    stot AS (SELECT source, count(*) AS tot_s FROM tok GROUP BY 1),
    ctot AS (SELECT count(*) AS tot_c FROM tok),
    lift AS (
      SELECT st.source, st.tok,
             CAST(st.tf_s * ctot.tot_c * 1000000
                  // (ct.tf_c * stot.tot_s) AS BIGINT) AS lift_e6
      FROM st JOIN ct USING (tok) JOIN stot USING (source) CROSS JOIN ctot
      WHERE st.tf_s >= 3),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY lift_e6 DESC, tok) AS rk
      FROM lift)
    SELECT source, tok, lift_e6, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def llm_topic_lift(spark, sf_dir):
    """Per-source distinguishing tokens by LIFT — P(token|source) over
    P(token|corpus) — the topic-keyword / source-characterization pass a
    corpus audit runs (complements tf-idf, which scores tokens per
    DOCUMENT).  Lift ordering is computed as the exact integer
    (tf_s·tot_c·10⁶) // (tf_c·tot_s) — no float ratio to straddle a
    boundary (SURVEY.md convention (b)).  Shapes: three hash aggregates
    (all map-side partial), a vocab-keyed equi-join, a broadcastable
    per-source totals join, and the corpus total as a 1-row scalar
    broadcast (the audited tf-idf corpus-N pattern); min-support tf_s >= 3
    keeps the rank window off the singleton tail."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
    )
    st = tok.groupBy("source", "tok").agg(F.count("*").alias("tf_s"))
    ct = tok.groupBy("tok").agg(F.count("*").alias("tf_c"))
    stot = tok.groupBy("source").agg(F.count("*").alias("tot_s"))
    ctot = tok.agg(F.count("*").alias("tot_c"))
    lift = (
        st.filter(F.col("tf_s") >= 3)
        .join(ct, "tok")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(ctot))
        .withColumn("num", F.col("tf_s") * F.col("tot_c") * F.lit(1000000))
        .withColumn("den", F.col("tf_c") * F.col("tot_s"))
        # exact BIGINT division (`div`), NOT double `/` + cast: the double
        # quotient can round across an integer boundary where DuckDB's
        # integer `//` floors exactly
        .select("source", "tok", F.expr("num div den").alias("lift_e6"))
    )
    wr = Window.partitionBy("source").orderBy(F.col("lift_e6").desc(), "tok")
    return (
        lift.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p_cents,
             CAST(l_quantity AS BIGINT) AS w,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(round(l_extendedprice * 100, 0) AS BIGINT),
                        l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS totw
      FROM lineitem)
    SELECT l_returnflag, CAST(min(p_cents) AS BIGINT) AS wmedian_cents,
           CAST(max(totw) AS BIGINT) AS total_weight
    FROM r WHERE 2 * cumw >= totw GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median price (weight = quantity) per return flag — the
    robust location statistic inventory/pricing rollups need (the plain
    median treats a 1-unit and a 50-unit line identically).  Classic
    cumulative-weight rewrite: one window pass accumulating weights in
    sorted price order, then the first price where cumulative weight
    crosses half the total.  All quantities are exact BIGINTs and the
    crossing test is the cross-multiplied ``2·cumw >= totw`` (convention
    (c)) — the chosen price is order-invariant under equal-price
    permutations because equal prices collapse to the same emitted value.
    One shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p_cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("p_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    r = li.withColumn("cumw", F.sum("w").over(wc)).withColumn(
        "totw", F.sum("w").over(wt)
    )
    return (
        r.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("p_cents").cast("bigint").alias("wmedian_cents"),
            F.max("totw").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT e.event_id AS event_id,
             p.ts AS pts, p.event_id AS peid,
             abs(epoch(p.ts) - epoch(e.ts)) AS adt,
             CASE WHEN (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
                  THEN 0 ELSE 1 END AS dir,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch(p.ts) - epoch(e.ts)) NULLS LAST,
                        CASE WHEN (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
                             THEN 0 ELSE 1 END,
                        CASE WHEN (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
                             THEN -p.event_id ELSE p.event_id END
             ) AS rn
      FROM events e LEFT JOIN p
        ON e.user_id = p.user_id AND p.event_id <> e.event_id
    )
    SELECT event_id,
           CAST(floor(epoch(pts)) AS BIGINT) AS near_purchase_epoch,
           peid AS near_purchase_eid
    FROM j WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-match as-of join (pandas ``merge_asof direction='nearest'``):
    for every event, the purchase of the same user CLOSEST in time, in
    either direction; ties on |dt| prefer the earlier purchase, then the
    latest prior / earliest later id.

    Linear rewrite: the backward pass (union-tag + running
    ``last(ignorenulls)``, identical to join_asof) and the forward pass
    (same construct on the reversed sort) each cost one window over the
    SAME user_id shuffle — Spark reuses the exchange — and the winner is a
    projection over the two candidates.  The oracle is the independent
    inequality-join + row_number formulation with the matching
    deterministic preference order.  No inequality join, no quadratic
    blow-up per key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    base = ev.select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("long").alias("p_eid"),
    )
    purch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
            F.lit(1).alias("tag"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_eid"),
        )
    )
    tagged = base.unionByName(purch)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "tag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc(), F.col("tag"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    both = (
        tagged.withColumn("prev_ts", F.last("p_ts", ignorenulls=True).over(wb))
        .withColumn("prev_eid", F.last("p_eid", ignorenulls=True).over(wb))
        .withColumn("next_ts", F.last("p_ts", ignorenulls=True).over(wf))
        .withColumn("next_eid", F.last("p_eid", ignorenulls=True).over(wf))
        .filter(F.col("tag") == 0)
    )
    dt_prev = F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
    dt_next = F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    prefer_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (dt_prev <= dt_next)
    )
    return both.select(
        "event_id",
        F.when(prefer_prev, F.unix_timestamp("prev_ts"))
        .otherwise(F.unix_timestamp("next_ts"))
        .alias("near_purchase_epoch"),
        F.when(prefer_prev, F.col("prev_eid"))
        .otherwise(F.col("next_eid"))
        .alias("near_purchase_eid"),
    )


@register(
    "ts_seasonal_profile",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(hour(ts) AS INT) AS hod,
             CAST(round(value * 100, 0) AS BIGINT) AS v_cents
      FROM events)
    SELECT event_type, hod, count(*) AS n,
           CAST(sum(v_cents) AS BIGINT) AS sum_cents,
           CAST(sum(v_cents) // count(*) AS BIGINT) AS mean_cents_floor
    FROM e GROUP BY event_type, hod
    """,
)
def ts_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal baseline per event type — the profile stage of
    seasonal decomposition (subtracting it from the series yields the
    de-seasonalized residual an anomaly detector consumes;
    `ts_anomaly_mad` is the robust-threshold counterpart).  One hash
    aggregate on (type, hour-of-day), fully map-side partial; output is
    |types| x 24 rows regardless of corpus size.  Mean emitted as exact
    integer floor division of BIGINT cents (convention (b))."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
    )
    g = e.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum("v_cents").cast("bigint").alias("sum_cents"),
    )
    return g.withColumn(
        "mean_cents_floor", F.expr("sum_cents div n").cast("bigint")
    )


@register(
    "ts_vwap",
    oracle="""
    WITH l AS (
      SELECT CAST(floor(epoch(date_trunc('day', l_shipdate))) AS BIGINT) AS day_epoch,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p_cents
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-04-01 00:00:00')
    SELECT day_epoch,
           CAST(sum(q * p_cents) AS BIGINT) AS pv_num,
           CAST(sum(q) AS BIGINT) AS vol,
           CAST(sum(q * p_cents) // sum(q) AS BIGINT) AS vwap_cents_floor
    FROM l GROUP BY day_epoch
    """,
)
def ts_vwap(spark, sf_dir):
    """Volume-weighted average price per ship-day — the canonical
    finance/telemetry weighted rollup.  Everything is exact BIGINT
    arithmetic: the price-volume numerator and volume accumulate
    independently (both associative, any cluster order), and the VWAP is
    emitted as numerator, denominator AND their exact integer floor
    quotient — never a float division that could straddle a rounding
    boundary.  Date filter reaches the parquet scan; one partial-agg
    shuffle on the day key."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1995-04-01")
        .select(
            epoch_s(F.date_trunc("day", F.col("l_shipdate"))).alias("day_epoch"),
            F.col("l_quantity").cast("bigint").alias("q"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p_cents"),
        )
    )
    g = li.groupBy("day_epoch").agg(
        F.sum(F.col("q") * F.col("p_cents")).cast("bigint").alias("pv_num"),
        F.sum("q").cast("bigint").alias("vol"),
    )
    return g.withColumn(
        "vwap_cents_floor", F.expr("pv_num div vol").cast("bigint")
    )


@register(
    "win_percent_change",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS day_cents
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT *, lag(day_cents) OVER (PARTITION BY event_type
                                     ORDER BY day_epoch) AS prev_cents
      FROM d)
    SELECT event_type, day_epoch, day_cents,
           CAST((day_cents - prev_cents) * 10000 // prev_cents AS BIGINT)
             AS change_bp
    FROM c WHERE prev_cents IS NOT NULL AND prev_cents > 0
    """,
)
def win_percent_change(spark, sf_dir):
    """Day-over-day percent change per event type, in integer basis points
    (floor) — the period-over-period trend metric every metrics dashboard
    computes.  Daily rollup (partial-agg shuffle on (type, day)) + one lag
    window over the tiny per-type day series; the bp change is exact
    integer arithmetic throughout, emitted as the toward-zero-truncated
    quotient: DuckDB's integer `//` and Spark's `div` BOTH truncate
    toward zero (verified: -7//2 = -3 in DuckDB), so the expressions are
    engine-identical including negative day-over-day changes."""
    d = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            epoch_s(F.date_trunc("day", F.col("ts"))).alias("day_epoch"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("v_cents"),
        )
        .groupBy("event_type", "day_epoch")
        .agg(F.sum("v_cents").cast("bigint").alias("day_cents"))
    )
    w = Window.partitionBy("event_type").orderBy("day_epoch")
    c = d.withColumn("prev_cents", F.lag("day_cents").over(w)).filter(
        F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0)
    )
    q = F.expr("((day_cents - prev_cents) * 10000) div prev_cents")
    return c.select(
        "event_type", "day_epoch", "day_cents",
        q.cast("bigint").alias("change_bp"),
    )


GAP_MIN_S = 7200  # report silences longer than 2 hours


@register(
    "ts_gap_detect",
    oracle=f"""
    WITH e AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
      FROM events),
    g AS (
      SELECT event_type, t,
             lag(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS prev_t
      FROM e)
    SELECT event_type,
           prev_t AS gap_start_s, t AS gap_end_s, t - prev_t AS gap_s
    FROM g WHERE t - prev_t > {GAP_MIN_S}
    """,
)
def ts_gap_detect(spark, sf_dir):
    """Silence detection — the inverse of ts_gapfill: report every interval
    longer than 2 h in which an event type produced NOTHING (monitoring's
    "did the pipeline stall" primitive).  One lag window per type over the
    (type)-partitioned shuffle; emits only the offending intervals, so
    output is proportional to the number of gaps, not the corpus.  Ties on
    t break by event_id in both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", epoch_s("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    g = e.withColumn("prev_t", F.lag("t").over(w))
    return g.filter(F.col("t") - F.col("prev_t") > GAP_MIN_S).select(
        "event_type",
        F.col("prev_t").alias("gap_start_s"),
        F.col("t").alias("gap_end_s"),
        (F.col("t") - F.col("prev_t")).alias("gap_s"),
    )


@register(
    "llm_vocab_jaccard",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    sizes AS (SELECT source, count(*) AS n_vocab FROM st GROUP BY source),
    inter AS (
      SELECT a.source AS s1, b.source AS s2, count(*) AS n_common
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
    SELECT s1, s2, n_common,
           CAST(n_common * 1000000
                // (za.n_vocab + zb.n_vocab - n_common) AS BIGINT)
             AS jaccard_e6
    FROM inter
    JOIN sizes za ON za.source = s1
    JOIN sizes zb ON zb.source = s2
    WHERE n_common * 5 > za.n_vocab
    """,
)
def llm_vocab_jaccard(spark, sf_dir):
    """Pairwise vocabulary Jaccard similarity between SOURCES — the
    corpus-audit matrix ("which feeds are near-clones of each other")
    that decides mix weights and dedup scopes.  The pair generation is a
    token-keyed EQUI-join of the (source, token) vocab sets with
    `s1 < s2` dedup — candidate pairs are proportional to shared-token
    co-occurrences, never the |sources|² × vocab cross product; at 100 TB
    the vocab relation is corpus-compressed (DISTINCT collapses token
    repeats map-side) and the join shuffles on the token key.  Jaccard is
    emitted as exact integer ppm via inclusion-exclusion; min-overlap
    filter keeps the output to meaningfully-similar pairs."""
    st = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n_vocab"))
    a = st.select(F.col("source").alias("s1"), "tok")
    b = st.select(F.col("source").alias("s2"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.select(F.col("source").alias("s1"), F.col("n_vocab").alias("va"))
    zb = sizes.select(F.col("source").alias("s2"), F.col("n_vocab").alias("vb"))
    j = (
        inter.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .filter(F.col("n_common") * 5 > F.col("va"))
        .withColumn("num", F.col("n_common") * 1000000)
        .withColumn("den", F.col("va") + F.col("vb") - F.col("n_common"))
    )
    return j.select(
        "s1", "s2", "n_common", F.expr("num div den").alias("jaccard_e6")
    )
