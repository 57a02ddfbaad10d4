"""Live Structured Streaming twins of the §2.H batch operators.

Each demo builds the SAME logical plan as its scored batch twin
(ops/streaming.py) on a `readStream` source and drains it with
Trigger.AvailableNow into a memory sink — proving the operators
incrementalize.  Not oracle-scored: streaming output depends on micro-batch
arrival, watermark progress and state flush timing, which are engine-time,
not input-file, functions (SURVEY.md §2.H).  tests/test_streaming_demo.py
asserts streaming(availableNow) == batch twin where modes allow.

On a real cluster the same code runs continuously: swap AvailableNow for a
processing-time trigger and the memory sink for kafka/delta/parquet.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.io import load_table, normalize_events
from biggie_spark.session import apply_runtime_confs
from biggie_spark.util import r4


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream (schema pinned from the batch reader,
    incl. the ns->timestamp repair)."""
    apply_runtime_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-source streams take a directory; glob-filter to the events table
    ev = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events(ev)


def _drain(df: DataFrame, output_mode: str) -> DataFrame:
    """Run one AvailableNow pass into a memory sink; return the result."""
    name = "demo_" + uuid.uuid4().hex[:8]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    q.stop()
    if not finished:
        raise TimeoutError("AvailableNow drain did not finish; partial results discarded")
    return df.sparkSession.table(name)


def demo_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_tumbling (complete mode: windows finalize at
    end-of-stream without needing the watermark to pass them)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("sum_val"))
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"), "event_type", "n", "sum_val"
        )
    )
    return _drain(agg, "complete")


def demo_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_session: stateful session-window merge."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("sum_val"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n",
            "sum_val",
        )
    )
    return _drain(agg, "complete")


def demo_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_dedup_watermark: stateful key dedup."""
    ev = _events_stream(spark, sf_dir)
    out = ev.withWatermark("ts", "10 minutes").dropDuplicates(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return _drain(out, "append")


def demo_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (count, sum(value)) kept in explicit GroupState across micro-batches —
    the escape hatch for stateful logic `groupBy().agg()` can't express.
    State is keyed by the shuffle key, so the state store shards with the
    partitioning (executor-local at any scale)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [n], "sum_val": [round(total, 4)]}
        )

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, n bigint, sum_val double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain(out, "update")


def demo_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_stream_static_join: stream enriched by a
    broadcast static dimension."""
    ev = _events_stream(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    agg = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .withWatermark("ts", "10 minutes")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("sum_val"))
    )
    return _drain(agg, "complete")


def demo_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_join_interval: a watermarked stream-stream
    inner join.  The interval bound on the join condition is what lets
    Spark evict state — each side keeps only events younger than the
    watermark minus the interval, so state is bounded on an infinite
    stream."""
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
            "user_id",
        )
        .withWatermark("v_ts", "10 minutes")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            F.col("user_id").alias("c_user"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    j = v.join(
        c,
        F.expr(
            "user_id = c_user AND c_ts >= v_ts"
            " AND c_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
    ).select(
        "view_id",
        "click_id",
        "user_id",
        F.expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000").alias("gap_s"),
    )
    return _drain(j, "append")


def demo_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_stream_outer_join: a watermarked
    stream-stream LEFT OUTER interval join.  Outer emission is the part
    inner joins don't exercise — a view's null-padded row may only emit
    once the watermark proves no matching click can still arrive (state
    eviction time = watermark − 30 min interval), so rows near the end of
    a finite stream legitimately stay IN state when an AvailableNow drain
    terminates.  tests/test_streaming_demo.py asserts the mode-aware
    containment: matched rows equal the batch inner join exactly, and
    every null-padded row the stream emits is clickless in the batch
    twin."""
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
            "user_id",
        )
        .withWatermark("v_ts", "10 minutes")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            F.col("user_id").alias("c_user"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    j = v.join(
        c,
        F.expr(
            "user_id = c_user AND c_ts >= v_ts"
            " AND c_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select(
        "view_id",
        "click_id",
        "user_id",
        F.expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000").alias("gap_s"),
    )
    return _drain(j, "append")


def demo_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via the Spark 4 `transformWithStateInPandas`
    API (StatefulProcessor + typed state handles) — the successor to
    applyInPandasWithState above, shown side-by-side so both stateful
    surfaces are covered.  Per-user running (count, max value) kept in a
    ValueState; state shards with the user_id partitioning exactly like the
    GroupState variant, so the state store is executor-local at any scale.

    Runtime dependency: the TWS Python worker speaks protobuf to the state
    server — google.protobuf must be on the image (standard on Spark 4
    clusters; absent in this CI container, where the matching test
    importorskips and the GroupState demo provides the verified stateful
    path)."""
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = (0, float("-inf"))
            if self._state.exists():
                n, mx = self._state.get()
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "max_val": [round(mx, 4)]}
            )

        def close(self) -> None:
            pass

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        RunningMax(),
        outputStructType="user_id bigint, n bigint, max_val double",
        outputMode="Update",
        timeMode="None",
    )
    return _drain(out, "update")


def demo_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING source on the Spark 4 Python DataSource API
    (`SimpleDataSourceStreamReader`): the reader drains
    offset-ranged batches from a synthetic sequence — the contract a queue/REST
    poller implements (initialOffset → read(start) → commit).  Batch
    rows are closed-form in the offset, so the drained result is exactly
    the offset range the engine committed; the matching test asserts the
    drained rows reproduce the formula (the rows-only determinism
    streaming allows, SURVEY.md §2.H).

    Scale note: a simple stream reader executes on the DRIVER (it is the
    single-offset-log variant for low-volume control streams); the
    partition-planned `DataSourceStreamReader` form adds executor
    parallelism with the same offset contract — the batch twin
    (src_python_datasource) demonstrates that partition planning."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class SeqStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            # each call drains everything currently available (120 rows);
            # Trigger.AvailableNow issues one read and stops once the
            # offset stops advancing
            lo = start["i"]
            hi = 120
            rows = [(i, (i * 7) % 100) for i in range(lo, hi)]
            return iter(rows), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(
                [(i, (i * 7) % 100) for i in range(start["i"], end["i"])]
            )

    class SeqStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "biggie_seq_stream"

        def schema(self):
            return "id bigint, score int"

        def simpleStreamReader(self, schema):
            return SeqStreamReader()

    spark.dataSource.register(SeqStreamSource)
    df = spark.readStream.format("biggie_seq_stream").load()
    return _drain(df.filter(F.col("id") < 120), "append")


def demo_span_dedup_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_span_dedup_static: incoming documents as a
    file-source stream, each doc's SPAN_W=5 window hashes probing the
    STATIC base posting set via a stream-static left join, per-doc state =
    the matched positions (bounded by doc length), interval union computed
    by a higher-order aggregate inside the emitted row.  Update mode: each
    doc's final row emits when its group state flushes at the AvailableNow
    drain."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.ops.streaming import _span_static_plan

    return _drain(_span_static_plan(spark, sf_dir, docs_stream), "update")


def demo_preference_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_preference_pairs_static: completions
    arrive as a file-source stream, each prompt group's chosen/rejected
    pair is the single groupBy aggregate's state (BIGINT-encoded argmax /
    argmin — no window functions), updating incrementally as candidates
    land.  Update mode: each prompt's final pair emits when its group
    state flushes at the AvailableNow drain."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.ops.round9 import _preference_agg_plan

    return _drain(_preference_agg_plan(docs_stream), "update")


def demo_prefix_reuse_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_prefix_reuse_static: requests arrive as a
    file-source stream; each shared prefix's population/first-filler/
    saved-tokens row is one groupBy aggregate's state, updating as
    requests land (the live prefix-cache hit dashboard).  Update mode."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.ops.round9b import _prefix_reuse_plan

    return _drain(_prefix_reuse_plan(docs_stream), "update")


def demo_spec_accept_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_spec_accept_static: the draft vocabulary
    is computed ONCE from the batch corpus (the static side of the
    stream-static join); requests stream in and each (request, block)
    acceptance row is one groupBy aggregate's state.  Update mode."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.io import load_table
    from biggie_spark.ops.round9b import _spec_accept_plan, _spec_top_vocab

    top = _spec_top_vocab(load_table(spark, sf_dir, "documents"))
    return _drain(_spec_accept_plan(docs_stream, top), "update")


def demo_lang_gate_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_lang_gate_static run LIVE: documents
    arrive as a file-source stream; each record's confidence/tier row is
    a stateless projection — append mode, the cheapest streaming shape.
    Shares _lang_gate_plan verbatim with the registered batch twin."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.ops.round10b import _lang_gate_plan

    return _drain(_lang_gate_plan(docs_stream), "append")


def demo_expectations_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_expectations_static run LIVE: events
    arrive as a file-source stream; each record's violation flags are a
    stateless projection — append mode.  Shares
    _expectations_record_plan verbatim with the batch twin."""
    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from biggie_spark.ops.round11 import _expectations_record_plan

    return _drain(_expectations_record_plan(ev_stream), "append")


def demo_breach_alerts_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of stream_breach_alerts_static run LIVE: week-2+
    events arrive as a file-source stream, ONE hourly windowed aggregate
    (update mode — windows finalize at the AvailableNow drain), breach
    flags via the stream-static broadcast join to the week-1 baseline.
    Shares _breach_static_plan verbatim with the batch twin."""
    ev = _events_stream(spark, sf_dir)
    from biggie_spark.ops.round13e import _breach_static_plan

    return _drain(_breach_static_plan(spark, sf_dir, ev), "update")
