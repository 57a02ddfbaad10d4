"""Loader contract tests — pin the events.ts repair so a physical-schema
flip in a future environment (ns-as-bigint vs timestamp_ntz vs timestamp)
is caught at the loader, not five operators deep (VERDICT r2 item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampNTZType

from biggie_spark.io import load_table, normalize_events
from biggie_spark.util import epoch_us


def test_events_ts_is_session_timestamp(spark, sf_dir):
    """Whatever the physical parquet type, the loaded column must be plain
    TIMESTAMP (session tz) — the only dtype every downstream event-time op
    (unix_micros, window(), watermarks) accepts in Spark 4.1."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_events_ts_usable_by_unix_micros(spark, sf_dir):
    """unix_micros must analyze AND the values must round-trip: Spark's µs
    epoch on the repaired column equals DuckDB's epoch_us reading the raw
    file (both UTC)."""
    ev = load_table(spark, sf_dir, "events")
    row = (
        ev.select(F.unix_micros("ts").alias("us"), "event_id")
        .orderBy("event_id")
        .limit(1)
        .collect()[0]
    )
    import duckdb

    exp = duckdb.sql(
        f"SELECT CAST(epoch_us(ts) AS BIGINT) FROM '{sf_dir}/events.parquet' "
        "ORDER BY event_id LIMIT 1"
    ).fetchone()[0]
    assert row["us"] == exp


def test_normalize_events_handles_all_manifestations(spark):
    """normalize_events repairs bigint-ns and timestamp_ntz inputs and
    leaves plain timestamps alone — all three observed driver environments."""
    # bigint nanoseconds
    ns = 1_700_000_000_123_456_789
    df_big = spark.createDataFrame(
        [(ns,)], StructType([StructField("ts", LongType())])
    )
    out = normalize_events(df_big)
    assert dict(out.dtypes)["ts"] == "timestamp"
    us = out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
    assert us == ns // 1000

    # timestamp_ntz (µs precision, no zone) — lossless under UTC session tz
    import datetime

    df_ntz = spark.createDataFrame(
        [(datetime.datetime(2023, 11, 14, 22, 13, 20, 123456),)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    out2 = normalize_events(df_ntz)
    assert dict(out2.dtypes)["ts"] == "timestamp"
    us2 = out2.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
    assert us2 == 1_700_000_000_123_456

    # already-timestamp: no-op
    df_ts = out2
    assert normalize_events(df_ts) is df_ts


def test_epoch_us_accepts_ntz(spark):
    """The defensive helper casts before unix_micros, so raw NTZ input (the
    pre-normalization manifestation) analyzes instead of raising
    DATATYPE_MISMATCH."""
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0),)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    val = df.select(epoch_us("ts").alias("us")).collect()[0]["us"]
    assert val == 1_704_067_200_000_000


def test_timezone_repinned_after_mid_session_mutation(spark, sf_dir):
    """ADVICE r4 item 2: apply_runtime_confs is WeakSet-cached per session,
    but the session timezone is correctness-critical (NTZ repair + epoch
    math vs the UTC DuckDB oracle) — a mid-session mutation must be healed
    on the next load_table, not trusted to the cache."""
    from biggie_spark.io import load_table

    load_table(spark, sf_dir, "nation")  # ensure the session is cached
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_table(spark, sf_dir, "nation")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_kv_put_bucketed_round_trip(spark, sf_dir):
    """ADVICE r4 item 1: the bucketed upsert reads and overwrites the same
    tmp path in one job — the localCheckpoint() before the dynamic-partition
    overwrite makes that defined behavior.  Pin the full round-trip: the op
    runs, upserts exactly one existing key and appends one new key, and its
    own internal assertion verifies untouched buckets stay byte-identical."""
    from biggie_spark.io import load_table
    from biggie_spark.registry import QUERIES

    n_docs = load_table(spark, sf_dir, "documents").count()
    row = QUERIES["kv_put_bucketed"](spark, sf_dir).collect()[0]
    assert row["n"] == n_docs + 1  # one update in place + one new key
    assert row["n_updated"] == 1
