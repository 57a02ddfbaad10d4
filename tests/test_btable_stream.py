"""btable_changes Python Data Source (biggie_spark/btable_stream.py):
batch parity with BTable.changes, Structured Streaming with commit-version
offsets, checkpoint resume, deletion-vector partial-file emission."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggie_spark.btable_stream import register_btable_source
from biggie_spark.tablefmt import BTable


@pytest.fixture()
def src(spark):
    register_btable_source(spark)
    return spark


def _mk(spark, tmp_path, name="t"):
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    t = BTable.create(spark, str(tmp_path / name), df.coalesce(1))
    t.append(
        spark,
        df.select((F.col("k") + 100).alias("k"), "g").coalesce(1),
    )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_read_parity_with_native_changes(src, tmp_path):
    t = _mk(src, tmp_path)
    t.delete(src, "g == 1", mode="merge_on_read")  # partial-file deletes
    t.delete(src, "k >= 130")                      # cow rewrite
    ds = (
        src.read.format("btable_changes")
        .option("startingVersion", 0)
        .load(t.path)
    )
    assert _rows(ds) == _rows(t.changes(src, 0))
    # full history includes the create commit (startingVersion default -1)
    full = src.read.format("btable_changes").load(t.path)
    assert full.filter("_commit_version = 0").count() == 40
    # bounded window
    win = (
        src.read.format("btable_changes")
        .option("startingVersion", 1)
        .option("endingVersion", 2)
        .load(t.path)
    )
    assert {r._commit_version for r in win.collect()} == {2}
    assert _rows(win) == _rows(t.changes(src, 1, 2))


def test_stream_available_now_drains_full_feed(src, tmp_path):
    t = _mk(src, tmp_path)
    t.delete(src, "g == 2", mode="merge_on_read")
    q = (
        src.readStream.format("btable_changes")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("bts_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _rows(src.sql("SELECT * FROM bts_feed"))
    want = _rows(t.changes(src, -1))
    assert got == want and len(got) == 80 + 20  # 2 full files + 20 dv dels


def test_stream_checkpoint_resumes_at_committed_version(src, tmp_path):
    """The exactly-once story: a restart with the same checkpoint sees
    ONLY commits made after the last drained offset.  Uses a parquet
    sink — the memory sink cannot recover from a checkpoint."""
    t = _mk(src, tmp_path)                                  # v0, v1
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            src.readStream.format("btable_changes")
            .load(t.path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return src.read.parquet(out)

    first = drain()
    assert {r._commit_version for r in first.collect()} == {0, 1}
    t.delete(src, "g == 3", mode="merge_on_read")           # v2
    second = drain()  # appends only the NEW window to the sink
    delta = second.filter("_commit_version >= 2")
    assert second.count() == first.count() + 20, (
        "resume must append exactly the new commits, no replays"
    )
    assert delta.count() == 20
    assert {r._change_type for r in delta.collect()} == {"delete"}
    # third drain with no new commits appends nothing
    third = drain()
    assert third.count() == second.count()


def test_schema_evolution_nullfills_older_files(src, tmp_path):
    t = _mk(src, tmp_path)
    t.add_column(src, "w", "bigint")
    t.append(
        src,
        src.createDataFrame([(999, 1, 7)], "k bigint, g bigint, w bigint"),
    )
    ds = src.read.format("btable_changes").load(t.path)
    assert "w" in ds.columns
    old = ds.filter("_commit_version <= 1")
    assert old.count() == 80 and old.filter("w IS NULL").count() == 80
    assert ds.filter("_commit_version = 3 AND w = 7").count() == 1


def test_vacuumed_history_refuses_loudly(src, tmp_path):
    t = _mk(src, tmp_path)
    t.delete(src, "k < 20")  # rewrite file 1
    t.vacuum(keep_versions=1, retention_seconds=0)
    with pytest.raises(Exception, match="vacuumed"):
        (
            src.read.format("btable_changes")
            .option("startingVersion", 0)
            .load(t.path)
            .count()
        )


def test_engine_facade_streams_changes(src, sf_dir, tmp_path):
    from biggie_spark.engine import Engine

    e = Engine.connect(sf_dir, src)
    t = _mk(src, tmp_path)
    sdf = e.btable_changes_stream(t.path)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("bts_engine")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert src.sql("SELECT * FROM bts_engine").count() == 80


# ------------------------------------------------------------ format("btable")
# writer + snapshot reader (BTableDataSource)


def test_btable_format_write_append_overwrite(src, tmp_path):
    """df.write.format('btable'): first append creates the table, later
    appends commit atomically, overwrite replaces contents (and clears
    DV state), and a schema mismatch raises at plan time."""
    path = str(tmp_path / "t")
    df = src.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    df.repartition(3).write.format("btable").mode("append").save(path)
    t = BTable(path)
    assert t.read(src).count() == 100 and t.snapshot().version == 0
    df.selectExpr("k + 1000 AS k", "g").write.format("btable").mode(
        "append"
    ).save(path)
    assert t.read(src).count() == 200
    # per-file stats from the Python writer feed the SAME pruning path
    assert t.scan_file_count("k >= 1000") < t.scan_file_count()
    # JVM MERGE works against Python-written files (stats candidacy)
    t.merge(
        src,
        src.createDataFrame([(1, -1), (9999, -2)], "k bigint, g bigint"),
        on="k",
    )
    assert t.read(src).filter("g < 0").count() == 2
    df.limit(7).write.format("btable").mode("overwrite").save(path)
    assert t.read(src).count() == 7
    with pytest.raises(Exception, match="schema"):
        src.range(3).selectExpr("id AS zzz").write.format("btable").mode(
            "append"
        ).save(path)


def test_btable_format_snapshot_reader_dv_and_version(src, tmp_path):
    """format('btable') reads: DV-aware live rows, version time travel."""
    path = str(tmp_path / "t")
    df = src.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    df.write.format("btable").mode("append").save(path)
    t = BTable(path)
    t.delete(src, "g == 3", mode="merge_on_read")
    got = src.read.format("btable").load(path)
    assert got.count() == 90 and got.filter("g = 3").count() == 0
    assert _rows(got) == _rows(t.read(src))
    v0 = src.read.format("btable").option("version", 0).load(path)
    assert v0.count() == 100


def test_btable_format_timestamp_roundtrip_hostile_tz(src, tmp_path):
    """Timestamps written through the Python writer are pinned to
    instants (naive python datetimes are local-tz wall clocks — the same
    trap the JVM stats fix documents) and their epoch-micros stats drive
    pruning; exact under a python tz far from the session tz."""
    import os as _os
    import time as _time

    old = _os.environ.get("TZ")
    _os.environ["TZ"] = "Pacific/Kiritimati"  # UTC+14
    _time.tzset()
    try:
        path = str(tmp_path / "t")
        tsdf = src.sql(
            "SELECT id AS k, timestamp'2024-03-01 12:00:00'"
            " + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts"
            " FROM range(5)"
        )
        tsdf.coalesce(1).write.format("btable").mode("append").save(path)
        t = BTable(path)
        want = [r.ts for r in tsdf.orderBy("k").collect()]
        assert [r.ts for r in t.read(src).orderBy("k").collect()] == want
        assert [
            r.ts
            for r in src.read.format("btable").load(path).orderBy("k").collect()
        ] == want
        assert t.read(src, where="ts >= '2024-03-01 12:02:00'").count() == 3
    finally:
        if old is None:
            _os.environ.pop("TZ", None)
        else:
            _os.environ["TZ"] = old
        _time.tzset()


def test_btable_stream_sink_exactly_once_epochs(src, tmp_path):
    """writeStream.format('btable'): incremental drains append new data
    only, and a REPLAYED epoch (same txnAppId + batchId) is recognized in
    the commit log and skipped — the Delta txn idempotence contract."""
    import os as _os

    srcdir = tmp_path / "in"
    _os.makedirs(srcdir)
    path = str(tmp_path / "t")
    df = src.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    df.coalesce(1).write.parquet(str(srcdir / "b1"))

    def drain():
        q = (
            src.readStream.schema("k bigint, g bigint")
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(srcdir / "*"))
            .writeStream.format("btable")
            .option("path", path)
            .option("txnAppId", "t_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    t = BTable(path)
    assert t.read(src).count() == 50
    df.selectExpr("k + 100 AS k", "g").coalesce(1).write.parquet(
        str(srcdir / "b2")
    )
    drain()
    assert t.read(src).count() == 100

    # epoch replay straight through the writer API: same batchId twice
    from biggie_spark.btable_stream import _BTableStreamWriter

    w = _BTableStreamWriter(
        t.read(src).schema, {"path": path, "txnappid": "t_sink2"}
    )
    v_before = t.snapshot().version
    w.commit([], batchId=7)
    v_after_first = t.snapshot().version
    assert v_after_first == v_before + 1
    w.commit([], batchId=7)  # replay: must be a no-op
    assert t.snapshot().version == v_after_first
    w.commit([], batchId=8)  # next epoch commits again
    assert t.snapshot().version == v_after_first + 1
