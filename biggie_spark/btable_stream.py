"""btable as a real Spark DATA SOURCE — batch and Structured Streaming
reads of the change feed through the public Python Data Source API
(pyspark.sql.datasource, Spark 4.x):

    from biggie_spark.btable_stream import register_btable_source
    register_btable_source(spark)

    # batch: the change feed as a frame (parity with BTable.changes)
    spark.read.format("btable_changes").load(path)

    # streaming: micro-batches track the commit log; offsets are commit
    # versions, so restarts resume exactly where the checkpoint left off
    (spark.readStream.format("btable_changes").load(path)
         .writeStream.option("checkpointLocation", ckpt)...)

Why this shape is scale-honest:

* **Offsets are commit versions** — tiny, monotone, exactly-once by
  construction: a micro-batch is the half-open version window
  ``(start, end]`` and replaying it is deterministic (immutable files +
  the ``_live_diffs`` range algebra), so checkpoint recovery re-reads
  the same rows.
* **Driver work is metadata-only**: ``latestOffset`` reads the JSON
  log; ``partitions`` runs the same per-version live-row diff the CDF
  uses (deletion vectors included — partial-file deletes, resurrect
  inserts) and ships (file, ranges) chunks.  One partition per changed
  file per version: parallelism tracks the commit's physical footprint.
* **Executor reads are Arrow-vectorized**: each chunk reads its ONE
  parquet file with pyarrow, slices the changed row ranges (zero-copy),
  and yields RecordBatches — no per-row Python loop.
* The per-task unit is one data file — the same bound as any parquet
  scan task; a 100 TB table streams its DELTAS, never its history,
  and a full-history backfill is just ``startingVersion=-1`` fanning
  out one task per file.

The source is intentionally read-only and feed-shaped (rows +
``_change_type``/``_commit_version``): snapshot reads stay on
``BTable.read`` (JVM parquet scan with stats pruning — strictly better
than any Python source for batch), and the CDC-upsert WRITE path stays
on foreachBatch + MERGE (tests/test_tablefmt.py's streaming sink test).

Known upstream limitation: the Python Data Source API has no hook to
declare Trigger.AvailableNow support, so Spark logs a fallback to
single-batch execution — semantically the same drain (one batch from
the checkpointed offset to latestOffset); checkpoint resume is
unaffected (tests/test_btable_stream.py pins it).
"""

from __future__ import annotations

import os
from typing import Any, Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from biggie_spark.tablefmt import _live_diffs, _read_log, _replay


def _feed_schema(table_path: str) -> StructType:
    commits = _read_log(table_path)
    snap = _replay(commits, None)
    base = StructType.fromJson(__import__("json").loads(snap.schema_json))
    return StructType(
        list(base.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
        ]
    )


def _arrow_type(dt):
    import pyarrow as pa

    name = dt.typeName()
    flat = {
        "long": pa.int64(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "byte": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "binary": pa.binary(),
    }
    if name in flat:
        return flat[name]
    if name == "timestamp":
        return pa.timestamp("us")
    if name == "decimal":
        return pa.decimal128(dt.precision, dt.scale)
    raise TypeError(f"btable_changes: unsupported column type {name}")


class _ChangeChunk(InputPartition):
    """One (file, changed-ranges, kind, version) unit of feed work."""

    def __init__(
        self,
        table_path: str,
        rel: str | None,
        ranges: list | None,  # None = whole file
        kind: str,
        version: int,
    ):
        self.table_path = table_path
        self.rel = rel
        self.ranges = ranges
        self.kind = kind
        self.version = version


def _chunks_for(
    table_path: str, version_from: int, version_to: int
) -> list[_ChangeChunk]:
    commits = _read_log(table_path)
    chunks = []
    for v, kind, rel, rngs, is_full in _live_diffs(
        commits, version_from, version_to
    ):
        if not os.path.exists(os.path.join(table_path, rel)):
            raise FileNotFoundError(
                f"btable_changes({version_from}, {version_to}): data file "
                f"vacuumed: {rel}"
            )
        chunks.append(
            _ChangeChunk(table_path, rel, None if is_full else rngs, kind, v)
        )
    return chunks


def _read_chunk(chunk: _ChangeChunk, fields: list) -> Iterator:
    """Executor-side: read ONE file's changed ranges as Arrow batches.
    ``fields`` is [(name, typeName, precision, scale)] — plain data so the
    pickled reader stays import-light on workers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if chunk.rel is None:
        return
    tbl = pq.read_table(os.path.join(chunk.table_path, chunk.rel))
    if chunk.ranges is not None:
        pieces = [tbl.slice(s, e - s) for s, e in chunk.ranges]
        tbl = (
            pa.concat_tables(pieces) if pieces else tbl.slice(0, 0)
        )
    n = len(tbl)
    arrays, names = [], []
    for name, pa_type in fields:
        names.append(name)
        if name == "_change_type":
            arrays.append(pa.array([chunk.kind] * n, pa_type))
        elif name == "_commit_version":
            arrays.append(pa.array([chunk.version] * n, pa_type))
        elif name in tbl.column_names:
            arrays.append(tbl.column(name).cast(pa_type))
        else:  # schema evolution: older file lacks the column
            arrays.append(pa.nulls(n, pa_type))
    out = pa.table(dict(zip(names, arrays)))
    for batch in out.to_batches():
        yield batch


class _FeedReaderMixin:
    def __init__(self, schema: StructType, options: dict):
        self.table_path = options["path"]
        self.start_version = int(options.get("startingversion", -1))
        self.end_version = options.get("endingversion")
        self.fields = [(f.name, _arrow_type(f.dataType)) for f in schema.fields]

    def read(self, partition: _ChangeChunk):
        yield from _read_chunk(partition, self.fields)


class _FeedBatchReader(_FeedReaderMixin, DataSourceReader):
    def partitions(self):
        commits = _read_log(self.table_path)
        last = (
            int(self.end_version)
            if self.end_version is not None
            else commits[-1]["version"]
        )
        chunks = _chunks_for(self.table_path, self.start_version, last)
        # Spark requires >= 1 partition; a no-change window yields one
        # empty sentinel chunk (rel=None reads nothing)
        return chunks or [
            _ChangeChunk(self.table_path, None, None, "insert", last)
        ]


class _FeedStreamReader(_FeedReaderMixin, DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        commits = _read_log(self.table_path)
        return {"version": commits[-1]["version"]}

    def partitions(self, start: dict, end: dict):
        chunks = _chunks_for(
            self.table_path, int(start["version"]), int(end["version"])
        )
        return chunks or [
            _ChangeChunk(
                self.table_path, None, None, "insert", int(end["version"])
            )
        ]

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the commit log; nothing to ack


class BTableChangesDataSource(DataSource):
    """``format("btable_changes")``: the btable change feed as a batch or
    streaming source.  Options: ``path`` (the table directory),
    ``startingVersion`` (exclusive, default -1 = include the create
    commit), ``endingVersion`` (batch only, default latest)."""

    @classmethod
    def name(cls) -> str:
        return "btable_changes"

    def schema(self) -> StructType:
        return _feed_schema(self.options["path"])

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FeedBatchReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _FeedStreamReader(schema, dict(self.options))


def register_btable_source(spark: SparkSession) -> None:
    """Idempotently register the btable_changes data source."""
    spark.dataSource.register(BTableChangesDataSource)
