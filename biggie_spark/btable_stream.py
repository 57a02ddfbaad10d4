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

from biggie_spark.tablefmt import (
    _live_diffs,
    _read_log,
    _replay,
    _require_readable,
    _rng_subtract,
)


def _feed_schema(table_path: str) -> StructType:
    commits = _read_log(table_path)
    snap = _require_readable(_replay(commits, None))
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
    # reader-feature gate at the requested window's END version: a
    # future-feature log must not be silently diffed
    _require_readable(_replay(commits, version_to))
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
    ``fields`` is [(logical name, physical on-file name, arrow type)] —
    plain data so the pickled reader stays import-light on workers; the
    physical name resolves column mapping (renamed columns keep their
    write-time names in data files)."""
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
    for name, phys, pa_type in fields:
        names.append(name)
        if name == "_change_type":
            arrays.append(pa.array([chunk.kind] * n, pa_type))
        elif name == "_commit_version":
            arrays.append(pa.array([chunk.version] * n, pa_type))
        elif phys in tbl.column_names:
            arrays.append(tbl.column(phys).cast(pa_type))
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
        # column mapping: resolve each logical field's physical (on-file)
        # name once, driver-side, from the LATEST snapshot — the same
        # snapshot _feed_schema derived the logical schema from, so the
        # (name, physical) pairs always describe one consistent version
        snap = _require_readable(_replay(_read_log(self.table_path), None))
        self.fields = [
            (f.name, snap.phys(f.name), _arrow_type(f.dataType))
            for f in schema.fields
        ]

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


# --------------------------------------------------------------------------
# format("btable"): the table itself as a Spark data source — snapshot
# READS (DV-aware pyarrow chunks, one task per live file) and WRITES:
# df.write.format("btable").mode("append"/"overwrite").save(path) plus a
# Structured Streaming SINK with Delta-style txn exactly-once
# (option("txnAppId", ...): a retried micro-batch epoch is recognized in
# the commit log and skipped, so sink output is exactly-once per epoch).
# Snapshot reads through BTable.read (JVM parquet scan + stats pruning)
# remain the fast path; this reader exists so format("btable") is
# complete and for consumers that want the plain DataFrame API end to end.

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _SnapshotChunk(InputPartition):
    def __init__(self, table_path: str, rel: str | None, live: list | None):
        self.table_path = table_path
        self.rel = rel
        self.live = live  # None = whole file (no DV)


class _SnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.table_path = options["path"]
        self.version = options.get("version")
        # physical names resolved at the READ version (column mapping:
        # a time-travel read uses that version's own logical->physical map)
        snap = _require_readable(
            _replay(
                _read_log(self.table_path),
                None if self.version is None else int(self.version),
            )
        )
        self.fields = [
            (f.name, snap.phys(f.name), _arrow_type(f.dataType))
            for f in schema.fields
        ]

    def partitions(self):
        commits = _read_log(self.table_path)
        v = None if self.version is None else int(self.version)
        snap = _require_readable(_replay(commits, v))
        chunks = [
            _SnapshotChunk(
                self.table_path,
                rel,
                None
                if not snap.dvs.get(rel)
                else _rng_subtract(
                    [[0, a.get("rows", 0)]], snap.dvs[rel]
                ),
            )
            for rel, a in sorted(snap.files.items())
        ]
        return chunks or [_SnapshotChunk(self.table_path, None, None)]

    def read(self, partition: _SnapshotChunk):
        chunk = _ChangeChunk(
            partition.table_path, partition.rel, partition.live, "", 0
        )
        fields = [f for f in self.fields]  # table cols only (no feed cols)
        yield from _read_chunk(chunk, fields)


_STATS_TYPES = {
    "long", "integer", "short", "byte", "double", "float",
    "string", "date", "timestamp", "decimal",
}


def _write_partition(
    table_path: str, fields: list, rows_iter
) -> dict | None:
    """Executor-side: write one partition's rows as one parquet file under
    data/, returning the add action (path + rows + min/max/null stats in
    EXACTLY tablefmt's conventions — timestamps as epoch micros — so
    stats pruning and MERGE key-range candidacy work on Python-written
    files identically to JVM-written ones)."""
    import datetime as _dt
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    names = [n for n, _ in fields]
    cols: dict[str, list] = {n: [] for n in names}
    n_rows = 0
    for row in rows_iter:
        n_rows += 1
        for i, n in enumerate(names):
            cols[n].append(row[i])
    if n_rows == 0:
        return None
    arrays = []
    for n, pa_type in fields:
        vals = cols[n]
        if pa.types.is_timestamp(pa_type):
            # Spark hands the Python writer naive datetimes rendered in
            # the PYTHON process tz (the same trap tablefmt's JVM stats
            # fix documents): pin them to instants via the local tz
            # before storing, and store tz-aware (isAdjustedToUTC) so
            # readers in any session tz see the same instant.
            vals = [
                None
                if v is None
                else v.astimezone(_dt.timezone.utc)
                for v in vals
            ]
            arrays.append(pa.array(vals, pa.timestamp("us", tz="UTC")))
        else:
            arrays.append(pa.array(vals, pa_type))
    tbl = pa.table(dict(zip(names, arrays)))
    rel_dir = os.path.join(_DATA_DIR_NAME, f"w{_uuid.uuid4().hex[:12]}")
    os.makedirs(os.path.join(table_path, rel_dir), exist_ok=True)
    rel = os.path.join(rel_dir, "part-0.parquet")
    pq.write_table(tbl, os.path.join(table_path, rel))
    stats, nulls = {}, {}
    for n, pa_type in fields:
        col = tbl.column(n)
        type_name = "timestamp" if pa.types.is_timestamp(pa_type) else None
        if n in _stats_cols(fields):
            nulls[n] = int(col.null_count)
            live = col.drop_null()
            if len(live) == 0:
                stats[n] = [None, None]
                continue
            mm = pc.min_max(live)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if type_name == "timestamp":
                # epoch micros ints, matching tablefmt's unix_micros stats
                ep = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                lo = int((lo - ep).total_seconds() * 1_000_000)
                hi = int((hi - ep).total_seconds() * 1_000_000)
            else:
                from biggie_spark.tablefmt import _plain

                lo, hi = _plain(lo), _plain(hi)
            stats[n] = [lo, hi]
    return {"path": rel, "rows": n_rows, "stats": stats, "nulls": nulls}


_DATA_DIR_NAME = "data"


def _stats_cols(fields: list) -> set:
    # first 32 stats-eligible columns, mirroring tablefmt._STATS_COLS_MAX;
    # eligibility is by arrow type (all _arrow_type outputs are eligible
    # except binary/bool, mirroring the JVM list)
    import pyarrow as pa

    out = []
    for n, pa_type in fields:
        if pa.types.is_binary(pa_type) or pa.types.is_boolean(pa_type):
            continue
        out.append(n)
        if len(out) >= 32:
            break
    return set(out)


class _AddMsg(WriterCommitMessage):
    def __init__(self, add: dict | None):
        self.add = add


def _check_write_schema(schema: StructType, table_path: str) -> None:
    if not os.path.isdir(os.path.join(table_path, "_log")):
        return  # new table: first commit pins the schema
    commits = _read_log(table_path)
    snap = _require_readable(_replay(commits, None))
    if snap.constraints:
        # the Python-source writer sees rows only executor-side and
        # cannot run the CHECK validation pass — refusing is the safe
        # default (use BTable.append, which enforces constraints)
        raise ValueError(
            "btable write: table has CHECK constraints "
            f"({sorted(snap.constraints)}); write through BTable.append "
            "so they are enforced"
        )
    if snap.mapped:
        # executor-side partition writers emit columns under the names
        # they were handed (logical) — on a column-mapped table data
        # files need PHYSICAL names; refuse rather than corrupt
        raise ValueError(
            "btable write: table uses column mapping (rename/drop "
            "history); write through BTable.append"
        )
    if snap.row_tracking:
        # the writer's commit path doesn't allocate row-id bases;
        # refusing keeps every add action id-complete
        raise ValueError(
            "btable write: table has row tracking enabled; write "
            "through BTable.append"
        )
    import json as _json

    table = StructType.fromJson(_json.loads(snap.schema_json))
    got = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in table.fields]
    if got != want:
        raise ValueError(
            f"btable write schema {got} != table schema {want}"
        )


def _commit_with_retry(table_path: str, build_doc, retries: int = 5) -> int:
    """Driver-side: assemble and claim the next version, re-reading the
    log on CommitConflict (the optimistic-concurrency loop DML uses)."""
    from biggie_spark.tablefmt import BTable, CommitConflict

    t = BTable(table_path)
    for _ in range(retries + 1):
        commits = (
            _read_log(table_path)
            if os.path.isdir(os.path.join(table_path, "_log"))
            else []
        )
        expected = commits[-1]["version"] if commits else -1
        doc = build_doc(commits, expected)
        if doc is None:
            return expected  # idempotent skip (txn already committed)
        if expected == -1:
            os.makedirs(os.path.join(table_path, "_log"), exist_ok=True)
        try:
            return t._commit(expected_version=expected, doc=doc)
        except CommitConflict:
            continue
    raise CommitConflict(f"btable write lost {retries + 1} commit races")


class _BTableBatchWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.table_path = options["path"]
        self.overwrite = overwrite
        self.schema_json = schema.json()
        self.fields = [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        _check_write_schema(schema, self.table_path)
        os.makedirs(self.table_path, exist_ok=True)

    def write(self, iterator) -> _AddMsg:
        return _AddMsg(_write_partition(self.table_path, self.fields, iterator))

    def commit(self, messages) -> None:
        adds = [m.add for m in messages if m is not None and m.add]

        def build(commits, expected):
            if expected == -1:
                return {
                    "op": "create",
                    "schema": self.schema_json,
                    "add": adds,
                }
            if self.overwrite:
                snap = _require_readable(_replay(commits, None))
                return {
                    "op": "overwrite",
                    "remove": sorted(snap.files),
                    "add": adds,
                    "dv_reset": True,
                }
            return {"op": "append", "add": adds}

        _commit_with_retry(self.table_path, build)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.add:
                try:
                    os.unlink(os.path.join(self.table_path, m.add["path"]))
                except OSError:
                    pass


class _BTableStreamWriter(DataSourceStreamWriter):
    """Streaming sink with Delta-style transactional idempotence: each
    epoch's commit doc carries {"txn": {app, batch}}; a retried epoch
    (same txnAppId + batchId already in the log) is skipped, so the sink
    is exactly-once per epoch on top of at-least-once delivery."""

    def __init__(self, schema: StructType, options: dict):
        self.table_path = options["path"]
        self.app = options.get("txnappid", "btable_stream")
        self.schema_json = schema.json()
        self.fields = [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        _check_write_schema(schema, self.table_path)
        os.makedirs(self.table_path, exist_ok=True)

    def write(self, iterator) -> _AddMsg:
        return _AddMsg(_write_partition(self.table_path, self.fields, iterator))

    def commit(self, messages, batchId: int) -> None:
        adds = [m.add for m in messages if m is not None and m.add]

        def build(commits, expected):
            last = max(
                (
                    c["txn"]["batch"]
                    for c in commits
                    if c.get("txn", {}).get("app") == self.app
                ),
                default=-1,
            )
            if batchId <= last:
                return None  # epoch replay: already committed
            doc: dict[str, Any] = {
                "op": "append",
                "add": adds,
                "txn": {"app": self.app, "batch": batchId},
            }
            if expected == -1:
                doc["op"] = "create"
                doc["schema"] = self.schema_json
            return doc

        _commit_with_retry(self.table_path, build)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.add:
                try:
                    os.unlink(os.path.join(self.table_path, m.add["path"]))
                except OSError:
                    pass


class BTableDataSource(DataSource):
    """``format("btable")``: snapshot reads (``version`` option for time
    travel) and transactional writes (append/overwrite; streaming sink
    with ``txnAppId`` exactly-once epochs).  ``BTable.read`` remains the
    performance path for batch reads (JVM scan + stats pruning)."""

    @classmethod
    def name(cls) -> str:
        return "btable"

    def schema(self) -> StructType:
        commits = _read_log(self.options["path"])
        snap = _require_readable(_replay(commits, None))
        import json as _json

        return StructType.fromJson(_json.loads(snap.schema_json))

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _BTableBatchWriter(schema, dict(self.options), overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _BTableStreamWriter(schema, dict(self.options))


def register_btable_source(spark: SparkSession) -> None:
    """Idempotently register the btable data sources (feed + table)."""
    spark.dataSource.register(BTableChangesDataSource)
    spark.dataSource.register(BTableDataSource)
