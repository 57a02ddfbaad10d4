"""btable protocol table features (the Delta Lake table-features idea):
commits that first exercise column mapping / deletion vectors / row
tracking stamp a monotone ``protocol`` union into the log; snapshots
FAIL CLOSED on unknown reader features (no silently-wrong reads from a
future log) and the commit choke point refuses to write a table whose
log carries any unknown feature.

Opt-out by construction: a table that uses no feature carries no
protocol key anywhere (test_plain_tables_carry_no_protocol pins that,
extending the wave-K byte-compatibility pin)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from biggie_spark.tablefmt import (
    BTable,
    UnsupportedTableFeature,
    _log_path,
    _read_log,
)


def _mk(spark, tmp_path, n=30, parts=3, **kw):
    df = (
        spark.range(n)
        .repartition(parts)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    )
    return BTable.create(spark, str(tmp_path / "t"), df, **kw)


def _protocols(t):
    return {
        c["version"]: c["protocol"]
        for c in _read_log(t.path)
        if "protocol" in c
    }


def _forge(t, doc):
    """Append a hand-written commit doc (simulating a FUTURE writer)."""
    commits = _read_log(t.path)
    v = commits[-1]["version"] + 1
    with open(_log_path(t.path, v), "w") as f:
        json.dump({"version": v, "ts": 0.0, "op": "future", **doc}, f)
    return v


# ------------------------------------------------------------- stamping


def test_plain_tables_carry_no_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark, t.read(spark).limit(2))
    t.delete(spark, "k == 0")  # copy-on-write: no feature involved
    t.optimize(spark)
    for c in _read_log(t.path):
        assert "protocol" not in c, c["version"]


def test_dv_delete_stamps_deletion_vectors_once(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.delete(spark, "k == 1", mode="merge_on_read")
    v2 = t.delete(spark, "k == 2", mode="merge_on_read")
    protos = _protocols(t)
    assert protos == {
        v1: {"reader": ["deletion-vectors"], "writer": []}
    }, "only the FIRST feature-exercising commit stamps"
    assert v2 == v1 + 1


def test_rename_stamps_column_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.rename_column("v", "val")
    assert _protocols(t)[v] == {"reader": ["column-mapping"], "writer": []}


def test_row_tracking_is_writer_only(spark, tmp_path):
    t = _mk(spark, tmp_path, row_tracking=True)
    protos = _protocols(t)
    assert protos[0] == {"reader": [], "writer": ["row-tracking"]}
    snap = t.snapshot()
    assert snap.writer_features == {"row-tracking"}
    assert snap.reader_features == set()


def test_enable_row_tracking_stamps(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.enable_row_tracking()
    assert _protocols(t)[v]["writer"] == ["row-tracking"]


def test_features_union_monotone(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete(spark, "k == 1", mode="merge_on_read")
    v = t.rename_column("v", "val")
    # the second stamp carries the UNION, and replay unions regardless
    assert _protocols(t)[v]["reader"] == [
        "column-mapping",
        "deletion-vectors",
    ]
    snap = t.snapshot()
    assert snap.reader_features == {"column-mapping", "deletion-vectors"}


def test_checkpoint_carries_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete(spark, "k == 1", mode="merge_on_read")
    for i in range(12):  # cross the 10-commit checkpoint cadence
        t.append(spark, t.read(spark).limit(1))
    cps = [
        n
        for n in os.listdir(os.path.join(t.path, "_log"))
        if n.endswith(".checkpoint.json")
    ]
    assert cps
    with open(os.path.join(t.path, "_log", sorted(cps)[-1])) as f:
        cp = json.load(f)
    assert cp["protocol"]["reader"] == ["deletion-vectors"]
    # checkpoint-based replay restores the feature set
    assert t.snapshot().reader_features == {"deletion-vectors"}


# ---------------------------------------------------------------- gates


def test_unknown_reader_feature_blocks_reads_and_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.read(spark).count()
    v = _forge(t, {"protocol": {"reader": ["v9-encryption"], "writer": []}})
    with pytest.raises(UnsupportedTableFeature, match="v9-encryption"):
        t.read(spark)
    with pytest.raises(UnsupportedTableFeature):
        t.count_rows()
    with pytest.raises(UnsupportedTableFeature):
        t.changes(spark, 0)
    with pytest.raises(UnsupportedTableFeature):
        t.append(spark, spark.range(1).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")))
    # time travel BEFORE the feature-introducing commit stays readable
    assert t.read(spark, version=v - 1).count() == before


def test_unknown_writer_feature_blocks_only_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.read(spark).count()
    _forge(t, {"protocol": {"reader": [], "writer": ["auto-compact-v2"]}})
    # reads are unaffected: writer features don't change row semantics
    assert t.read(spark).count() == before
    assert t.count_rows() == before
    with pytest.raises(UnsupportedTableFeature, match="auto-compact-v2"):
        t.append(spark, t.read(spark, version=0).limit(1))
    with pytest.raises(UnsupportedTableFeature):
        t.delete(spark, "k == 0")
    with pytest.raises(UnsupportedTableFeature):
        t.optimize(spark)


def test_gate_survives_fresh_handle_and_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _forge(t, {"protocol": {"reader": ["future-x"], "writer": []}})
    t2 = BTable(t.path)  # cold handle, no cached state
    with pytest.raises(UnsupportedTableFeature):
        t2.read(spark)


def test_restore_keeps_features(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete(spark, "k == 1", mode="merge_on_read")
    t.restore(0)
    # restoring to a pre-DV version resurrects the rows but the table
    # REMAINS a DV table (features never drop — old readers must still
    # refuse the log, whose history contains DV commits)
    assert t.snapshot().reader_features == {"deletion-vectors"}
    assert t.read(spark).count() == 30


def test_unknown_reader_feature_blocks_data_sources(spark, tmp_path):
    """The format('btable') / format('btable_changes') sources replay
    the log directly — they must hit the same reader-feature gate as
    BTable.snapshot (a future log silently misread through a DataSource
    would be the worst failure mode: no error, wrong rows)."""
    from py4j.protocol import Py4JJavaError

    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    t = _mk(spark, tmp_path)
    _forge(t, {"protocol": {"reader": ["v9-encryption"], "writer": []}})
    # schema resolution happens driver-side in the Python source: the
    # UnsupportedTableFeature surfaces directly or wrapped by py4j
    for fmt in ("btable", "btable_changes"):
        with pytest.raises(
            (UnsupportedTableFeature, Py4JJavaError, Exception),
            match="v9-encryption",
        ):
            spark.read.format(fmt).load(t.path).collect()
