"""btable shallow CLONE (Delta's SHALLOW CLONE idea — a new table whose
create commit references the source snapshot's files by absolute path,
zero data copied) and predicate-scoped OPTIMIZE WHERE (compact one
ingest range's files without touching the rest of the table).

The load-bearing machinery is `_rel_tail`: every position-level join
(_apply_ranges DV filtering, row-id base resolution, DV-delete run
mapping) normalizes add-action paths to their trailing
data/<commit>/<name> segments, so absolute-path adds equi-join the
``_btable_rel`` column exactly like table-relative ones."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from biggie_spark.tablefmt import BTable, _read_log


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .coalesce(1)
        .select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("doc"),
        )
    )


@pytest.fixture()
def src(spark, tmp_path):
    """Source table exercising every carry-over: two files, a DV delete,
    a rename (column mapping), bloom config, row tracking."""
    t = BTable.create(
        spark,
        str(tmp_path / "src"),
        _mk(spark, 0, 25),
        bloom_cols=["doc"],
        bloom_bits=1024,
        row_tracking=True,
    )
    t.append(spark, _mk(spark, 25, 50))
    t.delete(spark, "k == 7", mode="merge_on_read")
    t.rename_column("doc", "fp")
    return t


# ---------------------------------------------------------------- clone


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    assert not glob.glob(
        os.path.join(c.path, "**", "*.parquet"), recursive=True
    ), "shallow clone must copy no data files"
    assert sorted(r["k"] for r in c.read(spark).collect()) == sorted(
        r["k"] for r in src.read(spark).collect()
    )
    assert c.count_rows() == 49  # metadata-only count sees the DV too
    assert c.read(spark, where="k == 7").count() == 0  # DV carried
    assert c.history()[0]["op"] == "clone"


def test_clone_carries_colmap_bloom_and_features(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    # column mapping: logical name reads, physical stats/sidecars resolve
    assert c.read(spark, where=f"fp == '{_md5(13)}'").count() == 1
    assert c.scan_file_count(f"fp == '{_md5(13)}'") == 1  # bloom prunes
    snap = c.snapshot()
    assert snap.reader_features == {"column-mapping", "deletion-vectors"}
    assert snap.writer_features == {"row-tracking"}


def test_clone_carries_row_ids(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    src_ids = {
        r["k"]: r["_row_id"]
        for r in src.read(spark, with_row_ids=True).collect()
    }
    clone_ids = {
        r["k"]: r["_row_id"]
        for r in c.read(spark, with_row_ids=True).collect()
    }
    assert clone_ids == src_ids
    # an update on the CLONE keeps the cloned row's stable id
    images = c.read(spark, where="k == 13").withColumn(
        "fp", F.lit("updated")
    )
    c.merge(spark, images, on="k")
    after = {
        r["k"]: r["_row_id"]
        for r in c.read(spark, with_row_ids=True).collect()
    }
    assert after[13] == src_ids[13]


def test_clone_is_independent_both_ways(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    c.delete(spark, "k >= 40")  # copy-on-write: rewrites into clone dir
    c.delete(spark, "k == 3", mode="merge_on_read")  # DV on abs paths
    assert c.read(spark).count() == 38
    assert src.read(spark).count() == 49, "source must never change"
    src.append(spark, _mk(spark, 50, 60).withColumnRenamed("doc", "fp"))
    assert c.read(spark).count() == 38, "clone pins its snapshot"


def test_clone_as_of_version_and_clone_of_clone(spark, tmp_path, src):
    c0 = src.clone(str(tmp_path / "asof"), version=1)
    assert c0.read(spark).count() == 50  # before the DV delete
    assert "doc" in c0.read(spark).columns  # before the rename
    c = src.clone(str(tmp_path / "dev"))
    cc = c.clone(str(tmp_path / "dev2"))  # abs paths pass through
    assert cc.read(spark).count() == 49
    assert cc.read(spark, where="k == 7").count() == 0


def test_clone_vacuum_never_touches_source(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    c.delete(spark, "k < 25")  # rewrite: one source file out of scope
    deleted = c.vacuum(keep_versions=1, retention_seconds=0)
    assert deleted == [], "vacuum walks only the clone's own data dir"
    assert src.read(spark).count() == 49
    assert c.read(spark).count() == 25  # 49 minus the 24 live k<25 rows


def test_clone_refuses_existing_dest(spark, tmp_path, src):
    src.clone(str(tmp_path / "dev"))
    with pytest.raises(FileExistsError):
        src.clone(str(tmp_path / "dev"))


def test_clone_changes_feed(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "dev"))
    c.append(spark, _mk(spark, 100, 105).withColumnRenamed("doc", "fp"))
    feed = c.changes(spark, 0)  # since the clone-create commit
    assert feed.count() == 5
    assert set(r["_change_type"] for r in feed.collect()) == {"insert"}


# ------------------------------------------------------- optimize where


def _grid(spark, tmp_path, files=4, per=25):
    t = None
    for i in range(files):
        df = _mk(spark, i * per, (i + 1) * per)
        if t is None:
            t = BTable.create(spark, str(tmp_path / "t"), df)
        else:
            t.append(spark, df)
    return t


def test_optimize_where_scopes_compaction(spark, tmp_path):
    t = _grid(spark, tmp_path)
    t.optimize(spark, where="k >= 50")
    ranges = sorted(a["stats"]["k"] for a in t.snapshot().files.values())
    assert ranges == [[0, 24], [25, 49], [50, 99]]
    assert t.read(spark).count() == 100


def test_optimize_where_materializes_scoped_dv_only(spark, tmp_path):
    t = _grid(spark, tmp_path)
    t.delete(spark, "k == 7", mode="merge_on_read")
    t.delete(spark, "k == 77", mode="merge_on_read")
    t.optimize(spark, where="k >= 50")
    snap = t.snapshot()
    # the out-of-scope DV survives; the in-scope one was materialized
    dv_ranges = sorted(a["stats"]["k"] for rel, a in snap.files.items()
                       if snap.dvs.get(rel))
    assert dv_ranges == [[0, 24]]
    assert t.read(spark).count() == 98


def test_optimize_where_no_match_is_noop(spark, tmp_path):
    t = _grid(spark, tmp_path)
    v = t.snapshot().version
    assert t.optimize(spark, where="k >= 1000") == v


def test_optimize_where_rejects_zorder(spark, tmp_path):
    t = _grid(spark, tmp_path)
    with pytest.raises(ValueError, match="whole-table"):
        t.optimize(spark, zorder_by=["k"], where="k >= 50")


# ----------------------------------------------------------- reorg purge


def test_reorg_physically_purges_dropped_columns(spark, tmp_path):
    import pyarrow.parquet as pq

    t = BTable.create(spark, str(tmp_path / "t"), _mk(spark, 0, 30))
    t.rename_column("doc", "fp")
    t.drop_column("fp")
    # metadata-only: the old physical bytes are still in the files
    phys = {
        name
        for rel in t.snapshot().files
        for name in pq.read_schema(os.path.join(t.path, rel)).names
    }
    assert "doc" in phys
    t.reorg(spark)
    phys = {
        name
        for rel in t.snapshot().files
        for name in pq.read_schema(os.path.join(t.path, rel)).names
    }
    assert phys == {"k"}, "dropped column bytes must be gone"
    assert t.read(spark).count() == 30


def test_reorg_materializes_dv_debt_and_carries_ids(spark, tmp_path):
    t = BTable.create(
        spark, str(tmp_path / "t"), _mk(spark, 0, 30), row_tracking=True
    )
    t.delete(spark, "k IN (3, 7)", mode="merge_on_read")
    assert t.snapshot().dvs
    before = {
        r["k"]: r["_row_id"]
        for r in t.read(spark, with_row_ids=True).collect()
    }
    t.reorg(spark)
    snap = t.snapshot()
    assert not snap.dvs, "reorg materializes every deletion vector"
    after = {
        r["k"]: r["_row_id"]
        for r in t.read(spark, with_row_ids=True).collect()
    }
    assert after == before
    assert t.count_rows() == 28


def test_reorg_on_clone_localizes_data(spark, tmp_path, src):
    """reorg + vacuum turns a shallow clone into a full (deep) copy:
    after the rewrite no file reference leaves the clone's directory."""
    c = src.clone(str(tmp_path / "dev"))
    c.reorg(spark)
    for rel in c.snapshot().files:
        assert not os.path.isabs(rel), rel
    assert c.read(spark).count() == 49
    assert c.vacuum(keep_versions=1, retention_seconds=0) == []
    assert src.read(spark).count() == 49
