"""btable wave K: column mapping (rename/drop, Delta's columnMapping
idea — logical log schema over write-time physical file names) and row
tracking (stable row ids = add-action base + parquet row index, carried
through rewrites via a materialized _btable_row_id column).

Both features are strictly opt-in: a table that never renames/drops and
never enables tracking produces byte-identical commit docs and plans to
the pre-wave-K format (test_unmapped_docs_unchanged pins that)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from biggie_spark.tablefmt import BTable, _read_log


def _mk(spark, tmp_path, n=60, parts=3, **kw):
    df = (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.concat(F.lit("g"), F.pmod("id", 5)).alias("grp"),
        )
    )
    return BTable.create(spark, str(tmp_path / "t"), df, **kw)


def _grid(spark, tmp_path, files=4, per=25):
    """files range-disjoint files on k via per-commit coalesce(1)."""
    t = None
    for i in range(files):
        df = (
            spark.range(i * per, (i + 1) * per)
            .coalesce(1)
            .select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        )
        if t is None:
            t = BTable.create(spark, str(tmp_path / "t"), df)
        else:
            t.append(spark, df)
    return t


# --------------------------------------------------------------- mapping


def test_rename_column_metadata_only_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = set(t.snapshot().files)
    v = t.rename_column("v", "val")
    assert v == 1
    assert set(t.snapshot().files) == files_before, "rename touched data"
    got = t.read(spark)
    assert got.columns == ["k", "val", "grp"]
    assert got.agg(F.sum("val")).collect()[0][0] == sum(i * 10 for i in range(60))
    # time travel reads the OLD version under ITS schema
    old = t.read(spark, version=0)
    assert old.columns == ["k", "v", "grp"]
    assert old.count() == 60


def test_rename_is_pure_log_metadata_and_files_keep_physical_names(
    spark, tmp_path
):
    import pyarrow.parquet as pq

    t = _mk(spark, tmp_path, n=20, parts=1)
    t.rename_column("v", "val")
    t.append(
        spark,
        spark.createDataFrame([(100, 1000, "gx")], "k bigint, val bigint, grp string"),
    )
    # EVERY data file (pre- and post-rename) stores the physical name 'v'
    snap = t.snapshot()
    for rel in snap.files:
        names = pq.read_schema(os.path.join(t.path, rel)).names
        assert "v" in names and "val" not in names, (rel, names)
    rows = sorted((r.k, r.val) for r in t.read(spark).collect())
    assert rows[-1] == (100, 1000)
    assert len(rows) == 21


def test_rename_keeps_stats_pruning_sharp(spark, tmp_path):
    t = _grid(spark, tmp_path, files=4, per=25)
    assert t.scan_file_count("k > 80") == 1
    t.rename_column("k", "key")
    assert t.scan_file_count("key > 80") == 1, "stats must follow the rename"
    assert t.scan_file_count() == 4
    assert t.read(spark, where="key > 80").count() == 19
    # DML pruning path too: COW delete on the renamed column rewrites 1 file
    files_before = set(t.snapshot().files)
    t.delete(spark, "key >= 90")
    removed = files_before - set(t.snapshot().files)
    assert len(removed) == 1
    assert t.read(spark).count() == 90


def test_drop_column_never_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, parts=1)
    t.drop_column("v")
    assert t.read(spark).columns == ["k", "grp"]
    # old version still shows it (time travel under the old schema)
    assert t.read(spark, version=0).columns == ["k", "v", "grp"]
    # re-adding the same logical name reads NULL everywhere — the old
    # files still PHYSICALLY contain 'v', but the reborn column has a
    # fresh physical name
    t.add_column(spark, "v", "bigint")  # appends at the END of the schema
    got = t.read(spark)
    assert got.columns == ["k", "grp", "v"]
    assert got.filter("v IS NOT NULL").count() == 0
    # and writes to the reborn column land + read back
    t.append(
        spark,
        spark.createDataFrame(
            [(99, "gx", 990)], "k bigint, grp string, v bigint"
        ),
    )
    assert t.read(spark, where="v IS NOT NULL").count() == 1


def test_rename_swap_chain(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, parts=1)
    # k->tmp, v->k, tmp->v : a full swap of two columns
    t.rename_column("k", "tmpcol")
    t.rename_column("v", "k")
    t.rename_column("tmpcol", "v")
    rows = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert rows[3] == (30, 3), "swap must follow the DATA, not the names"
    assert t.read(spark).columns == ["v", "k", "grp"]


def test_merge_after_rename(spark, tmp_path):
    t = _grid(spark, tmp_path, files=4, per=25)
    t.rename_column("k", "key")
    src = spark.createDataFrame(
        [(5, -1), (200, -2)], "key bigint, v bigint"
    )
    t.merge(spark, src, on="key")
    got = {r.key: r.v for r in t.read(spark).collect()}
    assert got[5] == -1 and got[200] == -2 and got[6] == 60
    assert len(got) == 101


def test_changes_across_rename_emits_version_to_schema(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10, parts=1)
    t.rename_column("v", "val")  # v1
    t.append(
        spark,
        spark.createDataFrame([(50, 500, "gz")], "k bigint, val bigint, grp string"),
    )  # v2
    ch = t.changes(spark, 0)
    assert "val" in ch.columns and "v" not in ch.columns
    ins = ch.filter("_commit_version = 2").collect()
    assert [(r.k, r.val, r._change_type) for r in ins] == [(50, 500, "insert")]


def test_feed_source_reads_renamed_table(spark, tmp_path):
    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    t = _mk(spark, tmp_path, n=10, parts=1)
    t.rename_column("v", "val")
    t.append(
        spark,
        spark.createDataFrame([(50, 500, "gz")], "k bigint, val bigint, grp string"),
    )
    got = (
        spark.read.format("btable_changes")
        .option("path", t.path)
        .option("startingVersion", 1)
        .load()
    )
    assert "val" in got.columns
    rows = got.collect()
    assert [(r.k, r.val) for r in rows] == [(50, 500)]


def test_mapped_table_refuses_python_source_writer(spark, tmp_path):
    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    t = _mk(spark, tmp_path, n=5, parts=1)
    t.rename_column("v", "val")
    df = spark.createDataFrame([(1, 2, "g")], "k bigint, val bigint, grp string")
    with pytest.raises(Exception, match="column mapping"):
        df.write.format("btable").option("path", t.path).mode("append").save()


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5, parts=1)
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("zzz", "a")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("v", "_btable_x")
    t.add_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    assert t.rename_column("v", "val") > 0


def test_rename_clustering_column_follows(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = BTable.create(
        spark, str(tmp_path / "t"), df, cluster_by=["k"], cluster_file_rows=25
    )
    t.rename_column("k", "key")
    assert t.cluster_by == ["key"]
    # appends keep clustering on the renamed column: files stay
    # range-disjoint so a point predicate prunes
    t2 = BTable(t.path)  # fresh handle: cluster_by must come from the LOG
    t2.append(spark, t.read(spark).limit(0))  # no-op rows, exercises path
    assert t2.scan_file_count("key > 95") <= 2


def test_unmapped_docs_unchanged(spark, tmp_path):
    """No rename/drop, no tracking -> commit docs carry NONE of the wave-K
    keys; the on-disk format is byte-compatible with round-13 tables."""
    t = _mk(spark, tmp_path, n=20, parts=1)
    t.append(spark, t.read(spark).limit(2))
    t.delete(spark, "k == 0")
    for c in _read_log(t.path):
        for key in ("colmap", "row_id_hwm", "row_tracking", "row_id_assign"):
            assert key not in c, (c["version"], key)
        for add in c.get("add", []):
            assert "base_row_id" not in add and "row_ids_materialized" not in add


# ---------------------------------------------------------- row tracking


def _ids(t, spark, version=None):
    return {
        r.k: r._row_id
        for r in t.read(spark, version=version, with_row_ids=True).collect()
    }


def test_row_ids_assigned_and_unique(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, parts=3, row_tracking=True)
    ids = _ids(t, spark)
    assert len(ids) == 60 and len(set(ids.values())) == 60
    assert set(ids.values()) == set(range(60)), "create allocates 0..n-1"


def test_enable_row_tracking_on_existing_table(spark, tmp_path):
    t = _mk(spark, tmp_path, n=30, parts=2)
    with pytest.raises(ValueError, match="row tracking"):
        t.read(spark, with_row_ids=True)
    t.enable_row_tracking()
    ids = _ids(t, spark)
    assert len(set(ids.values())) == 30
    assert _ids(t, spark) == ids, "ids must be deterministic across reads"
    # idempotent
    v = t.snapshot().version
    assert t.enable_row_tracking() == v


def test_row_ids_stable_across_optimize(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, parts=3, row_tracking=True)
    before = _ids(t, spark)
    v = t.optimize(spark)  # 3 small files -> 1
    assert v == 1 and len(t.snapshot().files) == 1
    assert _ids(t, spark) == before, "compaction must carry row ids"
    # the rewritten file materializes its ids
    (add,) = t.snapshot().files.values()
    assert add.get("row_ids_materialized") is True


def test_row_ids_stable_across_cow_delete_and_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, parts=3, row_tracking=True)
    before = _ids(t, spark)
    t.delete(spark, "k < 10")  # COW rewrite of hit files
    after = _ids(t, spark)
    assert set(after) == set(range(10, 60))
    assert all(after[k] == before[k] for k in after), "survivors keep ids"
    t.delete(spark, "k >= 50", mode="merge_on_read")  # DV: no rewrite
    dv_after = _ids(t, spark)
    assert set(dv_after) == set(range(10, 50))
    assert all(dv_after[k] == before[k] for k in dv_after)


def test_merge_update_keeps_id_insert_gets_fresh(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, parts=3, row_tracking=True)
    before = _ids(t, spark)
    hwm_before = t.snapshot().row_id_hwm
    src = spark.createDataFrame(
        [(5, -1, "gU"), (1000, -2, "gN")], "k bigint, v bigint, grp string"
    )
    t.merge(spark, src, on="k")
    after = _ids(t, spark)
    assert after[5] == before[5], "UPDATE must keep the row's stable id"
    assert after[1000] >= hwm_before, "INSERT must get a fresh id"
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got[5] == -1 and got[1000] == -2
    others = {k: i for k, i in after.items() if k not in (5, 1000)}
    assert all(before[k] == i for k, i in others.items())
    assert len(set(after.values())) == len(after), "ids stay unique"


def test_row_ids_stable_across_zorder(spark, tmp_path):
    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"),
        (F.col("id") / F.lit(8)).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    t = BTable.create(spark, str(tmp_path / "t"), df, row_tracking=True)
    before = {
        r.payload: r._row_id
        for r in t.read(spark, with_row_ids=True).collect()
    }
    t.optimize(spark, zorder_by=["x", "y"], zorder_file_rows=16)
    after = {
        r.payload: r._row_id
        for r in t.read(spark, with_row_ids=True).collect()
    }
    assert after == before, "ZORDER reorders rows but must not move ids"


def test_row_ids_survive_restore(spark, tmp_path):
    t = _mk(spark, tmp_path, n=30, parts=2, row_tracking=True)
    before = _ids(t, spark)
    t.delete(spark, "k < 15")  # v1
    t.restore(0)  # v2
    assert _ids(t, spark) == before
    hwm = t.snapshot().row_id_hwm
    t.append(spark, spark.createDataFrame([(77, 770, "gz")],
                                          "k bigint, v bigint, grp string"))
    assert _ids(t, spark)[77] >= hwm, "post-restore inserts never reuse ids"


def test_row_tracked_table_refuses_python_source_writer(spark, tmp_path):
    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    t = _mk(spark, tmp_path, n=5, parts=1, row_tracking=True)
    df = spark.createDataFrame([(1, 2, "g")], "k bigint, v bigint, grp string")
    with pytest.raises(Exception, match="row tracking"):
        df.write.format("btable").option("path", t.path).mode("append").save()


def test_changes_with_row_ids_discriminates_updates(spark, tmp_path):
    """The point of row tracking for incremental consumers: in the change
    feed, an UPDATE is a delete+insert pair sharing one _row_id; a true
    insert has an id no delete carries."""
    t = _mk(spark, tmp_path, n=60, parts=3, row_tracking=True)
    src = spark.createDataFrame(
        [(5, -1, "gU"), (1000, -2, "gN")], "k bigint, v bigint, grp string"
    )
    t.merge(spark, src, on="k")  # v1: rewrite of one file + insert
    ch = t.changes(spark, 0, with_row_ids=True).collect()
    assert all(r._row_id is not None for r in ch)
    del_ids = {r._row_id for r in ch if r._change_type == "delete"}
    ins = {r._row_id: r for r in ch if r._change_type == "insert"}
    # k=5's insert image shares its _row_id with a delete -> an UPDATE
    upd = [r for i, r in ins.items() if i in del_ids]
    assert {r.k for r in upd} == {r.k for r in ch if r._change_type == "delete"}
    assert any(r.k == 5 and r.v == -1 for r in upd)
    # k=1000's insert id matches NO delete -> a true INSERT
    fresh = [r for i, r in ins.items() if i not in del_ids]
    assert [(r.k, r.v) for r in fresh] == [(1000, -2)]
    # untracked window guard
    t2 = _mk(spark, tmp_path / "u", n=5, parts=1)
    with pytest.raises(ValueError, match="row tracking"):
        t2.changes(spark, 0, with_row_ids=True)
    # plain CDF multiset invariant still holds on the tracked table
    plain = t.changes(spark, 0).groupBy("_change_type").count().collect()
    got = {r["_change_type"]: r["count"] for r in plain}
    n_rewritten = got["delete"]
    assert got["insert"] == n_rewritten + 1  # kept+updated re-inserts + 1000


def test_mapping_and_tracking_compose(spark, tmp_path):
    """Rename + row ids + DML on the same table: ids follow rows, the
    renamed column prunes and merges, and the commit log stays replayable
    through a checkpoint boundary."""
    t = _grid(spark, tmp_path, files=4, per=25)  # v0..v3
    t.enable_row_tracking()  # v4
    t.rename_column("v", "val")  # v5
    before = {
        r.k: r._row_id for r in t.read(spark, with_row_ids=True).collect()
    }
    src = spark.createDataFrame([(5, -1), (777, -7)], "k bigint, val bigint")
    t.merge(spark, src, on="k")  # v6
    t.delete(spark, "k >= 90 AND k < 100")  # v7
    t.optimize(spark)  # v8
    t.append(spark, spark.createDataFrame([(888, 8)], "k bigint, val bigint"))  # v9
    t.delete(spark, "k == 888")  # v10 -> crosses the checkpoint cadence
    after = {
        r.k: r._row_id for r in t.read(spark, with_row_ids=True).collect()
    }
    survivors = set(range(90)) | {777}
    assert set(after) == survivors
    assert after[5] == before[5] and after[50] == before[50]
    assert len(set(after.values())) == len(after)
    got = {r.k: r.val for r in t.read(spark).collect()}
    assert got[5] == -1 and got[777] == -7
    # checkpoint replay agrees with full-log replay (fresh handle)
    t2 = BTable(t.path)
    assert t2.count_rows() == len(survivors)
    assert {
        r.k: r._row_id for r in t2.read(spark, with_row_ids=True).collect()
    } == after
    cp = os.path.join(t.path, "_log", "00000010.checkpoint.json")
    assert os.path.exists(cp)
    doc = json.load(open(cp))
    assert doc["row_tracking"] is True and doc["colmap"] == {"val": "v"}
