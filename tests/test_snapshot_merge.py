"""Copy-on-write MERGE / DELETE on the Iceberg-style SnapshotTable:
partition-granularity rewrites, manifest-level reuse of untouched partition
directories, time travel across row-level operations."""

import pytest

from parallelcovertree_spark.sources.snapshots import SnapshotTable


def _rows(df):
    return sorted((r["id"], r["grp"], r["val"]) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "id LONG, grp STRING, val LONG",
    )
    t.commit(base, partition_by="grp")
    return t


def test_merge_upserts_and_reuses_untouched_partitions(spark, table):
    updates = spark.createDataFrame(
        [(2, "a", 21), (5, "a", 50), (6, "c", 60)], "id LONG, grp STRING, val LONG"
    )
    sid = table.merge(spark, updates, key_col="id")
    got = _rows(table.read(spark))
    assert got == [(1, "a", 10), (2, "a", 21), (3, "b", 30), (4, "b", 40),
                   (5, "a", 50), (6, "c", 60)]
    man = table.history()[-1]
    assert man["snapshot_id"] == sid
    assert man["rewritten_partitions"] == ["a", "c"]
    # the untouched partition is REFERENCED from the parent snapshot's dir
    assert "snap-000000000001" in man["partition_dirs"]["b"]
    assert "snap-000000000002" in man["partition_dirs"]["a"]
    assert man["partition_rows"] == {"a": 3, "b": 2, "c": 1}
    assert man["total_rows"] == 6
    # time travel: the parent snapshot still reads the original data
    assert _rows(table.read(spark, snapshot_id=1)) == [
        (1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]


def test_merge_chain_keeps_reusing(spark, table):
    u1 = spark.createDataFrame([(1, "a", 11)], "id LONG, grp STRING, val LONG")
    u2 = spark.createDataFrame([(3, "b", 31)], "id LONG, grp STRING, val LONG")
    table.merge(spark, u1, key_col="id")
    table.merge(spark, u2, key_col="id")
    man = table.history()[-1]
    # third snapshot references partition a from the SECOND snapshot's dirs
    assert "snap-000000000002" in man["partition_dirs"]["a"]
    assert "snap-000000000003" in man["partition_dirs"]["b"]
    assert _rows(table.read(spark)) == [(1, "a", 11), (2, "a", 20),
                                        (3, "b", 31), (4, "b", 40)]


def test_delete_rewrites_only_matching_partitions(spark, table):
    sid = table.delete(spark, "val = 10")
    man = table.history()[-1]
    assert man["snapshot_id"] == sid
    assert man["rewritten_partitions"] == ["a"]
    assert "snap-000000000001" in man["partition_dirs"]["b"]
    assert _rows(table.read(spark)) == [(2, "a", 20), (3, "b", 30), (4, "b", 40)]
    assert man["total_rows"] == 3
    # fully-deleted partition disappears from the manifest
    table.delete(spark, "grp = 'a'")
    man2 = table.history()[-1]
    assert "a" not in man2["partition_dirs"]
    assert _rows(table.read(spark)) == [(3, "b", 30), (4, "b", 40)]


def test_noop_delete_commits_audit_snapshot(spark, table):
    before = _rows(table.read(spark))
    sid = table.delete(spark, "val = 999")
    man = table.history()[-1]
    assert man["snapshot_id"] == sid and man["rewritten_partitions"] == []
    assert _rows(table.read(spark)) == before


def test_merge_add_column_schema_evolution(spark, table):
    """Updates carrying a NEW column merge cleanly; partitions written
    before the column existed read back with NULLs in it (Iceberg
    add-column evolution)."""
    upd = spark.createDataFrame(
        [(2, "a", 21, 0.9)], "id LONG, grp STRING, val LONG, score DOUBLE")
    table.merge(spark, upd, key_col="id")
    got = {r["id"]: (r["val"], r["score"]) for r in table.read(spark).collect()}
    assert got[2] == (21, 0.9)
    assert got[1] == (10, None) and got[3] == (30, None)  # backfilled NULLs
    # evolved table still supports further merges and compaction
    table.merge(spark, spark.createDataFrame(
        [(3, "b", 31, 0.5)], "id LONG, grp STRING, val LONG, score DOUBLE"),
        key_col="id")
    table.compact(spark)
    got2 = {r["id"]: r["score"] for r in table.read(spark).collect()}
    assert got2 == {1: None, 2: 0.9, 3: 0.5, 4: None}


def test_read_partition_is_pruned_and_generation_aware(spark, table):
    u = spark.createDataFrame([(2, "a", 21)], "id LONG, grp STRING, val LONG")
    table.merge(spark, u, key_col="id")  # 'b' still lives in snap 1's dirs
    a = sorted((r["id"], r["val"]) for r in table.read_partition(spark, "a").collect())
    b = sorted((r["id"], r["val"]) for r in table.read_partition(spark, "b").collect())
    assert a == [(1, 10), (2, 21)]
    assert b == [(3, 30), (4, 40)]  # resolved into the ancestor snapshot dir
    # absent partition → empty frame with the table schema
    z = table.read_partition(spark, "zz")
    assert z.count() == 0 and set(z.columns) == {"id", "grp", "val"}
    # time travel composes with pruning
    a1 = sorted((r["id"], r["val"])
                for r in table.read_partition(spark, "a", snapshot_id=1).collect())
    assert a1 == [(1, 10), (2, 20)]


def test_merge_rejects_updates_missing_table_columns(spark, table):
    """Evolution is ADD-column only: an update batch that forgot a column
    must be refused, not silently null the column on matched rows."""
    upd = spark.createDataFrame([(2, "a")], "id LONG, grp STRING")  # no val
    with pytest.raises(ValueError, match="missing table columns.*val"):
        table.merge(spark, upd, key_col="id")
    # table unchanged
    assert _rows(table.read(spark)) == [(1, "a", 10), (2, "a", 20),
                                        (3, "b", 30), (4, "b", 40)]


def test_compact_then_expire_keeps_current_data_only(spark, table):
    u = spark.createDataFrame([(2, "a", 21)], "id LONG, grp STRING, val LONG")
    table.merge(spark, u, key_col="id")          # snap 2, reuses b from snap 1
    want = _rows(table.read(spark))
    table.compact(spark)                          # snap 3, self-contained
    assert _rows(table.read(spark)) == want
    expired = table.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    # old snap dirs are gone, current read still intact
    import os
    remaining = [n for n in os.listdir(table.path) if n.startswith("snap-")]
    assert remaining == ["snap-000000000003"]
    assert _rows(table.read(spark)) == want


def test_expire_preserves_dirs_reused_by_kept_manifests(spark, table):
    u = spark.createDataFrame([(2, "a", 21)], "id LONG, grp STRING, val LONG")
    table.merge(spark, u, key_col="id")          # snap 2 references snap 1's b
    want = _rows(table.read(spark))
    expired = table.expire_snapshots(keep_last=1)
    assert expired == [1]
    import os
    # snap 1's dir SURVIVES: the kept merge manifest still references its b
    assert "snap-000000000001" in os.listdir(table.path)
    assert _rows(table.read(spark)) == want


def test_pruned_ops_refuse_hive_unsafe_partition_values(spark, tmp_path):
    """A partition value Spark hive-escapes (':' → '%3A') or NULL would
    silently miss the manifest-key string match and drop the partition's
    old rows — the guard must refuse loudly; prune=False still works."""
    t = SnapshotTable(str(tmp_path / "esc"))
    base = spark.createDataFrame(
        [(1, "x:y", 10), (2, "b", 20)], "id LONG, grp STRING, val LONG")
    t.commit(base, partition_by="grp")
    upd = spark.createDataFrame([(1, "x:y", 11)], "id LONG, grp STRING, val LONG")
    import pytest as _pt
    with _pt.raises(ValueError, match="hive escaping"):
        t.merge(spark, upd, key_col="id")
    with _pt.raises(ValueError, match="hive escaping"):
        t.delete(spark, "val = 10")
    # the unpruned path handles any value
    t.merge(spark, upd, key_col="id", prune=False)
    assert _rows(t.read(spark)) == [(1, "x:y", 11), (2, "b", 20)]


def test_orphan_snap_dir_does_not_block_next_commit(spark, table):
    """Crash between data write and manifest rename leaves snap-2 with no
    manifest; the replayed/next commit must clear it and succeed."""
    import os
    orphan = f"{table.path}/snap-{2:012d}"
    os.makedirs(f"{orphan}/grp=a")  # fake half-written snapshot
    u = spark.createDataFrame([(2, "a", 21)], "id LONG, grp STRING, val LONG")
    table.merge(spark, u, key_col="id")  # would fail errorifexists w/o clear
    assert _rows(table.read(spark)) == [(1, "a", 10), (2, "a", 21),
                                        (3, "b", 30), (4, "b", 40)]
    # GC with keep_last=1 also collects nothing it shouldn't
    table.expire_snapshots(keep_last=1)
    assert _rows(table.read(spark)) == [(1, "a", 10), (2, "a", 21),
                                        (3, "b", 30), (4, "b", 40)]


def test_merge_unpartitioned_is_full_rewrite(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "flat"))
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                 "id LONG, grp STRING, val LONG")
    t.commit(base)
    upd = spark.createDataFrame([(2, "b", 21), (3, "c", 30)],
                                "id LONG, grp STRING, val LONG")
    t.merge(spark, upd, key_col="id")
    assert _rows(t.read(spark)) == [(1, "a", 10), (2, "b", 21), (3, "c", 30)]
    assert t.history()[-1]["total_rows"] == 3
