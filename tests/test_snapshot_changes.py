"""Changelog scan (changes()) on the Iceberg-style SnapshotTable: row-level
insert/delete attribution per commit, partition-pruned diffing, the
replay-to-state invariant, and schema evolution across the scanned range."""

import pytest
from pyspark.sql import functions as F

from parallelcovertree_spark.sources.snapshots import SnapshotTable


def _rows(df, cols=("id", "grp", "val")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _changes(df):
    return sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["id"], r["grp"], r["val"])
        for r in df.collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "id LONG, grp STRING, val LONG",
    )
    t.commit(base, partition_by="grp")
    return t


def test_merge_changelog_update_is_delete_plus_insert(spark, table):
    updates = spark.createDataFrame(
        [(2, "a", 21), (5, "c", 50)], "id LONG, grp STRING, val LONG"
    )
    sid = table.merge(spark, updates, key_col="id")
    got = _changes(table.changes(spark, 1))
    assert got == [
        (sid, "delete", 2, "a", 20),
        (sid, "insert", 2, "a", 21),
        (sid, "insert", 5, "c", 50),
    ]
    # unchanged rows in the REWRITTEN partition (id=1 in 'a') cancel in the
    # multiset diff; rows in untouched partitions are never read at all


def test_delete_changelog(spark, table):
    sid = table.delete(spark, "grp = 'b' AND val = 30")
    got = _changes(table.changes(spark, 1))
    assert got == [(sid, "delete", 3, "b", 30)]


def test_multi_commit_chain_attributes_each_step(spark, table):
    s2 = table.merge(
        spark,
        spark.createDataFrame([(5, "c", 50)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    s3 = table.delete(spark, "id = 1")
    s4 = table.merge(
        spark,
        spark.createDataFrame([(5, "c", 51)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    assert _changes(table.changes(spark, 1)) == [
        (s2, "insert", 5, "c", 50),
        (s3, "delete", 1, "a", 10),
        (s4, "delete", 5, "c", 50),
        (s4, "insert", 5, "c", 51),
    ]
    # a sub-range scans only its commits
    assert _changes(table.changes(spark, s2, s3)) == [(s3, "delete", 1, "a", 10)]


def test_noop_delete_yields_empty_changelog_with_schema(spark, table):
    table.delete(spark, "val = 999")
    ch = table.changes(spark, 1)
    assert ch.count() == 0
    # same column order as read() (hive layout: partition col last) + meta
    assert ch.columns == table.read(spark).columns + [
        "_change_type", "_commit_snapshot_id"
    ]


def test_replay_invariant_reproduces_target_state(spark, table):
    """read(from) + inserts − deletes == read(to), as multisets — the
    contract an incremental downstream pipeline depends on."""
    table.merge(
        spark,
        spark.createDataFrame(
            [(2, "a", 21), (6, "c", 60), (7, "c", 70)],
            "id LONG, grp STRING, val LONG",
        ),
        key_col="id",
    )
    table.delete(spark, "grp = 'b'")
    table.merge(
        spark,
        spark.createDataFrame([(7, "c", 71)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    to_id = table.latest_snapshot_id()
    ch = table.changes(spark, 1, to_id)
    base = table.read(spark, 1)
    ins = ch.where(F.col("_change_type") == "insert").select("id", "grp", "val")
    dels = ch.where(F.col("_change_type") == "delete").select("id", "grp", "val")
    # exceptAll is positional — align both sides to one column order
    replayed = base.select("id", "grp", "val").unionByName(ins).exceptAll(dels)
    assert _rows(replayed) == _rows(table.read(spark, to_id))


def test_changes_across_added_column(spark, table):
    """A column added mid-range: earlier rows carry NULL in it, exactly like
    reading a pre-evolution partition."""
    table.merge(
        spark,
        spark.createDataFrame([(5, "c", 50)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    table.merge(
        spark,
        spark.createDataFrame(
            [(6, "c", 60, "en")], "id LONG, grp STRING, val LONG, lang STRING"
        ),
        key_col="id",
    )
    got = sorted(
        (r["_change_type"], r["id"], r["lang"])
        for r in table.changes(spark, 1).collect()
    )
    assert got == [("insert", 5, None), ("insert", 6, "en")]


def test_changes_validates_range_and_expiry(spark, table):
    table.merge(
        spark,
        spark.createDataFrame([(5, "c", 50)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    with pytest.raises(ValueError, match="after"):
        table.changes(spark, 99, 1)
    # equal endpoints: empty changelog, not an error
    assert table.changes(spark, 2, 2).count() == 0
    table.commit(table.read(spark), partition_by="grp")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError, match="expired"):
        table.changes(spark, 1)


def test_unpartitioned_full_state_diff(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "flat"))
    t.commit(spark.createDataFrame([(1, "a", 10), (2, "a", 20)],
                                   "id LONG, grp STRING, val LONG"))
    t.commit(spark.createDataFrame([(2, "a", 20), (3, "b", 30)],
                                   "id LONG, grp STRING, val LONG"))
    assert _changes(t.changes(spark, 1)) == [
        (2, "delete", 1, "a", 10),
        (2, "insert", 3, "b", 30),
    ]


def test_changelog_reads_only_rewritten_partitions(spark, table):
    """Pruning evidence: the step diff's scan paths touch only the changed
    partition dirs, never the reused ones."""
    table.merge(
        spark,
        spark.createDataFrame([(2, "a", 21)], "id LONG, grp STRING, val LONG"),
        key_col="id",
    )
    pman, cman = table.history()[-2], table.history()[-1]
    step = table._diff_step(spark, pman, cman, cman["snapshot_id"])
    files = step.inputFiles()
    assert files and all("grp=a" in f for f in files)
