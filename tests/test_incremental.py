"""Incremental aggregate maintenance (operators/incremental.py): maintained
COUNT/SUM over the snapshot changelog == recompute on the table state, at
every snapshot of a commit → merge → delete chain; zero-count groups drop;
cold start from an explicit insert-only changelog."""

import pytest
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.incremental import (
    maintain_counts,
    maintain_sums,
)
from parallelcovertree_spark.sources.snapshots import SnapshotTable


def _agg_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _recompute(state, sums=False):
    aggs = [F.count(F.lit(1)).alias("n")]
    if sums:
        aggs.append(F.sum(F.col("val").cast("bigint")).alias("tot"))
    return state.groupBy("grp").agg(*aggs)


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40), (5, "c", 50)],
        "id LONG, grp STRING, val LONG",
    )
    t.commit(base, partition_by="grp")
    return t


def test_maintained_equals_recompute_across_chain(spark, table):
    # snap2: update id=2 (a: 20→21), insert id=6 into 'b'
    table.merge(
        spark,
        spark.createDataFrame(
            [(2, "a", 21), (6, "b", 60)], "id LONG, grp STRING, val LONG"
        ),
        key_col="id",
    )
    # snap3: delete all of 'c' (group drops) and one row of 'b'
    table.delete(spark, "grp = 'c' OR id = 3")
    prev = _recompute(table.read(spark, 1), sums=True)
    for to_sid in (2, 3):
        got = maintain_sums(
            prev, table.changes(spark, 1, to_sid), ["grp"], {"tot": "val"}
        )
        want = _recompute(table.read(spark, to_sid), sums=True)
        assert _agg_rows(got) == _agg_rows(want)
    # stepwise maintenance (prev advances one commit at a time) agrees too
    step = maintain_sums(
        prev, table.changes(spark, 1, 2), ["grp"], {"tot": "val"}
    )
    step = maintain_sums(
        step, table.changes(spark, 2, 3), ["grp"], {"tot": "val"}
    )
    assert _agg_rows(step) == _agg_rows(_recompute(table.read(spark, 3), sums=True))


def test_emptied_group_drops_out(spark, table):
    table.delete(spark, "grp = 'c'")
    prev = _recompute(table.read(spark, 1))
    got = maintain_counts(prev, table.changes(spark, 1), ["grp"])
    assert sorted(r["grp"] for r in got.collect()) == ["a", "b"]


def test_cold_start_from_insert_changelog(spark, table):
    # prev=None over an insert-only changelog == plain groupBy count
    chg = (
        table.read(spark, 1)
        .withColumn(SnapshotTable.CHANGE_TYPE_COL, F.lit("insert"))
    )
    got = maintain_counts(None, chg, ["grp"])
    assert _agg_rows(got) == _agg_rows(_recompute(table.read(spark, 1)))


def test_prev_missing_columns_is_refused(spark, table):
    table.delete(spark, "grp = 'c'")
    bad_prev = _recompute(table.read(spark, 1)).withColumnRenamed("n", "cnt")
    with pytest.raises(ValueError, match="missing columns"):
        maintain_counts(bad_prev, table.changes(spark, 1), ["grp"])


def test_null_measures_match_sql_sum_semantics(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl2"))
    base = spark.createDataFrame(
        [(1, "a", None), (2, "a", 20)], "id LONG, grp STRING, val LONG"
    )
    t.commit(base, partition_by="grp")
    t.delete(spark, "id = 1")  # retract the NULL-measure row
    prev = t.read(spark, 1).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("tot")
    )
    got = maintain_sums(prev, t.changes(spark, 1), ["grp"], {"tot": "val"})
    assert _agg_rows(got) == [("a", 1, 20)]
