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


SCHEMA = "doc_id LONG, lang STRING, n_chars LONG"


def _agg_recompute(df):
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("chars"),
    )


def test_streaming_upsert_drives_maintained_rollup(spark, tmp_path):
    """The full lakehouse loop: micro-batch → CoW upsert commit → changelog
    → incrementally refreshed rollup; refresh is idempotent on replay and
    catches up over multi-commit gaps."""
    from parallelcovertree_spark.operators.incremental import (
        MaintainedAggregate,
    )
    from parallelcovertree_spark.streaming.upsert import (
        upsert_stream_to_table,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()

    def land(i, rows):
        import glob
        import shutil

        d = tmp_path / f"in{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
        shutil.copy(
            glob.glob(str(d / "part-*.parquet"))[0],
            src_dir / f"{i:02d}.parquet",
        )

    land(0, [(1, "en", 10), (2, "en", 20), (3, "de", 30)])
    land(1, [(2, "en", 21), (4, "fr", 40)])  # update + insert

    table = SnapshotTable(str(tmp_path / "tbl"))
    agg = MaintainedAggregate(
        str(tmp_path / "agg"), table, keys=["lang"],
        sums={"chars": "n_chars"},
    )

    def drain():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        upsert_stream_to_table(
            stream, table, key_col="doc_id",
            checkpoint_dir=str(tmp_path / "ck"), partition_by="lang",
        ).awaitTermination()

    drain()  # two micro-batches → snapshots 1, 2; rollup bootstrap
    sid = agg.refresh(spark)
    assert _agg_rows(agg.read(spark)) == _agg_rows(
        _agg_recompute(table.read(spark))
    )
    # idempotent: nothing new in the source → same rollup snapshot id
    assert agg.refresh(spark) == sid

    # two more source commits WITHOUT interleaved refreshes (multi-commit
    # catch-up over the changelog), incl. a delete
    land(2, [(5, "de", 50)])
    drain()
    table.delete(spark, "lang = 'en' AND doc_id = 1")
    sid2 = agg.refresh(spark)
    assert sid2 == sid + 1  # ONE incremental commit covered both steps
    assert _agg_rows(agg.read(spark)) == _agg_rows(
        _agg_recompute(table.read(spark))
    )
    # the rollup is time-travelable: snapshot `sid` still answers the old state
    assert _agg_rows(agg.read(spark, sid)) == _agg_rows(
        _agg_recompute(table.read(spark, 2))
    )
    # meta records which source snapshot each rollup commit reflects
    assert agg.table._manifest(sid2)["app_meta"]["source_snapshot"] == 4


def test_maintained_rollup_full_recovery(spark, tmp_path):
    """full=True re-bootstraps after source history expiry."""
    from parallelcovertree_spark.operators.incremental import (
        MaintainedAggregate,
    )

    table = SnapshotTable(str(tmp_path / "tbl"))
    table.commit(
        spark.createDataFrame([(1, "en", 10), (2, "de", 20)], SCHEMA),
        partition_by="lang",
    )
    agg = MaintainedAggregate(str(tmp_path / "agg"), table, keys=["lang"])
    agg.refresh(spark)
    table.merge(
        spark, spark.createDataFrame([(3, "de", 30)], SCHEMA),
        key_col="doc_id",
    )
    table.expire_snapshots(keep_last=1)  # drops snapshot 1 → changelog gone
    with pytest.raises(FileNotFoundError):
        agg.refresh(spark)
    agg.refresh(spark, full=True)
    got = sorted((r["lang"], r["n"]) for r in agg.read(spark).collect())
    assert got == [("de", 2), ("en", 1)]
