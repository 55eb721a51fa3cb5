"""Streaming upsert sink: micro-batches land as copy-on-write snapshot
commits; last-write-wins per key; replayed batch ids are no-ops."""

from pyspark.sql import functions as F

from parallelcovertree_spark.sources.snapshots import SnapshotTable
from parallelcovertree_spark.streaming.upsert import (
    snapshot_upsert_writer,
    upsert_stream_to_table,
)

SCHEMA = "doc_id LONG, lang STRING, text STRING"


def _rows(df):
    return sorted((r["doc_id"], r["lang"], r["text"]) for r in df.collect())


def test_stream_upsert_last_write_wins(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, "en", "one"), (2, "en", "two"), (3, "de", "drei")], SCHEMA)
    b2 = spark.createDataFrame(
        [(2, "en", "two-v2"), (4, "de", "vier")], SCHEMA)
    for i, b in enumerate((b1, b2)):
        b.coalesce(1).write.parquet(str(tmp_path / f"in{i}"))
    src = tmp_path / "src"
    src.mkdir()
    import shutil, glob
    for i in range(2):
        f = glob.glob(str(tmp_path / f"in{i}" / "part-*.parquet"))[0]
        shutil.copy(f, src / f"{i:02d}.parquet")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    table = SnapshotTable(str(tmp_path / "tbl"))
    q = upsert_stream_to_table(stream, table, key_col="doc_id",
                               checkpoint_dir=str(tmp_path / "ck"),
                               partition_by="lang")
    q.awaitTermination()

    assert _rows(table.read(spark)) == [
        (1, "en", "one"), (2, "en", "two-v2"), (3, "de", "drei"),
        (4, "de", "vier")]
    hist = table.history()
    assert len(hist) == 2  # one snapshot per micro-batch
    assert [m["app_meta"]["batch_id"] for m in hist] == [0, 1]
    # batch 2 only touched en/de partitions it carried — de rewritten, and
    # the merge snapshot tracks what it rewrote
    assert hist[-1]["rewritten_partitions"] == ["de", "en"]


def test_replay_detection_survives_interleaved_maintenance(spark, tmp_path):
    """A compact()/manual commit between stream batches writes a manifest
    without a batch_id; replay detection must scan past it, not just look
    at the newest manifest."""
    table = SnapshotTable(str(tmp_path / "tbl3"))
    w = snapshot_upsert_writer(table, key_col="doc_id", partition_by="lang")
    b = spark.createDataFrame([(1, "en", "one"), (2, "de", "zwei")], SCHEMA)
    w(b, 0)
    table.compact(spark)  # app_meta=None on top of the stream commit
    n_before = len(table.history())
    w(b, 0)  # foreachBatch replay after restart
    assert len(table.history()) == n_before  # no duplicate snapshot
    assert _rows(table.read(spark)) == [(1, "en", "one"), (2, "de", "zwei")]


def test_replayed_batch_id_is_noop(spark, tmp_path):
    table = SnapshotTable(str(tmp_path / "tbl2"))
    w = snapshot_upsert_writer(table, key_col="doc_id", partition_by="lang")
    b = spark.createDataFrame([(1, "en", "one")], SCHEMA)
    w(b, 0)
    before = _rows(table.read(spark))
    w(b, 0)  # foreachBatch replay after restart
    assert len(table.history()) == 1  # no duplicate snapshot
    assert _rows(table.read(spark)) == before
    w(spark.createDataFrame([(1, "en", "one-v2")], SCHEMA), 1)
    assert len(table.history()) == 2
    assert _rows(table.read(spark)) == [(1, "en", "one-v2")]
