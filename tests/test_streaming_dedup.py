"""Streaming dedup-on-ingest == batch exact_dedup_labels on bounded input,
including duplicate groups that span micro-batches."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from parallelcovertree_spark.registry import exact_dedup_labels
from parallelcovertree_spark.streaming.dedup import dedup_stream
from parallelcovertree_spark.streaming.tiles import stream_docs_from_parquet

SF = "/root/testdata/sf0.001"


def _drain(stream_df, name, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_streaming_dedup_matches_batch(tmp_path, spark):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", docs_dir / "documents.parquet")

    got_df = _drain(
        dedup_stream(stream_docs_from_parquet(spark, str(docs_dir))),
        "dedup_updates", str(tmp_path / "ck1"),
    )
    got = {(r.doc_id, r.keeper_id, r.is_dup) for r in got_df.collect()}
    want = {
        (r.doc_id, r.keeper_id, r.is_dup)
        for r in exact_dedup_labels(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # every arriving doc labeled exactly once
    assert got_df.count() == got_df.select("doc_id").distinct().count()


def test_dedup_state_carries_across_microbatches(tmp_path, spark):
    """File 1 = originals (ascending ids), file 2 = planted exact copies:
    the copies must be flagged dups against keepers seen in batch 1."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    d = tmp_path / "docs2"
    d.mkdir()
    docs.coalesce(1).write.parquet(str(tmp_path / "p1"))
    planted.coalesce(1).write.parquet(str(tmp_path / "p2"))
    for i, src in enumerate(("p1", "p2")):
        part = next((tmp_path / src).glob("part-*.parquet"))
        # file-source order follows modification time; name keeps it readable
        shutil.copy(part, d / f"{i:02d}.parquet")

    got_df = _drain(
        dedup_stream(stream_docs_from_parquet(spark, str(d))),
        "dedup_span", str(tmp_path / "ck2"),
    )
    got = {(r.doc_id, r.keeper_id, r.is_dup) for r in got_df.collect()}
    # planted copies: keeper is the original from micro-batch 1
    for r in planted.collect():
        orig = r.doc_id - 10_000_000
        assert (r.doc_id, orig, 1) in got
    # originals labeled with batch-twin semantics over the combined corpus
    combined = docs.unionByName(planted)
    w_keeper = {
        (r.doc_id, r.keeper_id, r.is_dup)
        for r in combined.select(
            "doc_id",
            F.min("doc_id").over(
                __import__("pyspark").sql.Window.partitionBy("text")
            ).alias("keeper_id"),
        ).withColumn(
            "is_dup", (F.col("doc_id") != F.col("keeper_id")).cast("int")
        ).collect()
    }
    assert got == w_keeper


def test_dedup_state_survives_query_restart(tmp_path, spark):
    """North-rule resumability, streaming side: drain file 1, STOP the
    query, then start a NEW query from the same checkpoint over file 2 —
    the sha2 state store must carry over, so copies arriving after the
    restart are flagged against keepers seen before it."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    d = tmp_path / "docs3"
    d.mkdir()
    ckpt = str(tmp_path / "ck3")

    out_dir = str(tmp_path / "out")

    def drain_to_parquet(run: int):
        # memory sink can't recover from a checkpoint; foreachBatch can
        def write(bdf, epoch_id):
            bdf.withColumn("run", F.lit(run)).write.mode("append").parquet(out_dir)

        q = (
            dedup_stream(stream_docs_from_parquet(spark, str(d)))
            .writeStream.foreachBatch(write)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    docs.coalesce(1).write.parquet(str(tmp_path / "q1"))
    shutil.copy(next((tmp_path / "q1").glob("part-*.parquet")), d / "00.parquet")
    drain_to_parquet(1)
    assert spark.read.parquet(out_dir).count() == docs.count()

    # restart: new file lands, NEW streaming query, SAME checkpoint
    planted.coalesce(1).write.parquet(str(tmp_path / "q2"))
    shutil.copy(next((tmp_path / "q2").glob("part-*.parquet")), d / "01.parquet")
    drain_to_parquet(2)
    second = spark.read.parquet(out_dir).where(F.col("run") == 2)
    got = {(r.doc_id, r.keeper_id, r.is_dup) for r in second.collect()}
    want = {
        (r.doc_id, r.doc_id - 20_000_000, 1) for r in planted.collect()
    }
    # the restarted query processes ONLY the new file, and every planted
    # copy is recognized against pre-restart state
    assert got == want and len(want) > 0
