"""Stateful streaming sessionizer == batch sessionize on bounded input,
including state carried across micro-batches."""

from __future__ import annotations

import shutil

from parallelcovertree_spark.registry import events_sessionize
from parallelcovertree_spark.streaming.jobs import stream_events_from_parquet
from parallelcovertree_spark.streaming.sessions import sessionize_stream

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


def test_stateful_sessionize_matches_batch(tmp_path, spark):
    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")

    got_df = _drain(
        sessionize_stream(stream_events_from_parquet(spark, str(events_dir))),
        "sess_updates", str(tmp_path / "ck1"),
    )
    # update stream may emit a session several times (once per touching
    # micro-batch); the LAST update per (user, session) is the final count
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    got = {
        (r.user_id, r.session_id, r.n_events) for r in got_df.groupBy(
            "user_id", "session_id"
        ).agg(F.max("n_events").alias("n_events")).collect()
    }
    want = {
        (r.user_id, r.session_id, r.n_events)
        for r in events_sessionize(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_state_carries_across_microbatches(tmp_path, spark):
    """Split events into two files → two micro-batches (maxFilesPerTrigger=1);
    a session spanning the split must keep one id and an exact total."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    d = tmp_path / "ev2"
    d.mkdir()
    # earlier half by event time first (files stream in mtime/name order)
    ev.where(F.col("ts") <= F.expr("timestamp'2024-01-01 04:00:00'")).coalesce(1).write.parquet(str(d / "a"))
    ev.where(F.col("ts") > F.expr("timestamp'2024-01-01 04:00:00'")).coalesce(1).write.parquet(str(d / "b"))
    import glob, os, shutil as sh
    files = sorted(glob.glob(str(d / "*" / "part-*.parquet")))
    assert len(files) == 2
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    for i, f in enumerate(files):
        dst = stream_dir / f"{i:03d}.parquet"
        sh.copy(f, dst)
        os.utime(dst, (1000000 + i * 1000, 1000000 + i * 1000))  # force batch order

    got_df = _drain(
        sessionize_stream(stream_events_from_parquet(spark, str(stream_dir))),
        "sess_two_batches", str(tmp_path / "ck2"),
    )
    got = {
        (r.user_id, r.session_id, r.n_events) for r in got_df.groupBy(
            "user_id", "session_id"
        ).agg(F.max("n_events").alias("n_events")).collect()
    }
    want = {
        (r.user_id, r.session_id, r.n_events)
        for r in events_sessionize(spark, SF).collect()
    }
    assert got == want
