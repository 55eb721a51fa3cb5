"""Out-of-order streaming sessionizer == batch sessionize when arrivals are
shuffled across micro-batches within the lateness bound (r4 task #5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallelcovertree_spark.registry import events_sessionize
from parallelcovertree_spark.streaming.jobs import stream_events_from_parquet
from parallelcovertree_spark.streaming.sessions import sessionize_stream_ooo

SF = "/root/testdata/sf0.001"
SENTINEL_UID = -1  # flush driver: advances the watermark, excluded from compare


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


def _write_batches(spark, tmp_path, frames):
    """One parquet file per frame, mtimes forcing micro-batch order."""
    import glob
    import os
    import shutil as sh

    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    for i, f in enumerate(frames):
        d = tmp_path / f"part{i}"
        f.coalesce(1).write.parquet(str(d))
        (src,) = glob.glob(str(d / "part-*.parquet"))
        dst = stream_dir / f"{i:03d}.parquet"
        sh.copy(src, dst)
        os.utime(dst, (1_000_000 + i * 1000,) * 2)
    return str(stream_dir)


def _final_counts(got_df):
    return {
        (r.user_id, r.session_id, r.n_events)
        for r in got_df.where(F.col("user_id") != SENTINEL_UID)
        .groupBy("user_id", "session_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }


def test_ooo_sessionize_matches_batch_under_shuffled_arrival(tmp_path, spark):
    """Events split into three micro-batches with LATE data: batch 2 carries
    events that are EARLIER than batch 1's (within the 30-minute bound).
    The in-order operator would mis-split here; the buffered one must not."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    # deterministic 3-way arrival shuffle uncorrelated with event time:
    # consecutive events of the same user land in different micro-batches,
    # so most arrivals are out of order by up to the full span of the split
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    # flush sentinel: one far-future event pushes the final watermark past
    # every real event so all buffers mature before the stream ends
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, 10**9, "2024-12-31 00:00:00")],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    frames = parts + [sentinel]

    # lateness bound must cover the arrival shuffle: watermark is driven by
    # the max ts seen so far, and this shuffle can deliver the earliest
    # event last — sf0.001 events span 30 days, so the delay must exceed
    # the full span for zero drops (the sentinel is dated to land its
    # watermark above every real event but below none of them + delay)
    stream_dir = _write_batches(spark, tmp_path, frames)
    got_df = _drain(
        sessionize_stream_ooo(
            stream_events_from_parquet(spark, str(stream_dir)), delay="32 days"
        ),
        "sess_ooo", str(tmp_path / "ck_ooo"),
    )
    got = _final_counts(got_df)
    want = {
        (r.user_id, r.session_id, r.n_events)
        for r in events_sessionize(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_ooo_flushes_via_event_time_timeout(tmp_path, spark):
    """A user whose events all arrive in batch 1 (buffered, immature) and
    who never appears again must still flush once the watermark passes —
    the event-time-timeout leg of the pattern."""
    rows1 = [
        (7, 1, "2024-01-01 00:00:00"),
        (7, 2, "2024-01-01 00:05:00"),
        (7, 3, "2024-01-01 01:00:00"),  # > 10-min gap → second session
    ]
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    # batch 2: ONLY the sentinel (different key) advances the watermark
    sentinel = mk([(SENTINEL_UID, 10**9, "2024-06-01 00:00:00")])
    stream_dir = _write_batches(spark, tmp_path, [mk(rows1), sentinel])
    got_df = _drain(
        sessionize_stream_ooo(
            stream_events_from_parquet(spark, str(stream_dir)), delay="1 hour"
        ),
        "sess_ooo_timeout", str(tmp_path / "ck_ooo_t"),
    )
    got = _final_counts(got_df)
    assert got == {(7, 1, 2), (7, 2, 1)}
