"""Out-of-order streaming stay-points == batch stay_points (minus still-open
segments) when arrivals are shuffled across micro-batches within the lateness
bound — the second concrete instance of the buffer-below-watermark pattern
(first: sessions; see streaming/sessions.py module comment)."""

from __future__ import annotations

import glob
import os
import shutil as sh

import pyspark.sql.functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.operators.trajectory import stay_points
from parallelcovertree_spark.streaming.staypoints import stay_point_stream_ooo

SF = "/root/testdata/sf0.001"
RADIUS, MIN_EVENTS = 5.0, 2
SENTINEL_UID = -1  # flush driver: advances the watermark, excluded from compare
NTZ_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
    "CAST(ts AS TIMESTAMP_NTZ))"
)


def _geo_ev(df):
    return df.select(
        "user_id",
        F.expr(NTZ_US).alias("us"),
        "event_id",
        geo.x_col("event_id").alias("x"),
        geo.y_col("event_id").alias("y"),
    )


def _write_batches(tmp_path, frames):
    """One parquet file per frame, mtimes forcing micro-batch order."""
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


def test_ooo_staypoints_match_batch_under_shuffled_arrival(tmp_path, spark):
    """Three micro-batches carrying a deterministic arrival shuffle that is
    uncorrelated with event time (consecutive events of one user land in
    different batches, so most arrivals are out of order by up to the full
    30-day corpus span). The in-order operator would fragment segments and
    mis-order centroids here; the buffered one must match batch exactly."""
    ev = _geo_ev(spark.read.parquet(f"{SF}/events.parquet"))
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    # far-future sentinel pushes the final watermark past every real event
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, 4_000_000_000_000_000, 10**9, 0.0, 0.0)],
        "user_id long, us long, event_id long, x double, y double",
    )
    stream_dir = _write_batches(tmp_path, parts + [sentinel])

    stream = stay_point_stream_ooo(
        spark.readStream.schema(parts[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir),
        RADIUS,
        MIN_EVENTS,
        delay="32 days",  # must exceed the corpus span: the shuffle can
        # deliver the earliest event last
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stays_ooo")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.seg): (r.n_events, r.start_us, r.end_us, r.dwell_us,
                             round(r.cx_micro, 6), round(r.cy_micro, 6))
        for r in spark.table("stays_ooo").collect()
        if r.user_id != SENTINEL_UID
    }

    batch = stay_points(ev, RADIUS, MIN_EVENTS).collect()
    # streaming emits only CLOSED stays: drop, per user, the kept batch stay
    # that contains the user's final event (still open at end of input)
    last_ev = {
        r.user_id: r.us
        for r in ev.groupBy("user_id").agg(F.max("us").alias("us")).collect()
    }
    want = {
        (r.user_id, r.seg): (r.n_events, r.start_us, r.end_us, r.dwell_us,
                             round(r.cx_micro, 6), round(r.cy_micro, 6))
        for r in batch
        if r.end_us != last_ev[r.user_id]
    }
    assert got == want and len(got) > 0


def test_ooo_staypoints_flush_via_event_time_timeout(tmp_path, spark):
    """A user fully buffered in batch 1 (immature) who never reappears must
    still emit their closed stay once a later batch's watermark passes it."""
    h = 3_600_000_000  # one hour in microseconds
    # NB events start at 100 h, not 0: a row whose event time equals the
    # initial watermark (epoch 0) is dropped by Spark's late-row filter
    # before the operator sees it
    user_rows = spark.createDataFrame(
        [
            (7, 100 * h, 1, 0.0, 0.0),
            (7, 101 * h, 2, 1.0, 0.0),   # hop 1 ≤ radius: same stay
            (7, 102 * h, 3, 100.0, 0.0),  # far hop: closes the stay
        ],
        "user_id long, us long, event_id long, x double, y double",
    )
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, 500 * h, 10**9, 0.0, 0.0)],
        "user_id long, us long, event_id long, x double, y double",
    )
    stream_dir = _write_batches(tmp_path, [user_rows, sentinel])
    stream = stay_point_stream_ooo(
        spark.readStream.schema(user_rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir),
        RADIUS,
        MIN_EVENTS,
        delay="1 hour",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stays_ooo_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_t"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.seg, r.n_events, r.start_us, r.end_us)
        for r in spark.table("stays_ooo_t").collect()
        if r.user_id != SENTINEL_UID
    }
    assert got == {(7, 0, 2, 100 * h, 101 * h)}
