"""Out-of-order streaming OD trips == batch window-lag hop sequence when
arrivals are shuffled across micro-batches within the lateness bound — the
fourth concrete instance of the buffer-below-watermark pattern (sessions,
stay-points, funnel; see streaming/sessions.py module comment). Trips are
hops between CONSECUTIVE positions, so a late position must splice into the
sequence: the in-order operator gets both the spliced hop's endpoints wrong."""

from __future__ import annotations

import glob
import os
import shutil as sh

import pyspark.sql.functions as F
from pyspark.sql import Window

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.functions.cells import cell_id
from parallelcovertree_spark.streaming.odflows import od_trip_stream_ooo

SF = "/root/testdata/sf0.001"
RES = 5.0
SENTINEL_UID = -1
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


def test_ooo_od_trips_match_batch_under_shuffled_arrival(tmp_path, spark):
    ev = _geo_ev(spark.read.parquet(f"{SF}/events.parquet"))
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, 4_000_000_000_000_000, 10**9, 0.0, 0.0)],
        "user_id long, us long, event_id long, x double, y double",
    )
    stream_dir = _write_batches(tmp_path, parts + [sentinel])

    stream = od_trip_stream_ooo(
        spark.readStream.schema(parts[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir),
        RES,
        delay="32 days",  # exceeds the corpus span: earliest event can arrive last
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("trips_ooo")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.from_cell, r.to_cell, r.us, r.event_id)
        for r in spark.table("trips_ooo").collect()
        if r.user_id != SENTINEL_UID
    }

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    want = {
        tuple(r)
        for r in ev.select(
            "user_id",
            F.lag(cell_id("x", "y", RES)).over(w).alias("from_cell"),
            cell_id("x", "y", RES).alias("to_cell"),
            "us",
            "event_id",
        )
        .where(F.col("from_cell").isNotNull())
        .collect()
    }
    assert got == want and len(got) > 100


def test_ooo_od_trips_flush_via_event_time_timeout(tmp_path, spark):
    """A user fully buffered in batch 1 who never reappears must still emit
    their hops once a later batch's watermark passes them."""
    h = 3_600_000_000
    user_rows = spark.createDataFrame(
        [
            (7, 100 * h, 1, 0.0, 0.0),
            (7, 101 * h, 2, 12.0, 0.0),
            (7, 102 * h, 3, 24.0, 0.0),
        ],
        "user_id long, us long, event_id long, x double, y double",
    )
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, 500 * h, 10**9, 0.0, 0.0)],
        "user_id long, us long, event_id long, x double, y double",
    )
    stream_dir = _write_batches(tmp_path, [user_rows, sentinel])
    stream = od_trip_stream_ooo(
        spark.readStream.schema(user_rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir),
        RES,
        delay="1 hour",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("trips_ooo_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_t"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.from_cell, r.to_cell, r.us, r.event_id)
        for r in spark.table("trips_ooo_t").collect()
        if r.user_id != SENTINEL_UID
    }
    c0, c1, c2 = [
        r[0]
        for r in user_rows.select(cell_id("x", "y", RES)).orderBy("event_id").collect()
    ]
    assert got == {
        (7, c0, c1, 101 * h, 2),
        (7, c1, c2, 102 * h, 3),
    }
