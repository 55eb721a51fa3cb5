"""Out-of-order streaming funnel == batch conversion_funnel when arrivals
are shuffled across micro-batches within the lateness bound — the third
instance of the buffer-below-watermark pattern (sessions, stay-points,
funnel). Funnel is the op the in-order contract bites hardest: a click
arriving one micro-batch before its view is never counted by the in-order
operator; the buffered one must count it."""

from __future__ import annotations

import glob
import os
import shutil as sh

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from parallelcovertree_spark.registry import conversion_funnel
from parallelcovertree_spark.streaming.funnel import funnel_stream_ooo

SF = "/root/testdata/sf0.001"
SENTINEL_UID = -1


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


def _drain_final(spark, stream, name, ckpt):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).where(F.col("user_id") != SENTINEL_UID)
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    )
    return out.withColumn("_rn", w).where("_rn = 1").drop("_rn", "n_seen")


def test_ooo_funnel_matches_batch_under_shuffled_arrival(tmp_path, spark):
    """REVERSED-time thirds: the latest third of events arrives FIRST, so
    for most users the purchase lands micro-batches before the view — the
    worst case for the strictly-after chain. Within the 32-day bound (the
    corpus spans 30 days) the buffered funnel must equal batch exactly."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    n = ev.count()
    rows = ev.orderBy(F.desc("ts"), F.desc("event_id")).collect()
    frames = [
        spark.createDataFrame(rows[i * n // 3 : (i + 1) * n // 3], ev.schema)
        for i in range(3)
    ]
    sentinel = spark.createDataFrame(
        [(SENTINEL_UID, "view", "2024-12-31 00:00:00")],
        "user_id long, event_type string, ts string",
    ).select("user_id", "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"))
    stream_dir = _write_batches(tmp_path, frames + [sentinel])

    schema = frames[0].schema
    got_df = _drain_final(
        spark,
        funnel_stream_ooo(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir),
            delay="32 days",
        ),
        "funnel_ooo", str(tmp_path / "ck"),
    )
    got = {
        (r.user_id, r.v_us, r.c_us, r.p_us, r.reached)
        for r in got_df.where("v_us != -1").collect()
    }
    want = {
        (r.user_id, r.v_us, r.c_us, r.p_us, r.reached)
        for r in conversion_funnel(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    assert any(r.reached == 3 for r in got_df.collect())
