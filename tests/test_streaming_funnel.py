"""Streaming funnel == batch conversion_funnel on time-ordered bounded input,
including funnels whose steps span micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from parallelcovertree_spark.registry import conversion_funnel
from parallelcovertree_spark.streaming.funnel import funnel_stream

SF = "/root/testdata/sf0.001"


def _drain(spark, src_dir, name, ckpt):
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = funnel_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final state per user = the row with the largest n_seen
    out = spark.table(name)
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    )
    return out.withColumn("_rn", w).where("_rn = 1").drop("_rn", "n_seen")


def test_streaming_funnel_matches_batch_across_microbatches(tmp_path, spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # time-ordered thirds → 3 micro-batches (maxFilesPerTrigger=1): most
    # users' funnel steps land in different batches
    split = ev.orderBy("ts", "event_id")
    n = ev.count()
    d = tmp_path / "ev"
    d.mkdir()
    parts = split.collect()
    for i in range(3):
        chunk = parts[i * n // 3 : (i + 1) * n // 3]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(tmp_path / f"p{i}")
        )
    import shutil

    for i in range(3):
        src = next((tmp_path / f"p{i}").glob("part-*.parquet"))
        shutil.copy(src, d / f"{i:02d}.parquet")

    got_df = _drain(spark, str(d), "funnel_stream_t", str(tmp_path / "ck"))
    got = {
        (r.user_id, r.v_us, r.c_us, r.p_us, r.reached)
        for r in got_df.where("v_us != -1").collect()
    }
    want = {
        (r.user_id, r.v_us, r.c_us, r.p_us, r.reached)
        for r in conversion_funnel(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # users whose funnel completed only after later batches arrived exist
    assert any(r.reached == 3 for r in got_df.collect())
