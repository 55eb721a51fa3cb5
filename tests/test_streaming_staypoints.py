"""Streaming stay-points == batch stay_points minus each user's final
(still-open) segment, on time-ordered input across micro-batches."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.operators.trajectory import stay_points
from parallelcovertree_spark.streaming.staypoints import stay_point_stream

SF = "/root/testdata/sf0.001"
RADIUS, MIN_EVENTS = 5.0, 2
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


def test_streaming_staypoints_match_batch_closed_prefix(tmp_path, spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    rows = ev.orderBy("ts", "event_id").collect()
    d = tmp_path / "ev"
    d.mkdir()
    for i in range(3):
        chunk = rows[i * n // 3 : (i + 1) * n // 3]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(tmp_path / f"p{i}")
        )
        shutil.copy(
            next((tmp_path / f"p{i}").glob("part-*.parquet")),
            d / f"{i:02d}.parquet",
        )

    stream = stay_point_stream(
        _geo_ev(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        ),
        RADIUS,
        MIN_EVENTS,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stays_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.seg): (r.n_events, r.start_us, r.end_us, r.dwell_us,
                             round(r.cx_micro, 6), round(r.cy_micro, 6))
        for r in spark.table("stays_t").collect()
    }

    batch = stay_points(
        _geo_ev(spark.read.parquet(f"{SF}/events.parquet")), RADIUS, MIN_EVENTS
    ).collect()
    # streaming emits only CLOSED stays: the batch result minus, per user,
    # any kept stay that is still open at end of input. A kept batch stay
    # is open iff it contains the user's final event.
    last_ev = {
        r.user_id: r.us
        for r in _geo_ev(spark.read.parquet(f"{SF}/events.parquet"))
        .groupBy("user_id")
        .agg(F.max("us").alias("us"))
        .collect()
    }
    want = {
        (r.user_id, r.seg): (r.n_events, r.start_us, r.end_us, r.dwell_us,
                             round(r.cx_micro, 6), round(r.cy_micro, 6))
        for r in batch
        if r.end_us != last_ev[r.user_id]
    }
    assert got == want and len(got) > 0
    # stays spanning micro-batch boundaries exist (state carried across)
    b0_max = spark.read.parquet(str(d / "00.parquet")).agg(
        F.max(F.expr(NTZ_US))
    ).collect()[0][0]
    assert any(
        s < b0_max < e for (_, _), (_, s, e, *_rest) in
        ((k, v) for k, v in got.items())
    )
