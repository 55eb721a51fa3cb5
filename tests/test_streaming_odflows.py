"""Streaming OD trips == batch od_flows on time-ordered bounded input,
including hops spanning micro-batch boundaries; first events emit nothing."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.operators.trajectory import od_flows
from parallelcovertree_spark.streaming.odflows import od_trip_stream

SF = "/root/testdata/sf0.001"
RES = 2.0
NTZ_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
    "CAST(ts AS TIMESTAMP_NTZ))"
)


def _geo_ev(df):
    return df.select(
        "user_id",
        F.expr(NTZ_US).alias("us"),
        "ts",
        "event_id",
        geo.x_col("event_id").alias("x"),
        geo.y_col("event_id").alias("y"),
    )


def test_streaming_od_trips_match_batch(tmp_path, spark):
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
        src = next((tmp_path / f"p{i}").glob("part-*.parquet"))
        shutil.copy(src, d / f"{i:02d}.parquet")

    stream = od_trip_stream(
        _geo_ev(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        ),
        RES,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("od_trips_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    trips = spark.table("od_trips_t")

    # every event except each user's first emits exactly one trip
    n_users = ev.select("user_id").distinct().count()
    assert trips.count() == n - n_users

    got = {
        (r.from_cell, r.to_cell): (r.n_trips, r.n_users)
        for r in trips.groupBy("from_cell", "to_cell")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .collect()
    }
    want = {
        (r.from_cell, r.to_cell): (r.n_trips, r.n_users)
        for r in od_flows(
            _geo_ev(spark.read.parquet(f"{SF}/events.parquet")), RES
        ).collect()
    }
    assert got == want and len(got) > 0

    # cross-batch continuity: some users have trips in a later micro-batch
    # whose origin was set by an earlier one — equality above already fails
    # without carried state, but check state actually spanned batches:
    first_batch_max_us = spark.read.parquet(str(d / "00.parquet")).agg(
        F.max(F.expr(NTZ_US))
    ).collect()[0][0]
    spanning = trips.where(F.col("us") > F.lit(first_batch_max_us)).count()
    assert spanning > 0
