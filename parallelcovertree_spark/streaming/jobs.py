"""Streaming jobs with batch twins.

``windowed_event_counts`` works on either a batch or a streaming DataFrame —
the transformation is written once (watermark applied only when streaming).
``run_stream_once`` drives the streaming flavor with an availableNow trigger
into a memory sink, which is how the tests prove batch/stream equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


def windowed_event_counts(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Per (5-min window, event_type): count + value sum. Emits the window
    start as epoch seconds (BIGINT) so batch/stream/oracle compare exactly."""
    # parquet ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP. A plain
    # cast("timestamp") interprets the naive value in the session time zone —
    # instead rebuild the instant from tz-free NTZ epoch arithmetic
    # (timestamp_micros sets the internal epoch directly), so window bounds
    # and the emitted bucket are identical under any session/JVM tz.
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        "CAST(ts AS TIMESTAMP_NTZ))"
    )
    events = events.withColumn("ts", F.timestamp_micros(us))
    src = events.withWatermark("ts", WATERMARK) if streaming else events
    return (
        src.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_events_from_parquet(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files (the file
    stream source watches a DIRECTORY; micro-batch = 1 file)."""
    schema = spark.read.parquet(events_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def run_stream_once(stream_df: DataFrame, name: str, checkpoint: str) -> DataFrame:
    """Drain the stream (availableNow) into a memory sink; return the table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def windowed_distinct_users(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Per daily window: event count + APPROXIMATE distinct users
    (HyperLogLog++, rsd 2%) — the streaming DAU monitor.

    Exact COUNT DISTINCT is not incrementally maintainable in a streaming
    aggregate without keeping every user id per window; the HLL sketch is
    the production answer — and because register-wise max-merge is
    commutative, associative, and idempotent, the drained stream equals
    the batch twin EXACTLY (not approximately): same sketch, same
    estimate, any partitioning or micro-batch split. Accuracy vs the exact
    gate is pinned separately (test_analytics_ops.py). Same NTZ watermark
    discipline as windowed_event_counts."""
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        "CAST(ts AS TIMESTAMP_NTZ))"
    )
    events = events.withColumn("ts", F.timestamp_micros(us))
    src = events.withWatermark("ts", WATERMARK) if streaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "n_events",
            "n_users_approx",
        )
    )
