"""Streaming spatial ingest: document stream → geotag → per-tile counts.

The north rule's tiling applied incrementally: as web pages stream in, the
engine assigns H3-analog cells via the same Arrow-vectorized geocoder the
batch path uses and maintains per-(ingest-window, cell) document counts —
the live version of ``registry.cell_histogram`` (which also drives the
hot-cell salting decision, so this IS the skew monitor a 100 TB ingest
would run). One transformation serves batch and stream; equality under an
``availableNow`` drain is pinned by tests (same discipline as
``streaming/jobs.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.functions.cells import cell_id

WINDOW = "1 hour"
WATERMARK = "2 hours"


def tile_ingest_counts(
    docs: DataFrame, res: float = 2.0, streaming: bool = False
) -> DataFrame:
    """Per (1-hour ingest window, cell_id): document count.

    Works on a batch OR streaming docs DataFrame with (doc_id[, warc_ts]).
    Event time: the NTZ ``warc_ts`` column when present (tz-independent
    epoch arithmetic — timestamp_micros over pure-NTZ timestampdiff), else a
    deterministic synthetic crawl time derived from doc_id (the driver's
    documents table carries no timestamp; the input_hint schema does).
    Either way bucket values are identical under any session/JVM time zone —
    and so stream == batch.
    """
    if "warc_ts" in docs.columns:
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "CAST(warc_ts AS TIMESTAMP_NTZ))"
        )
    else:
        # synthetic crawl cadence: one doc every 37s from 2024-01-01
        us = F.lit(1_704_067_200_000_000) + F.col("doc_id") * F.lit(37_000_000)
    d = docs.select(
        "doc_id",
        F.timestamp_micros(us.cast("long")).alias("ts"),
        geo.x_col("doc_id").alias("x"),
        geo.y_col("doc_id").alias("y"),
    )
    src = d.withWatermark("ts", WATERMARK) if streaming else d
    return (
        src.groupBy(
            F.window("ts", WINDOW).alias("w"),
            cell_id("x", "y", res).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "cell_id",
            "n_docs",
        )
    )


def stream_docs_from_parquet(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a directory of document parquet files
    (micro-batch = 1 file; the Iceberg-style incremental-ingest stand-in)."""
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
