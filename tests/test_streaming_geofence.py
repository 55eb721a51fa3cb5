"""Geofence alerts on ingest: stateless point-in-polygon over a stream ==
batch, including multi-fence hits and empty micro-batches (docs outside
every fence emit nothing)."""

from __future__ import annotations

import shutil

from parallelcovertree_spark.streaming.geofence import geofence_alerts
from parallelcovertree_spark.streaming.tiles import stream_docs_from_parquet

SF = "/root/testdata/sf0.001"


def _polys(spark, rows):
    return spark.createDataFrame(rows, "poly_id long, cx double, cy double, rp double")


def test_streaming_geofence_matches_batch(tmp_path, spark):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", docs_dir / "documents.parquet")
    # overlapping fences near the geocoder's origin + one far-off miss
    fences = _polys(
        spark,
        [(0, 0.0, 0.0, 5.0), (1, 2.0, 1.0, 4.0), (2, 500.0, 500.0, 1.0)],
    )

    out = geofence_alerts(stream_docs_from_parquet(spark, str(docs_dir)), fences)
    q = (
        out.writeStream.format("memory")
        .queryName("geofence_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("geofence_stream").collect()}
    want = {
        tuple(r)
        for r in geofence_alerts(
            spark.read.parquet(f"{SF}/documents.parquet"), fences
        ).collect()
    }
    assert got == want and len(got) > 0
    # a doc inside both overlapping fences alerts once per fence
    by_point: dict[int, set[int]] = {}
    for pid, fid in got:
        by_point.setdefault(pid, set()).add(fid)
    assert any(len(f) == 2 for f in by_point.values())
    assert all(2 not in f for f in by_point.values())  # far fence never fires
