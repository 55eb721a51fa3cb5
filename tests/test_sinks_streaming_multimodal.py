"""Golden edge-list sink, streaming==batch equivalence, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join
from parallelcovertree_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    frame_sample,
    synthetic_media,
    FEATURE_DIM,
)
from parallelcovertree_spark.oracle import epsilon_graph_np
from parallelcovertree_spark.sinks.edges import (
    read_graph_file,
    write_graph_dir,
    write_graph_file,
)
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_points,
)
from parallelcovertree_spark.streaming.jobs import (
    run_stream_once,
    stream_events_from_parquet,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_golden_edge_list_file(tmp_path, spark):
    """Reference golden format (build_graph.cpp:134-154): header 'n m',
    1-indexed, per-source ascending, self-loops included."""
    n, r = 120, 1.0
    pts = synthetic_points(spark, n)
    edges = epsilon_self_join(pts, r)
    path = str(tmp_path / "graph.txt")
    n_edges = write_graph_file(edges, path, n_verts=n)

    with open(path) as f:
        lines = f.read().splitlines()
    assert lines[0] == f"{n} {n_edges}"
    body = [tuple(map(int, l.split())) for l in lines[1:]]
    assert body == sorted(body)  # globally sorted (per-source ascending dst)
    assert all(u >= 1 and v >= 1 for u, v in body)  # 1-indexed
    assert (1, 1) in body  # self-loop of point 0

    nv, got = read_graph_file(path)
    assert nv == n and got == epsilon_graph_np(gaussian_points_np(n), r)


def test_parallel_edge_list_dir(tmp_path, spark):
    """Scale-path sink: cat of lexically-ordered parts == golden body."""
    n, r = 200, 1.0
    pts = synthetic_points(spark, n)
    edges = epsilon_self_join(pts, r)
    single = str(tmp_path / "single.txt")
    write_graph_file(edges, single, n_verts=n)
    outdir = tmp_path / "parts"
    write_graph_dir(edges, str(outdir), partitions=4)

    parts = sorted(p for p in outdir.iterdir() if p.name.startswith("part-"))
    assert len(parts) > 1
    body = "".join(p.read_text() for p in parts)
    assert body == "".join(open(single).readlines()[1:])


def test_streaming_matches_batch(tmp_path, spark):
    import shutil

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")
    batch = windowed_event_counts(spark.read.parquet(f"{SF}/events.parquet"))
    want = {tuple(r) for r in batch.collect()}
    stream = windowed_event_counts(
        stream_events_from_parquet(spark, str(events_dir)), streaming=True
    )
    got_df = run_stream_once(stream, "evt_counts_test", str(tmp_path / "ckpt"))
    got = {tuple(r) for r in got_df.collect()}
    assert got == want and len(got) > 0


def test_media_features_plumbing(spark):
    media = synthetic_media(spark, 90)
    rows = media.collect()
    assert len(rows) == 90
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    img = next(r for r in rows if r.kind == "image")
    assert img.meta.width >= 32 and img.meta.sample_rate is None

    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 90
    assert all(len(r.feature) == FEATURE_DIM for r in feats)
    # deterministic: same doc_id → same features on a second run
    feats2 = extract_features(synthetic_media(spark, 90), fake=True).collect()
    assert {(r.doc_id, tuple(r.feature)) for r in feats} == {
        (r.doc_id, tuple(r.feature)) for r in feats2
    }

    frames = frame_sample(media, every_n=16).collect()
    assert len(frames) > 0
    assert all(len(r.frame_bytes) <= 16 for r in frames)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00" * 8, "image", fake=False)


def test_windowed_counts_session_tz_independent(spark):
    """The event-time derivation is pure NTZ arithmetic: identical buckets
    under any session time zone (incl. a non-whole-hour offset)."""
    from parallelcovertree_spark.streaming.jobs import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = sorted(tuple(r) for r in windowed_event_counts(ev).collect())
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        b = sorted(tuple(r) for r in windowed_event_counts(ev).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert a == b and len(a) > 0


def test_streaming_tile_ingest_equals_batch(tmp_path, spark):
    """Spatial streaming twin: per-(window, tile) doc counts from an
    availableNow stream drain == the batch transformation, and match the
    oracle-gated cell histogram totals."""
    from parallelcovertree_spark.streaming.jobs import run_stream_once
    from parallelcovertree_spark.streaming.tiles import (
        stream_docs_from_parquet,
        tile_ingest_counts,
    )

    import shutil

    # the file stream source watches a DIRECTORY; stage the single parquet
    # file into one (micro-batch = 1 file)
    ddir = tmp_path / "docs_stream"
    ddir.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet", ddir / "part-0.parquet")
    batch_docs = spark.read.parquet(str(ddir))
    batch = sorted(tuple(r) for r in tile_ingest_counts(batch_docs).collect())

    stream = stream_docs_from_parquet(spark, str(ddir))
    out = run_stream_once(
        tile_ingest_counts(stream, streaming=True),
        "tile_counts", str(tmp_path / "ckpt"),
    )
    streamed = sorted(tuple(r) for r in out.collect())
    assert streamed == batch and len(batch) > 0
    # totals agree with the per-cell histogram (res 2.0 everywhere)
    n = sum(r[2] for r in batch)
    assert n == batch_docs.count()


def test_media_sniff_real_headers(spark):
    """Codec-free header sniffing is REAL (not a stub): construct valid
    PNG/JPEG/GIF/WAV containers byte-by-byte and parse format + dims +
    sample rate through the Spark mapInPandas path."""
    import struct
    import zlib

    from parallelcovertree_spark.operators.multimodal import media_sniff

    ihdr = struct.pack(">II", 320, 200) + b"\x08\x02\x00\x00\x00"
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 240, 360) + b"\x01\x11\x00")
    jpeg = b"\xff\xd8" + app0 + sof0
    gif = b"GIF89a" + struct.pack("<HH", 99, 77) + b"\x00\x00\x00"
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
           + struct.pack("<IHHI", 16, 1, 1, 44100))
    rows = [(0, png), (1, jpeg), (2, gif), (3, wav), (4, b"not media")]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: r for r in media_sniff(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 320, 200)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 360, 240)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 99, 77)
    assert (got[3]["format"], got[3]["sample_rate"]) == ("wav", 44100)
    assert got[4]["format"] == "unknown" and got[4]["n_bytes"] == 9
    assert all(got[i]["n_bytes"] == len(rows[i][1]) for i in range(5))


def test_media_sniff_stream_equals_batch(spark, tmp_path):
    """media_sniff is a stateless mapInPandas — it must run unchanged on a
    readStream (sniff-on-ingest) and match the batch result exactly."""
    import struct

    from parallelcovertree_spark.operators.multimodal import media_sniff

    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00\x00\x00"
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
           + struct.pack("<IHHI", 16, 1, 1, 22050))
    rows = [(0, gif), (1, wav), (2, b"junk")]
    batch_df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    src = tmp_path / "media"
    batch_df.coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema("doc_id LONG, payload BINARY").parquet(str(src))
    q = (
        media_sniff(stream).writeStream.format("memory")
        .queryName("sniff_stream").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("sniff_stream").collect()))
    want = sorted(map(tuple, media_sniff(batch_df).collect()))
    assert got == want and len(got) == 3


def test_streaming_dau_sketch_equals_batch_exactly(tmp_path, spark):
    """HLL register merge is order/partition-independent → the streamed
    windowed sketch equals the batch twin EXACTLY, across micro-batches."""
    import shutil

    from parallelcovertree_spark.streaming.jobs import (
        run_stream_once,
        stream_events_from_parquet,
        windowed_distinct_users,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "ev"
    d.mkdir()
    ev = spark.read.parquet(src)
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    for i in range(3):
        spark.createDataFrame(rows[i * n // 3 : (i + 1) * n // 3], ev.schema).coalesce(
            1
        ).write.parquet(str(tmp_path / f"p{i}"))
        shutil.copy(
            next((tmp_path / f"p{i}").glob("part-*.parquet")), d / f"{i:02d}.parquet"
        )
    out = run_stream_once(
        windowed_distinct_users(
            stream_events_from_parquet(spark, str(d)), streaming=True
        ),
        "dau_stream_t",
        str(tmp_path / "ck"),
    )
    got = {tuple(r) for r in out.collect()}
    want = {
        tuple(r)
        for r in windowed_distinct_users(spark.read.parquet(src)).collect()
    }
    assert got == want and len(got) > 0
