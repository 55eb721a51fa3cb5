"""Registry gates for the multimodal plumbing: byte_features against a pure-
python twin, and the construct→parse header round-trip on the planted
arithmetic (the DuckDB oracle replays the same formulas at the driver gate)."""

from __future__ import annotations

from parallelcovertree_spark.operators.multimodal import (
    byte_features,
    docs_to_media,
    media_sniff,
    synthetic_headers,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_docs_to_media_schema_and_kinds(spark):
    docs = _docs_df(spark, ["alpha beta", "gamma", "delta eps", "zeta"])
    media = docs_to_media(docs)
    rows = {r.doc_id: r for r in media.collect()}
    assert [rows[i].kind for i in range(4)] == ["image", "audio", "video", "image"]
    assert bytes(rows[0].payload) == b"alpha beta"
    assert rows[0].meta.width == 32 and rows[0].meta.sample_rate is None
    assert rows[1].meta.sample_rate == 16000 and rows[1].meta.width is None


def test_byte_features_matches_python_twin(spark):
    texts = ["key agg row", "a", "zz top  scan", "   ", "mixed Case 09!"]
    got = {r.doc_id: r for r in byte_features(docs_to_media(_docs_df(spark, texts))).collect()}
    for i, t in enumerate(texts):
        b = t.encode()
        r = got[i]
        assert (r.n_bytes, r.sum_bytes) == (len(b), sum(b))
        assert (r.min_byte, r.max_byte) == (min(b), max(b))
        assert (r.first_byte, r.last_byte) == (b[0], b[-1])


def test_synthetic_headers_round_trip_planted_arithmetic(spark):
    docs = _docs_df(spark, ["x"] * 30)
    got = {r.doc_id: r for r in media_sniff(synthetic_headers(docs)).collect()}
    for i in range(30):
        r = got[i]
        if i % 3 == 0:
            assert (r.format, r.width, r.height) == ("png", 32 + i % 64, 32 + i % 16)
            assert r.sample_rate is None and r.n_bytes == 24
        elif i % 3 == 1:
            assert (r.format, r.sample_rate) == ("wav", 8000 * (1 + i % 5))
            assert r.width is None and r.n_bytes == 28
        else:
            assert (r.format, r.width, r.height) == ("gif", 64 + i % 32, 48)
            assert r.sample_rate is None and r.n_bytes == 10


def test_frame_manifest_ceiling_arithmetic(spark):
    # doc_id % 3 == 2 → video; lengths 16 (exact) and 13 (short last frame)
    docs = spark.createDataFrame(
        [(2, "a" * 16), (5, "b" * 13), (0, "c" * 40), (1, "d" * 40)],
        "doc_id LONG, text STRING",
    )

    from parallelcovertree_spark.operators.multimodal import docs_to_media, frame_sample
    from pyspark.sql import functions as F

    frames = frame_sample(docs_to_media(docs), every_n=8)
    got = {
        r.doc_id: r
        for r in frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min(F.octet_length("frame_bytes")).alias("last_frame_bytes"),
        )
        .collect()
    }
    assert set(got) == {2, 5}  # only video docs explode
    assert (got[2].n_frames, got[2].last_frame_bytes) == (2, 8)
    assert (got[5].n_frames, got[5].last_frame_bytes) == (2, 5)


def test_resize_nearest_matches_python_reference(spark):
    from parallelcovertree_spark.operators.multimodal import (
        resize_nearest,
        synthetic_pixels,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id LONG")
    got = {r.doc_id: r for r in resize_nearest(synthetic_pixels(docs), 8, 6).collect()}
    for i in range(12):
        w, h = 16 + i % 16, 12 + i % 8
        img = [[(i * 31 + (y * w + x) * 7) % 256 for x in range(w)] for y in range(h)]
        small = [
            [img[(dy * h) // 6][(dx * w) // 8] for dx in range(8)] for dy in range(6)
        ]
        r = got[i]
        assert (r.src_w, r.src_h, r.dst_w, r.dst_h) == (w, h, 8, 6)
        assert r.sum_px == sum(sum(row) for row in small)
        assert (r.first_px, r.last_px) == (small[0][0], small[5][7])


def test_byte_features_null_and_empty_payloads(spark):
    from parallelcovertree_spark.operators.multimodal import byte_features

    media = spark.createDataFrame(
        [(0, "image", b"ab"), (1, "audio", b""), (2, "video", None)],
        "doc_id LONG, kind STRING, payload BINARY",
    )
    got = {r.doc_id: r for r in byte_features(media).collect()}
    assert (got[0].n_bytes, got[0].sum_bytes) == (2, 195)
    for i in (1, 2):
        assert got[i].n_bytes == 0 and got[i].sum_bytes == 0
        assert got[i].min_byte is None and got[i].last_byte is None
