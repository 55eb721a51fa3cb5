"""Streaming MinHash LSH near-dup on ingest == batch minhash_dup_pairs_np
on bounded in-order input, including candidate pairs spanning micro-batches."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from parallelcovertree_spark.operators.dedup import minhash_dup_pairs_np
from parallelcovertree_spark.streaming.minhash import minhash_dup_stream
from parallelcovertree_spark.streaming.tiles import stream_docs_from_parquet

SF = "/root/testdata/sf0.001"


def _drain(stream_df, name, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_streaming_minhash_matches_batch(tmp_path, spark):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", docs_dir / "documents.parquet")

    got_df = _drain(
        minhash_dup_stream(
            stream_docs_from_parquet(spark, str(docs_dir)), n_perm=32, bands=8
        ),
        "mh_updates", str(tmp_path / "ck1"),
    )
    got = {(r.src, r.dst) for r in got_df.collect()}
    assert got_df.count() == len(got)  # distinct by construction
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = {
        (r.src, r.dst)
        for r in minhash_dup_pairs_np(docs, n_perm=32, bands=8).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_minhash_pairs_span_microbatches(tmp_path, spark):
    """Split the corpus at the median doc_id into two files: pairs whose
    members land in different micro-batches must still be found (bucket
    state carries the first member), and the union equals the batch set."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    lo = docs.where(F.col("doc_id") <= mid)
    hi = docs.where(F.col("doc_id") > mid)
    d = tmp_path / "docs2"
    d.mkdir()
    for i, part in enumerate((lo, hi)):
        part.coalesce(1).write.parquet(str(tmp_path / f"p{i}"))
        f = next((tmp_path / f"p{i}").glob("part-*.parquet"))
        shutil.copy(f, d / f"{i:02d}.parquet")

    got_df = _drain(
        minhash_dup_stream(
            stream_docs_from_parquet(spark, str(d)), n_perm=32, bands=8
        ),
        "mh_span", str(tmp_path / "ck2"),
    )
    got = {(r.src, r.dst) for r in got_df.collect()}
    want = {
        (r.src, r.dst)
        for r in minhash_dup_pairs_np(docs, n_perm=32, bands=8).collect()
    }
    assert got == want
    # and some pairs genuinely cross the file boundary
    crossing = {(a, b) for a, b in want if a <= mid < b}
    assert crossing and crossing <= got
