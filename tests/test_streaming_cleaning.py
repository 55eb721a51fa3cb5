"""Stateless cleaning on ingest: pii_scrub over a stream == batch.

paragraph_dedup is deliberately NOT streamed — its line-document-frequency
aggregate is a global property of the corpus, so the streaming twin would
need stateful df counts (the minhash/dedup pattern); the stateless scrub is
the pass that belongs in the ingest path.
"""

from __future__ import annotations

import shutil

from parallelcovertree_spark.operators.cleaning import pii_scrub
from parallelcovertree_spark.streaming.tiles import stream_docs_from_parquet

SF = "/root/testdata/sf0.001"


def test_streaming_pii_scrub_matches_batch(tmp_path, spark):
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", docs_dir / "documents.parquet")

    out = pii_scrub(stream_docs_from_parquet(spark, str(docs_dir)))
    q = (
        out.writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(r)
        for r in spark.table("pii_stream").collect()
    }
    want = {
        tuple(r)
        for r in pii_scrub(spark.read.parquet(f"{SF}/documents.parquet")).collect()
    }
    assert got == want and len(got) > 0
