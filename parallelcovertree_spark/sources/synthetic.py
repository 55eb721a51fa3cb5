"""Synthetic sources (SURVEY.md S4/S5) — deterministic, partition-independent.

Mirrors the *role* of the reference's seeded generator
(``/root/reference/src/Point.cpp:45-60``, ``programs/create_points.cpp``):
fixtures are a pure function of (row id, seed), so the same table materializes
identically at any parallelism — the distributed-source analog of the
reference's rank-0-generate-then-scatter (``Point.cpp:68-111``), except no
scatter is needed: ``spark.range`` already block-distributes ids.

All generation is Arrow-batched (``mapInArrow``-style via mapInPandas) — no
per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from parallelcovertree_spark.functions.geo import gaussian_coords
from parallelcovertree_spark.functions.text import extract_text

_VOCAB = (
    "the spark data query join scan filter group sort merge hash key row value "
    "table index batch stream window count order part line customer small fast "
    "slow cover tree point radius level hub chain graph edge cell tile web page"
).split()
_LANGS = ["en", "de", "fr", "es", "zh"]

DOCS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string, doc_id bigint"
POINTS_SCHEMA = "id bigint, x float, y float"


def _doc_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    n = len(ids)
    # counter-based word choice: word j of doc i = VOCAB[(i*A + j*B + seed) % V]
    n_words = 8 + (ids * 2654435761 % 25).astype(np.int64)  # 8..32 words
    urls = [f"https://site{int(i) % 997}.example/page/{int(i)}" for i in ids]
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(ids, unit="s")
    htmls = []
    for i, nw in zip(ids, n_words):
        widx = (int(i) * 2654435761 + np.arange(nw) * 2246822519 + seed) % len(_VOCAB)
        words = " ".join(_VOCAB[w] for w in widx)
        htmls.append(
            f"<html><head><title>doc {int(i)}</title></head>"
            f"<body><p>{words}</p></body></html>".encode()
        )
    texts = [extract_text(h) for h in htmls]
    langs = [_LANGS[int(i) % len(_LANGS)] for i in ids]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
            "doc_id": ids.astype(np.int64),
        }
    )


def synthetic_docs(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Common-Crawl-shaped docs table (input_hint schema + doc_id)."""
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _doc_batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, DOCS_SCHEMA)


def synthetic_points(spark: SparkSession, n: int, var: float = 10.0, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Reference-parity point source: iid N(0, var) float32 coords, dim=2
    (``create_points`` analog). Deterministic per id at any parallelism."""
    rng = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            x, y = gaussian_coords(ids, var=var, seed=seed)
            yield pd.DataFrame({"id": ids.astype(np.int64), "x": x, "y": y})

    return rng.mapInPandas(gen, POINTS_SCHEMA)


def gaussian_points_np(n: int, var: float = 10.0, seed: int = 42) -> pd.DataFrame:
    """Driver-side numpy twin of ``synthetic_points`` (test oracle)."""
    ids = np.arange(n, dtype=np.int64)
    x, y = gaussian_coords(ids, var=var, seed=seed)
    return pd.DataFrame({"id": ids, "x": x, "y": y})
