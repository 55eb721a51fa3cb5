"""End-to-end input_hint pipeline: docs(url, warc_ts, html, text, lang) →
byte-identical extraction → url-hash geotag → tile → ε-join, all verified
against driver-side numpy oracles. This is the north star's flow in one test."""

from __future__ import annotations

import numpy as np

from parallelcovertree_spark.functions.cells import cell_ids_np, with_cell
from parallelcovertree_spark.functions.geo import geotag_docs, geotag_docs_pdf
from parallelcovertree_spark.functions.text import extract_text
from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join
from parallelcovertree_spark.sources.synthetic import synthetic_docs


def test_web_pipeline_end_to_end(spark):
    n, radius, res = 800, 1.5, 2.0
    docs = synthetic_docs(spark, n).persist()

    # 1. geotag by url hash (Arrow-batched), schema = input_hint + (x, y)
    tagged = geotag_docs(docs).persist()
    rows = tagged.collect()
    assert len(rows) == n
    assert tagged.schema["x"].dataType.simpleString() == "float"

    # oracle coords from the same urls, driver-side
    urls = [r.url for r in rows]
    ox, oy = geotag_docs_pdf(urls)
    got_xy = np.stack([[r.x for r in rows], [r.y for r in rows]], axis=1).astype(np.float32)
    assert np.array_equal(got_xy, np.stack([ox, oy], axis=1))

    # 2. per-url byte-identical extraction held through the pipeline
    for r in rows[:50]:
        assert r.text.encode() == extract_text(bytes(r.html)).encode()

    # 3. tile assignment matches the numpy encoder
    cells = {r.url: r.cell_id for r in with_cell(tagged, res).select("url", "cell_id").collect()}
    want_cells = dict(zip(urls, cell_ids_np(ox, oy, res).tolist()))
    assert cells == want_cells

    # 4. ε-join on the geotagged docs vs brute force (by url-keyed ids)
    pts = tagged.select(tagged.doc_id.alias("id"), "x", "y")
    got = {(r.src, r.dst) for r in epsilon_self_join(pts, radius).collect()}
    ids = np.array([r.doc_id for r in rows])
    xy64 = got_xy.astype(np.float64)
    d2 = ((xy64[:, None, :] - xy64[None, :, :]) ** 2).sum(axis=2)
    want = {
        (int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(d2 <= radius * radius))
    }
    assert got == want
    docs.unpersist()
    tagged.unpersist()
