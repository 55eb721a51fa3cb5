"""Sources + text extraction invariants (input_hint: byte-identical text)."""

from __future__ import annotations

import numpy as np

from parallelcovertree_spark.functions.geo import gaussian_coords
from parallelcovertree_spark.functions.text import (
    extract_text,
    fingerprint_np,
)
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_docs,
    synthetic_points,
)


def test_extract_text_deterministic_bytes():
    html = b"<html><head><title>doc 1</title></head><body><p>a &amp; b  c</p></body></html>"
    t1 = extract_text(html)
    t2 = extract_text(html)
    assert t1 == t2 == "doc 1 a & b c"
    assert t1.encode() == t2.encode()


def test_docs_text_byte_identical_per_url(spark):
    """Per-url invariant: stored text == extract_text(html), byte-for-byte."""
    rows = synthetic_docs(spark, 200).collect()
    assert len(rows) == 200
    assert len({r.url for r in rows}) == 200
    for r in rows:
        assert r.text.encode() == extract_text(bytes(r.html)).encode()


def test_docs_partition_independent(spark):
    a = {r.url: r.text for r in synthetic_docs(spark, 100, partitions=1).collect()}
    b = {r.url: r.text for r in synthetic_docs(spark, 100, partitions=13).collect()}
    assert a == b


def test_points_match_numpy_twin(spark):
    got = synthetic_points(spark, 500, partitions=7).toPandas().sort_values("id").reset_index(drop=True)
    want = gaussian_points_np(500)
    assert np.array_equal(got["x"].to_numpy(), want["x"].to_numpy())
    assert np.array_equal(got["y"].to_numpy(), want["y"].to_numpy())
    assert got["x"].dtype == np.float32  # float32 storage (reference parity)


def test_points_gaussian_shape():
    """Distribution sanity: mean ~0, var ~10 (reference defaults)."""
    ids = np.arange(50_000)
    x, y = gaussian_coords(ids, var=10.0, seed=42)
    assert abs(float(x.mean())) < 0.1
    assert abs(float(x.astype(np.float64).var() - 10.0)) < 0.3
    assert abs(float(y.astype(np.float64).var() - 10.0)) < 0.3


def test_fingerprint_deterministic():
    import pandas as pd

    s = pd.Series(["hello world document", "hello world document", "other text"])
    f = fingerprint_np(s)
    assert f[0] == f[1]
    assert f[0] != f[2]


def test_fingerprint_vectorized_matches_loop_reference():
    """The column-wise vectorized rolling hash must be output-identical to
    the straightforward per-document loop (the r1 implementation), incl.
    unicode multibyte, empty, and shorter-than-window docs."""
    import numpy as np
    import pandas as pd

    from parallelcovertree_spark.functions.text import fingerprint_np

    def loop_ref(texts, window=8, prime=1_000_000_007):
        out = np.empty(len(texts), dtype=np.int64)
        base = 257
        pw = pow(base, window - 1, prime)
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if len(b) < window:
                out[i] = int(b.sum()) % prime
                continue
            h = 0
            for j in range(window):
                h = (h * base + int(b[j])) % prime
            best = h
            for j in range(window, len(b)):
                h = ((h - int(b[j - window]) * pw) * base + int(b[j])) % prime
                best = min(best, h)
            out[i] = best
        return pd.Series(out)

    rng = np.random.default_rng(5)
    texts = pd.Series(
        ["".join(chr(rng.integers(32, 127)) for _ in range(rng.integers(0, 200)))
         for _ in range(300)]
        + ["", "a", "1234567", "exactly8", "ünïcödé multibyte ünïcödé", "\t\n  "]
    )
    assert fingerprint_np(texts).equals(loop_ref(texts))
