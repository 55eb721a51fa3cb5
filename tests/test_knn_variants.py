"""All three kNN physical plans agree with the exact oracle."""

from __future__ import annotations

import pytest

from parallelcovertree_spark.operators.knn import (
    knn_join_block_kernel,
    knn_join,
    knn_join_grid_kernel,
    knn_join_jvm_arrays,
)
from parallelcovertree_spark.oracle import knn_np
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_points,
)


@pytest.mark.parametrize("variant", [knn_join, knn_join_grid_kernel, knn_join_block_kernel, knn_join_jvm_arrays])
def test_variants_match_oracle(spark, variant):
    pts = synthetic_points(spark, 400).persist()
    got = {(r.src, r.nbr_rank, r.dst) for r in variant(pts, k=10).collect()}
    assert got == knn_np(gaussian_points_np(400), k=10)
    pts.unpersist()


def test_jvm_arrays_forced_expansion(spark):
    """Tiny r0 → multi-round + straggler fallback path."""
    pts = synthetic_points(spark, 200)
    got = {(r.src, r.nbr_rank, r.dst) for r in knn_join_jvm_arrays(pts, k=5, r0=0.01).collect()}
    assert got == knn_np(gaussian_points_np(200), k=5)


def test_block_kernel_two_table(spark):
    """queries × corpus form: disjoint-id queries get corpus top-k; querying
    the corpus with itself (shared ids) equals the self-join."""
    import numpy as np
    import pandas as pd

    from parallelcovertree_spark.sources.synthetic import gaussian_points_np

    corpus_pdf = gaussian_points_np(300)
    rng = np.random.default_rng(77)
    q_pdf = pd.DataFrame({
        "id": np.arange(1000, 1040, dtype=np.int64),
        "x": rng.normal(scale=3.0, size=40).astype(np.float32),
        "y": rng.normal(scale=3.0, size=40).astype(np.float32),
    })
    corpus = spark.createDataFrame(corpus_pdf)
    qs = spark.createDataFrame(q_pdf)
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in knn_join_block_kernel(corpus, k=5, queries=qs).collect()
    }
    cxy = corpus_pdf[["x", "y"]].to_numpy(np.float32).astype(np.float64)
    cid = corpus_pdf["id"].to_numpy()
    want = set()
    for _, q in q_pdf.iterrows():
        d2 = ((cxy - np.array([q.x, q.y], dtype=np.float64)) ** 2).sum(axis=1)
        order = sorted(zip(d2.tolist(), cid.tolist()))
        for rank, (_, dst) in enumerate(order[:5], start=1):
            want.add((int(q.id), rank, int(dst)))
    assert got == want

    # shared ids == self-join
    self_like = {
        (r.src, r.nbr_rank, r.dst)
        for r in knn_join_block_kernel(corpus, k=5, queries=corpus).collect()
    }
    direct = {
        (r.src, r.nbr_rank, r.dst)
        for r in knn_join_block_kernel(corpus, k=5).collect()
    }
    assert self_like == direct


def test_block_kernel_disjoint_tables_colliding_ids(spark):
    """exclude_same_id=False: genuinely disjoint tables whose id spaces
    collide — a corpus point with the query's id is a valid neighbor and
    must be returned (VERDICT r2 'wrong' #5)."""
    import numpy as np
    import pandas as pd

    # corpus point id=7 sits exactly at the query id=7's location
    corpus_pdf = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "x": np.linspace(0.0, 49.0, 50).astype(np.float32),
        "y": np.zeros(50, dtype=np.float32),
    })
    q_pdf = pd.DataFrame({
        "id": np.array([7], dtype=np.int64),
        "x": np.array([7.0], dtype=np.float32),
        "y": np.array([0.0], dtype=np.float32),
    })
    corpus = spark.createDataFrame(corpus_pdf)
    qs = spark.createDataFrame(q_pdf)

    incl = {
        (r.src, r.nbr_rank, r.dst)
        for r in knn_join_block_kernel(
            corpus, k=3, queries=qs, exclude_same_id=False
        ).collect()
    }
    # nearest is the colliding corpus point itself (d=0), then ids 6/8
    assert incl == {(7, 1, 7), (7, 2, 6), (7, 3, 8)}

    # default (exclude_same_id=True) keeps the old "queries ⊆ corpus" view
    excl = {
        (r.src, r.nbr_rank, r.dst)
        for r in knn_join_block_kernel(corpus, k=3, queries=qs).collect()
    }
    assert excl == {(7, 1, 6), (7, 2, 8), (7, 3, 5)}
