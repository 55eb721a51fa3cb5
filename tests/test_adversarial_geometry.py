"""Adversarial-geometry fixtures for the spatial operators: coordinates ON
cell boundaries (exact multiples of the resolution), duplicate points, pairs
at distance EXACTLY r, negative coords straddling cell 0. Random fixtures
almost never hit these; floor/tie bugs live here.

All coordinates are exactly representable in float32 so the engine (float64
math over the given values) and the reference-discipline numpy oracle
(float32 storage, float64 math) see bit-identical inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join
from parallelcovertree_spark.operators.knn import (
    knn_join,
    knn_join_block_kernel,
    knn_join_grid_kernel,
)
from parallelcovertree_spark.oracle import epsilon_graph_np, knn_np

R = 1.25  # exact in binary floating point


def _adversarial_pdf():
    pts = []
    # lattice exactly on cell boundaries at res=R (incl. negatives and 0)
    for ix in range(-3, 4):
        for iy in range(-2, 3):
            pts.append((ix * R, iy * R))
    # exact duplicates
    pts += [(0.0, 0.0)] * 3 + [(-2 * R, R)] * 2
    # a pair at distance exactly R, axis-aligned, off-lattice (0.375 exact)
    pts += [(0.375, 0.5), (0.375 + R, 0.5)]
    # a 3-4-5 triangle with exactly-representable legs: (0.75, 1.0) → hyp R
    pts += [(5.5, 6.25), (5.5 + 0.75, 6.25 + 1.0)]
    arr = np.array(pts, dtype=np.float64)
    assert np.all(arr == arr.astype(np.float32).astype(np.float64))  # f32-exact
    return pd.DataFrame({
        "id": np.arange(len(arr), dtype=np.int64),
        "x": arr[:, 0], "y": arr[:, 1],
    })


def test_epsilon_half_plan_on_boundaries(spark):
    pdf = _adversarial_pdf()
    df = spark.createDataFrame(pdf)
    got = {(r.src, r.dst) for r in epsilon_self_join(df, R).collect()}
    want = epsilon_graph_np(pdf, R)
    # the exact-distance pairs must be present (<= semantics, not <)
    n = len(pdf)
    assert (n - 4, n - 3) in got and (n - 2, n - 1) in got
    assert got == want


@pytest.mark.parametrize("variant", [knn_join, knn_join_grid_kernel, knn_join_block_kernel])
def test_knn_variants_on_boundaries(spark, variant):
    pdf = _adversarial_pdf()
    df = spark.createDataFrame(pdf)
    got = {(r.src, r.nbr_rank, r.dst) for r in variant(df, k=4).collect()}
    assert got == knn_np(pdf, k=4)
