"""Cell index unit tests + two-table ε-join + oracle-twin equivalences."""

from __future__ import annotations

import numpy as np

from parallelcovertree_spark.functions.cells import (
    cell_ids_np,
    k_ring_offsets,
    resolution_for_radius,
    with_cell,
)
from parallelcovertree_spark.operators.epsilon_join import epsilon_join
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_points,
)


def test_k_ring_offsets():
    assert len(k_ring_offsets(1)) == 9
    assert len(k_ring_offsets(2)) == 25
    assert (0, 0) in k_ring_offsets(1)
    assert resolution_for_radius(0.25) == 0.25


def test_cell_encoder_spark_matches_numpy(spark):
    pts = synthetic_points(spark, 300)
    got = {r.id: r.cell_id for r in with_cell(pts, 0.7).collect()}
    pdf = gaussian_points_np(300)
    want = dict(zip(pdf["id"].tolist(),
                    cell_ids_np(pdf["x"].to_numpy(), pdf["y"].to_numpy(), 0.7).tolist()))
    assert got == want


def test_two_table_epsilon_join(spark):
    """queries × corpus ε-join (J1 two-table form) vs numpy brute force."""
    corpus = synthetic_points(spark, 400)
    queries = synthetic_points(spark, 60, seed=9)
    got = {(r.src, r.dst) for r in epsilon_join(queries, corpus, 1.2).collect()}

    c = gaussian_points_np(400)
    q = gaussian_points_np(60, seed=9)
    cxy = c[["x", "y"]].to_numpy(np.float32).astype(np.float64)
    qxy = q[["x", "y"]].to_numpy(np.float32).astype(np.float64)
    d2 = ((qxy[:, None, :] - cxy[None, :, :]) ** 2).sum(axis=2)
    want = {(int(a), int(b)) for a, b in zip(*np.nonzero(d2 <= 1.2 * 1.2))}
    assert got == want


def test_parent_cell_equals_direct_coarse_encoding(spark):
    """Floor composition law incl. negative coords: deriving the parent
    from the CHILD CELL ID equals encoding the point at double resolution."""
    import numpy as np

    from parallelcovertree_spark.functions.cells import cell_id, parent_cell

    rng = np.random.default_rng(3)
    pts = spark.createDataFrame(
        [(float(x), float(y)) for x, y in rng.normal(0, 5, size=(500, 2))],
        "x double, y double",
    )
    for res in (0.7, 2.0):
        df = pts.select(
            parent_cell(cell_id("x", "y", res)).alias("derived"),
            cell_id("x", "y", res * 2).alias("direct"),
        )
        assert df.where("derived != direct").count() == 0
