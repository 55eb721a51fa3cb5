"""DBSCAN operator: handcrafted geometry, brute-force twin, invariances."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.clustering import dbscan


def _mk(spark, pts):
    return spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in pts], "id long, x double, y double"
    )


# Two tight 5-point clusters, one border point reaching only cluster A's
# rim, one isolated noise point. eps=0.5, min_pts=5 (self included).
GEOM = (
    [(i, 0.1 * (i % 2), 0.1 * (i // 2)) for i in range(5)]  # cluster A: ids 0-4
    + [(5, 0.55, 0.0)]  # border of A (sees 2 cores + self = 3 < 5)
    + [(10 + i, 10 + 0.1 * (i % 2), 10 + 0.1 * (i // 2)) for i in range(5)]  # B
    + [(20, 5.0, 5.0)]  # noise
)


def test_dbscan_handcrafted(spark):
    out = {
        r.id: (r.cluster_id, r.role)
        for r in dbscan(_mk(spark, GEOM), 0.5, 5).collect()
    }
    assert len(out) == 12
    for i in range(5):
        assert out[i] == (0, "core")
        assert out[10 + i] == (10, "core")
    assert out[5] == (0, "border")
    assert out[20] == (-1, "noise")


def _brute_dbscan(ids, xy, eps, min_pts):
    """Pure-numpy deterministic DBSCAN twin (min-label components, border
    takes min core-neighbor cluster id)."""
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    adj = d2 <= eps * eps  # includes the diagonal (self)
    core = adj.sum(1) >= min_pts
    label = {i: i for i in np.where(core)[0]}
    changed = True
    while changed:  # naive min-label fixpoint over core-core edges
        changed = False
        for i in label:
            nbrs = [j for j in np.where(adj[i] & core)[0]]
            m = min(label[j] for j in nbrs + [i])
            if m < label[i]:
                label[i] = m
                changed = True
    out = {}
    for i in range(len(ids)):
        if core[i]:
            out[ids[i]] = (ids[label[i]], "core")
        else:
            cn = [label[j] for j in np.where(adj[i] & core)[0]]
            out[ids[i]] = (ids[min(cn)], "border") if cn else (-1, "noise")
    return out


def test_dbscan_matches_bruteforce_random(spark):
    rng = np.random.default_rng(7)
    xy = np.concatenate(
        [
            rng.normal((0, 0), 0.3, (25, 2)),
            rng.normal((4, 4), 0.3, (25, 2)),
            rng.uniform(-8, 12, (10, 2)),
        ]
    )
    ids = np.arange(len(xy))
    eps, min_pts = 0.6, 4
    want = _brute_dbscan(ids, xy, eps, min_pts)
    got = {
        r.id: (r.cluster_id, r.role)
        for r in dbscan(
            _mk(spark, [(i, x, y) for i, (x, y) in zip(ids, xy)]), eps, min_pts
        ).collect()
    }
    assert got == want


def test_dbscan_partition_invariance(spark):
    df = _mk(spark, GEOM)
    a = sorted(map(tuple, dbscan(df, 0.5, 5).collect()))
    b = sorted(map(tuple, dbscan(df.repartition(7), 0.5, 5).collect()))
    assert a == b


def test_dbscan_all_noise_and_all_core(spark):
    # min_pts above any degree → everything noise
    noisy = dbscan(_mk(spark, GEOM), 0.5, 99).collect()
    assert all(r.role == "noise" and r.cluster_id == -1 for r in noisy)
    # min_pts=1 → every point core; A+border merge never happens (border is
    # now core but 0.55 is within eps of A's rim, so it joins A's component)
    allc = {r.id: (r.cluster_id, r.role) for r in dbscan(_mk(spark, GEOM), 0.5, 1).collect()}
    assert all(role == "core" for _, role in allc.values())
    assert allc[5][0] == 0  # rim-connected to cluster A
    assert allc[20] == (20, "core")  # isolated singleton component
