"""Closed-form pins for the hotspot Gi*, trajectory, and BM25 operators —
the semantics the DuckDB gate can't see (edge rings, single-event users,
rank monotonicity) verified against hand-computed / numpy oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest

from parallelcovertree_spark.functions.cells import _OFF, _SHIFT
from parallelcovertree_spark.operators.corpus import bm25_top_terms
from parallelcovertree_spark.operators.hotspot import cell_hotspots
from parallelcovertree_spark.operators.trajectory import trajectory_stats


def _cell(ix: int, iy: int) -> int:
    return (ix + _OFF) * _SHIFT + (iy + _OFF)


# --- hotspots -----------------------------------------------------------


def test_hotspot_counts_rings_and_z(spark):
    # 2×2 occupied grid (res=1): counts 1,2,3,10 at (0,0),(1,0),(0,1),(1,1).
    # Every cell's 1-ring covers all four occupied cells → ring_n=16,
    # ring_cells=4 everywhere; z identical for all cells.
    counts = {(0, 0): 1, (1, 0): 2, (0, 1): 3, (1, 1): 10}
    rows = [
        (float(ix) + 0.5, float(iy) + 0.5)
        for (ix, iy), n in counts.items()
        for _ in range(n)
    ]
    pts = spark.createDataFrame(rows, "x double, y double")
    out = {
        r["cell_id"]: r
        for r in cell_hotspots(pts, 1.0).collect()
    }
    assert set(out) == {_cell(ix, iy) for ix, iy in counts}
    ns = np.array(list(counts.values()), dtype=float)
    mean, var = ns.mean(), (ns**2).mean() - ns.mean() ** 2
    for (ix, iy), n in counts.items():
        r = out[_cell(ix, iy)]
        assert r["n"] == n
        assert r["ring_n"] == 16
        assert r["ring_cells"] == 4
        z = (16 - 4 * mean) / math.sqrt(4 * var)
        assert r["gi_z"] == pytest.approx(z, rel=1e-12)


def test_hotspot_isolated_cell_ring_is_itself(spark):
    # far-apart cells: each ring contains only the cell itself
    pts = spark.createDataFrame(
        [(0.5, 0.5), (0.5, 0.5), (100.5, 100.5)], "x double, y double"
    )
    out = {r["cell_id"]: r for r in cell_hotspots(pts, 1.0).collect()}
    a, b = out[_cell(0, 0)], out[_cell(100, 100)]
    assert (a["n"], a["ring_n"], a["ring_cells"]) == (2, 2, 1)
    assert (b["n"], b["ring_n"], b["ring_cells"]) == (1, 1, 1)
    # z sign: count-2 cell above the mean(1.5), count-1 below
    assert a["gi_z"] > 0 > b["gi_z"]


def test_hotspot_partition_invariance(spark):
    rng = np.random.default_rng(7)
    xs, ys = rng.uniform(-5, 5, 500), rng.uniform(-5, 5, 500)
    rows = [(float(a), float(b)) for a, b in zip(xs, ys)]
    df1 = spark.createDataFrame(rows, "x double, y double").coalesce(1)
    df8 = spark.createDataFrame(rows, "x double, y double").repartition(8)
    r1 = sorted(map(tuple, cell_hotspots(df1, 2.0).collect()))
    r8 = sorted(map(tuple, cell_hotspots(df8, 2.0).collect()))
    assert r1 == r8  # exact — integer sums + fixed-tree doubles


# --- NN distance / Clark-Evans -------------------------------------------


def test_nn_distance_hand_computed(spark):
    from parallelcovertree_spark.operators.hotspot import nn_distance_stats

    # collinear points at x=0,3,7 → 1-NN distances 3,3,4; one big cell
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 3.0, 0.0), (3, 7.0, 0.0)], "id long, x double, y double"
    )
    rows = nn_distance_stats(pts, 100.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 3
    assert r["sum_nn_micro"] == 10_000_000
    assert r["max_nn_micro"] == 4_000_000
    assert r["mean_nn_micro"] == pytest.approx(10_000_000 / 3)
    # CE = mean_nn * 2*sqrt(density) = (10/3) * 2*sqrt(3/10000)
    assert r["ce_ratio"] == pytest.approx((10 / 3) * 2 * math.sqrt(3 / 10000.0), rel=1e-9)


def test_nn_distance_clustered_vs_dispersed(spark):
    from parallelcovertree_spark.operators.hotspot import nn_distance_stats

    # cell A [0,10): 3 tight clusters of 3 → tiny NN distances (CE << 1)
    clustered = [
        (i * 10 + j, 1.0 + 3.0 * i + 0.01 * j, 1.0) for i in range(3) for j in range(3)
    ]
    # cell B [10,20): 3×3 regular 3-spaced lattice → near-Poisson/dispersed
    dispersed = [
        (1000 + i * 10 + j, 11.0 + 3.0 * i, 1.0 + 3.0 * j)
        for i in range(3)
        for j in range(3)
    ]
    pts = spark.createDataFrame(clustered + dispersed, "id long, x double, y double")
    out = {r["cell_id"]: r for r in nn_distance_stats(pts, 10.0).collect()}
    a = out[_cell(0, 0)]
    b = out[_cell(1, 0)]
    assert a["n"] == b["n"] == 9
    assert a["ce_ratio"] < 0.1 < b["ce_ratio"]
    assert b["ce_ratio"] > 1.0  # regular lattice is MORE dispersed than random


# --- trajectories --------------------------------------------------------


def test_trajectory_hand_computed(spark):
    from datetime import datetime

    t = datetime(2026, 1, 1)

    def ts(s):
        return t.replace(second=s)

    rows = [
        # user 1: (0,0) -> (3,4) -> (3,0): steps 5, 4; net 3
        (1, ts(1), 10, 0.0, 0.0),
        (1, ts(2), 11, 3.0, 4.0),
        (1, ts(3), 12, 3.0, 0.0),
        # user 2: single event — zero steps/distances
        (2, ts(1), 20, 7.0, 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, x double, y double"
    )
    out = {r["user_id"]: r for r in trajectory_stats(ev).collect()}
    u1, u2 = out[1], out[2]
    assert (u1["n_events"], u1["n_steps"]) == (3, 2)
    assert u1["path_micro"] == 9_000_000
    assert u1["max_step_micro"] == 5_000_000
    assert u1["net_micro"] == 3_000_000
    assert (u2["n_events"], u2["n_steps"]) == (1, 0)
    assert (u2["path_micro"], u2["max_step_micro"], u2["net_micro"]) == (0, 0, 0)


def test_trajectory_order_is_ts_then_event_id(spark):
    from datetime import datetime

    t = datetime(2026, 1, 1)
    # identical ts → event_id breaks the tie; path = 1 + 1 = 2 in id order,
    # whereas input order would give a different (longer) path
    rows = [
        (1, t, 3, 2.0, 0.0),
        (1, t, 1, 0.0, 0.0),
        (1, t, 2, 1.0, 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, x double, y double"
    )
    r = trajectory_stats(ev).collect()[0]
    assert r["path_micro"] == 2_000_000
    assert r["net_micro"] == 2_000_000


# --- BM25 ----------------------------------------------------------------


def _bm25_numpy(docs, k1=1.2, b=0.75):
    """Reference scores via plain python/numpy."""
    tf = {}
    for i, text in docs:
        for tok in text.split(" "):
            if tok:
                tf[(i, tok)] = tf.get((i, tok), 0) + 1
    df = {}
    for (_, tok), _n in tf.items():
        df[tok] = df.get(tok, 0) + 1
    dl = {}
    for (i, _), n in tf.items():
        dl[i] = dl.get(i, 0) + n
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    out = {}
    for (i, tok), n in tf.items():
        idf = (n_docs - df[tok] + 0.5) / (df[tok] + 0.5)
        norm = n * (k1 + 1.0) / (n + k1 * (1.0 - b + b * (dl[i] / avgdl)))
        out[(i, tok)] = idf * norm
    return out


def test_bm25_ranks_match_numpy(spark):
    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana durian"),
        (3, "apple cherry cherry cherry elderberry elderberry"),
    ]
    scores = _bm25_numpy(docs)
    want = {}
    for i in {d[0] for d in docs}:
        terms = sorted(
            ((t, s) for (j, t), s in scores.items() if j == i),
            key=lambda p: (-p[1], p[0]),
        )
        want[i] = [t for t, _ in terms[:3]]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in bm25_top_terms(df, k=3).collect():
        got.setdefault(r["doc_id"], {})[r["rank"]] = r["term"]
    for i, terms in want.items():
        assert [got[i][k] for k in sorted(got[i])] == terms


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    # same tf, same doc → rarer term must score higher
    docs = [(1, "rare common"), (2, "common"), (3, "common")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["term"]: r["rank"] for r in bm25_top_terms(df, k=3).collect() if r["doc_id"] == 1}
    assert rows["rare"] < rows["common"]


# --- OD flows -------------------------------------------------------------


def test_od_flows_hand_computed(spark):
    from datetime import datetime

    from parallelcovertree_spark.operators.trajectory import od_flows

    t = datetime(2026, 1, 1)

    def ts(s):
        return t.replace(second=s)

    # user 1: cell(0,0) → cell(1,0) → cell(1,0): one cross hop + one dwell
    # user 2: cell(0,0) → cell(1,0): same corridor, second distinct user
    # user 3: single event → no trips
    rows = [
        (1, ts(1), 10, 0.5, 0.5),
        (1, ts(2), 11, 1.5, 0.5),
        (1, ts(3), 12, 1.6, 0.5),
        (2, ts(1), 20, 0.6, 0.5),
        (2, ts(2), 21, 1.4, 0.5),
        (3, ts(1), 30, 5.5, 5.5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, x double, y double"
    )
    got = {
        (r["from_cell"], r["to_cell"]): (r["n_trips"], r["n_users"])
        for r in od_flows(ev, 1.0).collect()
    }
    assert got == {
        (_cell(0, 0), _cell(1, 0)): (2, 2),
        (_cell(1, 0), _cell(1, 0)): (1, 1),
    }


def test_od_flows_ties_break_on_event_id(spark):
    from datetime import datetime

    from parallelcovertree_spark.operators.trajectory import od_flows

    t = datetime(2026, 1, 1)
    # identical ts → event_id order decides the trip direction
    rows = [(1, t, 2, 1.5, 0.5), (1, t, 1, 0.5, 0.5)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, x double, y double"
    )
    got = [
        (r["from_cell"], r["to_cell"]) for r in od_flows(ev, 1.0).collect()
    ]
    assert got == [(_cell(0, 0), _cell(1, 0))]


# --- space-time hotspots ---------------------------------------------------


def test_st_hotspots_ring_spans_time(spark):
    from parallelcovertree_spark.operators.hotspot import st_hotspots

    # one cell occupied in buckets 0,1,2 (counts 1,5,1), far cell in bucket 1
    rows = (
        [(100, 0.5, 0.5)]
        + [(86_400_000_000 + i, 0.5, 0.5) for i in range(5)]
        + [(2 * 86_400_000_000 + 7, 0.5, 0.5)]
        + [(86_400_000_000 + 9, 50.5, 50.5)]
    )
    ev = spark.createDataFrame(rows, "us long, x double, y double")
    out = {
        (r["bucket"], r["cell_id"]): r
        for r in st_hotspots(ev, 1.0, 86_400_000_000).collect()
    }
    # middle bucket of the active cell sees all 7 of its own column's events
    mid = out[(1, _cell(0, 0))]
    assert (mid["n"], mid["ring_n"], mid["ring_cells"]) == (5, 7, 3)
    # the far cell's ring is itself only
    far = out[(1, _cell(50, 50))]
    assert (far["n"], far["ring_n"], far["ring_cells"]) == (1, 1, 1)
    # exact z from the global moments: counts {1,5,1,1} → μ=2, σ²=3
    mu, var = 2.0, 3.0
    for key, (rn, rc) in {
        (1, _cell(0, 0)): (7, 3),
        (0, _cell(0, 0)): (6, 2),
        (1, _cell(50, 50)): (1, 1),
    }.items():
        assert out[key]["gi_z"] == pytest.approx(
            (rn - rc * mu) / math.sqrt(rc * var), rel=1e-12
        )
    # the far singleton sits BELOW the global mean → negative z
    assert far["gi_z"] < 0


# --- fence dwell -----------------------------------------------------------


def test_fence_dwell_hand_computed(spark):
    from parallelcovertree_spark.operators.polygon import fence_dwell

    polys = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0), (1, 10.0, 0.0, 2.0)],
        "poly_id long, cx double, cy double, rp double",
    )
    rows = [
        (1, 1000, 0.1, 0.1),   # fence 0
        (1, 5000, -0.2, 0.3),  # fence 0
        (1, 9000, 10.1, 0.0),  # fence 1
        (2, 400, 0.0, 0.0),    # fence 0, single visit
        (3, 77, 50.0, 50.0),   # outside everything
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long, x double, y double")
    got = {
        (r["user_id"], r["poly_id"]): (r["n_events"], r["first_us"], r["last_us"], r["dwell_us"])
        for r in fence_dwell(ev, polys).collect()
    }
    assert got == {
        (1, 0): (2, 1000, 5000, 4000),
        (1, 1): (1, 9000, 9000, 0),
        (2, 0): (1, 400, 400, 0),
    }
