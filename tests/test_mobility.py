"""Mobility analytics (operators/mobility.py + cell_daily_anomaly) vs
hand-computed / python twins: modal ties, centroid exactness, slot
multiplicity collapse, observed-bucket anomaly baselines."""

from __future__ import annotations

import math

import numpy as np
import pytest

from parallelcovertree_spark.functions.cells import _OFF, _SHIFT
from parallelcovertree_spark.operators.mobility import (
    colocation_pairs,
    home_cell,
    radius_of_gyration,
)


def _cell(ix: int, iy: int) -> int:
    return (ix + _OFF) * _SHIFT + (iy + _OFF)


def test_home_cell_modal_and_tie_break(spark):
    rows = (
        [(1, 0.5, 0.5)] * 3          # user 1: 3 events in (0,0)
        + [(1, 5.5, 0.5)] * 2        # 2 in (5,0) → home (0,0), share 3/5
        + [(2, 1.5, 0.5)] * 2        # user 2: 2 and 2 → tie, smaller cell
        + [(2, 0.5, 0.5)] * 2
    )
    ev = spark.createDataFrame(rows, "user_id long, x double, y double")
    got = {r["user_id"]: r for r in home_cell(ev, 1.0).collect()}
    u1 = got[1]
    assert (u1["home_cell"], u1["n_home"], u1["n_total"]) == (_cell(0, 0), 3, 5)
    assert u1["home_share"] == pytest.approx(0.6, rel=1e-12)
    assert got[2]["home_cell"] == _cell(0, 0)  # tie → smallest cell id


def test_radius_of_gyration_matches_numpy(spark):
    rng = np.random.default_rng(37)
    rows = [
        (int(u), float(x), float(y))
        for u, x, y in zip(
            rng.integers(0, 5, 200), rng.uniform(-8, 8, 200), rng.uniform(-8, 8, 200)
        )
    ]
    ev = spark.createDataFrame(rows, "user_id long, x double, y double")
    got = {r["user_id"]: r for r in radius_of_gyration(ev).collect()}

    by_user: dict[int, list[tuple[float, float]]] = {}
    for u, x, y in rows:
        by_user.setdefault(u, []).append((x, y))
    for u, pts in by_user.items():
        xq = np.floor(np.array([p[0] for p in pts]) * 1e6).astype(np.int64)
        yq = np.floor(np.array([p[1] for p in pts]) * 1e6).astype(np.int64)
        cx, cy = xq.sum() / len(xq), yq.sum() / len(yq)
        dev = np.floor(((xq - cx) ** 2 + (yq - cy) ** 2) / 1e6).astype(np.int64)
        want = math.sqrt(dev.sum() / len(dev))
        assert got[u]["n_events"] == len(pts)
        assert got[u]["rg_milli"] == pytest.approx(want, rel=1e-12)


def test_radius_of_gyration_stationary_user_is_zero(spark):
    ev = spark.createDataFrame([(7, 2.25, -3.5)] * 4, "user_id long, x double, y double")
    r = radius_of_gyration(ev).collect()[0]
    assert (r["n_events"], r["rg_milli"]) == (4, 0.0)


def test_colocation_multiplicity_collapses(spark):
    day = 86_400_000_000
    rows = [
        # users 1,2 share slot (day0, cell(0,0)) — user 1 pings 3×, still 1 slot
        (1, 100, 0.5, 0.5),
        (1, 200, 0.6, 0.5),
        (1, 300, 0.7, 0.5),
        (2, 400, 0.5, 0.6),
        # users 1,2 also share (day1, cell(0,0)) → second slot
        (1, day + 1, 0.5, 0.5),
        (2, day + 2, 0.5, 0.5),
        # user 3 same cell but day2 → no pair
        (3, 2 * day + 1, 0.5, 0.5),
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long, x double, y double")
    got = {
        (r["user_a"], r["user_b"]): r["n_slots"]
        for r in colocation_pairs(ev, 1.0, day).collect()
    }
    assert got == {(1, 2): 2}


def test_cell_daily_anomaly_observed_baseline(spark):
    from parallelcovertree_spark.operators.hotspot import cell_daily_anomaly

    day = 86_400_000_000
    # cell A: counts 2,2,8 over 3 observed days → burst day z > 0
    rows = (
        [(0 * day + i, 0.5, 0.5) for i in range(2)]
        + [(1 * day + i, 0.5, 0.5) for i in range(2)]
        + [(2 * day + i, 0.5, 0.5) for i in range(8)]
        # cell B: constant counts → degenerate variance → filtered out
        + [(d * day + i, 5.5, 5.5) for d in range(3) for i in range(4)]
        # cell C: only 2 observed days → below min_buckets
        + [(d * day + 1, 8.5, 8.5) for d in range(2)]
    )
    ev = spark.createDataFrame(rows, "us long, x double, y double")
    out = cell_daily_anomaly(ev, 1.0, day).collect()
    cells = {r["cell_id"] for r in out}
    assert cells == {_cell(0, 0)}  # B degenerate, C too short
    by_day = {r["bucket"]: r for r in out}
    mu = 4.0
    var = (4 + 4 + 64) / 3 - 16.0
    assert by_day[2]["n"] == 8
    assert by_day[2]["anomaly_z"] == pytest.approx((8 - mu) / math.sqrt(var), rel=1e-12)
    assert by_day[0]["anomaly_z"] < 0 and by_day[1]["anomaly_z"] < 0
    assert all(r["n_buckets"] == 3 and r["mean_n"] == mu for r in out)


def test_stay_points_hand_computed(spark):
    from parallelcovertree_spark.operators.trajectory import stay_points

    # user 1: stay A (3 pts within r=1), jump, stay B (2 pts), jump, lone pt
    rows = [
        (1, 1000, 10, 0.0, 0.0),
        (1, 2000, 11, 0.5, 0.0),
        (1, 3000, 12, 0.5, 0.4),
        (1, 4000, 13, 10.0, 10.0),   # jump → new segment
        (1, 5000, 14, 10.2, 10.0),
        (1, 6000, 15, -20.0, 5.0),   # jump → lone point, dropped (n<2)
        # user 2: single event only → no stays
        (2, 1000, 20, 3.0, 3.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long, event_id long, x double, y double")
    got = {(r.user_id, r.seg): r for r in stay_points(ev, 1.0, 2).collect()}
    assert set(got) == {(1, 0), (1, 1)}
    a, b = got[(1, 0)], got[(1, 1)]
    assert (a.n_events, a.start_us, a.end_us, a.dwell_us) == (3, 1000, 3000, 2000)
    assert a.cx_micro == pytest.approx((0 + 500000 + 500000) / 3)
    assert a.cy_micro == pytest.approx((0 + 0 + 400000) / 3)
    assert (b.n_events, b.dwell_us) == (2, 1000)


def test_stay_points_break_is_hop_not_diameter(spark):
    from parallelcovertree_spark.operators.trajectory import stay_points

    # drifting chain: every hop 0.9 (< r=1) but total span 3.6 — the
    # Li et al. hop criterion keeps ONE segment (documents the semantics)
    rows = [(1, i * 1000, i, 0.9 * i, 0.0) for i in range(5)]
    ev = spark.createDataFrame(rows, "user_id long, us long, event_id long, x double, y double")
    out = stay_points(ev, 1.0, 2).collect()
    assert len(out) == 1 and out[0].n_events == 5


def test_colocation_hot_slot_cap_excludes_stadium(spark):
    day = 86_400_000_000
    # stadium slot: users 1..6 all in (day0, cell(0,0)); quiet slot: 1,2 in day1
    rows = [(u, 100 + u, 0.5, 0.5) for u in range(1, 7)] + [
        (1, day + 1, 0.5, 0.5),
        (2, day + 2, 0.5, 0.5),
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long, x double, y double")
    uncapped = {
        (r.user_a, r.user_b): r.n_slots
        for r in colocation_pairs(ev, 1.0, day).collect()
    }
    assert uncapped[(1, 2)] == 2 and len(uncapped) == 15  # C(6,2)
    capped = {
        (r.user_a, r.user_b): r.n_slots
        for r in colocation_pairs(ev, 1.0, day, max_slot_users=4).collect()
    }
    # stadium slot dropped entirely; the quiet slot survives
    assert capped == {(1, 2): 1}


def test_colocation_default_is_capped(spark):
    """r4 verdict #6: the production DEFAULT must carry the stadium guard —
    a slot with more than 64 users is excluded without asking."""
    day = 86_400_000_000
    rows = [(u, 100 + u, 0.5, 0.5) for u in range(1, 70)] + [
        (1, day + 1, 0.5, 0.5),
        (2, day + 2, 0.5, 0.5),
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long, x double, y double")
    got = {
        (r.user_a, r.user_b): r.n_slots
        for r in colocation_pairs(ev, 1.0, day).collect()  # default cap=64
    }
    assert got == {(1, 2): 1}  # 69-user slot dropped; quiet slot kept
    full = colocation_pairs(ev, 1.0, day, max_slot_users=None).count()
    assert full == 69 * 68 // 2  # uncapped parity variant sees it all
