"""Closed-form + numpy-twin pins for the spatial statistics operators
(Moran's I, Ripley's K, coverage gaps) — the semantics the DuckDB gate
can't isolate: sign behavior on designed patterns, brute-force pair
parity, hole detection at extent edges, exact partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from parallelcovertree_spark.functions.cells import _OFF, _SHIFT
from parallelcovertree_spark.operators.spatialstats import (
    coverage_gaps,
    morans_i,
    ripley_k,
)


def _cell(ix: int, iy: int) -> int:
    return (ix + _OFF) * _SHIFT + (iy + _OFF)


def _grid_points(counts: dict[tuple[int, int], int]) -> list[tuple[float, float]]:
    """One point at the center of cell (ix, iy), repeated count times (res=1)."""
    return [
        (float(ix) + 0.5, float(iy) + 0.5)
        for (ix, iy), n in counts.items()
        for _ in range(n)
    ]


def _moran_numpy(counts: dict[tuple[int, int], int]) -> float:
    """Textbook Moran's I over occupied cells, queen 1-ring weights."""
    xs = np.array(list(counts.values()), dtype=float)
    xbar = xs.mean()
    w = 0
    num = 0.0
    for (ix, iy), n in counts.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nb = counts.get((ix + dx, iy + dy))
                if nb is not None:
                    w += 1
                    num += (n - xbar) * (nb - xbar)
    den = float(((xs - xbar) ** 2).sum())
    return (len(xs) / w) * (num / den)


# --- Moran's I -----------------------------------------------------------


def test_moran_matches_numpy_textbook_form(spark):
    rng = np.random.default_rng(11)
    counts = {
        (int(ix), int(iy)): int(n)
        for ix, iy, n in zip(
            rng.integers(-3, 4, 25), rng.integers(-3, 4, 25), rng.integers(1, 9, 25)
        )
    }
    pts = spark.createDataFrame(_grid_points(counts), "x double, y double")
    r = morans_i(pts, 1.0).collect()[0]
    assert r["n_cells"] == len(counts)
    assert r["moran_i"] == pytest.approx(_moran_numpy(counts), rel=1e-12)
    assert r["expected_i"] == pytest.approx(-1.0 / (len(counts) - 1), rel=1e-12)


def test_moran_sign_on_designed_patterns(spark):
    # checkerboard 1/9 alternating → strong NEGATIVE autocorrelation
    checker = {
        (ix, iy): (1 if (ix + iy) % 2 == 0 else 9)
        for ix in range(6)
        for iy in range(6)
    }
    # two homogeneous halves (left all 9, right all 1) → POSITIVE
    halves = {
        (ix, iy): (9 if ix < 3 else 1) for ix in range(6) for iy in range(6)
    }
    neg = morans_i(
        spark.createDataFrame(_grid_points(checker), "x double, y double"), 1.0
    ).collect()[0]
    pos = morans_i(
        spark.createDataFrame(_grid_points(halves), "x double, y double"), 1.0
    ).collect()[0]
    assert neg["moran_i"] < neg["expected_i"] < pos["moran_i"]
    assert neg["moran_i"] == pytest.approx(_moran_numpy(checker), rel=1e-12)
    assert pos["moran_i"] == pytest.approx(_moran_numpy(halves), rel=1e-12)


def test_moran_partition_invariance_exact(spark):
    rng = np.random.default_rng(3)
    rows = [
        (float(a), float(b))
        for a, b in zip(rng.uniform(-5, 5, 400), rng.uniform(-5, 5, 400))
    ]
    r1 = morans_i(
        spark.createDataFrame(rows, "x double, y double").coalesce(1), 2.0
    ).collect()[0]
    r8 = morans_i(
        spark.createDataFrame(rows, "x double, y double").repartition(8), 2.0
    ).collect()[0]
    assert tuple(r1) == tuple(r8)  # exact — integer aggs + fixed-tree doubles


# --- Ripley's K ----------------------------------------------------------


def _pair_counts(xy: np.ndarray, radii: list[float]) -> list[int]:
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return [int((d2 <= r * r).sum()) for r in radii]


def test_ripley_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    xy = rng.uniform(0.0, 8.0, (300, 2))
    radii = [0.25, 0.5, 1.0, 2.0]
    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(xy)],
        "id long, x double, y double",
    )
    rows = {r["r"]: r for r in ripley_k(pts, radii, id_col="id").collect()}
    want = _pair_counts(xy, radii)
    area = (xy[:, 0].max() - xy[:, 0].min()) * (xy[:, 1].max() - xy[:, 1].min())
    n = len(xy)
    for r, w in zip(radii, want):
        row = rows[r]
        assert row["n_pairs"] == w
        assert row["k_est"] == pytest.approx(area * w / (n * (n - 1)), rel=1e-12)
        assert row["l_est"] == pytest.approx(
            np.sqrt(row["k_est"] / np.pi), rel=1e-12
        )
    # K must be monotone in r
    ks = [rows[r]["k_est"] for r in radii]
    assert ks == sorted(ks)


def test_ripley_clustered_vs_regular(spark):
    # clustered: 20 tight clumps of 10 → l_est >> r at small r.
    # regular lattice (spacing 1) → l_est < r for r just under the spacing.
    rng = np.random.default_rng(9)
    centers = rng.uniform(0, 20, (20, 2))
    clumped = (centers[:, None, :] + rng.normal(0, 0.02, (20, 10, 2))).reshape(-1, 2)
    lattice = np.array([(i, j) for i in range(14) for j in range(14)], float)

    def l_at(xy, r):
        pts = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(xy)],
            "id long, x double, y double",
        )
        return ripley_k(pts, [r], id_col="id").collect()[0]["l_est"]

    assert l_at(clumped, 0.5) > 0.5 * 2  # strong clustering
    assert l_at(lattice, 0.9) < 0.9  # dispersed below lattice spacing


# --- coverage gaps -------------------------------------------------------


def test_coverage_gap_interior_hole(spark):
    # 3×3 block with the center missing: one gap, ring_n = 8 cells × 2 docs
    counts = {
        (ix, iy): 2 for ix in range(4, 7) for iy in range(4, 7) if (ix, iy) != (5, 5)
    }
    pts = spark.createDataFrame(_grid_points(counts), "x double, y double")
    rows = coverage_gaps(pts, 1.0).collect()
    assert len(rows) == 1
    assert rows[0]["cell_id"] == _cell(5, 5)
    assert rows[0]["ring_n"] == 16


def test_coverage_gap_isolated_hole_ring_zero(spark):
    # occupied (0,0) and (0,4): extent is a 1×5 strip; the middle gap (0,2)
    # touches no occupied cell → ring_n = 0; edge gaps see their neighbor
    pts = spark.createDataFrame(
        [(0.5, 0.5), (0.5, 0.5), (0.5, 4.5)], "x double, y double"
    )
    rows = {r["cell_id"]: r["ring_n"] for r in coverage_gaps(pts, 1.0).collect()}
    assert set(rows) == {_cell(0, 1), _cell(0, 2), _cell(0, 3)}
    assert rows[_cell(0, 1)] == 2  # ring covers (0,0) with 2 docs
    assert rows[_cell(0, 2)] == 0  # isolated interior hole
    assert rows[_cell(0, 3)] == 1  # ring covers (0,4) with 1 doc


def test_coverage_no_gaps_when_dense(spark):
    counts = {(ix, iy): 1 for ix in range(3) for iy in range(3)}
    pts = spark.createDataFrame(_grid_points(counts), "x double, y double")
    assert coverage_gaps(pts, 1.0).count() == 0


# --- IDW interpolation ----------------------------------------------------


def _idw_py(qxy, cid_xy_v, k):
    """Python twin: exact top-k by (d2, id), integer micro-unit weights."""
    out = {}
    for qid, qx, qy in qxy:
        cands = sorted(
            ((cx - qx) ** 2 + (cy - qy) ** 2, cid, v)
            for cid, cx, cy, v in cid_xy_v
            if cid != qid
        )[:k]
        ws = [(int(np.floor(1e9 / (d2 + 1e-3))), v) for d2, _, v in cands]
        sw = sum(w for w, _ in ws)
        swv = sum(w * v for w, v in ws)
        out[qid] = (len(ws), sw, swv, swv / sw)
    return out


def test_idw_hand_computed(spark):
    from parallelcovertree_spark.operators.spatialstats import idw_interpolate

    # query 100 at origin; corpus values 10 at d²=1, 40 at d²=4
    corpus = [(1, 1.0, 0.0, 10), (2, 0.0, 2.0, 40)]
    q = spark.createDataFrame([(100, 0.0, 0.0)], "id long, x double, y double")
    c = spark.createDataFrame(corpus, "id long, x double, y double, v long")
    r = idw_interpolate(q, c, k=2).collect()[0]
    w1 = int(np.floor(1e9 / (1.0 + 1e-3)))
    w2 = int(np.floor(1e9 / (4.0 + 1e-3)))
    assert (r["query_id"], r["n_nbrs"]) == (100, 2)
    assert r["sum_w"] == w1 + w2
    assert r["sum_wv"] == w1 * 10 + w2 * 40
    assert r["idw_value"] == pytest.approx((w1 * 10 + w2 * 40) / (w1 + w2), rel=1e-12)


def test_idw_leave_one_out_and_twin(spark):
    from parallelcovertree_spark.operators.spatialstats import idw_interpolate

    rng = np.random.default_rng(17)
    xy = rng.uniform(0, 6, (80, 2))
    vals = rng.integers(1, 1000, 80)
    corpus = [
        (i, float(a), float(b), int(v)) for i, ((a, b), v) in enumerate(zip(xy, vals))
    ]
    # queries drawn FROM the corpus → leave-one-out must exclude same id
    queries = [(i, x, y) for i, x, y, _ in corpus[:15]]
    q = spark.createDataFrame(queries, "id long, x double, y double")
    c = spark.createDataFrame(corpus, "id long, x double, y double, v long")
    got = {
        r["query_id"]: (r["n_nbrs"], r["sum_w"], r["sum_wv"], r["idw_value"])
        for r in idw_interpolate(q, c, k=5).collect()
    }
    want = _idw_py(queries, corpus, k=5)
    for qid, (n, sw, swv, val) in want.items():
        gn, gsw, gswv, gval = got[qid]
        assert (gn, gsw, gswv) == (n, sw, swv)
        assert gval == pytest.approx(val, rel=1e-12)


# --- KDE -----------------------------------------------------------------


def _kde_py(xy, res):
    """Python twin: 1-ring targets, floor-quantized Epanechnikov."""
    out = {}
    n = len(xy)
    for px, py in xy:
        ix, iy = int(np.floor(px / res)), int(np.floor(py / res))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tix, tiy = ix + dx, iy + dy
                cx, cy = (tix + 0.5) * res, (tiy + 0.5) * res
                u2 = ((px - cx) ** 2 + (py - cy) ** 2) / (res * res)
                if u2 < 1.0:
                    c = int(np.floor((1.0 - u2) * 750000.0))
                    k, s = out.get((tix, tiy), (0, 0))
                    out[(tix, tiy)] = (k + 1, s + c)
    return {
        (tix, tiy): (k, s, s / (n * res * res * 1e6))
        for (tix, tiy), (k, s) in out.items()
    }


def test_kde_matches_python_twin(spark):
    from parallelcovertree_spark.operators.spatialstats import kde_cells

    rng = np.random.default_rng(21)
    xy = rng.uniform(-3, 3, (200, 2))
    pts = spark.createDataFrame(
        [(float(a), float(b)) for a, b in xy], "x double, y double"
    )
    got = {
        r["cell_id"]: (r["n_contrib"], r["kde_micro"], r["density"])
        for r in kde_cells(pts, 1.0).collect()
    }
    want = _kde_py(xy, 1.0)
    assert set(got) == {_cell(tix, tiy) for tix, tiy in want}
    for (tix, tiy), (k, s, d) in want.items():
        gk, gs, gd = got[_cell(tix, tiy)]
        assert (gk, gs) == (k, s)
        assert gd == pytest.approx(d, rel=1e-12)


def test_kde_peak_at_point_mass(spark):
    from parallelcovertree_spark.operators.spatialstats import kde_cells

    # 50 points at one cell center → that cell's density is the max and
    # each point contributes the full kernel (u=0 → 750000)
    rows = [(5.5, 5.5)] * 50 + [(20.5, 20.5)]
    pts = spark.createDataFrame(rows, "x double, y double")
    out = {r["cell_id"]: r for r in kde_cells(pts, 1.0).collect()}
    peak = out[_cell(5, 5)]
    assert peak["n_contrib"] == 50
    assert peak["kde_micro"] == 50 * 750000
    assert peak["density"] == max(r["density"] for r in out.values())


# --- cross-K --------------------------------------------------------------


def test_cross_k_matches_brute_force(spark):
    from parallelcovertree_spark.operators.spatialstats import cross_k

    rng = np.random.default_rng(23)
    axy = rng.uniform(0, 6, (60, 2))
    bxy = rng.uniform(0, 6, (40, 2))
    radii = [0.5, 1.0, 2.0]
    a = spark.createDataFrame(
        [(i, float(p), float(q)) for i, (p, q) in enumerate(axy)],
        "id long, x double, y double",
    )
    b = spark.createDataFrame(
        [(1000 + i, float(p), float(q)) for i, (p, q) in enumerate(bxy)],
        "id long, x double, y double",
    )
    rows = {r["r"]: r for r in cross_k(a, b, radii).collect()}
    d2 = ((axy[:, None, :] - bxy[None, :, :]) ** 2).sum(-1)
    allxy = np.vstack([axy, bxy])
    area = (allxy[:, 0].max() - allxy[:, 0].min()) * (
        allxy[:, 1].max() - allxy[:, 1].min()
    )
    for r in radii:
        w = int((d2 <= r * r).sum())
        assert rows[r]["n_pairs"] == w
        assert rows[r]["k_est"] == pytest.approx(
            area * w / (len(axy) * len(bxy)), rel=1e-12
        )


def test_cross_k_colocated_exceeds_segregated(spark):
    from parallelcovertree_spark.operators.spatialstats import cross_k

    # co-located: B points on top of A points; segregated: B far from A
    rng = np.random.default_rng(29)
    axy = rng.uniform(0, 10, (50, 2))
    near = axy[:30] + rng.normal(0, 0.05, (30, 2))
    far = rng.uniform(20, 30, (30, 2))

    def k_at(bxy, r):
        a = spark.createDataFrame(
            [(i, float(p), float(q)) for i, (p, q) in enumerate(axy)],
            "id long, x double, y double",
        )
        b = spark.createDataFrame(
            [(500 + i, float(p), float(q)) for i, (p, q) in enumerate(bxy)],
            "id long, x double, y double",
        )
        return cross_k(a, b, [r]).collect()[0]["n_pairs"]

    assert k_at(near, 0.5) > 0
    assert k_at(far, 0.5) == 0  # segregated: zero cross pairs, k_est 0


def test_idw_all_neighbors_out_of_range_yields_null(spark):
    """ADVICE r4: when every neighbor is so far that its integer weight
    floors to 0, sum_w == 0 must yield idw_value NULL — never 0/0 = NaN."""
    from parallelcovertree_spark.operators.spatialstats import idw_interpolate

    q = spark.createDataFrame([(0, 0.0, 0.0)], "id long, x double, y double")
    # one corpus point ~1e5 units away → d² = 2e10 > 1e9 scale → w = 0
    c = spark.createDataFrame(
        [(1, 1.0e5, 1.0e5, 42)], "id long, x double, y double, v long"
    )
    r = idw_interpolate(q, c, k=2).collect()[0]
    assert (r["n_nbrs"], r["sum_w"]) == (1, 0)
    assert r["idw_value"] is None
