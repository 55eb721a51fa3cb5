"""Spatial point-pattern statistics over the tile grid.

Three classic spatial-analytics operators a geospatial engine runs after
tiling (BASELINE.json north_rule — H3/S2 analytics over geotagged pages),
complementing the local Gi* hotspot detector (operators/hotspot.py):

- :func:`morans_i` — GLOBAL spatial autocorrelation (Moran 1950) of the
  per-tile document counts under 1-ring queen adjacency: one number saying
  whether occupied tiles with many documents neighbor other heavy tiles
  (I > E[I]) or interleave with light ones (I < E[I]).
- :func:`ripley_k` — Ripley's K / Besag's L point-pattern statistic at a
  radius ladder: multi-scale clustered/dispersed diagnosis, the multi-r
  generalization of the Clark-Evans ratio (hotspot.py::nn_distance_stats).
- :func:`coverage_gaps` — empty tiles inside the data's bounding extent,
  each annotated with the document mass on its 1-ring: the spatial analog
  of time-series gap filling (registry events_minute_gapfill) and the
  "where is the corpus blind" audit of a geo-sharded crawl.

Scale shape: every operator's only point-volume stage is either the
per-cell count shuffle (Moran, gaps) or the certified grid ε-join (Ripley
— never all-pairs); all later work is histogram-/pair-sized. The dense
gap grid is bounded by extent-area / res², a tile-space quantity
independent of document count.

Cross-engine parity: counts and pair sums are exact BIGINTs; every double
is a fixed IEEE expression tree over those integers (divisions +
correctly-rounded sqrt), mirrored token-for-token in the DuckDB oracles.

Reference parity note: the reference has no spatial statistics; the pair
enumeration reuses the ε-join whose semantics match
/root/reference/programs/epsilon_graph.cpp, and the ring enumeration is
the same k-ring the ε-join prunes with (functions/cells.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.cells import (
    _OFF,
    _SHIFT,
    cell_id_from_ix,
    cell_ix,
    k_ring_offsets,
)

__all__ = [
    "morans_i",
    "morans_i_oracle_sql",
    "ripley_k",
    "ripley_k_oracle_sql",
    "coverage_gaps",
    "coverage_gaps_oracle_sql",
    "idw_interpolate",
    "kde_cells",
    "kde_cells_oracle_sql",
    "cross_k",
    "cross_k_oracle_sql",
]


def _hist(pts: DataFrame, res: float, x: str, y: str) -> DataFrame:
    """Per-occupied-cell BIGINT counts — the one point-volume shuffle."""
    return pts.groupBy(
        cell_ix(x, res).alias("ix"), cell_ix(y, res).alias("iy")
    ).agg(F.count(F.lit(1)).alias("n"))


def _ring_contrib(hist: DataFrame, include_self: bool) -> DataFrame:
    """Donor explode: each occupied cell donates its count to its 1-ring
    targets (histogram-sized, pure Catalyst — no shuffle until the caller
    re-aggregates on the target key)."""
    offs = [
        (dx, dy)
        for dx, dy in k_ring_offsets(1)
        if include_self or (dx, dy) != (0, 0)
    ]
    arr = F.array(
        *[
            F.struct(
                (F.col("ix") + F.lit(dx)).alias("tix"),
                (F.col("iy") + F.lit(dy)).alias("tiy"),
            )
            for dx, dy in offs
        ]
    )
    return hist.select(F.explode(arr).alias("t"), F.col("n").alias("n_src")).select(
        "t.tix", "t.tiy", "n_src"
    )


# --- Moran's I ---------------------------------------------------------------


def morans_i(pts: DataFrame, res: float, x: str = "x", y: str = "y") -> DataFrame:
    """Global Moran's I of per-tile counts under 1-ring queen adjacency
    (unit weights over OCCUPIED neighbor cells — empty tiles carry no
    signal, consistent with the Gi* treatment in hotspot.py).

    One row: (n_cells, w_pairs, sn, snn, s1p, s2p, moran_i, expected_i).

    The textbook form I = (N/W)·Σw_ij(x_i−x̄)(x_j−x̄)/Σ(x_i−x̄)² is
    rewritten algebraically over exact integer aggregates so both engines
    evaluate the same fixed tree: Σ_pairs x_i·x_j (s1p), Σ_pairs (x_i+x_j)
    (s2p), directed pair count W, and the global Σx, Σx², N moments —
    numerator = s1p − x̄·s2p + x̄²·W, denominator = Σx² − N·x̄².

    Plan: point-volume cell count, then histogram-sized work only — donor
    explode (8 offsets) re-joined onto the histogram for the pair
    aggregates, two single-row aggregates cross-joined (broadcast by
    construction). The histogram feeds three consumers, so it is pinned
    with localCheckpoint (same discipline as cell_hotspots).
    """
    hist = _hist(pts, res, x, y).localCheckpoint(eager=False)
    contrib = _ring_contrib(hist, include_self=False)
    nbr = hist.select(
        F.col("ix").alias("tix"), F.col("iy").alias("tiy"), F.col("n").alias("n_dst")
    )
    pagg = (
        contrib.join(nbr, ["tix", "tiy"], "inner")
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(F.col("n_src") * F.col("n_dst")).alias("s1p"),
            F.sum(F.col("n_src") + F.col("n_dst")).alias("s2p"),
        )
    )
    moments = hist.agg(
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
        F.count(F.lit(1)).alias("cc"),
    )
    row = moments.crossJoin(F.broadcast(pagg))
    snD = F.col("sn").cast("double")
    snnD = F.col("snn").cast("double")
    ccD = F.col("cc").cast("double")
    wD = F.col("w").cast("double")
    s1pD = F.col("s1p").cast("double")
    s2pD = F.col("s2p").cast("double")
    xbar = snD / ccD
    num = s1pD - xbar * s2pD + xbar * xbar * wD
    den = snnD - ccD * (xbar * xbar)
    return row.select(
        F.col("cc").alias("n_cells"),
        F.col("w").alias("w_pairs"),
        "sn",
        "snn",
        "s1p",
        "s2p",
        ((ccD / wD) * (num / den)).alias("moran_i"),
        (F.lit(-1.0) / (ccD - F.lit(1.0))).alias("expected_i"),
    )


def morans_i_oracle_sql(pts_cte_body: str, res: float) -> str:
    """DuckDB twin of :func:`morans_i` — identical integer aggregates and
    token-for-token the same double expression tree."""
    xbar = "(CAST(g.sn AS DOUBLE) / CAST(g.cc AS DOUBLE))"
    num = (
        f"CAST(p.s1p AS DOUBLE) - {xbar} * CAST(p.s2p AS DOUBLE) "
        f"+ {xbar} * {xbar} * CAST(p.w AS DOUBLE)"
    )
    den = f"CAST(g.snn AS DOUBLE) - CAST(g.cc AS DOUBLE) * ({xbar} * {xbar})"
    return f"""WITH pts AS ({pts_cte_body}),
h AS (
  SELECT CAST(FLOOR(x / {res!r}) AS BIGINT) AS ix,
         CAST(FLOOR(y / {res!r}) AS BIGINT) AS iy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
contrib AS (
  SELECT h.ix + dx.d AS tix, h.iy + dy.d AS tiy, h.n AS n_src
  FROM h,
       (SELECT unnest(range(-1, 2)) AS d) dx,
       (SELECT unnest(range(-1, 2)) AS d) dy
  WHERE NOT (dx.d = 0 AND dy.d = 0)
),
p AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS w,
         CAST(SUM(c.n_src * h2.n) AS BIGINT) AS s1p,
         CAST(SUM(c.n_src + h2.n) AS BIGINT) AS s2p
  FROM contrib c JOIN h h2 ON c.tix = h2.ix AND c.tiy = h2.iy
),
g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS sn,
         CAST(SUM(n * n) AS BIGINT) AS snn,
         CAST(COUNT(*) AS BIGINT) AS cc
  FROM h
)
SELECT g.cc AS n_cells, p.w AS w_pairs, g.sn AS sn, g.snn AS snn,
       p.s1p AS s1p, p.s2p AS s2p,
       (CAST(g.cc AS DOUBLE) / CAST(p.w AS DOUBLE)) * (({num}) / ({den})) AS moran_i,
       -1.0 / (CAST(g.cc AS DOUBLE) - 1.0) AS expected_i
FROM g, p"""


# --- Ripley's K --------------------------------------------------------------

_PI = math.pi  # repr() round-trips to the identical double in both engines


def ripley_k(
    pts: DataFrame,
    radii: list[float],
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Ripley's K̂ and Besag's L̂ at each radius in ``radii`` (ascending).

    One row per radius: (r, n_pairs, k_est, l_est) with
    ``n_pairs`` the DIRECTED pair count Σ_{i≠j} 1[d_ij ≤ r] (exact BIGINT),
    ``k_est = A·n_pairs / (n·(n−1))`` with A the bounding-box area
    (no edge correction — the uncorrected estimator; documented bias at the
    boundary, identical in both engines), and ``l_est = sqrt(k_est/π)``
    (≈ r for a Poisson process; > r clustered, < r dispersed).

    Plan: ONE grid ε-join at max(radii) (the certified 1-shuffle plan,
    never all-pairs), then a single conditional-sum aggregate bins every
    pair into the whole ladder at once — the radius ladder costs one pass,
    not |radii| joins. Extent and count are a broadcast scalar row.
    """
    from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join

    radii = sorted(float(r) for r in radii)
    rmax = radii[-1]
    pairs = epsilon_self_join(
        pts, rmax, id_col=id_col, x=x, y=y, include_self=False, emit_dist2=True
    )
    # coalesce: zero pairs at rmax leaves the aggregate input empty — the
    # ladder must report 0, not NULL
    counts = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("dist2") <= F.lit(r * r), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"p{i}")
            for i, r in enumerate(radii)
        ]
    )
    xD = F.col(x).cast("double")
    yD = F.col(y).cast("double")
    meta = pts.agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min(xD).alias("minx"),
        F.max(xD).alias("maxx"),
        F.min(yD).alias("miny"),
        F.max(yD).alias("maxy"),
    )
    # ONE row feeds |radii| union branches — pin it, or Catalyst re-runs
    # the ε-join aggregate and the extent scan once per radius (measured
    # 4× at 1M points before this checkpoint)
    row = meta.crossJoin(F.broadcast(counts)).localCheckpoint(eager=False)
    nD = F.col("n_pts").cast("double")
    area = (F.col("maxx") - F.col("minx")) * (F.col("maxy") - F.col("miny"))
    out = None
    for i, r in enumerate(radii):
        pD = F.col(f"p{i}").cast("double")
        k_est = (area / (nD * (nD - F.lit(1.0)))) * pD
        one = row.select(
            F.lit(float(r)).alias("r"),
            F.col(f"p{i}").alias("n_pairs"),
            k_est.alias("k_est"),
            F.sqrt(k_est / F.lit(_PI)).alias("l_est"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def ripley_k_oracle_sql(pts_cte_body: str, radii: list[float]) -> str:
    """DuckDB twin of :func:`ripley_k` — by-definition quadratic pair
    enumeration (gate scale only), identical conditional bins and the same
    k/l expression trees."""
    radii = sorted(float(r) for r in radii)
    rmax = radii[-1]
    bins = ",\n         ".join(
        f"CAST(COALESCE(SUM(CASE WHEN d2 <= {r * r!r} THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT) AS p{i}"
        for i, r in enumerate(radii)
    )
    k_of = lambda i: (  # noqa: E731 - local SQL template
        f"(((maxx - minx) * (maxy - miny)) "
        f"/ (CAST(n_pts AS DOUBLE) * (CAST(n_pts AS DOUBLE) - 1.0))) "
        f"* CAST(p{i} AS DOUBLE)"
    )
    sel = "\nUNION ALL\n".join(
        f"SELECT {r!r} AS r, p{i} AS n_pairs, {k_of(i)} AS k_est, "
        f"SQRT(({k_of(i)}) / {_PI!r}) AS l_est FROM m, c"
        for i, r in enumerate(radii)
    )
    return f"""WITH pts AS ({pts_cte_body}),
d AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a, pts b
  WHERE a.id <> b.id
    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {rmax * rmax!r}
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pts,
         MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
  FROM pts
),
c AS (
  SELECT {bins}
  FROM d
)
{sel}"""


# --- kernel density estimation ----------------------------------------------

# Epanechnikov contributions are floor-quantized at 0.75e6 so per-cell sums
# are exact BIGINTs (associative, partition/engine-independent); the density
# normalization is one IEEE division at the end.
_KDE_SCALE = 750000.0


def kde_cells(pts: DataFrame, res: float, x: str = "x", y: str = "y") -> DataFrame:
    """Epanechnikov kernel density estimate sampled at tile centers with
    bandwidth h = ``res`` — the heatmap-rendering operator behind every
    density tile layer.

    One row per cell center receiving ≥1 in-bandwidth point:
    (cell_id, n_contrib, kde_micro, density) with
    ``kde_micro = Σ floor(0.75·(1−d²/h²)·10⁶)`` over points with d < h and
    ``density = kde_micro / (n·h²·10⁶)`` (the standard 1/(n·h²)
    normalization, u-scaled).

    With h = res every center within bandwidth of a point lies in the
    point's 1-ring (centers two cells away are ≥ 1.5·res > h), so the plan
    is a 9× map-side explode + ONE cell-keyed shuffle of quantized
    contributions — contribution-bounded, never a radius join against a
    dense center grid.
    """
    r = float(res)
    ix, iy = cell_ix(x, r), cell_ix(y, r)
    offs = F.array(
        *[
            F.struct(
                (ix + F.lit(dx)).alias("tix"), (iy + F.lit(dy)).alias("tiy")
            )
            for dx, dy in k_ring_offsets(1)
        ]
    )
    t = pts.select(
        F.explode(offs).alias("t"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
    ).select("t.tix", "t.tiy", "px", "py")
    cxx = (F.col("tix").cast("double") + F.lit(0.5)) * F.lit(r)
    cyy = (F.col("tiy").cast("double") + F.lit(0.5)) * F.lit(r)
    dxe = F.col("px") - cxx
    dye = F.col("py") - cyy
    u2 = (dxe * dxe + dye * dye) / F.lit(r * r)
    contrib = F.floor((F.lit(1.0) - u2) * F.lit(_KDE_SCALE)).cast("long")
    inb = t.where(u2 < F.lit(1.0)).select(
        "tix", "tiy", contrib.alias("c")
    )
    agg = inb.groupBy("tix", "tiy").agg(
        F.count(F.lit(1)).alias("n_contrib"), F.sum("c").alias("kde_micro")
    )
    n = pts.agg(F.count(F.lit(1)).alias("n_pts"))
    return agg.crossJoin(F.broadcast(n)).select(
        cell_id_from_ix(F.col("tix"), F.col("tiy")).alias("cell_id"),
        "n_contrib",
        "kde_micro",
        (
            F.col("kde_micro").cast("double")
            / (F.col("n_pts").cast("double") * F.lit(r * r * 1000000.0))
        ).alias("density"),
    )


def kde_cells_oracle_sql(pts_cte_body: str, res: float) -> str:
    """DuckDB twin of :func:`kde_cells` — identical ring offsets, the same
    u², floor-quantized contribution, and normalization expression trees."""
    r = float(res)
    cxx = f"(CAST(tix AS DOUBLE) + 0.5) * {r!r}"
    cyy = f"(CAST(tiy AS DOUBLE) + 0.5) * {r!r}"
    u2 = f"((px - {cxx}) * (px - {cxx}) + (py - {cyy}) * (py - {cyy})) / {r * r!r}"
    return f"""WITH pts AS ({pts_cte_body}),
t AS (
  SELECT CAST(FLOOR(x / {r!r}) AS BIGINT) + dx.d AS tix,
         CAST(FLOOR(y / {r!r}) AS BIGINT) + dy.d AS tiy,
         x AS px, y AS py
  FROM pts,
       (SELECT unnest(range(-1, 2)) AS d) dx,
       (SELECT unnest(range(-1, 2)) AS d) dy
),
inb AS (
  SELECT tix, tiy,
         CAST(FLOOR((1.0 - {u2}) * {_KDE_SCALE!r}) AS BIGINT) AS c
  FROM t WHERE {u2} < 1.0
),
agg AS (
  SELECT tix, tiy, CAST(COUNT(*) AS BIGINT) AS n_contrib,
         CAST(SUM(c) AS BIGINT) AS kde_micro
  FROM inb GROUP BY 1, 2
),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pts FROM pts)
SELECT (tix + {_OFF}) * {_SHIFT} + (tiy + {_OFF}) AS cell_id,
       n_contrib, kde_micro,
       CAST(kde_micro AS DOUBLE)
         / (CAST(n_pts AS DOUBLE) * {r * r * 1000000.0!r}) AS density
FROM agg, g"""


# --- bivariate (cross) Ripley K ----------------------------------------------


def cross_k(
    pts_a: DataFrame,
    pts_b: DataFrame,
    radii: list[float],
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Bivariate Ripley cross-K̂ between two point categories (co-location
    analysis: do A-documents cluster AROUND B-documents, e.g. languages,
    topics, POI classes?). One row per radius: (r, n_pairs, k_est) with
    ``n_pairs = Σ_{a∈A, b∈B} 1[d_ab ≤ r]`` and
    ``k_est = Area·n_pairs/(n_A·n_B)`` over the joint bounding box
    (uncorrected estimator, same discipline as :func:`ripley_k`).

    Plan: ONE two-table grid ε-join at max(radii) (ring explode on the
    smaller A side), conditional-sum binning of the whole ladder, joint
    extent from a union of the two coordinate sets (two scans of
    metadata-cheap columns; at 100 TB both aggregates pushdown to
    column-pruned parquet scans).
    """
    from parallelcovertree_spark.operators.epsilon_join import epsilon_join

    radii = sorted(float(r) for r in radii)
    rmax = radii[-1]
    pairs = epsilon_join(
        pts_a, pts_b, rmax, left_id=id_col, right_id=id_col, x=x, y=y,
        emit_dist2=True,
    )
    counts = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("dist2") <= F.lit(r * r), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"p{i}")
            for i, r in enumerate(radii)
        ]
    )
    xD, yD = F.col(x).cast("double"), F.col(y).cast("double")
    both = pts_a.select(xD.alias("cx"), yD.alias("cy")).unionAll(
        pts_b.select(xD.alias("cx"), yD.alias("cy"))
    )
    na = pts_a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = pts_b.agg(F.count(F.lit(1)).alias("n_b"))
    ext = both.agg(
        F.min("cx").alias("minx"),
        F.max("cx").alias("maxx"),
        F.min("cy").alias("miny"),
        F.max("cy").alias("maxy"),
    )
    # pinned for the same reason as ripley_k: one row, |radii| consumers
    row = (
        ext.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(counts))
        .localCheckpoint(eager=False)
    )
    area = (F.col("maxx") - F.col("minx")) * (F.col("maxy") - F.col("miny"))
    naD, nbD = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    out = None
    for i, r in enumerate(radii):
        pD = F.col(f"p{i}").cast("double")
        one = row.select(
            F.lit(float(r)).alias("r"),
            F.col(f"p{i}").alias("n_pairs"),
            ((area / (naD * nbD)) * pD).alias("k_est"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def cross_k_oracle_sql(
    pts_a_sql: str, pts_b_sql: str, radii: list[float]
) -> str:
    """DuckDB twin of :func:`cross_k` — quadratic A×B pair enumeration
    (gate scale), identical bins and expression trees."""
    radii = sorted(float(r) for r in radii)
    rmax = radii[-1]
    bins = ",\n         ".join(
        f"CAST(COALESCE(SUM(CASE WHEN d2 <= {r * r!r} THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT) AS p{i}"
        for i, r in enumerate(radii)
    )
    k_of = (
        "(((maxx - minx) * (maxy - miny)) "
        "/ (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) * CAST(p{i} AS DOUBLE)"
    )
    sel = "\nUNION ALL\n".join(
        f"SELECT {r!r} AS r, p{i} AS n_pairs, {k_of.format(i=i)} AS k_est "
        f"FROM m, na, nb, c"
        for i, r in enumerate(radii)
    )
    return f"""WITH a AS ({pts_a_sql}),
b AS ({pts_b_sql}),
d AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM a, b
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {rmax * rmax!r}
),
m AS (
  SELECT MIN(cx) AS minx, MAX(cx) AS maxx, MIN(cy) AS miny, MAX(cy) AS maxy
  FROM (SELECT x AS cx, y AS cy FROM a UNION ALL SELECT x AS cx, y AS cy FROM b)
),
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM a),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM b),
c AS (
  SELECT {bins}
  FROM d
)
{sel}"""


# --- inverse-distance-weighted interpolation ---------------------------------

# w = floor(1e9 / (d² + 1e-3)): the +1e-3 regularizer caps a coincident
# neighbor's weight at 10¹² (k·w·v stays far below 2⁶³ for BIGINT values
# ≤ ~10⁵), and floor-quantizing to BIGINT makes the weighted sums exact,
# associative, and engine-portable — the same micro-unit discipline as
# trajectory_stats / nn_distance_stats.
_IDW_SCALE = 1000000000.0
_IDW_REG = 0.001


def idw_interpolate(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    value_col: str = "v",
) -> DataFrame:
    """Inverse-distance-weighted interpolation of ``value_col`` at each
    query point from its k exact nearest corpus neighbors: the classic
    spatial estimator (Shepard 1968) — predict a field value where no
    measurement exists.

    One row per query: (query_id, n_nbrs, sum_w, sum_wv, idw_value) with
    integer weights w = floor(1e9/(d²+1e-3)) so sums are exact BIGINTs and
    ``idw_value`` one IEEE division.

    Weight range: the 1e9 scale resolves distances up to d² < 1e9 coordinate
    units² (w floors to 0 beyond ~31623 units; at d²=1, w≈1e9 — no overflow
    risk until ~9e9 neighbors/query). A neighbor past that range contributes
    zero weight but still counts in ``n_nbrs``; if ALL k neighbors are that
    far, ``sum_w`` is 0 and ``idw_value`` is NULL (guarded — never 0/0=NaN),
    signaling "no usable measurement in range" (ADVICE r4).

    Plan: the certified two-table block-kernel kNN (queries ship once into
    their grid block, never all-pairs), then two id-keyed hash joins
    re-attach coordinates and the measured value, and a query-keyed
    aggregate. A corpus row sharing a query's id is excluded (querying the
    corpus at one of its own points interpolates from the OTHER points —
    the leave-one-out form).
    """
    from parallelcovertree_spark.operators.knn import knn_join_block_kernel

    nn = knn_join_block_kernel(corpus, k=k, id_col=id_col, x=x, y=y, queries=queries)
    q = queries.select(
        F.col(id_col).alias("src"),
        F.col(x).cast("double").alias("qx"),
        F.col(y).cast("double").alias("qy"),
    )
    c = corpus.select(
        F.col(id_col).alias("dst"),
        F.col(x).cast("double").alias("cx"),
        F.col(y).cast("double").alias("cy"),
        F.col(value_col).cast("long").alias("v"),
    )
    j = nn.join(q, "src").join(c, "dst")
    dx = F.col("qx") - F.col("cx")
    dy = F.col("qy") - F.col("cy")
    d2 = dx * dx + dy * dy
    w = F.floor(F.lit(_IDW_SCALE) / (d2 + F.lit(_IDW_REG))).cast("long")
    agg = (
        j.select(F.col("src"), w.alias("w"), F.col("v"))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("v")).alias("sum_wv"),
        )
    )
    return agg.select(
        F.col("src").alias("query_id"),
        "n_nbrs",
        "sum_w",
        "sum_wv",
        F.when(
            F.col("sum_w") > 0,
            F.col("sum_wv").cast("double") / F.col("sum_w").cast("double"),
        ).alias("idw_value"),
    )


# --- coverage gaps -----------------------------------------------------------


def coverage_gaps(pts: DataFrame, res: float, x: str = "x", y: str = "y") -> DataFrame:
    """(cell_id, ring_n) for every EMPTY tile inside the occupied bounding
    extent; ``ring_n`` is the document total on the gap's 1-ring (0 for
    tiles isolated from all data — interior holes rank higher).

    Plan: per-cell count (the one point-volume shuffle, pinned — three
    consumers), extent as a broadcast scalar row, dense grid generated
    engine-side via sequence-explode (cardinality = extent/res² — a
    tile-space bound independent of document count; at planetary extents
    generate it from spark.range block-wise instead), anti-join against
    the occupied histogram, donor-explode ring totals left-joined on.
    """
    hist = _hist(pts, res, x, y).localCheckpoint(eager=False)
    ext = hist.agg(
        F.min("ix").alias("minix"),
        F.max("ix").alias("maxix"),
        F.min("iy").alias("miniy"),
        F.max("iy").alias("maxiy"),
    )
    grid = (
        ext.select(
            F.explode(F.sequence(F.col("minix"), F.col("maxix"))).alias("ix"),
            "miniy",
            "maxiy",
        )
        .select("ix", F.explode(F.sequence(F.col("miniy"), F.col("maxiy"))).alias("iy"))
    )
    gaps = grid.join(hist.select("ix", "iy"), ["ix", "iy"], "left_anti")
    ring = (
        _ring_contrib(hist, include_self=True)
        .groupBy("tix", "tiy")
        .agg(F.sum("n_src").alias("ring_n"))
    )
    joined = gaps.join(
        ring, (gaps["ix"] == ring["tix"]) & (gaps["iy"] == ring["tiy"]), "left"
    )
    return joined.select(
        cell_id_from_ix(F.col("ix"), F.col("iy")).alias("cell_id"),
        F.coalesce(F.col("ring_n"), F.lit(0).cast("long")).alias("ring_n"),
    )


def coverage_gaps_oracle_sql(pts_cte_body: str, res: float) -> str:
    """DuckDB twin of :func:`coverage_gaps` — dense grid via two chained
    unnest(range(...)) stages (chained, not same-SELECT: DuckDB zips
    parallel unnests), anti-join, ring totals."""
    return f"""WITH pts AS ({pts_cte_body}),
h AS (
  SELECT CAST(FLOOR(x / {res!r}) AS BIGINT) AS ix,
         CAST(FLOOR(y / {res!r}) AS BIGINT) AS iy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
ext AS (
  SELECT MIN(ix) AS minix, MAX(ix) AS maxix, MIN(iy) AS miniy, MAX(iy) AS maxiy
  FROM h
),
gx AS (SELECT unnest(range(minix, maxix + 1)) AS ix, miniy, maxiy FROM ext),
grid AS (SELECT ix, unnest(range(miniy, maxiy + 1)) AS iy FROM gx),
gaps AS (
  SELECT g.ix, g.iy FROM grid g
  LEFT JOIN h ON g.ix = h.ix AND g.iy = h.iy
  WHERE h.ix IS NULL
),
contrib AS (
  SELECT h.ix + dx.d AS tix, h.iy + dy.d AS tiy, h.n
  FROM h,
       (SELECT unnest(range(-1, 2)) AS d) dx,
       (SELECT unnest(range(-1, 2)) AS d) dy
),
r AS (
  SELECT tix, tiy, CAST(SUM(n) AS BIGINT) AS ring_n FROM contrib GROUP BY 1, 2
)
SELECT (gaps.ix + {_OFF}) * {_SHIFT} + (gaps.iy + {_OFF}) AS cell_id,
       COALESCE(r.ring_n, CAST(0 AS BIGINT)) AS ring_n
FROM gaps LEFT JOIN r ON gaps.ix = r.tix AND gaps.iy = r.tiy"""
