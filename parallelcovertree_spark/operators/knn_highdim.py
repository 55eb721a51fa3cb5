"""Exact distributed kNN in high dimension — the cover-tree top level as a
routing structure over embedding vectors.

The 2-D grid plans (operators/knn.py) cannot apply to a 64-dim embedding
column: cell occupancy collapses and ring enumeration explodes
combinatorially. What DOES carry over from the reference's design
(DistCoverTree.cpp: hub tree + triangle-inequality routing) is its top
level: a farthest-point-sampled hub set is exactly a coarse cover-tree
level, and the covering radii it induces give the same conservative
triangle-inequality bound the tree query uses — in ANY dimension, for any
metric, because only distances are touched.

Plan (all exact; hub choice affects performance, never the answer):

1. quantize vectors to integers (simsearch discipline: round(v·10⁴), so
   every squared distance is an exact int64-valued float64 and DuckDB
   replays it bit-for-bit);
2. farthest-point-sample ``n_hubs`` hubs from a bounded sample (driver
   numpy, O(n_hubs · sample) — the cover-tree level rule: strict > argmax,
   lowest index wins ties);
3. one mapInPandas pass assigns every vector to its nearest hub (broadcast
   hub matrix, Arrow batches, no shuffle);
4. per-hub local exact top-k (one applyInPandas over the hub partition:
   row-blocked squared-distance kernel, lexicographic (d², id) selection so
   distance ties resolve by id exactly like the SQL oracle);
5. triangle-inequality refinement: vector q must ALSO visit hub h′ iff
   d(q, c_h′) − R_h′ ≤ d_k(q) + slack (R_h′ = covering radius of h′, d_k =
   q's current k-th distance, unbounded when its home hub held < k other
   members). Visits shuffle once on the target hub; a cogroup computes
   exact visitor×member distances;
6. union + one window (ORDER BY d², dst) → global rank ≤ k.

Why this is the scale plan: brute force is O(n²·dim) — the per-hub local
phase is O(n²·dim / n_hubs) spread over executors, and the refinement pass
touches only the hubs the bound cannot exclude (pruning effectiveness is
asserted in test_knn_highdim). This is the operator that generates exact
ground truth for ANN recall evaluation at corpus scale — the reference's
exact-kNN-as-ground-truth discipline (programs/epsilon_graph.cpp) lifted
to embedding space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.simsearch import quantize

_SLACK = 1e-9  # absolute slack on the sqrt-space prune test (conservative)
# cosine routing runs on float64 unit vectors: |u|² = 1 ± few·2⁻⁵², and the
# exact-cos → unit-sphere-distance bound conversion (d²_u = 2 − 2·cos) differs
# from the computed u-space distances by ≲1e-15 in d² — ≲3e-8 in sqrt space
# once the sqrt amplifies near d = 0. 1e-6 dominates that by 30× and costs
# nothing in pruning power (hub radii are O(1) on the unit sphere).
_SLACK_COS = 1e-6
_BLOCK = 1024  # row block for pairwise-distance kernels


def _pairwise_d2(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Exact squared L2 between int-valued float64 matrices (all products
    stay below 2^53, so float64 arithmetic is integer-exact)."""
    return (
        (X * X).sum(axis=1)[:, None]
        + (Y * Y).sum(axis=1)[None, :]
        - 2.0 * (X @ Y.T)
    )


def _scores(X: np.ndarray, Y: np.ndarray, metric: str) -> np.ndarray:
    """Pairwise ranking-score matrix, ascending = better.

    l2: exact squared L2 (int-valued float64). cosine: NEGATED exact cosine
    over the quantized integer vectors — dot / (sqrt(n2_a)·sqrt(n2_b)), the
    same IEEE expression tree the SQL oracle evaluates (integer dot products
    and norms² are exact in float64; sqrt, ·, / are correctly rounded in
    every engine), so ranking by score asc, id asc is bit-identical to the
    oracle's ORDER BY cos DESC, dst."""
    if metric == "l2":
        return _pairwise_d2(X, Y)
    na = np.sqrt((X * X).sum(axis=1))
    nb = np.sqrt((Y * Y).sum(axis=1))
    # a vector that quantizes to all-zero has no direction: score it 0
    # (cosine of nothing) instead of 0/0 NaN, deterministically on both
    # sides of any norm-0 pairing — NaN would rank engine-specifically
    na = np.where(na == 0.0, np.inf, na)
    nb = np.where(nb == 0.0, np.inf, nb)
    return -((X @ Y.T) / (na[:, None] * nb[None, :]))


def _unitize(X: np.ndarray, metric: str) -> np.ndarray:
    """Routing-geometry coordinates: X itself under l2; unit-normalized rows
    under cosine (cos desc ordering == L2 asc ordering on the unit sphere).
    Used ONLY for hub selection / assignment / triangle bounds — the ranking
    comparator always comes from :func:`_scores` on the raw integer vectors."""
    if metric == "l2":
        return X
    n = np.sqrt((X * X).sum(axis=1))
    n = np.where(n == 0.0, 1.0, n)
    return X / n[:, None]


def _bound_d2(score_k: np.ndarray, metric: str) -> np.ndarray:
    """k-th ranking score → squared routing-space distance bound
    (identity under l2; d²_u = 2 − 2·cos on the unit sphere)."""
    if metric == "l2":
        return score_k
    return np.maximum(2.0 + 2.0 * score_k, 0.0)


def _fps(X: np.ndarray, n_hubs: int) -> np.ndarray:
    """Farthest-point sampling → row indices of the chosen hubs."""
    picked = [0]
    d2 = _pairwise_d2(X, X[:1]).ravel()
    while len(picked) < min(n_hubs, len(X)):
        nxt = int(d2.argmax())  # argmax: first (lowest-index) maximal entry
        if d2[nxt] <= 0.0:
            break  # every remaining point coincides with a hub
        picked.append(nxt)
        d2 = np.minimum(d2, _pairwise_d2(X, X[nxt : nxt + 1]).ravel())
    return np.asarray(picked, dtype=np.int64)


def _topk_rows(d2: np.ndarray, ids: np.ndarray, k: int):
    """Per-row lexicographic (d², id) top-k over a dense distance block.
    Returns (row_idx, dst_id, d2) flat arrays."""
    n, m = d2.shape
    k_eff = min(k, m)
    if k_eff == 0 or n == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.float64)
    order = np.lexsort((np.broadcast_to(ids, (n, m)), d2), axis=1)[:, :k_eff]
    rows = np.repeat(np.arange(n), k_eff)
    cols = order.ravel()
    return rows, ids[cols], d2[rows, cols]


def hub_knn_highdim(
    emb: DataFrame,
    k: int = 10,
    n_hubs: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    stats: dict | None = None,
    metric: str = "l2",
) -> DataFrame:
    """(src, nbr_rank, dst) — exact top-k over an embedding column.

    ``metric``: ``"l2"`` (squared euclidean, ties → lowest dst) or
    ``"cosine"`` (cos desc, ties → lowest dst — the oracle's exact
    comparator on quantized integers; routing runs on unit vectors where
    cos ordering is an L2 ordering, so the same triangle-inequality hub
    machinery applies unchanged, see _scores/_unitize/_bound_d2).

    Pass a dict as ``stats`` to get pruning diagnostics back (extra count
    jobs, measurement only): ``n`` vectors, ``visits`` refinement routings
    (n·(n_hubs−1) would be no pruning), ``n_hubs``."""
    if metric not in ("l2", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    slack = _SLACK if metric == "l2" else _SLACK_COS
    spark = emb.sparkSession
    q = emb.select(F.col(id_col).alias("src"), quantize(vec_col).alias("qv"))

    # --- hub selection: bounded sample → driver FPS (perf-only choice) ----
    sample = (
        q.where(F.pmod(F.xxhash64("src"), F.lit(8)) == 0)
        .limit(sample_cap)
        .collect()
    )
    if len(sample) < n_hubs:
        sample = q.limit(sample_cap).collect()
    SX = _unitize(np.asarray([r.qv for r in sample], dtype=np.float64), metric)
    hub_mat = SX[_fps(SX, n_hubs)]
    n_hubs_eff = len(hub_mat)
    sc = spark.sparkContext
    b_hubs = sc.broadcast(hub_mat)

    # --- assign: nearest hub per vector, one Arrow pass -------------------
    def assign(batches):
        H = b_hubs.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _unitize(
                np.asarray(pdf["qv"].tolist(), dtype=np.float64), metric
            )
            d2 = _pairwise_d2(X, H)
            h = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "src": pdf["src"].to_numpy(),
                    "qv": pdf["qv"],
                    "hub": h.astype(np.int32),
                    "d2h": d2[np.arange(len(h)), h],
                }
            )

    # localCheckpoint: materialized once, reused by radii / local / cogroup;
    # released by the ContextCleaner when the returned DataFrame is dropped
    # (cache-hygiene discipline, tests/test_cache_hygiene.py).
    assigned = (
        q.mapInPandas(assign, "src bigint, qv array<bigint>, hub int, d2h double")
        .repartition("hub")
        .localCheckpoint()
    )

    # covering radius per hub (driver-size: n_hubs rows)
    radii = {
        r.hub: float(r.R2)
        for r in assigned.groupBy("hub").agg(F.max("d2h").alias("R2")).collect()
    }
    b_radii = sc.broadcast(
        np.array([radii.get(h, 0.0) for h in range(n_hubs_eff)])
    )

    # --- local phase: exact top-k within the home hub ---------------------
    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray(pdf["qv"].tolist(), dtype=np.float64)
        ids = pdf["src"].to_numpy()
        m = len(X)
        frames = []
        for lo in range(0, m, _BLOCK):
            Q = X[lo : lo + _BLOCK]
            d2 = _scores(Q, X, metric)
            d2[np.arange(len(Q)), lo + np.arange(len(Q))] = np.inf  # self
            rows, dst, dd = _topk_rows(d2, ids, min(k, m - 1))
            # k-th bound per block row, mapped to ROUTING-space squared
            # distance (identity under l2); NaN = fewer than k found
            kth = (
                _bound_d2(np.sort(d2, axis=1)[:, k - 1], metric)
                if m - 1 >= k
                else np.full(len(Q), np.nan)
            )
            frames.append(
                pd.DataFrame(
                    {
                        "src": ids[lo + rows],
                        "dst": dst,
                        "d2": dd,
                        "d2k": kth[rows],
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if not len(out):  # singleton hub: keep src alive for routing
            return pd.DataFrame(
                {
                    "src": ids,
                    "dst": np.full(m, -1, dtype=np.int64),
                    "d2": np.full(m, np.nan),
                    "d2k": np.full(m, np.nan),
                }
            )
        return out

    local = (
        assigned.groupBy("hub")
        .applyInPandas(local_topk, "src bigint, dst bigint, d2 double, d2k double")
        .localCheckpoint()
    )

    bounds = local.groupBy("src").agg(F.min("d2k").alias("d2k"))

    # --- refinement: route q to every hub the bound cannot exclude --------
    routed = assigned.join(bounds, "src")

    def visits(batches):
        H = b_hubs.value
        R = np.sqrt(b_radii.value)
        for pdf in batches:
            if not len(pdf):
                continue
            X = _unitize(
                np.asarray(pdf["qv"].tolist(), dtype=np.float64), metric
            )
            dh = np.sqrt(np.maximum(_pairwise_d2(X, H), 0.0))
            dk = np.sqrt(pdf["d2k"].to_numpy())  # NaN propagates = unbounded
            need = (dh - R[None, :]) <= (dk[:, None] + slack)
            need |= np.isnan(dk)[:, None]
            need[np.arange(len(X)), pdf["hub"].to_numpy()] = False  # home done
            rows, hubs = np.nonzero(need)
            yield pd.DataFrame(
                {
                    "hub": hubs.astype(np.int32),
                    "src": pdf["src"].to_numpy()[rows],
                    "qv": pdf["qv"].iloc[rows].to_numpy(),
                }
            )

    visit_df = routed.mapInPandas(visits, "hub int, src bigint, qv array<bigint>")
    if stats is not None:
        visit_df = visit_df.localCheckpoint()
        stats["n"] = assigned.count()
        stats["visits"] = visit_df.count()
        stats["n_hubs"] = n_hubs_eff

    def cross(members: pd.DataFrame, visitors: pd.DataFrame) -> pd.DataFrame:
        if not len(members) or not len(visitors):
            return pd.DataFrame(
                {"src": pd.Series(dtype=np.int64),
                 "dst": pd.Series(dtype=np.int64),
                 "d2": pd.Series(dtype=np.float64)}
            )
        M = np.asarray(members["qv"].tolist(), dtype=np.float64)
        mids = members["src"].to_numpy()
        V = np.asarray(visitors["qv"].tolist(), dtype=np.float64)
        vids = visitors["src"].to_numpy()
        out = []
        for lo in range(0, len(V), _BLOCK):
            d2 = _scores(V[lo : lo + _BLOCK], M, metric)
            rows, dst, dd = _topk_rows(d2, mids, k)
            out.append(
                pd.DataFrame({"src": vids[lo + rows], "dst": dst, "d2": dd})
            )
        return pd.concat(out, ignore_index=True)

    foreign = (
        assigned.select("hub", "src", "qv")
        .groupby("hub")
        .cogroup(visit_df.groupby("hub"))
        .applyInPandas(cross, "src bigint, dst bigint, d2 double")
    )

    cand = (
        local.where(F.col("dst") >= 0).select("src", "dst", "d2")
        .unionByName(foreign)
    )
    w = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
    return (
        cand.withColumn("nbr_rank", F.row_number().over(w))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst")
    )


def hub_knn_highdim_queries(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_hubs: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    metric: str = "l2",
) -> DataFrame:
    """(src, nbr_rank, dst) — exact top-k of each QUERY vector over a
    separate corpus: the retrieval primitive (embed a query set, fetch
    nearest corpus docs). Same hub structure and bounds as
    :func:`hub_knn_highdim`, no self-exclusion (a query identical to a
    corpus vector ranks it first, like the 2-D two-table op's default).
    Queries route to their nearest hub for the local pass, then to every
    hub the triangle bound cannot exclude. ``metric`` as in
    :func:`hub_knn_highdim` ("l2" | "cosine" — routing on unit vectors,
    ranking by the oracle's exact quantized-integer cosine)."""
    if metric not in ("l2", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    slack = _SLACK if metric == "l2" else _SLACK_COS
    spark = corpus.sparkSession
    c = corpus.select(F.col(id_col).alias("src"), quantize(vec_col).alias("qv"))
    qr = queries.select(F.col(id_col).alias("src"), quantize(vec_col).alias("qv"))

    sample = (
        c.where(F.pmod(F.xxhash64("src"), F.lit(8)) == 0)
        .limit(sample_cap)
        .collect()
    )
    if len(sample) < n_hubs:
        sample = c.limit(sample_cap).collect()
    SX = _unitize(np.asarray([row.qv for row in sample], dtype=np.float64), metric)
    hub_mat = SX[_fps(SX, n_hubs)]
    n_hubs_eff = len(hub_mat)
    sc = spark.sparkContext
    b_hubs = sc.broadcast(hub_mat)

    def assign(batches):
        H = b_hubs.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _unitize(
                np.asarray(pdf["qv"].tolist(), dtype=np.float64), metric
            )
            d2 = _pairwise_d2(X, H)
            h = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "src": pdf["src"].to_numpy(),
                    "qv": pdf["qv"],
                    "hub": h.astype(np.int32),
                    "d2h": d2[np.arange(len(h)), h],
                }
            )

    schema = "src bigint, qv array<bigint>, hub int, d2h double"
    members = c.mapInPandas(assign, schema).repartition("hub").localCheckpoint()
    routed_q = qr.mapInPandas(assign, schema).localCheckpoint()

    radii = {
        row.hub: float(row.R2)
        for row in members.groupBy("hub").agg(F.max("d2h").alias("R2")).collect()
    }
    b_radii = sc.broadcast(
        np.array([radii.get(h, 0.0) for h in range(n_hubs_eff)])
    )

    def topk_vs_members(members_pdf: pd.DataFrame, visitors_pdf: pd.DataFrame):
        if not len(members_pdf) or not len(visitors_pdf):
            return pd.DataFrame(
                {"src": pd.Series(dtype=np.int64),
                 "dst": pd.Series(dtype=np.int64),
                 "d2": pd.Series(dtype=np.float64)}
            )
        M = np.asarray(members_pdf["qv"].tolist(), dtype=np.float64)
        mids = members_pdf["src"].to_numpy()
        V = np.asarray(visitors_pdf["qv"].tolist(), dtype=np.float64)
        vids = visitors_pdf["src"].to_numpy()
        out = []
        for lo in range(0, len(V), _BLOCK):
            d2 = _scores(V[lo : lo + _BLOCK], M, metric)
            rows, dst, dd = _topk_rows(d2, mids, k)
            out.append(
                pd.DataFrame({"src": vids[lo + rows], "dst": dst, "d2": dd})
            )
        return pd.concat(out, ignore_index=True)

    # local pass: each query against its home hub's members
    local = (
        members.groupby("hub")
        .cogroup(routed_q.groupby("hub"))
        .applyInPandas(topk_vs_members, "src bigint, dst bigint, d2 double")
        .localCheckpoint()
    )
    # bound: the query's current k-th distance — unbounded (NaN) when the
    # home hub held fewer than k members, and for queries absent from
    # `local` entirely (empty home hub): the left join keeps them with NULL
    kth = local.groupBy("src").agg(
        F.max("d2").alias("dmax"), F.count(F.lit(1)).alias("n_found")
    ).select(
        "src",
        F.when(
            F.col("n_found") >= k,
            F.col("dmax")
            if metric == "l2"
            else F.greatest(2.0 + 2.0 * F.col("dmax"), F.lit(0.0)),
        ).alias("d2k"),
    )
    routed = routed_q.join(kth, "src", "left")

    def visits(batches):
        H = b_hubs.value
        R = np.sqrt(b_radii.value)
        for pdf in batches:
            if not len(pdf):
                continue
            X = _unitize(
                np.asarray(pdf["qv"].tolist(), dtype=np.float64), metric
            )
            dh = np.sqrt(np.maximum(_pairwise_d2(X, H), 0.0))
            dk = np.sqrt(pdf["d2k"].to_numpy(dtype=np.float64))
            need = (dh - R[None, :]) <= (dk[:, None] + slack)
            need |= np.isnan(dk)[:, None]
            need[np.arange(len(X)), pdf["hub"].to_numpy()] = False
            rows, hubs = np.nonzero(need)
            yield pd.DataFrame(
                {
                    "hub": hubs.astype(np.int32),
                    "src": pdf["src"].to_numpy()[rows],
                    "qv": pdf["qv"].iloc[rows].to_numpy(),
                }
            )

    visit_df = routed.mapInPandas(visits, "hub int, src bigint, qv array<bigint>")
    foreign = (
        members.select("hub", "src", "qv")
        .groupby("hub")
        .cogroup(visit_df.groupby("hub"))
        .applyInPandas(topk_vs_members, "src bigint, dst bigint, d2 double")
    )

    cand = local.select("src", "dst", "d2").unionByName(foreign)
    w = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
    return (
        cand.withColumn("nbr_rank", F.row_number().over(w))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst")
    )


def hub_epsilon_highdim(
    emb: DataFrame,
    radius_q: int,
    n_hubs: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
) -> DataFrame:
    """(src, dst) — the exact ε-graph over an embedding column: every ordered
    pair (self-loops included, flagship ε-join semantics) with quantized L2
    distance ≤ ``radius_q``.

    Same hub structure as :func:`hub_knn_highdim`, simpler routing: q visits
    hub h′ iff d(q, c_h′) − R_h′ ≤ r (+slack). Symmetry needs no special
    casing — if d(q, m) ≤ r for m in h′, then q's bound admits h′ AND m's
    bound admits q's hub, so each direction is emitted exactly once (local
    pairs from the home hub, cross pairs only as visitor→member, which are
    disjoint because a visitor is never a member). The exact ground-truth
    companion to the LSH `embedding_neardup` scale path.
    """
    spark = emb.sparkSession
    q = emb.select(F.col(id_col).alias("src"), quantize(vec_col).alias("qv"))
    t2 = float(radius_q) * float(radius_q)
    r = float(radius_q)

    sample = (
        q.where(F.pmod(F.xxhash64("src"), F.lit(8)) == 0)
        .limit(sample_cap)
        .collect()
    )
    if len(sample) < n_hubs:
        sample = q.limit(sample_cap).collect()
    SX = np.asarray([row.qv for row in sample], dtype=np.float64)
    hub_mat = SX[_fps(SX, n_hubs)]
    n_hubs_eff = len(hub_mat)
    sc = spark.sparkContext
    b_hubs = sc.broadcast(hub_mat)

    def assign(batches):
        H = b_hubs.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["qv"].tolist(), dtype=np.float64)
            d2 = _pairwise_d2(X, H)
            h = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "src": pdf["src"].to_numpy(),
                    "qv": pdf["qv"],
                    "hub": h.astype(np.int32),
                    "d2h": d2[np.arange(len(h)), h],
                }
            )

    assigned = (
        q.mapInPandas(assign, "src bigint, qv array<bigint>, hub int, d2h double")
        .repartition("hub")
        .localCheckpoint()
    )

    radii = {
        row.hub: float(row.R2)
        for row in assigned.groupBy("hub").agg(F.max("d2h").alias("R2")).collect()
    }
    b_radii = sc.broadcast(
        np.array([radii.get(h, 0.0) for h in range(n_hubs_eff)])
    )

    def local_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray(pdf["qv"].tolist(), dtype=np.float64)
        ids = pdf["src"].to_numpy()
        frames = []
        for lo in range(0, len(X), _BLOCK):
            d2 = _pairwise_d2(X[lo : lo + _BLOCK], X)
            rows, cols = np.nonzero(d2 <= t2)
            frames.append(
                pd.DataFrame({"src": ids[lo + rows], "dst": ids[cols]})
            )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"src": pd.Series(dtype=np.int64),
                               "dst": pd.Series(dtype=np.int64)})
        )

    local = assigned.groupBy("hub").applyInPandas(
        local_pairs, "src bigint, dst bigint"
    )

    def visits(batches):
        H = b_hubs.value
        R = np.sqrt(b_radii.value)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf["qv"].tolist(), dtype=np.float64)
            dh = np.sqrt(np.maximum(_pairwise_d2(X, H), 0.0))
            need = (dh - R[None, :]) <= (r + _SLACK)
            need[np.arange(len(X)), pdf["hub"].to_numpy()] = False
            rows, hubs = np.nonzero(need)
            yield pd.DataFrame(
                {
                    "hub": hubs.astype(np.int32),
                    "src": pdf["src"].to_numpy()[rows],
                    "qv": pdf["qv"].iloc[rows].to_numpy(),
                }
            )

    visit_df = assigned.mapInPandas(visits, "hub int, src bigint, qv array<bigint>")

    def cross(members: pd.DataFrame, visitors: pd.DataFrame) -> pd.DataFrame:
        if not len(members) or not len(visitors):
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "dst": pd.Series(dtype=np.int64)})
        M = np.asarray(members["qv"].tolist(), dtype=np.float64)
        mids = members["src"].to_numpy()
        V = np.asarray(visitors["qv"].tolist(), dtype=np.float64)
        vids = visitors["src"].to_numpy()
        frames = []
        for lo in range(0, len(V), _BLOCK):
            d2 = _pairwise_d2(V[lo : lo + _BLOCK], M)
            rows, cols = np.nonzero(d2 <= t2)
            frames.append(
                pd.DataFrame({"src": vids[lo + rows], "dst": mids[cols]})
            )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"src": pd.Series(dtype=np.int64),
                               "dst": pd.Series(dtype=np.int64)})
        )

    foreign = (
        assigned.select("hub", "src", "qv")
        .groupby("hub")
        .cogroup(visit_df.groupby("hub"))
        .applyInPandas(cross, "src bigint, dst bigint")
    )

    return local.unionByName(foreign)


__all__ = ["hub_epsilon_highdim", "hub_knn_highdim", "hub_knn_highdim_queries"]
