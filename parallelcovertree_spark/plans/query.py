"""Tree-accelerated queries: routed radius search over the two-phase tree.

The reference's distributed query replicates ALL points to every rank
(DistCoverTree.cpp:679-724) — its stated scalability weak spot. We do what its
``idea.txt`` proposes instead: broadcast only the (small) top tree, traverse it
per query batch to find (a) direct hits and (b) the local-tree roots whose
covering balls intersect the query ball (DistCoverTree.cpp:1088-1125
``local_radii_query`` semantics), then SHUFFLE each query to its target hubs
and finish inside a ``cogroup(...).applyInPandas`` against the co-located
local-tree partition — the Spark analog of the reference's batched
query-routing design note (idea.txt:1-21, SURVEY J6).

Result sets are unioned + dedup'd (the reference's ``allgather_distinct``,
DistCoverTree.cpp:657-677).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.cells import explode_k_ring, with_cell
from parallelcovertree_spark.functions.geo import dist2_expr
from parallelcovertree_spark.plans.covertree import CoverTreeModel
from parallelcovertree_spark.plans.local_tree import (
    TreeArrays,
    grid_radius_pairs,
)


def _top_tree_arrays(model: CoverTreeModel) -> tuple[TreeArrays, np.ndarray, np.ndarray]:
    """Collect the top tree into dense driver-side arrays.

    Returns (tree, vid_by_index, stop_indices). Point coords are joined from
    the points table (SURVEY F6 projection vertex→point).

    Global-phase LEAF vertices are excluded: the top tree proper is bounded
    by the hub cutoff, but leaves are one-per-deactivated-point — a corpus
    with massive coordinate-duplicate clusters (same-URL hashes) would drag
    O(dups) rows onto the driver. Leaf hits are answered distributed instead
    (grid ε-join in ``tree_radius_join``).

    Memoized on the model (like ``_hub_radii``): a kNN radius search runs up
    to 8 expansion rounds against the same immutable model — one collect,
    not one per round."""
    cached = getattr(model, "_top_tree_cache", None)
    if cached is not None:
        return cached
    from parallelcovertree_spark.plans.covertree import LEAF_VID_BASE

    rows = (
        model.vertices.where(F.col("vertex_id") < LEAF_VID_BASE)
        .join(
            model.points.select(F.col("id").alias("point_id"), "x", "y"), "point_id"
        )
        .select("vertex_id", "point_id", "parent_id", "level", "x", "y")
        .collect()
    )
    rows.sort(key=lambda r: r.vertex_id)
    vid = np.array([r.vertex_id for r in rows], dtype=np.int64)
    vidx = {int(v): i for i, v in enumerate(vid)}
    pid = np.array([r.point_id for r in rows], dtype=np.int64)
    # dense point indexing in first-appearance order
    upid, codes = np.unique(pid, return_inverse=True)
    xy = np.zeros((len(upid), 2), dtype=np.float32)
    xy[codes, 0] = np.array([r.x for r in rows], dtype=np.float32)
    xy[codes, 1] = np.array([r.y for r in rows], dtype=np.float32)
    parent = np.array(
        [vidx[int(r.parent_id)] if r.parent_id >= 0 else -1 for r in rows],
        dtype=np.int64,
    )
    level = np.array([r.level for r in rows], dtype=np.int64)
    tree = TreeArrays(codes.astype(np.int64), level, parent, model.max_radius, model.base, xy)
    stop = np.array([vidx[h] for h in model.local_roots], dtype=np.int64)
    cached = (tree, upid, stop)  # upid maps point index → global pid
    object.__setattr__(model, "_top_tree_cache", cached)
    return cached


def _hub_radii(model: CoverTreeModel, vid_of_stop: np.ndarray):
    """Actual covering radius + member bounding box per local-tree root
    (aligned with ``model.local_roots``) — each local build records max dist
    from its hub point; every member appears as a local vertex, so the
    min/max of (px, py) is the hub's exact member bounding box. The radius
    is ≤ the generic level ball bound, so routing with it is exact AND
    strictly tighter; the box is tighter still (hub balls overlap heavily at
    small query radii — measured 4.4 routed hubs/query at 1M points where
    ~1 hub actually holds hits). Collected once per model (n_hubs rows, one
    agg job), memoized. Returns (radii, x0, x1, y0, y1) or None."""
    if model.local_trees is None or not len(vid_of_stop):
        return None
    cached = getattr(model, "_hub_radii_cache", None)
    if cached is None:
        rows = (
            model.local_trees.groupBy("hub_id")
            .agg(
                F.max("lmax_radius").alias("lmax"),
                F.min("px").alias("x0"), F.max("px").alias("x1"),
                F.min("py").alias("y0"), F.max("py").alias("y1"),
            )
            .collect()
        )
        cached = {
            int(r.hub_id): (float(r.lmax), float(r.x0), float(r.x1),
                            float(r.y0), float(r.y1))
            for r in rows
        }
        object.__setattr__(model, "_hub_radii_cache", cached)
    vals = [cached[int(v)] for v in vid_of_stop]
    arr = np.array(vals, dtype=np.float64)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]


def tree_radius_join(
    model: CoverTreeModel,
    queries: DataFrame,
    radius: float,
    qid_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """All (qid, point_id) with d ≤ radius, answered through the tree.

    The result is distinct-BY-CONSTRUCTION — no terminal ``.distinct()``
    shuffle over the (potentially huge) pair set. The three hit sources are
    made disjoint: stage 1 tests exactly the points of NON-stop top vertices
    (deduped in-kernel; a chain point can sit on several vertices); stage 2
    and the leaf join drop those same points (stage 1 is guaranteed to find
    them: a vertex whose point is within r always passes its own traversal
    bound). Stage 2 covers each corpus point at most once (one owning hub);
    leaves are disjoint from local trees by deactivation."""
    spark = queries.sparkSession
    tree, upid, stop = _top_tree_arrays(model)
    vid_of_stop = np.array(model.local_roots, dtype=np.int64)
    stop_meta = _hub_radii(model, vid_of_stop)
    # global pids tested by stage 1 = points of NON-stop top vertices (stop
    # vertices are routed, their point is tested inside the local tree)
    nonstop = np.ones(len(tree.pt), dtype=bool)
    if len(stop):
        nonstop[stop] = False
    s1idx = np.unique(tree.pt[nonstop])  # point indices, unique
    stage1_pids = upid[s1idx]            # sorted (pt indices sort like pids)
    # per-hub member bounding boxes (stop-aligned): a hub is routed iff the
    # query ball intersects its member box — a member within r of q lies in
    # its hub's box, so dist(q, box) ≤ dist(q, member) ≤ r and no true hit
    # can be pruned. The box criterion equals the former traversal∩box
    # filter's accept set on every hub that matters (box ⊆ covering ball, so
    # a box hit implies every ancestor ball bound holds); measured 4.4 → 1.9
    # routed hubs/query at 1M points.
    hub_boxes = None
    if stop_meta is not None and len(stop):
        hub_boxes = (stop_meta[1], stop_meta[2], stop_meta[3], stop_meta[4])
    # radius-independent payload → memoized broadcast: tree_knn's expansion
    # rounds reuse one executor-side copy instead of re-shipping the model
    bc = getattr(model, "_query_bc_cache", None)
    if bc is None:
        bc = spark.sparkContext.broadcast(
            (tree, upid, stage1_pids, s1idx, hub_boxes, vid_of_stop)
        )
        object.__setattr__(model, "_query_bc_cache", bc)
    r = float(radius)

    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.col(x).cast("double").alias("qx"),
        F.col(y).cast("double").alias("qy"),
    )

    # --- stage 1, JVM form: both small sides broadcast ----------------------
    # The former mapInArrow stage shipped every query through the Python
    # boundary and checkpointed ~1.9 routed rows per query. Both of its
    # decisions depend only on TINY model-side tables, so they are now two
    # broadcast hash joins in whole-stage codegen (guide §3.1/§2.4 — no
    # shuffle, no Python, no checkpoint):
    # (a) HITS: the stage-1 point set (non-stop top-vertex points, a few
    #     hundred rows) exploded to its 1-ring at cell size r — each query
    #     probes its own cell, exact d² ≤ r² filter. Identical predicate and
    #     float32-rounded coordinates as the former kernel (the tree stores
    #     float32; the literal table carries those exact values widened).
    # (b) ROUTES: the hub-box rectangle stab — the same coarse stab grid is
    #     built driver-side in numpy (each inflated box covers ≤ 2×2 cells),
    #     shipped as a literal (stab_key → box) table; queries probe ONE
    #     stab cell and keep boxes with dist(q, box)² ≤ rm². The 1e-9
    #     relative margin makes the prune immune to last-bit rounding — a
    #     kept route only costs stage-2 work, and no true hit can be lost
    #     (a member within r of q lies in its hub's box).
    import pandas as pd

    rm = r + 1e-9 * max(1.0, r)
    rm2 = rm * rm
    s1_df = spark.createDataFrame(
        pd.DataFrame({
            "pid": stage1_pids,
            "px": tree.xy[s1idx, 0].astype(np.float64),
            "py": tree.xy[s1idx, 1].astype(np.float64),
        }),
        "pid long, px double, py double",
    )
    ring = explode_k_ring(s1_df, r, k=1, x="px", y="py", out="_cell")
    hits_top = (
        with_cell(q, r, x="qx", y="qy", out="_cell")
        .join(F.broadcast(ring), "_cell")
        .where(dist2_expr("qx", "qy", "px", "py") <= F.lit(r * r))
        .select("qid", "pid")
    )

    to_route = None
    if hub_boxes is not None and len(vid_of_stop):
        x0, x1, y0, y1 = hub_boxes
        g = max(float(np.max(x1 - x0)), float(np.max(y1 - y0)),
                2.0 * rm, 1e-12) * (1.0 + 1e-12)
        bcx0 = np.floor((x0 - rm) / g).astype(np.int64)
        bcx1 = np.floor((x1 + rm) / g).astype(np.int64)
        bcy0 = np.floor((y0 - rm) / g).astype(np.int64)
        bcy1 = np.floor((y1 + rm) / g).astype(np.int64)
        cymin = int(bcy0.min()) - 1
        cymax = int(bcy1.max()) + 1
        span = int(cymax - cymin + 2)
        keys, bidx = [], []
        for i in range(len(vid_of_stop)):
            for cx in range(int(bcx0[i]), int(bcx1[i]) + 1):
                kbase = cx * span - cymin
                for cy in range(int(bcy0[i]), int(bcy1[i]) + 1):
                    keys.append(kbase + cy)
                    bidx.append(i)
        bidx = np.asarray(bidx, dtype=np.int64)
        stab_df = spark.createDataFrame(
            pd.DataFrame({
                "_skey": np.asarray(keys, dtype=np.int64),
                "_hx0": x0[bidx], "_hx1": x1[bidx],
                "_hy0": y0[bidx], "_hy1": y1[bidx],
                "_hub": vid_of_stop[bidx],
            }),
            "_skey long, _hx0 double, _hx1 double, _hy0 double, _hy1 double, "
            "_hub long",
        )
        qcy = F.floor(F.col("qy") / F.lit(g)).cast("long")
        gx = F.greatest(F.col("_hx0") - F.col("qx"),
                        F.col("qx") - F.col("_hx1"), F.lit(0.0))
        gy = F.greatest(F.col("_hy0") - F.col("qy"),
                        F.col("qy") - F.col("_hy1"), F.lit(0.0))
        to_route = (
            q.withColumn("_qcy", qcy)
            .where(F.col("_qcy").between(cymin, cymax))
            .withColumn(
                "_skey",
                F.floor(F.col("qx") / F.lit(g)).cast("long") * F.lit(span)
                + (F.col("_qcy") - F.lit(cymin)),
            )
            .join(F.broadcast(stab_df), "_skey")
            .where(gx * gx + gy * gy <= F.lit(rm2))
            .select(F.col("_hub").alias("hub_id"), "qid", "qx", "qy")
        )

    if model.has_global_leaves:
        # points deactivated during the global phase (exact-coordinate
        # duplicate clusters) live in leaf vertices excluded from the
        # broadcast top tree — answer them with the distributed grid ε-join
        # (exact; results dedup with the traversal hits below)
        from parallelcovertree_spark.operators.epsilon_join import epsilon_join
        from parallelcovertree_spark.plans.covertree import LEAF_VID_BASE

        # drop leaf points stage 1 already tests (a dup-cluster's root point
        # can be both a top vertex point and a leaf) — keeps the union
        # distinct without a terminal shuffle
        s1 = spark.createDataFrame(
            [(int(p),) for p in stage1_pids], "s1_pid long"
        )
        leaf_pts = (
            model.vertices.where(F.col("vertex_id") >= LEAF_VID_BASE)
            .select(F.col("point_id").alias("id"))
            .join(F.broadcast(s1), F.col("id") == F.col("s1_pid"), "left_anti")
            .join(model.points, "id")
        )
        qn = q.select("qid", F.col("qx").alias("x"), F.col("qy").alias("y"))
        hits_leaf = epsilon_join(qn, leaf_pts, r, left_id="qid").select(
            F.col("src").alias("qid"), F.col("dst").alias("pid")
        )
        hits_top = hits_top.unionByName(hits_leaf)

    if model.local_trees is None or to_route is None:
        return hits_top.select(F.col("qid").alias("src"), F.col("pid").alias("dst"))

    # --- stage 2 regime split (guide §3.1: broadcast the side that fits) ----
    # For SMALL query sets (selective lookups, kNN expansion rounds) the
    # cogroup's fixed cost — Arrow-shipping the full members table to Python
    # on every call — dominates. Below the threshold the finish is instead a
    # pure-JVM broadcast hash join: the routed queries explode to their
    # 9-cell ring (~17 rows/query, a few MB), members probe it map-side over
    # the pre-partitioned checkpoint (no exchange, no Python), exact
    # d² ≤ r² filter. Identical pair set: a member within r of a routed
    # query lies in its ring; members are unique rows; stage-1 points are
    # dropped by the same anti-join the leaf path uses. Requires the unique
    # members table (local_trees has multiple vertex rows per point).
    # The one-count probe of q is a codegen agg over the (typically cached /
    # filter-derived) query source — cheap against the cogroup it avoids.
    # Default 50k: the broadcast side is the ring-exploded route set
    # (~2 routes/query x 9 cells x ~44 B), so 50k queries is a ~40 MB
    # broadcast — comfortably inside executor memory at any cluster size,
    # while 100k+ starts to be a real per-executor allocation.
    bcast_q_threshold = int(
        os.environ.get("COVERGRID_ROUTE_BCAST_QUERIES", "50000")
    )
    if getattr(model, "members", None) is not None and q.count() <= bcast_q_threshold:
        ring_route = explode_k_ring(to_route, r, k=1, x="qx", y="qy", out="_mcell")
        s1df = spark.createDataFrame(
            pd.DataFrame({"s1_pid": stage1_pids}), "s1_pid long"
        )
        mem = (
            model.members
            .join(F.broadcast(s1df),
                  F.col("point_id") == F.col("s1_pid"), "left_anti")
        )
        mem = with_cell(mem, r, x="px", y="py", out="_mcell")
        hits_local = (
            mem.alias("m")
            .join(
                F.broadcast(ring_route).alias("t"),
                (F.col("m.hub_id") == F.col("t.hub_id"))
                & (F.col("m._mcell") == F.col("t._mcell")),
            )
            .where(dist2_expr("qx", "qy", "px", "py") <= F.lit(r * r))
            .select("qid", F.col("point_id").alias("pid"))
        )
        out = hits_top.unionByName(hits_local).select(
            F.col("qid").alias("src"), F.col("pid").alias("dst")
        )
        return out

    # the members table holds one row per member by construction; the
    # local_trees fallback (hand-built models) has one row per VERTEX, so a
    # chain point appears several times and needs the unique pass
    tree_rows_unique = getattr(model, "members", None) is not None

    def stage2(routes_tb, tree_tb):
        import pyarrow as pa

        def empty():
            return pa.table({
                "qid": pa.array(np.empty(0, np.int64), pa.int64()),
                "pids": pa.ListArray.from_arrays(
                    pa.array(np.zeros(1, np.int32)),
                    pa.array(np.empty(0, np.int64), pa.int64()),
                ),
            })

        if not routes_tb.num_rows or not tree_tb.num_rows:
            return empty()

        def col(tb, name):
            return tb.column(name).combine_chunks().to_numpy(zero_copy_only=False)

        _t, _pi, s1pids, _s1i, _hb, _hv = bc.value
        # dense grid finish over the hub's UNIQUE member points: same exact
        # result set as traversing the local tree (every member appears as a
        # local vertex; the traversal finds exactly the within-r members),
        # measured ~30× cheaper at ε-graph radii. Distinct-by-construction
        # is now free (unique points ⇒ no chain-duplicate dedupe), and the
        # stage-1-tested points are dropped up-front instead of post-hoc.
        pids = col(tree_tb, "point_id")
        if tree_rows_unique:
            keep = ~np.isin(pids, s1pids)
            upids = pids[keep]
            first = np.flatnonzero(keep)
        else:
            upids, first = np.unique(pids, return_index=True)
            keep = ~np.isin(upids, s1pids)
            upids, first = upids[keep], first[keep]
        if not len(upids):
            return empty()
        px = col(tree_tb, "px")[first].astype(np.float64)
        py = col(tree_tb, "py")[first].astype(np.float64)
        hq, hp = grid_radius_pairs(
            px, py, col(routes_tb, "qx"), col(routes_tb, "qy"), r,
        )
        # PACKED return leg (same discipline as the kNN kernel): hq is
        # query-index-ascending by construction, so one run-length pass packs
        # each query's pids into a zero-copy ListArray — ~15x fewer rows
        # cross the Python->JVM boundary at ε-graph densities; a codegen
        # posexplode rebuilds the pair rows JVM-side.
        if not len(hq):
            return empty()
        gstart = np.flatnonzero(np.r_[True, hq[1:] != hq[:-1]])
        offsets = np.zeros(len(gstart) + 1, dtype=np.int32)
        offsets[1:-1] = gstart[1:]
        offsets[-1] = len(hq)
        return pa.table({
            "qid": pa.array(col(routes_tb, "qid")[hq[gstart]], pa.int64()),
            "pids": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(upids[hp], pa.int64())
            ),
        })

    # cogroup against the narrow pre-partitioned members table when the
    # model carries one (4 columns, unique rows, exchange/sort-free side);
    # the full vertex table remains the fallback for hand-built models
    tree_side = model.members if getattr(model, "members", None) is not None else model.local_trees
    hits_local = (
        to_route.groupBy("hub_id")
        .cogroup(tree_side.groupBy("hub_id"))
        .applyInArrow(stage2, "qid long, pids array<long>")
        .select("qid", F.explode("pids").alias("pid"))
    )
    # sources are pairwise disjoint (see docstring) → plain union, no shuffle
    out = hits_top.unionByName(hits_local).select(
        F.col("qid").alias("src"), F.col("pid").alias("dst")
    )
    return out


def tree_epsilon_graph(model: CoverTreeModel, radius: float) -> DataFrame:
    """ε-graph through the tree (CoverTree.cpp:374-384): every point queries
    its own radius neighborhood; self-loops included by construction."""
    return tree_radius_join(model, model.points, radius)


def tree_knn(
    model: CoverTreeModel,
    queries: DataFrame,
    k: int = 10,
    qid_col: str = "id",
    x: str = "x",
    y: str = "y",
    r0: float | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact kNN answered through the cover tree: adaptive-radius rounds of
    the routed radius query. A query with ≥ k in-radius results (excluding
    itself) is certified — the radius query is exact, so its top-k by
    (d² asc, id asc) is the true top-k. Unresolved queries retry at doubled
    radius (the reference's kNN ground truth is brute force,
    programs/epsilon_graph.cpp:113-118; this is the tree-indexed equivalent).
    Returns (src, nbr_rank, dst)."""
    from parallelcovertree_spark.operators.knn import estimate_radius

    q = queries.select(
        F.col(qid_col).cast("long").alias("id"),
        F.col(x).cast("double").alias("x"),
        F.col(y).cast("double").alias("y"),
    ).persist()
    r = float(r0) if r0 is not None else estimate_radius(q, k + 1)
    pts = model.points.select(
        F.col("id").alias("dst"),
        F.col("x").cast("double").alias("tx"),
        F.col("y").cast("double").alias("ty"),
    )

    unresolved = q
    remaining = -1  # unknown until first round
    parts: list[DataFrame] = []
    for round_no in range(max_rounds):
        hits = tree_radius_join(model, unresolved, r)  # (src, dst)
        cand = (
            hits.join(unresolved.withColumnRenamed("id", "src"), "src")
            .join(pts, "dst")
            .where(F.col("src") != F.col("dst"))
            .select(
                "src", "dst",
                ((F.col("x") - F.col("tx")) ** 2 + (F.col("y") - F.col("ty")) ** 2).alias("d2"),
            )
        )
        wrank = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
        wcnt = Window.partitionBy("src")
        flagged = cand.withColumn("rk", F.row_number().over(wrank)).withColumn(
            "cnt", F.count(F.lit(1)).over(wcnt)
        )
        resolved = flagged.where((F.col("cnt") >= k) & (F.col("rk") <= k)).localCheckpoint(
            eager=True
        )
        parts.append(resolved.select("src", F.col("rk").alias("nbr_rank"), "dst"))
        nxt = unresolved.join(
            resolved.select("src").distinct().withColumnRenamed("src", "id"), "id", "left_anti"
        ).persist()
        remaining = nxt.count()
        unresolved.unpersist()
        unresolved = nxt
        if remaining == 0:
            break
        r *= 2.0

    if remaining != 0:
        # exact fallback for queries still uncertified after max_rounds
        # (k ≥ available neighbors, or an r0 underestimate needing more than
        # 2^max_rounds growth): brute-force window top-k over the broadcast
        # straggler set — same straggler discipline as knn_join, so no query
        # is ever silently dropped.
        cand = (
            F.broadcast(unresolved.withColumnRenamed("id", "src"))
            .join(pts, F.col("src") != F.col("dst"))
            .select(
                "src", "dst",
                ((F.col("x") - F.col("tx")) ** 2 + (F.col("y") - F.col("ty")) ** 2).alias("d2"),
            )
        )
        w = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("dst").asc())
        parts.append(
            cand.withColumn("nbr_rank", F.row_number().over(w))
            .where(F.col("nbr_rank") <= k)
            .select("src", "nbr_rank", "dst")
            .localCheckpoint(eager=True)
        )
    unresolved.unpersist()

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
