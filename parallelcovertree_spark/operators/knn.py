"""kNN join (k=10 north star) via grid join + adaptive ring expansion.

The reference's primitive is the radius query; its kNN ground truth is exact
brute force (``/root/reference/programs/epsilon_graph.cpp:113-118`` pattern,
``snn_test.py:30-36``). Engine plan here:

1. Pick a starting radius r₀ from global density (k / points-per-area).
2. Grid ε-join at r₀; per-src window top-k over candidates.
3. A src is RESOLVED iff it has ≥ k candidates and its kth distance ≤ r₀
   (then the candidate set provably contains its true top-k: every point
   within r₀ is a candidate).
4. Unresolved srcs retry at doubled radius; ≤ ``max_rounds`` rounds, then an
   exact fallback (unresolved set is tiny — isolated points).

Scale behavior: each round is one shuffle hash join over only the unresolved
srcs; candidate blow-up is bounded by the 9-cell ring at a density-matched
resolution. Ties broken (dist², dst asc); self excluded (FIXTURES.md F3).

``knn_brute_force`` is the oracle-shaped exact variant (cross join + window) —
quadratic, test scale only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.geo import dist2_expr


def _prep(points: DataFrame, id_col: str, x: str, y: str, role: str) -> DataFrame:
    i, xx, yy = ("src", "sx", "sy") if role == "l" else ("dst", "tx", "ty")
    return points.select(
        F.col(id_col).alias(i),
        F.col(x).cast("double").alias(xx),
        F.col(y).cast("double").alias(yy),
    )


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(F.col("dist2").asc(), F.col("dst").asc())
    return cand.withColumn("nbr_rank", F.row_number().over(w)).where(F.col("nbr_rank") <= k)


def estimate_radius(points: DataFrame, k: int, x: str = "x", y: str = "y") -> float:
    """r₀ ≈ sqrt(k / density): the radius expected to hold ~k neighbors."""
    row = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(x).alias("x0"), F.max(x).alias("x1"),
        F.min(y).alias("y0"), F.max(y).alias("y1"),
    ).collect()[0]
    n = max(int(row.n), 1)
    area = max((float(row.x1) - float(row.x0)) * (float(row.y1) - float(row.y0)), 1e-12)
    return max((k * area / n) ** 0.5, 1e-6)


def knn_join(
    points: DataFrame,
    k: int = 10,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    r0: float | None = None,
    max_rounds: int = 5,
) -> DataFrame:
    """Exact kNN self-join → (src, nbr_rank, dst), rank 1..k."""
    base = points.select(id_col, x, y).persist()
    base.count()
    r = float(r0) if r0 is not None else estimate_radius(base, k + 1, x, y)

    left = _prep(base, id_col, x, y, "l")
    right = _prep(base, id_col, x, y, "r").persist()
    resolved_parts: list[DataFrame] = []
    unresolved = left.persist()

    for _ in range(max_rounds):
        cand = _ring_candidates(unresolved, right, r)
        topk = _topk(cand, k).persist()
        stats = topk.groupBy("src").agg(
            F.count(F.lit(1)).alias("cnt"), F.max("dist2").alias("kth_d2")
        )
        done_src = stats.where(
            (F.col("cnt") == k) & (F.col("kth_d2") <= F.lit(r * r))
        ).select("src")
        resolved_parts.append(
            topk.join(F.broadcast(done_src), "src").select("src", "nbr_rank", "dst", "dist2")
        )
        nxt = unresolved.join(F.broadcast(done_src), "src", "left_anti").persist()
        remaining = nxt.count()
        unresolved.unpersist()
        unresolved = nxt
        if remaining == 0:
            break
        r *= 2.0
    else:
        # exact fallback for stragglers (tiny set): broadcast them against all
        cand = F.broadcast(unresolved).join(right, F.col("src") != F.col("dst"))
        cand = cand.withColumn("dist2", dist2_expr("sx", "sy", "tx", "ty"))
        resolved_parts.append(_topk(cand, k).select("src", "nbr_rank", "dst", "dist2"))

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out.select("src", "nbr_rank", "dst")


def _ring_candidates(left: DataFrame, right: DataFrame, r: float) -> DataFrame:
    """Grid-ring candidate pairs with dist² attached, self excluded."""
    from parallelcovertree_spark.functions.cells import explode_k_ring, with_cell

    lt = with_cell(left, r, x="sx", y="sy", out="_cell")
    rt = explode_k_ring(right, r, k=1, x="tx", y="ty", out="_cell")
    d2 = dist2_expr("sx", "sy", "tx", "ty")
    return (
        lt.join(rt, "_cell")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", d2.alias("dist2"))
        # prune beyond-radius candidates before the per-src window sort:
        # anything > r can never certify, and all certified neighbors are ≤ r
        .where(F.col("dist2") <= F.lit(r * r))
    )


def knn_brute_force(
    points: DataFrame,
    k: int = 10,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """O(n²) exact kNN — the reference's ground-truth pattern. Test scale."""
    left = _prep(points, id_col, x, y, "l")
    right = _prep(points, id_col, x, y, "r")
    cand = (
        left.crossJoin(right)
        .where(F.col("src") != F.col("dst"))
        .withColumn("dist2", dist2_expr("sx", "sy", "tx", "ty"))
    )
    return _topk(cand, k).select("src", "nbr_rank", "dst")
