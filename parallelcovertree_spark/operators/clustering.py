"""Density-based spatial clustering (DBSCAN) over the ε-graph.

The reference's cover tree / ε-graph exists to feed neighborhood-based
algorithms — its edge-list sink (``programs/epsilon_graph.cpp:113-168``)
emits exactly the "all pairs within r" graph DBSCAN consumes. This module
closes that loop: a fully distributed DBSCAN whose every stage is a bucketed
equi-join or a bounded-round fixpoint, no driver-side point data ever.

Deterministic DBSCAN variant (the one that can be replayed exactly by a SQL
oracle): classic DBSCAN leaves border-point assignment order-dependent (a
border point in reach of two clusters goes to whichever core expanded first).
Here a border point joins the cluster with the MINIMUM cluster id among its
core neighbors — a pure function of the input, so Spark and DuckDB agree
bit-for-bit. Core/noise sets and the clustering of core points are identical
to classic DBSCAN (those are order-independent by construction).

Physical plan, in ε-graph terms:
1. ε-graph via the flagship grid-cell equi-join (one shuffle, codegen,
   hot-cell salting available) — ``epsilon_self_join``.
2. degrees: one groupBy over the edge list (map-side partial counts).
3. core-core subgraph: two hash semi-joins against the core id set.
4. components: min-label propagation with pointer doubling — O(log d)
   rounds (``operators/dedup.connected_components``).
5. border assignment: one hash join (edge → core label) + min-aggregate.

At 10^12-row scale every shuffle key is either a grid cell (skew-salted) or
a point id (uniform); the only iterative state is (node, label) pairs over
CORE points, a small fraction of the corpus at sane (eps, min_pts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.dedup import connected_components
from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join

__all__ = ["dbscan", "dbscan_from_edges"]


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(id, cluster_id, role) for every input point.

    - role 'core'  : ≥ min_pts points within eps (self included, matching
      the reference's self-loop ε-graph semantics); cluster_id = minimum
      core id in its density-connected component.
    - role 'border': non-core with ≥1 core neighbor; cluster_id = minimum
      cluster id among its core neighbors (deterministic tie-break).
    - role 'noise' : neither; cluster_id = -1.
    """
    edges = epsilon_self_join(
        points, eps, id_col=id_col, x=x, y=y, include_self=True
    )
    return dbscan_from_edges(
        points.select(F.col(id_col).alias("id")), edges, min_pts
    ).withColumnRenamed("id", id_col)


def dbscan_from_edges(
    ids: DataFrame, edges: DataFrame, min_pts: int
) -> DataFrame:
    """DBSCAN given a prebuilt symmetric self-loop ε-graph (src, dst).

    Separated so callers holding a materialized ε-graph (the engine's
    flagship output, or one read back from an edge-list sink) can cluster
    it without recomputing the spatial join.
    """
    # The edge list feeds three consumers (degrees, core subgraph, border
    # join) — materialize once, lineage-truncated; ContextCleaner reclaims
    # it when the result goes out of scope.
    edges = edges.select("src", "dst").localCheckpoint(eager=False)

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_n"))
    core = deg.where(F.col("_n") >= int(min_pts)).select(
        F.col("src").alias("cid")
    )

    # Core-core subgraph, one direction only (components symmetrizes);
    # src == dst keeps isolated core points present in the label set.
    core_edges = (
        edges.where(F.col("src") <= F.col("dst"))
        .join(core.withColumnRenamed("cid", "src"), "src")
        .join(core.withColumnRenamed("cid", "dst"), "dst")
        .select("src", "dst")
    )
    labels = connected_components(core_edges, "src", "dst")

    # Border points: non-core endpoints seeing ≥1 core neighbor. Join the
    # edge list against core labels on the dst side, drop core srcs, take
    # the min label per src (the deterministic assignment rule).
    border = (
        edges.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        )
        .join(core.withColumnRenamed("cid", "src"), "src", "left_anti")
        .groupBy("src")
        .agg(F.min("label").alias("_blabel"))
    )

    core_lab = labels.select(F.col("node").alias("id"), F.col("label").alias("_clabel"))
    bord_lab = border.select(F.col("src").alias("id"), "_blabel")
    return (
        ids.join(core_lab, "id", "left")
        .join(bord_lab, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("_clabel"), F.col("_blabel"), F.lit(-1))
            .cast("bigint")
            .alias("cluster_id"),
            F.when(F.col("_clabel").isNotNull(), F.lit("core"))
            .when(F.col("_blabel").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
