"""ε-radius spatial joins via grid-cell equi-joins (SURVEY.md J1/O1).

The reference answers "all pairs within distance r" by per-point cover-tree
traversal with triangle-inequality pruning
(``/root/reference/src/CoverTree.cpp:356-384``, brute-force definition
``programs/epsilon_graph.cpp:113-118``). The idiomatic Spark physical plan is
different: bucket points into grid cells of side r, equi-join each point's
cell against the 1-ring (9 cells) of candidates, then apply the exact distance
predicate. Catalyst gets an equi-join it can hash-partition; the ring
expansion IS the pruning (a candidate outside the ring is provably farther
than r). AQE skew-join plus optional explicit salting handles hot cells
(web data clusters; the reference's analog is its LPT hub placement,
``src/DistCoverTree.cpp:726-758``).

Semantics pinned to the reference oracle: self-loops included (d(u,u)=0 ≤ r),
every ordered pair (u,v) with d ≤ r appears exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.cells import explode_k_ring, with_cell
from parallelcovertree_spark.functions.geo import dist2_expr


def epsilon_self_join(
    points: DataFrame,
    radius: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    include_self: bool = True,
    salt: int = 0,
    emit_dist2: bool = False,
) -> DataFrame:
    """All ordered pairs (src, dst) with euclidean distance ≤ radius.

    Physical plan: right side exploded to its 9-cell ring (map-side, no
    shuffle), hash equi-join on BIGINT cell id, exact d² ≤ r² filter inside
    the join. One shuffle total; whole-stage codegen end to end (no UDFs).

    ``salt`` > 0 additionally splits every cell into ``salt`` sub-keys
    (deterministic, id-derived) — use when a few cells dominate
    (hot-cell histogram via ``cell_load_histogram``).
    """
    res = float(radius)
    left = with_cell(
        points.select(
            F.col(id_col).alias("src"),
            F.col(x).cast("double").alias("sx"),
            F.col(y).cast("double").alias("sy"),
        ),
        res, x="sx", y="sy", out="_cell",
    )
    right = explode_k_ring(
        points.select(
            F.col(id_col).alias("dst"),
            F.col(x).cast("double").alias("tx"),
            F.col(y).cast("double").alias("ty"),
        ),
        res, k=1, x="tx", y="ty", out="_cell",
    )
    keys = ["_cell"]
    if salt > 0:
        left = left.withColumn("_salt", F.pmod(F.col("src"), F.lit(salt)))
        right = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        keys.append("_salt")
    # shuffle_hash: both sides are corpus-sized — hash-partition on the cell
    # key, build a per-partition hash table, no sort, never broadcast (the
    # Generate's size estimate is its child's, 9x under — auto-strategy picks
    # a driver-side broadcast of the exploded side and serializes)
    pairs = left.join(right.hint("shuffle_hash"), on=keys, how="inner")
    d2 = dist2_expr("sx", "sy", "tx", "ty")
    cond = d2 <= F.lit(res * res)
    if not include_self:
        cond = cond & (F.col("src") != F.col("dst"))
    out_cols = [F.col("src"), F.col("dst")]
    if emit_dist2:
        out_cols.append(d2.alias("dist2"))
    return pairs.where(cond).select(*out_cols)


def epsilon_join(
    left_points: DataFrame,
    right_points: DataFrame,
    radius: float,
    left_id: str = "id",
    right_id: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Two-table ε-join (queries × corpus): same grid plan as the self-join."""
    res = float(radius)
    left = with_cell(
        left_points.select(
            F.col(left_id).alias("src"),
            F.col(x).cast("double").alias("sx"),
            F.col(y).cast("double").alias("sy"),
        ),
        res, x="sx", y="sy", out="_cell",
    )
    right = explode_k_ring(
        right_points.select(
            F.col(right_id).alias("dst"),
            F.col(x).cast("double").alias("tx"),
            F.col(y).cast("double").alias("ty"),
        ),
        res, k=1, x="tx", y="ty", out="_cell",
    )
    d2 = dist2_expr("sx", "sy", "tx", "ty")
    return (
        left.join(right.hint("shuffle_hash"), "_cell")
        .where(d2 <= F.lit(res * res))
        .select("src", "dst")
    )


def epsilon_self_join_auto(
    points: DataFrame,
    radius: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    target_imbalance: float = 1.25,
    max_salt: int = 16,
) -> tuple[DataFrame, int]:
    """ε-join with measured skew handling: compute the reference's load
    imbalance metric over the cell histogram (nprocs·max/total ≤ 1.25 is the
    reference's global-phase cutoff, DistCoverTree.cpp:746-758 /
    dist_build_graph.cpp:29) and salt hot cells proportionally when it is
    exceeded. Returns (edges, chosen_salt)."""
    import math

    parts = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    imb = load_imbalance(points, float(radius), parts, x=x, y=y)
    salt = 0
    if imb > target_imbalance:
        salt = min(int(math.ceil(imb / target_imbalance)), max_salt)
    return epsilon_self_join(points, radius, id_col=id_col, x=x, y=y, salt=salt), salt


def cell_load_histogram(points: DataFrame, res: float, x: str = "x", y: str = "y") -> DataFrame:
    """Per-cell point counts + the reference's load-imbalance metric inputs
    (``nprocs * max / total``, /root/reference/src/DistCoverTree.cpp:746-748).
    Drives the salting decision for hot cells."""
    return (
        with_cell(points, res, x=x, y=y, out="cell_id")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def load_imbalance(points: DataFrame, res: float, partitions: int, x: str = "x", y: str = "y") -> float:
    """Skew metric: partitions * max_cell_load / total (ref semantics)."""
    row = (
        cell_load_histogram(points, res, x, y)
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .collect()[0]
    )
    return float(partitions) * float(row.mx) / float(row.tot) if row.tot else 0.0
