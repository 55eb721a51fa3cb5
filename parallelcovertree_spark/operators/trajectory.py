"""Per-entity trajectory statistics over a timestamped event stream.

Movement analytics over geotagged events — the "how far did each user
travel, in how many hops, and how far did they net out from start to end"
query a geospatial event pipeline answers after tiling. Steps are the
euclidean hops between a user's consecutive events in (ts, event_id) order.

Scale shape: ONE shuffle — the window partitionBy(user) — computes lag
coordinates, per-step distances, and first/last positions in a single pass;
the terminal groupBy(user) reuses the same hash partitioning (Catalyst
reuses the exchange), so point volume crosses the wire once.

Cross-engine parity: float SUMs are order-dependent, so per-step distances
are quantized to integer micro-units (floor(d·10⁶) of a correctly-rounded
sqrt of a fixed double expression) BEFORE summing — BIGINT sums are exact
and associative, making the totals engine- and partition-count-independent.
The same discipline the polygon metrics use for IEEE-tree stability.

Reference parity note: the reference is point-set-only (no timestamps);
this is north-rule surface (BASELINE.json — event analytics over the
geotagged web corpus). Distances use the same double-precision euclidean
math as the ε-join kernel (functions/geo.py, ref src/Point.cpp:28-36).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "trajectory_stats",
    "TRAJECTORY_ORACLE_SQL_TEMPLATE",
    "od_flows",
    "OD_FLOWS_ORACLE_SQL_TEMPLATE",
    "stay_points",
    "STAY_POINTS_ORACLE_SQL_TEMPLATE",
]

_MICRO = 1_000_000.0


def _step_micro(dx: Column, dy: Column) -> Column:
    """floor(10⁶·sqrt(dx²+dy²)) as BIGINT — one fixed IEEE expression tree
    (two products, one add, correctly-rounded sqrt, one product, floor), so
    the quantized step is bit-identical on any engine given equal inputs."""
    return F.floor(F.sqrt(dx * dx + dy * dy) * F.lit(_MICRO)).cast("long")


def trajectory_stats(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(user_id, n_events, n_steps, path_micro, max_step_micro, net_micro).

    ``path_micro``     total path length in micro-units (sum of quantized
                       consecutive-hop distances),
    ``max_step_micro`` longest single hop,
    ``net_micro``      straight-line start→end displacement.

    Entities with one event emit zero steps and zero distances (not NULL) —
    same COALESCE on the oracle side.
    """
    w = Window.partitionBy(id_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    xs, ys = F.col(x).cast("double"), F.col(y).cast("double")
    stepped = events.select(
        id_col,
        ts_col,
        seq_col,
        xs.alias("_x"),
        ys.alias("_y"),
        (xs - F.lag(xs).over(w)).alias("_dx"),
        (ys - F.lag(ys).over(w)).alias("_dy"),
        F.first(xs).over(w).alias("_fx"),
        F.first(ys).over(w).alias("_fy"),
    )
    step = F.when(
        F.col("_dx").isNotNull(), _step_micro(F.col("_dx"), F.col("_dy"))
    )
    # last event's row carries the full-window first_value → net displacement
    # is computable per-row; the max_by below picks the last row's value.
    net = _step_micro(F.col("_x") - F.col("_fx"), F.col("_y") - F.col("_fy"))
    enriched = stepped.select(
        id_col,
        ts_col,
        seq_col,
        step.alias("_step"),
        net.alias("_net"),
    )
    # struct max = lexicographic (ts, event_id) max → the last row's value
    last_key = F.struct(F.col(ts_col), F.col(seq_col))
    return enriched.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("_step").alias("n_steps"),
        F.coalesce(F.sum("_step"), F.lit(0).cast("long")).alias("path_micro"),
        F.coalesce(F.max("_step"), F.lit(0).cast("long")).alias("max_step_micro"),
        F.max_by("_net", last_key).alias("net_micro"),
    )


def od_flows(
    events: DataFrame,
    res: float,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(from_cell, to_cell, n_trips, n_users): the ORIGIN-DESTINATION flow
    matrix over the tile grid — every consecutive event pair of a user is a
    trip from its previous tile to its current one (intra-tile hops
    included: they are the dwell diagonal of the OD matrix).

    The transport-planning / mobility-analytics staple, and the aggregate
    form of :func:`trajectory_stats`: same single user-keyed window shuffle
    to order events, then a (from, to)-keyed count. ``n_users`` is an exact
    COUNT(DISTINCT) — the two-phase expansion is bounded by the flow
    matrix × its distinct users, and popular corridors partially aggregate
    map-side.
    """
    from parallelcovertree_spark.functions.cells import cell_id

    w = Window.partitionBy(id_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    cells = events.select(
        id_col, ts_col, seq_col, cell_id(x, y, res).alias("to_cell")
    )
    hops = cells.select(
        id_col,
        F.lag("to_cell").over(w).alias("from_cell"),
        "to_cell",
    ).where(F.col("from_cell").isNotNull())
    return hops.groupBy("from_cell", "to_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct(id_col).alias("n_users"),
    )


def stay_points(
    events: DataFrame,
    radius: float,
    min_events: int = 2,
    id_col: str = "user_id",
    us_col: str = "us",
    seq_col: str = "event_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Stay-point detection (Li et al. 2008): maximal runs of a user's
    consecutive events (epoch-us + ``seq_col`` order) whose every hop is
    ≤ ``radius``; runs shorter than ``min_events`` are dropped. Output per
    stay: (user_id, seg, n_events, start_us, end_us, dwell_us, cx_micro,
    cy_micro) — ``seg`` the 0-based stay ordinal among the user's KEPT
    stays, centroid as exact micro-unit integer means (one division each).

    Parity: the break predicate is the exact double compare d² > r²; the
    segment id is a cumulative sum of integer break flags; everything
    aggregated is an exact BIGINT. Plan: ONE user-keyed window shuffle
    computes lag deltas AND the running break count (same window frame);
    the (user, seg) aggregate and the kept-ordinal window reuse the hash
    partitioning.
    """
    w = Window.partitionBy(id_col).orderBy(F.asc(us_col), F.asc(seq_col))
    xs, ys = F.col(x).cast("double"), F.col(y).cast("double")
    dx = xs - F.lag(xs).over(w)
    dy = ys - F.lag(ys).over(w)
    brk = F.when(
        dx.isNull() | (dx * dx + dy * dy > F.lit(float(radius) ** 2)), 1
    ).otherwise(0)
    seg0 = events.select(
        F.col(id_col),
        F.col(us_col).cast("long").alias("_us"),
        F.floor(xs * F.lit(_MICRO)).cast("long").alias("_xq"),
        F.floor(ys * F.lit(_MICRO)).cast("long").alias("_yq"),
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_seg"),
    )
    agg = seg0.groupBy(id_col, "_seg").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.sum("_xq").alias("_sx"),
        F.sum("_yq").alias("_sy"),
    )
    kept = agg.where(F.col("n_events") >= F.lit(int(min_events)))
    ord_w = Window.partitionBy(id_col).orderBy(F.asc("_seg"))
    return kept.select(
        F.col(id_col),
        (F.row_number().over(ord_w) - F.lit(1)).alias("seg"),
        "n_events",
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("dwell_us"),
        (F.col("_sx").cast("double") / F.col("n_events").cast("double")).alias(
            "cx_micro"
        ),
        (F.col("_sy").cast("double") / F.col("n_events").cast("double")).alias(
            "cy_micro"
        ),
    )


# {pts_cte}: CTE body yielding (user_id, us, event_id, x, y).
STAY_POINTS_ORACLE_SQL_TEMPLATE = """WITH ev AS ({pts_cte}),
s AS (
  SELECT user_id, us, event_id, x, y,
         CASE WHEN LAG(x) OVER w IS NULL
                OR (x - LAG(x) OVER w) * (x - LAG(x) OVER w)
                   + (y - LAG(y) OVER w) * (y - LAG(y) OVER w) > {r2}
              THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
g AS (
  SELECT user_id, us,
         CAST(FLOOR(x * 1000000.0) AS BIGINT) AS xq,
         CAST(FLOOR(y * 1000000.0) AS BIGINT) AS yq,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS seg
  FROM s
),
a AS (
  SELECT user_id, seg, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us,
         CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy
  FROM g GROUP BY 1, 2
),
k AS (SELECT * FROM a WHERE n_events >= {min_events})
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seg) - 1 AS BIGINT) AS seg,
       n_events, start_us, end_us,
       CAST(end_us - start_us AS BIGINT) AS dwell_us,
       CAST(sx AS DOUBLE) / CAST(n_events AS DOUBLE) AS cx_micro,
       CAST(sy AS DOUBLE) / CAST(n_events AS DOUBLE) AS cy_micro
FROM k"""


# {pts_cte}: CTE body yielding (user_id, ts, event_id, x, y);
# {cell_sql}: SQL expression over (x, y) producing the tile id.
OD_FLOWS_ORACLE_SQL_TEMPLATE = """WITH ev AS ({pts_cte}),
c AS (SELECT user_id, ts, event_id, {cell_sql} AS to_cell FROM ev),
h AS (
  SELECT user_id, to_cell,
         LAG(to_cell) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_cell
  FROM c
)
SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n_trips,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM h WHERE from_cell IS NOT NULL GROUP BY 1, 2"""


# {pts_cte}: CTE body yielding (user_id, ts, event_id, x, y).
TRAJECTORY_ORACLE_SQL_TEMPLATE = """WITH ev AS ({pts_cte}),
s AS (
  SELECT user_id, ts, event_id,
         x - LAG(x) OVER w AS dx,
         y - LAG(y) OVER w AS dy,
         x - FIRST_VALUE(x) OVER w AS nx,
         y - FIRST_VALUE(y) OVER w AS ny,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
q AS (
  SELECT user_id, rk,
         CASE WHEN dx IS NULL THEN NULL
              ELSE CAST(FLOOR(SQRT(dx * dx + dy * dy) * 1000000.0) AS BIGINT)
         END AS step,
         CAST(FLOOR(SQRT(nx * nx + ny * ny) * 1000000.0) AS BIGINT) AS net
  FROM s
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(step) AS BIGINT) AS n_steps,
       CAST(COALESCE(SUM(step), 0) AS BIGINT) AS path_micro,
       CAST(COALESCE(MAX(step), 0) AS BIGINT) AS max_step_micro,
       CAST(MAX(CASE WHEN rk = 1 THEN net END) AS BIGINT) AS net_micro
FROM q GROUP BY user_id"""
