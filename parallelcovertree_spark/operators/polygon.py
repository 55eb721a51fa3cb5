"""Point-in-polygon joins and raster↔vector tile assignment (north rule ops).

Polygons are deterministic convex hexagons (center from the SQL-parity
geocoder, rational vertex offsets) so every predicate is plain IEEE arithmetic
reproducible in DuckDB oracles. PIP for a convex polygon = AND of half-plane
sign tests over the (ccw) edge list — pure Catalyst expressions, no UDF.

Physical plans:
- ``point_in_polygon_join``: polygon set is small by nature → **broadcast**
  join with a bbox prune ahead of the exact sign tests (the prune is
  conservative: a point outside the bbox is provably outside the hexagon, so
  results are exact).
- ``raster_vector_join``: the same query through the **raster path** — polygons
  rasterized to covering cells (vector→raster), points bucketed to cells
  (raster side of tile_assignment), cell equi-join prefilter, exact verify.
  Same output rows, different physical strategy: this is the plan that scales
  when the polygon set is NOT broadcastable.
- ``polygon_tile_cover``: vector→raster assignment itself (poly_id, cell_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.cells import cell_id

# regular hexagon, counter-clockwise, rational-ish literals (exact doubles)
HEX = [(1.0, 0.0), (0.5, 0.866025), (-0.5, 0.866025),
       (-1.0, 0.0), (-0.5, -0.866025), (0.5, -0.866025)]


def polygons_from_ids(ids_df: DataFrame, id_col: str, cx_sql: str, cy_sql: str) -> DataFrame:
    """(poly_id, cx, cy, rp) — deterministic hexagon parameters per id."""
    return ids_df.select(
        F.col(id_col).alias("poly_id"),
        F.expr(cx_sql).alias("cx"),
        F.expr(cy_sql).alias("cy"),
        (F.lit(1.0) + (F.col(id_col) % 4).cast("double") * F.lit(0.5)).alias("rp"),
    )


def _inside(px: Column, py: Column, cx: Column, cy: Column, rp: Column) -> Column:
    """AND of cross-product sign tests over the ccw hexagon edges."""
    cond = F.lit(True)
    for k in range(len(HEX)):
        ox1, oy1 = HEX[k]
        ox2, oy2 = HEX[(k + 1) % len(HEX)]
        x1, y1 = cx + rp * F.lit(ox1), cy + rp * F.lit(oy1)
        x2, y2 = cx + rp * F.lit(ox2), cy + rp * F.lit(oy2)
        cond = cond & ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= F.lit(0.0))
    return cond


def polygon_metrics(polys: DataFrame) -> DataFrame:
    """(poly_id, area, perimeter) — exact shoelace area and edge-length sum
    over the parametric hexagon vertices. Every value is one fixed
    left-associated IEEE expression tree over the same literals on both
    engines (sqrt is correctly rounded per IEEE-754, so it is
    parity-safe, unlike transcendentals); pure projection, no shuffle."""
    cx, cy, rp = F.col("cx"), F.col("cy"), F.col("rp")
    area = None
    perim = None
    for k in range(len(HEX)):
        ox1, oy1 = HEX[k]
        ox2, oy2 = HEX[(k + 1) % len(HEX)]
        x1, y1 = cx + rp * F.lit(ox1), cy + rp * F.lit(oy1)
        x2, y2 = cx + rp * F.lit(ox2), cy + rp * F.lit(oy2)
        cross = x1 * y2 - x2 * y1
        edge = F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
        area = cross if area is None else area + cross
        perim = edge if perim is None else perim + edge
    return polys.select(
        "poly_id",
        (F.lit(0.5) * F.abs(area)).alias("area"),
        perim.alias("perimeter"),
    )


def polygon_metrics_sql() -> str:
    """The identical projection as SQL text (DuckDB oracle), on columns
    poly_id, cx, cy, rp — term order and association mirror the Column
    build exactly."""
    crosses, edges = [], []
    for k in range(len(HEX)):
        ox1, oy1 = HEX[k]
        ox2, oy2 = HEX[(k + 1) % len(HEX)]
        x1 = f"(cx + rp * {ox1!r})"
        y1 = f"(cy + rp * {oy1!r})"
        x2 = f"(cx + rp * {ox2!r})"
        y2 = f"(cy + rp * {oy2!r})"
        crosses.append(f"({x1} * {y2} - {x2} * {y1})")
        edges.append(
            f"sqrt(({x2} - {x1}) * ({x2} - {x1}) + ({y2} - {y1}) * ({y2} - {y1}))"
        )
    return (
        f"SELECT poly_id, 0.5 * abs({' + '.join(crosses)}) AS area, "
        f"{' + '.join(edges)} AS perimeter"
    )


def inside_sql(px: str, py: str) -> str:
    """The identical predicate as SQL text (DuckDB oracle), on columns
    cx, cy, rp."""
    terms = []
    for k in range(len(HEX)):
        ox1, oy1 = HEX[k]
        ox2, oy2 = HEX[(k + 1) % len(HEX)]
        x1 = f"(cx + rp * {ox1!r})"
        y1 = f"(cy + rp * {oy1!r})"
        x2 = f"(cx + rp * {ox2!r})"
        y2 = f"(cy + rp * {oy2!r})"
        terms.append(
            f"(({x2} - {x1}) * (({py}) - {y1}) - ({y2} - {y1}) * (({px}) - {x1}) >= 0.0)"
        )
    return " AND ".join(terms)


def point_in_polygon_join(
    points: DataFrame, polys: DataFrame,
    id_col: str = "id", x: str = "x", y: str = "y",
) -> DataFrame:
    """(point_id, poly_id) via broadcast + bbox prune + exact sign tests."""
    px, py = F.col(x).cast("double"), F.col(y).cast("double")
    cx, cy, rp = F.col("cx"), F.col("cy"), F.col("rp")
    bbox = (px >= cx - rp) & (px <= cx + rp) & (py >= cy - rp) & (py <= cy + rp)
    return (
        points.join(F.broadcast(polys), bbox & _inside(px, py, cx, cy, rp))
        .select(F.col(id_col).alias("point_id"), "poly_id")
    )


def polygon_tile_cover(polys: DataFrame, res: float) -> DataFrame:
    """(poly_id, cell_id): cells whose tile intersects the polygon bbox —
    vector→raster assignment (sequence + explode, pure Catalyst)."""
    r = float(res)
    ix0 = F.floor((F.col("cx") - F.col("rp")) / F.lit(r)).cast("long")
    ix1 = F.floor((F.col("cx") + F.col("rp")) / F.lit(r)).cast("long")
    iy0 = F.floor((F.col("cy") - F.col("rp")) / F.lit(r)).cast("long")
    iy1 = F.floor((F.col("cy") + F.col("rp")) / F.lit(r)).cast("long")
    from parallelcovertree_spark.functions.cells import cell_id_from_ix

    return (
        polys.withColumn("ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("iy", F.explode(F.sequence(iy0, iy1)))
        .select("poly_id", cell_id_from_ix(F.col("ix"), F.col("iy")).alias("cell_id"))
    )


def zonal_stats(
    points: DataFrame,
    polys: DataFrame,
    res: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    value_col: str = "v",
) -> DataFrame:
    """(poly_id, n_points, sum_v, min_v, max_v, mean_v): per-polygon
    aggregates of a point-attached BIGINT measure — the classic raster
    ZONAL STATISTICS operator (GDAL/PostGIS ``zonal_stats``), here fed by
    the scalable raster↔vector path: polygon tile cover ⋈ point tiles on
    the cell key, exact sign-test verify, then a poly-keyed aggregate.

    The measure rides WITH the point into the join (no second corpus
    join); integer sums are exact/associative and ``mean_v`` is one IEEE
    division — the registry parity discipline.
    """
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
        F.col(value_col).cast("long").alias("v"),
        cell_id(x, y, res).alias("cell_id"),
    )
    cover = polygon_tile_cover(polys, res).join(polys, "poly_id")
    hits = pts.join(cover, "cell_id").where(
        _inside(F.col("px"), F.col("py"), F.col("cx"), F.col("cy"), F.col("rp"))
    )
    agg = hits.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    return agg.select(
        "poly_id",
        "n_points",
        "sum_v",
        "min_v",
        "max_v",
        (F.col("sum_v").cast("double") / F.col("n_points").cast("double")).alias(
            "mean_v"
        ),
    )


def fence_dwell(
    events: DataFrame,
    polys: DataFrame,
    id_col: str = "user_id",
    us_col: str = "us",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(user_id, poly_id, n_events, first_us, last_us, dwell_us): per-user
    per-fence visit summary — how many events inside each fence polygon and
    the epoch-microsecond span between the first and last (the dwell-time
    analytic behind delivery-zone / POI-catchment reporting).

    ``us_col`` is a BIGINT epoch-microseconds column the CALLER derives
    (the registry's NTZ discipline keeps timezone handling at one place);
    all outputs are exact BIGINTs — min/max/diff need no quantization.

    Plan: broadcast fence set + bbox prune + exact sign tests (the
    ``point_in_polygon_join`` physical strategy, inlined so user/time ride
    through the join), then one (user, poly)-keyed aggregate.
    """
    px, py = F.col(x).cast("double"), F.col(y).cast("double")
    cx, cy, rp = F.col("cx"), F.col("cy"), F.col("rp")
    bbox = (px >= cx - rp) & (px <= cx + rp) & (py >= cy - rp) & (py <= cy + rp)
    hits = events.join(F.broadcast(polys), bbox & _inside(px, py, cx, cy, rp))
    agg = hits.groupBy(id_col, "poly_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.col(us_col).cast("long")).alias("first_us"),
        F.max(F.col(us_col).cast("long")).alias("last_us"),
    )
    return agg.select(
        F.col(id_col),
        "poly_id",
        "n_events",
        "first_us",
        "last_us",
        (F.col("last_us") - F.col("first_us")).alias("dwell_us"),
    )


def raster_vector_join(
    points: DataFrame, polys: DataFrame, res: float,
    id_col: str = "id", x: str = "x", y: str = "y",
) -> DataFrame:
    """Same rows as ``point_in_polygon_join``, through the raster path:
    cell equi-join between rasterized polygons and bucketed points, then the
    exact predicate. Scales to non-broadcastable polygon sets (one shuffle on
    the cell key, AQE-skew-splittable)."""
    cover = polygon_tile_cover(polys, res).join(polys, "poly_id")
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
        cell_id(x, y, res).alias("cell_id"),
    )
    px, py = F.col("px"), F.col("py")
    return (
        pts.join(cover, "cell_id")
        .where(_inside(px, py, F.col("cx"), F.col("cy"), F.col("rp")))
        .select("point_id", "poly_id")
    )
