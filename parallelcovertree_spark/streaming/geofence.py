"""Streaming geofence: point stream × polygon set → containment alerts.

The live form of the north rule's point-in-polygon join: as geotagged
documents/events stream in, each micro-batch is joined against the (small,
broadcast) fence-polygon set and rows landing inside any fence are emitted
as (point_id, poly_id) alerts — the standard geofencing pattern (entry
alerts for delivery zones, restricted regions, POI catchments).

The operator is STATELESS — containment of a point depends on that point
alone — so the exact batch operator (``operators/polygon.py::
point_in_polygon_join``: broadcast + bbox prune + convex sign tests, pure
Catalyst, no UDF) is applied to the stream unchanged, and stream == batch
holds by construction (pinned by tests, same discipline as
``streaming/cleaning`` / pii scrub-on-ingest).

At scale: the polygon set is broadcast per executor once per batch; if the
fence set outgrows broadcast, swap in ``raster_vector_join`` keyed on the
tile cell — also stateless, so the streaming contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.operators.polygon import point_in_polygon_join

__all__ = ["geofence_alerts"]


def geofence_alerts(docs: DataFrame, polys: DataFrame) -> DataFrame:
    """(point_id, poly_id) alert rows for stream-or-batch ``docs`` with a
    ``doc_id`` column (coordinates via the shared geocoder, as everywhere)
    against fence polygons (poly_id, cx, cy, rp)."""
    pts = docs.select(
        F.col("doc_id").alias("id"),
        geo.x_col("doc_id").alias("x"),
        geo.y_col("doc_id").alias("y"),
    )
    return point_in_polygon_join(pts, polys)
