"""Scale evidence for the spatial-statistics / mobility families: run the
engine sides at bench scale (1M points / 1M events on local[32]) and record
wall times → BENCH/spatialstats_note.md.

The oracle gates pin semantics at sf0.01; this script answers "do the PLANS
hold at 3 orders of magnitude more input" for the operators added in the
round-4 continuation. Points come from bench.py's deterministic document
expansion (same geocoder); events are replicated with per-replica user and
event id offsets so user cardinality scales with volume.

Usage: python tools/spatial_bench.py [scale] (default 200 → 1M points)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from parallelcovertree_spark.functions import geo  # noqa: E402
from parallelcovertree_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RES = 0.1          # 200×200 occupied tiles over the ±10 domain at 1M points
DAY_US = 86_400_000_000


def build_events(spark, sf_dir: str, scale: int):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    n_ev = ev.count()
    n_users = 15000  # > max user_id at any sf; keeps replica user-spaces disjoint
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    out = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("user_id") + F.col("rep") * F.lit(n_users)).alias("user_id"),
        "ts",
        (F.col("event_id") + F.col("rep") * F.lit(n_ev)).alias("event_id"),
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).alias("us"),
        geo.x_col("event_id").alias("x"),
        geo.y_col("event_id").alias("y"),
    ), n_ev * scale


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16))

    pts, n_pts = bench.build_points(spark, SF_DIR, scale)
    pts = pts.persist()
    pts.count()
    ev, n_ev = build_events(spark, SF_DIR, min(scale, 10))
    ev = ev.persist()
    ev.count()
    # density-matched radius: avg epsilon-degree ≈ DEG_TARGET (bench discipline)
    radius = (bench.DEG_TARGET * 400.0 / (3.141592653589793 * n_pts)) ** 0.5

    from parallelcovertree_spark.operators.graph import triangle_counts
    from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join
    from parallelcovertree_spark.operators.hotspot import (
        cell_daily_anomaly,
        st_hotspots,
    )
    from parallelcovertree_spark.operators.mobility import (
        colocation_pairs,
        home_cell,
        radius_of_gyration,
    )
    from parallelcovertree_spark.operators.spatialstats import (
        coverage_gaps,
        kde_cells,
        morans_i,
        ripley_k,
    )
    from parallelcovertree_spark.operators.trajectory import od_flows

    jobs = {
        "morans_i@1M": lambda: morans_i(pts, RES).collect(),
        "kde_cells@1M": lambda: kde_cells(pts, RES).count(),
        "coverage_gaps@1M": lambda: coverage_gaps(pts, RES).count(),
        f"ripley_k@1M(r≤{radius:.3f})": lambda: ripley_k(
            pts, [radius / 4, radius / 2, radius], id_col="id"
        ).collect(),
        f"triangles@1M(r={radius:.3f})": lambda: triangle_counts(
            epsilon_self_join(pts, radius, id_col="id", include_self=False)
        ).count(),
        "od_flows@1Mev": lambda: od_flows(ev, RES).count(),
        "home_cell@1Mev": lambda: home_cell(ev, RES).count(),
        "radius_gyration@1Mev": lambda: radius_of_gyration(ev).count(),
        "colocation@1Mev(day)": lambda: colocation_pairs(
            ev, RES, DAY_US
        ).count(),
        "st_hotspots@1Mev": lambda: st_hotspots(ev, RES, DAY_US).count(),
        "cell_anomaly@1Mev": lambda: cell_daily_anomaly(ev, RES, DAY_US).count(),
    }
    lines = [f"points={n_pts} events={n_ev} res={RES} cpus={cpus}"]
    for name, fn in jobs.items():
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        n = out if isinstance(out, int) else len(out)
        line = f"{name:28s} {dt:7.2f}s rows={n}"
        print(line, flush=True)
        lines.append(line)
    with open("BENCH/spatialstats_note_raw.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
