"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Workload = the BASELINE.json metric: spatial-join + kNN (k=10) throughput over
a Common-Crawl-shaped corpus. The sf docs table is deterministically expanded
(`BENCH_SCALE` replicas per doc, SQL-parity id arithmetic) so the join has
cluster-scale density; the query radius is density-matched to hold the average
degree constant (~DEG_TARGET), which is how the workload stays shape-invariant
as n grows — same discipline you'd use at 10^12 rows.

Extra keys beyond the driver contract: per-query row counts, docs/sec
throughput, n_docs.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from pyspark.sql import functions as F

from parallelcovertree_spark.functions import geo
from parallelcovertree_spark.operators.epsilon_join import epsilon_self_join
from parallelcovertree_spark.operators.knn import knn_join
from parallelcovertree_spark.session import get_spark

DEG_TARGET = 16.0  # target average epsilon-graph degree (incl. self-loop)


def build_points(spark, sf_dir: str, scale: int):
    """documents × scale replicas → (id, x, y) via the SQL-parity geocoder.
    Deterministic pure expansion (crossJoin with a range literal)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n_docs = docs.count()
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    pts = (
        docs.crossJoin(F.broadcast(reps))
        .select((F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("id"))
    )
    pts = pts.select("id", geo.x_col("id").alias("x"), geo.y_col("id").alias("y"))
    return pts, n_docs * scale


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = int(os.environ.get("BENCH_SCALE", "40"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="covergrid-bench",
        shuffle_partitions=max(cpus, 8),
    )

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        counts[name] = int(out)
        return out

    pts, n = build_points(spark, sf_dir, scale)
    pts = pts.repartition(max(cpus * 2, 16)).persist()
    pts.count()  # materialize input outside the timed region

    # density-matched radius: avg degree ≈ DEG_TARGET over the [-S,S]² square
    area = (2 * geo.SCALE) ** 2
    radius = math.sqrt(DEG_TARGET * area / (math.pi * n))

    timed("q_epsilon_join", lambda: epsilon_self_join(pts, radius).count())
    timed("q_knn10", lambda: knn_join(pts, k=10).count())

    # text-pipeline headline: minhash LSH dup pairs on the raw docs table
    from parallelcovertree_spark.registry import minhash_dup_pairs

    timed("q_minhash_dedup", lambda: minhash_dup_pairs(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    spatial_sec = timings["q_epsilon_join"] + timings["q_knn10"]
    out = {
        "metric": "spatial-join + kNN (k=10) throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n,
        "radius": round(radius, 6),
        "docs_per_sec": round(n / spatial_sec, 1) if spatial_sec > 0 else None,
        "rows": counts,
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
