"""Scale measurement for hub_knn_highdim: exact 64-dim kNN at 100k vectors.

Two regimes over the same plan:

- **clustered** (the realistic one — real embedding corpora cluster):
  a mixture of well-separated gaussians. Hub pruning should route each
  query to a small fraction of hubs.
- **random** (the curse-of-dimensionality control): i.i.d. gaussian
  vectors. Distance concentration makes every triangle bound vacuous, so
  the plan degrades toward the all-pairs cost — reported honestly; no
  metric data structure (cover tree included) escapes this regime.

Brute force at this size is n² = 10¹⁰ candidate pairs; the clustered run's
`visits` count shows what the hub bound prunes. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.knn_highdim import hub_knn_highdim
from parallelcovertree_spark.session import get_spark

N = int(os.environ.get("KHD_N", 100_000))
DIM = 64
N_HUBS = int(os.environ.get("KHD_HUBS", 256))
K = 10
CLUSTERS = 256
REPS = 3


N_RANDOM = min(N, 20_000)  # the random control degrades to ~all-pairs by
# design (concentration kills every triangle bound) — cap it so the run ends


def make(spark, clustered: bool):
    """Deterministic synthetic embeddings via id arithmetic (no RNG on the
    driver; everything generated executor-side from the id column)."""
    df = spark.range(N if clustered else N_RANDOM).withColumnRenamed("id", "vec_id")
    # xorshift-ish per-(id, dim) pseudo-noise in [-1, 1), exact integers
    comps = []
    for d in range(DIM):
        h = F.xxhash64(F.col("vec_id") * DIM + d)
        noise = (F.pmod(h, F.lit(2_000_001)) - 1_000_000) / 1_000_000.0
        if clustered:
            c = F.pmod(F.col("vec_id"), F.lit(CLUSTERS))
            center = (F.pmod(F.xxhash64(c * DIM + d), F.lit(41)) - 20) * 2.0
            comps.append((center + noise * 0.05).cast("float"))
        else:
            comps.append(noise.cast("float"))
    return df.withColumn("embedding", F.array(*comps))


def run(spark, clustered: bool) -> dict:
    emb = make(spark, clustered).localCheckpoint()
    times = []
    stats: dict = {}
    rows = None
    for _ in range(REPS):
        t0 = time.time()
        rows = hub_knn_highdim(
            emb, k=K, n_hubs=N_HUBS, stats=stats if not times else None
        ).count()
        times.append(round(time.time() - t0, 2))
    times.sort()
    visits = stats.get("visits", 0)
    return {
        "regime": "clustered" if clustered else "random",
        "n": N if clustered else N_RANDOM,
        "rows": rows,
        "median_s": times[REPS // 2],
        "raw_s": times,
        "visits": visits,
        "visit_frac_of_no_pruning": round(
            visits / ((N if clustered else N_RANDOM) * (N_HUBS - 1)), 4
        ),
    }


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=int(cpus))
    out = {
        "dim": DIM, "k": K, "n_hubs": N_HUBS, "cpus": int(cpus),
        "runs": [run(spark, clustered=True), run(spark, clustered=False)],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
