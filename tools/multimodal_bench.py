"""Multimodal-kernel throughput at two parallelism levels (N / 4N proxy).

Pushes 10M synthetic binary payloads (media table generated in-executor —
no IO term) through the three Arrow-batched kernels — byte_features,
media_sniff, resize_nearest — at local[8] and local[32] on identical input,
reporting rows/sec at both plus the scaling efficiency. All three are
map-only plans (scan → mapInPandas, zero shuffles), so this measures the
Arrow boundary + numpy kernel itself: the shape of a 100 TB decode farm.

Usage: python tools/multimodal_bench.py [n_rows] [cpus ...]
       (defaults: 10_000_000 rows at 8 and 32 threads, median of 3)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

ONE_RUN = """
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from parallelcovertree_spark.operators import multimodal as mm

cpus, n = int(sys.argv[1]), int(sys.argv[2])
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "16g")
    .config("spark.default.parallelism", str(cpus))
    .appName("multimodal-bench")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# constant 64-way source split at every parallelism level, NO shuffle:
# the bench measures the Arrow+kernel map stage, not an exchange.
# Warm up python workers + codegen first (the spawn of 32 workers measured
# 2-4s and was being charged to whichever op ran first); then time each op
# on a FRESH plan (distinct seed) so nothing is replayed.
mm.byte_features(mm.synthetic_media(spark, 10_000, num_partitions=64)).agg(
    F.count("doc_id")
).collect()

media = mm.synthetic_media(spark, n, seed=101, num_partitions=64)
media2 = mm.synthetic_media(spark, n, seed=102, num_partitions=64)
pixels = mm.synthetic_pixels(
    spark.range(0, n, 1, 64).select(F.col("id").alias("doc_id"))
)

res = {}
for name, df in [
    ("byte_features", mm.byte_features(media).agg(F.sum("sum_bytes"))),
    ("media_sniff", mm.media_sniff(media2).agg(F.count("format"))),
    ("resize_nearest", mm.resize_nearest(pixels).agg(F.sum("sum_px"))),
]:
    t0 = time.time()
    df.collect()
    res[name] = round(time.time() - t0, 2)
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    import subprocess

    out = subprocess.run(
        [sys.executable, "-c", ONE_RUN, str(cpus), str(n)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed @ {cpus}:\n{out.stderr[-2000:]}")


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n = args[0] if args else 10_000_000
    points = args[1:] or [8, 32]
    reps = 3
    raws: dict[int, list[dict]] = {p: [] for p in points}
    for r in range(reps):  # interleaved sweeps: host noise hits every level
        for p in points:
            raws[p].append(run(p, n))
            print(f"rep {r} cpus {p}: {raws[p][-1]}", flush=True)
    med = {
        p: {k: statistics.median(x[k] for x in raws[p]) for k in raws[p][0]}
        for p in points
    }
    report = {
        "n_rows": n,
        "medians_sec": med,
        "rows_per_sec": {
            p: {k: round(n / v) for k, v in med[p].items()} for p in points
        },
    }
    if len(points) == 2:
        lo, hi = points
        report["efficiency"] = {
            k: round((med[lo][k] / med[hi][k]) / (hi / lo), 3) for k in med[lo]
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
