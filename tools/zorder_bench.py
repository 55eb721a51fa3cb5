"""Measure the Z-order layout payoff at bench scale: the same selective box
count over 1M points stored (a) Morton-clustered (b) hash-scattered, both
64 parquet files. The filter is on the raw tile coordinates (cx, cy) —
pushed to parquet row-group min/max stats, which only help when the layout
makes those columns locally coherent. Interleaved reps, medians, plus
files-touched counts (the structural number that scales: at 100 TB the
wall-clock gap IS the touched-bytes gap).

Writes the table once per layout under /tmp and prints one JSON line;
prose goes to BENCH/zorder_note.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parallelcovertree_spark.operators.zorder import z_value, zorder_write
from parallelcovertree_spark.session import get_spark

N = int(os.environ.get("ZBENCH_N", 1_000_000))
GRID = 1024          # cx, cy in [0, GRID)
FILES = 64
BOX = 64             # query box side → (64/1024)² = 0.4% of the domain
REPS = 7


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=int(cpus))
    base = "/tmp/covergrid-zbench"
    zpath, hpath = f"{base}/zord", f"{base}/hash"
    if not (os.path.isdir(zpath) and os.path.isdir(hpath)):
        shutil.rmtree(base, ignore_errors=True)
        # deterministic pseudo-random grid positions (LCG on the id)
        pts = (
            spark.range(N)
            .withColumn("cx", (F.col("id") * 1103515245 + 12345) % GRID)
            .withColumn("cy", (F.col("id") * 69069 + 1) % GRID)
            .withColumn("z", z_value(F.col("cx"), F.col("cy")))
        )
        zorder_write(pts, zpath, "z", n_files=FILES)
        pts.repartition(FILES, "id").write.parquet(hpath)

    def run(path: str) -> tuple[float, int, int]:
        df = spark.read.parquet(path)
        box = df.where(
            F.col("cx").between(256, 256 + BOX - 1)
            & F.col("cy").between(256, 256 + BOX - 1)
        )
        t0 = time.time()
        n = box.count()
        dt = time.time() - t0
        files = box.select(F.input_file_name()).distinct().count()
        return dt, n, files

    zt, ht = [], []
    zr = hr = None
    for _ in range(REPS):  # interleaved to share any host noise
        dt, n, zf = run(zpath); zt.append(dt); zr = (n, zf)
        dt, n, hf = run(hpath); ht.append(dt); hr = (n, hf)
    zt.sort(); ht.sort()
    out = {
        "n_points": N, "files": FILES, "box_frac": (BOX / GRID) ** 2,
        "rows_matched": zr[0], "rows_matched_hash": hr[0],
        "z_files_touched": zr[1], "hash_files_touched": hr[1],
        "z_median_s": round(zt[REPS // 2], 4),
        "hash_median_s": round(ht[REPS // 2], 4),
        "z_raw": [round(t, 4) for t in zt],
        "hash_raw": [round(t, 4) for t in ht],
        "cpus": int(cpus),
    }
    assert zr[0] == hr[0], "layouts disagree on the query answer"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
