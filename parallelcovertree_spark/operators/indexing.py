"""Scale-safe global row indexing (SURVEY W1 — the MPI_Exscan analog).

``ROW_NUMBER() OVER (ORDER BY ...)`` with no partition key funnels the whole
dataset through ONE task (Spark's global-sort window). This module is the
two-pass prefix-sum alternative — the same pattern the reference uses to
assign global point offsets (``/root/reference/src/DistCoverTree.cpp:27-31``
``MPI_Exscan``) and this repo already uses for file-offset ids
(``sources/fvecs.py``):

1. range-repartition on the order key + sort within partitions (one shuffle,
   all partitions in parallel);
2. count rows per partition (tiny collect: one long per partition);
3. broadcast the exclusive prefix sums and assign partition-local ranks.

Output is bit-identical to the global window (the order key must be unique,
e.g. include the primary key) at any parallelism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_index(
    df: DataFrame, order_by: list[str], out_col: str = "global_idx"
) -> DataFrame:
    """Append a 1-based dense global rank ordered by ``order_by`` (which must
    be a unique key) without a single-partition global sort."""
    spark = df.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # AQE platforms may set "auto"
        n_parts = int(df.rdd.getNumPartitions()) or int(
            spark.sparkContext.defaultParallelism
        )
    pid_col = "_pid"
    while pid_col in df.columns:  # never clobber a user column
        pid_col = "_" + pid_col
    parted = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(pid_col, F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partitioning+order for both passes
    )
    counts = {int(r[0]): int(r[1]) for r in
              parted.groupBy(pid_col).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    total = 0
    for pid in sorted(counts):  # range partitions are ordered by key range
        offsets[pid] = total
        total += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_fields = [f"{fld.name} {fld.dataType.simpleString()}"
                  for fld in df.schema.fields] + [f"{out_col} long"]
    schema = ", ".join(out_fields)

    def assign(batches):
        seen = 0
        off = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off is None:
                off = bc.value.get(int(pdf[pid_col].iloc[0]), 0)
            pdf = pdf.drop(columns=[pid_col])
            pdf[out_col] = off + 1 + seen + np.arange(len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(assign, schema)
