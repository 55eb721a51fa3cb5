"""Edge-list sinks in the reference's golden format (SURVEY S6/S7).

Format (programs/build_graph.cpp:134-154, snn_test.py:42-50): header line
``"{n_verts} {n_edges}"``, then one ``"{u+1} {v+1}"`` line per edge —
**1-indexed**, per-source ascending dst, self-loops included.

Two writers:
- ``write_graph_file``: byte-exact single file (verify scale — the golden-file
  contract; ordered toLocalIterator streams without materializing on driver).
- ``write_graph_dir``: the scale path — Spark parallel text write, one part
  per partition, range-partitioned by src so a cat of sorted parts reproduces
  the golden body (the reference's MPI_Exscan + collective-write analog,
  programs/dist_build_graph.cpp:155-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_graph_file(edges: DataFrame, path: str, n_verts: int) -> int:
    """Golden single-file sink. Returns n_edges."""
    n_edges = edges.count()
    it = (
        edges.select(
            (F.col("src") + 1).cast("long").alias("u"),
            (F.col("dst") + 1).cast("long").alias("v"),
        )
        .orderBy("u", "v")
        .toLocalIterator()
    )
    with open(path, "w") as f:
        f.write(f"{n_verts} {n_edges}\n")
        for row in it:
            f.write(f"{row.u} {row.v}\n")
    return n_edges


def write_graph_dir(edges: DataFrame, path: str, partitions: int = 0) -> None:
    """Parallel golden-body sink: lexically-ordered part files, globally
    sorted rows (repartitionByRange keeps ranges disjoint and ordered)."""
    src_sorted = edges.select((F.col("src") + 1).alias("u"), (F.col("dst") + 1).alias("v"))
    if partitions:
        src_sorted = src_sorted.repartitionByRange(partitions, "u", "v")
    (
        src_sorted.sortWithinPartitions("u", "v")
        .select(F.format_string("%d %d", F.col("u"), F.col("v")).alias("value"))
        .write.mode("overwrite").text(path)
    )


def read_graph_file(path: str) -> tuple[int, set[tuple[int, int]]]:
    """Golden-file reader (test utility): returns (n_verts, 0-indexed edges)."""
    with open(path) as f:
        header = f.readline().split()
        n_verts = int(header[0])
        edges = set()
        for line in f:
            u, v = line.split()
            edges.add((int(u) - 1, int(v) - 1))
    return n_verts, edges
