"""Z-order layout (operators/zorder.py): Morton key == bit-interleave twin;
Column form == SQL template in both engines; z-ordered files have measured
2-D locality a hash layout lacks (query box touches few files)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.zorder import (
    z_value,
    z_value_sql,
    zorder_write,
)


def _morton_py(x: int, y: int) -> int:
    z = 0
    for b in range(32):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


CASES = [0, 1, 2, 3, 255, 256, 65535, 65536, (1 << 20) + 12345, (1 << 31) - 1]


def test_z_value_matches_bit_interleave_twin(spark):
    rows = [(x, y) for x in CASES for y in CASES]
    df = spark.createDataFrame(rows, "cx LONG, cy LONG")
    got = {
        (r["cx"], r["cy"]): r["z"]
        for r in df.select("cx", "cy", z_value(F.col("cx"), F.col("cy")).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def test_sql_template_parity_both_engines(spark):
    duckdb = pytest.importorskip("duckdb")
    expr = z_value_sql("cx", "cy")
    rows = [(x, y) for x in CASES for y in CASES]
    df = spark.createDataFrame(rows, "cx LONG, cy LONG")
    spark_vals = [
        r["z"] for r in df.selectExpr("cx", "cy", f"{expr} AS z")
        .orderBy("cx", "cy").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cx BIGINT, cy BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_vals = [
        v for (v,) in con.execute(
            f"SELECT {expr} AS z FROM t ORDER BY cx, cy"
        ).fetchall()
    ]
    assert spark_vals == duck_vals
    assert spark_vals == [_morton_py(x, y) for x, y in sorted(rows)]


def _files_per_box(spark, path, x0, x1, y0, y1):
    df = spark.read.parquet(path)
    hit = df.where(
        (F.col("cx").between(x0, x1)) & (F.col("cy").between(y0, y1))
    )
    return hit.select(F.input_file_name()).distinct().count()


def test_zorder_write_locality(spark, tmp_path):
    """64×64 grid of cells, 16 files: a small query box lives in few files
    under the Z layout and in ~all files under a hash layout — the pruning
    property OPTIMIZE ZORDER exists for."""
    n = 64
    pts = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "cx LONG, cy LONG"
    ).withColumn("z", z_value(F.col("cx"), F.col("cy")))

    zpath = str(tmp_path / "zord")
    hpath = str(tmp_path / "hash")
    zorder_write(pts, zpath, "z", n_files=16)
    pts.repartition(16, "cx", "cy").write.parquet(hpath)  # hash layout

    # an 8×8 query box = 1/64 of the domain
    z_files = _files_per_box(spark, zpath, 8, 15, 8, 15)
    h_files = _files_per_box(spark, hpath, 8, 15, 8, 15)
    assert z_files <= 4, z_files          # Morton box straddles ≤ a few ranges
    assert h_files >= 12, h_files         # hash spreads it over ~every file

    # per-file bounding boxes: z-layout files cover small, disjoint-ish
    # regions (mean bbox area well under the hash layout's near-full-domain)
    def mean_bbox_area(path):
        rows = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("cx") - F.min("cx") + 1).alias("w"),
                (F.max("cy") - F.min("cy") + 1).alias("h"),
            )
            .collect()
        )
        return float(np.mean([r["w"] * r["h"] for r in rows]))

    z_area, h_area = mean_bbox_area(zpath), mean_bbox_area(hpath)
    assert z_area <= h_area / 4, (z_area, h_area)


def test_zorder_key_range_is_sign_safe(spark):
    # 31-bit coords stay below the BIGINT sign bit
    df = spark.createDataFrame([((1 << 31) - 1, (1 << 31) - 1)], "cx LONG, cy LONG")
    (z,) = df.select(z_value(F.col("cx"), F.col("cy")).alias("z")).collect()[0]
    assert z > 0 and z == _morton_py((1 << 31) - 1, (1 << 31) - 1)


def test_compact_cluster_by_zorders_table_files(spark, tmp_path):
    """OPTIMIZE-ZORDER via table maintenance: compact(cluster_by=z_value)
    rewrites a hash-scattered snapshot into spatially local files; contents
    and history are unchanged."""
    from parallelcovertree_spark.sources.snapshots import SnapshotTable

    n = 32
    pts = spark.createDataFrame(
        [(x * n + y, "a" if x < n // 2 else "b", x, y)
         for x in range(n) for y in range(n)],
        "id LONG, part STRING, cx LONG, cy LONG",
    ).repartition(16, "id")  # hash-scattered input
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(pts, partition_by="part")

    sid = t.compact(
        spark, cluster_by=z_value(F.col("cx"), F.col("cy")), n_files=8
    )

    def mean_bbox(snap):
        rows = (
            t.read(spark, snap)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("cx") - F.min("cx") + 1).alias("w"),
                (F.max("cy") - F.min("cy") + 1).alias("h"),
            )
            .collect()
        )
        return float(np.mean([r["w"] * r["h"] for r in rows]))

    assert mean_bbox(sid) <= mean_bbox(1) / 3  # measured locality gain
    # contents identical, key column not persisted, history preserved
    assert sorted(r["id"] for r in t.read(spark, sid).collect()) == sorted(
        r["id"] for r in t.read(spark, 1).collect()
    )
    assert t.read(spark, sid).columns == ["id", "cx", "cy", "part"]
    assert [m["snapshot_id"] for m in t.history()] == [1, 2]
