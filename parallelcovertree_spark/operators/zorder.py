"""Z-order (Morton space-filling-curve) clustered layout — the
Iceberg/Delta ``OPTIMIZE ZORDER BY`` analog for the engine's tiled tables.

Hash layout spreads a spatial query's rows across every file; Z-order
interleaves the tile coordinates' bits so points close in 2-D land close
in the 1-D sort key, and a range-partitioned, sorted write puts any small
query box into O(1) files whose parquet min/max stats prune the rest. At
100 TB this is the difference between "every ε-query touches every file"
and "touches the handful covering its k-ring" — the write-time shuffle is
paid once and amortized over every later spatial read, the same trade as
the bucketed-join evidence.

The bit math is pure BIGINT shifts/masks, expressed once as a SQL template
(``z_value_sql``) that runs identically in Spark and DuckDB (the gate's
oracle replays it exactly) and once as Catalyst Column ops (``z_value``)
pinned equal by test. Inputs are the grid's cell indices (``cells.py``
``ix + OFF`` convention keeps them non-negative); supported range is 31
bits per coordinate (interleaved result stays inside the BIGINT sign bit).

Reference tie-in: the reference orders output by point id
(``src/CoverTree.cpp`` edge emission); spatially-clustered layout is the
storage-side structure that replaces its in-memory locality once points
live in files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_spread_sql", "z_value_sql", "z_value", "zorder_write"]

# (shift, mask) chain spreading a 32-bit value's bits to even positions of
# a 64-bit word — the classic Morton magic numbers, decimal so the SAME
# literal parses in Spark SQL and DuckDB (Spark has no 0x literals).
_SPREAD_STEPS = [
    (16, 281470681808895),        # 0x0000FFFF0000FFFF
    (8, 71777214294589695),       # 0x00FF00FF00FF00FF
    (4, 1085102592571150095),     # 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323),     # 0x3333333333333333
    (1, 6148914691236517205),     # 0x5555555555555555
]


def z_spread_sql(e: str) -> str:
    """SQL expression spreading ``e``'s low 32 bits to even bit positions."""
    e = f"(CAST({e} AS BIGINT) & 4294967295)"
    for shift, mask in _SPREAD_STEPS:
        e = f"((({e} | ({e} << {shift})) & {mask}))"
    return e


def z_value_sql(x_expr: str, y_expr: str) -> str:
    """Shared Spark/DuckDB SQL for the Morton key of two cell indices."""
    return f"({z_spread_sql(x_expr)} | ({z_spread_sql(y_expr)} << 1))"


def _spread(c: Column) -> Column:
    c = c.cast("long").bitwiseAND(F.lit(4294967295))
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def z_value(ix: Column, iy: Column) -> Column:
    """Catalyst form of ``z_value_sql`` — whole-stage-codegen integer ops."""
    return _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))


def zorder_write(
    df: DataFrame, path: str, z_col: str, n_files: int,
) -> None:
    """Write ``df`` Z-order-clustered: range-partition on the Morton key
    (one shuffle — sampled range bounds, so file sizes track data density,
    the skew story for hot regions) and sort within each file so parquet
    row-group min/max stats prune inside files too."""
    (
        df.repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
        .write.mode("errorifexists")
        .parquet(path)
    )
