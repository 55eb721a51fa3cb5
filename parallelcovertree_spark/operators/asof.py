"""As-of (point-in-time) join — a temporal operator Spark's DataFrame API
lacks natively, composed from union + window so Catalyst keeps the whole
plan JVM-side (SURVEY.md training-pipeline surface; DuckDB's native
``ASOF JOIN`` is the oracle).

Semantics (``direction="backward"``, the classic): for every left row,
attach the right row with the greatest ``right.ts <= left.ts`` within the
same key group — e.g. "the user's most recent click at or before each
purchase". Left rows with no prior right row keep NULL right payload
(ASOF LEFT JOIN).

Physical plan — ONE shuffle, no join node at all:

1. both sides are tagged and unioned (right payload NULL on left rows);
2. one window over ``(key)`` ordered by ``(ts, side)`` — right rows sort
   BEFORE left rows at equal ts, so ``<=`` matches; ``last(payload,
   ignorenulls=True)`` carries the latest right payload forward;
3. filter back to left rows.

This is strictly cheaper than the naive range join (left × right pairs
filtered to ts windows): the union is linear, the window is one
hash-partition + sort per key group, and nothing is ever replicated. At
100 TB the shuffle key is the join key (user/entity id) — the same
partitioning any per-entity temporal query needs.

Caller contract: right rows must be unique per (key, ts) — pre-aggregate
(e.g. ``max_by``) if not; ties across sides at equal ts resolve to "right
visible to left" (inclusive), matching DuckDB ``ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """left + latest-at-or-before right payload per key.

    ``left`` keeps all its columns; ``payload_cols`` (from ``right``) are
    appended, NULL where no right row precedes. ``left`` and ``right``
    must both carry ``key`` and ``ts``; ``right`` must be unique per
    (key, ts)."""
    lcols = [c for c in left.columns]
    reserved = {"_k", "_ts", "_side", "_r", "_m"}
    if reserved & set(lcols) or reserved & set(right.columns):
        raise ValueError(
            f"asof_join_backward: column names {sorted(reserved)} are "
            "reserved internally — rename before joining"
        )
    if set(payload_cols) & set(lcols):
        raise ValueError(
            "asof_join_backward: payload columns collide with left columns "
            f"({sorted(set(payload_cols) & set(lcols))}) — alias first"
        )
    # the right payload travels as ONE struct so every attached column comes
    # from the SAME matched right row (per-column last(ignorenulls) could
    # mix rows when right data itself holds NULLs)
    rstruct = F.struct(*[F.col(c) for c in payload_cols])
    null_rstruct = F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols
        ) + ">"
    )
    tagged_left = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        null_rstruct.alias("_r"),
    )
    tagged_right = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        rstruct.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_m")[c].alias(c) for c in payload_cols],
    )
