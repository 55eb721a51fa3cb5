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


def session_concurrency(
    sessions,
    day_us: int = 86_400_000_000,
    start_col: str = "start_us",
    end_col: str = "end_us",
):
    """(day, n_sessions, max_concurrent): sweep-line maximum concurrency of
    [start_us, end_us] intervals per day bucket — the "peak simultaneous
    sessions" capacity analytic.

    Multi-day sessions are clipped into each day they overlap (explode
    bounded by span — minutes-scale sessions almost never span), so the
    sweep is embarrassingly parallel ACROSS days: within a day, +1/−1
    delta rows at start and end+1 (half-open), one day-partitioned window
    running sum ordered by (t, delta) — ends apply before starts at the
    same instant, so back-to-back sessions never double-count — and a
    day-keyed max. All integers; the oracle replays the identical window.
    """
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    d = int(day_us)
    s0 = F.col(start_col).cast("long")
    e0 = F.col(end_col).cast("long")
    days = sessions.select(
        s0.alias("_s"),
        e0.alias("_e"),
        F.explode(
            F.sequence(F.expr(f"CAST({start_col} AS BIGINT) DIV {d}"),
                       F.expr(f"CAST({end_col} AS BIGINT) DIV {d}"))
        ).alias("day"),
    )
    clip_s = F.greatest(F.col("_s"), F.col("day") * F.lit(d))
    clip_e = F.least(F.col("_e"), F.col("day") * F.lit(d) + F.lit(d - 1))
    clipped = days.select("day", clip_s.alias("cs"), clip_e.alias("ce"))
    deltas = clipped.select(
        "day", F.col("cs").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        clipped.select(
            "day", (F.col("ce") + F.lit(1)).alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    w = Window.partitionBy("day").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = deltas.select("day", "delta", F.sum("delta").over(w).alias("_run"))
    return run.groupBy("day").agg(
        (F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))).alias("n_sessions"),
        F.max("_run").alias("max_concurrent"),
    )


SESSION_CONCURRENCY_ORACLE_SQL_TEMPLATE = """WITH sess AS ({sessions_cte}),
days AS (
  SELECT start_us, end_us,
         unnest(range(start_us // {day_us}, end_us // {day_us} + 1)) AS day
  FROM sess
),
clipped AS (
  SELECT day,
         GREATEST(start_us, day * {day_us}) AS cs,
         LEAST(end_us, day * {day_us} + {day_us} - 1) AS ce
  FROM days
),
deltas AS (
  SELECT day, cs AS t, CAST(1 AS BIGINT) AS delta FROM clipped
  UNION ALL
  SELECT day, ce + 1 AS t, CAST(-1 AS BIGINT) AS delta FROM clipped
),
runs AS (
  SELECT day, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM deltas
)
SELECT day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(MAX(run) AS BIGINT) AS max_concurrent
FROM runs GROUP BY day"""
