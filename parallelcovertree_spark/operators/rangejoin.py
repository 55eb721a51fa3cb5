"""Interval (range) join — pairs within a time window, the 1-D temporal
analog of the spatial ε-join and the third of the classic missing-operator
trio (as-of join `operators/asof.py`, hypertable rollup
`registry.tile_pyramid`, range join here). Flink ships this as the
interval join; Spark's optimizer would execute the naive formulation as a
key-equi-join whose per-key group then cross-filters — quadratic in hot
keys. This plan is the grid trick in 1-D:

- bucket width W = (upper - lower), the window span;
- each LEFT row explodes to the (at most 2) buckets its shifted window
  ``[ts+lower, ts+upper]`` can touch;
- each RIGHT row sits in exactly ONE bucket — so the bucket equi-join
  emits every candidate pair EXACTLY once (no dedup pass), and the exact
  window predicate filters in whole-stage codegen.

Shuffle width is O(2·|L| + |R|) rows on (key, bucket) — hot keys spread
across time buckets instead of collapsing into one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """All (left, right) pairs with same ``key`` and
    ``left_ts + lower <= right_ts <= left_ts + upper`` (inclusive;
    ``lower < upper``, integer timestamps). Returns left columns + right
    columns (caller projects/aliases; names must not collide)."""
    assert upper > lower
    if left_ts == right_ts or {c for c in left.columns if c != key} & {
        c for c in right.columns if c != key
    }:
        raise ValueError(
            "interval_join: left/right column names must be disjoint apart "
            f"from the key (got left={left.columns}, right={right.columns}) "
            "— alias before joining"
        )
    w = int(upper - lower)
    lb = F.floor((F.col(left_ts) + F.lit(lower)).cast("double") / F.lit(float(w))).cast("long")
    ub = F.floor((F.col(left_ts) + F.lit(upper)).cast("double") / F.lit(float(w))).cast("long")
    lt = left.withColumn(
        "_bkt",
        F.explode(F.array_distinct(F.array(lb, ub))),
    )
    rt = right.withColumn(
        "_bkt",
        F.floor(F.col(right_ts).cast("double") / F.lit(float(w))).cast("long"),
    )
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
        & (F.col(right_ts) <= F.col(left_ts) + F.lit(upper))
    )
    return (
        lt.hint("shuffle_hash")
        .join(rt.hint("shuffle_hash"), [key, "_bkt"])
        .where(cond)
        .drop("_bkt")
    )
