"""Streaming conversion funnel: per-user view→click→purchase state machine
via ``applyInPandasWithState`` — the real-time twin of the batch
``conversion_funnel`` gate (registry), completing the analytics trio next to
the stateful sessionizer and dedup-on-ingest.

State per user is three epoch-micros minima ``(v_us, c_us, p_us)`` (-1 =
step unreached) updated with the batch op's exact rule: first view, first
click STRICTLY after it, first purchase strictly after that. Each
micro-batch a user appears in emits that user's current funnel row plus a
monotone ``n_seen`` counter, so a drained bounded stream resolves to one
final row per user (max ``n_seen``).

In-order contract (same documented trade as sessions.py / dedup.py): the
strictly-after rule is applied against state as events arrive, so a step
event arriving BEFORE its predecessor's batch (out-of-order across
micro-batches) is not retroactively counted — stream == batch holds for
time-ordered arrival, pinned by tests/test_streaming_funnel.py including
funnels spanning micro-batches. Within one micro-batch the update is exact
and vectorized (three conditional minima, no per-row Python).

Scale: state is 24 bytes per user; the shuffle key is user_id. The step
minima are order-independent GIVEN in-order arrival, so watermarking is not
required for correctness — late data diverges loudly (documented), never
silently re-orders.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("v_us", LongType()),
    StructField("c_us", LongType()),
    StructField("p_us", LongType()),
    StructField("reached", LongType()),
    StructField("n_seen", LongType()),
])
_STATE_SCHEMA = StructType([
    StructField("v_us", LongType()),
    StructField("c_us", LongType()),
    StructField("p_us", LongType()),
    StructField("n_seen", LongType()),
])

_UNSET = -1


def _min_where(us, mask, current: int) -> int:
    cand = us[mask]
    if not len(cand):
        return current
    m = int(cand.min())
    return m if current == _UNSET or m < current else current


def _funnel_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    us = rows["us"].to_numpy()
    t = rows["event_type"].to_numpy()
    v, c, p, n_seen = state.get if state.exists else (_UNSET, _UNSET, _UNSET, 0)
    v = _min_where(us, t == "view", v)
    if v != _UNSET:
        c = _min_where(us, (t == "click") & (us > v), c)
    if c != _UNSET:
        p = _min_where(us, (t == "purchase") & (us > c), p)
    n_seen += len(rows)
    state.update((v, c, p, n_seen))
    reached = (v != _UNSET) + (c != _UNSET) + (p != _UNSET)
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "v_us": [v],
            "c_us": [c],
            "p_us": [p],
            "reached": [reached],
            "n_seen": [n_seen],
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_type, ts) → one funnel-state row per
    (user, micro-batch-appearance); final row per user == the batch
    ``conversion_funnel`` on the same (time-ordered) bounded input."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).cast("long").alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["funnel_stream"]
