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
silently re-orders. ``funnel_stream_ooo`` below lifts the in-order
requirement via the buffer-below-watermark pattern (sessions.py recipe).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


# --- out-of-order tolerant variant ------------------------------------------
#
# Third instance of the buffer-below-watermark pattern (sessions, stay-points,
# now funnel — see streaming/sessions.py for the recipe). Funnel is the
# sharpest case for it: the strictly-after chain means a click arriving one
# micro-batch before its view is silently never counted by the in-order
# operator. Buffering fixes this with NO sort: watermark waves are already
# time-ordered between invocations (every newly-mature event has ts greater
# than every previously-mature one), and within a wave the vectorized
# chained-minima rule is order-free, so each wave runs the SAME update as
# the in-order operator over its mature slice.

_OOO_STATE_SCHEMA = StructType(
    _STATE_SCHEMA.fields
    + [
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_type", ArrayType(StringType())),
    ]
)


def _funnel_group_ooo(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        v, c, p, n_seen, buf_us, buf_t = state.get
        buf = list(zip(list(buf_us), list(buf_t)))
    else:
        v, c, p, n_seen, buf = _UNSET, _UNSET, _UNSET, 0, []
    if not state.hasTimedOut:
        for pdf in pdfs:
            buf.extend(zip(pdf["us"].tolist(), pdf["event_type"].tolist()))

    mature = [e for e in buf if e[0] <= wm_us]
    pending = [e for e in buf if e[0] > wm_us]

    if mature:
        us = np.asarray([e[0] for e in mature], dtype=np.int64)
        t = np.asarray([e[1] for e in mature], dtype=object)
        v = _min_where(us, t == "view", v)
        if v != _UNSET:
            c = _min_where(us, (t == "click") & (us > v), c)
        if c != _UNSET:
            p = _min_where(us, (t == "purchase") & (us > c), p)
        n_seen += len(mature)

    state.update((v, c, p, n_seen,
                  [int(e[0]) for e in pending], [e[1] for e in pending]))
    if pending:
        state.setTimeoutTimestamp(min(e[0] for e in pending) // 1000 + 1)
    if not mature:
        yield pd.DataFrame({f.name: [] for f in _OUT_SCHEMA.fields})
        return
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


def funnel_stream_ooo(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Out-of-order-tolerant :func:`funnel_stream`: identical final funnel
    rows for ANY arrival order within the ``delay`` lateness bound (later
    rows are dropped by the watermark — the explicit contract)."""
    prepared = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            "event_type",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
                "CAST(ts AS TIMESTAMP_NTZ))"
            ).cast("long").alias("us"),
        )
        .withColumn("ts_wm", F.timestamp_micros(F.col("us")))
        .withWatermark("ts_wm", delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_group_ooo,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_OOO_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


__all__ = ["funnel_stream", "funnel_stream_ooo"]
