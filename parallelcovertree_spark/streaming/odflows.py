"""Streaming origin-destination trips: stateful per-user last-position
tracking via ``applyInPandasWithState`` — the live form of the batch OD
matrix (operators/trajectory.py::od_flows).

Each arriving event emits AT MOST one trip row ``(user_id, from_cell,
to_cell, us, event_id)`` — the hop from the user's previous tile (carried
in state across micro-batches) to the current one; a user's first-ever
event emits nothing. The OD matrix is then an ordinary downstream
aggregation of the trip stream (groupBy(from, to)), so the stateful part
holds exactly ONE (us, event_id, cell) triple per user — O(users · 24 B)
state, independent of event volume (the sessionizer's state discipline,
streaming/sessions.py).

Batch parity: with in-order arrival per user (micro-batch boundaries
anywhere), the drained trip stream aggregates to exactly
``od_flows(...)`` — pinned by tests including hops that SPAN micro-batch
boundaries. Out-of-order arrival keeps per-batch (us, event_id) ordering
but trips then reflect arrival order — same documented contract as
sessions.py / dedup.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from parallelcovertree_spark.functions.cells import cell_id

__all__ = ["od_trip_stream", "od_trip_stream_ooo"]

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("from_cell", LongType()),
    StructField("to_cell", LongType()),
    StructField("us", LongType()),
    StructField("event_id", LongType()),
])
_STATE_SCHEMA = StructType([
    StructField("last_us", LongType()),
    StructField("last_event_id", LongType()),
    StructField("last_cell", LongType()),
])


def _trips_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["us", "event_id"], kind="mergesort"
    )
    cells = rows["cell"].to_numpy()
    prev = cells[:-1]
    if state.exists:
        last_us, last_eid, last_cell = state.get
        from_cells = [last_cell, *prev]
        mask = [True] * len(cells)
    else:
        from_cells = [0, *prev]
        mask = [False] + [True] * (len(cells) - 1)
    out = pd.DataFrame({
        "user_id": key[0],
        "from_cell": pd.array(from_cells, dtype="int64"),
        "to_cell": cells,
        "us": rows["us"].to_numpy(),
        "event_id": rows["event_id"].to_numpy(),
    })[pd.Series(mask).to_numpy()]
    state.update(
        (
            int(rows["us"].iloc[-1]),
            int(rows["event_id"].iloc[-1]),
            int(cells[-1]),
        )
    )
    yield out


def od_trip_stream(events: DataFrame, res: float) -> DataFrame:
    """events stream (user_id, us, event_id, x, y) → one trip row per
    event after the user's first (custom stateful operator)."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("us").cast("long").alias("us"),
        F.col("event_id").cast("long").alias("event_id"),
        cell_id("x", "y", res).alias("cell"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _trips_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Fourth concrete instance of the buffer-below-watermark pattern documented in
# ``streaming/sessions.py`` (sessions, stay-points, funnel were 1-3): trips are
# hops between CONSECUTIVE positions in event time, so arrival order is load-
# bearing — a late position must splice INTO the hop sequence, not append. The
# buffered variant holds immature events in per-key state, sorts the mature
# prefix by (event time, id), and runs the same last-position automaton, so
# the drained trip stream equals the batch window-lag answer for any arrival
# order within ``delay``. State = one triple + the ≤ delay-window tail.

_OOO_STATE_SCHEMA = StructType([
    StructField("has_last", LongType()),
    StructField("last_us", LongType()),
    StructField("last_event_id", LongType()),
    StructField("last_cell", LongType()),
    StructField("buf_us", ArrayType(LongType())),
    StructField("buf_eid", ArrayType(LongType())),
    StructField("buf_cell", ArrayType(LongType())),
])


def _trips_group_ooo(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        has_last, last_us, last_eid, last_cell, buf_us, buf_eid, buf_cell = state.get
        buf = list(zip(list(buf_us), list(buf_eid), list(buf_cell)))
        has_last = bool(has_last)
    else:
        has_last = False
        last_us = last_eid = last_cell = 0
        buf = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            buf.extend(
                zip(pdf["us"].tolist(), pdf["event_id"].tolist(), pdf["cell"].tolist())
            )

    mature = sorted(e for e in buf if e[0] <= wm_us)
    pending = [e for e in buf if e[0] > wm_us]

    out = []
    for us, eid, cell in mature:
        if has_last:
            out.append((key[0], last_cell, int(cell), int(us), int(eid)))
        has_last = True
        last_us, last_eid, last_cell = int(us), int(eid), int(cell)

    state.update(
        (
            1 if has_last else 0,
            last_us,
            last_eid,
            last_cell,
            [int(e[0]) for e in pending],
            [int(e[1]) for e in pending],
            [int(e[2]) for e in pending],
        )
    )
    if pending:
        # flush as soon as the watermark passes the earliest buffered event
        state.setTimeoutTimestamp(min(e[0] for e in pending) // 1000 + 1)
    yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])


def od_trip_stream_ooo(
    events: DataFrame, res: float, delay: str = "30 minutes"
) -> DataFrame:
    """Out-of-order-tolerant :func:`od_trip_stream`: the drained trip stream
    equals the batch window-lag hop sequence for ANY arrival order in which
    no event lags the stream's max event time by more than ``delay`` (later
    rows are dropped by the watermark — the explicit lateness contract)."""
    prepared = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("us").cast("long").alias("us"),
            F.col("event_id").cast("long").alias("event_id"),
            cell_id("x", "y", res).alias("cell"),
        )
        .withColumn("ts_wm", F.timestamp_micros(F.col("us")))
        .withWatermark("ts_wm", delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _trips_group_ooo,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_OOO_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
