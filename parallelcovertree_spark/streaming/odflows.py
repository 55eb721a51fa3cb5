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
from pyspark.sql.types import LongType, StructField, StructType

from parallelcovertree_spark.functions.cells import cell_id

__all__ = ["od_trip_stream"]

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
