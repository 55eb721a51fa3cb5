"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (arbitrary per-key state across micro-batches).

Semantics match the batch twin (registry.events_sessionize): sessions split
on >``gap``-gaps in event time per user, session ids are 1-based in
(event-time, event-id) order. The stream emits UPDATE rows — the current
(user_id, session_id, n_events) for every session touched by the micro-batch
— and carries (last_us, current_sid, open_count) per user in state, so a
session spanning micro-batches keeps one id and an exact count.

On a bounded input drained with availableNow this emits exactly the batch
result, which is how the test pins equivalence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

GAP_US = 600_000_000  # 10 minutes, matches the batch twin

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("n_events", LongType()),
])
_STATE_SCHEMA = StructType([
    StructField("last_us", LongType()),
    StructField("sid", LongType()),
    StructField("open_cnt", LongType()),
])


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["us", "event_id"], kind="mergesort"
    )
    if state.exists:
        last_us, sid, open_cnt = state.get
    else:
        last_us, sid, open_cnt = None, 0, 0

    out: dict[int, int] = {}
    for us in rows["us"].tolist():
        if last_us is None or us - last_us > GAP_US:
            if sid > 0:
                out[sid] = open_cnt  # session closed by this gap
            sid += 1
            open_cnt = 0
        open_cnt += 1
        last_us = us
    out[sid] = open_cnt  # the (still-open) current session
    state.update((last_us, sid, open_cnt))
    uid = key[0]
    yield pd.DataFrame({
        "user_id": [uid] * len(out),
        "session_id": list(out.keys()),
        "n_events": list(out.values()),
    })


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user session updates (custom stateful operator).

    Ingest-order requirement: state assumes per-user event-time order ACROSS
    micro-batches (within a batch we sort). A late event (us < state.last_us)
    would move last_us backwards and split/merge sessions differently from
    the batch twin — stream==batch equivalence holds for in-order sources
    (the availableNow file-per-batch test setup, or any source partitioned so
    a user's events arrive time-ordered). Guarding with last_us = max(...)
    was considered and rejected: it silently mis-counts the late event into
    the wrong session; diverging loudly is easier to detect upstream.
    """
    # tz-free epoch micros from the NTZ column (a cast("timestamp") would be
    # session-tz-dependent; gaps are shift-invariant but parity with the
    # batch twin's us values keeps the state inspectable)
    prepared = events.select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).cast("long").alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
