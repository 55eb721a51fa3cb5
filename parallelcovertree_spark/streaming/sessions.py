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
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

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


# --- out-of-order tolerant variant (r4 'missing' #5) ---------------------------
#
# THE PATTERN (documented here for the other stateful ops — dedup, funnel,
# stay-points follow the same recipe):
#   1. declare a watermark on the event-time column (delay = the max lateness
#      the pipeline tolerates; Spark drops rows later than that — the
#      documented contract, not silent corruption);
#   2. buffer arriving events in per-key state instead of processing on
#      arrival;
#   3. on every invocation, events with ts <= current watermark are MATURE:
#      sort them by (event-time, id) and run the same automaton the in-order
#      operator runs — arrival order is now irrelevant below the watermark,
#      because any row older than the watermark can no longer arrive;
#   4. keep immature events in state and arm an EVENT-TIME TIMEOUT at the
#      earliest pending timestamp, so the key flushes when the watermark
#      passes it even if the user never sends another event.
#
# Cost: state carries only the ≤ delay-window tail per key (bounded by
# arrival rate × delay), and each event is buffered exactly once.

_OOO_STATE_SCHEMA = StructType([
    StructField("last_us", LongType()),
    StructField("sid", LongType()),
    StructField("open_cnt", LongType()),
    StructField("buf_us", ArrayType(LongType())),
    StructField("buf_eid", ArrayType(LongType())),
])


def _sessionize_group_ooo(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        last_us, sid, open_cnt, buf_us, buf_eid = state.get
        buf = list(zip(list(buf_us), list(buf_eid)))
        if last_us < 0:
            last_us = None
    else:
        last_us, sid, open_cnt, buf = None, 0, 0, []
    if not state.hasTimedOut:
        for pdf in pdfs:
            buf.extend(zip(pdf["us"].tolist(), pdf["event_id"].tolist()))

    mature = sorted(e for e in buf if e[0] <= wm_us)
    pending = [e for e in buf if e[0] > wm_us]

    out: dict[int, int] = {}
    for us, _eid in mature:
        if last_us is None or us - last_us > GAP_US:
            if sid > 0:
                out[sid] = open_cnt
            sid += 1
            open_cnt = 0
        open_cnt += 1
        last_us = us
    if mature:
        out[sid] = open_cnt  # current (still-open) session

    state.update((
        last_us if last_us is not None else -1,
        sid,
        open_cnt,
        [e[0] for e in pending],
        [e[1] for e in pending],
    ))
    if pending:
        # flush as soon as the watermark passes the earliest buffered event
        state.setTimeoutTimestamp(min(e[0] for e in pending) // 1000 + 1)

    uid = key[0]
    yield pd.DataFrame({
        "user_id": [uid] * len(out),
        "session_id": list(out.keys()),
        "n_events": list(out.values()),
    })


def sessionize_stream_ooo(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Out-of-order-tolerant sessionizer: identical output to
    :func:`sessionize_stream` / the batch twin for ANY arrival order in
    which no event is later than ``delay`` behind the stream's max event
    time (events later than that are dropped by the watermark — the
    explicit lateness contract). See the module-pattern comment above."""
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        "CAST(ts AS TIMESTAMP_NTZ))"
    )
    prepared = (
        events.select(
            "user_id", "event_id", us.cast("long").alias("us"),
        )
        # rebuild the tz-free instant for the watermark clock (same idiom as
        # jobs.windowed_event_counts)
        .withColumn("ts_wm", F.timestamp_micros(F.col("us")))
        .withWatermark("ts_wm", delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group_ooo,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_OOO_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
