"""Streaming stay-point segmentation: the stateful ingest twin of
``operators/trajectory.py::stay_points``.

State per user is the OPEN segment only — (start_us, last_us, last_x,
last_y, n, sum_xq, sum_yq, seg_ordinal): O(users · 64 B) regardless of
event volume. Each arriving event either extends the open segment (hop ≤
radius) or closes it; a closed segment with ≥ ``min_events`` events is
emitted exactly once, in the micro-batch whose event closed it, carrying
the same exact micro-unit centroid sums as the batch operator.

Batch parity: with in-order arrival per user, the drained stream equals
``stay_points(...)`` MINUS each user's final (still-open) segment — the
unavoidable streaming residue: a stay is only known complete when the
user moves away. Pinned by tests including segments spanning micro-batch
boundaries. ``seg`` numbers kept stays in emission order, matching the
batch op's kept-ordinal numbering for the emitted prefix.
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
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["stay_point_stream", "stay_point_stream_ooo"]

_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("seg", LongType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("dwell_us", LongType()),
    StructField("cx_micro", DoubleType()),
    StructField("cy_micro", DoubleType()),
])
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("last_x", DoubleType()),
    StructField("last_y", DoubleType()),
    StructField("n", LongType()),
    StructField("sum_xq", LongType()),
    StructField("sum_yq", LongType()),
    StructField("next_seg", LongType()),
])


def _make_group_fn(radius: float, min_events: int):
    r2 = float(radius) ** 2

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"], kind="mergesort"
        )
        if state.exists:
            start_us, last_us, last_x, last_y, n, sxq, syq, next_seg = state.get
            open_seg = True
        else:
            start_us = last_us = 0
            last_x = last_y = 0.0
            n = sxq = syq = 0
            next_seg = 0
            open_seg = False
        out = []
        for us, x, y in zip(
            rows["us"].to_numpy(), rows["x"].to_numpy(), rows["y"].to_numpy()
        ):
            us = int(us)
            xq = int(np.floor(x * 1e6))
            yq = int(np.floor(y * 1e6))
            brk = (not open_seg) or (
                (x - last_x) ** 2 + (y - last_y) ** 2 > r2
            )
            if brk:
                if open_seg and n >= min_events:
                    out.append(
                        (key[0], next_seg, n, start_us, last_us,
                         last_us - start_us, sxq / n, syq / n)
                    )
                    next_seg += 1
                start_us, n, sxq, syq = us, 0, 0, 0
                open_seg = True
            last_us, last_x, last_y = us, float(x), float(y)
            n += 1
            sxq += xq
            syq += yq
        state.update(
            (start_us, last_us, float(last_x), float(last_y), n, sxq, syq,
             next_seg)
        )
        yield pd.DataFrame(
            out,
            columns=[f.name for f in _OUT_SCHEMA.fields],
        )

    return fn


def stay_point_stream(
    events: DataFrame, radius: float, min_events: int = 2
) -> DataFrame:
    """events stream (user_id, us, event_id, x, y) → one row per CLOSED
    stay (custom stateful operator)."""
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("us").cast("long").alias("us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_group_fn(radius, min_events),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- out-of-order tolerant variant ------------------------------------------
#
# Second concrete instance of the buffer-below-watermark pattern documented in
# ``streaming/sessions.py`` (the first was ``sessionize_stream_ooo``): arriving
# events are buffered in per-key state; only events at or below the current
# watermark are MATURE — they are sorted by (event time, id) and run through
# the SAME segmentation automaton as the in-order operator, so arrival order
# stops mattering for any lateness within ``delay``. An event-time timeout at
# the earliest pending timestamp flushes keys that go quiet. State adds only
# the ≤ delay-window tail of events per key on top of the open segment.

_OOO_STATE_SCHEMA = StructType(
    _STATE_SCHEMA.fields
    + [
        StructField("open_flag", LongType()),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_eid", ArrayType(LongType())),
        StructField("buf_x", ArrayType(DoubleType())),
        StructField("buf_y", ArrayType(DoubleType())),
    ]
)


def _make_group_fn_ooo(radius: float, min_events: int):
    r2 = float(radius) ** 2

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            (start_us, last_us, last_x, last_y, n, sxq, syq, next_seg,
             open_flag, buf_us, buf_eid, buf_x, buf_y) = state.get
            buf = list(zip(list(buf_us), list(buf_eid), list(buf_x), list(buf_y)))
            open_seg = bool(open_flag)
        else:
            start_us = last_us = 0
            last_x = last_y = 0.0
            n = sxq = syq = 0
            next_seg = 0
            open_seg = False
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(
                    zip(pdf["us"].tolist(), pdf["event_id"].tolist(),
                        pdf["x"].tolist(), pdf["y"].tolist())
                )

        mature = sorted(e for e in buf if e[0] <= wm_us)
        pending = [e for e in buf if e[0] > wm_us]

        out = []
        for us, _eid, x, y in mature:
            us = int(us)
            xq = int(np.floor(x * 1e6))
            yq = int(np.floor(y * 1e6))
            brk = (not open_seg) or (
                (x - last_x) ** 2 + (y - last_y) ** 2 > r2
            )
            if brk:
                if open_seg and n >= min_events:
                    out.append(
                        (key[0], next_seg, n, start_us, last_us,
                         last_us - start_us, sxq / n, syq / n)
                    )
                    next_seg += 1
                start_us, n, sxq, syq = us, 0, 0, 0
                open_seg = True
            last_us, last_x, last_y = us, float(x), float(y)
            n += 1
            sxq += xq
            syq += yq

        state.update(
            (start_us, last_us, float(last_x), float(last_y), n, sxq, syq,
             next_seg, 1 if open_seg else 0,
             [int(e[0]) for e in pending], [int(e[1]) for e in pending],
             [float(e[2]) for e in pending], [float(e[3]) for e in pending])
        )
        if pending:
            # flush as soon as the watermark passes the earliest buffered event
            state.setTimeoutTimestamp(min(e[0] for e in pending) // 1000 + 1)
        yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return fn


def stay_point_stream_ooo(
    events: DataFrame,
    radius: float,
    min_events: int = 2,
    delay: str = "30 minutes",
) -> DataFrame:
    """Out-of-order-tolerant :func:`stay_point_stream`: identical closed-stay
    output for ANY arrival order in which no event lags the stream's max
    event time by more than ``delay`` (later rows are dropped by the
    watermark — the explicit lateness contract)."""
    prepared = (
        events.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("us").cast("long").alias("us"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        )
        .withColumn("ts_wm", F.timestamp_micros(F.col("us")))
        .withWatermark("ts_wm", delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_group_fn_ooo(radius, min_events),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_OOO_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
