"""Streaming exact dedup-on-ingest: stateful sha2 digest registry via
``applyInPandasWithState`` — the missing pipeline-realism piece between the
batch dedup surface (operators/dedup.py, registry.exact_dedup) and the
streaming ingest monitor (streaming/tiles.py).

Every arriving document is labeled exactly once, in its own micro-batch:
``(doc_id, keeper_id, is_dup)`` where ``keeper_id`` is the FIRST-SEEN
document with identical text (arrival order; within a micro-batch, doc_id
order). State per content digest is a single ``(keeper_id, n_seen)`` pair —
the streaming analog of ``exact_dedup``'s hash-groupBy: the shuffle key is
the 64-char sha2-256 hex digest computed JVM-side, never the document text,
so state size and shuffle width are O(distinct docs · 64 B) regardless of
document length (the same 100 TB argument as the batch op,
registry.py exact_dedup).

Batch parity: on a bounded input whose files arrive in ascending doc_id
order, first-seen == min doc_id, so the drained stream equals the batch twin
``registry.exact_dedup_labels`` (MIN(doc_id) OVER (PARTITION BY digest)) —
pinned by tests/test_streaming_dedup.py, including duplicates that span
micro-batches. Out-of-order arrival keeps semantics (first-seen wins) but
diverges from the min-id batch twin — same documented trade as
sessions.py's in-order requirement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

_OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("keeper_id", LongType()),
    StructField("is_dup", IntegerType()),
])
_STATE_SCHEMA = StructType([
    StructField("keeper_id", LongType()),
    StructField("n_seen", LongType()),
])


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        "doc_id", kind="mergesort"
    )
    ids = rows["doc_id"].to_numpy()
    if state.exists:
        keeper, n_seen = state.get
    else:
        keeper, n_seen = int(ids[0]), 0
    state.update((keeper, n_seen + len(ids)))
    yield pd.DataFrame({
        "doc_id": ids,
        "keeper_id": keeper,
        "is_dup": (ids != keeper).astype("int32"),
    })


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, text, ...) → one (doc_id, keeper_id, is_dup)
    row per arriving document (custom stateful operator)."""
    prepared = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.sha2(F.col("text"), 256).alias("digest"),
    )
    return prepared.groupBy("digest").applyInPandasWithState(
        _dedup_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
