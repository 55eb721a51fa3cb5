"""Streaming near-duplicate detection on ingest: stateful MinHash LSH via
``applyInPandasWithState`` — the third custom stateful operator (after the
sessionizer and exact dedup-on-ingest), completing the ingest-side dedup
story: exact dups are caught by ``streaming/dedup.py``; ~near dups by this.

Pipeline per micro-batch:

1. stateless signature stage: the SAME engine-grade 128-perm numpy kernel
   as batch (``operators/dedup.py::minhash_signatures_np`` math —
   ``pd.util.hash_array`` token hashes, per-perm 1-D ``reduceat`` minima)
   inside ``mapInPandas``;
2. band explode: b rows per doc keyed ``(band, xxhash64(sig slice))``, each
   carrying the doc's FULL band-key array (JVM-side, same as batch);
3. stateful bucket join: ``groupBy(band, bk).applyInPandasWithState`` —
   state per bucket = the member list ``(doc_id, bks[b])``. A new arrival
   emits a candidate pair against every member, with the batch op's exact
   MIN-BAND-WINS rule (emit only if no earlier band key agrees), so a pair
   is emitted by exactly ONE bucket and the drained stream is
   distinct-by-construction — bit-parity with
   ``minhash_dup_pairs_np`` on bounded in-order input
   (tests/test_streaming_minhash.py).

Scale shape: state is O(corpus · b · 8 B) spread across ``(band, key)``
buckets — the same width as the batch plan's exploded band table, which is
the price of LSH either way; the shuffle key is a (int, long) pair, never
text. Output pairs are (src, dst) with src = earlier-arrived doc. Arrival
order within a micro-batch is doc_id order (sorted in-kernel); across
micro-batches it is file order — for id-ordered ingest the pair set equals
the batch op's exactly.
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
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from parallelcovertree_spark.operators.dedup import minhash_signatures_np

_OUT_SCHEMA = StructType([
    StructField("src", LongType()),
    StructField("dst", LongType()),
])
# state: member ids + their packed band-key arrays (one binary blob — the
# state store round-trips it untouched; numpy (de)serializes in C)
_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("keys", BinaryType()),
])


def _bucket_group(n_bands: int):
    def solve(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "doc_id", kind="mergesort"
        )
        band = int(key[0])
        new_ids = rows["doc_id"].to_numpy(np.int64)
        new_keys = np.stack(rows["bks"].to_numpy()).astype(np.int64)  # (m, b)
        if state.exists:
            old_ids_l, old_blob = state.get
            old_ids = np.array(old_ids_l, dtype=np.int64)
            old_keys = np.frombuffer(old_blob, dtype=np.int64).reshape(
                len(old_ids), n_bands
            )
        else:
            old_ids = np.empty(0, dtype=np.int64)
            old_keys = np.empty((0, n_bands), dtype=np.int64)

        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []

        def emit(cand_ids, cand_keys, nid, nkey):
            """pairs (existing member, new doc) surviving min-band-wins."""
            if not len(cand_ids):
                return
            ok = cand_ids != nid  # a re-ingested doc never pairs with itself
            for j in range(band):  # earlier bands must NOT match
                ok &= cand_keys[:, j] != nkey[j]
            if ok.any():
                srcs.append(cand_ids[ok])
                dsts.append(np.full(int(ok.sum()), nid, dtype=np.int64))

        # each new doc pairs vs prior state AND vs earlier new docs of this
        # batch (ascending doc_id = arrival order within the batch)
        for i in range(len(new_ids)):
            emit(old_ids, old_keys, new_ids[i], new_keys[i])
            emit(new_ids[:i], new_keys[:i], new_ids[i], new_keys[i])

        all_ids = np.concatenate([old_ids, new_ids])
        all_keys = np.concatenate([old_keys, new_keys])
        state.update((all_ids.tolist(), all_keys.tobytes()))
        if srcs:
            yield pd.DataFrame({
                "src": np.concatenate(srcs),
                "dst": np.concatenate(dsts),
            })

    return solve


def minhash_dup_stream(
    docs: DataFrame,
    n_perm: int = 128,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs stream → (src, dst) near-dup candidate pairs, each emitted
    exactly once (min-band-wins), src arrived before dst."""
    assert n_perm % bands == 0
    r = n_perm // bands
    sigs = minhash_signatures_np(docs, n_perm, id_col, text_col)
    bt = sigs.select(
        "doc_id",
        F.array(*[
            F.xxhash64(F.slice("sig", band * r + 1, r)) for band in range(bands)
        ]).alias("bks"),
    ).select("doc_id", "bks", F.posexplode("bks").alias("band", "bk"))
    return bt.groupBy("band", "bk").applyInPandasWithState(
        _bucket_group(bands),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
