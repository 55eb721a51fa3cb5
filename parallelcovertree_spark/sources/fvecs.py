"""Binary point-file IO in the reference's on-disk formats (SURVEY S1-S3, S10).

Two framings:
- **fvecs** (``Point::from_file``, /root/reference/src/Point.cpp:113-142 and the
  generic ``VectorIO.cpp``): repeated ``[int32 dim][float32 × dim]`` records;
  n inferred from file size.
- **snn** (``snn_test.py:9-13``): ``[int64 n][float32 × 2] × n``.

Parquet is the engine's canonical storage; these exist so datasets produced
for/by the reference binaries can be read bit-exactly (float32 storage
preserved). The Spark reader uses the ``binaryFile`` source + ``mapInPandas``
decode — point ids are positional (the reference's implicit id), derived from
the record offset so they are stable at any parallelism.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def write_fvecs(path: str, xy: np.ndarray) -> None:
    xy = np.ascontiguousarray(xy, dtype=np.float32)
    n, dim = xy.shape
    # per-record framing: [int32 dim][float32 × dim] (dim bits live in the
    # same 4-byte lattice as the floats — the fvecs convention)
    body = np.empty((n, 4 * (1 + dim)), dtype=np.uint8)
    body[:, :4] = np.full(n, dim, dtype=np.int32)[:, None].view(np.uint8)
    body[:, 4:] = xy.view(np.uint8).reshape(n, -1)
    with open(path, "wb") as f:
        f.write(body.tobytes())


def read_fvecs(path: str) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty((0, 0), dtype=np.float32)
    dim = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    rec_bytes = 4 * (1 + dim)
    assert len(raw) % rec_bytes == 0, "corrupt fvecs framing"
    recs = raw.reshape(-1, rec_bytes)
    return np.ascontiguousarray(recs[:, 4:]).view(np.float32).reshape(-1, dim)


def write_snn(path: str, xy: np.ndarray) -> None:
    xy = np.ascontiguousarray(xy, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(xy)))
        f.write(xy.tobytes())


def read_snn(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        (n,) = struct.unpack("<q", f.read(8))
        return np.frombuffer(f.read(n * 8), dtype=np.float32).reshape(n, 2)


def read_points_spark(spark: SparkSession, path: str, fmt: str = "fvecs") -> DataFrame:
    """Distributed scan → (id, x, y): binaryFile source + Arrow-batched decode.

    ids are global record positions (the reference's implicit positional id):
    per-file offsets come from a prefix sum of record counts in path order —
    computed from file LENGTHS alone (one metadata row per file on the
    driver, the MPI_Exscan analog, DistCoverTree.cpp:27-31) — so a directory
    of several fvecs/snn files yields unique, stable ids at any parallelism.
    """
    files = spark.read.format("binaryFile").load(path)
    meta = sorted(files.select("path", "length").collect(), key=lambda r: r.path)
    if not meta:
        return spark.createDataFrame([], "id long, x float, y float")
    if fmt == "fvecs":
        # dim from the first record of the first file (constant per dataset —
        # decode ASSERTS it per file). Only the 4 header bytes cross to the
        # driver (substring pushed into the scan), never the file content.
        from pyspark.sql import functions as F

        head = bytes(
            files.orderBy("path")
            .select(F.substring("content", 1, 4).alias("h"))
            .limit(1)
            .collect()[0]
            .h
        )
        dim = int(np.frombuffer(head, dtype=np.int32)[0])
        rec_bytes = 4 * (1 + dim)
        counts = [r.length // rec_bytes for r in meta]
    else:  # snn
        counts = [(r.length - 8) // 8 for r in meta]
    offsets: dict[str, int] = {}
    total = 0
    for r, n in zip(meta, counts):
        offsets[r.path] = total
        total += n
    bc = spark.sparkContext.broadcast(offsets)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = bc.value
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = np.frombuffer(content, dtype=np.uint8)
                if fmt == "fvecs":
                    fdim = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
                    if fdim != dim:
                        raise ValueError(
                            f"mixed-dim fvecs directory: {fpath} has dim={fdim}, "
                            f"expected {dim} (global ids assume one dim)"
                        )
                    recs = raw.reshape(-1, 4 * (1 + fdim))
                    xy = np.ascontiguousarray(recs[:, 4:]).view(np.float32).reshape(-1, fdim)
                else:  # snn
                    xy = np.frombuffer(raw[8:].tobytes(), dtype=np.float32).reshape(-1, 2)
                base = offs[fpath]
                yield pd.DataFrame({
                    "id": base + np.arange(len(xy), dtype=np.int64),
                    "x": xy[:, 0],
                    "y": xy[:, 1],
                })

    return files.select("path", "content").mapInPandas(decode, "id long, x float, y float")


def read_points_spark_split(
    spark: SparkSession,
    path: str,
    fmt: str = "fvecs",
    target_chunk_bytes: int = 64 << 20,
) -> DataFrame:
    """Splittable binary scan: one LARGE fvecs/snn file becomes many tasks.

    ``binaryFile`` hands a whole file to one task (the reference streams
    records instead — src/Point.cpp:113-142); here the driver plans
    record-aligned (path, offset, n_records) chunks from file LENGTHS only,
    distributes the plan with ``spark.range``-style parallelism, and each
    task reads just its byte range. Local/NFS paths; object stores would
    swap the ``open()`` for their range-read API. ids stay global record
    positions, identical to ``read_points_spark`` at any chunking.
    """
    import glob as _glob
    import os as _os

    paths = sorted(_glob.glob(_os.path.join(path, "*")) if _os.path.isdir(path) else [path])
    if not paths:
        return spark.createDataFrame([], "id long, x float, y float")

    chunks: list[tuple[str, int, int, int]] = []  # (path, byte_off, n_rec, id_off)
    gid = 0
    dim = 2
    for p in paths:
        size = _os.path.getsize(p)
        if fmt == "fvecs":
            with open(p, "rb") as f:
                fdim = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
            if p is paths[0]:
                dim = fdim
            assert fdim == dim, f"mixed fvecs dims in {path}: {fdim} != {dim}"
            rec = 4 * (1 + dim)
            head, n = 0, size // rec
        else:  # snn: 8-byte count header, 8-byte records
            rec, head = 8, 8
            n = (size - head) // rec
        per = max(target_chunk_bytes // rec, 1)
        for start in range(0, n, per):
            cnt = min(per, n - start)
            chunks.append((p, head + start * rec, cnt, gid + start))
        gid += n

    plan = spark.createDataFrame(
        chunks, "path string, byte_off long, n_rec long, id_off long"
    ).repartition(max(len(chunks), 1))
    fdim = dim if fmt == "fvecs" else 2
    rec_bytes = 4 * (1 + fdim) if fmt == "fvecs" else 8
    is_fvecs = fmt == "fvecs"

    def read_range(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, off, n, idoff in zip(
                pdf["path"], pdf["byte_off"], pdf["n_rec"], pdf["id_off"]
            ):
                with open(p, "rb") as f:
                    f.seek(int(off))
                    raw = np.frombuffer(f.read(int(n) * rec_bytes), dtype=np.uint8)
                recs = raw.reshape(-1, rec_bytes)
                body = recs[:, 4:] if is_fvecs else recs
                xy = np.ascontiguousarray(body).view(np.float32).reshape(-1, fdim)
                yield pd.DataFrame({
                    "id": int(idoff) + np.arange(len(xy), dtype=np.int64),
                    "x": xy[:, 0],
                    "y": xy[:, 1],
                })

    return plan.mapInPandas(read_range, "id long, x float, y float")
