"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels. The image/audio codec libraries are NOT installed in
this environment, so the codec step is STUBBED: ``decode_payload`` raises
``NotImplementedError`` unless ``fake=True``, in which case a clearly-marked
deterministic fake decoder produces stable feature vectors from the payload
bytes. Everything Spark-side — schema, partition-preserving batch iteration,
UDF signatures, output shapes — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int>"
)
FEATURE_DIM = 8
FEATURES_SCHEMA = f"doc_id bigint, kind string, n_bytes int, feature array<float>"

_KINDS = ["image", "audio", "video"]


def synthetic_media(
    spark: SparkSession, n: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic media table: payload bytes are a pure function of
    (doc_id, seed); metadata is typed per kind. ``num_partitions`` splits the
    range at the source (no shuffle) — benchmarks pin it so partitioning is
    constant across parallelism levels."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(0, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            kinds = [_KINDS[int(i) % 3] for i in ids]
            payloads = [
                ((int(i) * 2654435761 + seed) % 251 + 1).to_bytes(1, "little")
                * (64 + int(i) % 192)
                for i in ids
            ]
            metas = [
                {"width": 32 + int(i) % 64, "height": 32, "sample_rate": None}
                if k == "image"
                else {"width": None, "height": None, "sample_rate": 16000}
                if k == "audio"
                else {"width": 64, "height": 64, "sample_rate": 30}
                for i, k in zip(ids, kinds)
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


def decode_payload(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """STUB: real codecs (PIL/ffmpeg/librosa) are not available here.
    ``fake=True`` → deterministic fake features (byte histogram moments)."""
    if not fake:
        raise NotImplementedError(
            "media codecs not installed in this environment; pass fake=True "
            "for the deterministic stand-in decoder"
        )
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    k = float(len(kind))
    feats = np.array(
        [b.mean(), b.std(), b.min(), b.max(), len(b) % 97, b[0], b[-1], k],
        dtype=np.float32,
    )
    return feats


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: binary → fixed-dim float vector.
    Partition-preserving (no shuffle); Arrow batches in and out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, k, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per sampled
    frame offset (the decode itself is the same stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_bytes": []}
            for did, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                for fno, off in enumerate(range(0, len(payload), every_n)):
                    rows["doc_id"].append(did)
                    rows["frame_no"].append(fno)
                    rows["frame_bytes"].append(payload[off : off + every_n])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, "doc_id bigint, frame_no int, frame_bytes binary")


# --- REAL (codec-free) header sniffing ----------------------------------------
# Format identification + dimensions/sample-rate straight from container
# magic bytes — the first pass a crawl pipeline runs over binary payloads,
# and it needs no codec library. Per-row work is O(header bytes), never
# O(payload); rows move in Arrow batches.

SNIFF_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "sample_rate int, n_bytes bigint"
)


def sniff_bytes(b: bytes) -> tuple[str, int | None, int | None, int | None]:
    """(format, width, height, sample_rate) from container headers.
    PNG (IHDR), JPEG (SOF0/1/2 marker scan), GIF (logical screen), WAV
    (RIFF fmt chunk); anything else → ('unknown', None, None, None)."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return "png", w, h, None
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                return "jpeg", w, h, None
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg = int.from_bytes(b[i + 2:i + 4], "big")
            i += 2 + seg
        return "jpeg", None, None, None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return "gif", w, h, None
    if len(b) >= 28 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        sr = int.from_bytes(b[24:28], "little")
        return "wav", None, None, sr
    return "unknown", None, None, None


def media_sniff(media: DataFrame) -> DataFrame:
    """(doc_id, format, width, height, sample_rate, n_bytes) for every
    payload — REAL parsing, no codec dependency, no stub. Partition-
    preserving mapInPandas; downstream routing (decode farm per format,
    size filters, corrupt-payload quarantine) hangs off this table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "format": [], "width": [],
                   "height": [], "sample_rate": [], "n_bytes": []}
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                fmt, w, h, sr = sniff_bytes(b)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(sr)
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(run, SNIFF_SCHEMA)


# --- driver-gate surface: corpus-derived media + oracle-exact kernels ----------
# The two functions below make the multimodal plumbing DuckDB-checkable so it
# carries a registry gate like every other family. Payloads derive
# deterministically from the documents table (the corpus text is pure ASCII,
# so payload bytes == codepoints and DuckDB can replay byte arithmetic with
# ord()); the Spark side still moves real binary columns through real
# Arrow-batched mapInPandas kernels — exactly the shape a 100 TB crawl
# pipeline has, with only the codec call stubbed.

BYTE_FEATURES_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, sum_bytes bigint, "
    "min_byte int, max_byte int, first_byte int, last_byte int"
)


def docs_to_media(docs: DataFrame) -> DataFrame:
    """documents → media table: payload = UTF-8 bytes of text (opaque binary
    from here on), kind cycles image/audio/video by doc_id, metadata struct
    typed per kind. Pure codegen projection — no UDF, no shuffle."""
    from pyspark.sql import functions as F

    m = F.col("doc_id") % 3
    return docs.select(
        "doc_id",
        F.when(m == 0, "image").when(m == 1, "audio").otherwise("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(m != 1, (32 + F.col("doc_id") % 64).cast("int")).alias("width"),
            F.when(m != 1, F.lit(32).cast("int")).alias("height"),
            F.when(m == 1, F.lit(16000).cast("int")).alias("sample_rate"),
        ).alias("meta"),
    )


def byte_features(media: DataFrame) -> DataFrame:
    """Integer-exact payload features (byte count/sum/min/max/first/last)
    through the same Arrow-batched mapInPandas path as extract_features —
    every output is a BIGINT/INT, so a SQL oracle can replay it bit-for-bit.
    Partition-preserving. The whole batch is ONE concatenated uint8 buffer
    with ``np.<op>.reduceat`` over the segment starts — no per-row Python
    loop in the stats path (the per-row variant and an object-dtype output
    both measured slower at 1M payloads — tools/multimodal_bench.py; at
    decode-farm volume the boundary+loop, not the arithmetic, is the cost). NULL/empty payloads emit n_bytes=0 with NULL stats
    (media_sniff's guard discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            nonempty = lens > 0
            # starts of the NONEMPTY segments inside the concatenated buffer
            # (empty payloads contribute no bytes, so consecutive nonempty
            # starts delimit segments exactly)
            ends = np.cumsum(lens)
            starts = (ends - lens)[nonempty]
            n = len(payloads)
            sum_b = np.zeros(n, dtype=np.int64)
            stats = np.zeros((4, n), dtype=np.int32)
            if starts.size:
                cat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                wide = cat.astype(np.int64)  # reduceat in uint8 would wrap
                sum_b[nonempty] = np.add.reduceat(wide, starts)
                stats[0, nonempty] = np.minimum.reduceat(cat, starts)
                stats[1, nonempty] = np.maximum.reduceat(cat, starts)
                stats[2, nonempty] = cat[starts]
                stats[3, nonempty] = cat[ends[nonempty] - 1]
            # pandas nullable Int32 (masked numpy, Arrow-native) — object
            # arrays of boxed ints measured as the kernel's serial tax
            mask = ~nonempty
            min_b, max_b, first_b, last_b = (
                pd.arrays.IntegerArray(stats[i], mask.copy()) for i in range(4)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "sum_bytes": sum_b,
                    "min_byte": min_b,
                    "max_byte": max_b,
                    "first_byte": first_b,
                    "last_byte": last_b,
                }
            )

    # explicit projection: mapInPandas ships EVERY input column through the
    # Arrow boundary (no automatic pruning into the UDF), and the meta
    # struct alone measured ~2/3 of the kernel's wall time at 1M rows
    # (struct → per-row python dicts in the pandas conversion)
    return media.select("doc_id", "kind", "payload").mapInPandas(
        run, BYTE_FEATURES_SCHEMA
    )


def synthetic_headers(docs: DataFrame) -> DataFrame:
    """Construct REAL container headers (PNG IHDR / WAV RIFF-fmt / GIF
    logical screen) whose planted dimensions are pure functions of doc_id,
    so media_sniff's parse can be oracle-checked as a construct→parse
    round-trip. image → PNG w=32+id%64, h=32+id%16; audio → WAV
    sr=8000*(1+id%5); video → GIF w=64+id%32, h=48."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                i = int(i)
                k = i % 3
                if k == 0:  # PNG: signature + IHDR length/tag + width + height
                    payloads.append(
                        b"\x89PNG\r\n\x1a\n"
                        + (13).to_bytes(4, "big")
                        + b"IHDR"
                        + (32 + i % 64).to_bytes(4, "big")
                        + (32 + i % 16).to_bytes(4, "big")
                    )
                elif k == 1:  # WAV: RIFF size WAVE fmt-chunk, sr at bytes 24:28
                    sr = 8000 * (1 + i % 5)
                    payloads.append(
                        b"RIFF"
                        + (20).to_bytes(4, "little")
                        + b"WAVEfmt "
                        + (16).to_bytes(4, "little")
                        + (1).to_bytes(2, "little")
                        + (1).to_bytes(2, "little")
                        + sr.to_bytes(4, "little")
                    )
                else:  # GIF89a: logical screen width/height, little-endian
                    payloads.append(
                        b"GIF89a"
                        + (64 + i % 32).to_bytes(2, "little")
                        + (48).to_bytes(2, "little")
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(run, "doc_id bigint, payload binary")


RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
    "sum_px bigint, first_px int, last_px int"
)


def synthetic_pixels(docs: DataFrame) -> DataFrame:
    """Deterministic grayscale frames: a (w×h) uint8 image per doc with
    pixel[idx] = (doc_id*31 + idx*7) % 256, w = 16 + doc_id%16,
    h = 12 + doc_id%8 — pure functions of doc_id, so an oracle can replay
    any downstream pixel arithmetic without shipping the bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            ws, hs, payloads = [], [], []
            for i in ids:
                i = int(i)
                w, h = 16 + i % 16, 12 + i % 8
                idx = np.arange(w * h, dtype=np.int64)
                payloads.append(((i * 31 + idx * 7) % 256).astype(np.uint8).tobytes())
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        run, "doc_id bigint, width int, height int, payload binary"
    )


def resize_nearest(frames: DataFrame, dst_w: int = 8, dst_h: int = 6) -> DataFrame:
    """REAL nearest-neighbor resize over the binary pixel column — numpy
    strided index gather per frame inside Arrow batches (the resize every
    vision-data pipeline runs before feature extraction; only the codec
    that would PRODUCE the pixels is stubbed elsewhere). Output is an
    integer manifest (pixel sum + corners) so the resample's index
    arithmetic (src = (dy*h)//dst_h, (dx*w)//dst_w) is oracle-checkable
    bit-for-bit. Partition-preserving, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ws = pdf["width"].to_numpy(np.int64)
            hs = pdf["height"].to_numpy(np.int64)
            payloads = pdf["payload"].tolist()
            sum_px = np.zeros(n, dtype=np.int64)
            first_px = np.zeros(n, dtype=np.int64)
            last_px = np.zeros(n, dtype=np.int64)
            # bucket by source shape: same-shape frames concat into ONE
            # (k, h, w) array and resample with a single fancy-index gather —
            # no per-frame Python (the shape-group trick of real vision
            # pipelines; ~2× over the per-frame loop at 1M frames,
            # tools/multimodal_bench.py)
            shape_key = ws * (hs.max() + 1) + hs if n else np.empty(0, np.int64)
            for key in np.unique(shape_key):
                idx = np.nonzero(shape_key == key)[0]
                w, h = int(ws[idx[0]]), int(hs[idx[0]])
                block = np.frombuffer(
                    b"".join(payloads[i] for i in idx), dtype=np.uint8
                ).reshape(len(idx), h, w)
                ys = (np.arange(dst_h, dtype=np.int64) * h) // dst_h
                xs = (np.arange(dst_w, dtype=np.int64) * w) // dst_w
                small = block[:, ys][:, :, xs]
                sum_px[idx] = small.sum(axis=(1, 2), dtype=np.int64)
                first_px[idx] = small[:, 0, 0]
                last_px[idx] = small[:, -1, -1]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": ws,
                    "src_h": hs,
                    "dst_w": np.full(n, dst_w, dtype=np.int32),
                    "dst_h": np.full(n, dst_h, dtype=np.int32),
                    "sum_px": sum_px,
                    "first_px": first_px,
                    "last_px": last_px,
                }
            )

    return frames.mapInPandas(run, RESIZE_SCHEMA)
