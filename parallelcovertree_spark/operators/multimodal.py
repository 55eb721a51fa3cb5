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


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: payload bytes are a pure function of
    (doc_id, seed); metadata is typed per kind."""
    rng = spark.range(0, n)

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
