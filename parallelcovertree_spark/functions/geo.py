"""Geocoding + distance expressions.

Two geocoders:

1. ``X_SQL`` / ``Y_SQL`` — a *SQL-parity* deterministic geocoder: pure integer
   arithmetic + one IEEE division, so the identical expression text evaluates
   bit-identically in Spark SQL and DuckDB. Used by every driver-checked query
   (``__spark_entry__.queries()``) so the DuckDB oracle can recompute the same
   coordinates. Coordinates land uniformly in [-SCALE, SCALE)².

2. ``gaussian_points`` — a counter-based (partition-independent) seeded
   Gaussian source mirroring the *shape* of the reference's synthetic source
   (``/root/reference/src/Point.cpp:45-60``: iid N(0, var) per coordinate,
   float32 storage, dim=2; defaults var=10.0, ``create_points.cpp:19-29``).
   Used for reference-parity fixtures in pytest; verified against a numpy
   oracle, not DuckDB.

Distance discipline (reference parity): float32 storage, float64 arithmetic
(``/root/reference/src/Point.cpp:27-38`` computes double deltas over float
storage). In Catalyst expressions we upcast to double before arithmetic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- SQL-parity geocoder -----------------------------------------------------
# Knuth multiplicative constants; modulus is prime. id * A fits in int64 for
# id < ~3.4e9 (we gate ids far below that).
_A1 = 2654435761
_A2 = 2246822519
_M = 1000003
SCALE = 10.0  # matches the reference default var=10.0 spread, arbitrary units

# Expression templates: format with the id column name. MUST stay valid and
# bit-identical in both Spark SQL and DuckDB SQL (integer %, cast, * / - only).
X_SQL = f"((CAST(({{id}} * {_A1}) % {_M} AS DOUBLE) / {_M}.0) * 2.0 - 1.0) * {SCALE}"
Y_SQL = f"((CAST((({{id}} + 1) * {_A2}) % {_M} AS DOUBLE) / {_M}.0) * 2.0 - 1.0) * {SCALE}"


def x_col(id_col: str = "doc_id") -> Column:
    return F.expr(X_SQL.format(id=id_col))


def y_col(id_col: str = "doc_id") -> Column:
    return F.expr(Y_SQL.format(id=id_col))


def geotag(df, id_col: str = "doc_id"):
    """Add deterministic (x, y) coordinates derived from an integer id."""
    return df.withColumn("x", x_col(id_col)).withColumn("y", y_col(id_col))


def points_cte(id_col: str = "doc_id", table: str = "documents") -> str:
    """DuckDB/Spark-shared CTE body producing (id, x, y) from a table."""
    return (
        f"SELECT {id_col} AS id, {X_SQL.format(id=id_col)} AS x, "
        f"{Y_SQL.format(id=id_col)} AS y FROM {table}"
    )


def dist2_expr(ax: str, ay: str, bx: str, by: str) -> Column:
    """Squared euclidean distance, double arithmetic (no sqrt: exact-compare
    friendly — comparing d2 <= r*r is bit-stable across engines)."""
    dx = F.col(ax).cast("double") - F.col(bx).cast("double")
    dy = F.col(ay).cast("double") - F.col(by).cast("double")
    return dx * dx + dy * dy


# --- counter-based Gaussian source (reference-parity fixture) ----------------

_U64 = np.uint64


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Stateless splitmix64: uint64 in → uint64 out, vectorized."""
    with np.errstate(over="ignore"):
        z = (z + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return (z ^ (z >> _U64(31))).astype(_U64)


def _uniform01(z: np.ndarray) -> np.ndarray:
    """uint64 hash → double uniform in (0, 1) (53-bit mantissa, never 0)."""
    return ((_splitmix64(z) >> _U64(11)).astype(np.float64) + 0.5) / (1 << 53)


def url_hash64(urls) -> np.ndarray:
    """FNV-1a 64-bit over utf-8 bytes, per url (deterministic, locale-free).

    Vectorized column-wise like ``functions.text.fingerprint_np``, INCLUDING
    its length bucketing: rows are sorted by encoded length and cut into
    chunks whenever rows·max_len would exceed a ~128 MB cell budget, so one
    pathological mile-long URL in a 200k-row Arrow batch cannot inflate the
    padded byte matrix to rows × max_len. Within a chunk the FNV recurrence
    advances one COLUMN per step — O(max_len) numpy passes over all rows at
    once; the encode itself is pandas ``.str.encode`` (C-level), leaving no
    per-row Python in the kernel. Byte-identical to the scalar FNV-1a loop
    (pinned by test_webpipeline_e2e + the fixture test)."""
    import pandas as pd

    s = pd.Series(urls, dtype="object").reset_index(drop=True)
    n = len(s)
    out = np.full(n, 0xCBF29CE484222325, dtype=_U64)
    if n == 0:
        return out
    enc = s.str.encode("utf-8")
    lens = enc.str.len().to_numpy(np.int64)
    order = np.argsort(lens, kind="stable")
    cell_budget = 16 << 20  # uint8 cells per padded matrix
    start = 0
    while start < n:
        stop = start + 1
        # ascending lengths: chunk max_len = last element's length
        while stop < n and (stop + 1 - start) * max(int(lens[order[stop]]), 1) <= cell_budget:
            stop += 1
        idx = order[start:stop]
        out[idx] = _fnv1a_chunk(enc.iloc[idx].tolist(), lens[idx])
        start = stop
    return out


def _fnv1a_chunk(enc: list, lens: np.ndarray) -> np.ndarray:
    """One padded-matrix FNV-1a pass over a length-bucketed chunk."""
    n = len(enc)
    out = np.full(n, 0xCBF29CE484222325, dtype=_U64)
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return out
    joined = np.frombuffer(b"".join(enc), dtype=np.uint8)
    mat = np.zeros((n, max_len), dtype=np.uint8)
    mat[np.arange(max_len)[None, :] < lens[:, None]] = joined
    prime = _U64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            alive = lens > j
            h = out[alive]
            out[alive] = (h ^ mat[alive, j].astype(_U64)) * prime
    return out


def geotag_docs_pdf(urls, var: float = 10.0, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """url → deterministic N(0, var) coords (FIXTURES.md F1: hash(url)-seeded,
    float32 storage — the web-page geotagger of the north star)."""
    h = url_hash64(urls)
    with np.errstate(over="ignore"):
        k = _U64(17 * seed)
        u1 = _uniform01(h * _U64(2) + k)
        u2 = _uniform01(h * _U64(2) + _U64(1) + k)
    r = np.sqrt(-2.0 * np.log(u1)) * np.sqrt(var)
    x = (r * np.cos(2.0 * np.pi * u2)).astype(np.float32)
    y = (r * np.sin(2.0 * np.pi * u2)).astype(np.float32)
    return x, y


def geotag_docs(docs, url_col: str = "url", var: float = 10.0, seed: int = 42):
    """input_hint flow: docs(url, warc_ts, html, text, lang) → + (x, y) via an
    Arrow-batched vectorized geocoder (no per-row Python UDF)."""
    from pyspark.sql.types import FloatType, StructField, StructType

    def run(batches):
        for pdf in batches:
            x, y = geotag_docs_pdf(pdf[url_col], var=var, seed=seed)
            pdf = pdf.copy()
            pdf["x"] = x
            pdf["y"] = y
            yield pdf

    schema = StructType(
        list(docs.schema.fields)
        + [StructField("x", FloatType()), StructField("y", FloatType())]
    )
    return docs.mapInPandas(run, schema)


def gaussian_coords(ids: np.ndarray, var: float = 10.0, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic iid N(0, var) coords per id via Box–Muller over
    counter-based uniforms. Partition-independent: same id → same coords
    regardless of how Spark splits the data. float32 storage (reference
    parity, Point.h:18 fixed dim=2 float32)."""
    base = np.asarray(ids, dtype=np.uint64)
    with np.errstate(over="ignore"):
        k = _U64(17 * seed)  # 17*seed mirrors the reference's RNG seeding idiom
        u1 = _uniform01(base * _U64(2) + k)
        u2 = _uniform01(base * _U64(2) + _U64(1) + k)
    r = np.sqrt(-2.0 * np.log(u1)) * np.sqrt(var)
    x = (r * np.cos(2.0 * np.pi * u2)).astype(np.float32)
    y = (r * np.sin(2.0 * np.pi * u2)).astype(np.float32)
    return x, y
