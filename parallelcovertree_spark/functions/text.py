"""Text functions: extraction, language-ID, quality, tokens, fingerprints.

``extract_text`` is the engine's *reference extractor*: a pure, deterministic
html→text function whose per-url output must be byte-identical wherever it
runs (BASELINE.json input_hint invariant; asserted in pytest). It is
intentionally simple — strip tags, decode the few entities our corpus uses,
collapse whitespace — because determinism, not parsing power, is the contract.

The analysis functions come in two flavors:
- Catalyst column expressions (JVM, codegen) used by driver-checked queries —
  these have exact DuckDB-SQL twins in ``__spark_entry__.oracle_sql``.
- numpy/pandas batch kernels for the UDF paths (Arrow-vectorized, never
  per-row Python).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def extract_text(html: bytes | str) -> str:
    """Pure deterministic html→text. Byte-identical per input, everywhere."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def _extract_batch(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


# Arrow-batched extractor (SURVEY.md C5) — no per-row Python UDF. DataType
# object (not DDL string) so import works without an active SparkSession.
extract_text_udf = pandas_udf(_extract_batch, StringType())


# --- SQL-parity analysis expressions -----------------------------------------
# Each *_SQL template is plain ANSI arithmetic/string SQL valid in BOTH Spark
# and DuckDB; the Column builders wrap the same text via F.expr so the driver's
# oracle comparison is bit-stable.

TOKEN_COUNT_SQL = "CAST((LENGTH({t}) - LENGTH(REPLACE({t}, ' ', ''))) + 1 AS BIGINT)"


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (single-space-joined corpus contract)."""
    return F.expr(TOKEN_COUNT_SQL.format(t=text_col))


# BPE-ish pre-tokenizer (GPT-2-style, simplified to the Java-regex ∩ RE2
# common subset so Spark and DuckDB count identically): letter runs, digit
# runs, and single non-alphanumeric marks each count as one token — the
# budget estimator an LLM-data pipeline actually bills by, vs the
# whitespace count above which undercounts punctuation-heavy text.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(text_col: str = "text") -> Column:
    """BPE-ish regex token count (JVM-side ``regexp_count``, codegen)."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).cast("long")


def occurrences_sql(t: str, word: str) -> str:
    """Count of a marker substring via the replace-length trick (SQL-parity)."""
    pad = f"' ' || {t} || ' '"
    needle = f"' {word} '"
    # overlapping-free: marker words are space-delimited, non-overlapping
    return (
        f"CAST((LENGTH({pad}) - LENGTH(REPLACE({pad}, {needle}, ''))) / {len(word) + 2} AS BIGINT)"
    )


# tiny marker vocabularies per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "de"],
    "zh": ["de", "shi", "le"],
}


def lang_score_sql(t: str, lang: str) -> str:
    terms = [occurrences_sql(t, w) for w in LANG_MARKERS[lang]]
    return "(" + " + ".join(terms) + ")"


QUALITY_SQL = (
    "CAST({tok} AS DOUBLE) / CAST(LENGTH({t}) + 1 AS DOUBLE)"  # tokens per char
)


def quality_score(text_col: str = "text") -> Column:
    """Crude quality proxy: token density (tokens per character)."""
    return F.expr(QUALITY_SQL.format(tok=TOKEN_COUNT_SQL.format(t=text_col), t=text_col))


# Weak per-token hash expressible in both engines: first char, last char,
# length. h(t) = ascii(first)*961 + ascii(last)*31 + len, in [0, ~130k).
TOKEN_HASH_SQL = (
    "(ASCII(SUBSTRING({tok}, 1, 1)) * 961 + "
    "ASCII(SUBSTRING({tok}, LENGTH({tok}), 1)) * 31 + LENGTH({tok}))"
)


def fingerprint_np(texts: pd.Series, window: int = 8, prime: int = 1_000_000_007) -> pd.Series:
    """Rolling polynomial fingerprint (engine-grade, numpy): min rolling hash
    over byte windows — the real document-fingerprint kernel (the SQL-parity
    queries use the weaker token hash above).

    Vectorized column-wise: documents land in a padded (rows × max_len) byte
    matrix and the rolling recurrence advances one COLUMN per step — O(max_len)
    numpy passes over all rows at once, no per-byte Python. Intermediates stay
    < 2^63 (h < prime ≈ 1e9, ×257, ±255·prime). Docs shorter than ``window``
    hash to byte-sum mod prime (unchanged).

    Memory-bounded: rows are BUCKETED by length (ascending sort, greedy cut
    whenever rows·max_len exceeds ~16M cells ≈ 128 MB of int64) so one long
    document in a large Arrow batch cannot inflate the padded matrix to
    rows × max_len — the matrix tracks total bytes, not the worst row."""
    texts = pd.Series(texts).reset_index(drop=True)
    n = len(texts)
    if n == 0:
        return pd.Series(np.empty(0, dtype=np.int64))
    enc = texts.str.encode("utf-8")
    lens = enc.str.len().to_numpy(np.int64)
    out = np.empty(n, dtype=np.int64)
    order = np.argsort(lens, kind="stable")
    cell_budget = 16 << 20  # int64 cells per padded matrix (~128 MB)
    start = 0
    while start < n:
        stop = start + 1
        # ascending lengths: chunk max_len = last element's length
        while stop < n and (stop + 1 - start) * max(int(lens[order[stop]]), 1) <= cell_budget:
            stop += 1
        idx = order[start:stop]
        out[idx] = _fingerprint_chunk(
            enc.iloc[idx].tolist(), lens[idx], window, prime
        )
        start = stop
    return pd.Series(out)


def _fingerprint_chunk(
    enc: list, lens: np.ndarray, window: int, prime: int
) -> np.ndarray:
    """One padded-matrix pass over a length-bucketed chunk (see fingerprint_np)."""
    n = len(enc)
    base = 257
    pw = pow(base, window - 1, prime)
    joined = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    length = max(int(lens.max()), 1)
    mat = np.zeros((n, length), dtype=np.int64)
    mat[np.arange(length)[None, :] < lens[:, None]] = joined  # row-major fill

    best = np.full(n, prime, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    for j in range(length):
        col = mat[:, j]
        if j < window:
            h = (h * base + col) % prime
            if j == window - 1:
                np.minimum(best, np.where(lens > j, h, prime), out=best)
        else:
            h = ((h - mat[:, j - window] * pw) * base + col) % prime
            np.minimum(best, np.where(lens > j, h, prime), out=best)
    return np.where(lens < window, mat.sum(axis=1) % prime, best).astype(np.int64)


def _fingerprint_batch(text: pd.Series) -> pd.Series:
    return fingerprint_np(text)


fingerprint_udf = pandas_udf(_fingerprint_batch, LongType())
