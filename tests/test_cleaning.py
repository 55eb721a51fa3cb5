"""Text-cleaning operators: PII scrub and paragraph dedup vs pure-Python twins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from parallelcovertree_spark.operators.cleaning import (
    EMAIL_RE,
    EMAIL_TAG,
    PHONE_RE,
    PHONE_TAG,
    paragraph_dedup,
    pii_scrub,
)


def _scrub_py(t: str) -> tuple[str, int, int]:
    ne = len(re.findall(EMAIL_RE, t))
    np_ = len(re.findall(PHONE_RE, t))
    clean = re.sub(PHONE_RE, PHONE_TAG, re.sub(EMAIL_RE, EMAIL_TAG, t))
    return clean, ne, np_


PII_DOCS = [
    (0, "plain text with no pii at all"),
    (1, "mail a.b+c@foo-bar.com or x@y.io today"),
    (2, "call 555-0199 then 555-99999 stays"),  # 5-digit tail: no \b match
    (3, "mixed bob@corp.example and 555-1234 inline"),
    (4, ""),
    (5, "at-sign alone @ and orphan 555- stay put"),
]


def test_pii_scrub_matches_python_twin(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_emails, r.n_phones)
           for r in pii_scrub(df).collect()}
    for doc_id, t in PII_DOCS:
        assert got[doc_id] == _scrub_py(t), doc_id


def test_pii_scrub_email_masked_before_phone_check(spark):
    # a phone-shaped token inside an address is consumed by the email mask
    df = spark.createDataFrame([(0, "ping 555-1234@ex.com ok")],
                               "doc_id long, text string")
    row = pii_scrub(df).collect()[0]
    assert row.text_clean == f"ping {EMAIL_TAG} ok"
    assert (row.n_emails, row.n_phones) == (1, 1)  # counts audit the raw text


URL_CASES = [
    # (raw, expected url_norm, expected host)
    ("HTTPS://WWW.Example.COM:443/A/B?id=1#frag",
     "https://www.example.com/A/B?id=1", "www.example.com"),
    ("http://Host.io:80/x", "http://host.io/x", "host.io"),
    ("http://host.io:443/x", "http://host.io:443/x", "host.io:443"),  # non-default port kept
    ("https://a.b/p?utm_source=x&id=2&utm_campaign=y",
     "https://a.b/p?id=2", "a.b"),
    ("https://a.b/p?utm_only=1", "https://a.b/p", "a.b"),
    ("https://a.b/p?utm_a=1&utm_b=2&z=3", "https://a.b/p?z=3", "a.b"),
    ("https://a.b/p?id=5#sec?utm_x=1", "https://a.b/p?id=5", "a.b"),  # frag stripped first
    ("no-scheme/relative?utm_x=1", "no-scheme/relative", ""),
    ("https://CaseInPath.example/KeepCase/Path", "https://caseinpath.example/KeepCase/Path",
     "caseinpath.example"),
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(URL_CASES)],
        "doc_id long, url string",
    )
    from parallelcovertree_spark.operators.cleaning import url_normalize

    got = {r.doc_id: (r.url_norm, r.host) for r in url_normalize(df).collect()}
    for i, (_, norm, host) in enumerate(URL_CASES):
        assert got[i] == (norm, host), (i, got[i])


def _para_py(docs: list[tuple[int, str]], max_df: int) -> dict[int, tuple[str, int, int]]:
    from collections import defaultdict

    df_count: dict[str, set] = defaultdict(set)
    for i, t in docs:
        for ln in t.split("\n"):
            df_count[ln].add(i)
    out = {}
    for i, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if len(df_count[ln]) <= max_df]
        out[i] = ("\n".join(kept), len(kept), len(lines))
    return out


PARA_DOCS = [
    (0, "NAV\nunique zero\nFOOT"),
    (1, "NAV\nunique one\nFOOT"),
    (2, "NAV\nunique two\nFOOT"),
    (3, "NAV\nFOOT"),          # fully boilerplate at max_df=2
    (4, "solo line"),
    (5, "NAV\n\nblank kept\n"),  # empty lines: df of '' spans docs 5+6
    (6, "\nanother blank"),
]


def test_paragraph_dedup_matches_python_twin(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    want = _para_py(PARA_DOCS, max_df=2)
    got = {r.doc_id: (r.text_clean, r.n_kept, r.n_total)
           for r in paragraph_dedup(df, max_df=2).collect()}
    assert got == want


def test_paragraph_dedup_all_dropped_doc_survives_empty(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    row = {r.doc_id: r for r in paragraph_dedup(df, max_df=2).collect()}[3]
    assert (row.text_clean, row.n_kept, row.n_total) == ("", 0, 2)


def test_paragraph_dedup_partition_invariant(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    a = sorted(map(tuple, paragraph_dedup(df.coalesce(1), max_df=2).collect()))
    b = sorted(map(tuple, paragraph_dedup(df.repartition(7), max_df=2).collect()))
    assert a == b


def test_paragraph_dedup_duplicate_line_within_one_doc(spark):
    # a line repeated inside ONE doc has df=1 (distinct docs), so it stays —
    # and both copies are kept in order
    docs = [(0, "x\nx\ny"), (1, "z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = {r.doc_id: r for r in paragraph_dedup(df, max_df=1).collect()}[0]
    assert (row.text_clean, row.n_kept, row.n_total) == ("x\nx\ny", 3, 3)
