"""Property-based twins for the cleaning surface (hypothesis): the engine
must agree with a pure-Python implementation of the same rules on adversarial
generated inputs, not just the hand-picked cases."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parallelcovertree_spark.operators.cleaning import (
    EMAIL_RE,
    EMAIL_TAG,
    PHONE_RE,
    PHONE_TAG,
    URL_FRAG_RE,
    URL_HOST_RE,
    URL_PREFIX_RE,
    URL_UTM_FIRST_RE,
    URL_UTM_LONE_RE,
    URL_UTM_MID_RE,
    paragraph_dedup,
    pii_scrub,
    url_normalize,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# text with pii-adjacent fragments: @, dots, dashes, digits, '555-'
_pii_text = st.text(
    alphabet="ab@._%+-0123456789 5x", min_size=0, max_size=40
).map(lambda s: s.replace("5555", "555-"))


@given(st.lists(_pii_text, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_pii_scrub_agrees_with_re_twin(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: (r.text_clean, r.n_emails, r.n_phones)
           for r in pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        want = (
            re.sub(PHONE_RE, PHONE_TAG, re.sub(EMAIL_RE, EMAIL_TAG, t)),
            len(re.findall(EMAIL_RE, t)),
            len(re.findall(PHONE_RE, t)),
        )
        assert got[i] == want, (i, t)


# documents built from a tiny line pool (forces shared lines) plus unique tails
_line = st.sampled_from(["nav", "foot", "", "body", "x y z"])


@given(
    st.lists(st.lists(_line, min_size=1, max_size=4), min_size=2, max_size=6),
    st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_paragraph_dedup_agrees_with_twin(spark, docs_lines, max_df):
    docs = [
        (i, "\n".join(lines + [f"unique {i}"]))
        for i, lines in enumerate(docs_lines)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_kept, r.n_total)
           for r in paragraph_dedup(df, max_df=max_df).collect()}

    df_count: dict[str, set] = {}
    for i, t in docs:
        for ln in t.split("\n"):
            df_count.setdefault(ln, set()).add(i)
    for i, t in docs:
        lines = t.split("\n")
        kept = [ln for ln in lines if len(df_count[ln]) <= max_df]
        assert got[i] == ("\n".join(kept), len(kept), len(lines)), (i, t)


def _url_norm_py(u: str) -> tuple[str, str]:
    u = re.sub(URL_FRAG_RE, "", u)
    m = re.match(URL_PREFIX_RE, u)
    prefix = m.group(0) if m else ""
    rest = u[len(prefix):]
    low = prefix.lower()
    if low.startswith("http://"):
        low = re.sub(":80$", "", low)
    elif low.startswith("https://"):
        low = re.sub(":443$", "", low)
    j = low + rest
    j = re.sub(URL_UTM_MID_RE, "", j)
    j = re.sub(URL_UTM_FIRST_RE, "?", j)
    j = re.sub(URL_UTM_LONE_RE, "", j)
    hm = re.search(URL_HOST_RE, low)
    return j, hm.group(1) if hm else ""


_url = st.builds(
    lambda scheme, host, port, path, params, frag: scheme
    + host
    + port
    + path
    + ("?" + "&".join(params) if params else "")
    + frag,
    st.sampled_from(["http://", "HTTPS://", "https://", "HtTp://", ""]),
    st.sampled_from(["Example.COM", "a.b", "WWW.Site.io", "host"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/Path/One", "/p"]),
    st.lists(
        st.sampled_from(["utm_source=x", "utm_b=2", "id=7", "q=Key", "utm_c="]),
        max_size=3,
    ),
    st.sampled_from(["", "#Frag", "#a?utm_x=1"]),
)


@given(st.lists(_url, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_url_normalize_agrees_with_re_twin(spark, urls):
    df = spark.createDataFrame(
        list(enumerate(urls)), "doc_id long, url string"
    )
    got = {r.doc_id: (r.url_norm, r.host)
           for r in url_normalize(df).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _url_norm_py(u), (i, u)
