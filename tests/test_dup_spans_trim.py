"""dup_spans_trim: exact-substring verify+trim (Lee et al. stage 2) on a
planted-duplicate corpus, checked against hand-computed spans."""

from __future__ import annotations

import hashlib

from parallelcovertree_spark.operators.dedup import dup_spans_trim


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _run(spark, rows, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_removed_spans, r.n_removed_tokens, r.trimmed_sha)
        for r in dup_spans_trim(df, w=w).collect()
    }


def test_planted_shared_prefix_trims_one_span(spark):
    # docs 1 and 2 share the first 6 tokens; with w=4, windows at starts
    # 1,2,3 are duplicated in each -> covered positions 1..6 = ONE span,
    # the distinct tails survive
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared + " one two three four"),
        (2, shared + " five six seven eight"),
        (3, "totally different words here nothing shared at all"),
    ]
    got = _run(spark, rows, w=4)
    assert got[1] == (10, 1, 6, _sha("one two three four"))
    assert got[2] == (10, 1, 6, _sha("five six seven eight"))
    assert got[3] == (8, 0, 0, _sha("totally different words here nothing shared at all"))


def test_two_disjoint_spans(spark):
    # duplicated head AND duplicated tail with a unique middle -> 2 spans
    head = "aa bb cc dd"
    tail = "ww xx yy zz"
    rows = [
        (1, f"{head} mid1 only1 {tail}"),
        (2, f"{head} mid2 only2 {tail}"),
    ]
    got = _run(spark, rows, w=4)
    # each doc: 10 tokens, head covers 1..4, tail covers 7..10 -> 2 spans, 8 removed
    assert got[1] == (10, 2, 8, _sha("mid1 only1"))
    assert got[2] == (10, 2, 8, _sha("mid2 only2"))


def test_fully_duplicated_doc_trims_to_empty(spark):
    t = "one two three four five"
    got = _run(spark, [(1, t), (2, t)], w=4)
    assert got[1] == (5, 1, 5, _sha(""))
    assert got[2] == got[1]


def test_short_docs_have_no_windows(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c")], w=4)
    # 3 tokens < w: no windows, nothing verified, nothing trimmed
    assert got[1] == (3, 0, 0, _sha("a b c"))


def test_within_doc_repetition_is_trimmed(spark):
    # the duplicate occurs INSIDE one doc (the classic boilerplate case)
    rep = "spam spam spam spam"
    got = _run(spark, [(1, f"{rep} unique middle {rep}")], w=4)
    n_tokens, n_spans, n_removed, sha = got[1]
    assert n_tokens == 10
    # windows at 1 and 7 share content; coverage 1..4 and 7..10 -> 2 spans
    assert (n_spans, n_removed) == (2, 8)
    assert sha == _sha("unique middle")
