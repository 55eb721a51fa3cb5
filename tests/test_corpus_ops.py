"""Corpus-statistics operators (operators/corpus.py) vs pure-Python twins."""

from collections import Counter

import pytest

from parallelcovertree_spark.operators.corpus import (
    contamination_check,
    corpus_bigrams,
    ngram_contamination,
    sequence_packing,
    repetition_stats,
    stratified_sample,
    term_doc_freq,
    tfidf_top_terms,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog  sat", "en"),          # double space → empty token dropped
    (2, "cat cat cat", "en"),
    (3, "der hund und die katze", "de"),
    (4, "the cat sat on the mat", "en"),  # exact duplicate of doc 0
    (5, "solo", "fr"),
    (6, "", "en"),                     # empty text: absent from every token op
]


def _toks(text):
    return [t for t in text.split(" ") if t]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, lang) for i, t, lang in DOCS], "doc_id LONG, text STRING, lang STRING"
    ).repartition(4)


def test_term_doc_freq_matches_counter(docs_df):
    got = {r["term"]: (r["doc_freq"], r["total_tf"]) for r in term_doc_freq(docs_df).collect()}
    df_exp, tf_exp = Counter(), Counter()
    for _, text, _ in DOCS:
        c = Counter(_toks(text))
        for t, n in c.items():
            df_exp[t] += 1
            tf_exp[t] += n
    assert got == {t: (df_exp[t], tf_exp[t]) for t in df_exp}


def test_tfidf_top_terms_matches_brute_force(docs_df):
    dfreq = Counter()
    for _, text, _ in DOCS:
        for t in set(_toks(text)):
            dfreq[t] += 1
    expect = {}
    for i, text, _ in DOCS:
        tf = Counter(_toks(text))
        ranked = sorted(tf, key=lambda t: (-(tf[t] / dfreq[t]), t))[:2]
        if ranked:  # tokenless docs are absent, not empty-listed
            expect[i] = [(t, tf[t], dfreq[t]) for t in ranked]
    rows = tfidf_top_terms(docs_df, k=2).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["rank"])):
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["doc_freq"]))
    assert got == expect


def test_corpus_bigrams_matches_brute_force(docs_df):
    cnt, dfreq = Counter(), Counter()
    for _, text, _ in DOCS:
        raw = text.split(" ")  # raw adjacency: empty-adjacent pairs dropped
        grams = [
            f"{a} {b}" for a, b in zip(raw, raw[1:]) if a and b
        ]
        cnt.update(grams)
        for g in set(grams):
            dfreq[g] += 1
    got = {r["bigram"]: (r["cnt"], r["doc_freq"]) for r in corpus_bigrams(docs_df).collect()}
    assert got == {g: (cnt[g], dfreq[g]) for g in cnt}
    # doc 1 'the dog  sat': the double space breaks adjacency — no 'dog sat'
    assert "dog sat" not in got and ("the dog" in got)


def test_repetition_stats_math(docs_df):
    rows = {r["doc_id"]: r for r in repetition_stats(docs_df).collect()}
    assert 6 not in rows  # tokenless doc: absent, no 0/0 division
    for i, text, _ in DOCS:
        toks = _toks(text)
        if not toks:
            continue
        c = Counter(toks)
        r = rows[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(c)
        assert r["top_tf"] == max(c.values())
        assert r["dup_ratio"] == (len(toks) - len(c)) / len(toks)


def test_contamination_substring_semantics(docs_df):
    # 'cat sat' crosses a token boundary; 'at on' starts mid-token — both are
    # substring hits by design (eval strings leak into crawls untokenized).
    frags = [(0, "cat sat"), (1, "at on"), (2, "absent phrase")]
    got = sorted((r["doc_id"], r["frag_id"]) for r in contamination_check(docs_df, frags).collect())
    assert got == [(0, 0), (0, 1), (4, 0), (4, 1)]


def test_sequence_packing_spans(spark):
    # 3 docs in one shard, block=5: tokens 3 + 4 + 2 concat to 9 tokens
    # → doc 1 crosses the block boundary (tokens 3..6 span seqs 0 and 1)
    df = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e f g", "en"), (2, "h i", "en"),
         (3, "x y z w v u", "de")],  # separate shard restarts at seq 0
        "doc_id LONG, text STRING, lang STRING",
    )
    got = {r["doc_id"]: r for r in sequence_packing(df, block=5).collect()}
    assert (got[0]["start_seq"], got[0]["start_offset"], got[0]["end_seq"]) == (0, 0, 0)
    assert (got[1]["start_seq"], got[1]["start_offset"], got[1]["end_seq"]) == (0, 3, 1)
    assert (got[2]["start_seq"], got[2]["start_offset"], got[2]["end_seq"]) == (1, 2, 1)
    assert (got[3]["start_seq"], got[3]["start_offset"], got[3]["end_seq"]) == (0, 0, 1)


def test_ngram_contamination_matches_brute_force(docs_df):
    evals = [(0, "the cat sat"), (1, "cat cat cat cat"), (2, "und die katze x")]
    got = sorted((r["doc_id"], r["eval_id"], r["n_shared"])
                 for r in ngram_contamination(docs_df, evals, n=3).collect())

    def grams(text):
        raw = text.split(" ")
        return {
            " ".join(raw[i:i + 3]) for i in range(len(raw) - 2)
            if all(raw[i + j] for j in range(3))
        }

    expect = []
    for did, text, _ in DOCS:
        dg = grams(text)
        for eid, etext in evals:
            shared = dg & grams(etext)
            if shared:
                expect.append((did, eid, len(shared)))
    assert got == sorted(expect)
    assert (0, 0, 1) in got  # doc 0 shares exactly 'the cat sat' with eval 0


def test_unicode_text_parity(spark):
    """Multi-byte UTF-8 through the token ops and the sha2 sampler: Spark
    hashes/tokenizes the UTF-8 bytes — pin against hashlib/str twins so the
    cross-engine contract (DuckDB sha256 also hashes UTF-8) holds beyond
    ASCII."""
    import hashlib

    rows = [(0, "héllo wörld héllo", "de"), (1, "日本語 テスト", "ja"),
            (2, "café café naïve", "fr")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    got = {r["term"]: (r["doc_freq"], r["total_tf"]) for r in term_doc_freq(df).collect()}
    assert got["héllo"] == (1, 2) and got["日本語"] == (1, 1) and got["café"] == (1, 2)
    sample = {r["doc_id"]: r["bucket"]
              for r in stratified_sample(df, {}, 4294967296).collect()}
    for i, text, _ in rows:
        want = int(hashlib.sha256(text.encode("utf-8")).hexdigest()[:8], 16)
        assert sample[i] == want


def test_stratified_sample_deterministic_and_duplicate_stable(docs_df):
    thr = {"en": 2147483648, "de": 4294967296, "fr": 4294967296}
    a = sorted(stratified_sample(docs_df, thr, 4294967296).collect())
    b = sorted(stratified_sample(docs_df.repartition(7), thr, 4294967296).collect())
    assert a == b  # partition-count independent
    kept = {r["doc_id"]: r["bucket"] for r in a}
    # non-en languages keep everything (threshold 2^32)
    assert {3, 5} <= set(kept)
    # exact duplicates (docs 0 and 4) hash identically: both in or both out
    assert (0 in kept) == (4 in kept)
    for r in a:
        assert 0 <= r["bucket"] < 4294967296


def test_doc_commonness_matches_counter(docs_df):
    from parallelcovertree_spark.operators.corpus import doc_commonness

    dfreq = Counter()
    for _, text, _ in DOCS:
        for t in set(_toks(text)):
            dfreq[t] += 1
    got = {r.doc_id: (r.sum_df, r.n_tok, r.commonness)
           for r in doc_commonness(docs_df).collect()}
    for i, text, _ in DOCS:
        toks = _toks(text)
        if not toks:
            assert i not in got  # empty doc absent, like every token op
            continue
        sum_df = sum(dfreq[t] for t in toks)
        assert got[i] == (sum_df, len(toks), sum_df / len(toks)), i
    # duplicate docs score identically; the all-repeats doc is df-1 per token
    assert got[0] == got[4]
    assert got[2] == (9, 3, 3.0)  # cat: df=3 (docs 0,2,4) x 3 occurrences


def test_dup_passages_matches_python_twin(spark):
    from parallelcovertree_spark.operators.dedup import (
        PASSAGE_BASE,
        PASSAGE_MOD,
        dup_passages,
    )

    shared = "one two three four five six seven eight"  # exactly w=8 tokens
    docs = [
        (0, shared + " tail a b c"),
        (1, "prefix x " + shared),        # shares the w-window with doc 0
        (2, "all unique tokens here never repeated anywhere once more"),
        (3, "short doc"),                 # < w tokens: no windows, absent
        (4, shared),                      # the shared window only
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ratio)
           for r in dup_passages(df, w=8).collect()}

    def tok_h(t):
        return ord(t[0]) * 961 + ord(t[-1]) * 31 + len(t)

    from collections import Counter
    win_of = {}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        win_of[i] = [
            __import__("functools").reduce(
                lambda acc, t: (acc * PASSAGE_BASE + tok_h(t)) % PASSAGE_MOD,
                toks[s : s + 8], 0,
            )
            for s in range(len(toks) - 7)
        ] if len(toks) >= 8 else []
    counts = Counter(h for ws in win_of.values() for h in ws)
    for i, _ in docs:
        ws = win_of[i]
        if not ws:
            assert i not in got
            continue
        nd = sum(1 for h in ws if counts[h] > 1)
        assert got[i] == (len(ws), nd, nd / len(ws)), i
    assert got[4][1] >= 1  # the planted shared window is flagged everywhere


def test_bigram_pmi_matches_counter(docs_df):
    from parallelcovertree_spark.operators.corpus import bigram_pmi

    # python twin over RAW adjacency (pairs touching an empty token dropped)
    uni = Counter(t for _, text, _ in DOCS for t in _toks(text))
    n_tok = sum(uni.values())
    bg = Counter()
    for _, text, _ in DOCS:
        raw = text.split(" ")
        for a, b in zip(raw, raw[1:]):
            if a and b:
                bg[(a, b)] += 1
    want = sorted(
        (
            (-(c * n_tok) / (uni[w1] * uni[w2]), w1, w2, c)
            for (w1, w2), c in bg.items()
            if c >= 2
        ),
    )[:10]
    got = bigram_pmi(docs_df, min_count=2, k=10).collect()
    assert len(got) == len(want)
    for row, (nscore, w1, w2, c) in zip(got, want):
        assert (row["w1"], row["w2"], row["cnt"]) == (w1, w2, c)
        assert (row["c1"], row["c2"]) == (uni[w1], uni[w2])
        assert row["pmi_score"] == pytest.approx(-nscore, rel=1e-12)


def test_bigram_pmi_collocation_outranks_frequent_pair(spark):
    from parallelcovertree_spark.operators.corpus import bigram_pmi

    # "hong kong" always co-occurs; "the end" pairs two frequent words
    docs = [(i, "hong kong the end the story the") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bigram_pmi(df, min_count=1, k=20).collect()
    order = [(r["w1"], r["w2"]) for r in rows]
    assert order.index(("hong", "kong")) < order.index(("the", "end"))
