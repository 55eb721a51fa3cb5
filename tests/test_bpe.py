"""Real merge-table BPE (functions/bpe.py) vs a pure-python reference."""

from __future__ import annotations

from parallelcovertree_spark.functions.bpe import (
    PUA_BASE,
    apply_merges_col,
    bpe_token_count_col,
    learn_merges,
)

import pyspark.sql.functions as F


def _py_learn(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Reference learner: most frequent adjacent pair (no spaces), ties to
    the lexicographically smallest pair; each merge a fresh PUA symbol;
    replacement left-to-right non-overlapping (str.replace semantics)."""
    cur = [t.lower() for t in texts]
    merges = []
    for m in range(n_merges):
        counts: dict[str, int] = {}
        for s in cur:
            for i in range(len(s) - 1):
                p = s[i : i + 2]
                if " " not in p:
                    counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        tok = chr(PUA_BASE + m)
        merges.append((best, tok))
        cur = [s.replace(best, tok) for s in cur]
    return merges


def _py_apply(text: str, merges: list[tuple[str, str]]) -> str:
    s = text.lower()
    for pair, tok in merges:
        s = s.replace(pair, tok)
    return s


CORPUS = [
    "the cat sat on the mat",
    "the hat on the cat",
    "that cat that sat",
    "a banana and a bandana",
    "scan the table then scan the batch",
]


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_learned_merges_match_reference(spark):
    df = _df(spark, CORPUS)
    got = learn_merges(df, n_merges=8, sample_ids=100)
    assert got == _py_learn(CORPUS, 8)
    # merges never contain the separator symbol
    assert all(" " not in pair for pair, _ in got)


def test_application_matches_reference(spark):
    df = _df(spark, CORPUS)
    merges = learn_merges(df, n_merges=8, sample_ids=100)
    rows = df.select(
        "doc_id",
        apply_merges_col("text", merges).alias("s"),
        bpe_token_count_col("text", merges).alias("n"),
    ).collect()
    for r in rows:
        want = _py_apply(CORPUS[r.doc_id], merges)
        assert r.s == want
        assert r.n == len(want)


def test_greedy_left_to_right_convention(spark):
    """'aaaa' with merge (a,a) tokenizes as [aa][aa]; 'aaa' as [aa][a] —
    the left-to-right non-overlapping REPLACE convention on both engines."""
    df = _df(spark, ["aaaa aaa"])
    merges = learn_merges(df, n_merges=1, sample_ids=100)
    assert merges[0][0] == "aa"
    n = df.select(bpe_token_count_col("text", merges).alias("n")).collect()[0].n
    # 'aaaa aaa' -> 'XX XA'.. i.e. X X space X a = 5 symbols
    assert n == 5


def test_merges_are_hierarchical(spark):
    """A later merge may fuse an earlier merged symbol with another symbol
    (that is what makes BPE build multi-char subwords)."""
    texts = ["abab abab abab", "abc abc"]
    df = _df(spark, texts)
    merges = learn_merges(df, n_merges=3, sample_ids=100)
    assert merges == _py_learn(texts, 3)
    pua = {tok for _, tok in merges}
    assert any(p[0] in pua or p[1] in pua for p, _ in merges[1:])


def test_sample_bound_is_respected(spark):
    """Docs outside the sample (doc_id >= sample_ids) must not influence
    the learned table."""
    texts = ["zz zz zz zz"] * 3 + ["qq qq qq qq qq qq"]
    df = _df(spark, texts)
    merges = learn_merges(df, n_merges=1, sample_ids=3)  # 'qq' doc excluded
    assert merges[0][0] == "zz"


def test_empty_and_single_char_docs(spark):
    df = _df(spark, ["", "a", "the the the"])
    merges = learn_merges(df, n_merges=2, sample_ids=100)
    rows = {
        r.doc_id: r.n
        for r in _df(spark, ["", "a", "the the the"])
        .select("doc_id", bpe_token_count_col("text", merges).alias("n"))
        .collect()
    }
    assert rows[0] == 0 and rows[1] == 1
    assert rows[2] == len(_py_apply("the the the", merges))


def test_early_exhaustion_matches_oracle(spark):
    """A corpus whose sample exhausts mergeable pairs before n_merges:
    learn_merges breaks early, and the SQL twin's empty later stages must
    no-op (COALESCE sentinel) instead of NULL-poisoning the replay."""
    import duckdb

    from parallelcovertree_spark.functions.bpe import apply_sql, learning_cte_sql

    rows = [(0, "ab ab"), (1, "ab"), (2, "b a")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = learn_merges(docs, n_merges=8, sample_ids=10)
    assert 0 < len(merges) < 8  # genuinely exhausted before the budget

    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count_col("text", merges).alias("n")
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (0,'ab ab'),(1,'ab'),"
        "(2,'b a')) t(doc_id, text)"
    )
    sql = (
        f"WITH {learning_cte_sql(n_merges=8, sample_ids=10)}\n"
        f"SELECT doc_id, CAST(LENGTH({apply_sql('LOWER(text)', n_merges=8)}) AS BIGINT)"
        " AS n FROM documents"
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want and all(v is not None for v in want.values())
