"""Corpus-level term statistics for training-data pipelines.

The operators a web-scale LM-data pipeline runs over its document table after
dedup/quality filtering: vocabulary document-frequency, per-document TF-IDF
term selection, repetition-based quality stats (the Gopher/C4 family of
filters), benchmark-contamination screening, and deterministic stratified
sampling for language rebalancing.

All plans are pure Catalyst (JVM codegen, no Python in the hot path) and
follow the two-level aggregation pattern: tokens are first combined per
(doc_id, term) — map-side partial aggregation absorbs the explode fan-out —
and only the compact per-doc-term counts shuffle on the term key. At 100 TB
the shuffle volume is bounded by the distinct (doc, term) pair count, never
by raw token volume.

Cross-engine parity: every output value is an integer, a string, or a double
produced by one IEEE division of two integers, so DuckDB oracles match
bit-for-bit. The stratified sampler keys on sha2-256 (identical hex in both
engines) — deterministic, partition-count-independent, and reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "content_bucket",
    "doc_commonness",
    "doc_term_freq",
    "term_doc_freq",
    "tfidf_top_terms",
    "bm25_top_terms",
    "corpus_bigrams",
    "bigram_pmi",
    "repetition_stats",
    "contamination_check",
    "ngram_contamination",
    "sequence_packing",
    "stratified_sample",
]


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per token occurrence. Empty tokens (double spaces) dropped on
    both engine and oracle sides."""
    return (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .where(F.col("term") != "")
    )


def doc_term_freq(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf): per-document term frequency.

    The explode fan-out is absorbed by map-side partial aggregation on
    (doc_id, term) — within an input partition a document's tokens are
    co-located, so the shuffle carries one row per distinct (doc, term)."""
    return _tokens(docs, text_col, id_col).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def term_doc_freq(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, doc_freq, total_tf): vocabulary document-frequency table.

    Built from the per-doc tf table (not raw tokens), so the term-keyed
    shuffle moves distinct (doc, term) rows only. doc_freq is a plain count
    (no countDistinct expansion) because the input is already distinct per
    (doc, term)."""
    tf = doc_term_freq(docs, text_col, id_col)
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )


def doc_commonness(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sum_df, n_tok, commonness) — average corpus document
    frequency of a document's token occurrences: the corpus-statistics
    quality signal (very low ⇒ rare/garbled vocabulary, very high ⇒
    boilerplate) a pipeline thresholds where an LM-perplexity filter would
    sit, but with exact integer counts and ONE IEEE division, so it is
    oracle-checkable (no transcendentals, per the registry discipline).

    One token pass: the per-doc tf table feeds BOTH the term-df aggregate
    and the scoring join (the shared-lineage rule from tfidf_top_terms) —
    shuffles carry distinct (doc, term) rows, then term-keyed join rows,
    never raw tokens."""
    tf = doc_term_freq(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        tf.join(dfreq, "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("doc_freq")).alias("sum_df"),
            F.sum("tf").alias("n_tok"),
        )
        .select(
            id_col,
            "sum_df",
            "n_tok",
            (F.col("sum_df").cast("double") / F.col("n_tok")).alias("commonness"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf, doc_freq, rank): top-k TF-IDF terms per document.

    Score order is tf/df (equivalent to tf·idf for ranking — the corpus-size
    factor is constant per corpus); computed as one IEEE double division of
    two bigints so rank ties and orderings are bit-identical cross-engine.
    Ties broken by term. The tf⋈df join shuffles both sides on the term key
    (hash join, no broadcast assumption: at web scale the vocabulary —
    hapaxes included — does not fit a broadcast)."""
    # ONE token pass: df derives from the same tf lineage (mirrors the
    # oracle's shared tf CTE) — building df via term_doc_freq(docs) would
    # tokenize and aggregate the corpus twice
    tf = doc_term_freq(docs, text_col, id_col)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = tf.join(df, "term").withColumn(
        "_score", F.col("tf").cast("double") / F.col("doc_freq")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "rank")
    )


def bm25_top_terms(
    docs: DataFrame,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term, tf, doc_freq, dl, rank): top-k BM25 terms per document.

    BM25 with a *rational* idf — (N − df + 0.5)/(df + 0.5), the Robertson-
    Spärck-Jones odds WITHOUT the log. The log is monotone per term so
    per-term score ORDER is unchanged; dropping it keeps every arithmetic
    op an IEEE-exact expression over exact integers (counts, doc lengths),
    which is what makes the DuckDB oracle bit-identical — ln() is not
    correctly rounded across libms. Length normalization is the standard
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Same shuffle discipline as tfidf_top_terms: tf and df derive from one
    token pass; tf⋈df shuffles on the term key (vocabulary never assumed
    broadcastable at web scale); doc lengths ride the same tf lineage via a
    doc-keyed re-aggregation, and avgdl is one broadcast scalar row."""
    tf = doc_term_freq(docs, text_col, id_col)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    gstats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(df, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(gstats))
    )
    # fixed expression tree over exact ints — mirrored in the oracle SQL
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (
        (F.col("n_docs") - F.col("doc_freq")).cast("double") + F.lit(0.5)
    ) / (F.col("doc_freq").cast("double") + F.lit(0.5))
    tfd = F.col("tf").cast("double")
    norm = tfd * F.lit(k1 + 1.0) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc(idf * norm), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "dl", "rank")
    )


def corpus_bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(bigram, cnt, doc_freq): corpus word-bigram statistics — the n-gram
    table behind contamination screens and n-gram LM baselines.

    Bigrams form over RAW token adjacency inside the array (no cross-doc
    pairs); a pair touching an empty token (double space) is dropped, so a
    run-length break never fabricates an adjacency. The whole extraction is
    one codegen higher-order-function pass (split → transform+filter →
    explode): tokens never leave the JVM, and the shuffle carries per-doc
    bigram partials only (map-side combine on the groupBy)."""
    toks = docs.select(id_col, F.split(F.col(text_col), " ").alias("toks"))
    pairs = toks.select(
        id_col,
        F.explode(
            F.expr(
                "filter(transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> IF(t <> '' AND toks[i + 1] <> '',"
                " concat(t, ' ', toks[i + 1]), NULL)), x -> x IS NOT NULL)"
            )
        ).alias("bigram"),
    )
    per_doc = pairs.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("bigram").agg(
        F.sum("tf").alias("cnt"), F.count(F.lit(1)).alias("doc_freq")
    )


def bigram_pmi(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information: the classic
    multi-word-expression / tokenizer-merge-candidate pass (Church & Hanks
    1990) over word bigrams with corpus count ≥ ``min_count``.

    Ranking is by the RATIONAL PMI core c_xy·N / (c_x·c_y) — log dropped as
    globally monotone, so ``pmi_score`` is ONE IEEE division of two exact
    BIGINT products and ranks are bit-identical cross-engine (the BM25
    discipline). Integer range: c_xy ≤ N and c_x·c_y ≤ N², so N must stay
    below ~3·10⁹ tokens per product — at larger corpora rescale counts or
    move the product to DECIMAL (documented, not silently lossy).

    Plan: one HOF pass extracts adjacent pairs (tokens never leave the JVM),
    one token pass builds unigram counts; the candidate set is filtered by
    ``min_count`` BEFORE the two term-keyed hash joins (vocabulary never
    assumed broadcastable); global top-k via orderBy+limit = TakeOrdered
    (per-partition partials, no single-task window). (w1, w2) uniqueness
    makes the k-boundary deterministic.
    """
    toks = docs.select(F.split(F.col(text_col), " ").alias("toks"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "filter(transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> IF(t <> '' AND toks[i + 1] <> '',"
                " named_struct('w1', t, 'w2', toks[i + 1]), NULL)),"
                " x -> x IS NOT NULL)"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    uni = _tokens(docs, text_col, id_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = uni.agg(F.sum("c").alias("n_tok"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    s = (
        bg.where(F.col("cnt") >= F.lit(int(min_count)))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
    )
    pmi = (F.col("cnt") * F.col("n_tok")).cast("double") / (
        F.col("c1") * F.col("c2")
    ).cast("double")
    return (
        s.select("w1", "w2", "cnt", "c1", "c2", pmi.alias("pmi_score"))
        .orderBy(F.desc("pmi_score"), "w1", "w2")
        .limit(int(k))
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, top_tf, dup_ratio): Gopher-style
    repetition quality profile. dup_ratio = (n_tokens - n_distinct)/n_tokens
    — the fraction of tokens that repeat an earlier token; high values flag
    boilerplate/spam for corpus filtering (Rae et al. 2021 §A1 style)."""
    tf = doc_term_freq(docs, text_col, id_col)
    agg = tf.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("tf").alias("top_tf"),
    )
    return agg.withColumn(
        "dup_ratio",
        (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col("n_tokens"),
    )


def sequence_packing(
    docs: DataFrame, block: int = 1024, text_col: str = "text",
    id_col: str = "doc_id", shard_col: str = "lang",
    token_count: Column | None = None,
) -> DataFrame:
    """Training-sequence assembly (concat-then-chunk): within each shard,
    documents concatenate in id order and split into fixed ``block``-token
    sequences; each doc reports where its tokens land —
    (doc_id, shard, n_tokens, start_seq, start_offset, end_seq).

    Pure integer window math (running token sum per shard), so parity is
    exact. Sharding is the scale story: packing is order-dependent, so the
    global order is (shard, id) and the window sorts WITHIN shards —
    per-shard parallel sort, no global single-partition sort. Docs may span
    sequence boundaries (start_seq < end_seq), which is the standard
    LM-pretraining packing semantics."""
    # NON-EMPTY token count — must agree with this module's tokenizer
    # (_tokens drops empty split results): the spaces+1 formula would count
    # phantom tokens on double-space/empty docs and shift every later doc's
    # packing position in the shard. ``token_count`` overrides the
    # denomination (e.g. real BPE counts, functions/bpe.py) — packing math
    # below is tokenizer-agnostic integer window arithmetic.
    tok = (
        token_count.cast("long")
        if token_count is not None
        else F.expr(
            f"CAST(size(filter(split({text_col}, ' '), x -> x != '')) AS BIGINT)"
        )
    )
    w = Window.partitionBy(shard_col).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = docs.select(id_col, shard_col, tok.alias("n_tokens"))
    d = d.withColumn("_cum", F.sum("n_tokens").over(w))
    d = d.withColumn("_start", F.col("_cum") - F.col("n_tokens"))
    # integer division on BOTH engines (DuckDB's double->int CAST rounds,
    # Spark's truncates — never divide then cast)
    # greatest(.., _start) pins zero-token docs to end_seq == start_seq
    # instead of a degenerate previous-block id
    return d.select(
        id_col, shard_col, "n_tokens",
        F.expr(f"_start DIV {block}").alias("start_seq"),
        F.expr(f"_start % {block}").alias("start_offset"),
        F.expr(f"greatest(_cum - 1, _start) DIV {block}").alias("end_seq"),
    )


def ngram_contamination(
    docs: DataFrame, eval_texts: list[tuple[int, str]], n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, eval_id, n_shared): docs sharing any word n-gram with an
    eval-set text — the published n-gram-overlap contamination method
    (GPT-3 appendix C uses 13-grams; n is a parameter). Doc n-grams build
    in one codegen HOF pass, eval n-grams broadcast (eval sets are small
    by definition); the join is an n-gram equi-join, so cost is
    (matching n-grams), never docs × evals."""
    spark = docs.sparkSession
    ev = spark.createDataFrame(eval_texts, "eval_id INT, etext STRING")

    # n-grams from the split array; grams touching an empty token dropped
    def gram_rows(df: DataFrame, idc: str, col: str, out: str) -> DataFrame:
        toks = df.select(idc, F.split(F.col(col), " ").alias("_t"))
        return toks.select(
            idc,
            F.explode(
                F.expr(
                    f"filter(transform(slice(_t, 1, greatest(size(_t) - {n - 1}, 0)),"
                    f" (x, i) -> IF(exists(slice(_t, i + 1, {n}), e -> e = ''),"
                    f" NULL, concat_ws(' ', slice(_t, i + 1, {n})))), x -> x IS NOT NULL)"
                )
            ).alias(out),
        ).distinct()

    dg = gram_rows(docs, id_col, text_col, "g")
    eg = gram_rows(ev, "eval_id", "etext", "g")
    return (
        dg.join(F.broadcast(eg), "g")
        .groupBy(id_col, "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def contamination_check(
    docs: DataFrame, fragments: list[tuple[int, str]], text_col: str = "text",
    id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, frag_id): documents containing any benchmark fragment as a
    raw substring — eval-set contamination screening.

    Plan: broadcast nested-loop join of the (tiny, fixed) fragment list
    against the corpus scan with a codegen `instr` predicate — one corpus
    pass, no shuffle. Substring (not token) semantics: a fragment crossing
    token boundaries still hits, matching how eval strings leak into crawls.
    For fragment lists beyond a few thousand, swap the inner predicate for an
    Aho-Corasick pandas-UDF pass (same output contract)."""
    spark = docs.sparkSession
    frags = spark.createDataFrame(fragments, "frag_id INT, frag STRING")
    return (
        docs.join(F.broadcast(frags), F.expr(f"instr({text_col}, frag) > 0"))
        .select(id_col, "frag_id")
    )


def content_bucket(text_col: str = "text") -> F.Column:
    """32-bit content bucket: first 8 hex digits of sha2-256(text) as a
    bigint. THE shared key for deterministic sampling and split assignment
    (DuckDB twin: CAST(CAST('0x' || substr(sha256(text),1,8) AS UBIGINT) AS
    BIGINT)) — one definition, used by stratified_sample, corpus_splits,
    and training_manifest."""
    return F.conv(F.substring(F.sha2(F.col(text_col), 256), 1, 8), 16, 10).cast("bigint")


def stratified_sample(
    docs: DataFrame, lang_thresholds: dict[str, int], default_threshold: int,
    text_col: str = "text", id_col: str = "doc_id", lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, lang, bucket): deterministic per-language downsampling.

    A doc is kept iff its 32-bit content bucket — the first 8 hex digits of
    sha2-256(text) — is below its language's threshold (rate·2^32). Content
    hashing (not doc_id) makes the sample stable under re-ingestion and
    re-partitioning, and exact duplicates sample identically, so the sampled
    corpus needs no re-dedup. Pure map-side filter: no shuffle, and the
    predicate sits in the scan's codegen stage."""
    bucket = content_bucket(text_col)
    thr = F.lit(default_threshold)
    for lang, t in sorted(lang_thresholds.items()):
        thr = F.when(F.col(lang_col) == lang, F.lit(t)).otherwise(thr)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < thr)
        .select(id_col, lang_col, "bucket")
    )
