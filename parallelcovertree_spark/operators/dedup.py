"""Document deduplication operators (training-pipeline surface).

Five families, all shuffle-conscious:

- **exact**: hash-groupBy on content (registry.exact_dedup).
- **MinHash + LSH**: signature → band buckets → per-band equi-join
  (registry.minhash_signatures / minhash_dup_pairs).
- **SimHash**: 16-bit majority fingerprint over token hashes; candidate pairs
  via *band pigeonhole* — hamming(a,b) ≤ 3 with 4 bands of 4 bits ⇒ at least
  one band identical, so a 4-way band equi-join finds ALL such pairs exactly
  (no quadratic compare at scale), then the hamming filter verifies.
- **n-gram Jaccard**: word-trigram shingle similarity, verified only on
  LSH candidate pairs (the realistic pipeline: candidates from cheap hashes,
  exact verify on the short list).
- **cluster labeling**: candidate pairs → connected components (min-label
  propagation) → keeper per cluster (``dedup_clusters``), oracle-checked
  against a DuckDB recursive CTE.

Token hash is the portable ascii/length hash (functions.text.TOKEN_HASH_SQL)
so DuckDB oracles reproduce every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.functions.text import TOKEN_HASH_SQL

SIMHASH_BITS = 16
SIMHASH_BANDS = 4  # 4 bands × 4 bits; hamming ≤ SIMHASH_BANDS-1 ⇒ band match


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))


# duplicate-passage detection (Lee et al. 2022 exact-substring dedup, at
# token-window granularity): polynomial rolling hash mod a prime, portable
# token hash, so candidates are identical cross-engine
PASSAGE_W = 8
PASSAGE_MOD = 1_000_000_007
PASSAGE_BASE = 131


def dup_passages(
    docs: DataFrame,
    w: int = PASSAGE_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_ratio) — per-doc count of
    length-``w`` token windows whose hash occurs more than once in the
    corpus (the candidate stage of exact-substring dedup: a pipeline drops
    or trims documents whose dup_ratio crosses a threshold).

    One codegen HOF projection computes every window hash inside the scan
    stage — ``transform(sequence(...)) → aggregate(slice(...))``, O(n·w)
    JVM work per doc, tokens never leave the executor — then one hash-keyed
    count (map-side partials absorb the hot boilerplate windows) and one
    join back. Candidates, not proof: distinct windows may collide
    (~w/10⁹ per pair); the same rule runs on both engines so the gate is
    still bit-exact. Docs with fewer than ``w`` tokens have no windows and
    are absent from the output (the oracle replays the same rule)."""
    tok_h = TOKEN_HASH_SQL.format(tok="t")
    arr = f"filter(split({text_col}, ' '), t -> t <> '')"
    # hash each token ONCE (string ops are the expensive element step in an
    # interpreted HOF), then fold 8 ints per window over the precomputed
    # array — measured 8× over hashing inside the window fold
    tokh = f"transform({arr}, t -> CAST({tok_h} AS BIGINT))"
    hashes = (
        f"IF(size(th) >= {w}, "
        f"transform(sequence(1, size(th) - {w} + 1), "
        f"i -> aggregate(slice(th, i, {w}), CAST(0 AS BIGINT), "
        f"(acc, hv) -> (acc * {PASSAGE_BASE} + hv) % {PASSAGE_MOD})), "
        f"array())"
    )
    wins = docs.select(
        F.col(id_col), F.expr(tokh).alias("th")
    ).select(F.col(id_col), F.explode(F.expr(hashes)).alias("h"))
    counts = wins.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        wins.join(counts, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.col("n_dup_windows").cast("double") / F.col("n_windows"),
        )
    )


def dup_passages_np(
    docs: DataFrame,
    w: int = PASSAGE_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Independent numpy twin of :func:`dup_passages`: identical window-hash
    rule (the SAME DuckDB oracle checks it bit-for-bit), implemented as a
    vectorized mapInPandas kernel instead of the Catalyst HOF.

    MEASURED VERDICT (50k docs, local[32], medians): the HOF op wins —
    12.6s vs 16.4s — because the Arrow round-trip of ~2.7M token/window
    rows through the Python workers outweighs the interpreted-HOF fold
    cost that stays JVM-side; kernel micro-optimizations (U1 codepoint
    views replacing the padded matrix) did not move the number. So unlike
    the minhash pair, the SQL-parity op IS the production plan here, and
    this twin's value is independent cross-validation of the hash rule
    (two implementations, one oracle).

    Kernel, fully vectorized (no per-token Python): tokens of the whole
    Arrow batch flatten into one array; first/last codepoints come from
    single-character slices viewed as UCS4 uint32 (width-1 — no padded
    rows×max_len matrix needed); window hashes are a sum of ``w``
    shifted-and-scaled copies of the token-hash vector
    (Σ h[s+j]·131^(w-1-j), every intermediate < 2⁶³) masked at document
    boundaries. Downstream counts/join are the same Catalyst stages as the
    SQL-parity op."""
    import numpy as np
    import pandas as pd

    coefs = np.array(
        [pow(PASSAGE_BASE, w - 1 - j, PASSAGE_MOD) for j in range(w)],
        dtype=np.int64,
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            split = pdf[text_col].str.split(" ")
            toks_per_doc = split.map(len).to_numpy(np.int64)
            flat = pd.Series(
                np.concatenate(split.to_numpy()) if len(split) else [],
                dtype=object,
            )
            doc_of = np.repeat(pdf[id_col].to_numpy(np.int64), toks_per_doc)
            keep = flat.str.len().to_numpy(np.int64) > 0
            flat, doc_of = flat[keep].reset_index(drop=True), doc_of[keep]
            m = len(flat)
            if m < w:
                yield pd.DataFrame({"doc_id": [], "h": []}).astype(np.int64)
                continue
            # vectorized first/last codepoint + length: single-char slices
            # viewed as UCS4 (width-1 matrices — no padded rows×max_len
            # matrix, no length bucketing needed)
            lens = flat.str.len().to_numpy(np.int64)
            first_cp = (
                np.asarray(flat.str[0], dtype="U1").view(np.uint32).astype(np.int64)
            )
            last_cp = (
                np.asarray(flat.str[-1], dtype="U1").view(np.uint32).astype(np.int64)
            )
            th = first_cp * 961 + last_cp * 31 + lens
            # window hashes: sum of w shifted copies, doc-boundary masked
            n_win = m - w + 1
            acc = np.zeros(n_win, dtype=np.int64)
            for j in range(w):
                acc += (th[j : j + n_win] % PASSAGE_MOD) * coefs[j] % PASSAGE_MOD
            acc %= PASSAGE_MOD
            valid = doc_of[:n_win] == doc_of[w - 1 :]
            yield pd.DataFrame(
                {"doc_id": doc_of[:n_win][valid], "h": acc[valid]}
            )

    wins = docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id bigint, h bigint"
    )
    counts = wins.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        wins.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.col("n_dup_windows").cast("double") / F.col("n_windows"),
        )
    )


def dup_passages_oracle_sql(w: int = PASSAGE_W) -> str:
    """DuckDB replay: the polynomial hash as a positional-coefficient SUM
    (Σ h_j·131^(w-1-j) mod M — algebraically identical to the engine's
    left-fold, every intermediate bounded far below 2⁶³)."""
    tok_h = TOKEN_HASH_SQL.format(tok="t.term")
    coef = " ".join(
        f"WHEN t.pos - s.pos = {k} THEN {pow(PASSAGE_BASE, w - 1 - k, PASSAGE_MOD)}"
        for k in range(w)
    )
    return f"""WITH toks AS (
  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS term
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ls
        FROM documents)
),
nt AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
starts AS (
  SELECT t.doc_id, t.pos FROM toks t JOIN nt USING (doc_id)
  WHERE t.pos <= nt.n - {w} + 1
),
wins AS (
  SELECT s.doc_id, s.pos AS start,
         SUM((({tok_h}) * (CASE {coef} END)) % {PASSAGE_MOD}) % {PASSAGE_MOD} AS h
  FROM starts s JOIN toks t
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.pos AND s.pos + {w - 1}
  GROUP BY 1, 2
),
counts AS (SELECT h, COUNT(*) AS c FROM wins GROUP BY h)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(CASE WHEN counts.c > 1 THEN 1 END) AS BIGINT) AS n_dup_windows,
       CAST(COUNT(CASE WHEN counts.c > 1 THEN 1 END) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM wins w JOIN counts USING (h) GROUP BY w.doc_id"""


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — per-bit majority vote over token hashes.
    One explode + one groupBy: map-side partial aggregation does the heavy
    lifting (SURVEY A1 partial/final pattern)."""
    t = tokens(docs, id_col, text_col)
    h = F.expr(TOKEN_HASH_SQL.format(tok="tok")).cast("long")
    aggs = []
    for b in range(SIMHASH_BITS):
        vote = (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)
        aggs.append(F.sum(vote).alias(f"s{b}"))
    voted = t.groupBy(id_col).agg(*aggs)
    sh = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sh = sh + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return voted.select(id_col, sh.alias("simhash"))


def simhash_dup_pairs(
    docs: DataFrame, max_hamming: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """All pairs with hamming(simhash) ≤ max_hamming (exact, via band
    pigeonhole — requires max_hamming < SIMHASH_BANDS).

    Physical plan: explode each fingerprint into (band_idx, band_key) rows,
    self-join on the composite key — ONE shuffle for all bands (identical
    join-side subplans → Catalyst ReuseExchange materializes the shuffle
    once; no persist to leak), hamming verify inside the join."""
    assert max_hamming < SIMHASH_BANDS
    sh = simhash(docs, id_col, text_col)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_width) - 1
    bands = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(band).alias("band"),
                    F.shiftright(F.col("simhash"), band * band_width)
                    .bitwiseAND(F.lit(mask))
                    .alias("bk"),
                )
                for band in range(SIMHASH_BANDS)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.bk")
    a = bands.select(F.col(id_col).alias("src"), F.col("simhash").alias("ha"), "band", "bk")
    b = bands.select(F.col(id_col).alias("dst"), F.col("simhash").alias("hb"), "band", "bk")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, ["band", "bk"])
        .where((F.col("src") < F.col("dst")) & (ham <= max_hamming))
        .select("src", "dst")
        .distinct()
    )


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle_set array<string>) — distinct word n-grams, built with
    Catalyst higher-order functions (no UDF)."""
    t = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + k + 1) for k in range(n)]),
    )
    return docs.where(F.size(t) >= n).select(
        id_col, F.array_distinct(grams).alias("shingle_set")
    )


def jaccard_verify(
    docs: DataFrame, candidates: DataFrame, threshold: float, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard over candidate (src, dst) pairs → pairs ≥ threshold,
    with the score. Broadcast-friendly: shingle sets joined onto the (already
    pruned) candidate list, set ops in Catalyst."""
    sh = shingles(docs, n, id_col, text_col)
    a = sh.select(F.col(id_col).alias("src"), F.col("shingle_set").alias("sa"))
    b = sh.select(F.col(id_col).alias("dst"), F.col("shingle_set").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    jac = inter.cast("double") / union.cast("double")
    return (
        candidates.join(a, "src").join(b, "dst")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("src", "dst", "jaccard")
    )


# --- engine-grade MinHash (numpy kernel, parameterized) -------------------------
# The SQL-parity MinHash above (registry.minhash_*) is deliberately tiny
# (4 perms / 2 bands, weak ascii token hash) so DuckDB reproduces it
# bit-for-bit. This is the path you would run at 100 TB: 64-bit SipHash token
# hashing (pandas hash_array — C-vectorized, deterministic), n_perm
# universal-hash permutations in uint64 wraparound arithmetic, r-row/b-band
# LSH keys, one shuffle for all bands. No per-row Python: tokens flatten into
# one array per Arrow batch, per-doc minima via np.minimum.reduceat.

def _perm_coeffs(n_perm: int):
    import numpy as np

    rng = np.random.default_rng(17)  # fixed: signatures are part of the contract
    a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_np(
    docs: DataFrame,
    n_perm: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig array<long>) — engine-grade MinHash signatures.

    Per Arrow batch: split → flatten all tokens of the batch into ONE object
    array → ``pd.util.hash_array`` (64-bit, deterministic) → per permutation
    compute ``a·h + b`` (uint64 wraparound — a valid universal family for
    min-hashing) over the flat token vector and take per-document minima
    with 1-D ``np.minimum.reduceat``. Memory is bounded by
    ``tokens_in_batch × 8`` bytes of temp per permutation.
    """
    import numpy as np
    import pandas as pd

    a_all, b_all = _perm_coeffs(n_perm)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            toks = pdf[text_col].str.split(" ")
            lens = toks.str.len().to_numpy(np.int64)
            flat = pd.util.hash_array(toks.explode().to_numpy()).astype(np.uint64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            sig = np.empty((len(pdf), n_perm), dtype=np.uint64)
            # one permutation at a time, 1-D: a (tokens × chunk) matrix with
            # axis-0 reduceat is 22× slower (strided inner loop + a GB-sized
            # temp); the 1-D form is contiguous and peaks memory at
            # tokens × 8B (measured 0.52s vs 11.7s per 16 perms @ 8M tokens)
            for j in range(n_perm):
                sig[:, j] = np.minimum.reduceat(
                    flat * a_all[j] + b_all[j], starts  # uint64 wraparound
                )
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(np.int64),
                "sig": list(sig.view(np.int64)),
            })

    src = docs.select(id_col, text_col)
    # small corpora arrive as one parquet split → the whole hash kernel runs
    # on ONE core; widen to the session's parallelism (no-op at scale, where
    # the scan already has ≥ that many splits). Streaming inputs skip the
    # probe (`.rdd` is illegal on a streaming DataFrame; micro-batch
    # parallelism is the source's concern).
    if not docs.isStreaming:
        target = docs.sparkSession.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < target:
            src = src.repartition(target)
    return src.mapInPandas(kernel, "doc_id long, sig array<long>")


def minhash_dup_pairs_np(
    docs: DataFrame,
    n_perm: int = 128,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs from engine-grade signatures: b bands × r rows
    (r = n_perm // bands), band key = xxhash64 over the signature slice
    (JVM-side), all bands in ONE schema-identical self-join on
    (band, key) — AQE reuses the signature shuffle stage, shuffle_hash
    avoids the exploded-side broadcast trap. Probability a pair with
    Jaccard s becomes a candidate: 1 - (1 - s^r)^b.

    Output is distinct-BY-CONSTRUCTION (min-band-wins): each exploded row
    carries the full band-key array and a pair is emitted only from the
    FIRST band where its keys agree (``zip_with``+``exists`` over the
    earlier-band prefix, Catalyst higher-order fns — JVM-side). On a
    dup-dense corpus a near-exact pair matches in most of the b bands, so
    this cuts the join output b-fold AND removes the terminal
    ``.distinct()`` shuffle+aggregate over the pair set. Cost: b·8 extra
    bytes per exploded row in the band shuffle — O(docs·b²·8) total,
    independent of the (quadratic-ish) pair volume it replaces."""
    assert n_perm % bands == 0
    r = n_perm // bands
    sigs = minhash_signatures_np(docs, n_perm, id_col, text_col)
    bt = sigs.select(
        "doc_id",
        F.array(*[
            F.xxhash64(F.slice("sig", band * r + 1, r)) for band in range(bands)
        ]).alias("bks"),
    ).select("doc_id", "bks", F.posexplode("bks").alias("band", "bk"))
    a, b = bt.alias("a").hint("shuffle_hash"), bt.alias("b").hint("shuffle_hash")
    # unrolled short-circuit OR of scalar array-index compares: per joined
    # row this is flat codegen with no array allocation (a zip_with/slice
    # formulation measured 1.5x slower end-to-end — per-row array temps)
    earlier_band_match = F.lit(False)
    for j in range(bands - 1):
        earlier_band_match = earlier_band_match | (
            (F.col("a.band") > j)
            & (F.col("a.bks").getItem(j) == F.col("b.bks").getItem(j))
        )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & ~earlier_band_match,
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 25
) -> DataFrame:
    """(node, cluster_id) — min-label propagation over undirected pairs.

    The dedup-cluster step: near-dup candidate pairs become components, the
    minimum doc id is the canonical cluster id (= keeper). Each iteration is
    one hash join + min-aggregate (neighbor label propagation) PLUS one
    pointer-doubling jump (label ← label(label)) — the doubling halves path
    lengths each round, so a diameter-d chain converges in O(log d) rounds
    instead of O(d) (templated page chains no longer exhaust max_iters;
    2^max_iters diameter is unreachable). Deterministic fixpoint (exact min
    per component — both steps are monotone non-increasing and preserve the
    component-min invariant), verified against a DuckDB recursive CTE.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr = und.join(labels, und.b == labels.node).select(
            F.col("a").alias("node"), "label"
        )
        prop = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # both sides of the jump join read prop — checkpoint so the
            # propagation aggregate is computed once per round, not twice
            .localCheckpoint(eager=True)
        )
        # pointer doubling: every label IS a node id (labels start as node
        # ids and min() only keeps existing ids), so label(label(v)) is a
        # self-join (renamed columns — same-object alias self-joins trip
        # Spark's attribute resolution here).
        parent = prop.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            prop.join(parent, F.col("label") == F.col("p_node"))
            .groupBy("node")
            .agg(F.min("p_label").alias("label"))
        )
        # carry the previous label through the round's checkpoint so the
        # convergence test is a map-only scan of cached rows, not an extra
        # shuffle join of two checkpointed frames per round
        delta = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .select("node", F.col("n.label").alias("label"),
                    F.col("o.label").alias("_old"))
            .localCheckpoint(eager=True)
        )
        changed = delta.where(F.col("label") != F.col("_old")).count()
        labels = delta.select("node", "label")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id): every document labeled with its near-dup
    cluster's minimum doc id (its own id when it has no duplicates) — the
    keeper-selection step of the dedup pipeline."""
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id")
        )
    )


# --- exact-substring verify-and-trim (Lee et al. 2022, stage 2) ---------------


def dup_spans_trim(
    docs: "DataFrame",
    w: int = PASSAGE_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """(doc_id, n_tokens, n_removed_spans, n_removed_tokens, trimmed_sha):
    the verify/trim stage on top of :func:`dup_passages` — Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") stage 2.
    A length-``w`` token window is a VERIFIED duplicate when its content
    digest (sha2 of the space-joined window) occurs more than once in the
    corpus — content equality, not just rolling-hash candidacy, so hash
    collisions cannot trim good text. Every token covered by a verified
    window is removed; maximal runs of removed tokens are the spans;
    ``trimmed_sha`` is sha2-256 of the surviving tokens re-joined with
    single spaces (docs trimmed to nothing hash the empty string).

    Plan (scale shape):
    - ONE codegen HOF projection per doc computes all window digests inside
      the scan stage (tokens never leave the executor);
    - the only corpus-volume shuffle is the digest-keyed count — 32-byte
      fixed keys, map-side partials absorb hot boilerplate windows;
    - duplicated window STARTS flow back as one per-doc array (collect_set
      after the count join — output volume is dup windows, not windows);
    - trimming is again pure HOF arithmetic: coverage test per token index,
      span count from sorted starts (a break iff the gap between successive
      starts exceeds ``w`` — equal-length windows make coverage ends
      monotone), filter + re-join + sha2. No token-volume shuffle anywhere.

    Cites reference test discipline: programs/epsilon_graph.cpp ground-truth
    style — exact rule, replayed by the DuckDB oracle via gaps-and-islands.
    """
    arr = f"filter(split({text_col}, ' '), t -> t <> '')"
    win_d = (
        f"IF(size(tk) >= {w}, "
        f"transform(sequence(1, size(tk) - {w} + 1), "
        f"i -> sha2(array_join(slice(tk, i, {w}), ' '), 256)), "
        f"array())"
    )
    base = docs.select(F.col(id_col), F.expr(arr).alias("tk"))
    wins = base.select(
        F.col(id_col), F.posexplode(F.expr(win_d)).alias("p0", "d")
    ).select(F.col(id_col), (F.col("p0") + 1).alias("i"), "d")
    counts = wins.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    dup_starts = (
        wins.join(counts, "d")
        .where(F.col("c") > 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("i")).alias("ss"))
    )
    joined = base.join(dup_starts, id_col, "left").select(
        F.col(id_col),
        "tk",
        F.coalesce(F.col("ss"), F.expr("array()")).alias("ss"),
    )
    covered = (
        f"exists(ss, s -> s <= j + 1 AND j + 1 < s + {w})"
    )
    trimmed = f"filter(tk, (t, j) -> NOT ({covered}))"
    # size <= 1 guard: sequence(2, 1) would DESCEND in Spark and k-1 = 0
    # would hit the 1-based element_at under ANSI
    n_spans = (
        "IF(size(ss) <= 1, CAST(size(ss) AS BIGINT), "
        "1 + size(filter(sequence(2, size(ss)), "
        f"k -> element_at(ss, k) - element_at(ss, k - 1) > {w})))"
    )
    return joined.select(
        F.col(id_col),
        F.expr("size(tk)").cast("long").alias("n_tokens"),
        F.expr(n_spans).cast("long").alias("n_removed_spans"),
        F.expr(f"size(tk) - size({trimmed})").cast("long").alias("n_removed_tokens"),
        F.expr(f"sha2(array_join({trimmed}, ' '), 256)").alias("trimmed_sha"),
    )
