"""Document deduplication operators (training-pipeline surface).

Four families, all shuffle-conscious:

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
