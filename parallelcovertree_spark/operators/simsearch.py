"""Similarity search over embedding columns (training-pipeline operators).

Approximate-nearest-neighbor surface for `array<float>` embeddings:

- ``cosine_topk``: exact brute-force cosine top-k — the correctness baseline
  (the reference's exact-ground-truth discipline, programs/epsilon_graph.cpp).
- ``lsh_buckets`` / ``lsh_neardup``: random-hyperplane LSH — the scale path.
  Hyperplane weights are *deterministic integers* from a hash formula, and
  embeddings are quantized to integers (round(v·10⁴)), so every score is
  exact integer arithmetic: bit-identical across Spark, DuckDB, and any
  summation order. That makes ANN results oracle-checkable — no FP-tolerance
  hand-waving.

All expressions are Catalyst higher-order functions (``transform`` /
``zip_with`` / ``aggregate``) — JVM-side, no Python in the hot path.
The cross-join baseline is quadratic by definition (test scale); the LSH
bucket join is the 100 TB plan: one shuffle on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000
_WA = 2654435761
_WB = 2246822519
_WM = 1_000_003
_WOFF = 500_001


def plane_weight(i: int, p: int) -> int:
    """Deterministic hyperplane weight for 1-based dim index i, plane p."""
    return (i * _WA + (p + 1) * _WB) % _WM - _WOFF


def quantize(col: Column | str) -> Column:
    """float array → exact integer array (round(v·QUANT))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda v: F.round(v * QUANT).cast("long"))


def dot(a: Column, b: Column) -> Column:
    """Exact integer dot product via zip_with + aggregate (order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _prep(emb: DataFrame, id_col: str, vec_col: str, role: str) -> DataFrame:
    i = "src" if role == "l" else "dst"
    return emb.select(
        F.col(id_col).alias(i), quantize(vec_col).alias(f"qv_{role}")
    ).withColumn(f"n2_{role}", dot(F.col(f"qv_{role}"), F.col(f"qv_{role}")))


def cosine_topk(
    emb: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by quantized cosine → (src, nbr_rank, dst)."""
    a = _prep(emb, id_col, vec_col, "l")
    b = _prep(emb, id_col, vec_col, "r")
    cos = dot(F.col("qv_l"), F.col("qv_r")) / (
        F.sqrt(F.col("n2_l").cast("double")) * F.sqrt(F.col("n2_r").cast("double"))
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    return (
        a.crossJoin(b)
        .where(F.col("src") != F.col("dst"))
        .withColumn("cos", cos)
        .withColumn("nbr_rank", F.row_number().over(w))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst")
    )


def bucket_col(qv: Column, dim: int, planes: int) -> Column:
    """Random-hyperplane LSH bucket id: bit p = [⟨qv, w_p⟩ > 0]."""
    acc = F.lit(0).cast("long")
    for p in range(planes):
        wts = F.array(*[F.lit(plane_weight(i, p)) for i in range(1, dim + 1)])
        bit = (dot(qv, wts) > 0).cast("long")
        acc = acc + bit * F.lit(1 << p)
    return acc


def lsh_buckets(
    emb: DataFrame, dim: int = 64, planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — the shuffle key for the scale-path ANN join."""
    return emb.select(
        F.col(id_col), bucket_col(quantize(vec_col), dim, planes).alias("bucket")
    )


def l2_q(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_codebook(
    emb: DataFrame, n_centroids: int = 16, iters: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd-trained IVF codebook → (cid, qc array<long>).

    Init = the first ``n_centroids`` vectors (fixed, reproducible). Each
    iteration is pure DataFrame dataflow: broadcast-assign every vector to
    its nearest centroid (integer L2, ties → lowest cid), then per-(cid, dim)
    FLOOR(sum/count) means — integer-exact in ANY engine while |sum| < 2^53,
    which is what lets the DuckDB oracle replay the training bit-for-bit.
    Empty clusters keep their previous centroid. The shuffle per iteration is
    n_centroids × dim rows — nothing at any corpus scale. The final codebook
    collapses to ``n_centroids`` literal rows (collected) so consumers
    broadcast data, not lineage.

    ``train_cap``: Lloyd iterations run on the deterministic id-prefix
    sample ``vid < train_cap`` (None = full corpus). Codebook training on
    a bounded sample is the standard IVF discipline at corpus scale — the
    per-iteration cost stays constant as the table grows, and the DuckDB
    oracle replays the same capped training (r4 task #7)."""
    spark = emb.sparkSession
    q = emb.select(F.col(id_col).alias("vid"), quantize(vec_col).alias("qv"))
    tq = q if train_cap is None else q.where(F.col("vid") < train_cap)
    cents = q.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("qv").alias("qc")
    )
    for _ in range(iters):
        w = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("cid").asc())
        asg = (
            tq.crossJoin(F.broadcast(cents))
            .withColumn("d2", l2_q(F.col("qv"), F.col("qc")))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "cid")
        )
        flat = asg.join(tq, "vid").select("cid", F.posexplode("qv").alias("i", "e"))
        means = flat.groupBy("cid", "i").agg(
            F.floor(F.sum("e").cast("double") / F.count(F.lit(1))).cast("long").alias("m")
        )
        packed = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
            ).alias("qm")
        )
        cents = cents.join(packed, "cid", "left").select(
            "cid", F.coalesce("qm", "qc").alias("qc")
        )
    rows = [(int(r.cid), [int(v) for v in r.qc]) for r in cents.collect()]
    return spark.createDataFrame(rows, "cid long, qc array<long>")


def ivf_assign(
    emb: DataFrame, n_centroids: int = 16, iters: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """IVF coarse quantizer: (id, centroid_id) by nearest centroid
    (quantized integer L2, ties → lowest centroid id) against the
    Lloyd-trained codebook (``iters=0`` = the r1 positional stand-in).
    Centroids broadcast (provably small side); the assignment is one
    map-side pass."""
    q = emb.select(F.col(id_col).alias("vid"), quantize(vec_col).alias("qv"))
    cents = kmeans_codebook(emb, n_centroids, iters, id_col, vec_col, train_cap)
    d2 = l2_q(F.col("qv"), F.col("qc"))
    w = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("vid").alias(id_col), F.col("cid").alias("centroid_id"))
    )


def ivf_topk(
    emb: DataFrame, k: int = 10, nprobe: int = 2, n_centroids: int = 16,
    iters: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """IVF ANN search: probe the ``nprobe`` nearest buckets of the
    Lloyd-trained codebook, exact quantized cosine inside them →
    (src, nbr_rank, dst). The scale path: the candidate join is a hash
    equi-join on centroid_id (one shuffle), never a cross join; recall is
    governed by nprobe (and codebook quality — see the recall test).
    Deterministic end to end."""
    # no persist: q is a cheap projection of the scan (quantize + dot) — a
    # recompute per consumer beats a never-released cache entry (the bench
    # re-invokes this op; leaked caches accumulate partitions)
    q = emb.select(F.col(id_col).alias("vid"), quantize(vec_col).alias("qv")).withColumn(
        "n2", dot(F.col("qv"), F.col("qv"))
    )
    cents = kmeans_codebook(emb, n_centroids, iters, id_col, vec_col, train_cap)
    wprobe = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", l2_q(F.col("qv"), F.col("qc")))
        .withColumn("rn", F.row_number().over(wprobe))
        .where(F.col("rn") <= nprobe)
        .select(F.col("vid").alias("src"), F.col("qv").alias("qa"),
                F.col("n2").alias("na"), F.col("cid").alias("centroid_id"))
    )
    assign = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", l2_q(F.col("qv"), F.col("qc")))
        .withColumn("rn", F.row_number().over(wprobe))
        .where(F.col("rn") == 1)
        .select(F.col("vid").alias("dst"), F.col("cid").alias("centroid_id"),
                F.col("qv").alias("qb"), F.col("n2").alias("nb"))
    )
    cos = dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    wrank = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    return (
        probes.join(assign, "centroid_id")
        .where(F.col("src") != F.col("dst"))
        .withColumn("cos", cos)
        .withColumn("nbr_rank", F.row_number().over(wrank))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst")
    )


# --- product quantization (PQ) ----------------------------------------------


def _subvectors(
    emb: DataFrame, m_sub: int, sub_dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vid, sub, qs): quantized sub_dim-slice per subspace (0-based sub)."""
    q = emb.select(F.col(id_col).alias("vid"), quantize(vec_col).alias("qv"))
    return q.select(
        "vid",
        F.explode(F.array(*[F.lit(s) for s in range(m_sub)])).alias("sub"),
        "qv",
    ).select(
        "vid",
        "sub",
        F.slice(
            F.col("qv"), F.col("sub") * F.lit(sub_dim) + F.lit(1), F.lit(sub_dim)
        ).alias("qs"),
    )


def pq_codebooks(
    emb: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011): an independent
    Lloyd-trained ``n_codes``-entry codebook PER SUBSPACE →
    (sub, cid, qc array<long>[sub_dim]). ``train_cap`` bounds the Lloyd
    training set to the id-prefix sample (see kmeans_codebook).

    Same integer-exact training discipline as :func:`kmeans_codebook`
    (init = first vectors, FLOOR(sum/count) means, ties → lowest cid,
    empty clusters keep previous centroids), keyed additionally by ``sub``
    so all M codebooks train in the same dataflow. Per-iteration shuffles
    are (m_sub · n_codes · sub_dim) rows — nothing at any corpus scale;
    the final codebook collapses to literal rows for broadcast."""
    spark = emb.sparkSession
    subs = _subvectors(emb, m_sub, sub_dim, id_col, vec_col)
    tsubs = subs if train_cap is None else subs.where(F.col("vid") < train_cap)
    cents = subs.where(F.col("vid") < n_codes).select(
        "sub", F.col("vid").alias("cid"), F.col("qs").alias("qc")
    )
    for _ in range(iters):
        w = Window.partitionBy("vid", "sub").orderBy(
            F.col("d2").asc(), F.col("cid").asc()
        )
        asg = (
            tsubs.join(F.broadcast(cents), "sub")
            .withColumn("d2", l2_q(F.col("qs"), F.col("qc")))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vid", "sub", "cid")
        )
        flat = asg.join(tsubs, ["vid", "sub"]).select(
            "sub", "cid", F.posexplode("qs").alias("j", "e")
        )
        means = flat.groupBy("sub", "cid", "j").agg(
            F.floor(F.sum("e").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("m")
        )
        packed = means.groupBy("sub", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "m"))), lambda s: s["m"]
            ).alias("qm")
        )
        cents = cents.join(packed, ["sub", "cid"], "left").select(
            "sub", "cid", F.coalesce("qm", "qc").alias("qc")
        )
    rows = [(int(r.sub), int(r.cid), [int(v) for v in r.qc]) for r in cents.collect()]
    return spark.createDataFrame(rows, "sub long, cid long, qc array<long>")


def pq_encode(
    emb: DataFrame,
    books: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub, code): nearest codebook entry per subspace (integer
    L2, ties → lowest code) — the 8-byte-per-vector compressed
    representation; one map-side pass against the broadcast codebooks."""
    subs = _subvectors(emb, m_sub, sub_dim, id_col, vec_col)
    w = Window.partitionBy("vid", "sub").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (
        subs.join(F.broadcast(books), "sub")
        .withColumn("d2", l2_q(F.col("qs"), F.col("qc")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("vid").alias(id_col), "sub", F.col("cid").alias("code"))
    )


def pq_topk_adc(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: queries keep full precision,
    candidates are their PQ codes; distance ≈ Σ_sub table[sub][code] with
    per-query lookup tables → (src, nbr_rank, dst, adc_d2).

    Every distance is an exact BIGINT (quantized integer L2 partials), so
    ranks are bit-identical cross-engine and the oracle replays training,
    encoding, tables and ADC end to end.

    Scale shape: tables are (queries · m_sub · n_codes) rows; the ADC join
    is a hash equi-join on (sub, code) costing queries × n × m_sub lookup
    rows — PQ's actual compute shape. In production this sits BEHIND an
    IVF probe (ivf_topk) so n is the probed fraction, and codes/tables are
    array-packed per entity; the row-form here keeps every step
    SQL-checkable."""
    books = pq_codebooks(emb, m_sub, sub_dim, n_codes, iters, id_col, vec_col, train_cap)
    codes = pq_encode(emb, books, m_sub, sub_dim, id_col, vec_col).select(
        F.col(id_col).alias("dst"), "sub", "code"
    )
    qsubs = _subvectors(emb, m_sub, sub_dim, id_col, vec_col).where(
        F.col("vid") < n_queries
    )
    tables = (
        qsubs.join(F.broadcast(books), "sub")
        .select(
            F.col("vid").alias("src"),
            "sub",
            F.col("cid").alias("code"),
            l2_q(F.col("qs"), F.col("qc")).alias("td"),
        )
    )
    adc = (
        codes.join(tables, ["sub", "code"])
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("td").alias("adc_d2"))
    )
    w = Window.partitionBy("src").orderBy(F.col("adc_d2").asc(), F.col("dst").asc())
    return (
        adc.withColumn("nbr_rank", F.row_number().over(w))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst", "adc_d2")
    )


def ivfpq_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 50,
    n_centroids: int = 16,
    ivf_iters: int = 1,
    nprobe: int = 4,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
) -> DataFrame:
    """IVF-PQ: the production billion-scale ANN shape — an IVF coarse
    probe restricts candidates to the ``nprobe`` nearest inverted lists,
    then PQ asymmetric distance ranks them from 8-byte codes →
    (src, nbr_rank, dst, adc_d2).

    This is the non-residual ("IVF-Flat-PQ") variant: PQ codes are
    trained/encoded on the raw vectors, not per-list residuals — the
    residual refinement changes constants, not dataflow shape, and raw
    codes keep every step integer-exact and oracle-replayable.

    Cost: candidates = queries · nprobe/n_centroids · n (vs · n for plain
    ADC); each costs m_sub lookup-join rows. Both stages reuse the exact
    trained artifacts of :func:`ivf_topk` / :func:`pq_topk_adc`.
    """
    cents = kmeans_codebook(emb, n_centroids, ivf_iters, id_col, vec_col, train_cap)
    books = pq_codebooks(emb, m_sub, sub_dim, n_codes, pq_iters, id_col, vec_col, train_cap)
    codes = pq_encode(emb, books, m_sub, sub_dim, id_col, vec_col).select(
        F.col(id_col).alias("dst"), "sub", "code"
    )
    q = emb.select(F.col(id_col).alias("vid"), quantize(vec_col).alias("qv"))
    wprobe = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("cid").asc())
    coarse = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", l2_q(F.col("qv"), F.col("qc")))
        .withColumn("rn", F.row_number().over(wprobe))
    )
    assign = coarse.where(F.col("rn") == 1).select(
        F.col("vid").alias("dst"), F.col("cid").alias("centroid_id")
    )
    probes = coarse.where(
        (F.col("rn") <= nprobe) & (F.col("vid") < n_queries)
    ).select(F.col("vid").alias("src"), F.col("cid").alias("centroid_id"))
    cand = probes.join(assign, "centroid_id").where(
        F.col("src") != F.col("dst")
    ).select("src", "dst")
    qsubs = _subvectors(emb, m_sub, sub_dim, id_col, vec_col).where(
        F.col("vid") < n_queries
    )
    tables = qsubs.join(F.broadcast(books), "sub").select(
        F.col("vid").alias("src"),
        "sub",
        F.col("cid").alias("code"),
        l2_q(F.col("qs"), F.col("qc")).alias("td"),
    )
    adc = (
        cand.join(codes, "dst")
        .join(tables, ["src", "sub", "code"])
        .groupBy("src", "dst")
        .agg(F.sum("td").alias("adc_d2"))
    )
    w = Window.partitionBy("src").orderBy(F.col("adc_d2").asc(), F.col("dst").asc())
    return (
        adc.withColumn("nbr_rank", F.row_number().over(w))
        .where(F.col("nbr_rank") <= k)
        .select("src", "nbr_rank", "dst", "adc_d2")
    )


def lsh_neardup(
    emb: DataFrame, tau: float, dim: int = 64, planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs: same LSH bucket AND cosine ≥ tau, src < dst.
    One hash-partitioned equi-join on the bucket key (candidate generation)
    with the exact quantized-cosine verify fused into the join filter."""
    q = emb.select(
        F.col(id_col).alias("id"), quantize(vec_col).alias("qv")
    ).withColumn("bucket", bucket_col(F.col("qv"), dim, planes))
    q = q.withColumn("n2", dot(F.col("qv"), F.col("qv")))
    a = q.select(F.col("id").alias("src"), F.col("qv").alias("qa"),
                 F.col("n2").alias("na"), "bucket")
    b = q.select(F.col("id").alias("dst"), F.col("qv").alias("qb"),
                 F.col("n2").alias("nb"), "bucket")
    cos = dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, "bucket")
        .where(F.col("src") < F.col("dst"))
        .where(cos >= F.lit(tau))
        .select("src", "dst")
    )
