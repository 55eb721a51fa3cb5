"""Product quantization: full numpy replication of training + encoding,
ADC correctness against the replicated tables, recall vs exact L2, and
partition invariance."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.01"
# the registry gate config (64 codes × 2 rounds, recall 0.392 unclustered)
# is exercised by the driver gate itself; the twin tests run the cheaper
# 16×1 config — the numpy replication covers the same code paths.
M, SD, CODES, ITERS, NQ, K = 8, 8, 16, 1, 50, 10


def _load(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = sorted(
        ((r.vec_id, np.round(np.array(r.embedding, np.float64) * 10000).astype(np.int64))
         for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([i for i, _ in rows])
    q = np.stack([v for _, v in rows])
    return emb, ids, q


def _train_py(q):
    """Numpy twin of pq_codebooks: per-subspace Lloyd, init = first CODES
    vectors, FLOOR(sum/count) means, ties → lowest cid."""
    books = np.zeros((M, CODES, SD), np.int64)
    for s in range(M):
        sub = q[:, s * SD : (s + 1) * SD]
        cb = sub[:CODES].copy()
        for _ in range(ITERS):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            asg = d2.argmin(1)  # argmin returns lowest index on ties
            new = cb.copy()
            for c in range(CODES):
                members = sub[asg == c]
                if len(members):
                    new[c] = np.floor(members.sum(0) / len(members)).astype(np.int64)
            cb = new
        books[s] = cb
    return books


def _encode_py(q, books):
    codes = np.zeros((len(q), M), np.int64)
    for s in range(M):
        sub = q[:, s * SD : (s + 1) * SD]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = d2.argmin(1)
    return codes


def test_pq_codes_match_numpy_twin(spark):
    from parallelcovertree_spark.operators.simsearch import pq_codebooks, pq_encode

    emb, ids, q = _load(spark)
    books = _train_py(q)
    codes = _encode_py(q, books)
    got_books = pq_codebooks(emb, M, SD, CODES, ITERS)
    for r in got_books.collect():
        assert list(books[r.sub][r.cid]) == list(r.qc)
    got = {
        (r.vec_id, r.sub): r.code
        for r in pq_encode(emb, got_books, M, SD).collect()
    }
    idx = {v: i for i, v in enumerate(ids)}
    for (vid, s), c in got.items():
        assert codes[idx[vid], s] == c


def test_pq_adc_matches_replicated_tables_and_recall(spark):
    from parallelcovertree_spark.operators.simsearch import pq_topk_adc

    emb, ids, q = _load(spark)
    books = _train_py(q)
    codes = _encode_py(q, books)
    idx = {v: i for i, v in enumerate(ids)}
    out = pq_topk_adc(emb, K, NQ, M, SD, CODES, ITERS).collect()
    # ADC distances must equal the replicated table sums exactly
    for r in out[:200]:
        qi, ci = idx[r.src], idx[r.dst]
        want = sum(
            int(((q[qi, s * SD : (s + 1) * SD] - books[s][codes[ci, s]]) ** 2).sum())
            for s in range(M)
        )
        assert r.adc_d2 == want
    # recall@10 vs exact integer L2 (the metric ADC approximates)
    exact = set()
    for qi in range(len(ids)):
        if ids[qi] >= NQ:
            continue
        d2 = ((q - q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))
        top = [ids[j] for j in order if ids[j] != ids[qi]][:K]
        exact.update((ids[qi], d) for d in top)
    approx = {(r.src, r.dst) for r in out}
    recall = len(exact & approx) / len(exact)
    # measured 0.264 at 16 codes×1 round on the synthetic UNCLUSTERED
    # 64-dim embeddings (iid-random data is PQ's worst case); the gate
    # config (64×2) measures 0.392 — pinned below via the quality knob
    assert recall > 0.2, recall


def test_pq_recall_improves_with_code_budget(spark):
    """The quality knob must work: the registry gate config (64 codes ×
    2 rounds) beats the minimal 16×1 config on recall@10 vs exact L2 —
    numpy sweep: 0.264 → 0.392; pinned with margin."""
    from parallelcovertree_spark import registry
    from parallelcovertree_spark.operators.simsearch import pq_topk_adc

    emb, ids, q = _load(spark)
    exact = set()
    for qi in range(len(ids)):
        if ids[qi] >= NQ:
            continue
        d2 = ((q - q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))
        top = [ids[j] for j in order if ids[j] != ids[qi]][:K]
        exact.update((ids[qi], d) for d in top)

    def recall(codes, iters):
        got = {
            (r.src, r.dst)
            for r in pq_topk_adc(emb, K, NQ, M, SD, codes, iters).collect()
        }
        return len(exact & got) / len(exact)

    small = recall(16, 1)
    gate = recall(registry._PQ_CODES, registry._PQ_ITERS)
    assert gate > small
    assert gate >= 0.3, gate


def test_pq_codes_partition_invariance(spark):
    from parallelcovertree_spark.operators.simsearch import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = pq_codebooks(emb, M, SD, CODES, ITERS)
    b = pq_codebooks(emb.repartition(13), M, SD, CODES, ITERS)
    assert {(r.sub, r.cid, tuple(r.qc)) for r in a.collect()} == {
        (r.sub, r.cid, tuple(r.qc)) for r in b.collect()
    }
    ca = {(r.vec_id, r.sub, r.code) for r in pq_encode(emb, a, M, SD).collect()}
    cb = {
        (r.vec_id, r.sub, r.code)
        for r in pq_encode(emb.repartition(7), b, M, SD).collect()
    }
    assert ca == cb


def test_ivfpq_recall_and_probe_knob(spark):
    from parallelcovertree_spark.operators.simsearch import ivfpq_topk

    emb, ids, q = _load(spark)
    exact = set()
    for qi in range(len(ids)):
        if ids[qi] >= NQ:
            continue
        d2 = ((q - q[qi]) ** 2).sum(1)
        order = np.lexsort((ids, d2))
        top = [ids[j] for j in order if ids[j] != ids[qi]][:K]
        exact.update((ids[qi], d) for d in top)

    def recall(nprobe):
        got = {
            (r.src, r.dst)
            for r in ivfpq_topk(
                emb, K, NQ, 16, 1, nprobe, M, SD, CODES, ITERS
            ).collect()
        }
        return len(exact & got) / len(exact)

    # NOTE top-k recall is NOT monotone in nprobe under APPROXIMATE ADC
    # ranks (measured 0.278@2 vs 0.254@8: a widened candidate set lets a
    # code-underestimated imposter displace a true neighbor) — candidate
    # COVERAGE is what monotonically grows. The exact invariant: probing
    # every list makes IVF-PQ identical to plain ADC.
    assert recall(2) > 2 / 16
    from parallelcovertree_spark.operators.simsearch import pq_topk_adc

    full = {
        (r.src, r.nbr_rank, r.dst, r.adc_d2)
        for r in ivfpq_topk(emb, K, NQ, 16, 1, 16, M, SD, CODES, ITERS).collect()
    }
    plain = {
        (r.src, r.nbr_rank, r.dst, r.adc_d2)
        for r in pq_topk_adc(emb, K, NQ, M, SD, CODES, ITERS).collect()
    }
    assert full == plain
