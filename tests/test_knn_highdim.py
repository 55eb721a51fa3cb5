"""hub_knn_highdim: exact high-dim kNN vs numpy brute force."""

from __future__ import annotations

import numpy as np

from parallelcovertree_spark.operators.knn_highdim import (
    _fps,
    _pairwise_d2,
    hub_knn_highdim,
)

DIM = 16


def _mk_vecs(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, DIM)).astype(np.float32)
    return [(i, X[i].tolist()) for i in range(n)]


def _brute(rows, k: int) -> set[tuple[int, int, int]]:
    ids = np.array([r[0] for r in rows])
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * 10_000)
    d2 = _pairwise_d2(Q, Q)
    np.fill_diagonal(d2, np.inf)
    out = set()
    for i in range(len(ids)):
        order = np.lexsort((ids, d2[i]))[: min(k, len(ids) - 1)]
        for rk, j in enumerate(order, start=1):
            out.add((int(ids[i]), rk, int(ids[j])))
    return out


def test_matches_brute_force(spark):
    rows = _mk_vecs(300)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim(df, k=5, n_hubs=8).collect()
    }
    assert got == _brute(rows, k=5)


def test_exact_regardless_of_hub_count(spark):
    # hub choice is a routing decision only — the answer must be identical
    rows = _mk_vecs(200, seed=11)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, hub_knn_highdim(df, k=4, n_hubs=2).collect()))
    b = sorted(map(tuple, hub_knn_highdim(df, k=4, n_hubs=32).collect()))
    assert a == b == sorted(_brute(rows, k=4))


def test_fewer_points_than_k(spark):
    rows = _mk_vecs(6, seed=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim(df, k=10, n_hubs=4).collect()
    }
    assert got == _brute(rows, k=10)  # every src gets all 5 others


def test_duplicate_vectors_tie_break_by_id(spark):
    base = _mk_vecs(40, seed=5)
    rows = base + [(100 + i, v) for i, v in [(j, base[j][1]) for j in range(10)]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim(df, k=3, n_hubs=4).collect()
    }
    assert got == _brute(rows, k=3)


def _brute_eps(rows, radius_q: float) -> set[tuple[int, int]]:
    ids = np.array([r[0] for r in rows])
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * 10_000)
    d2 = _pairwise_d2(Q, Q)
    out = set()
    for i, j in zip(*np.nonzero(d2 <= radius_q * radius_q)):
        out.add((int(ids[i]), int(ids[j])))
    return out


def test_epsilon_matches_brute_force(spark):
    from parallelcovertree_spark.operators.knn_highdim import hub_epsilon_highdim

    rows = _mk_vecs(250, seed=19)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # radius at roughly the 5th-percentile pair distance: nontrivial edges
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * 10_000)
    d2 = _pairwise_d2(Q, Q)
    rq = float(np.sqrt(np.quantile(d2[d2 > 0], 0.05)))
    raw = [(r.src, r.dst)
           for r in hub_epsilon_highdim(df, radius_q=rq, n_hubs=8).collect()]
    got = set(raw)
    assert len(raw) == len(got)  # every ordered pair emitted exactly once
    assert got == _brute_eps(rows, rq)
    assert all((i, i) in got for i in range(250))  # self-loops present
    # symmetric by construction
    assert all((b, a) in got for a, b in got)


def test_epsilon_exact_regardless_of_hub_count(spark):
    from parallelcovertree_spark.operators.knn_highdim import hub_epsilon_highdim

    rows = _mk_vecs(120, seed=23)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * 10_000)
    d2 = _pairwise_d2(Q, Q)
    rq = float(np.sqrt(np.quantile(d2[d2 > 0], 0.08)))
    a = sorted({(r.src, r.dst)
                for r in hub_epsilon_highdim(df, radius_q=rq, n_hubs=2).collect()})
    b = sorted({(r.src, r.dst)
                for r in hub_epsilon_highdim(df, radius_q=rq, n_hubs=24).collect()})
    assert a == b == sorted(_brute_eps(rows, rq))


def test_fps_spreads_hubs():
    # clustered data: FPS must pick one hub per far-apart cluster
    rng = np.random.default_rng(0)
    centers = np.array([[0.0] * DIM, [100.0] * DIM, [-100.0] * DIM])
    X = np.vstack([c + rng.normal(size=(20, DIM)) for c in centers])
    hubs = X[_fps(X, 3)]
    d2 = _pairwise_d2(hubs, centers)
    assert sorted(d2.argmin(axis=1).tolist()) == [0, 1, 2]


def test_pruning_skips_far_hubs(spark):
    # tight, well-separated clusters: with a finite d_k, the triangle bound
    # must exclude the far clusters — candidate volume stays near local-only
    rng = np.random.default_rng(42)
    rows = []
    for c in range(8):
        center = np.zeros(DIM)
        center[0] = c * 1000.0
        for i in range(40):
            rows.append((c * 40 + i, (center + rng.normal(size=DIM)).tolist()))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = hub_knn_highdim(df, k=5, n_hubs=8)
    assert {
        (r.src, r.nbr_rank, r.dst) for r in out.collect()
    } == _brute(rows, k=5)
    # every neighbor stays inside the source's cluster
    for r in out.collect():
        assert r.src // 40 == r.dst // 40


def _brute_2t(corpus_rows, query_rows, k: int) -> set[tuple[int, int, int]]:
    cids = np.array([r[0] for r in corpus_rows])
    C = np.round(np.array([r[1] for r in corpus_rows], dtype=np.float64) * 10_000)
    out = set()
    for qid, v in query_rows:
        Q = np.round(np.array(v, dtype=np.float64) * 10_000)
        d2 = _pairwise_d2(Q[None, :], C)[0]
        order = np.lexsort((cids, d2))[: min(k, len(cids))]
        for rk, j in enumerate(order, start=1):
            out.add((int(qid), rk, int(cids[j])))
    return out


def test_two_table_matches_brute_force(spark):
    from parallelcovertree_spark.operators.knn_highdim import hub_knn_highdim_queries

    corpus = _mk_vecs(240, seed=31)
    queries = [(1000 + i, v) for i, v in _mk_vecs(37, seed=32)]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim_queries(cdf, qdf, k=6, n_hubs=5).collect()
    }
    assert got == _brute_2t(corpus, queries, k=6)


def test_two_table_query_in_corpus_ranks_itself_first(spark):
    from parallelcovertree_spark.operators.knn_highdim import hub_knn_highdim_queries

    corpus = _mk_vecs(80, seed=41)
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    qdf = cdf.where("vec_id % 9 = 0")
    rows = hub_knn_highdim_queries(cdf, qdf, k=3, n_hubs=4).collect()
    firsts = {r.src: r.dst for r in rows if r.nbr_rank == 1}
    assert firsts and all(src == dst for src, dst in firsts.items())
    # and exactness vs brute force on the subset
    queries = [(i, v) for i, v in corpus if i % 9 == 0]
    got = {(r.src, r.nbr_rank, r.dst) for r in rows}
    assert got == _brute_2t(corpus, queries, k=3)


# --- cosine metric (VERDICT r4: ann_cosine_topk without a CartesianProduct) --


def _brute_cos(rows, k: int) -> set[tuple[int, int, int]]:
    """Oracle comparator: cos = dot_q/(sqrt(n2a)*sqrt(n2b)) on quantized
    ints, rank cos DESC then id ASC."""
    ids = np.array([r[0] for r in rows])
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * 10_000)
    n = np.sqrt((Q * Q).sum(axis=1))
    cos = (Q @ Q.T) / (n[:, None] * n[None, :])
    np.fill_diagonal(cos, -np.inf)
    out = set()
    for i in range(len(ids)):
        order = np.lexsort((ids, -cos[i]))[: min(k, len(ids) - 1)]
        for rk, j in enumerate(order, start=1):
            out.add((int(ids[i]), rk, int(ids[j])))
    return out


def test_cosine_matches_brute_force(spark):
    rows = _mk_vecs(300, seed=11)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim(df, k=5, n_hubs=8, metric="cosine").collect()
    }
    assert got == _brute_cos(rows, k=5)


def test_cosine_exact_regardless_of_hub_count(spark):
    rows = _mk_vecs(220, seed=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(
        map(tuple, hub_knn_highdim(df, k=4, n_hubs=2, metric="cosine").collect())
    )
    b = sorted(
        map(tuple, hub_knn_highdim(df, k=4, n_hubs=24, metric="cosine").collect())
    )
    assert a == b


def test_cosine_matches_crossjoin_baseline(spark):
    """The hub plan must reproduce simsearch.cosine_topk (the by-definition
    crossJoin the registered gate used to run) row for row."""
    from parallelcovertree_spark.operators.simsearch import cosine_topk

    rows = _mk_vecs(150, seed=23)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    hub = sorted(
        map(tuple, hub_knn_highdim(df, k=6, n_hubs=6, metric="cosine").collect())
    )
    base = sorted(map(tuple, cosine_topk(df, k=6).collect()))
    assert hub == base


def test_cosine_scale_invariant_ranking(spark):
    """Cosine ignores magnitude: scaling every vector by a positive constant
    must not change the neighbor ranking (L2 would reshuffle everything)."""
    rows = _mk_vecs(120, seed=5)
    scaled = [(i, [3.0 * v for v in vec]) for i, vec in rows]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df2 = spark.createDataFrame(scaled, "vec_id long, embedding array<float>")
    a = sorted(
        map(tuple, hub_knn_highdim(df1, k=3, n_hubs=8, metric="cosine").collect())
    )
    b = sorted(
        map(tuple, hub_knn_highdim(df2, k=3, n_hubs=8, metric="cosine").collect())
    )
    assert a == b


def test_cosine_pruning_skips_far_hubs(spark):
    """Angularly-clustered data: refinement must visit far fewer than
    n·(n_hubs−1) hubs — the triangle bound carries to the unit sphere."""
    rng = np.random.default_rng(41)
    centers = rng.normal(size=(6, DIM))
    centers /= np.sqrt((centers**2).sum(axis=1))[:, None]
    rows = []
    for i in range(360):
        c = centers[i % 6]
        v = c + 0.02 * rng.normal(size=DIM)
        rows.append((i, (v / np.sqrt((v**2).sum())).astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats: dict = {}
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim(
            df, k=5, n_hubs=12, metric="cosine", stats=stats
        ).collect()
    }
    assert got == _brute_cos(rows, k=5)
    assert stats["visits"] < 0.5 * stats["n"] * (stats["n_hubs"] - 1)


def test_two_table_cosine_matches_brute_force(spark):
    from parallelcovertree_spark.operators.knn_highdim import hub_knn_highdim_queries

    crows = _mk_vecs(200, seed=31)
    qrows = [(1000 + i, v) for i, v in [(j, crows[j][1]) for j in range(5)]] + [
        (2000 + r[0], r[1]) for r in _mk_vecs(40, seed=33)
    ]
    cdf = spark.createDataFrame(crows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(qrows, "vec_id long, embedding array<float>")
    got = {
        (r.src, r.nbr_rank, r.dst)
        for r in hub_knn_highdim_queries(cdf, qdf, k=6, n_hubs=5, metric="cosine").collect()
    }
    # brute cosine, no self-exclusion
    cids = np.array([r[0] for r in crows])
    C = np.round(np.array([r[1] for r in crows], dtype=np.float64) * 10_000)
    cn = np.sqrt((C * C).sum(axis=1))
    want = set()
    for qid, vec in qrows:
        Q = np.round(np.array(vec, dtype=np.float64) * 10_000)
        cos = (C @ Q) / (np.sqrt((Q * Q).sum()) * cn)
        order = np.lexsort((cids, -cos))[:6]
        for rk, j in enumerate(order, start=1):
            want.add((qid, rk, int(cids[j])))
    assert got == want
    # an exact-copy query ranks its corpus twin first
    assert all((1000 + j, 1, cids[j]) in got for j in range(5))


def test_cosine_scores_zero_norm_guard():
    """A vector that quantizes to all-zero must score 0 (not 0/0 NaN) against
    everything, deterministically — NaN would rank engine-specifically."""
    import numpy as np

    from parallelcovertree_spark.operators.knn_highdim import _scores

    X = np.array([[0.0, 0.0], [3.0, 4.0]])
    s = _scores(X, X, "cosine")
    assert not np.isnan(s).any()
    assert s[0, 0] == 0.0 and s[0, 1] == 0.0 and s[1, 0] == 0.0
    assert s[1, 1] == -1.0  # self-cosine of a real vector
