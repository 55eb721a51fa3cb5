"""Integer-exact PageRank vs a pure-Python twin."""

from __future__ import annotations

from collections import defaultdict

from parallelcovertree_spark.operators.graph import PR_INIT, pagerank


def _pagerank_py(edges, n_iter=5, init=PR_INIT):
    nodes = {v for e in edges for v in e}
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    base = 15 * init // 100
    r = {v: init for v in nodes}
    for _ in range(n_iter):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += r[a] // outdeg[a]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return r


# 0→1, 0→2, 1→2, 2→0, plus a dangling sink (3) and a source-only node (4),
# and a parallel edge 4→2 ×2 (counts twice)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2), (4, 2)]


def test_pagerank_matches_python_twin(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=5).collect()}
    assert got == _pagerank_py(EDGES, n_iter=5)


def test_pagerank_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(map(tuple, pagerank(df.coalesce(1), n_iter=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(7), n_iter=3).collect()))
    assert a == b


def test_pagerank_structure(spark):
    # sink node 3 keeps collecting rank it never redistributes; the
    # source-only node 4 settles at the base rank
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=5).collect()}
    assert got[4] == 15 * PR_INIT // 100
    assert got[2] == max(got.values())  # highest in-degree wins here


# --- triangle counting ----------------------------------------------------


def _triangles_py(edges):
    """Per-vertex triangle counts via canonical triple loop."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({v for e in und for v in e})
    out = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in und:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (b, c) in und and (a, c) in und:
                    for v in (a, b, c):
                        out[v] = out.get(v, 0) + 1
    return out


def test_triangles_k4_plus_path(spark):
    from parallelcovertree_spark.operators.graph import triangle_counts

    # K4 on 0..3 (4 triangles, each vertex in 3) + triangle-free path 4-5-6;
    # edges in mixed orientation with duplicates and a self-loop
    edges = [(0, 1), (1, 0), (0, 2), (0, 3), (2, 1), (1, 3), (2, 3),
             (4, 5), (6, 5), (6, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_match_python_twin_on_skewed_graph(spark):
    import numpy as np

    from parallelcovertree_spark.operators.graph import triangle_counts

    # hub 0 linked to everything + random sparse edges: exercises the
    # degree-orientation path (hub must not dominate wedge generation)
    rng = np.random.default_rng(13)
    edges = [(0, int(v)) for v in range(1, 40)]
    edges += [(int(a), int(b)) for a, b in rng.integers(1, 40, (120, 2)) if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _triangles_py(edges)


def test_clustering_coefficients_k4_and_path(spark):
    from parallelcovertree_spark.operators.graph import clustering_coefficients

    # K4 (every vertex: deg 3, T 3, lcc 1.0) + path 4-5-6 (deg-2 middle,
    # no triangle, lcc 0; endpoints deg 1 → excluded)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["deg"], r["n_triangles"], r["lcc"]) for r in
           clustering_coefficients(df).collect()}
    assert got == {
        0: (3, 3, 1.0), 1: (3, 3, 1.0), 2: (3, 3, 1.0), 3: (3, 3, 1.0),
        5: (2, 0, 0.0),
    }


def test_clustering_coefficients_match_twin(spark):
    import numpy as np

    from parallelcovertree_spark.operators.graph import clustering_coefficients

    rng = np.random.default_rng(41)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, (150, 2)) if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    tri = _triangles_py(edges)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {r["id"]: (r["deg"], r["n_triangles"], r["lcc"]) for r in
           clustering_coefficients(df).collect()}
    want = {
        v: (d, tri.get(v, 0), 2 * tri.get(v, 0) / (d * (d - 1)))
        for v, d in deg.items()
        if d >= 2
    }
    assert got == want


def test_bfs_layers_chain_two_sources_and_cap(spark):
    from parallelcovertree_spark.operators.graph import bfs_layers

    # chain 0-1-2-3-4-5-6-7 (directed both ways) with sources {0, 7}, cap 2:
    # layers meet in the middle; 3,4 unreachable within 2 hops... 3 is 3 hops
    # from 0 and 4 from 7 → absent; plus isolated vertex 9 never appears
    edges = []
    for a, b in zip(range(7), range(1, 8)):
        edges += [(a, b), (b, a)]
    edges += [(9, 9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,), (7,)], "id long")
    got = {r.id: r.layer for r in bfs_layers(e, s, n_iter=2).collect()}
    # 3 and 4 are 3 hops from their nearer source -> absent under cap 2;
    # 9 has only a self-loop and is not a source -> never enters
    assert got == {0: 0, 7: 0, 1: 1, 6: 1, 2: 2, 5: 2}
    # raising the cap reaches the middle; sources stay at layer 0
    full = {r.id: r.layer for r in bfs_layers(e, s, n_iter=4).collect()}
    assert full == {0: 0, 7: 0, 1: 1, 6: 1, 2: 2, 5: 2, 3: 3, 4: 3}
