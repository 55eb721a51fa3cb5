"""Link-graph operators for web corpora: integer-exact PageRank.

The canonical web-scale graph computation (crawl prioritization, domain
ranking, spam demotion) expressed as pure DataFrame dataflow: per iteration
ONE src-keyed hash join (edge ⋈ per-node contribution) and ONE dst-keyed
aggregate — the shuffle keys a 1000-executor cluster wants, with map-side
partial sums absorbing popular-page in-degree skew.

Determinism discipline (the registry's no-transcendentals rule applied to an
iterative algorithm): ranks are SCALED INTEGERS and every step is truncating
integer arithmetic —

    contrib(v)   = r(v) DIV outdeg(v)
    r'(v)        = 15·init DIV 100  +  (85 · Σ_in contrib) DIV 100

so the result is independent of summation order, partitioning, and engine:
a DuckDB oracle replays all iterations bit-for-bit through chained CTEs.
The float formulation (damping 0.85) is the limit of this one as the scale
grows; at init = 10¹² the truncation error after 5 iterations is < 10⁻¹⁰
relative — and exactness of the INTEGER recurrence, not closeness to the
float one, is what the gate checks.

Scale notes: per-node state is one BIGINT; nodes×init must stay below 2⁶³
(at 10¹² nodes use init = 10⁶ — the caller picks the scale). Dangling nodes
(no out-links) simply contribute nothing — the standard simplification;
nodes with no in-links settle at the base rank 15·init DIV 100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_INIT = 10**12


def pagerank(
    edges: DataFrame, n_iter: int = 5, init: int = PR_INIT
) -> DataFrame:
    """(node, rank) after ``n_iter`` integer power iterations over
    (src, dst) edges. Both endpoints define the node set; duplicate edges
    count as parallel links (each carries a contribution)."""
    # iterative-algorithm discipline (same as the CC pointer-doubling op):
    # the graph structure is consumed once per iteration on both sides of a
    # join — materialize it once instead of re-deriving from the source scan
    # in every iteration's lineage; the ContextCleaner releases the blocks
    # when the returned DataFrame is dropped.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # distinct column names per role — edges appears in several lineages per
    # iteration, so qualified aliases keep every join unambiguous
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "deg_node")
        .localCheckpoint()
    )
    base = 15 * init // 100

    ranks = nodes.withColumn("r", F.lit(init).cast("long"))
    for _ in range(n_iter):
        contrib = ranks.join(
            deg, ranks["node"] == deg["deg_node"]
        ).select(F.col("deg_node").alias("c_src"), F.expr("r DIV outdeg").alias("c"))
        sums = (
            edges.join(contrib, edges["src"] == contrib["c_src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "s_node")
        )
        ranks = nodes.join(
            sums, nodes["node"] == sums["s_node"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr("(85 * coalesce(s, 0)) DIV 100")
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank"))


def pagerank_oracle_sql(
    nodes_sql: str, edges_sql: str, n_iter: int = 5, init: int = PR_INIT
) -> str:
    """DuckDB replay of :func:`pagerank`: the same integer recurrence as
    ``n_iter`` chained CTEs (``//`` is DuckDB's truncating integer DIV)."""
    base = 15 * init // 100
    parts = [
        f"nodes AS ({nodes_sql})",
        f"edges AS ({edges_sql})",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
        "FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({init} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"CAST({base} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.r // d.outdeg) AS s "
            f"FROM edges e JOIN deg d ON e.src = d.src "
            f"JOIN r{i} r ON r.node = e.src GROUP BY e.dst"
            f") s ON s.node = n.node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, r AS rank FROM r{n_iter}"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(id, n_triangles) per vertex participating in ≥1 triangle of the
    undirected graph given as (src, dst) edge rows (either or both
    directions; self-loops ignored).

    The scalable shape (Cohen 2009 / Suri-Vassilvitskii 2011): orient each
    edge from the LOWER (degree, id) endpoint to the higher, so every
    vertex's out-degree is O(√m) and the wedge join Σ outdeg² is O(m^{3/2})
    — a hub with in-degree d no longer spawns d² wedges (the web-graph /
    ε-graph skew case; on the uniform gate corpus orientation ≈ halves
    wedge volume). A triangle (u→v, u→w, v→w) is found exactly once: the
    wedge join on the common tail u emits each out-pair in both orders and
    the closing hash join keeps the one orientation that is an edge.

    Plan: degree aggregate, two vertex-keyed joins to decorate endpoints,
    wedge self-join on the tail, closing equi-join on (v, w), then a 3-way
    explode + count per vertex. The oriented edge list feeds three
    consumers — pinned with localCheckpoint (iterative-op discipline, same
    as pagerank above).
    """
    # the canonical edge set feeds FOUR consumers (both unionAll legs of
    # the degree aggregate, the decoration join, the closing join via
    # `oriented`'s parent) — pin it, or the upstream edge derivation (an
    # ε-join at the gate) re-runs once per consumer
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    dec = und.join(da, "a").join(db, "b")
    lower_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = dec.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").where(F.col("w1") != F.col("w2"))
    closing = oriented.select(F.col("u").alias("w1"), F.col("v").alias("w2"))
    tri = wedges.join(closing, ["w1", "w2"])
    verts = tri.select(F.explode(F.array("u", "w1", "w2")).alias("id"))
    return verts.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(id, deg, n_triangles, lcc) per vertex with degree ≥ 2: the local
    clustering coefficient lcc = 2·T(v) / (deg(v)·(deg(v)−1)) — how close a
    vertex's neighborhood is to a clique (community tightness / link-farm
    signature on a web graph; Watts & Strogatz 1998).

    Composes :func:`triangle_counts` (degree-oriented wedge plan) with the
    degree aggregate over the same canonical undirected edge set; vertices
    with no triangles get T = 0 via a left join; ``lcc`` is one IEEE
    division of exact BIGINT products.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    j = deg.where(F.col("deg") >= 2).join(tri, "id", "left")
    t = F.coalesce(F.col("n_triangles"), F.lit(0).cast("long"))
    return j.select(
        "id",
        "deg",
        t.alias("n_triangles"),
        (
            (F.lit(2).cast("long") * t).cast("double")
            / (F.col("deg") * (F.col("deg") - F.lit(1).cast("long"))).cast("double")
        ).alias("lcc"),
    )


def clustering_coeff_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`clustering_coefficients` — by-definition
    triangle triples + degree counts over the canonical edge set, identical
    COALESCE and division tree."""
    return f"""WITH e0 AS ({edges_sql}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e)
  GROUP BY id
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
v AS (SELECT unnest([x, y, z]) AS id FROM t),
tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM v GROUP BY id)
SELECT deg.id, deg.deg,
       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(2 * COALESCE(tc.n_triangles, 0) AS DOUBLE)
         / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS lcc
FROM deg LEFT JOIN tc ON deg.id = tc.id
WHERE deg.deg >= 2"""


def bfs_layers(edges: DataFrame, sources: DataFrame, n_iter: int = 4) -> DataFrame:
    """(id, layer): minimum hop distance from ANY source vertex, over
    directed (src, dst) edges, capped at ``n_iter`` hops — k-hop spatial
    reachability when fed the ε-graph (service-area / contagion-radius
    analytics). Vertices unreachable within the cap are absent.

    Pure dataflow BFS (the pagerank discipline): per round ONE frontier⋈
    edges hash join + ONE min-aggregate on the vertex key; everything is
    integers, so a DuckDB oracle replays the rounds as chained CTEs
    bit-for-bit. The edge list is materialized once across rounds.
    """
    edges = edges.localCheckpoint()
    dist = sources.select(F.col("id"), F.lit(0).cast("long").alias("layer"))
    for i in range(1, n_iter + 1):
        frontier = dist.where(F.col("layer") == i - 1)
        nxt = frontier.join(edges, frontier["id"] == edges["src"]).select(
            edges["dst"].alias("id"), F.lit(i).cast("long").alias("layer")
        )
        dist = (
            dist.unionAll(nxt)
            .groupBy("id")
            .agg(F.min("layer").alias("layer"))
            .localCheckpoint()
        )
    return dist


def bfs_layers_oracle_sql(edges_sql: str, sources_sql: str, n_iter: int = 4) -> str:
    """DuckDB twin of :func:`bfs_layers` — the same union+min rounds as
    chained CTEs."""
    parts = [
        f"be AS ({edges_sql})",
        f"d0 AS (SELECT id, CAST(0 AS BIGINT) AS layer FROM ({sources_sql}))",
    ]
    prev = "d0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"d{i} AS (\n"
            f"  SELECT id, CAST(MIN(layer) AS BIGINT) AS layer FROM (\n"
            f"    SELECT id, layer FROM {prev}\n"
            f"    UNION ALL\n"
            f"    SELECT be.dst AS id, CAST({i} AS BIGINT) AS layer\n"
            f"    FROM {prev} p JOIN be ON be.src = p.id WHERE p.layer = {i - 1}\n"
            f"  ) GROUP BY id\n)"
        )
        prev = f"d{i}"
    return ",\n".join(parts) + f"\nSELECT id, layer FROM {prev}"


def triangle_counts_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_counts` — by-definition canonical
    (a < b < c) triple join over the undirected edge set; per-vertex counts
    via a 3-way unnest. Orientation in the engine is an implementation
    detail: both sides count each triangle exactly once per member vertex."""
    return f"""WITH e0 AS ({edges_sql}),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
v AS (SELECT unnest([x, y, z]) AS id FROM t)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM v GROUP BY id"""


__all__ = [
    "PR_INIT",
    "pagerank",
    "pagerank_oracle_sql",
    "triangle_counts",
    "triangle_counts_oracle_sql",
    "clustering_coefficients",
    "clustering_coeff_oracle_sql",
    "bfs_layers",
    "bfs_layers_oracle_sql",
]
