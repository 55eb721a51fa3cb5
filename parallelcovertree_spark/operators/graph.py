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


__all__ = ["PR_INIT", "pagerank", "pagerank_oracle_sql"]
