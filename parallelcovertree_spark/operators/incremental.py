"""Incremental materialized-aggregate maintenance over the snapshot changelog.

The consumer side of ``SnapshotTable.changes()``: any aggregate whose measure
forms a commutative GROUP (COUNT, SUM — things with an inverse) can be
maintained from the row-level changelog alone,

    maintained(to) = maintained(from)  ⊕  Σ signed-deltas(from → to)

with inserts contributing +measure and deletes -measure per group — no
rescan of the table state. Combined with the changelog's cost model (a
merge/delete step reads ONLY rewritten partitions), refreshing a per-key
rollup after a commit touching 1 of 1000 partitions costs 1/1000th of a
recompute plus one shuffle of (previous aggregate ∪ delta), the standard
incremental view-maintenance contract (Iceberg changelog consumption /
Flink retraction streams). AVG/percentiles are NOT group-maintainable this
way — derive AVG as maintained SUM / maintained COUNT; sketches need their
own retraction story.

Reference tie-in: the reference rebuilds its ε-graph statistics from
scratch per run (``programs/epsilon_graph.cpp`` prints num_edges/avg_deg
after each full build); this module is what replaces that full pass when
the corpus lives in the snapshot table and changes incrementally.

At 1000-executor scale: the previous aggregate re-shuffles on every
refresh. If refreshes dominate, bucket-write the materialized aggregate by
its group key so the union-merge co-locates (the same write-time-shuffle
amortization as the bucketed-join evidence in
``tests/test_scale_plans.py``); the delta side is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallelcovertree_spark.sources.snapshots import SnapshotTable

__all__ = ["maintain_counts", "maintain_sums"]

def _sign() -> F.Column:
    return (
        F.when(F.col(SnapshotTable.CHANGE_TYPE_COL) == "insert", F.lit(1))
        .otherwise(F.lit(-1))
    )


def maintain_counts(
    prev: DataFrame | None, changes: DataFrame, keys: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Updated per-``keys`` row counts after applying a changelog.

    ``prev`` is the previously materialized aggregate ``(keys…, count_col)``
    (None for a cold start = maintaining from an empty table). Groups whose
    count reaches zero DROP OUT of the result, so the maintained aggregate
    is always exactly ``groupBy(keys).count()`` of the table state — pinned
    by the recompute-equality tests."""
    return maintain_sums(prev, changes, keys, sums={}, count_col=count_col)


def maintain_sums(
    prev: DataFrame | None, changes: DataFrame, keys: list[str],
    sums: dict[str, str], count_col: str = "n",
) -> DataFrame:
    """Updated per-``keys`` COUNT + SUM aggregates after a changelog.

    ``sums`` maps output column → source column to maintain as a SUM (cast
    to bigint; measures must be integral for exact retraction — float sums
    would drift under ⊕/⊖ reordering). The count is always maintained: it
    is what detects empty groups (sum 0 is a valid state, count 0 is not).
    One wide-shuffle-free delta aggregation over the changelog (map-side
    partials) + one union-merge shuffle with ``prev`` on ``keys``.
    """
    out_cols = [count_col, *sums]
    sign = _sign()
    aggs = [F.sum(sign).alias(count_col)] + [
        F.sum(sign * F.col(src).cast("bigint")).alias(dst)
        for dst, src in sums.items()
    ]
    delta = changes.groupBy(*keys).agg(*aggs)
    if prev is not None:
        missing = [c for c in (*keys, *out_cols) if c not in prev.columns]
        if missing:
            raise ValueError(f"prev aggregate is missing columns {missing}")
        delta = prev.select(*keys, *out_cols).unionByName(
            delta.select(*keys, *out_cols)
        ).groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in out_cols]
        )
    return delta.where(F.col(count_col) != 0).select(*keys, *out_cols)
