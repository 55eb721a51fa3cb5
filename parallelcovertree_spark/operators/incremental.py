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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelcovertree_spark.sources.snapshots import SnapshotTable

__all__ = ["maintain_counts", "maintain_sums", "MaintainedAggregate"]

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


class MaintainedAggregate:
    """A materialized COUNT/SUM rollup of a source ``SnapshotTable``, stored
    as its OWN snapshot table and refreshed incrementally from the source
    changelog — the lakehouse end of the incremental-view story.

    Each ``refresh()`` commit records the source snapshot it reflects
    (``app_meta['source_snapshot']``), which makes refresh IDEMPOTENT: a
    replayed refresh (foreachBatch restart semantics) sees the recorded
    source snapshot already current and no-ops. The rollup itself is
    time-travelable like any snapshot table, so "the per-lang counts as of
    source snapshot k" stays answerable.

    Crash ordering is safe in both directions: source-commit-then-crash
    leaves the rollup one refresh behind (the next refresh catches up over
    the multi-commit changelog); crash mid-rollup-commit leaves an orphan
    dir the table machinery already recovers.

    If ``expire_snapshots`` on the source dropped history back to the
    recorded snapshot, ``refresh()`` surfaces the changelog's
    FileNotFoundError — re-bootstrap with ``refresh(full=True)`` (the only
    path that rescans source state)."""

    def __init__(
        self, path: str, source: SnapshotTable, keys: list[str],
        sums: dict[str, str] | None = None, count_col: str = "n",
    ):
        self.table = SnapshotTable(path)
        self.source = source
        self.keys = list(keys)
        self.sums = dict(sums or {})
        self.count_col = count_col

    def _recorded_source_snapshot(self) -> int | None:
        sid = self.table.latest_snapshot_id()
        if sid is None:
            return None
        # a foreign manifest on the rollup (e.g. compact()) has no
        # source_snapshot — treated as None, forcing a safe full recompute
        return (self.table._manifest(sid).get("app_meta") or {}).get(
            "source_snapshot"
        )

    def _full_agg(self, spark: SparkSession, src_sid: int) -> DataFrame:
        state = self.source.read(spark, src_sid)
        return state.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias(self.count_col),
            *[F.sum(F.col(s).cast("bigint")).alias(d)
              for d, s in self.sums.items()],
        )

    def refresh(self, spark: SparkSession, full: bool = False) -> int | None:
        """Bring the rollup up to the source's latest snapshot; returns the
        rollup snapshot id (existing id on a no-op, None if the source has
        no snapshots yet). ``full=True`` recomputes from source state —
        bootstrap and expired-history recovery."""
        src_sid = self.source.latest_snapshot_id()
        if src_sid is None:
            return None
        recorded = self._recorded_source_snapshot()
        if recorded == src_sid and not full:
            return self.table.latest_snapshot_id()  # idempotent replay
        if recorded is None or full:
            new = self._full_agg(spark, src_sid)
        else:
            new = maintain_sums(
                self.table.read(spark),
                self.source.changes(spark, recorded, src_sid),
                self.keys, self.sums, self.count_col,
            )
        return self.table.commit(new, meta={"source_snapshot": src_sid})

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        return self.table.read(spark, snapshot_id)
