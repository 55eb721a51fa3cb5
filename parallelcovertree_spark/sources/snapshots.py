"""Iceberg-style snapshot tables (stand-in — the environment has no Iceberg
runtime jars; the real catalog slots in behind the same API).

Semantics provided, mirroring what the engine needs from Iceberg per the
north rule ("checkpointed to Iceberg per level, resumable, per-partition
lineage"):

- **atomic snapshot commits**: data is written to an immutable
  ``snap-<id>/`` directory, then a manifest JSON is renamed into place —
  readers never observe a half-written snapshot;
- **time travel**: ``read(snapshot_id=...)`` and ``history()``;
- **partition pruning**: data is hive-partitioned by a chosen column; reads
  with a partition predicate prune directories (verified via
  ``PartitionFilters`` in the scan plan);
- **per-partition lineage**: each manifest records per-partition row counts;
- **copy-on-write MERGE / DELETE** (Iceberg's v2-table core): ``merge``
  upserts by key and ``delete`` removes by predicate, rewriting ONLY the
  partitions they touch; untouched partitions are *referenced* from the
  parent snapshot's directories in the child manifest (file reuse — the
  Iceberg manifest mechanism), so a merge touching 1 of 1000 partitions
  writes 1/1000th of the table and earlier snapshots stay readable;
- **add-column schema evolution**: merge updates may carry new columns;
  partitions written before a column existed read back with NULLs in it
  (every union in the table is by-name with allowMissingColumns);
- **changelog scan** (Iceberg create_changelog_view): ``changes()`` emits
  the row-level inserts/deletes between two snapshots, reading ONLY the
  partitions whose backing directory changed between each parent/child
  manifest pair — the CoW file-reuse structure makes change detection an
  O(#partitions) manifest diff, and the row diff touches just rewritten
  data. This is what lets a downstream training-data pipeline re-process
  increments instead of full table states.
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _manifest_path(self, snapshot_id: int) -> str:
        return f"{self.path}/manifest-{snapshot_id:012d}.json"

    def history(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(f"{self.path}/{name}") as f:
                    out.append(json.load(f))
        return out

    def latest_snapshot_id(self) -> int | None:
        h = self.history()
        return h[-1]["snapshot_id"] if h else None

    def _manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    # --- branches (write-audit-publish) ---------------------------------------
    #
    # Iceberg-style named refs: refs.json maps branch name → head snapshot
    # id (atomic rename, like manifests). Until the first branch operation
    # the file does not exist and every read/write targets the newest
    # manifest — the legacy single-branch behavior, untouched. Once refs
    # exist, "main" is what readers see by default; commits staged on
    # another branch stay invisible until publish() fast-forwards main onto
    # them. That is the WAP (write-audit-publish) contract: stage → audit
    # via read(branch=...) → publish.

    def _refs_path(self) -> str:
        return f"{self.path}/refs.json"

    def refs(self) -> dict[str, int]:
        if not os.path.exists(self._refs_path()):
            return {}
        with open(self._refs_path()) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def _write_refs(self, refs: dict[str, int]) -> None:
        tmp = self._refs_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f)
        os.replace(tmp, self._refs_path())

    def _resolve_head(self, branch: str) -> int | None:
        refs = self.refs()
        if branch in refs:
            return refs[branch]
        if branch == "main":
            return self.latest_snapshot_id()  # legacy: newest manifest
        raise ValueError(f"unknown branch {branch!r}")

    def _ancestors(self, snapshot_id: int, stop_at: int | None = None) -> set[int]:
        """Ancestry chain of ``snapshot_id`` (inclusive). Stops early once
        ``stop_at`` is reached, and stops (rather than raising) at a manifest
        expire_snapshots removed — an expired chain simply ends there."""
        chain, sid = set(), snapshot_id
        while sid is not None:
            chain.add(sid)
            if sid == stop_at:
                break
            try:
                sid = self._manifest(sid).get("parent_id")
            except FileNotFoundError:
                break
        return chain

    def create_branch(self, name: str, at: int | None = None) -> int:
        """Create (or reset) a branch pointing at ``at`` (default: the main
        head). Returns the branch head id."""
        head = at if at is not None else self._resolve_head("main")
        if head is None:
            raise FileNotFoundError("cannot branch an empty table")
        self._manifest(head)  # must exist
        refs = self.refs()
        if "main" not in refs:  # pin main explicitly once branching starts
            main = self.latest_snapshot_id()
            if main is not None:
                refs["main"] = main
        refs[name] = head
        self._write_refs(refs)
        return head

    def drop_branch(self, name: str) -> None:
        if name == "main":
            raise ValueError("cannot drop main")
        refs = self.refs()
        refs.pop(name, None)
        self._write_refs(refs)

    def publish(self, branch: str) -> int:
        """Fast-forward main onto ``branch`` (Iceberg fast_forward): legal
        only when main is an ancestor of the branch head — a diverged main
        must be resolved by re-staging, never silently overwritten. The
        branch ref survives (drop_branch to retire it). Returns the new
        main head."""
        refs = self.refs()
        if branch not in refs:
            raise ValueError(f"unknown branch {branch!r}")
        head = refs[branch]
        main = self._resolve_head("main")
        if main is not None and main not in self._ancestors(head, stop_at=main):
            raise ValueError(
                f"publish({branch!r}) is not a fast-forward: main at "
                f"{main} is not an ancestor of {head}"
            )
        refs["main"] = head
        self._write_refs(refs)
        return head

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path(manifest["snapshot_id"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(manifest["snapshot_id"]))  # atomic

    _HIVE_SAFE = frozenset(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_. "
    )

    @classmethod
    def _check_partition_values(cls, values) -> list[str]:
        """Pruned row-level ops match partition values against hive dir
        names by string equality; a value Spark hive-escapes (':' → '%3A')
        or NULL would silently miss that match — refuse loudly instead of
        losing rows. Escaping-needing partition values must use
        ``prune=False`` (or a sanitized partition column)."""
        out = []
        for v in values:
            if v is None:
                raise ValueError(
                    "NULL partition value in a pruned row-level operation; "
                    "use prune=False or a non-null partition column"
                )
            s = str(v)
            if not s or not set(s) <= cls._HIVE_SAFE:
                raise ValueError(
                    f"partition value {s!r} needs hive escaping and would "
                    "not match manifest keys; use prune=False or restrict "
                    "the partition column to [A-Za-z0-9-_. ]"
                )
            out.append(s)
        return sorted(out)

    def _clear_orphan(self, data_dir: str, snap_id: int) -> None:
        """A crash between data write and manifest rename leaves an orphan
        snap dir that would fail the next errorifexists write for the same
        id — remove it iff no manifest references it (the replay-commits-
        cleanly half of the foreachBatch contract)."""
        import shutil

        if os.path.exists(data_dir) and not os.path.exists(
            self._manifest_path(snap_id)
        ):
            shutil.rmtree(data_dir)

    @staticmethod
    def _partition_dirs(data_dir: str, partition_by: str) -> dict[str, str]:
        """value → hive dir, discovered from the written layout (one listdir
        of the snapshot dir — O(partitions), never O(rows))."""
        prefix = f"{partition_by}="
        out = {}
        for name in sorted(os.listdir(data_dir)):
            if name.startswith(prefix):
                out[name[len(prefix):]] = f"{data_dir}/{name}"
        return out

    def _advance(self, branch: str, snap_id: int) -> None:
        """Move ``branch`` to ``snap_id`` — only when refs exist or the
        commit targets a non-main branch (legacy tables stay refs-free)."""
        refs = self.refs()
        if refs or branch != "main":
            refs[branch] = snap_id
            self._write_refs(refs)

    def commit(self, df: DataFrame, partition_by: str | None = None,
               meta: dict | None = None, branch: str = "main") -> int:
        """Write a new immutable snapshot on ``branch`` (default main);
        returns its id. The manifest rename is the atomic commit point.
        Snapshot ids are GLOBAL (max over all branches + 1); the parent is
        the branch head."""
        if branch != "main" and branch not in self.refs():
            raise ValueError(f"unknown branch {branch!r} (create_branch first)")
        prev = self._resolve_head(branch)
        snap_id = (self.latest_snapshot_id() or 0) + 1
        data_dir = f"{self.path}/snap-{snap_id:012d}"
        self._clear_orphan(data_dir, snap_id)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data_dir)
        if partition_by:
            lineage_rows = (
                df.groupBy(partition_by).agg(F.count(F.lit(1)).alias("rows")).collect()
            )
            lineage = {str(r[0]): r.rows for r in lineage_rows}
            part_dirs = self._partition_dirs(data_dir, partition_by)
        else:
            lineage = {"*": df.count()}
            part_dirs = None
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": prev,
            "committed_at": time.time(),
            "data_dir": data_dir,
            "partition_by": partition_by,
            "partition_rows": lineage,
            "partition_dirs": part_dirs,
            "total_rows": sum(lineage.values()),
            "app_meta": meta,
        }
        self._write_manifest(manifest)
        self._advance(branch, snap_id)
        return snap_id

    # --- copy-on-write row-level operations -----------------------------------

    def merge(
        self, spark: SparkSession, updates: DataFrame, key_col: str,
        prune: bool = True, meta: dict | None = None, branch: str = "main",
    ) -> int:
        """Upsert ``updates`` by ``key_col`` as a new snapshot (Iceberg
        copy-on-write MERGE): matched keys are replaced, unmatched keys
        inserted. With ``prune=True`` (default) only partitions present in
        ``updates`` are rewritten; every other partition directory is
        REFERENCED from the parent manifest unchanged. That contract assumes
        the partition value is a stable function of the key (the engine's
        layouts: tile-of-point, lang-of-doc) — a key that MOVES partitions
        must use ``prune=False`` (full rewrite) or its old row would survive
        in the untouched partition. ``branch`` stages the merge on a named
        branch (the streaming-upsert WAP pattern); ids stay global."""
        if branch != "main" and branch not in self.refs():
            raise ValueError(f"unknown branch {branch!r} (create_branch first)")
        man = self._manifest(self._resolve_head(branch))
        pcol = man["partition_by"]
        prev_id = man["snapshot_id"]
        snap_id = (self.latest_snapshot_id() or 0) + 1
        data_dir = f"{self.path}/snap-{snap_id:012d}"
        self._clear_orphan(data_dir, snap_id)

        # schema evolution is ADD-column only: updates may carry columns the
        # table lacks (backfilled NULL on old partitions), but must carry
        # every existing column — allowMissingColumns is symmetric, and an
        # update batch silently nulling a forgotten column is data loss
        missing = set(self.read(spark, branch=branch).columns) - set(updates.columns)
        if missing:
            raise ValueError(
                f"merge updates are missing table columns {sorted(missing)}; "
                "select full rows (matched rows would be overwritten with "
                "NULL in them)"
            )

        if pcol is None or not prune or not man.get("partition_dirs"):
            base = self.read(spark, branch=branch)
            new_data = base.join(
                updates.select(key_col), key_col, "left_anti"
            ).unionByName(updates, allowMissingColumns=True)
            # full rewrite path — same layout as a plain commit
            writer = new_data.write.mode("errorifexists")
            if pcol:
                writer = writer.partitionBy(pcol)
            writer.parquet(data_dir)
            if pcol:
                part_dirs = self._partition_dirs(data_dir, pcol)
                lineage = self._count_dirs(spark, data_dir, part_dirs)
            else:
                part_dirs, lineage = None, {"*": spark.read.parquet(data_dir).count()}
            rewritten = sorted(lineage)
        else:
            # touched partitions: O(#partitions) driver state, never O(rows);
            # values checked hive-safe so string-matching manifest keys is
            # sound (an escaped value would silently drop the old partition)
            touched = self._check_partition_values(
                r[0] for r in updates.select(pcol).distinct().collect()
            )
            old_dirs = [man["partition_dirs"][v] for v in touched
                        if v in man["partition_dirs"]]
            keep = None
            if old_dirs:
                old = self._read_dirs(spark, old_dirs)
                keep = old.join(updates.select(key_col), key_col, "left_anti")
            new_data = (
                keep.unionByName(updates, allowMissingColumns=True)
                if keep is not None else updates
            )
            new_data.write.mode("errorifexists").partitionBy(pcol).parquet(data_dir)
            written = self._partition_dirs(data_dir, pcol)
            part_dirs = dict(man["partition_dirs"])  # inherit untouched
            part_dirs.update(written)
            lineage = dict(man["partition_rows"])
            lineage.update(self._count_dirs(spark, data_dir, written))
            rewritten = sorted(written)

        self._write_manifest({
            "snapshot_id": snap_id,
            "parent_id": prev_id,
            "committed_at": time.time(),
            "data_dir": data_dir,
            "partition_by": pcol,
            "partition_rows": lineage,
            "partition_dirs": part_dirs,
            "rewritten_partitions": rewritten,
            "total_rows": sum(lineage.values()),
            "app_meta": meta,
        })
        self._advance(branch, snap_id)
        return snap_id

    def delete(self, spark: SparkSession, predicate: str) -> int:
        """Copy-on-write DELETE: drop rows matching the SQL ``predicate`` in
        a new snapshot (on main). Only partitions that actually contain
        matches are rewritten; the rest are referenced from the parent."""
        man = self._manifest(self._resolve_head("main"))
        pcol = man["partition_by"]
        prev_id = man["snapshot_id"]
        snap_id = (self.latest_snapshot_id() or 0) + 1
        data_dir = f"{self.path}/snap-{snap_id:012d}"
        self._clear_orphan(data_dir, snap_id)

        if pcol is None or not man.get("partition_dirs"):
            # full rewrite — PRESERVING the table's partition layout (a
            # legacy partitioned manifest must not come out unpartitioned)
            new_data = self.read(spark).where(f"NOT ({predicate})")
            writer = new_data.write.mode("errorifexists")
            if pcol:
                writer = writer.partitionBy(pcol)
            writer.parquet(data_dir)
            if pcol:
                part_dirs = self._partition_dirs(data_dir, pcol)
                lineage = self._count_dirs(spark, data_dir, part_dirs)
            else:
                part_dirs = None
                lineage = {"*": spark.read.parquet(data_dir).count()}
            self._write_manifest({
                "snapshot_id": snap_id, "parent_id": prev_id,
                "committed_at": time.time(), "data_dir": data_dir,
                "partition_by": pcol,
                "partition_rows": lineage,
                "partition_dirs": part_dirs,
                "rewritten_partitions": sorted(lineage),
                "total_rows": sum(lineage.values()),
            })
            self._advance("main", snap_id)
            return snap_id

        # find partitions with matches — a pruned aggregate, O(partitions) out
        hits = (
            self.read(spark).where(predicate).select(pcol).distinct().collect()
        )
        touched = self._check_partition_values(r[0] for r in hits)
        if not touched:  # no-op delete still commits (audit trail)
            self._write_manifest({**man, "snapshot_id": snap_id,
                                  "parent_id": prev_id,
                                  "committed_at": time.time(),
                                  "rewritten_partitions": []})
            self._advance("main", snap_id)
            return snap_id
        old = self._read_dirs(spark, [man["partition_dirs"][v] for v in touched])
        new_data = old.where(f"NOT ({predicate})")
        new_data.write.mode("errorifexists").partitionBy(pcol).parquet(data_dir)
        written = self._partition_dirs(data_dir, pcol)
        part_dirs = dict(man["partition_dirs"])
        lineage = dict(man["partition_rows"])
        for v in touched:  # a fully-deleted partition vanishes
            part_dirs.pop(v, None)
            lineage.pop(v, None)
        part_dirs.update(written)
        lineage.update(self._count_dirs(spark, data_dir, written))
        self._write_manifest({
            "snapshot_id": snap_id, "parent_id": prev_id,
            "committed_at": time.time(), "data_dir": data_dir,
            "partition_by": pcol, "partition_rows": lineage,
            "partition_dirs": part_dirs, "rewritten_partitions": touched,
            "total_rows": sum(lineage.values()),
        })
        self._advance("main", snap_id)
        return snap_id

    # --- maintenance -----------------------------------------------------------

    def compact(
        self, spark: SparkSession, cluster_by=None, n_files: int | None = None,
    ) -> int:
        """Materialize the current snapshot into one self-contained directory
        (Iceberg rewrite_data_files): after many merges a snapshot's
        partitions scatter across generations; compaction rewrites them into
        a single fresh snap dir so reads are one clean scan again. History
        is preserved — compaction is just another snapshot.

        ``cluster_by`` (a Column — e.g. ``zorder.z_value(...)`` — or a SQL
        expression string) is the OPTIMIZE-ZORDER form: rows are
        range-partitioned into ``n_files`` output tasks on
        (table partition, key) — sampled bounds, so file sizes track data
        density — and sorted within files, giving later spatial/range reads
        O(1)-file locality plus row-group min/max pruning. The key column
        itself is not stored; it exists only during the rewrite."""
        man = self._manifest(self._resolve_head("main"))
        df = self.read(spark)
        if cluster_by is not None:
            key = (
                F.expr(cluster_by) if isinstance(cluster_by, str) else cluster_by
            )
            pcol = man["partition_by"]
            sort_cols = ([F.col(pcol)] if pcol else []) + [key]
            parts = n_files or spark.sparkContext.defaultParallelism
            df = df.repartitionByRange(parts, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        return self.commit(df, partition_by=man["partition_by"])

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the last ``keep_last`` manifests and delete snap dirs
        no surviving manifest references (Iceberg expire_snapshots). A dir
        referenced by ANY kept manifest — including via merge file-reuse —
        survives; reachability is computed over partition_dirs, not
        snapshot ids. Returns the expired snapshot ids."""
        import shutil

        hist = self.history()
        if not hist:
            return []
        kept = hist[-keep_last:] if keep_last > 0 else []
        dropped = hist[:-keep_last] if keep_last > 0 else hist
        # branch heads are pinned, TOGETHER with each head's manifest
        # ancestry back to main: publish() verifies fast-forward by walking
        # parent_id from the head until it finds main, so every manifest on
        # that chain must survive expiry or a legal publish after routine
        # maintenance would crash. (Data-dir reachability for the pinned
        # manifests is covered below by reachability over kept manifests.)
        heads = set(self.refs().values())
        if heads:
            main = self._resolve_head("main")
            pinned_ids: set[int] = set()
            for h in heads:
                pinned_ids |= self._ancestors(h, stop_at=main)
            pinned = [m for m in dropped if m["snapshot_id"] in pinned_ids]
            kept = kept + pinned
            dropped = [m for m in dropped if m["snapshot_id"] not in pinned_ids]
        reachable: set[str] = set()
        for man in kept:
            if man.get("partition_dirs"):
                for d in man["partition_dirs"].values():
                    reachable.add(os.path.dirname(d))
            reachable.add(man["data_dir"])
        expired = []
        for man in dropped:
            os.remove(self._manifest_path(man["snapshot_id"]))
            expired.append(man["snapshot_id"])
        # GC runs even when nothing expired: crash orphans (data written,
        # manifest never renamed) are collectable too. Dirs with an id
        # ABOVE the newest manifest are skipped — that id range belongs to
        # a possibly in-flight writer (single-writer discipline; its own
        # _clear_orphan handles a dead predecessor).
        max_kept = hist[-1]["snapshot_id"]
        for name in sorted(os.listdir(self.path)):
            full = f"{self.path}/{name}"
            if not name.startswith("snap-"):
                continue
            try:
                did = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if did <= max_kept and full not in reachable:
                shutil.rmtree(full, ignore_errors=True)
        return expired

    # --- readers ---------------------------------------------------------------

    @staticmethod
    def _read_dirs(spark: SparkSession, dirs: list[str]) -> DataFrame:
        """Read hive partition dirs, re-deriving the partition column. Dirs
        are grouped by their snapshot root so Spark gets one multi-path scan
        per generation (not one job per partition)."""
        by_base: dict[str, list[str]] = {}
        for d in dirs:
            by_base.setdefault(os.path.dirname(d), []).append(d)
        parts = [
            spark.read.option("basePath", base).parquet(*ds)
            for base, ds in sorted(by_base.items())
        ]
        # allowMissingColumns = add-column schema evolution: partitions
        # written before a column existed read back with NULLs in it
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )

    def _count_dirs(self, spark: SparkSession, data_dir: str,
                    part_dirs: dict[str, str]) -> dict[str, int]:
        if not part_dirs:
            return {}
        # per-partition-value counts: one scan of just the written dirs
        pcol_dir = next(iter(part_dirs.values()))
        pcol = os.path.basename(pcol_dir).split("=", 1)[0]
        counted = (
            spark.read.option("basePath", data_dir)
            .parquet(*part_dirs.values())
            .groupBy(pcol).agg(F.count(F.lit(1)).alias("rows")).collect()
        )
        return {str(r[0]): r.rows for r in counted}

    def read_partition(
        self, spark: SparkSession, value, snapshot_id: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Pruned read of ONE partition — O(1) directory resolution via the
        manifest (works across merge generations, where the partition's
        current dir may live in an ancestor snapshot). Returns an empty
        DataFrame with the table schema for an absent partition."""
        sid = snapshot_id if snapshot_id is not None else self._resolve_head(branch)
        if sid is None:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        man = self._manifest(sid)
        dirs = man.get("partition_dirs")
        if not dirs:
            raise ValueError("read_partition requires a partitioned table")
        key = self._check_partition_values([value])[0]
        if key not in dirs:
            return self.read(spark, sid).limit(0)
        return self._read_dirs(spark, [dirs[key]])

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Read a snapshot: explicit ``snapshot_id`` (time travel), else the
        head of ``branch`` — main by default, which is the newest manifest
        until branching starts and the pinned published head after."""
        sid = snapshot_id if snapshot_id is not None else self._resolve_head(branch)
        if sid is None:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        manifest = self._manifest(sid)
        dirs = manifest.get("partition_dirs")
        if dirs and any(
            not d.startswith(manifest["data_dir"] + "/") for d in dirs.values()
        ):
            # merge/delete snapshot referencing parent partitions: assemble
            return self._read_dirs(spark, list(dirs.values()))
        return spark.read.parquet(manifest["data_dir"])

    # --- changelog scan --------------------------------------------------------

    CHANGE_TYPE_COL = "_change_type"
    CHANGE_SNAP_COL = "_commit_snapshot_id"

    def changes(
        self, spark: SparkSession, from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Row-level changelog between two snapshots (Iceberg
        create_changelog_view): every row inserted or deleted after
        ``from_snapshot_id`` (exclusive) up to ``to_snapshot_id`` (inclusive,
        default latest), tagged with ``_change_type`` ('insert'|'delete') and
        ``_commit_snapshot_id``. An update surfaces as a delete+insert pair
        in the same commit — exactly Iceberg's changelog contract.

        Cost model: per parent→child manifest pair, only partitions whose
        backing DIRECTORY differs are read (an O(#partitions) dict compare —
        the CoW file-reuse structure is the change index), and the row diff
        is a multiset ``exceptAll`` over just that rewritten data. merge()/
        delete() steps therefore cost O(touched partitions); a full
        ``commit()`` step is an overwrite and honestly costs a full-state
        diff. Invariant (pinned by tests): applying the changelog to
        ``read(from)`` reproduces ``read(to)`` as a multiset.
        """
        to_id = (
            to_snapshot_id if to_snapshot_id is not None
            else self._resolve_head("main")
        )
        if to_id is None:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        if not from_snapshot_id <= to_id:
            raise ValueError(
                f"from_snapshot_id {from_snapshot_id} is after {to_id}"
            )
        steps = []
        for sid in range(from_snapshot_id + 1, to_id + 1):
            try:
                pman, cman = self._manifest(sid - 1), self._manifest(sid)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"snapshot {sid - 1} or {sid} expired; changelog from "
                    f"{from_snapshot_id} is unavailable (expire_snapshots "
                    "kept too little history)"
                ) from None
            step = self._diff_step(spark, pman, cman, sid)
            if step is not None:
                steps.append(step)
        if not steps:
            return (
                self.read(spark, to_id).limit(0)
                .withColumn(self.CHANGE_TYPE_COL, F.lit("insert"))
                .withColumn(self.CHANGE_SNAP_COL, F.lit(to_id).cast("long"))
            )
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), steps
        )

    def _diff_step(self, spark, pman: dict, cman: dict, sid: int):
        """Changelog of one parent→child commit, or None for a no-op commit
        (e.g. a delete() whose predicate matched nothing)."""
        pdirs, cdirs = pman.get("partition_dirs"), cman.get("partition_dirs")
        if pdirs is not None and cdirs is not None:
            changed_old = [pdirs[v] for v in pdirs
                           if pdirs[v] != cdirs.get(v)]
            changed_new = [cdirs[v] for v in cdirs
                           if cdirs[v] != pdirs.get(v)]
            if not changed_old and not changed_new:
                return None
            # schema anchors: absent side of an all-insert/all-delete step
            # still needs the right columns for exceptAll alignment
            old = (self._read_dirs(spark, changed_old) if changed_old
                   else self.read(spark, pman["snapshot_id"]).limit(0))
            new = (self._read_dirs(spark, changed_new) if changed_new
                   else self.read(spark, cman["snapshot_id"]).limit(0))
        else:
            # unpartitioned on either side: full-state diff
            old = self.read(spark, pman["snapshot_id"])
            new = self.read(spark, cman["snapshot_id"])
        old, new = self._align_columns(old, new)
        for col in (self.CHANGE_TYPE_COL, self.CHANGE_SNAP_COL):
            if col in new.columns:
                raise ValueError(f"table column {col!r} collides with the "
                                 "changelog metadata column")
        return (
            new.exceptAll(old)
            .withColumn(self.CHANGE_TYPE_COL, F.lit("insert"))
            .unionByName(
                old.exceptAll(new)
                .withColumn(self.CHANGE_TYPE_COL, F.lit("delete"))
            )
            .withColumn(self.CHANGE_SNAP_COL, F.lit(sid).cast("long"))
        )

    @staticmethod
    def _align_columns(old: DataFrame, new: DataFrame):
        """Same columns, same order, on both sides (exceptAll is positional).
        Add-column evolution means a side may lack columns the other has —
        backfill with typed NULLs, exactly how _read_dirs presents
        pre-evolution partitions."""
        o_types = {f.name: f.dataType for f in old.schema.fields}
        n_types = {f.name: f.dataType for f in new.schema.fields}
        cols = list(new.columns) + [c for c in old.columns if c not in n_types]
        old = old.select(*[
            F.col(c) if c in o_types
            else F.lit(None).cast(n_types[c]).alias(c)
            for c in cols
        ])
        new = new.select(*[
            F.col(c) if c in n_types
            else F.lit(None).cast(o_types[c]).alias(c)
            for c in cols
        ])
        return old, new
