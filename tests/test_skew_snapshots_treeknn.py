"""Skew-aware salting, snapshot tables (time travel + pruning), tree kNN."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parallelcovertree_spark.operators.epsilon_join import (
    epsilon_self_join_auto,
    load_imbalance,
)
from parallelcovertree_spark.oracle import epsilon_graph_np, knn_np
from parallelcovertree_spark.sources.snapshots import SnapshotTable
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_points,
)


def _clustered(spark, n):
    """All points inside one grid cell at radius 1.0 → maximal hot-cell skew."""
    pdf = gaussian_points_np(n)
    pdf["x"] = (pdf["x"] * 0.01).astype(np.float32)
    pdf["y"] = (pdf["y"] * 0.01).astype(np.float32)
    return spark.createDataFrame(pdf), pdf


def test_auto_salting_on_hot_cell(spark):
    df, pdf = _clustered(spark, 400)
    imb = load_imbalance(df, res=1.0, partitions=8)
    assert imb > 1.25  # genuinely skewed input
    edges, salt = epsilon_self_join_auto(df, 1.0, target_imbalance=1.25)
    assert salt > 0  # salting engaged
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == epsilon_graph_np(pdf, 1.0)  # identical rows, physical knob only


def test_auto_salting_uniform_no_salt(spark):
    pts = synthetic_points(spark, 500)
    edges, salt = epsilon_self_join_auto(pts, 0.5, target_imbalance=3.0)
    assert salt == 0
    assert {(r.src, r.dst) for r in edges.collect()} == epsilon_graph_np(
        gaussian_points_np(500), 0.5
    )


def test_snapshot_table_commit_timetravel_pruning(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "docs_table"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = t.commit(docs.where("doc_id < 100"), partition_by="lang")
    s2 = t.commit(docs, partition_by="lang")
    assert (s1, s2) == (1, 2)
    assert t.read(spark).count() == 500                      # latest
    assert t.read(spark, snapshot_id=1).count() == 100       # time travel
    h = t.history()
    assert [m["snapshot_id"] for m in h] == [1, 2]
    assert h[1]["parent_id"] == 1
    assert sum(h[0]["partition_rows"].values()) == 100       # per-partition lineage
    # partition pruning reaches the scan
    df = t.read(spark).where("lang = 'en'")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_snapshot_commit_is_atomic(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "tbl"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t.commit(docs)
    # a crashed commit = data dir without manifest: readers must not see it
    import os
    os.makedirs(f"{t.path}/snap-000000000099")
    assert t.latest_snapshot_id() == 1
    assert t.read(spark).count() == 500


def test_tree_knn_matches_oracle(spark):
    from parallelcovertree_spark.plans.covertree import build_cover_tree
    from parallelcovertree_spark.plans.query import tree_knn

    pts = synthetic_points(spark, 400).persist()
    model = build_cover_tree(pts, hub_cutoff=16)
    got = {(r.src, r.nbr_rank, r.dst) for r in tree_knn(model, pts, k=7).collect()}
    want = knn_np(gaussian_points_np(400), k=7)
    assert got == want
    pts.unpersist()
