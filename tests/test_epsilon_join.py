"""ε-join engine vs brute-force oracle — the reference's primary correctness
contract (programs/epsilon_graph.cpp:111-163): order-insensitive per-source
set equality, self-loops included."""

from __future__ import annotations

import pytest

from parallelcovertree_spark.operators.epsilon_join import (
    epsilon_self_join,
    load_imbalance,
)
from parallelcovertree_spark.oracle import epsilon_graph_np
from parallelcovertree_spark.sources.synthetic import (
    gaussian_points_np,
    synthetic_points,
)


@pytest.mark.parametrize("n,radius", [(100, 0.15), (100, 2.0), (1000, 0.5), (1000, 2.0)])
def test_epsilon_matches_bruteforce(spark, n, radius):
    pts = synthetic_points(spark, n).persist()
    got = {
        (r.src, r.dst)
        for r in epsilon_self_join(pts, radius, id_col="id").collect()
    }
    want = epsilon_graph_np(gaussian_points_np(n), radius)
    assert got == want
    # self-loops present (d(u,u)=0 ≤ r — reference includes them)
    assert all((i, i) in got for i in range(n))
    pts.unpersist()


def test_epsilon_salted_identical(spark):
    """Salting is a physical knob: identical output rows."""
    pts = synthetic_points(spark, 500).persist()
    plain = {(r.src, r.dst) for r in epsilon_self_join(pts, 1.0).collect()}
    salted = {(r.src, r.dst) for r in epsilon_self_join(pts, 1.0, salt=4).collect()}
    assert plain == salted
    pts.unpersist()


def test_partition_invariance(spark):
    """Same output at different parallelism (reference scatter semantics +
    the north rule's two-cluster-size equivalence)."""
    a = synthetic_points(spark, 300, partitions=1)
    b = synthetic_points(spark, 300, partitions=16)
    ga = {(r.src, r.dst) for r in epsilon_self_join(a, 1.0).collect()}
    gb = {(r.src, r.dst) for r in epsilon_self_join(b, 1.0).collect()}
    assert ga == gb


def test_load_imbalance_metric(spark):
    pts = synthetic_points(spark, 1000)
    m = load_imbalance(pts, res=1.0, partitions=8)
    assert m > 0.0


def test_half_plan_options_and_expansion(spark):
    """Half-neighborhood self-join: include_self/emit_dist2 parameter
    surface, and the candidate side explodes to exactly 5 cells (not 9)."""
    import numpy as np
    import pyspark.sql.functions as F

    pts = synthetic_points(spark, 300)
    pdf = gaussian_points_np(300)
    no_self = {(r.src, r.dst) for r in
               epsilon_self_join(pts, 1.0, include_self=False).collect()}
    want = {(s, d) for s, d in epsilon_graph_np(pdf, 1.0) if s != d}
    assert no_self == want
    with_d2 = epsilon_self_join(pts, 1.0, emit_dist2=True)
    assert with_d2.columns == ["src", "dst", "dist2"]
    row = with_d2.where(F.col("src") == F.col("dst")).limit(1).collect()[0]
    assert row.dist2 == 0.0
    # physical expansion: the plan's Generate emits 5 structs per input row
    plan = with_d2._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "ShuffledHashJoin" in plan and "CartesianProduct" not in plan
