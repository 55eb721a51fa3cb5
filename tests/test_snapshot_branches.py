"""Write-audit-publish branching on SnapshotTable: staged commits stay
invisible on main, audit reads see the branch, publish fast-forwards,
divergence is refused, expiry pins branch heads."""

from __future__ import annotations

import pytest


def _mk(spark, path, rows):
    from parallelcovertree_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(path))
    df = spark.createDataFrame(rows, "k long, lang string, v long")
    t.commit(df, partition_by="lang")
    return t


def _rows(df):
    return {(r.k, r.lang, r.v) for r in df.collect()}


def test_wap_stage_audit_publish(tmp_path, spark):
    t = _mk(spark, tmp_path / "t", [(1, "en", 10), (2, "de", 20)])
    t.create_branch("audit")
    staged = spark.createDataFrame([(3, "en", 30), (4, "fr", 40)], "k long, lang string, v long")
    t.merge(spark, staged, "k", branch="audit")

    # main is UNCHANGED until publish; audit sees the staged rows
    assert _rows(t.read(spark)) == {(1, "en", 10), (2, "de", 20)}
    assert _rows(t.read(spark, branch="audit")) == {
        (1, "en", 10), (2, "de", 20), (3, "en", 30), (4, "fr", 40),
    }
    # audit step: validate staged data (the WAP gate), then publish
    assert t.read(spark, branch="audit").where("v IS NULL").count() == 0
    t.publish("audit")
    assert _rows(t.read(spark)) == _rows(t.read(spark, branch="audit"))


def test_wap_publish_refuses_divergence(tmp_path, spark):
    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    t.create_branch("audit")
    t.commit(
        spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long"),
        partition_by="lang",
        branch="audit",
    )
    # main moves independently → publish must refuse (not silently clobber)
    t.merge(
        spark,
        spark.createDataFrame([(9, "en", 90)], "k long, lang string, v long"),
        "k",
    )
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.publish("audit")
    # main kept its own write
    assert (1, "en", 10) in _rows(t.read(spark)) and (9, "en", 90) in _rows(
        t.read(spark)
    )


def test_unknown_branch_operations_fail_loudly(tmp_path, spark):
    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    df = spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long")
    with pytest.raises(ValueError, match="unknown branch"):
        t.commit(df, partition_by="lang", branch="nope")
    with pytest.raises(ValueError, match="unknown branch"):
        t.merge(spark, df, "k", branch="nope")
    with pytest.raises(ValueError, match="unknown branch"):
        t.read(spark, branch="nope")


def test_expire_pins_staged_branch_head(tmp_path, spark):
    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    t.create_branch("audit")
    staged_id = t.merge(
        spark,
        spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long"),
        "k",
        branch="audit",
    )
    # several main commits later, expire down to the last manifest
    for v in range(3):
        t.merge(
            spark,
            spark.createDataFrame([(10 + v, "en", v)], "k long, lang string, v long"),
            "k",
        )
    expired = t.expire_snapshots(keep_last=1)
    assert staged_id not in expired  # branch head survived
    # the staged branch is still fully readable and publishable... except
    # main has diverged — drop it instead
    assert _rows(t.read(spark, branch="audit")) == {(1, "en", 10), (2, "de", 20)}
    t.drop_branch("audit")
    assert "audit" not in t.refs()


def test_legacy_tables_stay_refs_free(tmp_path, spark):
    import os

    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    t.merge(
        spark,
        spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long"),
        "k",
    )
    t.delete(spark, "k = 1")
    assert not os.path.exists(str(tmp_path / "t" / "refs.json"))
    assert _rows(t.read(spark)) == {(2, "de", 20)}


def test_publish_survives_expiry_of_intermediate_ancestors(tmp_path, spark):
    """ADVICE r4 (medium): expire_snapshots pinned only branch-head manifests;
    publish() walks the full parent_id chain, so a branch with TWO staged
    merges + expire(keep_last=1) made a legal fast-forward publish raise
    FileNotFoundError. The head→main manifest ancestry must survive expiry."""
    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    t.create_branch("audit")
    # two staged merges → an INTERMEDIATE manifest between main and the head
    t.merge(
        spark,
        spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long"),
        "k",
        branch="audit",
    )
    t.merge(
        spark,
        spark.createDataFrame([(3, "fr", 30)], "k long, lang string, v long"),
        "k",
        branch="audit",
    )
    t.expire_snapshots(keep_last=1)  # routine maintenance
    t.publish("audit")  # fast-forward is legal — must not raise
    assert _rows(t.read(spark)) == {(1, "en", 10), (2, "de", 20), (3, "fr", 30)}


def test_expire_still_drops_unreferenced_history_with_branches(tmp_path, spark):
    """Ancestry pinning must not neuter expiry: main-line manifests BELOW the
    branch point that no ref chain needs still expire."""
    t = _mk(spark, tmp_path / "t", [(1, "en", 10)])
    old_ids = []
    for v in range(3):  # main-line history before the branch
        old_ids.append(
            t.merge(
                spark,
                spark.createDataFrame(
                    [(10 + v, "en", v)], "k long, lang string, v long"
                ),
                "k",
            )
        )
    t.create_branch("audit")
    t.merge(
        spark,
        spark.createDataFrame([(2, "de", 20)], "k long, lang string, v long"),
        "k",
        branch="audit",
    )
    expired = t.expire_snapshots(keep_last=1)
    # pre-branch main history (below main's pinned head) is expirable
    assert set(old_ids[:-1]) <= set(expired)
    t.publish("audit")
    assert (2, "de", 20) in _rows(t.read(spark))
