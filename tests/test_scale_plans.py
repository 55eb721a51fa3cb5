"""Scale-safety plan assertions (VERDICT r2 'wrong' #2/#3 + ADVICE items).

These tests pin PLAN SHAPE, not just answers: the properties that decide
whether an operator survives 100 TB — no single-partition global sort, no
full-document shuffle keys, log-round connected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parallelcovertree_spark.operators.dedup import connected_components
from parallelcovertree_spark.operators.indexing import global_row_index

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_index_matches_window_and_avoids_global_sort(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "n_chars")
    out = global_row_index(docs, ["n_chars", "doc_id"])
    got = out.orderBy("global_idx").toPandas()

    from pyspark.sql import Window as W

    want = docs.select(
        "doc_id", "n_chars",
        F.row_number().over(W.orderBy("n_chars", "doc_id")).alias("global_idx"),
    ).orderBy("global_idx").toPandas()
    want["global_idx"] = want["global_idx"].astype(np.int64)  # window rank is int32
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_chars", "global_idx"]], want[["doc_id", "n_chars", "global_idx"]]
    )

    # plan shape: the prefix-sum path must never window-sort in one partition
    plan = _plan(out)
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower() or "FlatMapGroups" in plan or "MapInPandas" in plan


def test_global_index_parallelism_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "n_chars")
    a = global_row_index(docs.repartition(1), ["n_chars", "doc_id"]).orderBy("global_idx").toPandas()
    b = global_row_index(docs.repartition(7), ["n_chars", "doc_id"]).orderBy("global_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_exact_dedup_shuffles_digest_not_text(spark, monkeypatch):
    import __spark_entry__ as entry

    df = entry.queries()["exact_dedup"](spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    # the aggregate's shuffle key must be the sha2 digest, never raw text
    assert "sha2" in plan
    low = plan.lower()
    part = low.split("hashpartitioning", 1)
    assert len(part) == 2, plan
    key_segment = part[1][:200]
    # the shuffled key is the projected digest expression, never the raw text
    assert "_groupingexpression" in key_segment or "digest" in key_segment
    assert "text#" not in key_segment


def test_connected_components_long_chain_converges_log_rounds(spark):
    # diameter-200 chain: plain min-label needs ~200 rounds; pointer doubling
    # must converge within the default max_iters (log2(200) ≈ 8).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    labels = connected_components(edges, max_iters=12)
    got = {r.node: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(201)}


def test_fingerprint_bucketing_handles_skewed_lengths():
    from parallelcovertree_spark.functions.text import fingerprint_np

    # one 2 MB doc among tiny docs: padded matrix must bucket, output unchanged
    texts = ["tiny doc %d" % i for i in range(1000)] + ["z" * (2 << 20)]
    out = fingerprint_np(pd.Series(texts))
    assert len(out) == 1001
    # per-row function: permutation invariance proves bucketing didn't mix rows
    perm = np.random.RandomState(7).permutation(1001)
    out2 = fingerprint_np(pd.Series([texts[i] for i in perm]))
    assert (out2.to_numpy() == out.to_numpy()[perm]).all()


def test_fvecs_mixed_dim_directory_raises(spark, tmp_path):
    from parallelcovertree_spark.sources.fvecs import read_points_spark, write_fvecs

    d = tmp_path / "mixed"
    d.mkdir()
    write_fvecs(str(d / "a.fvecs"), np.random.RandomState(0).randn(10, 2).astype(np.float32))
    write_fvecs(str(d / "b.fvecs"), np.random.RandomState(1).randn(10, 3).astype(np.float32))
    with pytest.raises(Exception, match="mixed-dim"):
        read_points_spark(spark, str(d)).collect()


def test_global_index_survives_auto_conf_and_pid_collision(spark, monkeypatch):
    """ADVICE r3: 'auto' shuffle-partitions (AQE platforms; vanilla Spark
    rejects setting it, so the conf READ is patched) must not crash, and a
    user column named _pid must pass through untouched."""
    from pyspark.sql.conf import RuntimeConfig

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .withColumn("_pid", F.col("doc_id") * 2)
    )
    orig_get = RuntimeConfig.get

    def fake_get(self, key, *a, **kw):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return orig_get(self, key, *a, **kw)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    out = global_row_index(docs, ["n_chars", "doc_id"]).orderBy("global_idx")
    pdf = out.toPandas()
    assert list(pdf.columns) == ["doc_id", "n_chars", "_pid", "global_idx"]
    assert (pdf["_pid"].to_numpy() == pdf["doc_id"].to_numpy() * 2).all()
    assert (pdf["global_idx"].to_numpy() == np.arange(1, len(pdf) + 1)).all()


def test_url_hash64_bucketing_handles_skewed_lengths():
    """ADVICE r3 medium: one pathological mile-long URL in a batch must not
    change any hash (bucketing is a pure partition of the rows)."""
    from parallelcovertree_spark.functions.geo import url_hash64

    urls = [f"https://example.com/{i}" for i in range(2000)]
    base = url_hash64(urls)
    with_long = urls + ["https://example.com/" + "x" * (1 << 20)]
    mixed = url_hash64(with_long)
    assert (mixed[:2000] == base).all()
    # scalar FNV-1a reference for the long one
    h = 0xCBF29CE484222325
    for byt in with_long[-1].encode():
        h = ((h ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    assert int(mixed[-1]) == h


def test_minhash_min_band_wins_is_distinct_and_complete(spark):
    """The min-band-wins band join must emit exactly the distinct candidate
    set: equal to the naive any-band-matches pair set, with no duplicates."""
    from parallelcovertree_spark.operators.dedup import (
        minhash_dup_pairs_np,
        minhash_signatures_np,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    pairs = minhash_dup_pairs_np(docs, n_perm=32, bands=8).toPandas()
    got = set(zip(pairs["src"], pairs["dst"]))
    assert len(got) == len(pairs)  # distinct by construction

    sigs = {
        int(r.doc_id): tuple(r.sig)
        for r in minhash_signatures_np(docs, n_perm=32).collect()
    }
    ids = sorted(sigs)
    want = set()
    r = 32 // 8
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            for band in range(8):
                if sigs[a][band * r:(band + 1) * r] == sigs[b][band * r:(band + 1) * r]:
                    want.add((a, b))
                    break
    assert got == want and len(want) > 0


def test_asof_join_backward_semantics(spark):
    """Inclusive match at equal ts, latest-prior otherwise, NULL when no
    prior right row; plan is union+window — no join node, one shuffle."""
    from parallelcovertree_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102), (3, 7, 103)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 10, 900), (1, 15, 901), (2, 6, 902)],
        "k long, t long, rid long",
    )
    out = asof_join_backward(left, right, key="k", ts="t", payload_cols=["rid"])
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == {
        (100, 900),   # equal ts: inclusive
        (101, 901),   # latest prior (15 beats 10)
        (102, None),  # right row is LATER -> no match
        (103, None),  # key has no right rows at all
    }
    plan = _plan(out)
    assert "Join" not in plan and "Window" in plan


def test_interval_join_matches_brute_force(spark):
    """Bucketed interval join == brute-force window filter on dense random
    data, incl. inclusive boundaries and negative lower bounds."""
    import numpy as np

    from parallelcovertree_spark.operators.rangejoin import interval_join

    rng = np.random.RandomState(11)
    lrows = [(int(rng.randint(0, 5)), int(rng.randint(0, 1000)), i)
             for i in range(300)]
    rrows = [(int(rng.randint(0, 5)), int(rng.randint(0, 1000)), 1000 + i)
             for i in range(300)]
    left = spark.createDataFrame(lrows, "k long, lts long, lid long")
    right = spark.createDataFrame(rrows, "k long, rts long, rid long")
    for lower, upper in ((0, 50), (-30, 30), (17, 63)):
        got = {
            (r.lid, r.rid)
            for r in interval_join(
                left, right, key="k", left_ts="lts", right_ts="rts",
                lower=lower, upper=upper,
            ).collect()
        }
        want = {
            (lid, rid)
            for lk, lts, lid in lrows
            for rk, rts, rid in rrows
            if lk == rk and lts + lower <= rts <= lts + upper
        }
        assert got == want and len(want) > 0, (lower, upper)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing for co-located joins (the 100 TB fact⋈fact pattern): two
    tables bucketed+sorted on the join key must SortMergeJoin with NO
    Exchange on either side — the shuffle happened once at write time and
    is amortized over every later join."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bdemo")  # under the session's /tmp warehouse
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for name in ("docs_a", "docs_b"):
        (docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(f"bdemo.{name}"))
    a = spark.table("bdemo.docs_a").select("doc_id", "lang")
    b = spark.table("bdemo.docs_b").select("doc_id", "n_chars")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "doc_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert j.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE bdemo.docs_a")
        spark.sql("DROP TABLE bdemo.docs_b")


def test_aqe_splits_skewed_join_partition(spark):
    """Hot-key handling beyond measured salting: AQE's runtime skew-join
    must engage on a pathological key (one key = 99% of rows) — the final
    adaptive plan shows SortMergeJoin(skew=true) with the hot partition
    split into advisory-sized reads. This is the no-code-change safety net
    under every shuffle join the engine emits."""
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )}
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(spark.range(2_000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")))
        right = spark.range(51).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k")
        rows = j.collect()  # finalizes the adaptive plan on THIS query
        assert len(rows) == 202_000
        plan = _plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split at runtime
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
