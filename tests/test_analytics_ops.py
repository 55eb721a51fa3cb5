"""Registry analytics gates (percentiles, JSON histogram) vs numpy twins."""

import json

import numpy as np

from parallelcovertree_spark.registry import (
    event_type_pivot,
    event_value_percentiles,
    events_minute_gapfill,
    lineitem_rollup,
    props_json_histogram,
)

SF = "/root/testdata/sf0.001"


def test_percentiles_are_nearest_rank_values(spark):
    got = {r["event_type"]: r for r in event_value_percentiles(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "value", "event_id"
    ).collect()
    groups = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    assert set(got) == set(groups)
    for et, rows in groups.items():
        vals = np.array([v for v, _ in sorted(rows)])
        n = len(vals)
        r = got[et]
        assert r["n"] == n
        assert r["p50"] == vals[int(np.ceil(n * 0.5)) - 1]
        assert r["p95"] == vals[int(np.ceil(n * 0.95)) - 1]
        assert r["max_value"] == vals[-1]
        # nearest-rank percentiles are actual data values, never interpolated
        assert r["p50"] in vals and r["p95"] in vals


def test_gapfill_grid_is_dense_and_count_preserving(spark):
    rows = sorted(events_minute_gapfill(spark, SF).collect())
    minutes = [r["minute"] for r in rows]
    assert minutes == list(range(minutes[0], minutes[-1] + 1))  # dense grid
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == n_events  # nothing lost/dup'd
    assert any(r["n_events"] == 0 for r in rows)  # gaps actually zero-filled


def test_rollup_levels_are_consistent(spark):
    rows = lineitem_rollup(spark, SF).collect()
    # lvl is the GROUPING() marker — rollup rows identified structurally,
    # never by the 'ALL' display sentinel
    detail = [r for r in rows if r["lvl"] == 0]
    subtot = {r["returnflag"]: r for r in rows if r["lvl"] == 1}
    grand = [r for r in rows if r["lvl"] == 3]
    assert len(grand) == 1 and grand[0]["linestatus"] == "ALL"
    assert grand[0]["n"] == sum(r["n"] for r in detail)
    assert grand[0]["sum_cents"] == sum(r["sum_cents"] for r in detail)
    for flag, s in subtot.items():
        mine = [r for r in detail if r["returnflag"] == flag]
        assert s["n"] == sum(r["n"] for r in mine)


def test_pivot_counts_match_long_form(spark):
    wide = {r["user_id"]: r for r in event_type_pivot(spark, SF).collect()}
    long = spark.read.parquet(f"{SF}/events.parquet").groupBy(
        "user_id", "event_type"
    ).count().collect()
    expect = {}
    for r in long:
        expect.setdefault(r["user_id"], {})[r["event_type"]] = r["count"]
    assert set(wide) == set(expect)
    for uid, row in wide.items():
        for t in ["click", "error", "purchase", "signup", "view"]:
            assert row[t] == expect[uid].get(t, 0)


def test_corpus_splits_are_duplicate_stable_and_complete(spark):
    from parallelcovertree_spark.registry import corpus_splits

    rows = corpus_splits(spark, SF).collect()
    docs = {r["doc_id"]: r["split"] for r in rows}
    assert set(r["split"] for r in rows) <= {"train", "val", "test"}
    # exact duplicate texts must land in the SAME split (no leakage via dups)
    by_text = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect():
        by_text.setdefault(r["text"], []).append(docs[r["doc_id"]])
    for splits in by_text.values():
        assert len(set(splits)) == 1
    # every doc assigned exactly once
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n and len(docs) == n


def test_props_histogram_matches_json_parse(spark):
    got = {r["bucket"]: (r["cnt"], r["min_k"], r["max_k"])
           for r in props_json_histogram(spark, SF).collect()}
    ks = [json.loads(r["props"])["k"]
          for r in spark.read.parquet(f"{SF}/events.parquet").select("props").collect()]
    expect = {}
    for k in ks:
        b = k // 10
        c, lo, hi = expect.get(b, (0, k, k))
        expect[b] = (c + 1, min(lo, k), max(hi, k))
    assert got == expect


def test_conversion_funnel_ordering(spark):
    """Step timestamps must be strictly increasing when reached; reached
    counts exactly the non-missing steps."""
    from parallelcovertree_spark.registry import conversion_funnel

    rows = conversion_funnel(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        steps = [u for u in (r.v_us, r.c_us, r.p_us) if u != -1]
        assert steps == sorted(steps) and len(set(steps)) == len(steps)
        assert r.reached == len(steps)
        if r.p_us != -1:
            assert r.c_us != -1  # no skipping steps


def test_retention_cohorts_offsets(spark):
    from parallelcovertree_spark.registry import retention_cohorts

    rows = retention_cohorts(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.day_offset >= 0 for r in rows)
    # offset 0 row exists for every cohort (the cohort's own first day)
    cohorts = {r.cohort_day for r in rows}
    zero = {r.cohort_day for r in rows if r.day_offset == 0}
    assert cohorts == zero


def test_polygon_metrics_against_closed_forms(spark):
    """Regular hexagon with circumradius r: area = (3√3/2)·r², perimeter =
    6r — the shoelace/edge sums must match the closed forms to float
    tolerance (the gate pins cross-engine bit-parity; this pins geometry)."""
    import math

    from parallelcovertree_spark.registry import polygon_metrics_q

    rows = polygon_metrics_q(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 8
    for r in rows:
        rp = 1.0 + (r.poly_id % 4) * 0.5
        # HEX literals round 0.8660254… to 0.866025, so closed forms match
        # to ~1e-6 relative, not machine precision
        assert math.isclose(r.area, 1.5 * math.sqrt(3) * rp * rp, rel_tol=2e-6)
        assert math.isclose(r.perimeter, 6.0 * rp, rel_tol=2e-6)


def test_zonal_stats_matches_pip_plus_python_agg(spark):
    """Zonal stats must equal (point_in_polygon hits) → python aggregation,
    including a point inside two overlapping hexagons counting in both."""
    from parallelcovertree_spark.operators.polygon import (
        point_in_polygon_join,
        zonal_stats,
    )

    # two overlapping hexagons + one far away
    polys = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0), (1, 1.0, 0.0, 2.0), (2, 50.0, 50.0, 1.0)],
        "poly_id long, cx double, cy double, rp double",
    )
    import numpy as np

    rng = np.random.default_rng(31)
    pts_rows = [
        (i, float(a), float(b), int(v))
        for i, (a, b, v) in enumerate(
            zip(
                rng.uniform(-3, 5, 120),
                rng.uniform(-3, 3, 120),
                rng.integers(1, 100, 120),
            )
        )
    ]
    pts = spark.createDataFrame(pts_rows, "id long, x double, y double, v long")
    hits = point_in_polygon_join(pts, polys).collect()
    vals = {i: v for i, _, _, v in pts_rows}
    want: dict[int, list[int]] = {}
    for h in hits:
        want.setdefault(h["poly_id"], []).append(vals[h["point_id"]])
    got = {r["poly_id"]: r for r in zonal_stats(pts, polys, res=1.0).collect()}
    assert set(got) == set(want)  # empty polygons absent on both sides
    for pid, vs in want.items():
        r = got[pid]
        assert r["n_points"] == len(vs)
        assert r["sum_v"] == sum(vs)
        assert (r["min_v"], r["max_v"]) == (min(vs), max(vs))
        assert r["mean_v"] == sum(vs) / len(vs)


def test_session_concurrency_sweep_semantics(spark):
    from parallelcovertree_spark.operators.asof import session_concurrency

    day = 86_400_000_000
    sessions = [
        # day 0: [0,100], [50,200], [150,300] → peak 2 (at 50-100 and 150-200)
        (0, 100), (50, 200), (150, 300),
        # back-to-back: [400,500] and [501,600] never overlap → peak stays 2
        (400, 500), (501, 600),
        # multi-day session spanning days 1-3 → counted in each, clipped
        (day + 10, 3 * day + 10),
        # day 3: one more → peak 2 on day 3
        (3 * day + 5, 3 * day + 9),
    ]
    df = spark.createDataFrame(sessions, "start_us long, end_us long")
    got = {
        r.day: (r.n_sessions, r.max_concurrent)
        for r in session_concurrency(df, day).collect()
    }
    assert got == {
        0: (5, 2),
        1: (1, 1),
        2: (1, 1),
        3: (2, 2),
    }


def test_session_concurrency_exact_touch_counts_once(spark):
    from parallelcovertree_spark.operators.asof import session_concurrency

    # [0,100] and [100,200] DO overlap at t=100 (inclusive ends) → peak 2;
    # [0,100] and [101,200] do not → peak 1
    overlap = spark.createDataFrame([(0, 100), (100, 200)], "start_us long, end_us long")
    touch = spark.createDataFrame([(0, 100), (101, 200)], "start_us long, end_us long")
    assert session_concurrency(overlap).collect()[0].max_concurrent == 2
    assert session_concurrency(touch).collect()[0].max_concurrent == 1


def test_hll_sketch_tracks_exact_distinct(spark):
    """approx_count_distinct (HyperLogLog++, the 100 TB distinct path) must
    track the exact DAU gate within its configured rsd on real data."""
    import pyspark.sql.functions as F

    from parallelcovertree_spark.registry import NTZ_EPOCH_US, _DAY_US

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    day = F.expr(f"({NTZ_EPOCH_US.format(ts='ts')}) DIV {_DAY_US}")
    both = (
        ev.groupBy(day.alias("day"))
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(both) == 30
    for r in both:
        assert abs(r.approx - r.exact) <= max(3, 0.06 * r.exact), (
            r.day, r.exact, r.approx,
        )


def test_rolling_active_users_brute_force(spark):
    """Rolling 7-day distinct vs a python brute force on a small synthetic."""
    import pyspark.sql.functions as F

    day = 86_400_000_000
    rows = [
        (1, 0), (2, 0),        # day 0
        (1, 1),                # day 1
        (3, 5),                # day 5
        (2, 9),                # day 9
    ]
    # build a tiny events-like frame: ts from day index
    import datetime

    ev = spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), 0)
            for u, d in rows
        ],
        "user_id long, ts timestamp, event_id long",
    )
    from parallelcovertree_spark.registry import NTZ_EPOCH_US

    dcol = F.expr(f"({NTZ_EPOCH_US.format(ts='ts')}) DIV {day}")
    visits = ev.select("user_id", dcol.alias("day")).distinct()
    offs = F.array(*[F.lit(i) for i in range(7)])
    donated = visits.select(
        "user_id", F.explode(offs).alias("o"), "day"
    ).select("user_id", (F.col("day") + F.col("o")).alias("rday"))
    maxd = visits.agg(F.max("day").alias("md"))
    got = {
        r.rday: r.n
        for r in donated.crossJoin(F.broadcast(maxd))
        .where(F.col("rday") <= F.col("md"))
        .groupBy("rday")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    base = min(got)  # epoch day of 2024-01-01
    want = {}
    for d in range(10):
        users = {u for u, vd in rows if d - 6 <= vd <= d}
        if users:
            want[base + d] = len(users)
    assert got == want


def test_doc_token_moments_match_scipy_free_numpy(spark):
    """Moments gate vs plain numpy population skewness/kurtosis."""
    import numpy as np
    import pytest

    from parallelcovertree_spark.registry import doc_token_moments

    rows = {r.lang: r for r in doc_token_moments(spark, "/root/testdata/sf0.01").collect()}
    import duckdb

    lens = duckdb.sql(
        "SELECT lang, CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1 AS BIGINT) AS l "
        "FROM '/root/testdata/sf0.01/documents.parquet'"
    ).df()
    for lang, grp in lens.groupby("lang"):
        x = grp["l"].to_numpy(np.float64)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        r = rows[lang]
        assert r.n == len(x)
        assert r.mean_len == pytest.approx(mu, rel=1e-9)
        assert r.var_len == pytest.approx(m2, rel=1e-9)
        assert r.skewness == pytest.approx(m3 / m2**1.5, rel=1e-9)
        assert r.kurtosis == pytest.approx(m4 / m2**2, rel=1e-9)


def test_percentile_approx_tracks_exact(spark):
    """percentile_approx (t-digest partial aggregation, the 100 TB path)
    vs the exact nearest-rank gate semantics on real event values."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile_approx(cents, array(0.5, 0.9), 1000)").alias("ap"),
            F.expr("percentile(cents, array(0.5, 0.9))").alias("ex"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for a, e in zip(r.ap, r.ex):
            # t-digest at accuracy 1000 on ~thousands of rows: within 2%
            # of the exact percentile (value scale), never wildly off
            assert abs(a - e) <= max(5, 0.02 * abs(e)), (r.event_type, a, e)


def test_tile_profiles_modal_tie_and_share(spark):
    """tile_profiles semantics on a designed frame via the registry fn's
    building blocks (modal tie → lexicographic lang; share one division)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [("en", "s1", 7), ("de", "s2", 7), ("de", "s1", 7), ("en", "s1", 7),
         ("fr", "s3", 9)],
        "lang string, source string, cell_id long",
    )
    lc = docs.groupBy("cell_id", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("cell_id")
    ranked = lc.select(
        "cell_id", "lang", "n",
        F.row_number().over(w.orderBy(F.desc("n"), F.asc("lang"))).alias("rk"),
        F.sum("n").over(w).alias("n_docs"),
    ).where("rk = 1")
    src = docs.groupBy("cell_id").agg(F.countDistinct("source").alias("n_sources"))
    out = {r.cell_id: r for r in ranked.join(src, "cell_id").collect()}
    # cell 7: en=2, de=2 → tie → 'de'; 2 sources
    assert (out[7].lang, out[7].n, out[7].n_docs, out[7].n_sources) == ("de", 2, 4, 2)
    assert (out[9].lang, out[9].n_docs, out[9].n_sources) == ("fr", 1, 1)
