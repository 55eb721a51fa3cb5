"""Registry analytics gates (percentiles, JSON histogram) vs numpy twins."""

import json

import numpy as np

from parallelcovertree_spark.registry import event_value_percentiles, props_json_histogram

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
