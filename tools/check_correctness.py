"""Local twin of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values.

Faithful to the driver's canonicalizer (learned in round 1 the hard way):
results are compared as PANDAS frames (Spark .toPandas() vs DuckDB .df()),
and dtype *kind* matters — DuckDB SUM(BIGINT) returns HUGEINT which lands in
pandas as float64, and a dtype-sensitive row hash then mismatches Spark's
int64 even when every value compares equal under ==. Likewise list-typed
columns make pandas' factorize throw. So this twin:

- fails a query when an integer column on one side is float on the other,
- fails a query whose output contains list/array values,
- otherwise compares values order-insensitively (floats rounded to 9 dp).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from parallelcovertree_spark.session import get_spark  # noqa: E402
from parallelcovertree_spark.sources.tables import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> tuple[pd.DataFrame, str | None]:
    """Sorted-columns, sorted-rows canonical frame + dtype signature.
    Returns (frame, err) — err set when the frame is unhashable (lists)."""
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            return df, f"column {c!r} holds list values (driver canonicalizer throws)"
    # Sort on QUANTIZED float keys, coarser than the compare tolerance
    # (round-7 vs tol 1e-9): sub-tolerance engine differences must not
    # reorder rows and misalign the positional per-column compare, and a
    # boundary straddle now needs a 100× larger (real) difference — such
    # rows genuinely differ and should fail anyway.
    keys = df.copy()
    for c in keys.columns:
        if pd.api.types.is_float_dtype(keys[c].dtype):
            keys[c] = keys[c].round(7)
    try:
        order = keys.sort_values(list(keys.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    except TypeError as e:  # pragma: no cover - same failure the driver hits
        return df, f"sort_values failed: {e}"
    return df, None


def kind(dtype) -> str:
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    return "obj"


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} != {len(b)}"
    for c in a.columns:
        ka, kb = kind(a[c].dtype), kind(b[c].dtype)
        if ka != kb:
            return False, f"dtype kind mismatch on {c!r}: {a[c].dtype} vs {b[c].dtype}"
        if ka == "int":
            if not np.array_equal(a[c].to_numpy(np.int64), b[c].to_numpy(np.int64)):
                return False, f"values differ in int column {c!r}"
        elif ka == "float":
            va, vb = a[c].to_numpy(np.float64), b[c].to_numpy(np.float64)
            if not np.allclose(va, vb, rtol=0, atol=5e-10, equal_nan=True):
                return False, f"values differ in float column {c!r}"
        else:
            if not a[c].astype(str).equals(b[c].astype(str)):
                return False, f"values differ in column {c!r}"
    return True, ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            _, err = canon(sdf)
            status = "OK" if err is None else f"FAIL ({err})"
            print(f"{name:32s} rows={len(sdf):8d} (rows-only, no oracle) [{status}] {t1-t0:6.1f}s")
            if err is not None:
                failed.append(name)
            continue
        ddf = con.execute(oracles[name]).df()
        sa, ea = canon(sdf)
        sb, eb = canon(ddf)
        if ea or eb:
            print(f"{name:32s} [FAIL] canon: {ea or eb}")
            failed.append(name)
            continue
        ok_cols = list(sa.columns) == list(sb.columns)
        ok_vals, why = frames_equal(sa, sb) if ok_cols else (False, "column mismatch")
        status = "OK" if (ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:32s} rows={len(sa):8d} oracle={len(sb):8d} "
            f"cols={'OK' if ok_cols else f'{list(sa.columns)}!={list(sb.columns)}'} "
            f"vals={'OK' if ok_vals else why} [{status}] {t1-t0:6.1f}s"
        )
        if status == "FAIL":
            failed.append(name)
            if len(sa) == len(sb) and ok_cols:
                neq = (sa.astype(str) != sb.astype(str)).any(axis=1)
                for i in sa.index[neq][:3]:
                    print(f"    spark={tuple(sa.loc[i])}\n    duck ={tuple(sb.loc[i])}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all checked queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
