"""Local twin of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from parallelcovertree_spark.session import get_spark  # noqa: E402
from parallelcovertree_spark.sources.tables import TABLES  # noqa: E402


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


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
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):8d} (rows-only, no oracle) {t1-t0:6.1f}s")
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        a, b = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:32s} rows={len(srows):8d} oracle={len(drows):8d} "
            f"cols={'OK' if ok_cols else f'{scols}!={dcols}'} vals={'OK' if ok_vals else 'MISMATCH'} "
            f"[{status}] {t1-t0:6.1f}s"
        )
        if status == "FAIL":
            failed.append(name)
            if not ok_vals and len(a) == len(b):
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"    spark={x}\n    duck ={y}")
            elif len(a) != len(b):
                sa, sb = set(map(repr, a)), set(map(repr, b))
                print(f"    only-spark: {list(sa - sb)[:2]}")
                print(f"    only-duck : {list(sb - sa)[:2]}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all checked queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
