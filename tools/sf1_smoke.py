"""sf1 smoke gate (VERDICT r2 next #9): synthesize a deterministic 10x
expansion of /root/testdata/sf0.1 and run the FULL oracle gate against it,
to catch scale-sensitive plan flips (broadcast-threshold crossings, AQE
re-plans) that sf0.01 cannot exercise.

Expansion rule: every fact table is replicated REPS times; integer id/key
columns are shifted by rep * (max+1) so orderings and groupings stay
deterministic (the driver hash compare needs a total order). Dimension
tables (region, nation) are left as-is. Spark and DuckDB read the SAME
expanded parquet, so the comparison semantics are identical to the driver's.

Usage: python tools/sf1_smoke.py [query ...]   (subset optional)
Writes the expanded tables to $COVERGRID_SF1_DIR (default
/tmp/covergrid-sf1), reusing them if already present.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10
DIMS = {"region", "nation"}
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
KEY_RE = re.compile(r"(_id|key)$", re.IGNORECASE)


def build(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue
        src = f"read_parquet('{SRC}/{t}.parquet')"
        cols = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        if t in DIMS:
            con.execute(f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)")
            continue
        exprs = []
        for name, typ, *_ in cols:
            if KEY_RE.search(name) and typ in ("BIGINT", "INTEGER", "SMALLINT", "HUGEINT"):
                mx = con.execute(f"SELECT MAX({name}) FROM {src}").fetchone()[0] or 0
                exprs.append(
                    f"CAST({name} + rep * {int(mx) + 1} AS {typ}) AS {name}"
                )
            else:
                exprs.append(name)
        q = (
            f"COPY (SELECT {', '.join(exprs)} FROM {src}, range({REPS}) r(rep) "
            f"ORDER BY rep) TO '{out}' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"[sf1] {t}: {n} rows")


def main() -> None:
    dst = os.environ.get("COVERGRID_SF1_DIR", "/tmp/covergrid-sf1")
    build(dst)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "tools", "check_correctness.py"), dst]
    cmd += sys.argv[1:]
    raise SystemExit(subprocess.call(cmd, cwd=repo))


if __name__ == "__main__":
    main()
