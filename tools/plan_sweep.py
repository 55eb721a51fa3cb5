"""Plan sweep over every registered query (optimization-round audit).

For each `queries()` entry: build the DataFrame at the given sf dir, capture
`.explain("formatted")`, and summarize red flags — row-at-a-time Python
(BatchEvalPython), CartesianProduct, exchange count, WholeStageCodegen spans,
scan column pruning. Writes per-query plans to --out and prints one summary
line per query.

Usage: python tools/plan_sweep.py [sf_dir] [--out DIR] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from parallelcovertree_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = None
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    spark = get_spark(app_name="plan-sweep")
    qs = entrymod.queries()
    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")
            continue
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        flags = []
        n_bep = plan.count("BatchEvalPython")
        n_cart = plan.count("CartesianProduct")
        n_exch = plan.count("Exchange")
        n_wsc = plan.count("WholeStageCodegen")
        n_arrow = (plan.count("ArrowEvalPython") + plan.count("MapInPandas")
                   + plan.count("MapInArrow") + plan.count("FlatMapGroupsInPandas")
                   + plan.count("FlatMapCoGroupsInPandas"))
        if n_bep:
            flags.append(f"BatchEvalPython×{n_bep}")
        if n_cart:
            flags.append(f"CARTESIAN×{n_cart}")
        rows.append((name, n_exch, n_wsc, n_arrow, flags))
        print(f"{name:34s} exch={n_exch:2d} codegen={n_wsc:2d} "
              f"pyops={n_arrow} {'; '.join(flags)}  ({time.time()-t0:.1f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
