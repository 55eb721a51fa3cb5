"""Scaling-efficiency measurement (BASELINE.md protocol).

Runs bench.py at two parallelism levels (local[N] and local[4N]) on the
identical input — the sandbox proxy for N vs 4N executors — and writes
BENCH/BASELINE.md with throughput at both plus
efficiency = throughput_4N / (4 × throughput_N)... reported as-is; the
north-rule pass bar is ≥ 0.8 of ideal linear scaling between the two sizes
(ideal = 4× the small-cluster throughput).

Usage: python tools/run_scaling.py [small_cpus=8] [large_cpus=32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(cpus: int, sf_dir: str, scale: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               BENCH_SCALE=scale)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed @ {cpus} cpus:\n{out.stderr[-2000:]}")
    res = json.loads(lines[-1])
    res["wall_sec"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = os.environ.get("BENCH_SCALE", "200")

    r_small = run_bench(small, sf_dir, scale)
    r_large = run_bench(large, sf_dir, scale)

    # north-rule evidence: the SAME job at two cluster sizes must produce the
    # SAME answer — row counts per query are part of the record
    assert r_small["rows"] == r_large["rows"], (
        f"output rows differ across parallelism: {r_small['rows']} vs {r_large['rows']}"
    )

    tp_s, tp_l = r_small["docs_per_sec"], r_large["docs_per_sec"]
    ratio = large / small
    eff = tp_l / (ratio * tp_s)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_last_run.md", "w") as f:
        f.write(f"""# scaling run (raw) — fold into BENCH/BASELINE.md by hand

Protocol (BASELINE.md): identical input ({sf_dir}, documents × {scale} replicas
= {r_small['n_docs']} points, radius {r_small['radius']}), flagship spatial
workload (ε-join + kNN k=10), run at two parallelism levels as the sandbox
proxy for N vs {ratio:.0f}N executors.

| parallelism | ε-join sec | kNN sec | spatial docs/sec | total bench sec |
|---|---|---|---|---|
| local[{small}] | {r_small['queries']['q_epsilon_join']} | {r_small['queries']['q_knn10']} | {tp_s} | {r_small['value']} |
| local[{large}] | {r_large['queries']['q_epsilon_join']} | {r_large['queries']['q_knn10']} | {tp_l} | {r_large['value']} |

**Scaling efficiency (N → {ratio:.0f}N) = {tp_l:.0f} / ({ratio:.0f} × {tp_s:.0f}) = {eff:.3f}**
(pass bar ≥ 0.8 of ideal linear; ≥ {ratio * 0.8:.1f}× speedup)

Raw JSON:

```json
{json.dumps(r_small)}
{json.dumps(r_large)}
```
""")
    print(json.dumps({"small": tp_s, "large": tp_l, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
