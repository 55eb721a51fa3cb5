"""sf1 smoke gate (VERDICT r2 next #9): synthesize a deterministic 10x
expansion of /root/testdata/sf0.1 and run the FULL oracle gate against it,
to catch scale-sensitive plan flips (broadcast-threshold crossings, AQE
re-plans) that sf0.01 cannot exercise.

Expansion rule: every fact table is replicated REPS times; integer id/key
columns are shifted by rep * (max+1) so orderings and groupings stay
deterministic (the driver hash compare needs a total order). Dimension
tables (region, nation) are left as-is. Spark and DuckDB read the SAME
expanded parquet, so the comparison semantics are identical to the driver's.

By default the BRUTE-FORCE-BY-DEFINITION oracles are excluded: their DuckDB
side is O(n²) pair materialization (kNN ground truth = 2.5G pairs at 50k
docs; exact-cosine top-k = n²·dim) — measured >100GB RSS before being
killed. Those queries' SPARK plans are still scale-checked by bench.py at
sf0.1 and their semantics by the sf0.01 gate; everything with a scalable
oracle runs here at 10×. Pass query names to override the subset.

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


# oracles that materialize O(n²) pairs in DuckDB — excluded at sf1 (their
# Spark sides are bench-checked at sf0.1; semantics gate-checked at sf0.01)
QUADRATIC_ORACLES = {
    "knn_docs", "knn_docs_kernel", "knn_docs_queries", "covertree_knn",
    "nn_distance_cells",  # 1-NN stats: same O(n²) ranked-pair oracle as knn_docs
    "ripley_k_docs",  # pair counting: by-definition O(n²) oracle CTE
    "idw_interpolation",  # same O(n²) ranked-pair oracle shape as knn_docs
    # quadratic edge CTE + avg degree ~386 at sf1 makes the oracle's wedge
    # join ~hundreds of millions of rows; the engine's oriented plan is the
    # scalable one but shares the gate's corpus only at sf0.01
    "triangle_counts_docs",
    "clustering_coeff_docs",  # same quadratic-edge triple-join oracle
    "reverse_knn_counts",  # same O(n²) ranked-pair oracle as knn_docs
    "knn_kdist_histogram",  # same O(n²) ranked-pair oracle
    "bfs_layers_docs",  # quadratic edge CTE replayed 4 rounds in the oracle
    "ann_cosine_topk",
    # exact high-dim kNN: the SPARK side is the scalable hub-routed plan,
    # but the oracle is the by-definition O(n²·dim) flat self-join
    "knn_highdim_embeddings", "knn_highdim_queries", "epsilon_highdim_embeddings",
    # candidate volume is (nprobe/n_centroids)·n² — a constant fraction of
    # all-pairs; the oracle's flat join is that × dim rows (measured: 47%
    # of RAM and climbing at 20k vectors before being stopped)
    "ann_ivf_topk",
    # recursive-CTE label propagation: the `reach` set is O(Σ comp²) pairs
    # over the CORE subgraph — at sf1 the ε-graph has avg degree ~386 and
    # essentially one giant component, so reach ≈ 2.5e9 pairs (measured:
    # stalled >9min; every sub-stage's Spark side — ε-join, degree agg,
    # pointer-doubling CC — is separately sf1/bench-checked, and the
    # Spark-only dbscan_docs run at sf1 is timed in BENCH/sf1_smoke.txt)
    "dbscan_docs",
}
# near-dup operators: VERBATIM 10× replication makes every text/embedding a
# 10-way exact duplicate, so LSH buckets grow 10× and bucket self-joins
# 100× — the oracle's pair output is quadratic in the replication factor, a
# property of this synthesis, not of the plans (measured: minhash_dup_pairs
# oracle stalled >20min at sf1 while all non-dup gates pass in seconds).
# The banded-join scale shape of these operators is exercised by
# q_minhash_dedup / q_minhash_dedup_engine at sf0.1 in bench.py.
DUP_DENSITY_QUADRATIC = {
    "minhash_dup_pairs", "minhash_dup_pairs_engine", "minhash_dup_pairs_geo",
    "simhash_dup_pairs",
    "ngram_jaccard_dups", "dedup_clusters", "clean_corpus", "training_manifest",
    "embedding_neardup",
    # not quadratic but emptied: 10x verbatim replication gives every BODY
    # line df >= 10 > max_df, so paragraph dedup drops all content and the
    # manifest filter leaves 0 rows on both engines — a vacuous (if green)
    # parity check; the pipeline's sf1 behavior is covered by its stages'
    # own sf1 gates (paragraph_dedup, pii_scrub, url_normalize)
    "web_clean_manifest",
}


def main() -> None:
    dst = os.environ.get("COVERGRID_SF1_DIR", "/tmp/covergrid-sf1")
    build(dst)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = sys.argv[1:]
    if not names:
        sys.path.insert(0, repo)
        import __spark_entry__ as entry

        skip = QUADRATIC_ORACLES | DUP_DENSITY_QUADRATIC
        names = [q for q in entry.queries() if q not in skip]
        print(f"[sf1] running {len(names)} queries ({len(skip)} excluded: "
              "quadratic oracles / dup-density-quadratic outputs)")
    cmd = [sys.executable, os.path.join(repo, "tools", "check_correctness.py"), dst]
    cmd += names
    raise SystemExit(subprocess.call(cmd, cwd=repo))


if __name__ == "__main__":
    main()
