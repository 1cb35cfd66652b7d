"""Per-query cross-checkout A/B for optimization work (r13).

The full-suite drift harness (bench_drift_ab.py) costs ~5 min per arm;
judging a single operator rewrite needs minutes-apart, order-balanced
medians for just the touched queries. Each arm runs in a FRESH child
process whose sys.path points at that checkout, with a child runner
INLINED here so both arms measure with bit-identical methodology:
per timed run, clear the cache and rebuild the query DataFrame (so
queries that persist internally — pareto, the iterative loops — pay
their full cost every run, mirroring bench.py's ITERATIVE handling),
then materialize through the noop sink. Arms alternate A,B,B,A per
round so ambient VM drift cancels.

Usage:
  git worktree add /tmp/r13base <commit>
  python scripts/bench_query_ab.py /tmp/r13base /root/repo \
      --suspects q2_min_cost_supplier,sample_pareto_frontier --rounds 2
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
suspects = sys.argv[2].split(",")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from driftdb_spark.registry import QUERIES, query_map
from driftdb_spark.session import get_spark
query_map()
spark = get_spark(app_name="bench_query_ab_child")
out = {}
for name in suspects:
    fn = QUERIES[name].fn
    for _ in range(2):  # warm: JIT, file listing
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(5):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    out[name] = ts
print("\nRESULT::" + json.dumps(out))
"""


def _child(repo: str, suspects: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, ",".join(suspects)],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT::")][-1]
    return json.loads(line[len("RESULT::") :])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("repo_a")
    ap.add_argument("repo_b")
    ap.add_argument("--suspects", required=True)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    suspects = args.suspects.split(",")

    runs: dict[str, list[dict]] = {"a": [], "b": []}
    for _ in range(args.rounds):
        for arm, repo in (
            ("a", args.repo_a),
            ("b", args.repo_b),
            ("b", args.repo_b),
            ("a", args.repo_a),
        ):
            runs[arm].append(_child(repo, suspects))

    per_query = {}
    for q in suspects:
        a_all = [t for r in runs["a"] for t in r[q]]
        b_all = [t for r in runs["b"] for t in r[q]]
        a, b = statistics.median(a_all), statistics.median(b_all)
        per_query[q] = {
            "a_sec": round(a, 3),
            "b_sec": round(b, 3),
            "b_over_a": round(b / a, 3) if a else None,
            "a_runs": [round(t, 3) for t in a_all],
            "b_runs": [round(t, 3) for t in b_all],
        }
    result = {
        "metric": "per_query_checkout_ab",
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "arms_per_side": 2 * args.rounds,
        "runs_per_arm": 5,
        "method": "fresh build + clearCache per timed run, noop sink",
        "per_query": per_query,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
