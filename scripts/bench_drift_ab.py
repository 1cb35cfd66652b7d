"""Cross-commit bench A/B: is a round-over-round drift code or machine?

BENCH_r11 measured a uniform 1.31x slowdown vs BENCH_r10 across 27
headline queries — including read paths whose code was bit-identical
that round. Per-round bench numbers are taken weeks apart on a shared
VM, so they conflate code drift with machine drift. This harness removes
the time axis: it runs the SAME bench.py from TWO checkouts (e.g. a git
worktree pinned at the old round's HEAD, and the live repo) ALTERNATING
A,B,A,B,… within minutes of each other, so ambient load hits both arms
equally. If old-code-today matches new-code-today (ratio ~1.0) while
both differ from old-code-back-then, the drift is the machine; a real
regression shows up as a reproducible per-query gap between the arms.

Usage:
  git worktree add /tmp/r10wt <old-round-commit>
  python scripts/bench_drift_ab.py /tmp/r10wt /root/repo --rounds 3 \
      --out BENCH_drift_ab_r12.json

Each arm's bench.py prints its usual one-line JSON; this script collects
per-query medians-of-medians across rounds and the per-query B/A ratio.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time


def run_bench(repo_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo_dir,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("repo_a", help="old-code checkout (e.g. worktree at the prior round's HEAD)")
    ap.add_argument("repo_b", help="new-code checkout")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--preloaded", default=None,
                    help="JSON file with already-collected runs: "
                         '{"a": [bench.json…], "b": [bench.json…]}')
    args = ap.parse_args()

    if args.rounds < 1 and not args.preloaded:
        print("--rounds must be >= 1", file=sys.stderr)
        return 2
    if args.preloaded:
        with open(args.preloaded) as fh:
            pre = json.load(fh)
        runs_a, runs_b = pre["a"], pre["b"]
        if not runs_a or not runs_b:
            print("--preloaded must contain at least one run per arm",
                  file=sys.stderr)
            return 2
    else:
        runs_a, runs_b = [], []
        for i in range(args.rounds):
            runs_a.append(run_bench(args.repo_a))
            time.sleep(3)
            runs_b.append(run_bench(args.repo_b))
            time.sleep(3)

    queries = sorted(
        set(runs_a[0]["queries"]) & set(runs_b[0]["queries"])
    )
    per_query = {}
    for q in queries:
        a = statistics.median(r["queries"][q] for r in runs_a)
        b = statistics.median(r["queries"][q] for r in runs_b)
        per_query[q] = {
            "a_sec": round(a, 4),
            "b_sec": round(b, 4),
            "b_over_a": round(b / a, 3) if a else None,
        }
    # an all-zero arm yields no ratios: report nulls, don't crash post-run.
    # `is not None`, not truthiness (advisor-found): a legitimate 0.0
    # ratio (b==0, a>0 on a degenerate run) must count toward the
    # median/min, not be discarded like a missing value.
    ratios = [
        v["b_over_a"] for v in per_query.values() if v["b_over_a"] is not None
    ]
    result = {
        "metric": "cross_commit_bench_ab",
        "rounds": len(runs_a),
        "common_queries": len(queries),
        "total_a_sec": round(statistics.median(r["value"] for r in runs_a), 3),
        "total_b_sec": round(statistics.median(r["value"] for r in runs_b), 3),
        "median_b_over_a": round(statistics.median(ratios), 3) if ratios else None,
        "max_b_over_a": round(max(ratios), 3) if ratios else None,
        "min_b_over_a": round(min(ratios), 3) if ratios else None,
        "per_query": per_query,
        "raw_totals_a": [r["value"] for r in runs_a],
        "raw_totals_b": [r["value"] for r in runs_b],
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
