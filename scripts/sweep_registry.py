"""Spark-side cost sweep of the FULL query registry (r13 ranking artifact).

Times every registered query in one warmed session: per query, clear the
cache, rebuild the DataFrame, materialize through the noop sink; report the
MIN of 2 such runs (min, not median — the sweep ranks operators for
optimization attention, so the low-water mark with cold cache is the
comparable number; the A/B harness, not the sweep, adjudicates wins).
Queries whose fn() persists internally pay their full build every run
because the cache is cleared first — same rationale as bench.py ITERATIVE.

Usage: python scripts/sweep_registry.py [--out PATH] [sf_dir]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.registry import query_map  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402

N_RUNS = 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="sweep_registry")
    qmap = query_map()
    out: dict[str, float] = {}
    for name in sorted(qmap):
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        ts = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qmap[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 3)
        print(f"{name:40s} {out[name]:7.3f}")
    spark.sparkContext.setJobDescription(None)
    total = round(sum(out.values()), 1)
    print(f"TOTAL {total}s over {len(out)} queries")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
