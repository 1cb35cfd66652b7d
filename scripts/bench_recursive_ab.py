"""Isolated A/B for the recursive-CTE fixpoint loop (r10 verdict ask #6).

The r9 rework (operators/recursive.py) switched the per-iteration
checkpoint from eager (+ a separate isEmpty limit-1 job) to lazy,
materialized by the emptiness probe's count() — one Spark job per
iteration instead of two. Its docstring claimed ~1.9x; the r9 full-sweep
context measured 1.2x. This harness settles the number in isolation:

  eager_r8   — localCheckpoint(eager=True) then isEmpty(): two jobs/iter
  lazy_r9    — localCheckpoint(eager=False) + count(): one job/iter
  lazy_coal  — lazy_r9 + coalesce(1) of each frontier whose MEASURED
               count is tiny (the 26-step walk's frontier is ONE row;
               scheduling 8 tasks per job to move one row is pure
               overhead; the post-count gate keeps exploding frontiers
               at natural partitioning)

Variants alternate within each rep (round-robin) so ambient drift hits
all arms equally. Median of N reps, full collect() per run.

Usage: python scripts/bench_recursive_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from driftdb_spark.catalog import load_tables  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402

SMALL_FRONTIER_ROWS = 10_000


def _walk_pieces(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cnt = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    anchor = spark.range(1).select(
        F.lit(0).cast("int").alias("nk"),
        F.lit(0).cast("bigint").alias("running"),
    )

    def step(frontier):
        return (
            frontier.filter(F.col("nk") < 25)
            .join(F.broadcast(cnt), frontier.nk == cnt.nk2, "left")
            .select(
                (F.col("nk") + 1).cast("int").alias("nk"),
                (F.col("running") + F.coalesce(F.col("n"), F.lit(0)))
                .cast("bigint")
                .alias("running"),
            )
        )

    return anchor, step


def eager_r8(anchor, step):
    acc, frontier = anchor, anchor
    for _ in range(1000):
        nxt = step(frontier).localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        acc = acc.unionByName(nxt)
        frontier = nxt
    return acc


def lazy_r9(anchor, step):
    acc, frontier = anchor, anchor
    for _ in range(1000):
        nxt = step(frontier).localCheckpoint(eager=False)
        if nxt.count() == 0:
            break
        acc = acc.unionByName(nxt)
        frontier = nxt
    return acc


def lazy_coal(anchor, step):
    # the SHIPPED shape (operators/recursive.py): coalesce AFTER counting,
    # keyed on the measured size of the frame itself — never a prediction
    acc, frontier = anchor, anchor
    for _ in range(1000):
        nxt = step(frontier).localCheckpoint(eager=False)
        n = nxt.count()
        if n == 0:
            break
        if n <= SMALL_FRONTIER_ROWS:
            nxt = nxt.coalesce(1)
        acc = acc.unionByName(nxt)
        frontier = nxt
    return acc


VARIANTS = {"eager_r8": eager_r8, "lazy_r9": lazy_r9, "lazy_coal": lazy_coal}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="bench_recursive_ab")
    anchor, step = _walk_pieces(spark, sf_dir)

    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    # one warm pass each (JIT, broadcast warm), then round-robin reps;
    # every variant must agree on the exact result set
    expected = sorted(map(tuple, VARIANTS["eager_r8"](anchor, step).collect()))
    for name, fn in VARIANTS.items():
        assert sorted(map(tuple, fn(anchor, step).collect())) == expected, name
    for _ in range(reps):
        for name, fn in VARIANTS.items():
            t0 = time.perf_counter()
            rows = fn(anchor, step).collect()
            times[name].append(time.perf_counter() - t0)
            assert len(rows) == len(expected), name

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "walk_rows": len(expected),
        "variants": {
            k: {
                "median_sec": round(statistics.median(v), 3),
                "runs": [round(t, 3) for t in v],
            }
            for k, v in times.items()
        },
    }
    med = {k: statistics.median(v) for k, v in times.items()}
    out["lazy_over_eager_speedup"] = round(med["eager_r8"] / med["lazy_r9"], 2)
    out["coal_over_eager_speedup"] = round(med["eager_r8"] / med["lazy_coal"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
