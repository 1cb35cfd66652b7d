"""Isolated single-query A/B for suite-drift suspects and global conf knobs.

BENCH_r03 -> r04 showed graph_pagerank_nations +22% (1.62 -> 1.98 s) and
agg_group_having +25% (0.27 -> 0.34 s) with no code change to either
operator; the suite grew by 4 expensive queries in the same round. This
harness times each suspect in a FRESH process-isolated-equivalent way:
one SparkSession, nothing else built or cached, median of 5 — if the
isolated time matches the r03 in-suite number rather than the r04 one,
the drift is suite cache pressure, not an operator regression.

Round 10 adds a SCHEDULER axis: ``--scheduler-ab`` runs the suspects under
FIFO and FAIR in fresh child processes (scheduler mode is static per
SparkContext, so the two arms cannot share a JVM), in BOTH orders
(FIFO,FAIR then FAIR,FIFO) so ambient-load drift cannot masquerade as a
scheduler effect. This exists because round 9 shipped FAIR as the global
default under a "batch unaffected" comment and the suite paid a measured
8-18% on shuffle-heavy queries — any future global conf change should ship
with an artifact from this harness.

Usage:
  python scripts/bench_isolated_ab.py [sf_dir]                # drift mode
  python scripts/bench_isolated_ab.py [sf_dir] --scheduler-ab # FIFO vs FAIR
  python scripts/bench_isolated_ab.py [sf_dir] --scheduler FAIR --suspects a,b
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSPECTS = ["sim_cosine_topk_batch", "text_token_df", "join_left_agg"]

#: the round-9 FAIR regression set (the four biggest in-suite drifts plus
#: the headline scan query) — shuffle-heavy, so scheduler overhead shows
SCHEDULER_SUSPECTS = [
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_substring_spans",
    "pipeline_training_corpus",
    "text_chunk_overlap",
]


def _run_suspects(sf_dir: str, suspects: list[str], scheduler: str) -> dict:
    from driftdb_spark.registry import QUERIES, query_map
    from driftdb_spark.session import get_spark

    spark = get_spark(app_name="bench_isolated_ab", scheduler=scheduler)
    query_map()
    queries: dict = {}
    for name in suspects:
        spec = QUERIES[name]
        # warm twice (JIT + file listing), then median of 5
        for _ in range(2):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        queries[name] = {
            "median_sec": round(statistics.median(ts), 3),
            "runs": [round(t, 3) for t in ts],
        }
    return queries


def _child(sf_dir: str, scheduler: str, suspects: list[str]) -> dict:
    """One measurement arm in a FRESH process (its own JVM + scheduler)."""
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        sf_dir,
        "--scheduler",
        scheduler,
        "--suspects",
        ",".join(suspects),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    # stdout may carry Spark banner noise before the (multi-line) JSON
    return json.loads(out.stdout[out.stdout.index("{") :])


def _scheduler_ab(sf_dir: str) -> None:
    arms: dict[str, list[dict]] = {"FIFO": [], "FAIR": []}
    # both orders: FIFO,FAIR then FAIR,FIFO — order effects cancel
    for scheduler in ("FIFO", "FAIR", "FAIR", "FIFO"):
        arms[scheduler].append(
            _child(sf_dir, scheduler, SCHEDULER_SUSPECTS)["queries"]
        )
    merged: dict = {}
    for name in SCHEDULER_SUSPECTS:
        fifo = statistics.median(
            t for arm in arms["FIFO"] for t in arm[name]["runs"]
        )
        fair = statistics.median(
            t for arm in arms["FAIR"] for t in arm[name]["runs"]
        )
        merged[name] = {
            "fifo_median_sec": round(fifo, 3),
            "fair_median_sec": round(fair, 3),
            "fair_over_fifo": round(fair / fifo, 3) if fifo else None,
        }
    print(
        json.dumps(
            {
                "mode": "scheduler_ab",
                "sf_dir": sf_dir,
                "arms_per_scheduler": 2,
                "runs_per_arm": 5,
                "queries": merged,
            },
            indent=1,
        )
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scheduler = "FIFO"
    suspects = SUSPECTS
    ab = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--scheduler-ab":
            ab = True
        elif a == "--scheduler":
            i += 1
            scheduler = args[i]
        elif a == "--suspects":
            i += 1
            suspects = args[i].split(",")
        else:
            sf_dir = a
        i += 1

    if ab:
        _scheduler_ab(sf_dir)
        return

    out = {
        "sf_dir": sf_dir,
        "scheduler": scheduler,
        "queries": _run_suspects(sf_dir, suspects, scheduler),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
