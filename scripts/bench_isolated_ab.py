"""Isolated single-query A/B for suite-drift suspects.

BENCH_r03 -> r04 showed graph_pagerank_nations +22% (1.62 -> 1.98 s) and
agg_group_having +25% (0.27 -> 0.34 s) with no code change to either
operator; the suite grew by 4 expensive queries in the same round. This
harness times each suspect in a FRESH process-isolated-equivalent way:
one SparkSession, nothing else built or cached, median of 5 — if the
isolated time matches the r03 in-suite number rather than the r04 one,
the drift is suite cache pressure, not an operator regression.

Usage: python scripts/bench_isolated_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.registry import QUERIES, query_map  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402

SUSPECTS = ["sim_cosine_topk_batch", "text_token_df", "join_left_agg"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="bench_isolated_ab")
    query_map()
    out = {"sf_dir": sf_dir, "queries": {}}
    for name in SUSPECTS:
        spec = QUERIES[name]
        # warm twice (JIT + file listing), then median of 5
        for _ in range(2):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out["queries"][name] = {
            "median_sec": round(statistics.median(ts), 3),
            "runs": [round(t, 3) for t in ts],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
