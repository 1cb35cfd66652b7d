"""Memory-pressure proof (r8 ask #6 / r10 verdict ask #5): the heaviest
headline queries at sf1 under a 4 GiB driver cap.

In local mode the driver heap IS the executor heap, so capping
spark.driver.memory at 4g while running 32 threads over the sf1 tables
(~10x the bench SF) is a genuine pressure test: partial aggregates,
sort-merge buffers, and window sorts must spill instead of OOM-ing.

Run in a FRESH process with the cap exported (the JVM heap is fixed at
launch):

    SPARK_GRAFT_DRIVER_MEM=4g python scripts/bench_memory_pressure.py

For each query: wall time (noop sink), then a second execution through
explain_analyze() to harvest per-operator runtime metrics — total spill
bytes and which operators spilled. Completing all queries with zero OOMs
is the pass criterion; the spill inventory documents HOW they survived.

Writes BENCH_memory_pressure_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.plans.stats import explain_analyze  # noqa: E402
from driftdb_spark.registry import QUERIES, query_map  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402

#: the 5 heaviest headline queries by r9 suite medians (all iterative or
#: shuffle-heavy), per the round-10 ask
HEAVY = [
    "text_bpe_learn_merges",
    "graph_pagerank_nations",
    "sample_pareto_frontier",
    "sim_kmeans_lloyd",
    "q21_waiting_supplier",
]

_SPILL_KEYS = ("spillSize", "spill size", "memorySpilled", "diskSpilled")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_scaledata",
        "sf1",
    )
    cap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "(unset)")
    spark = get_spark(app_name="bench_memory_pressure")
    query_map()
    out = {
        "sf_dir": sf_dir,
        "driver_mem": cap,
        "jvm_max_heap_bytes": spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory(),
        "queries": {},
        "ooms": 0,
    }
    for name in HEAVY:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        # second execution, instrumented: per-operator runtime metrics
        spilled = {}
        total_spill = 0
        try:
            for node in explain_analyze(spec.fn(spark, sf_dir)):
                s = sum(
                    v
                    for k, v in node["metrics"].items()
                    if any(sk in k for sk in _SPILL_KEYS) and v > 0
                )
                if s > 0:
                    spilled[node["node"]] = spilled.get(node["node"], 0) + s
                    total_spill += s
        except Exception as exc:  # metrics harvest must not fail the proof
            spilled = {"_metrics_error": repr(exc)}
        out["queries"][name] = {
            "wall_sec": round(wall, 3),
            "spill_bytes_total": total_spill,
            "spilled_operators": spilled,
        }
        print(f"{name}: {wall:.2f}s spill={total_spill / 1e6:.1f}MB {spilled}")
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_memory_pressure_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
