"""Scaling-curve micro-bench: time representative operators at
sf0.001 / sf0.01 / sf0.1 (100× input growth) and report throughput.

The 100 TB argument needs more than one point: a plan that holds scales
near-linearly in input rows once fixed job overhead (~0.1-0.3 s/job on
local[32]) is subtracted; a plan that degrades super-linearly has a
shuffle or driver choke growing faster than the data. The driver-facing
JSON records per-SF wall time and the large-SF throughput so rounds can
compare.

Usage: python scripts/bench_scaling.py  (writes BENCH_scaling_r04.json)
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

SFS = ["0.001", "0.01", "0.1"]
# one per plan family: scan+agg, window, shingle exchange, iterative,
# broadcast-model scoring, map-only
OPS = [
    ("q1_pricing_summary", "lineitem"),
    ("events_rolling_zscore", "events"),
    ("dedup_substring_spans", "documents"),
    ("sim_kmeans_lloyd", "embeddings"),
    ("sample_importance_dsir", "documents"),
    ("text_chunk_overlap", "documents"),
    # iterative: min-label propagation, one pk-keyed shuffle per round +
    # a scalar convergence check — separates per-iteration scheduling
    # overhead from data cost on the curve
    ("dedup_cluster_components", "documents"),
    # round 6: Gram-free power iteration (row-keyed + dim-keyed reduces)
    ("sim_pca_power_iteration", "embeddings"),
    # round 6: sweep-line window partitioned on (type, day) — no global sort
    ("events_concurrency_sweep", "events"),
]


def main() -> None:
    spark = get_spark(app_name="bench_scaling")
    query_map()
    rows_at = {}
    for sf in SFS:
        for _name, table in OPS:
            key = (sf, table)
            if key not in rows_at:
                rows_at[key] = spark.read.parquet(
                    f"/root/testdata/sf{sf}/{table}.parquet"
                ).count()
    out = {"sfs": SFS, "ops": {}}
    for name, table in OPS:
        spec = QUERIES[name]
        entry = {"driver_table": table, "times_sec": {}, "rows": {}}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            # warm once, median of 3
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            entry["times_sec"][sf] = round(statistics.median(ts), 4)
            entry["rows"][sf] = rows_at[(sf, table)]
        big, small = entry["times_sec"]["0.1"], entry["times_sec"]["0.001"]
        growth_rows = entry["rows"][("0.1")] / max(entry["rows"]["0.001"], 1)
        entry["time_ratio_100x_rows"] = round(big / small, 2)
        entry["rows_growth"] = round(growth_rows, 1)
        entry["throughput_rows_per_sec_sf01"] = int(
            entry["rows"]["0.1"] / big
        )
        out["ops"][name] = entry
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_scaling_r06.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
