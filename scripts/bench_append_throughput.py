"""Micro-bench: event-append and streaming-ingest throughput.

The reference's write path is fsync-per-event (~3 ms/row at its published
baseline: 299 ms per 100-row insert, benchmarks/baselines/
simple_benchmarks_20251112.txt). This engine appends *batches* with one
atomic publish, so the honest comparison is rows/second at batch sizes a
pipeline actually uses. Also measures the streaming materializer draining
the same log (events/sec through foreachBatch state folds).

Writes one JSON line; the committed result lives in
BENCH_append_throughput.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from driftdb_spark.events import EventLog  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402
from driftdb_spark.streaming.ingest import start_state_materializer  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="appendbench-")
    try:
        log = EventLog(spark, os.path.join(root, "tbl"), pk_col="id")
        batch = spark.range(n).select(
            F.col("id"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            (F.col("id") % 1000).alias("qty"),
        )
        t0 = time.perf_counter()
        log.upsert(batch)
        insert_s = time.perf_counter() - t0

        patch = spark.range(n).select(F.col("id"), (F.col("id") % 7).alias("qty"))
        t0 = time.perf_counter()
        log.patch(patch)
        patch_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        q = start_state_materializer(
            spark,
            log._events_dir,
            os.path.join(root, "state"),
            os.path.join(root, "ckpt"),
            available_now=True,
        )
        q.awaitTermination(600)
        stream_s = time.perf_counter() - t0
        state_rows = spark.read.parquet(os.path.join(root, "state")).count()
        assert state_rows == n

        ref_rows_per_s = 1000.0 / 3.0  # reference ~3 ms/row fsync path
        out = {
            "metric": "append_throughput",
            "batch_rows": n,
            "insert_rows_per_s": round(n / insert_s),
            "patch_rows_per_s": round(n / patch_s),
            "stream_ingest_events_per_s": round(2 * n / stream_s),
            "insert_sec": round(insert_s, 2),
            "patch_sec": round(patch_s, 2),
            "stream_sec": round(stream_s, 2),
            "reference_rows_per_s": round(ref_rows_per_s),
            "speedup_vs_reference": round((n / insert_s) / ref_rows_per_s),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
