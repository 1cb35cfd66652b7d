"""Isolated A/B for the log-rewrite I/O change (r10 verdict ask #4).

Pre-r11, EventLog._swap_events_dir materialized the rebuilt log TWICE:
write to `events.rewrite`, re-read through a fresh frame, write again to
`events.new`. r11 writes ONCE (staging inside `events.new`, renamed to a
uniform `batch-<minseq>` entry after a min-sequence column scan) — the
rebuild plan runs against the still-live dir, so the defensive second
pass bought nothing.

Apples-to-apples arms over the SAME rebuilt frame (a purge anti-join
dropping 1% of pks from an N-event log), alternating order per rep:

  write_once  — the shipped I/O: one parquet materialization + the
                min("sequence") scan that names the batch entry
  write_twice — the legacy I/O: materialize, re-read fresh, materialize
                again

Plus one end-to-end shipped purge() for context (includes the before/
after counts and the meta bump). Median of N reps. One JSON line.

Usage: python scripts/bench_purge_rewrite.py [n_events] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from driftdb_spark.events import EVENT_SCHEMA, EventLog

    root = tempfile.mkdtemp(prefix="purgebench-")
    log = EventLog(spark, os.path.join(root, "tbl"), pk_col="id")

    # Seed N Insert events directly (executor-side generation; going
    # through insert() would add a PK anti-join irrelevant to the I/O
    # under test). 1% of pks are the purge target.
    ev = spark.range(1, n_events + 1).select(
        F.col("id").alias("sequence"),
        F.current_timestamp().alias("ts"),
        F.lit("INSERT").alias("event_type"),
        F.col("id").cast("string").alias("pk"),
        F.map_from_arrays(
            F.array(F.lit("id"), F.lit("v")),
            F.array(F.col("id").cast("string"), (F.col("id") % 97).cast("string")),
        ).alias("payload"),
    )
    os.makedirs(log._events_dir, exist_ok=True)
    ev.write.mode("overwrite").parquet(
        os.path.join(log._events_dir, f"batch-{1:020d}")
    )
    log._bump_meta(seq_floor=n_events)
    assert log.events().count() == n_events

    purge_keys = spark.range(1, n_events + 1).filter("id % 100 = 0").select("id")
    kept_frame = log.events().join(
        F.broadcast(purge_keys.select(F.col("id").cast("string").alias("pk"))),
        "pk",
        "anti",
    )

    once: list[float] = []
    twice: list[float] = []
    for rep in range(reps):
        arms = ("once", "twice") if rep % 2 == 0 else ("twice", "once")
        for arm in arms:
            tmp = os.path.join(root, "ab.tmp")
            new = os.path.join(root, "ab.new")
            t0 = time.perf_counter()
            if arm == "once":
                staging = os.path.join(new, "_staging-rewrite")
                kept_frame.write.mode("overwrite").parquet(staging)
                row = (
                    spark.read.schema(EVENT_SCHEMA)
                    .parquet(staging)
                    .agg(F.min("sequence").alias("lo"))
                    .first()
                )
                os.rename(
                    staging, os.path.join(new, f"batch-{int(row['lo']):020d}")
                )
                once.append(time.perf_counter() - t0)
            else:
                kept_frame.write.mode("overwrite").parquet(tmp)
                spark.read.schema(EVENT_SCHEMA).parquet(tmp).write.mode(
                    "overwrite"
                ).parquet(new)
                twice.append(time.perf_counter() - t0)
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(new, ignore_errors=True)

    # context: the shipped purge() end-to-end (anti-join + write-once +
    # swap + meta bump + before/after counts + the snapshot sweep, which
    # since r11 also materializes ONCE into hidden scratch outside the
    # seq= namespace instead of the legacy tmp -> re-read -> .new double)
    log.snapshot()
    t0 = time.perf_counter()
    removed = log.purge(purge_keys)
    purge_sec = time.perf_counter() - t0
    snapshots_rewritten = len(log._snapshot_seqs())

    w_once = statistics.median(once)
    w_twice = statistics.median(twice)
    print(
        json.dumps(
            {
                "metric": "purge_rewrite_ab",
                "events": n_events,
                "purged_pct": 1.0,
                "reps": reps,
                "write_once_sec": round(w_once, 3),
                "write_twice_sec": round(w_twice, 3),
                "speedup": round(w_twice / w_once, 3) if w_once else None,
                "once_runs": [round(x, 3) for x in once],
                "twice_runs": [round(x, 3) for x in twice],
                "purge_end_to_end_sec": round(purge_sec, 3),
                "purge_removed": removed,
                "snapshots_rewritten": snapshots_rewritten,
                "unit": "sec",
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
