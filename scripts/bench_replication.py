"""Micro-bench: log-shipping replication throughput + failover latency.

The reference streams WAL entries row-by-row over TCP (replication.rs
ReplicationMessage::WalEntry); this engine ships whole immutable published
log entries, so ship/apply cost is per-ENTRY metadata + byte copy, not
per-row work — rows/sec should track raw copy bandwidth, and apply should
be rename-speed. Also times promote() (the fencing-epoch claim), which is
the whole failover path minus the health-check wait.

Writes one JSON line; the committed result lives in BENCH_replication.json.
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

from driftdb_spark.replication import Replica, ReplicationPrimary  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402
from driftdb_spark.sql_frontend import DriftSession  # noqa: E402


def main() -> None:
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="replbench-")
    try:
        sess = DriftSession(spark, os.path.join(root, "primary"))
        sess.sql("CREATE TABLE t (id BIGINT PRIMARY KEY, name STRING, qty BIGINT)")
        log, _cols = sess._tables["t"]
        for b in range(n_batches):
            batch = spark.range(b * rows_per_batch, (b + 1) * rows_per_batch).select(
                F.col("id"),
                F.concat(F.lit("name-"), F.col("id")).alias("name"),
                (F.col("id") % 1000).alias("qty"),
            )
            log.upsert(batch)
        total_rows = rows_per_batch * n_batches

        stream = os.path.join(root, "stream")
        primary = ReplicationPrimary(sess, stream)
        t0 = time.perf_counter()
        shipped = primary.ship()
        ship_s = time.perf_counter() - t0

        replica = Replica(spark, os.path.join(root, "replica"), stream)
        t0 = time.perf_counter()
        applied = replica.apply_pending()
        apply_s = time.perf_counter() - t0

        # replica serves the full state
        t0 = time.perf_counter()
        got = replica.session.sql("SELECT COUNT(*) AS n FROM t").collect()[0]["n"]
        read_s = time.perf_counter() - t0
        assert got == total_rows, (got, total_rows)

        # steady state: one incremental batch end-to-end
        log.upsert(
            spark.range(total_rows, total_rows + rows_per_batch).select(
                F.col("id"),
                F.concat(F.lit("name-"), F.col("id")).alias("name"),
                (F.col("id") % 1000).alias("qty"),
            )
        )
        t0 = time.perf_counter()
        primary.ship()
        replica.apply_pending()
        incr_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        replica.promote()
        promote_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "replication_ship_rows_per_sec",
                    "value": round(total_rows / ship_s),
                    "unit": "rows/sec",
                    "rows": total_rows,
                    "batches": n_batches,
                    "entries_shipped": shipped["t"],
                    "ship_sec": round(ship_s, 3),
                    "apply_sec": round(apply_s, 3),
                    "entries_applied": applied["applied"],
                    "replica_count_star_sec": round(read_s, 3),
                    "incremental_batch_end_to_end_sec": round(incr_s, 3),
                    "promote_sec": round(promote_s, 4),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
