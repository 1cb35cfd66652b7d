"""Micro-bench: snapshots bound the replay tail — the reference's core
performance claim for reconstruction (snapshot.rs:19-43: start from the
newest snapshot at-or-before the target and replay only the tail), measured
here at a scale where it matters.

Generates a multi-batch event log (default 10M events: inserts + a patch
wave over a key subset), snapshots mid-log, then times current-state
reconstruction WITH the snapshot (snapshot rows + tail replay) vs WITHOUT
(full-log replay), on identical plans otherwise. Also verifies:

- the tail filter is PUSHED to the parquet scan (`GreaterThan(sequence, N)`
  in PushedFilters), so sequence-ordered batch files prune at the row-group
  level — at 100 TB this is the difference between reading the tail and
  reading the history;
- both paths reconstruct identical state (row count + agg checksum).

Writes one JSON line; run `python scripts/bench_snapshot_tail.py [n_events]`.
The committed result lives in BENCH_snapshot_tail.json (see SCALE.md).
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from driftdb_spark.events import EventLog  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    # Deep per-key histories are what snapshots collapse (the reference's
    # whole point): ~2% of events are inserts, the rest arrive as four
    # patch waves (~12 patches per key per wave). Snapshot lands after
    # wave 3 — the tail is one wave, ~25% of the log.
    n_keys = max(n_events // 50, 1000)
    n_waves = 4
    wave_rows = (n_events - n_keys) // n_waves
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="snaptail-")
    try:
        log = EventLog(spark, os.path.join(root, "tbl"), pk_col="id")
        inserts = spark.range(n_keys).select(
            F.col("id"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            (F.col("id") % 1000).alias("qty"),
        )
        log.upsert(inserts)
        snap_seq = None
        for w in range(1, n_waves + 1):
            patch = spark.range(wave_rows).select(
                (F.col("id") % n_keys).alias("id"),
                ((F.col("id") * w) % 1000).alias("qty"),
            )
            if w == n_waves:
                snap_seq = log.snapshot()
            log.patch(patch)

        def fold_time():
            t0 = time.perf_counter()
            st = log.state_at()
            n = st.count()
            chk = st.agg(
                F.sum(F.crc32(F.concat_ws("|", "pk", F.col("row").getItem("qty"))))
            ).first()[0]
            return time.perf_counter() - t0, n, int(chk)

        # warm + measure WITH snapshot
        fold_time()
        with_t, with_n, with_chk = fold_time()

        # plan assertion: the tail scan carries the pushed sequence bound
        buf = io.StringIO()
        with redirect_stdout(buf):
            log.state_at().explain("formatted")
        plan = buf.getvalue()
        pushed = f"GreaterThan(sequence,{snap_seq})" in plan.replace(" ", "")
        tail_rows = (
            log.events().filter(F.col("sequence") > snap_seq).count()
        )
        total_rows = log.events().count()

        # WITHOUT snapshot: move snapshots aside, full-log replay
        snap_dir = log._snap_dir
        shutil.move(snap_dir, snap_dir + ".off")
        fold_time()
        wo_t, wo_n, wo_chk = fold_time()
        shutil.move(snap_dir + ".off", snap_dir)

        assert (with_n, with_chk) == (wo_n, wo_chk), (
            f"state diverged: with=({with_n},{with_chk}) without=({wo_n},{wo_chk})"
        )
        out = {
            "metric": "snapshot_tail_bounding",
            "n_events": total_rows,
            "snapshot_seq": snap_seq,
            "tail_events_replayed": tail_rows,
            "with_snapshot_sec": round(with_t, 3),
            "full_replay_sec": round(wo_t, 3),
            "speedup": round(wo_t / with_t, 2),
            "tail_filter_pushed_to_scan": pushed,
            "state_rows": with_n,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
