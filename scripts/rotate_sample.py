"""Seeded per-round rotation of the driver's 50-query correctness sample.

The external driver's CORRECTNESS_r{N}.json has sampled the SAME 50
registry names three rounds running (r10-r12), so 153 queries' per-round
oracle evidence rests on the builder's full sweeps alone. This harness
closes that independently of the driver: it picks 50 registry names
seeded by the round number — ``md5(f"r{N}:{name}")`` ordering, so every
round samples a DIFFERENT deterministic subset and over rounds the
rotation covers the registry — runs each against its DuckDB oracle
exactly like the driver does (tests/oracle.py is the driver's documented
compare: row count + column set + order-insensitive normalized rows),
and writes ROTATE_SAMPLE_r{N}.json.

Usage:
  python scripts/rotate_sample.py --round 13 [--n 50] [--out PATH] [sf_dir]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from tests.oracle import compare  # noqa: E402


def rotated_names(names: list[str], round_no: int, n: int) -> list[str]:
    return sorted(
        names,
        key=lambda q: hashlib.md5(f"r{round_no}:{q}".encode()).hexdigest(),
    )[:n]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, dest="round_no")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    out_path = args.out or f"ROTATE_SAMPLE_r{args.round_no:02d}.json"

    from driftdb_spark.session import get_spark

    spark = get_spark(app_name=f"rotate_sample_r{args.round_no}")
    queries = E.queries()
    oracles = E.oracle_sql()
    sample = rotated_names(sorted(queries), args.round_no, args.n)

    report: dict[str, dict] = {}
    failed: list[str] = []
    for name in sample:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf_dir)
            if name in oracles:
                compare(df, oracles[name], args.sf_dir)
                status, kind = "match", "oracle"
            else:
                rows = df.collect()
                status, kind = f"rows-only ({len(rows)} rows)", "rows_only"
        except Exception as exc:  # noqa: BLE001
            status, kind = f"FAIL: {exc}", "fail"
            failed.append(name)
        secs = round(time.time() - t0, 2)
        report[name] = {"status": kind, "detail": status, "secs": secs}
        print(f"  {name:36s} {status:40s} {secs:6.1f}s")

    summary = {
        "round": args.round_no,
        "seed": f"md5('r{args.round_no}:<name>') ordering",
        "sf_dir": args.sf_dir,
        "sampled": len(sample),
        "registry_total": len(queries),
        "ok": len(sample) - len(failed),
        "oracle_backed": sum(1 for r in report.values() if r["status"] == "oracle"),
        "rows_only": sum(1 for r in report.values() if r["status"] == "rows_only"),
        "failed": failed,
        "queries": report,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(f"{summary['ok']}/{summary['sampled']} ok -> {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
