"""Mimic the driver's verify: import __spark_entry__, smoke entry(), then run
every queries() entry at sf0.01 against its oracle_sql() via DuckDB.

Usage: python scripts/verify_driver.py [--plain-session] [--json PATH] [sf_dir]

--plain-session builds a bare SparkSession (no tuned confs) exactly like the
driver does, proving the registry doesn't depend on session.get_spark().
--json PATH additionally writes a machine-readable per-query report (the
full-registry companion to the driver's 50-query CORRECTNESS sample).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from tests.oracle import compare  # noqa: E402


def _plain_session():
    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("verify_driver_plain")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    args = [a for a in sys.argv[1:]]
    plain = "--plain-session" in args
    if plain:
        args.remove("--plain-session")
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: verify_driver.py [--plain-session] [--json PATH] [sf_dir]")
            return 2
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if plain:
        spark = _plain_session()
    else:
        from driftdb_spark.session import get_spark

        spark = get_spark()

    t0 = time.time()
    n = len(E.entry(spark).collect())
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s")
    assert n > 0

    queries = E.queries()
    oracles = E.oracle_sql()
    failed = []
    report: dict[str, dict] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                status, kind = "match", "oracle"
            else:
                rows = df.collect()
                status, kind = f"rows-only ({len(rows)} rows)", "rows_only"
        except Exception as exc:  # noqa: BLE001
            status, kind = f"FAIL: {exc}", "fail"
            failed.append(name)
        secs = time.time() - t0
        report[name] = {"status": kind, "detail": status, "secs": round(secs, 2)}
        print(f"  {name:32s} {status:40s} {secs:5.1f}s")
    print(f"{len(queries) - len(failed)}/{len(queries)} ok")
    if json_path:
        summary = {
            "sf_dir": sf_dir,
            "plain_session": plain,
            "total": len(queries),
            "ok": len(queries) - len(failed),
            "oracle_backed": sum(1 for r in report.values() if r["status"] == "oracle"),
            "rows_only": sum(1 for r in report.values() if r["status"] == "rows_only"),
            "failed": failed,
            "queries": report,
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
