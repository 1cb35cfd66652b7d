"""Mimic the driver's verify: import __spark_entry__, smoke entry(), then run
every queries() entry at sf0.01 against its oracle_sql() via DuckDB.

Usage: python scripts/verify_driver.py [--plain-session] [sf_dir]

--plain-session builds a bare SparkSession (no tuned confs) exactly like the
driver does, proving the registry doesn't depend on session.get_spark().
"""

from __future__ import annotations

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
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                status = "match"
            else:
                rows = df.collect()
                status = f"rows-only ({len(rows)} rows)"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failed.append(name)
        print(f"  {name:32s} {status:40s} {time.time() - t0:5.1f}s")
    print(f"{len(queries) - len(failed)}/{len(queries)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
