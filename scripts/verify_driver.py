"""Mimic the driver's verify: import __spark_entry__, smoke entry(), then run
every queries() entry at sf0.01 against its oracle_sql() via DuckDB.

Usage: python scripts/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from driftdb_spark.session import get_spark  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
