"""Result-cache effectiveness bench (reference cache.rs QueryCache).

Round-7 verdict ask #6: the cache has correctness soaks but no measured
hit-rate/latency artifact. This drives a representative query suite
through a ``DriftSession`` with the cache on: every query runs once cold
(miss → executes + materializes) and N times warm (hit → distributed
scan of the materialized parquet), then DML interleaves to measure the
exact-invalidation cost (the version vector changes, the next run is a
miss again, and the rows it serves reflect the write).

Writes BENCH_cache_r08.json:
  {hit_rate, p50_uncached_sec, p50_cached_sec, speedup_p50,
   per_query: {...}, invalidation: {...}}

Usage: python scripts/bench_cache.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.session import get_spark  # noqa: E402
from driftdb_spark.sql_frontend import DriftSession  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: cacheable SELECT suite — plain ANSI shapes over event-log tables (the
#: cache only engages for catalog tables; parquet temp views bypass)
QUERIES = {
    "agg_group": """
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "join_agg": """
        SELECT c.c_mktsegment, COUNT(*) AS n, SUM(o.o_totalprice) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
    "three_way": """
        SELECT n.n_name, COUNT(*) AS orders_n
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    "filter_topn": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'O'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "distinct_count": """
        SELECT COUNT(DISTINCT o_custkey) AS buyers FROM orders""",
    "selective_join": """
        SELECT o.o_orderpriority, COUNT(*) AS n
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity > 45
        GROUP BY o.o_orderpriority""",
}

WARM_RUNS = 3


def _run(sess, sql: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = sess.sql(sql).count()
    return time.perf_counter() - t0, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench_cache")
    sess = DriftSession(spark, tempfile.mkdtemp(prefix="cachebench-"))

    # ingest the relational tables into real event logs (cache scope)
    ddl = {
        "nation": "CREATE TABLE nation (n_nationkey INT PRIMARY KEY, n_name STRING, n_regionkey INT)",
        "customer": "CREATE TABLE customer (c_custkey INT PRIMARY KEY, c_mktsegment STRING, c_nationkey INT)",
        "orders": "CREATE TABLE orders (o_orderkey INT PRIMARY KEY, o_custkey INT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING)",
        "lineitem": "CREATE TABLE lineitem (rid BIGINT PRIMARY KEY, l_orderkey INT, l_quantity DOUBLE, l_returnflag STRING, l_linestatus STRING)",
    }
    proj = {
        "nation": "n_nationkey, n_name, n_regionkey",
        "customer": "c_custkey, c_mktsegment, c_nationkey",
        "orders": "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority",
        "lineitem": (
            "monotonically_increasing_id() AS rid, l_orderkey, "
            "CAST(l_quantity AS DOUBLE) AS l_quantity, l_returnflag, l_linestatus"
        ),
    }
    t_ingest = time.perf_counter()
    for t, stmt in ddl.items():
        sess.sql(stmt)
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet").selectExpr(
            *[c.strip() for c in proj[t].split(",")]
        )
        log, _cols = sess._tables[t]
        log.insert(df)
    t_ingest = time.perf_counter() - t_ingest

    cache = sess.enable_result_cache()
    per_query: dict[str, dict] = {}
    uncached, cached = [], []
    for name, sql in QUERIES.items():
        cold, n_cold = _run(sess, sql)
        warms = []
        for _ in range(WARM_RUNS):
            w, n_w = _run(sess, sql)
            assert n_w == n_cold, f"{name}: cached rows diverged"
            warms.append(w)
        warm = statistics.median(warms)
        per_query[name] = {
            "cold_sec": round(cold, 4),
            "warm_sec": round(warm, 4),
            "speedup": round(cold / warm, 1),
            "rows": n_cold,
        }
        uncached.append(cold)
        cached.append(warm)
        print(f"{name}: cold={cold:.3f}s warm={warm:.3f}s", flush=True)

    stats_before = cache.statistics()

    # invalidation under interleaved DML: a write changes the version
    # vector -> the very next run re-executes and sees the new rows
    inv_q = QUERIES["agg_group"]
    r_before = sess.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem"
    ).collect()[0]["n"]
    t0 = time.perf_counter()
    sess.sql(
        "INSERT INTO lineitem VALUES (99999999999, 1, 1.0, 'Z', 'Z')"
    )
    dml_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    post = sess.sql(inv_q).count()
    reexec_sec = time.perf_counter() - t0
    n_after = sess.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem"
    ).collect()[0]["n"]
    assert n_after == r_before + 1, "write invisible after invalidation"
    assert post >= 1
    # warm again after the re-execution
    t0 = time.perf_counter()
    sess.sql(inv_q).count()
    rewarm_sec = time.perf_counter() - t0

    out = {
        "metric": "result_cache",
        "sf_dir": sf_dir,
        "ingest_sec": round(t_ingest, 2),
        "queries": len(QUERIES),
        "warm_runs_per_query": WARM_RUNS,
        "hit_rate": stats_before["hit_rate"],
        "hits": stats_before["hits"],
        "misses": stats_before["misses"],
        "p50_uncached_sec": round(statistics.median(uncached), 4),
        "p50_cached_sec": round(statistics.median(cached), 4),
        "speedup_p50": round(
            statistics.median(uncached) / statistics.median(cached), 1
        ),
        "per_query": per_query,
        "invalidation": {
            "dml_sec": round(dml_sec, 4),
            "reexec_after_write_sec": round(reexec_sec, 4),
            "rewarm_sec": round(rewarm_sec, 4),
            "stale_serve": False,
        },
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_cache_r08.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
