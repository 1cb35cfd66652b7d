"""Multi-driver read scale-out over shared immutable storage (r10).

SCALE.md's wire-concurrency floor analysis says: concurrent READ dispatch
inside one server process serializes on the CPython GIL + the Py4J
gateway, so the horizontal answer for many-analyst read concurrency is
MULTIPLE DRIVER PROCESSES over the same immutable storage (Spark Connect
being the managed version of the same move; its client deps aren't in
this container). This bench proves the claim end-to-end with what ships
in the repo today:

  arm one_driver  — 1 server process (local[32]), 8 wire clients
  arm two_drivers — 2 server processes (local[16] each) over the SAME
                    storage dir, 4 clients each

Same total statement count, dispatch-heavy statements (cheap scans, so
the Python dispatch path — parse, temporal peel, state registration,
RLS/RBAC — dominates over executor time; that is the serialized part).
Reads are safe to serve from two processes because table state is
immutable parquet snapshots + an append-only event log; nothing in the
read path takes cross-process coordination.

Orchestrator (this script, default mode) stays pure-Python — each JVM
lives in a child process:
  --seed DIR       build + seed the storage dir, exit
  --serve DIR CPUS start a wire server on an ephemeral port, print READY

Writes BENCH_multi_driver_r10.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIENTS_TOTAL = 8
REPS = 12

#: dispatch-heavy: sub-100ms execution, so per-statement wall is mostly
#: the Python-side dispatch the GIL serializes
STMTS = [
    "SELECT COUNT(*) AS n FROM ev_customer WHERE c_custkey < 500",
    "SELECT c_mktsegment, COUNT(*) AS n FROM ev_customer "
    "GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "SELECT MAX(o_totalprice) AS m FROM ev_orders WHERE o_orderkey < 2000",
    "SELECT o_orderstatus, COUNT(*) AS n FROM ev_orders "
    "GROUP BY o_orderstatus ORDER BY o_orderstatus",
]


def _seed(storage_dir: str, sf_dir: str) -> None:
    from driftdb_spark.session import get_spark
    from driftdb_spark.sql_frontend import DriftSession

    spark = get_spark(app_name="multi_driver_seed")
    sess = DriftSession(spark, storage_dir)
    for name, cols in (
        (
            "orders",
            "o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT, "
            "o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING",
        ),
        (
            "customer",
            "c_custkey BIGINT PRIMARY KEY, c_nationkey BIGINT, "
            "c_mktsegment STRING, c_acctbal DOUBLE",
        ),
    ):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(
            f"src_{name}"
        )
        sess.sql(f"CREATE TABLE ev_{name} ({cols})")
        proj = ", ".join(c.split()[0] for c in cols.split(", "))
        sess.sql(f"INSERT INTO ev_{name} SELECT {proj} FROM src_{name}")
    print("SEEDED", flush=True)


def _serve(storage_dir: str, cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from driftdb_spark.server import PgWireServer
    from driftdb_spark.session import get_spark
    from driftdb_spark.sql_frontend import DriftSession

    spark = get_spark(app_name=f"multi_driver_serve_{os.getpid()}", scheduler="FAIR")
    sess = DriftSession(spark, storage_dir)
    srv = PgWireServer(sess, warm_workers=True).start()
    host, port = srv.address
    print(f"READY {host} {port}", flush=True)
    # serve until the orchestrator closes our stdin
    sys.stdin.read()
    srv.stop()


def _spawn_server(storage_dir: str, cpus: int):
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--serve", storage_dir, str(cpus)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        stdin=subprocess.PIPE,
        text=True,
    )
    for line in proc.stdout:
        if line.startswith("READY"):
            _, host, port = line.split()
            return proc, host, int(port)
    raise RuntimeError("server child died before READY")


def _drive(endpoints: list[tuple[str, int]]) -> dict:
    """8 clients split evenly across endpoints, barrier start, each runs
    REPS of every statement. Returns wall + per-statement p50."""
    from scripts.bench_wire_concurrent import Conn

    conns = [
        Conn(*endpoints[i % len(endpoints)]) for i in range(CLIENTS_TOTAL)
    ]
    for c in conns:  # warm: sessions, plans, parquet footers
        for s in STMTS:
            c.query(s)
    lat: list[list[float]] = [[] for _ in conns]
    errs: list[str] = []
    barrier = threading.Barrier(CLIENTS_TOTAL + 1)

    def client(i):
        try:
            barrier.wait()
            for _ in range(REPS):
                for s in STMTS:
                    t0 = time.perf_counter()
                    conns[i].query(s)
                    lat[i].append(time.perf_counter() - t0)
        except Exception as exc:
            errs.append(repr(exc))

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(CLIENTS_TOTAL)
    ]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    for c in conns:
        c.close()
    if errs:
        raise RuntimeError(f"clients failed: {errs}")
    flat = sorted(t for ls in lat for t in ls)
    return {
        "wall_sec": round(wall, 3),
        "statements": CLIENTS_TOTAL * REPS * len(STMTS),
        "stmts_per_sec": round(CLIENTS_TOTAL * REPS * len(STMTS) / wall, 1),
        "stmt_p50_sec": round(flat[len(flat) // 2], 4),
        "stmt_p95_sec": round(flat[int(len(flat) * 0.95)], 4),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--seed":
        _seed(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        _serve(sys.argv[2], int(sys.argv[3]))
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    import tempfile

    storage = tempfile.mkdtemp(prefix="multidrv-")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--seed", storage, sf_dir],
        check=True,
        capture_output=True,
    )

    out = {"sf_dir": sf_dir, "clients": CLIENTS_TOTAL, "reps": REPS, "arms": {}}
    for arm, layout in (("one_driver", [32]), ("two_drivers", [16, 16])):
        procs, endpoints = [], []
        try:
            for cpus in layout:
                proc, host, port = _spawn_server(storage, cpus)
                procs.append(proc)
                endpoints.append((host, port))
            out["arms"][arm] = _drive(endpoints)
            out["arms"][arm]["servers"] = [
                {"cpus": c} for c in layout
            ]
            print(arm, out["arms"][arm], flush=True)
        finally:
            for p in procs:
                try:
                    p.stdin.close()
                    p.wait(timeout=30)
                except Exception:
                    p.kill()
    one, two = out["arms"]["one_driver"], out["arms"]["two_drivers"]
    out["two_driver_throughput_gain"] = round(
        two["stmts_per_sec"] / one["stmts_per_sec"], 2
    )
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_multi_driver_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
