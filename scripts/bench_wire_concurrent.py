"""Concurrent statement EXECUTION across wire connections.

Round 8's global exec_lock serialized statement dispatch because every
connection's DriftSession shared one SparkSession temp-view catalog.
Round 9 gives each connection a cloned SparkSession (private temp-view
namespace, shared SparkContext) + a FAIR scheduler pool, and takes
exec_lock only for writes. This bench measures what that buys across
three workloads:

1. read_only — 4 clients each EXECUTING a distinct aggregation (dispatch
   + planning + state registration + execution + streaming, end to end
   over the socket). The r9 artifact showed ~1x here: exec_lock only ever
   serialized Python-side DISPATCH for reads (session.sql is lazy;
   execution already overlapped), and concurrent dispatch still
   serializes on the GIL/Py4J gateway — the measured floor, documented
   in SCALE.md.
2. mixed_dml — the same readers while a writer streams 500-row INSERT
   batches. r9 measured the real win here as writer liveness (+40%
   batches at equal reader wall).
3. lock_bound (r10) — the workload the lock DEMONSTRABLY bound: a writer
   applying multi-second INSERT ... SELECT batches (~120K rows each, the
   full write path: PK anti-join, constraint check, sequence claim,
   staged publish) while 4 readers execute sub-second aggregations. In
   serialize mode every reader statement queues behind up to a full
   writer batch; with per-connection sessions readers never touch the
   write lock. The serialize arm wraps exec_lock in a timing shim, so
   each reader statement's wall decomposes into measured LOCK-WAIT vs
   dispatch+execution (solo latency approximates the latter).

The tables are the engine's OWN event-sourced tables (CREATE TABLE +
INSERT ... SELECT from parquet), so dispatch does real work per query:
AS-OF resolution, state-fold view registration, RLS/RBAC checks.

A/B: identical workloads against serialize_dispatch=True (the exact r8
behavior: shared session, every statement locked) vs the new server.

Writes BENCH_wire_concurrent_r10.json.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.session import get_spark  # noqa: E402


def _recv_msg(rd):
    head = rd.read(5)
    if head is None or len(head) < 5:
        raise ConnectionError("server closed")
    (length,) = struct.unpack("!I", head[1:])
    payload = rd.read(length - 4) if length > 4 else b""
    return head[:1], payload


class Conn:
    def __init__(self, host, port):
        self.raw = socket.create_connection((host, port), timeout=600)
        self.rd = self.raw.makefile("rb", buffering=1 << 20)
        pay = struct.pack("!I", 196608) + b"user\x00bench\x00\x00"
        self.raw.sendall(struct.pack("!I", len(pay) + 4) + pay)
        self._drain()

    def _drain(self):
        rows = 0
        err = None
        while True:
            t, p = _recv_msg(self.rd)
            if t == b"D":
                rows += 1
            elif t == b"E":
                err = p
            elif t == b"Z":
                return rows, err

    def query(self, sql: str):
        pay = sql.encode() + b"\x00"
        self.raw.sendall(b"Q" + struct.pack("!I", len(pay) + 4) + pay)
        rows, err = self._drain()
        if err is not None:
            raise RuntimeError(f"query failed: {sql!r}: {err!r}")
        return rows

    def close(self):
        self.rd.close()
        self.raw.close()


# Four DISTINCT aggregation queries over event-sourced tables — each
# client owns one shape (group-agg, filtered agg, distinct-agg, join-agg)
QUERIES = [
    "SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS s "
    "FROM ev_orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq, "
    "AVG(l_extendedprice) AS ap, COUNT(*) AS n FROM ev_lineitem "
    "WHERE l_shipdate <= DATE '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS nn, "
    "AVG(c_acctbal) AS ab FROM ev_customer GROUP BY c_mktsegment "
    "ORDER BY c_mktsegment",
    "SELECT o_orderstatus, COUNT(*) AS n, AVG(c_acctbal) AS ab "
    "FROM ev_orders JOIN ev_customer ON o_custkey = c_custkey "
    "GROUP BY o_orderstatus ORDER BY o_orderstatus",
]


def _run_fleet(host, port, reps):
    """4 clients, each repeatedly executing its own aggregation. The
    connections open OUTSIDE the timed window (session setup is a
    once-per-connection cost; the ask is statement throughput), then a
    barrier releases all clients at once. Returns (wall, per-client row
    counts, per-client solo walls) where solo is each query measured
    alone beforehand on its own connection — max(solo) is the ideal
    fully-parallel wall."""
    conns = [Conn(host, port) for _ in QUERIES]
    solo = []
    for i, c in enumerate(conns):  # warm + solo baseline, one at a time
        t0 = time.perf_counter()
        for _ in range(reps):
            c.query(QUERIES[i])
        solo.append(round(time.perf_counter() - t0, 3))
    results = [None] * len(QUERIES)
    errs = []
    barrier = threading.Barrier(len(QUERIES) + 1)

    def client(i):
        try:
            barrier.wait()
            n = 0
            for _ in range(reps):
                n += conns[i].query(QUERIES[i])
            results[i] = n
        except Exception as exc:
            errs.append(repr(exc))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(len(QUERIES))]
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
    return wall, results, solo


def _values_batch(base_pk: int, n: int) -> str:
    """One INSERT batch with PKs [base_pk, base_pk+n) — existing group
    values only, so the readers' GROUP BY result cardinality is stable
    while the writer runs (cross-mode row-count equality stays exact)."""
    rows = ", ".join(
        f"({base_pk + i}, {1 + (base_pk + i) % 1500}, 'F', "
        f"{100.0 + (base_pk + i) % 997}, '1-URGENT')"
        for i in range(n)
    )
    return f"INSERT INTO ev_orders VALUES {rows}"


def _run_mixed(host, port, reps, pk_base):
    """The workload the r8 lock actually throttled: 4 reader clients
    each executing a distinct aggregation (reps times) WHILE a writer
    connection applies a continuous stream of INSERT batches. Writes
    execute EAGERLY inside dispatch (sequence claim + staged publish),
    so in serialize mode every reader statement queues behind the
    writer's multi-hundred-ms lock hold; with per-connection sessions
    readers never touch the write lock. Returns (readers_wall, rows,
    write_batches_applied)."""
    conns = [Conn(host, port) for _ in QUERIES]
    writer = Conn(host, port)
    for i, c in enumerate(conns):  # warm pass (workers, IO cache)
        c.query(QUERIES[i])
    stop = threading.Event()
    wrote = [0]
    werrs: list[str] = []

    def write_loop():
        k = 0
        try:
            while not stop.is_set():
                writer.query(_values_batch(pk_base + k * 500, 500))
                k += 1
        except Exception as exc:  # a dead writer voids the A/B: surface it
            werrs.append(repr(exc))
        finally:
            wrote[0] = k

    results = [None] * len(QUERIES)
    errs = []
    barrier = threading.Barrier(len(QUERIES) + 1)

    def client(i):
        try:
            barrier.wait()
            n = 0
            for _ in range(reps):
                n += conns[i].query(QUERIES[i])
            results[i] = n
        except Exception as exc:
            errs.append(repr(exc))

    wt = threading.Thread(target=write_loop)
    threads = [threading.Thread(target=client, args=(i,)) for i in range(len(QUERIES))]
    wt.start()
    time.sleep(1.0)  # writer reaches steady state first
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stop.set()
    wt.join()
    for c in conns:
        c.close()
    writer.close()
    if errs or werrs:
        raise RuntimeError(f"clients failed: {errs + werrs}")
    if wrote[0] == 0:
        raise RuntimeError("writer applied zero batches: not a mixed workload")
    return wall, results, wrote[0]


class _TimingLock:
    """exec_lock shim for the serialize arm: records how long each
    acquisition WAITED, so a reader statement's wall decomposes into
    lock-wait vs everything else."""

    def __init__(self, inner):
        self.inner = inner
        self.waits: list[float] = []

    def __enter__(self):
        t0 = time.perf_counter()
        self.inner.acquire()
        self.waits.append(time.perf_counter() - t0)
        return self

    def __exit__(self, *a):
        self.inner.release()
        return False


def _run_lock_bound(host, port, reps, srv, serialize, pk_base):
    """Workload 3: readers behind SUSTAINED multi-second DML batches.
    The writer's INSERT ... SELECT multiplies src_orders 8x (~120K rows
    at sf0.01) into a SEPARATE sink table — readers' tables stay
    byte-identical across arms, so their latencies compare cleanly while
    each batch still holds exec_lock for seconds (full write path: PK
    anti-join, constraint check, sequence claim, staged publish). 4
    readers each run `reps` sub-second aggregations and record
    PER-STATEMENT latencies."""
    conns = [Conn(host, port) for _ in QUERIES]
    writer = Conn(host, port)
    for i, c in enumerate(conns):
        c.query(QUERIES[i])  # warm

    timing = None
    if serialize:
        timing = _TimingLock(srv._tcp.exec_lock)
        srv._tcp.exec_lock = timing

    stop = threading.Event()
    wrote = [0]
    werrs: list[str] = []

    def write_loop():
        k = 0
        try:
            while not stop.is_set():
                # spacing: 1e9 per batch, 1e8 per multiplier slice — both
                # far above any TPC-H o_orderkey, so PKs never collide
                base = pk_base + k * 1_000_000_000
                writer.query(
                    "INSERT INTO ev_sink "
                    f"SELECT o_orderkey + {base} + m.i * 100000000, o_custkey, "
                    "o_orderstatus, o_totalprice, o_orderpriority "
                    "FROM src_orders CROSS JOIN "
                    "(SELECT explode(sequence(0, 7)) AS i) m"
                )
                k += 1
        except Exception as exc:  # a dead writer = no lock contention = void A/B
            werrs.append(repr(exc))
        finally:
            wrote[0] = k

    lat: list[list[float]] = [[] for _ in QUERIES]
    errs: list[str] = []
    barrier = threading.Barrier(len(QUERIES) + 1)

    def client(i):
        try:
            barrier.wait()
            for _ in range(reps):
                t0 = time.perf_counter()
                conns[i].query(QUERIES[i])
                lat[i].append(time.perf_counter() - t0)
        except Exception as exc:
            errs.append(repr(exc))

    wt = threading.Thread(target=write_loop)
    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(len(QUERIES))
    ]
    wt.start()
    time.sleep(2.0)  # writer mid-batch when readers arrive
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stop.set()
    wt.join()
    if timing is not None:
        srv._tcp.exec_lock = timing.inner
    for c in conns:
        c.close()
    writer.close()
    if errs or werrs:
        raise RuntimeError(f"clients failed: {errs + werrs}")
    if wrote[0] == 0:
        raise RuntimeError("writer applied zero batches: not lock-bound")
    flat = sorted(t for ls in lat for t in ls)
    waits = sorted(timing.waits, reverse=True) if timing else []
    return {
        "readers_wall_sec": round(wall, 3),
        "reader_stmt_p50_sec": round(flat[len(flat) // 2], 3),
        "reader_stmt_max_sec": round(flat[-1], 3),
        "writer_batches": wrote[0],
        "lock_wait_top5_sec": [round(w, 3) for w in waits[:5]],
        "lock_wait_total_sec": round(sum(waits), 3) if waits else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    reps = int(os.environ.get("BENCH_CONC_REPS", "3"))
    # the SERVE path ships FAIR (cli serve); benching the wire server
    # under the engine-default FIFO would measure a configuration
    # production serving never runs
    spark = get_spark(app_name="bench_wire_concurrent", scheduler="FAIR")
    import tempfile

    from driftdb_spark.server import PgWireServer
    from driftdb_spark.sql_frontend import DriftSession

    sess = DriftSession(spark, tempfile.mkdtemp(prefix="concbench-"))
    # Event-sourced copies of three sf tables: INSERT ... SELECT routes
    # through the real write path (sequence assignment, constraints),
    # so subsequent SELECT dispatch does the real state-fold work.
    for name, cols, pk in (
        (
            "orders",
            "o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT, "
            "o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING",
            None,
        ),
        (
            "lineitem",
            # l_orderkey repeats per line — synthesize a unique PK below
            "l_pk BIGINT PRIMARY KEY, l_quantity DOUBLE, "
            "l_extendedprice DOUBLE, l_returnflag STRING, "
            "l_linestatus STRING, l_shipdate DATE",
            None,
        ),
        (
            "customer",
            "c_custkey BIGINT PRIMARY KEY, c_nationkey BIGINT, "
            "c_mktsegment STRING, c_acctbal DOUBLE",
            None,
        ),
    ):
        src = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        src.createOrReplaceTempView(f"src_{name}")
        sess.sql(f"CREATE TABLE ev_{name} ({cols})")
        proj = ", ".join(c.split()[0] for c in cols.split(", "))
        # the synthetic lineitem has non-unique (orderkey, linenumber):
        # synthesize a dense unique PK for the event-log copy
        proj = proj.replace(
            "l_pk",
            "ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS l_pk",
            1,
        )
        sess.sql(f"INSERT INTO ev_{name} SELECT {proj} FROM src_{name}")
    # the lock-bound writer's target: readers never touch it, so their
    # latencies compare cleanly across arms while the write path (and its
    # multi-second exec_lock hold) stays fully real
    sess.sql(
        "CREATE TABLE ev_sink (o_orderkey BIGINT PRIMARY KEY, "
        "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderpriority STRING)"
    )

    out = {"clients": len(QUERIES), "reps": reps, "sf_dir": sf_dir, "runs": {}}
    pk_base = 50_000_000
    sink_base = 100_000_000_000
    for mode, serialize in (("serial_r8", True), ("concurrent_r9", False)):
        srv = PgWireServer(
            sess, warm_workers=True, serialize_dispatch=serialize
        ).start()
        host, port = srv.address
        try:
            wall, rows, solo = _run_fleet(host, port, reps)
            mixed_wall, mixed_rows, batches = _run_mixed(
                host, port, reps, pk_base
            )
            pk_base += 10_000_000  # next mode claims fresh PKs
            lock_bound = _run_lock_bound(
                host, port, reps, srv, serialize, sink_base
            )
            sink_base += 1_000_000_000_000
        finally:
            srv.stop()
        # equalize the sink between arms: the PK anti-join's cost depends
        # on the sink's current state, which must match at arm start
        sess.sql("TRUNCATE ev_sink")
        out["runs"][mode] = {
            "read_only": {
                "wall_sec": round(wall, 3),
                "rows": rows,
                "solo_walls_sec": solo,
                "ideal_parallel_wall_sec": max(solo),
                "serial_sum_sec": round(sum(solo), 3),
            },
            "mixed_dml": {
                "readers_wall_sec": round(mixed_wall, 3),
                "rows": mixed_rows,
                "writer_batches": batches,
            },
            "lock_bound": lock_bound,
        }
        print(f"{mode}: read-only wall={wall:.3f}s solo={solo}")
        print(
            f"{mode}: mixed readers wall={mixed_wall:.3f}s "
            f"(writer applied {batches} x500-row batches)"
        )
        print(f"{mode}: lock_bound {lock_bound}")
    s = out["runs"]["serial_r8"]
    c = out["runs"]["concurrent_r9"]
    out["read_only_speedup"] = round(
        s["read_only"]["wall_sec"] / c["read_only"]["wall_sec"], 2
    )
    out["mixed_dml_reader_speedup"] = round(
        s["mixed_dml"]["readers_wall_sec"] / c["mixed_dml"]["readers_wall_sec"], 2
    )
    out["lock_bound_reader_speedup"] = round(
        s["lock_bound"]["readers_wall_sec"] / c["lock_bound"]["readers_wall_sec"],
        2,
    )
    out["lock_bound_reader_p50_speedup"] = round(
        s["lock_bound"]["reader_stmt_p50_sec"]
        / c["lock_bound"]["reader_stmt_p50_sec"],
        2,
    )
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_wire_concurrent_r10.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
