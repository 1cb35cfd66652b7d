"""Wire-serving micro-bench: rows/sec streamed over the pgwire server.

Round 4 flagged the serving path as `weak` because results materialized
via collect() on the driver; round 5 replaced that with per-partition
streaming (toLocalIterator). This bench puts a number on the serving
path: a multi-partition SELECT over the documents table is read
end-to-end by a raw-socket v3 client, and the driver-side memory story
is structural (one partition + one prefetch in flight) rather than
result-set-sized.

Writes BENCH_wire_stream.json: {rows, wall_sec, rows_per_sec, bytes_rx}.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driftdb_spark.session import get_spark  # noqa: E402


class _BufferedConn:
    """Raw socket + a 1 MiB buffered reader: sends pass through,
    reads come from the buffer."""

    def __init__(self, raw):
        self._raw = raw
        self._rd = raw.makefile("rb", buffering=1 << 20)

    def sendall(self, data):
        self._raw.sendall(data)

    def read(self, n):
        return self._rd.read(n)

    def close(self):
        self._rd.close()
        self._raw.close()


def _recv_exact(sock, n):
    # `sock` is a buffered reader (socket.makefile) — a raw socket would
    # cost two syscalls per DataRow on the client and measure the BENCH
    # process, not the server
    buf = sock.read(n)
    if buf is None or len(buf) < n:
        raise ConnectionError("server closed")
    return buf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="bench_wire_stream")
    import tempfile

    from driftdb_spark.server import PgWireServer
    from driftdb_spark.sql_frontend import DriftSession

    sess = DriftSession(spark, tempfile.mkdtemp(prefix="wirebench-"))
    # Serve parquet tables via registered views (read-only path — the
    # server dispatches any SQL, not just event tables). Two streams:
    # documents (5 K wide-text rows: latency-bound, single partition →
    # driver-side encode) and lineitem (600 K rows at sf0.1,
    # multi-partition → the executor-side mapInArrow encode path; this
    # is the steady-state serving throughput).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("lineitem")
    n_docs = docs.count()
    n_li = li.count()
    srv = PgWireServer(sess, warm_workers=True).start()
    host, port = srv.address

    def _run(sock, sql: bytes):
        t0 = time.perf_counter()
        sock.sendall(b"Q" + struct.pack("!I", len(sql) + 4) + sql)
        rows = 0
        bytes_rx = 0
        while True:
            head = _recv_exact(sock, 5)
            (length,) = struct.unpack("!I", head[1:])
            _recv_exact(sock, length - 4)
            bytes_rx += 5 + length - 4
            if head[:1] == b"D":
                rows += 1
            elif head[:1] == b"Z":
                break
        return rows, bytes_rx, time.perf_counter() - t0

    try:
        raw = socket.create_connection((host, port), timeout=600)
        sock = _BufferedConn(raw)
        params = b"user\x00bench\x00\x00"
        payload = struct.pack("!I", 196608) + params
        sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        while True:  # drain startup until ReadyForQuery
            head = _recv_exact(sock, 5)
            (length,) = struct.unpack("!I", head[1:])
            _recv_exact(sock, length - 4)
            if head[:1] == b"Z":
                break
        li_sql = (
            b"SELECT l_orderkey, l_partkey, l_quantity, l_shipdate, "
            b"l_returnflag FROM lineitem\x00"
        )
        # one untimed pass FIRST: absorbs Python-worker spin-up (and any
        # race with the server's own warm thread) so both timed streams
        # below measure steady-state serving, not pool startup
        _run(sock, li_sql)
        rows, bytes_rx, wall = _run(
            sock, b"SELECT doc_id, text, lang, source, n_chars FROM documents\x00"
        )
        li_rows, li_bytes, li_wall = _run(sock, li_sql)
        sock.close()

        # concurrent serving: 4 clients streaming the same 600 K-row
        # result at once — does aggregate throughput hold when the
        # driver multiplexes several executor-encoded streams?
        import threading

        conc_rows = [0] * 4
        errs = []

        def _client(i: int) -> None:
            try:
                raw_i = socket.create_connection((host, port), timeout=600)
                s = _BufferedConn(raw_i)
                pay = struct.pack("!I", 196608) + b"user\x00bench\x00\x00"
                s.sendall(struct.pack("!I", len(pay) + 4) + pay)
                while True:
                    h = _recv_exact(s, 5)
                    (ln,) = struct.unpack("!I", h[1:])
                    _recv_exact(s, ln - 4)
                    if h[:1] == b"Z":
                        break
                r, _b, _w = _run(
                    s,
                    b"SELECT l_orderkey, l_partkey, l_quantity, l_shipdate, "
                    b"l_returnflag FROM lineitem\x00",
                )
                conc_rows[i] = r
                s.close()
            except Exception as exc:  # fails the bench loudly below
                errs.append(repr(exc))

        threads = [threading.Thread(target=_client, args=(i,)) for i in range(4)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_wall = time.perf_counter() - t0
        if errs:
            raise RuntimeError(f"concurrent clients failed: {errs}")
        if conc_rows != [n_li] * 4:
            raise RuntimeError(
                f"concurrent clients received partial streams: {conc_rows} "
                f"(expected {n_li} each)"
            )
    finally:
        srv.stop()
    out = {
        "rows": rows,
        "rows_expected": n_docs,
        "wall_sec": round(wall, 3),
        "rows_per_sec": int(li_rows / li_wall),
        "docs_rows_per_sec": int(rows / wall),
        "bytes_rx": bytes_rx,
        "mb_per_sec": round(li_bytes / li_wall / 1e6, 1),
        "stream_rows": li_rows,
        "stream_rows_expected": n_li,
        "stream_wall_sec": round(li_wall, 3),
        "stream_mb_rx": round(li_bytes / 1e6, 1),
        "concurrent_clients": 4,
        "concurrent_rows_total": sum(conc_rows),
        "concurrent_wall_sec": round(conc_wall, 3),
        "concurrent_agg_rows_per_sec": int(sum(conc_rows) / conc_wall),
        "warm_steady_state": True,  # lineitem stream timed after one warm pass
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_wire_stream.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
