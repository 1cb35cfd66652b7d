"""PostgreSQL wire-protocol server, driven by a raw-socket client that
speaks the documented v3 frontend protocol (no driver library needed).

Reference: driftdb-server/src/protocol/{codec,messages}.rs encode these
same backend messages; executor.rs:351-460 routes statements the same
way this server routes them into DriftSession.sql.
"""

from __future__ import annotations

import socket
import struct

import pytest

from driftdb_spark.server import PgWireServer
from driftdb_spark.sql_frontend import DriftSession


class Client:
    def __init__(self, host, port):
        self.sock = socket.create_connection((host, port), timeout=30)

    def close(self):
        self.sock.close()

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            assert chunk, "server closed early"
            buf += chunk
        return buf

    def startup(self):
        params = b"user\x00tester\x00database\x00drift\x00\x00"
        payload = struct.pack("!I", 196608) + params
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        msgs = self.read_until_ready()
        assert ("R", struct.pack("!I", 0)) in [(t, p[:4]) for t, p in msgs]
        return msgs

    def ssl_probe(self):
        payload = struct.pack("!I", 80877103)
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        return self._recv_exact(1)

    def read_msg(self):
        head = self._recv_exact(5)
        (length,) = struct.unpack("!I", head[1:])
        return head[:1].decode(), self._recv_exact(length - 4)

    def read_until_ready(self):
        msgs = []
        while True:
            t, p = self.read_msg()
            msgs.append((t, p))
            if t == "Z":
                return msgs

    def query(self, sql):
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
        msgs = self.read_until_ready()
        cols, rows, tag, err = [], [], None, None
        for t, p in msgs:
            if t == "T":
                (n,) = struct.unpack("!H", p[:2])
                off = 2
                for _ in range(n):
                    end = p.index(b"\x00", off)
                    cols.append(p[off:end].decode())
                    off = end + 1 + 18  # fixed-size field descriptor
            elif t == "D":
                (n,) = struct.unpack("!H", p[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", p[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(p[off : off + ln].decode())
                        off += ln
                rows.append(vals)
            elif t == "C":
                tag = p.rstrip(b"\x00").decode()
            elif t == "E":
                err = p
        return cols, rows, tag, err


@pytest.fixture
def server(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    srv = PgWireServer(sess).start()
    yield srv
    srv.stop()


def test_wire_protocol_end_to_end(server):
    host, port = server.address
    # SSLRequest is refused with 'N', then plaintext startup succeeds
    c = Client(host, port)
    assert c.ssl_probe() == b"N"
    c.startup()

    _c, _r, tag, err = c.query(
        "CREATE TABLE items (iid INT PRIMARY KEY, name STRING, qty INT)"
    )
    assert err is None
    _c, _r, tag, err = c.query(
        "INSERT INTO items VALUES (1, 'bolt', 5), (2, NULL, 9)"
    )
    assert err is None and tag == "INSERT 0 2"

    cols, rows, tag, err = c.query("SELECT iid, name, qty FROM items ORDER BY iid")
    assert err is None and tag == "SELECT 2"
    assert cols == ["iid", "name", "qty"]
    assert rows == [["1", "bolt", "5"], ["2", None, "9"]]

    # temporal clause over the wire
    cols, rows, tag, _ = c.query(
        "SELECT COUNT(*) AS n FROM items FOR SYSTEM_TIME AS OF @SEQ:1"
    )
    assert rows == [["1"]]

    # error recovers: bad SQL -> ErrorResponse, connection stays usable
    _c, _r, _t, err = c.query("SELECT definitely_broken FROM nowhere")
    assert err is not None
    cols, rows, tag, err = c.query("SELECT 1 AS one")
    assert err is None and rows == [["1"]]
    c.close()


def test_wire_transactions_and_second_connection(server):
    host, port = server.address
    c = Client(host, port)
    c.startup()
    c.query("CREATE TABLE t (id INT PRIMARY KEY)")
    _c, _r, tag, err = c.query("BEGIN")
    assert err is None and tag == "BEGIN"
    c.query("INSERT INTO t VALUES (1)")
    _c, _r, tag, _ = c.query("ROLLBACK")
    assert tag == "ROLLBACK"
    _c, rows, _t, _e = c.query("SELECT COUNT(*) AS n FROM t")
    assert rows == [["0"]]
    c.close()
    # fresh connection against the same server still works
    c2 = Client(host, port)
    c2.startup()
    _c, rows, _t, err = c2.query("SELECT COUNT(*) AS n FROM t")
    assert err is None and rows == [["0"]]
    c2.close()


def test_connections_have_isolated_transactions(server):
    """Backend-per-connection: one connection's open transaction (and its
    read-your-writes view) is invisible to another; COMMIT publishes."""
    host, port = server.address
    a = Client(host, port)
    a.startup()
    a.query("CREATE TABLE iso (id INT PRIMARY KEY)")
    b = Client(host, port)
    b.startup()
    a.query("BEGIN")
    a.query("INSERT INTO iso VALUES (1)")
    _c, rows_a, _t, _e = a.query("SELECT COUNT(*) AS n FROM iso")
    _c, rows_b, _t, _e = b.query("SELECT COUNT(*) AS n FROM iso")
    assert rows_a == [["1"]] and rows_b == [["0"]]  # buffered view is local
    a.query("COMMIT")
    _c, rows_b2, _t, _e = b.query("SELECT COUNT(*) AS n FROM iso")
    assert rows_b2 == [["1"]]
    a.close(); b.close()
