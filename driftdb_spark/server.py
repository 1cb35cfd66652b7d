"""Minimal PostgreSQL wire-protocol (v3) server — the reference's pgwire
entry, Spark-first.

The reference's driftdb-server speaks the Postgres frontend/backend
protocol (driftdb-server/src/protocol/codec.rs + messages.rs encode the
same message types emitted here; executor.rs:351-460 routes statements to
sql_bridge). This implementation covers the *simple query* protocol —
startup (incl. SSLRequest/GSSENCRequest refusal), AuthenticationOk,
ParameterStatus, ReadyForQuery, 'Q' query → RowDescription / DataRow* /
CommandComplete, ErrorResponse with recovery, Terminate — which is what
``psql -c`` and most drivers' autocommit paths use. Statements execute
through :class:`DriftSession.sql`, so the full dispatcher surface
(DML-as-events, temporal clauses, transactions, policies, procedures) is
wire-reachable.

Every value serializes in text format with type OID 25 (text) — the
protocol-legal lowest common denominator; clients render fine, and it
sidesteps binary-format type mapping entirely. Each connection gets its
OWN DriftSession over the shared storage dir (PostgreSQL's
backend-per-connection model), so transaction state and SESSION
AUTHORIZATION are connection-local while committed data is shared; a
connection opened before another's CREATE TABLE re-reads the catalog on
its next session construction, exactly like the CLI.
"""

from __future__ import annotations

import socketserver
import struct
import threading

_PROTO_V3 = 196608
_SSL_REQUEST = 80877103
_GSSENC_REQUEST = 80877104
_CANCEL_REQUEST = 80877102


def _msg(type_byte: bytes, payload: bytes) -> bytes:
    return type_byte + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Handler(socketserver.BaseRequestHandler):
    def _send(self, data: bytes) -> None:
        self.request.sendall(data)

    def _recv_exact(self, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    # -- startup --------------------------------------------------------------

    def _startup(self) -> bool:
        while True:
            head = self._recv_exact(4)
            if head is None:
                return False
            (length,) = struct.unpack("!I", head)
            payload = self._recv_exact(length - 4)
            if payload is None:
                return False
            (code,) = struct.unpack("!I", payload[:4])
            if code in (_SSL_REQUEST, _GSSENC_REQUEST):
                self._send(b"N")  # not supported; client retries plaintext
                continue
            if code == _CANCEL_REQUEST:
                return False
            if code == _PROTO_V3:
                break
            self._error("08P01", f"unsupported protocol {code}")
            return False
        self._send(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
        for k, v in (
            ("server_version", "16.0 (driftdb_spark)"),
            ("client_encoding", "UTF8"),
            ("DateStyle", "ISO"),
        ):
            self._send(_msg(b"S", _cstr(k) + _cstr(v)))
        self._send(_msg(b"K", struct.pack("!II", 1, 0)))  # BackendKeyData
        self._ready()
        return True

    # -- backend messages -----------------------------------------------------

    def _ready(self) -> None:
        self._send(_msg(b"Z", b"I"))

    def _error(self, code: str, message: str) -> None:
        fields = b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message) + b"\x00"
        self._send(_msg(b"E", fields))

    def _row_description(self, columns: list[str]) -> None:
        body = struct.pack("!H", len(columns))
        for c in columns:
            #          tableoid attnum typoid(25=text) typlen typmod fmt
            body += _cstr(c) + struct.pack("!IhIhih", 0, 0, 25, -1, -1, 0)
        self._send(_msg(b"T", body))

    def _data_row(self, values: list) -> None:
        body = struct.pack("!H", len(values))
        for v in values:
            if v is None:
                body += struct.pack("!i", -1)
            else:
                b = str(v).encode()
                body += struct.pack("!i", len(b)) + b
        self._send(_msg(b"D", body))

    def _complete(self, tag: str) -> None:
        self._send(_msg(b"C", _cstr(tag)))

    # -- query execution -------------------------------------------------------

    def _run_query(self, sql: str) -> None:
        sql = sql.strip().rstrip(";").strip()
        if not sql:
            self._send(_msg(b"I", b""))  # EmptyQueryResponse
            return
        verb = sql.split(None, 1)[0].upper()
        # Statement DISPATCH serializes across connections: sessions share
        # the SparkSession's temp-view namespace, and _register_states →
        # spark.sql must not interleave with another connection's (the
        # analyzed plan binds its views eagerly, so execution after
        # dispatch is safe to run concurrently).
        with self.server.exec_lock:
            result = self.session.sql(sql)
        if isinstance(result, int):
            tag = {
                "INSERT": f"INSERT 0 {result}",
                "UPDATE": f"UPDATE {result}",
                "DELETE": f"DELETE {result}",
                "BEGIN": "BEGIN",
                "START": "BEGIN",
                "COMMIT": "COMMIT",
                "ROLLBACK": "ROLLBACK",
            }.get(verb, verb)
            self._complete(tag)
            return
        rows = result.collect()
        self._row_description(result.columns)
        for r in rows:
            self._data_row(list(r))
        self._complete(f"SELECT {len(rows)}")

    def handle(self) -> None:
        # Per-connection DriftSession over the SAME storage dir + Spark:
        # transaction state and SESSION AUTHORIZATION are connection-local
        # (PostgreSQL semantics — one backend per connection), while the
        # catalog/storage is shared. Falls back to the server's single
        # session if it wasn't built from a storage dir.
        base = self.server.session
        try:
            self.session = type(base)(base.spark, base.storage_dir)
        except Exception:
            self.session = base
        if not self._startup():
            return
        while True:
            head = self._recv_exact(5)
            if head is None:
                return
            mtype = head[:1]
            (length,) = struct.unpack("!I", head[1:])
            payload = self._recv_exact(length - 4)
            if payload is None:
                return
            if mtype == b"X":  # Terminate
                return
            if mtype == b"Q":
                sql = payload.rstrip(b"\x00").decode()
                try:
                    self._run_query(sql)
                except Exception as exc:  # surface, stay usable
                    self._error("XX000", f"{type(exc).__name__}: {exc}")
                self._ready()
            else:
                # extended protocol (Parse/Bind/...) not offered; per the
                # protocol an error + ReadyForQuery resyncs the client
                self._error("0A000", f"message type {mtype!r} not supported")
                self._ready()


class PgWireServer:
    """Serve a DriftSession over the Postgres wire protocol."""

    def __init__(self, session, host: str = "127.0.0.1", port: int = 0):
        self._tcp = socketserver.ThreadingTCPServer((host, port), _Handler, bind_and_activate=True)
        self._tcp.daemon_threads = True
        self._tcp.allow_reuse_address = True
        self._tcp.session = session
        self._tcp.exec_lock = threading.Lock()
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._tcp.server_address

    def start(self) -> "PgWireServer":
        self._thread = threading.Thread(target=self._tcp.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()
