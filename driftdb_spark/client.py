"""Python client library for the wire server — the reference's
``driftdb-client`` crate (crates/driftdb-client/src/client.rs: connect,
query, execute, transactions, typed errors), rebuilt as a dependency-free
PostgreSQL-v3 wire client.

Any stock PostgreSQL driver (psql, psycopg2, JDBC) already works against
``server.py``; this module exists for the environments the reference's
client crate serves — embedding a minimal, zero-dependency connector in a
tool or test harness without pulling a driver in. It speaks the same
subset the server implements: startup + cleartext/MD5 auth, SSLRequest
TLS, the simple and extended query protocols (typed parameter OIDs),
transaction status tracking off ReadyForQuery, CancelRequest via
BackendKeyData, and SQLSTATE-carrying errors.

Values arrive as the server sends them — text format (the server
declares OID 25 for every column, serializing Python values with str()),
``None`` for NULL. Interpretation is the caller's, exactly like psql.
"""

from __future__ import annotations

import hashlib
import socket
import ssl as _ssl
import struct
from dataclasses import dataclass, field

_PROTO_V3 = 196608  # (3 << 16)
_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102


class WireError(RuntimeError):
    """ErrorResponse surfaced as an exception (reference client.rs maps
    server errors to DriftError). ``sqlstate`` carries the 5-char code."""

    def __init__(self, sqlstate: str, message: str, severity: str = "ERROR"):
        super().__init__(f"{severity} ({sqlstate}): {message}")
        self.sqlstate = sqlstate
        self.message = message
        self.severity = severity


@dataclass
class Result:
    """One statement's outcome: column names, text-format rows, and the
    CommandComplete tag (e.g. ``SELECT 3``, ``INSERT 0 2``)."""

    columns: list[str] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)
    tag: str = ""

    def scalar(self):
        return self.rows[0][0] if self.rows and self.rows[0] else None


class DriftClient:
    """Minimal blocking connection to a :class:`PgWireServer`.

    >>> with DriftClient("127.0.0.1", 5432, user="app") as c:
    ...     c.query("CREATE TABLE t (id INT PRIMARY KEY, v STRING)")
    ...     c.execute("INSERT INTO t VALUES ($1, $2)", (1, "x"))
    ...     c.query("SELECT v FROM t").rows
    """

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "postgres",
        password: str | None = None,
        database: str = "driftdb",
        tls: bool = False,
        tls_context: _ssl.SSLContext | None = None,
        timeout: float = 30.0,
    ):
        self.host, self.port = host, port
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if tls:
            self._sock.sendall(struct.pack("!II", 8, _SSL_REQUEST))
            if self._recv_exact(1) != b"S":
                raise WireError("08004", "server refused SSLRequest")
            ctx = tls_context
            if ctx is None:
                ctx = _ssl.create_default_context()
                ctx.check_hostname = False
                ctx.verify_mode = _ssl.CERT_NONE  # self-signed server certs
            self._sock = ctx.wrap_socket(self._sock, server_hostname=host)
        self.backend_pid = self.backend_secret = None
        self.txn_status = b"I"  # idle / T in-txn / E aborted (ReadyForQuery)
        self.parameters: dict[str, str] = {}
        self._startup(user, password, database)
        self._stmt_seq = 0

    # -- low-level framing -----------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise WireError("08006", "connection closed by server")
            buf += chunk
        return buf

    def _send_msg(self, t: bytes, payload: bytes) -> None:
        self._sock.sendall(t + struct.pack("!I", len(payload) + 4) + payload)

    def _read_msg(self) -> tuple[bytes, bytes]:
        t = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return t, self._recv_exact(length - 4)

    @staticmethod
    def _cstr(s: str) -> bytes:
        return s.encode() + b"\x00"

    # -- startup / auth ----------------------------------------------------------

    def _startup(self, user: str, password: str | None, database: str) -> None:
        body = struct.pack("!I", _PROTO_V3)
        body += self._cstr("user") + self._cstr(user)
        body += self._cstr("database") + self._cstr(database)
        body += b"\x00"
        self._sock.sendall(struct.pack("!I", len(body) + 4) + body)
        while True:
            t, payload = self._read_msg()
            if t == b"R":
                (code,) = struct.unpack("!I", payload[:4])
                if code == 0:
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise WireError("28P01", "server requires a password")
                    self._send_msg(b"p", self._cstr(password))
                elif code == 5:  # md5(md5(pw+user)+salt)
                    if password is None:
                        raise WireError("28P01", "server requires a password")
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send_msg(b"p", self._cstr("md5" + outer))
                else:
                    raise WireError("0A000", f"unsupported auth code {code}")
            elif t == b"K":
                self.backend_pid, self.backend_secret = struct.unpack(
                    "!II", payload
                )
            elif t == b"S":
                k, _, v = payload.partition(b"\x00")
                self.parameters[k.decode()] = v.split(b"\x00")[0].decode()
            elif t == b"E":
                raise self._error(payload)
            elif t == b"Z":
                self.txn_status = payload[:1]
                return

    @staticmethod
    def _error(payload: bytes) -> WireError:
        fields = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode(errors="replace")
        return WireError(
            fields.get("C", "XX000"),
            fields.get("M", "unknown error"),
            fields.get("S", "ERROR"),
        )

    # -- simple query protocol ---------------------------------------------------

    def query(self, sql: str) -> Result:
        """Run one statement via the simple protocol ('Q'). Raises
        :class:`WireError` on the first error (after draining to
        ReadyForQuery, so the connection stays usable)."""
        self._send_msg(b"Q", self._cstr(sql))
        return self._collect()

    def _collect(self) -> Result:
        res = Result()
        err: WireError | None = None
        while True:
            t, payload = self._read_msg()
            if t == b"T":
                (n,) = struct.unpack("!H", payload[:2])
                pos, cols = 2, []
                for _ in range(n):
                    end = payload.index(b"\x00", pos)
                    cols.append(payload[pos:end].decode())
                    pos = end + 1 + 18  # fixed per-column descriptor tail
                res.columns = cols
            elif t == b"D":
                (n,) = struct.unpack("!H", payload[:2])
                pos, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", payload[pos : pos + 4])
                    pos += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[pos : pos + ln].decode())
                        pos += ln
                res.rows.append(tuple(vals))
            elif t == b"C":
                res.tag = payload.rstrip(b"\x00").decode()
            elif t == b"E":
                err = err or self._error(payload)
            elif t in (b"n", b"s", b"1", b"2", b"3", b"N"):
                pass  # NoData / PortalSuspended / parse-bind-close acks / notices
            elif t == b"Z":
                self.txn_status = payload[:1]
                if err is not None:
                    raise err
                return res

    # -- extended query protocol ($N parameters) ----------------------------------

    def execute(
        self, sql: str, params: tuple = (), oids: tuple[int, ...] = ()
    ) -> Result:
        """Parse/Bind/Describe/Execute/Sync with text-format parameters.
        ``oids`` optionally declares parameter types (0 = let the server
        infer); values are sent as str(value), None as NULL."""
        name = f"_pyc{self._stmt_seq}"
        self._stmt_seq += 1
        p = self._cstr(name) + self._cstr(sql) + struct.pack("!H", len(oids))
        for o in oids:
            p += struct.pack("!I", o)
        self._send_msg(b"P", p)
        b = self._cstr("") + self._cstr(name) + struct.pack("!H", 0)
        b += struct.pack("!H", len(params))
        for v in params:
            if v is None:
                b += struct.pack("!i", -1)
            else:
                enc = str(v).encode()
                b += struct.pack("!i", len(enc)) + enc
        b += struct.pack("!H", 0)
        self._send_msg(b"B", b)
        self._send_msg(b"D", b"P" + self._cstr(""))
        self._send_msg(b"E", self._cstr("") + struct.pack("!I", 0))
        self._send_msg(b"C", b"S" + self._cstr(name))  # close the statement
        self._send_msg(b"S", b"")
        return self._collect()

    # -- transactions (reference client.rs transaction helpers) -------------------

    def begin(self) -> None:
        self.query("BEGIN")

    def commit(self) -> None:
        self.query("COMMIT")

    def rollback(self) -> None:
        self.query("ROLLBACK")

    def in_transaction(self) -> bool:
        return self.txn_status in (b"T", b"E")

    # -- out-of-band cancel --------------------------------------------------------

    def cancel(self) -> None:
        """Fire a CancelRequest for this backend on a fresh socket (the
        PostgreSQL out-of-band cancel; server.py routes it to Spark
        job-group cancellation)."""
        if self.backend_pid is None:
            raise WireError("08003", "no BackendKeyData was received")
        s = socket.create_connection((self.host, self.port), timeout=10)
        try:
            s.sendall(
                struct.pack(
                    "!IIII",
                    16,
                    _CANCEL_REQUEST,
                    self.backend_pid,
                    self.backend_secret,
                )
            )
        finally:
            s.close()

    # -- lifecycle -------------------------------------------------------------------

    def close(self) -> None:
        try:
            self._send_msg(b"X", b"")
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "DriftClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
