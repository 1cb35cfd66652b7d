"""Python client library (reference crates/driftdb-client/src/client.rs)
against the live wire server: connect/auth, simple + extended queries,
transactions, SQLSTATE errors, out-of-band cancel plumbing."""

from __future__ import annotations

import pytest

from driftdb_spark.client import DriftClient, WireError
from driftdb_spark.server import PgWireServer
from driftdb_spark.sql_frontend import DriftSession


@pytest.fixture
def server(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    srv = PgWireServer(sess).start()
    yield srv
    srv.stop()


def test_client_end_to_end(server):
    host, port = server.address
    with DriftClient(host, port, user="app") as c:
        assert c.backend_pid is not None and c.txn_status == b"I"
        r = c.query("SELECT 41 + 1 AS v")
        assert r.columns == ["v"] and r.scalar() == "42"
        assert r.tag.startswith("SELECT")

        c.query("CREATE TABLE ct (id INT PRIMARY KEY, v STRING)")
        r = c.query("INSERT INTO ct VALUES (1, 'x'), (2, 'y')")
        assert r.tag.startswith("INSERT")

        # extended protocol with $N params (server infers types for oid 0)
        c.execute("INSERT INTO ct VALUES ($1, $2)", (3, "z"))
        r = c.execute("SELECT v FROM ct WHERE id > $1 ORDER BY id", (1,))
        assert [row[0] for row in r.rows] == ["y", "z"]

        # declared int8 OID: the typed-parameter path
        r = c.execute(
            "SELECT COUNT(*) AS n FROM ct WHERE id <= $1", (2,), oids=(20,)
        )
        assert r.scalar() == "2"


def test_client_transactions_and_errors(server):
    host, port = server.address
    with DriftClient(host, port, user="app") as c:
        c.query("CREATE TABLE tx (id INT PRIMARY KEY, v STRING)")
        c.begin()
        assert c.in_transaction()
        c.query("INSERT INTO tx VALUES (1, 'a')")
        c.rollback()
        assert not c.in_transaction()
        assert c.query("SELECT COUNT(*) AS n FROM tx").scalar() == "0"

        c.begin()
        c.query("INSERT INTO tx VALUES (1, 'a')")
        c.commit()
        assert c.query("SELECT COUNT(*) AS n FROM tx").scalar() == "1"

        # an error raises with its SQLSTATE and leaves the wire usable
        with pytest.raises(WireError) as ei:
            c.query("SELECT * FROM no_such_table_abc")
        assert ei.value.sqlstate and len(ei.value.sqlstate) == 5
        assert c.query("SELECT 1 AS ok").scalar() == "1"

        # duplicate-PK constraint error carries a real code
        with pytest.raises(WireError):
            c.query("INSERT INTO tx VALUES (1, 'dup')")


def test_client_auth_md5_and_rejection(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    srv = PgWireServer(
        sess, users={"admin": "sekret"}, superusers={"admin"}
    ).start()
    try:
        host, port = srv.address
        with DriftClient(host, port, user="admin", password="sekret") as c:
            assert c.query("SELECT 7 AS x").scalar() == "7"
        with pytest.raises(WireError) as ei:
            DriftClient(host, port, user="admin", password="wrong")
        assert ei.value.sqlstate == "28P01"
        with pytest.raises(WireError):
            DriftClient(host, port, user="admin")  # password required
    finally:
        srv.stop()


def test_client_cancel_request_is_accepted(server):
    """cancel() fires the out-of-band CancelRequest with the real
    BackendKeyData; the connection stays healthy afterwards (an idle
    cancel is ignored, PostgreSQL semantics — server.py idle-clear)."""
    import time

    host, port = server.address
    with DriftClient(host, port, user="app") as c:
        c.cancel()
        time.sleep(1.0)  # let the cancel land while the backend is idle
        assert c.query("SELECT 5 AS v").scalar() == "5"


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    """Self-signed cert + key via the openssl CLI (skip if unavailable)."""
    import shutil as _shutil
    import subprocess

    if _shutil.which("openssl") is None:
        pytest.skip("openssl not available")
    d = tmp_path_factory.mktemp("tls_client")
    cert, key = d / "server.crt", d / "server.key"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(cert), "-days", "1",
            "-subj", "/CN=localhost",
        ],
        check=True,
        capture_output=True,
    )
    return str(cert), str(key)


def test_client_tls_connection(spark, tmp_path, tls_cert):
    from driftdb_spark.server import tls_context_from_files

    cert, key = tls_cert
    sess = DriftSession(spark, str(tmp_path))
    srv = PgWireServer(
        sess, ssl_context=tls_context_from_files(cert, key)
    ).start()
    try:
        host, port = srv.address
        with DriftClient(host, port, user="app", tls=True) as c:
            c.query("CREATE TABLE enc (id INT PRIMARY KEY, v STRING)")
            c.execute("INSERT INTO enc VALUES ($1, $2)", (1, "secret"))
            assert c.query("SELECT v FROM enc").scalar() == "secret"
    finally:
        srv.stop()
