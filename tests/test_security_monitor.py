"""Security-event monitor (reference security_monitor.rs event recording /
security_audit.rs): the four real event sources — wire auth failures,
privilege-escalation attempts, rate-limit rejections, bad cancel
secrets — recorded where the refusals actually happen, aggregated
server-wide, surfaced in SHOW STATUS//metrics, and driving the
brute-force alert rule."""

from __future__ import annotations

import json
import socket
import struct
import urllib.request

import pytest

from driftdb_spark.server import PgWireServer
from driftdb_spark.sql_frontend import DriftSession

from test_pgwire import ExtClient


def test_session_level_events_rate_limit_and_escalation(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path / "sec1"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY)")

    # rate limit: bucket of 2, no refill -> third statement rejected
    sess.set_rate_limit(1e-9, burst=2, clock=lambda: 0.0)
    sess.sql("SELECT 1 AS a")
    sess.sql("SELECT 2 AS a")
    with pytest.raises(Exception):
        sess.sql("SELECT 3 AS a")
    sess._rate_limiter = None

    # escalation: restricted authenticated identity tries to switch
    sess.enter_authenticated("carol", superuser=False)
    with pytest.raises(PermissionError):
        sess.sql("SET SESSION AUTHORIZATION root")
    sess._auth_identity = None
    sess.set_security_context(None)

    counters = sess.security.counters()
    assert counters["rate_limit_exceeded"] == 1
    assert counters["privilege_violation"] == 1
    ev = sess.security.events(kind="privilege_violation")[-1]
    assert ev["actor"] == "carol" and "AUTHORIZATION" in ev["detail"]
    # surfaced in SHOW STATUS / status_snapshot
    assert sess.status_snapshot()["security_events"] == counters


def test_wire_events_aggregate_on_base_session(spark, tmp_path):
    """Auth failures, SET ROLE refusals, and bad cancel secrets from
    different connections all land on ONE monitor (the base session's),
    with the client source recorded for the auth failure."""
    sess = DriftSession(spark, str(tmp_path / "sec2"))
    srv = PgWireServer(
        sess, users={"admin": "pw"}, auth_method="cleartext"
    ).start()
    try:
        host, port = srv.address
        # two failed logins (unknown user + wrong password)
        for user, pw in (("ghost", "x"), ("admin", "wrong")):
            c = ExtClient(host, port)
            with pytest.raises(AssertionError):
                c.startup_auth(user, pw, md5=False)
            c.close()
        # authenticated connection attempts the SET ROLE spelling
        c = ExtClient(host, port)
        msgs = c.startup_auth("admin", "pw", md5=False)
        _c, _r, _t, err = c.query("SET ROLE somebody")
        assert err is not None
        # bad cancel secret against this live backend (BackendKeyData
        # harvested from the startup message stream)
        pid, secret = struct.unpack(
            "!II", [p for t, p in msgs if t == "K"][0][:8]
        )
        s = socket.create_connection((host, port), timeout=10)
        body = struct.pack("!III", 80877102, pid, secret ^ 0xDEADBEEF)
        s.sendall(struct.pack("!I", len(body) + 4) + body)
        s.close()
        _c, rows, _t, err = c.query("SELECT 1 AS ok")
        assert err is None  # victim unaffected
        c.close()

        import time

        deadline = time.time() + 5
        while time.time() < deadline:
            counters = sess.security.counters()
            if counters.get("cancel_bad_secret", 0) >= 1:
                break
            time.sleep(0.05)
        assert counters["auth_failure"] == 2
        assert counters["privilege_violation"] >= 1
        assert counters["cancel_bad_secret"] == 1
        ev = sess.security.events(kind="auth_failure")[-1]
        assert ev["actor"] == "admin" and ev["source"].startswith("127.")
    finally:
        srv.stop()


def test_auth_failure_rate_drives_alert(spark, tmp_path):
    """security_auth_failure_rate_per_sec feeds the default
    HighAuthFailureRate rule (brute-force detection)."""
    from driftdb_spark.observability import AlertManager

    sess = DriftSession(spark, str(tmp_path / "sec3"))
    now = [0.0]
    mgr = AlertManager(sess, clock=lambda: now[0])
    mgr.evaluate()  # baseline
    for _ in range(30):
        sess.security.record("auth_failure", actor="ghost")
    now[0] += 10  # 3 failures/sec > 1.0 threshold
    (a,) = [x for x in mgr.evaluate() if x["name"] == "HighAuthFailureRate"]
    assert a["state"] == "pending"
    for _ in range(700):
        sess.security.record("auth_failure", actor="ghost")
    now[0] += 70  # still breaching after 70s -> fires
    (a,) = [x for x in mgr.evaluate() if x["name"] == "HighAuthFailureRate"]
    assert a["state"] == "firing"
    now[0] += 10  # quiet period -> resolves into history
    assert [x for x in mgr.evaluate()
            if x["name"] == "HighAuthFailureRate"] == []
    assert mgr.history()[-1]["name"] == "HighAuthFailureRate"


def test_security_events_http_route(spark, tmp_path):
    from driftdb_spark.observability import HealthServer

    sess = DriftSession(spark, str(tmp_path / "sec4"))
    sess.security.record("auth_failure", actor="eve", source="10.0.0.9:1")
    sess.security.record("rate_limit_exceeded", actor="bulk")
    srv = HealthServer(sess).start()
    try:
        host, port = srv.address

        def get(path):
            with urllib.request.urlopen(
                f"http://{host}:{port}{path}", timeout=10
            ) as r:
                return json.loads(r.read().decode())

        evs = get("/api/security/events")
        assert [e["kind"] for e in evs] == [
            "auth_failure", "rate_limit_exceeded"
        ]
        only = get("/api/security/events?kind=auth_failure")
        assert len(only) == 1 and only[0]["actor"] == "eve"
        m = get("/metrics")
        assert m["security_events"]["auth_failure"] == 1
    finally:
        srv.stop()
