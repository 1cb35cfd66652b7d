"""HTTP health/metrics endpoint + SHOW STATUS (reference driftdb-server
health.rs /health/live + /health/ready, metrics.rs Prometheus counters).

The contract under test: probes and scrapes are driver-local (zero Spark
jobs), so they answer promptly EVEN WHILE a statement is occupying the
executors — the reference's liveness guarantee re-expressed for Spark."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

from driftdb_spark.observability import HealthServer
from driftdb_spark.sql_frontend import DriftSession


def _get(addr, path):
    host, port = addr
    with urllib.request.urlopen(f"http://{host}:{port}{path}", timeout=10) as r:
        return r.status, r.read().decode()


def _get_code(addr, path):
    try:
        return _get(addr, path)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_health_metrics_and_show_status(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    sess.sql("CREATE TABLE obs (id INT PRIMARY KEY, v STRING)")
    sess.sql("INSERT INTO obs VALUES (1, 'a'), (2, 'b')")
    sess.sql("SELECT * FROM obs")
    try:
        sess.sql("SELECT * FROM no_such_table_xyz")
    except Exception:
        pass

    srv = HealthServer(sess).start()
    try:
        code, body = _get(srv.address, "/health/live")
        assert code == 200 and json.loads(body)["status"] == "alive"

        code, body = _get(srv.address, "/health/ready")
        ready = json.loads(body)
        assert code == 200 and ready["status"] == "ready"
        assert ready["checks"] == {"spark": "ok", "storage": "ok"}

        code, body = _get(srv.address, "/metrics")
        m = json.loads(body)
        assert m["statements_total"] >= 4
        assert m["errors_total"] >= 1
        assert m["tables"] == 1
        assert set(m["latency_ms"]) == {"p50", "p95", "max"}
        assert m["latency_ms"]["max"] >= m["latency_ms"]["p50"] >= 0
        assert m["statements_by_verb"].get("INSERT", 0) >= 1

        code, text = _get(srv.address, "/metrics?format=prometheus")
        assert code == 200
        assert "driftdb_statements_total" in text
        assert 'driftdb_statement_latency_ms{quantile="p95"}' in text
        assert 'driftdb_statements_by_verb_total{verb="INSERT"}' in text

        code, _ = _get_code(srv.address, "/nope")
        assert code == 404

        # SHOW STATUS: the same counters, wire-reachable as plain rows
        rows = {r.name: r.value for r in sess.sql("SHOW STATUS").collect()}
        assert rows["status"] == "ok"
        assert int(rows["statements_total"]) >= 4
        assert int(rows["errors_total"]) >= 1
        assert float(rows["uptime_sec"]) > 0
        assert "latency_p95_ms" in rows and "statements_insert" in rows
    finally:
        srv.stop()


def test_metrics_scrape_is_prompt_while_query_runs(spark, tmp_path):
    """Scrapes must not queue behind a running statement: the slow query
    holds the executors for seconds; every probe during it answers in
    well under a second and liveness counters keep updating."""
    sess = DriftSession(spark, str(tmp_path))
    srv = HealthServer(sess).start()
    done = threading.Event()
    err: list[Exception] = []

    def slow():
        try:
            # several seconds of executor work on local[4]
            spark.range(200_000_000).selectExpr(
                "sum(id * id % 1000003) AS s"
            ).collect()
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=slow, daemon=True)
    try:
        t.start()
        scrapes = 0
        while not done.is_set() and scrapes < 50:
            t0 = time.perf_counter()
            code, body = _get(srv.address, "/metrics")
            dt = time.perf_counter() - t0
            assert code == 200
            assert json.loads(body)["status"] == "ok"
            assert dt < 1.0, f"scrape took {dt:.2f}s while a query ran"
            scrapes += 1
            time.sleep(0.05)
        t.join(60)
        assert scrapes >= 3, "query finished before probes could overlap it"
        assert not err
    finally:
        srv.stop()


def test_readiness_reports_failing_check(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    srv = HealthServer(sess).start()
    try:
        sess.storage_dir = str(tmp_path / "gone")  # simulate lost volume
        code, body = _get_code(srv.address, "/health/ready")
        ready = json.loads(body)
        assert code == 503
        assert ready["status"] == "not_ready"
        assert ready["checks"]["storage"] == "missing"
        # liveness is unaffected: the process still serves
        code, _ = _get(srv.address, "/health/live")
        assert code == 200
    finally:
        srv.stop()


def test_wire_connection_gauge(spark, tmp_path):
    from driftdb_spark.server import PgWireServer

    sess = DriftSession(spark, str(tmp_path))
    wire = PgWireServer(sess, port=0).start()
    srv = HealthServer(sess, wire_server=wire).start()
    try:
        code, body = _get(srv.address, "/metrics")
        assert json.loads(body)["wire_connections_active"] == 0

        from tests.test_pgwire import Client

        c = Client(*wire.address)
        c.startup()
        deadline = time.time() + 5
        n = 0
        while time.time() < deadline:
            n = json.loads(_get(srv.address, "/metrics")[1])[
                "wire_connections_active"
            ]
            if n == 1:
                break
            time.sleep(0.05)
        assert n == 1
        code, text = _get(srv.address, "/metrics?format=prometheus")
        assert "driftdb_wire_connections_active 1" in text
        c.close()
    finally:
        srv.stop()
        wire.stop()


# -- alerting (reference alerting.rs + alert_routes.rs) -----------------------


def test_alert_lifecycle_pending_firing_resolved(spark, tmp_path):
    """The reference's state machine (alerting.rs:41-131): breach ->
    pending, held past for_duration -> firing, cleared -> resolved into
    history. Deterministic via injected clock + injected metric."""
    from driftdb_spark.observability import AlertManager, AlertRule

    sess = DriftSession(spark, str(tmp_path / "alert1"))
    now = [1000.0]
    mgr = AlertManager(sess, clock=lambda: now[0])
    gauge = [0.0]
    mgr.metric_providers["queue_depth"] = lambda: gauge[0]
    mgr.add_rule(
        AlertRule("DeepQueue", "queue_depth", "warning", 100.0, ">",
                  for_duration_sec=30.0)
    )

    assert mgr.evaluate() == []  # below threshold
    gauge[0] = 250.0
    now[0] += 1
    (a,) = [x for x in mgr.evaluate() if x["name"] == "DeepQueue"]
    assert a["state"] == "pending" and a["current_value"] == 250.0
    now[0] += 10  # held 10s < 30s: still pending
    (a,) = mgr.evaluate()
    assert a["state"] == "pending"
    now[0] += 25  # held 35s >= 30s: fires
    (a,) = mgr.evaluate()
    assert a["state"] == "firing" and "250.00" in a["message"]
    gauge[0] = 0.0
    now[0] += 1
    assert mgr.evaluate() == []  # resolved
    hist = mgr.history()
    assert hist and hist[-1]["name"] == "DeepQueue"
    assert hist[-1]["state"] == "resolved"


def test_alert_flap_suppression_and_zero_duration(spark, tmp_path):
    from driftdb_spark.observability import AlertManager, AlertRule

    sess = DriftSession(spark, str(tmp_path / "alert2"))
    now = [0.0]
    mgr = AlertManager(sess, clock=lambda: now[0])
    gauge = [0.0]
    mgr.metric_providers["g"] = lambda: gauge[0]
    mgr.add_rule(AlertRule("Flappy", "g", "info", 1.0, ">=",
                           for_duration_sec=60.0))
    mgr.add_rule(AlertRule("Instant", "g", "critical", 5.0, ">=",
                           for_duration_sec=0.0))

    # flapping below for_duration never fires (and never reaches history)
    for _ in range(3):
        gauge[0] = 2.0
        now[0] += 10
        mgr.evaluate()
        gauge[0] = 0.0
        now[0] += 10
        mgr.evaluate()
    assert mgr.history() == []
    # zero-duration rule fires on the evaluation that sees the breach
    gauge[0] = 9.0
    now[0] += 1
    states = {a["name"]: a["state"] for a in mgr.evaluate()}
    assert states["Instant"] == "firing" and states["Flappy"] == "pending"


def test_alert_error_rate_is_a_delta(spark, tmp_path):
    """error_rate_per_sec = d(errors_total)/dt between evaluations (what
    Prometheus rate() computes from the exported counter)."""
    from driftdb_spark.observability import AlertManager, AlertRule

    sess = DriftSession(spark, str(tmp_path / "alert3"))
    now = [100.0]
    mgr = AlertManager(sess, clock=lambda: now[0])
    mgr.add_rule(AlertRule("AnyErrors", "error_rate_per_sec", "critical",
                           0.5, ">", for_duration_sec=0.0))
    mgr.evaluate()  # establishes the baseline sample
    for _ in range(10):
        try:
            sess.sql("SELECT * FROM missing_table_abc")
        except Exception:
            pass
    now[0] += 10  # 10 errors / 10s = 1.0/s > 0.5
    (a,) = [x for x in mgr.evaluate() if x["name"] == "AnyErrors"]
    assert a["state"] == "firing"
    now[0] += 10  # no new errors: rate 0, resolves
    assert [x for x in mgr.evaluate() if x["name"] == "AnyErrors"] == []


def test_alert_http_routes(spark, tmp_path):
    """GET /api/alerts, /api/alerts/history, GET/POST /api/alerts/rules,
    DELETE /api/alerts/rules/:name (reference alert_routes.rs:74-78)."""
    sess = DriftSession(spark, str(tmp_path / "alert4"))
    srv = HealthServer(sess).start()
    try:
        code, body = _get(srv.address, "/api/alerts")
        assert code == 200 and json.loads(body) == []

        code, body = _get(srv.address, "/api/alerts/rules")
        names = {r["name"] for r in json.loads(body)}
        assert {"HighErrorRate", "LowDiskSpace"} <= names

        host, port = srv.address
        req = urllib.request.Request(
            f"http://{host}:{port}/api/alerts/rules",
            data=json.dumps({
                "name": "NoStatements", "metric": "statements_total",
                "severity": "info", "threshold": 1e9, "op": "<",
            }).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 201

        # the new rule breaches immediately (counter < 1e9, duration 0)
        code, body = _get(srv.address, "/api/alerts")
        (a,) = [x for x in json.loads(body) if x["name"] == "NoStatements"]
        assert a["state"] == "firing"

        req = urllib.request.Request(
            f"http://{host}:{port}/api/alerts/rules/NoStatements",
            method="DELETE",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        code, body = _get(srv.address, "/api/alerts")
        assert json.loads(body) == []

        # malformed rule -> 400, unknown delete -> 404
        req = urllib.request.Request(
            f"http://{host}:{port}/api/alerts/rules",
            data=json.dumps({"name": "x", "metric": "m",
                             "threshold": 1, "op": "!~"}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        req = urllib.request.Request(
            f"http://{host}:{port}/api/alerts/rules/nope", method="DELETE"
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
