"""HTTP health/metrics endpoint for a served DriftSession.

Re-expresses the reference server's observability surface (driftdb-server
``health.rs:1-272``: /health/live + /health/ready with engine and disk
checks; ``metrics.rs:1-913``: Prometheus counters for queries, latency,
connections, storage; core ``monitoring.rs``) on the Spark engine:

- ``GET /health/live``  — process liveness: always 200 while the thread
  serves (the reference's liveness_check semantics).
- ``GET /health/ready`` — readiness: 200 only if the SparkContext is not
  stopped AND the session's storage dir is accessible; 503 otherwise with
  the failing check named (readiness_check + perform_engine_health_check).
- ``GET /health``       — alias for /health/ready.
- ``GET /metrics``      — JSON counters from DriftSession.status_snapshot()
  plus wire-server connection gauges.
- ``GET /metrics?format=prometheus`` — the same counters in Prometheus
  text exposition format (the reference's metrics_handler content type).

Everything served here is DRIVER-LOCAL state: the scrape path runs zero
Spark jobs and takes no engine locks, so probes stay sub-millisecond while
a 100 TB query occupies every executor — the property that makes it safe
to point a 5-second Kubernetes liveness probe at it. Cluster-level metrics
(executor memory, shuffle volumes, task skew) intentionally stay with the
Spark UI / metrics sink, which already exports them; this endpoint covers
the ENGINE-level counters Spark cannot know about.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict, dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["HealthServer", "AlertRule", "AlertManager"]


def _prometheus(counters: dict) -> str:
    """Flatten the JSON snapshot into Prometheus text exposition format."""
    lines = []

    def emit(name: str, value, labels: dict | None = None):
        if isinstance(value, bool):
            value = int(value)
        if not isinstance(value, (int, float)):
            return
        label_s = (
            "{" + ",".join(f'{k}="{v}"' for k, v in labels.items()) + "}"
            if labels
            else ""
        )
        lines.append(f"driftdb_{name}{label_s} {value}")

    emit("uptime_seconds", counters.get("uptime_sec", 0))
    emit("statements_total", counters.get("statements_total", 0))
    emit("errors_total", counters.get("errors_total", 0))
    for q, v in counters.get("latency_ms", {}).items():
        emit("statement_latency_ms", v, {"quantile": q})
    for verb, n in counters.get("statements_by_verb", {}).items():
        emit("statements_by_verb_total", n, {"verb": verb})
    emit("tables", counters.get("tables", 0))
    emit("views", counters.get("views", 0))
    emit("transaction_open", counters.get("transaction_open", False))
    emit("wire_connections_active", counters.get("wire_connections_active", 0))
    repl = counters.get("replication")
    if repl:
        emit("replication_is_replica", repl.get("role") == "replica")
        emit("replication_max_lag_entries", repl.get("max_lag_entries", 0))
        # None until the first heartbeat: emit() drops non-numerics
        emit("replication_heartbeat_age_sec", repl.get("heartbeat_age_sec"))
        for tbl, n in repl.get("tables", {}).items():
            emit("replication_lag_entries", n, {"table": tbl})
    return "\n".join(lines) + "\n"


class HealthServer:
    """Serve /health/live, /health/ready and /metrics for a DriftSession.

    ``wire_server`` (an optional :class:`driftdb_spark.server.PgWireServer`)
    contributes the active-connection gauge the reference tracks via
    record_connection/record_connection_closed (metrics.rs:591-600).
    """

    def __init__(self, session, host: str = "127.0.0.1", port: int = 0,
                 wire_server=None, replica=None):
        self._session = session
        self._wire = wire_server
        self._replica = replica
        self._started = time.time()
        self.alerts = AlertManager(session, wire_server=wire_server)
        if replica is not None:
            # replication gauges (zero-job manifest reads) feed the
            # HighReplicationLag / CriticalReplicationLag /
            # ReplicationHeartbeatStale default rules
            self.alerts.metric_providers.update(replica.metric_providers())
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            # quiet: probes fire every few seconds, don't spam stderr
            def log_message(self, *a):
                pass

            def _send(self, code: int, body: str, ctype: str):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/health/live":
                    self._send(200, json.dumps({"status": "alive"}),
                               "application/json")
                elif url.path in ("/health", "/health/ready"):
                    ok, checks = outer._readiness()
                    self._send(
                        200 if ok else 503,
                        json.dumps({"status": "ready" if ok else "not_ready",
                                    "checks": checks}),
                        "application/json",
                    )
                elif url.path == "/metrics":
                    counters = outer._counters()
                    fmt = parse_qs(url.query).get("format", ["json"])[0]
                    if fmt == "prometheus":
                        self._send(200, _prometheus(counters),
                                   "text/plain; version=0.0.4")
                    else:
                        self._send(200, json.dumps(counters),
                                   "application/json")
                # performance API (reference performance_routes.rs:36-44)
                elif url.path == "/api/performance":
                    snap = outer._session.status_snapshot()
                    self._send(200, json.dumps({
                        "latency_ms": snap["latency_ms"],
                        "statements_total": snap["statements_total"],
                        "errors_total": snap["errors_total"],
                        "statements_by_verb": snap["statements_by_verb"],
                        **(
                            {"result_cache": snap["result_cache"]}
                            if "result_cache" in snap else {}
                        ),
                    }), "application/json")
                elif url.path == "/api/performance/queries":
                    # slowest statements from the retained window —
                    # driver-local list scan, zero Spark jobs
                    limit = int(parse_qs(url.query).get("limit", ["20"])[0])
                    log = list(outer._session._query_log)
                    log.sort(key=lambda e: -e["wall_ms"])
                    self._send(200, json.dumps(log[:limit]),
                               "application/json")
                # security audit API (reference security_audit.rs /
                # security_monitor.rs event log)
                elif url.path == "/api/security/events":
                    q = parse_qs(url.query)
                    self._send(200, json.dumps(
                        outer._session.security.events(
                            kind=q.get("kind", [None])[0],
                            limit=int(q.get("limit", ["100"])[0]),
                        )), "application/json")
                # alerting API (reference alert_routes.rs:74-78)
                elif url.path == "/api/alerts":
                    self._send(200, json.dumps(outer.alerts.evaluate()),
                               "application/json")
                elif url.path == "/api/alerts/history":
                    limit = int(
                        parse_qs(url.query).get("limit", ["50"])[0]
                    )
                    self._send(200, json.dumps(outer.alerts.history(limit)),
                               "application/json")
                elif url.path == "/api/alerts/rules":
                    self._send(200, json.dumps(outer.alerts.rules()),
                               "application/json")
                else:
                    self._send(404, json.dumps({"error": "not found"}),
                               "application/json")

            def do_POST(self):
                url = urlparse(self.path)
                if url.path != "/api/alerts/rules":
                    self._send(404, json.dumps({"error": "not found"}),
                               "application/json")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    rule = AlertRule(
                        name=body["name"],
                        metric=body["metric"],
                        severity=body.get("severity", "warning"),
                        threshold=float(body["threshold"]),
                        op=body.get("op", ">"),
                        for_duration_sec=float(
                            body.get("for_duration_sec", 0.0)
                        ),
                        message=body.get(
                            "message", AlertRule.message
                        ),
                        labels=body.get("labels"),
                    )
                    rule.breached(0.0)  # validates op
                    outer.alerts.add_rule(rule)
                    self._send(201, json.dumps({"ok": True,
                                                "rule": rule.to_dict()}),
                               "application/json")
                except (KeyError, ValueError, TypeError,
                        json.JSONDecodeError) as exc:
                    self._send(400, json.dumps(
                        {"error": f"bad rule: {exc}"}), "application/json")

            def do_DELETE(self):
                url = urlparse(self.path)
                prefix = "/api/alerts/rules/"
                if url.path.startswith(prefix):
                    name = url.path[len(prefix):]
                    if outer.alerts.remove_rule(name):
                        self._send(200, json.dumps({"ok": True}),
                                   "application/json")
                    else:
                        self._send(404, json.dumps(
                            {"error": f"no rule named {name!r}"}),
                            "application/json")
                else:
                    self._send(404, json.dumps({"error": "not found"}),
                               "application/json")

        self._http = ThreadingHTTPServer((host, port), _Handler)
        self._http.daemon_threads = True
        self._thread: threading.Thread | None = None

    # -- state assembly (no Spark jobs, no locks) ------------------------

    def _readiness(self) -> tuple[bool, dict]:
        checks = {}
        try:
            sc = self._session.spark.sparkContext
            stopped = sc._jsc is None or sc._jsc.sc().isStopped()
            checks["spark"] = "ok" if not stopped else "stopped"
        except Exception as exc:  # pragma: no cover - defensive
            checks["spark"] = f"error: {exc}"
        try:
            checks["storage"] = (
                "ok" if os.path.isdir(self._session.storage_dir) else "missing"
            )
        except Exception as exc:  # pragma: no cover - defensive
            checks["storage"] = f"error: {exc}"
        return all(v == "ok" for v in checks.values()), checks

    def _counters(self) -> dict:
        snap = self._session.status_snapshot()
        snap["health_uptime_sec"] = round(time.time() - self._started, 3)
        if self._wire is not None:
            backends = getattr(self._wire._tcp, "_backends", None)
            snap["wire_connections_active"] = (
                len(backends) if backends is not None else 0
            )
        if self._replica is not None:
            snap["replication"] = {
                "role": "primary" if self._replica.promoted else "replica",
                **self._replica.lag_entries(),
            }
        return snap

    # -- lifecycle -------------------------------------------------------

    @property
    def address(self) -> tuple[str, int]:
        return self._http.server_address

    def start(self) -> "HealthServer":
        self._thread = threading.Thread(
            target=self._http.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._http.shutdown()
        self._http.server_close()


# -- alerting (reference driftdb-server alerting.rs:1-824 + alert_routes.rs) --


@dataclass
class AlertRule:
    """Threshold rule (reference AlertRule, alerting.rs:134-150). The
    reference switches on the rule NAME to pick a metric
    (evaluate_rule, alerting.rs:411-426); here the metric key is an
    explicit field, so user-posted rules can target any provided metric
    instead of a hard-coded name list."""

    name: str
    metric: str
    severity: str  # info | warning | critical (AlertSeverity)
    threshold: float
    op: str  # > >= < <= ==  (ComparisonOperator)
    for_duration_sec: float = 0.0
    message: str = "{metric} = {value} (threshold {op} {threshold})"
    labels: dict | None = None

    def breached(self, value: float) -> bool:
        return {
            ">": value > self.threshold,
            ">=": value >= self.threshold,
            "<": value < self.threshold,
            "<=": value <= self.threshold,
            "==": value == self.threshold,
        }[self.op]

    def to_dict(self) -> dict:
        return asdict(self)


class AlertManager:
    """Rule evaluation with the reference's pending → firing → resolved
    lifecycle (alerting.rs:41-131): a breach creates a PENDING alert
    stamped with first-seen time; it FIRES only once the breach has held
    for ``for_duration_sec`` (flap suppression); a clean evaluation
    resolves it (firing alerts land in the bounded history). The
    reference evaluates on a 30 s background thread
    (AlertManagerConfig.evaluation_interval); here evaluation runs on
    each scrape of the /api/alerts routes — a monitor polls anyway, the
    signal is identical, and the server carries no extra thread. All
    metric inputs are DRIVER-LOCAL (status_snapshot counters, disk_usage,
    wire gauges): evaluating alerts runs zero Spark jobs, so the alert
    path stays responsive while a 100 TB query holds the executors.

    Rate metrics (errors/sec, statements/sec) are deltas between
    consecutive evaluations, exactly what a Prometheus ``rate()`` would
    compute from the counters this module already exports. ``clock`` is
    injectable for deterministic tests (the TokenBucket discipline)."""

    HISTORY_CAP = 200

    def __init__(self, session, wire_server=None, clock=None):
        self._session = session
        self._wire = wire_server
        self._clock = clock or time.monotonic
        self._rules: dict[str, AlertRule] = {}
        self._active: dict[str, dict] = {}  # rule name -> alert dict
        self._history: list[dict] = []
        self._prev: dict | None = None  # (t, statements_total, errors_total)
        self.metric_providers: dict = {}  # name -> () -> float (extensible)
        for r in self._default_rules():
            self._rules[r.name] = r

    @staticmethod
    def _default_rules() -> list["AlertRule"]:
        # the reference's defaults (register_default_rules,
        # alerting.rs:231-378) restricted to metrics that exist on this
        # engine: error rate, latency, disk, pool, replication; CPU rules
        # have no counterpart (host CPU/memory belong to the cluster
        # manager / Spark metrics sink). Replication metrics appear only
        # when a Replica is attached (HealthServer(replica=...)); absent
        # metric -> the rules skip, same as the pool family.
        return [
            AlertRule(
                "HighErrorRate", "error_rate_per_sec", "critical",
                10.0, ">", 60.0,
                "High error rate detected: {value} errors/sec "
                "(threshold: {threshold})",
                {"type": "error_rate"},
            ),
            AlertRule(
                "HighP95Latency", "p95_latency_ms", "warning",
                5000.0, ">", 120.0,
                "p95 statement latency high: {value} ms "
                "(threshold: {threshold})",
                {"type": "latency"},
            ),
            AlertRule(
                "LowDiskSpace", "disk_free_percent", "warning",
                10.0, "<", 60.0,
                "Low disk space: {value}% free (threshold: {threshold}%)",
                {"type": "disk"},
            ),
            AlertRule(
                "CriticalDiskSpace", "disk_free_percent", "critical",
                5.0, "<", 30.0,
                "CRITICAL: disk space: {value}% free",
                {"type": "disk"},
            ),
            # pool family (reference alerting.rs:266-292): only evaluates
            # when a wire server with max_connections is attached — the
            # metric is absent otherwise and the rules skip
            AlertRule(
                "PoolNearExhaustion", "wire_connection_utilization_percent",
                "warning", 90.0, ">", 120.0,
                "Connection pool utilization high: {value}% "
                "(threshold: {threshold}%)",
                {"type": "pool"},
            ),
            AlertRule(
                "PoolExhausted", "wire_connection_utilization_percent",
                "critical", 100.0, ">=", 30.0,
                "CRITICAL: Connection pool exhausted!",
                {"type": "pool"},
            ),
            # replication family (reference alerting.rs:246-266; lag there
            # is WAL bytes, here shipped-but-unapplied log entries — the
            # unit the log-shipping design actually moves)
            AlertRule(
                "HighReplicationLag", "replication_max_lag_entries",
                "warning", 50.0, ">", 120.0,
                "Replication lag is high: {value} entries "
                "(threshold: {threshold})",
                {"type": "replication"},
            ),
            AlertRule(
                "CriticalReplicationLag", "replication_max_lag_entries",
                "critical", 500.0, ">", 60.0,
                "CRITICAL: replication lag {value} entries",
                {"type": "replication"},
            ),
            AlertRule(
                "ReplicationHeartbeatStale", "replication_heartbeat_age_sec",
                "critical", 300.0, ">", 0.0,
                "Primary heartbeat stale: {value}s old "
                "(failover threshold candidates should check maybe_promote)",
                {"type": "replication"},
            ),
            # brute-force signal (reference security_monitor.rs failed-
            # login tracking): sustained wire auth failures
            AlertRule(
                "HighAuthFailureRate", "security_auth_failure_rate_per_sec",
                "critical", 1.0, ">", 60.0,
                "Sustained authentication failures: {value}/sec "
                "(threshold: {threshold})",
                {"type": "security"},
            ),
        ]

    # -- rule management (alert_routes.rs add_rule/delete_rule) ----------

    def add_rule(self, rule: AlertRule) -> None:
        self._rules[rule.name] = rule

    def remove_rule(self, name: str) -> bool:
        self._active.pop(name, None)
        return self._rules.pop(name, None) is not None

    def rules(self) -> list[dict]:
        return [r.to_dict() for r in self._rules.values()]

    # -- metric assembly (driver-local) ----------------------------------

    def _metrics(self) -> dict:
        now = self._clock()
        snap = self._session.status_snapshot()
        vals = {
            "p95_latency_ms": snap["latency_ms"]["p95"],
            "statements_total": float(snap["statements_total"]),
            "errors_total": float(snap["errors_total"]),
        }
        sec = snap.get("security_events", {})
        prev = self._prev
        self._prev = (now, snap["statements_total"], snap["errors_total"], sec)
        if prev is not None and now > prev[0]:
            dt = now - prev[0]
            vals["statement_rate_per_sec"] = (
                snap["statements_total"] - prev[1]
            ) / dt
            vals["error_rate_per_sec"] = (snap["errors_total"] - prev[2]) / dt
            for kind in set(sec) | set(prev[3]):
                vals[f"security_{kind}_rate_per_sec"] = (
                    sec.get(kind, 0) - prev[3].get(kind, 0)
                ) / dt
        else:
            vals["statement_rate_per_sec"] = 0.0
            vals["error_rate_per_sec"] = 0.0
            for kind in sec:
                vals[f"security_{kind}_rate_per_sec"] = 0.0
        try:
            import shutil as _shutil

            du = _shutil.disk_usage(self._session.storage_dir)
            vals["disk_free_percent"] = round(du.free / du.total * 100, 3)
        except OSError:
            pass
        if self._wire is not None:
            backends = getattr(self._wire._tcp, "_backends", None)
            vals["wire_connections_active"] = float(
                len(backends) if backends is not None else 0
            )
            maxc = getattr(self._wire._tcp, "max_connections", None)
            if maxc:
                vals["wire_connection_utilization_percent"] = round(
                    self._wire._tcp.active_connections() / maxc * 100, 3
                )
        for name, fn in self.metric_providers.items():
            try:
                vals[name] = float(fn())
            except Exception:
                pass
        return vals

    # -- evaluation (alerting.rs evaluate_rules/fire/resolve) ------------

    def evaluate(self) -> list[dict]:
        now = self._clock()
        vals = self._metrics()
        for rule in list(self._rules.values()):
            value = vals.get(rule.metric)
            if value is None:
                continue
            if rule.breached(value):
                alert = self._active.get(rule.name)
                if alert is None:
                    alert = {
                        "name": rule.name,
                        "severity": rule.severity,
                        "state": "pending",
                        "metric": rule.metric,
                        "threshold": rule.threshold,
                        "labels": rule.labels or {},
                        "first_breach": now,
                        "fired_at": None,
                    }
                    self._active[rule.name] = alert
                alert["current_value"] = value
                alert["message"] = (
                    rule.message.replace("{value}", f"{value:.2f}")
                    .replace("{threshold}", f"{rule.threshold:.2f}")
                    .replace("{metric}", rule.metric)
                    .replace("{op}", rule.op)
                )
                if (
                    alert["state"] == "pending"
                    and now - alert["first_breach"] >= rule.for_duration_sec
                ):
                    alert["state"] = "firing"
                    alert["fired_at"] = now
            else:
                alert = self._active.pop(rule.name, None)
                if alert is not None and alert["state"] == "firing":
                    alert["state"] = "resolved"
                    alert["resolved_at"] = now
                    self._history.append(alert)
                    del self._history[: -self.HISTORY_CAP]
        return self.active_alerts()

    def active_alerts(self) -> list[dict]:
        return sorted(self._active.values(), key=lambda a: a["name"])

    def history(self, limit: int = 50) -> list[dict]:
        return list(self._history[-limit:])
