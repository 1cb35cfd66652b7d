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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["HealthServer"]


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
    return "\n".join(lines) + "\n"


class HealthServer:
    """Serve /health/live, /health/ready and /metrics for a DriftSession.

    ``wire_server`` (an optional :class:`driftdb_spark.server.PgWireServer`)
    contributes the active-connection gauge the reference tracks via
    record_connection/record_connection_closed (metrics.rs:591-600).
    """

    def __init__(self, session, host: str = "127.0.0.1", port: int = 0,
                 wire_server=None):
        self._session = session
        self._wire = wire_server
        self._started = time.time()
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
