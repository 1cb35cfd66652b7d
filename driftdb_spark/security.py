"""Security-event monitor — the real-event core of the reference's
security monitoring (driftdb-core ``security_monitor.rs``: ThreatEvent /
SuspiciousActivity recording and per-kind counters; driftdb-server
``security_audit.rs``). The reference declares a large taxonomy
(compliance frameworks, behavior baselines, escalation channels) around
four event sources its engine can actually emit; this module records
exactly those real sources and leaves the taxonomy to the tooling that
consumes the log:

- ``auth_failure`` — wire password authentication failed (server.py
  _authenticate; the brute-force signal).
- ``privilege_violation`` — a restricted identity attempted SET/RESET
  SESSION AUTHORIZATION (sqlstate 42501) or a SET ROLE spelling
  (0A000) — the escalation-attempt signal, recorded at the dispatcher
  and wire layers where the refusals happen.
- ``rate_limit_exceeded`` — the token bucket rejected a statement.
- ``cancel_bad_secret`` — a CancelRequest presented a wrong secret for a
  live backend pid (silently ignored per protocol, but worth counting:
  legitimate clients never guess wrong).

Everything is driver-local: a bounded ring of event dicts plus monotonic
per-kind counters. The wire server shares ONE monitor across all
connection sessions (per-connection DriftSessions adopt the base
session's monitor), so counters aggregate server-wide. Counters surface
in ``status_snapshot`` / ``/metrics``, and the alert manager derives
``security_<kind>_rate_per_sec`` metrics from them with a default
brute-force rule (observability.py).
"""

from __future__ import annotations

import threading
import time

__all__ = ["SecurityMonitor"]


class SecurityMonitor:
    CAP = 2000

    def __init__(self, clock=None):
        self._clock = clock or time.time
        self._lock = threading.Lock()  # wire handlers record concurrently
        self._events: list[dict] = []
        self._counters: dict[str, int] = {}

    def record(
        self,
        kind: str,
        actor: str | None = None,
        detail: str | None = None,
        source: str | None = None,
    ) -> None:
        ev = {
            "ts": self._clock(),
            "kind": kind,
            "actor": actor,
            "detail": detail,
            "source": source,
        }
        with self._lock:
            self._counters[kind] = self._counters.get(kind, 0) + 1
            self._events.append(ev)
            if len(self._events) > self.CAP:
                del self._events[: self.CAP // 2]

    def events(self, kind: str | None = None, limit: int = 100) -> list[dict]:
        with self._lock:
            evs = list(self._events)
        if kind is not None:
            evs = [e for e in evs if e["kind"] == kind]
        return evs[-limit:]

    def counters(self) -> dict[str, int]:
        """Monotonic per-kind totals (survive ring trimming)."""
        with self._lock:
            return dict(self._counters)
