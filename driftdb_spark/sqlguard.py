"""SQL injection-pattern guard — the reference's SqlValidator
(driftdb-server security/sql_validator.rs:22-120 validate_query, with
per-category detectors :93-387), as an opt-in wire-boundary monitor.

Positioning matters: this engine's FIRST line against injection is
structural — parameterized statements bind server-side (``args``/$N wire
parameters never interpolate into SQL text), and RLS/RBAC gate what any
identity can reach. A pattern guard is the *defense-in-depth telemetry*
layer for untrusted wire text, so it is opt-in
(``DriftSession.enable_sql_validation``) and scoped to RESTRICTED
identities — the owner and superusers are never second-guessed.

Deliberate deviation, documented: the reference flags any ``UNION [ALL]
SELECT`` (sql_validator.rs:163-220) — which would reject this engine's
own legitimate set-operation queries (setop_union_all et al.). Here the
UNION detector fires only on the quote-adjacent forms (``' UNION``,
``) UNION SELECT NULL``-style probes), which are the actual injection
signature; bare UNION is analytics.

Detections mirror the reference's categories: comment injection, stacked
destructive queries, tautologies, system-command probes, timing attacks,
null bytes, and an oversize cap. Every hit records a security event
(``sql_injection_pattern``); in ``block`` mode the statement is refused
with SQLSTATE 42000.
"""

from __future__ import annotations

import re as _re

MAX_QUERY_LENGTH = 100_000  # sql_validator.rs:16 (100 KB DoS cap)


class SqlRejected(RuntimeError):
    """Statement refused by the injection guard (reference
    security_error path, sql_validator.rs:54-57)."""

    sqlstate = "42000"


_COMMENT_PATTERNS = [
    "'; --", '"; --', "') --", '") --', "'; #", '"; #',
    " OR 1=1--", " OR '1'='1'--", "' --",
]

_STACKED_PATTERNS = [
    "; DROP ", "; DELETE ", "; TRUNCATE", "; EXEC",
    "'; DROP", "'; DELETE", '"; DROP', '"; DELETE',
]

_TAUTOLOGY_PATTERNS = [
    " OR 1=1", " OR '1'='1'", ' OR "1"="1"', " OR 'A'='A'",
    " OR ''=''", " OR TRUE", "WHERE 1=1 AND", "WHERE '1'='1' AND",
]

_SYSTEM_PATTERNS = [
    "XP_CMDSHELL", "LOAD_FILE(", "INTO OUTFILE", "INTO DUMPFILE",
    "COPY (SELECT", "PG_READ_FILE",
]

_TIMING_PATTERNS = [
    "SLEEP(", "PG_SLEEP(", "BENCHMARK(", "WAITFOR DELAY",
]

# quote-adjacent UNION probes (the injection signature; bare UNION is
# legitimate set algebra — see module docstring)
_UNION_RE = _re.compile(r"""['")]\s*UNION\b|\bUNION\s+(ALL\s+)?SELECT\s+NULL\b""")


def inspect(sql: str) -> list[str]:
    """Return the detection categories that fire for this statement
    (empty = clean). Pure function; recording/blocking is the caller's."""
    hits: list[str] = []
    if len(sql) > MAX_QUERY_LENGTH:
        hits.append("oversize")
    if "\x00" in sql:
        hits.append("null_bytes")
    up = sql.upper()
    if any(p in up for p in _COMMENT_PATTERNS):
        hits.append("comment_injection")
    if any(p in up for p in _STACKED_PATTERNS):
        hits.append("stacked_queries")
    if any(p in up for p in _TAUTOLOGY_PATTERNS):
        hits.append("tautology")
    if any(p in up for p in _SYSTEM_PATTERNS):
        hits.append("system_commands")
    if any(p in up for p in _TIMING_PATTERNS):
        hits.append("timing_attack")
    if _UNION_RE.search(up):
        hits.append("union_probe")
    return hits
