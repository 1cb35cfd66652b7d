"""Stored procedures — the reference's ProcedureManager, Spark-first.

The reference compiles a procedural language (DECLARE/SET/IF/WHILE/FOR/
EXECUTE/RETURN — procedures.rs:177-236) and interprets it row-at-a-time
(execute_procedure, procedures.rs:533-620); its SQL bridge never wires
``CALL`` (sql_bridge.rs:752 leaves the arm commented out). Here the same
capability splits along Spark's natural seam:

- **SQL-bodied procedures**: an ordered list of SQL statements with named
  ``:param`` markers, executed through :meth:`DriftSession.sql` — so each
  statement gets the full dispatcher (DML-as-events, temporal clauses,
  transaction routing) and Catalyst does the execution. Parameters bind
  via Spark's parameterized SQL, never string interpolation. This covers
  the reference's ``Execute`` statements, which is what its own test
  procedures consist of.
- **Python-bodied procedures**: a callable ``(session, **params)`` for
  control flow (IF/WHILE/FOR). Driving declarative DataFrame plans from
  Python IS the Spark idiom for procedural logic (same pattern as the
  repo's iterative operators — pagerank, connected components), so the
  reference's interpreter loop maps to plain Python that emits
  distributed jobs, not to a row interpreter.

The result of the last statement (or the callable's return) is the CALL
result. SQL-bodied procedures persist in the session catalog like views;
Python bodies are session-scoped (code doesn't belong in a JSON catalog).
"""

from __future__ import annotations

import functools
import re
from typing import Callable

_QUERYLIKE = re.compile(r"^\s*(SELECT|WITH|VALUES|EXPLAIN|TABLE)\b", re.IGNORECASE)


@functools.lru_cache(maxsize=256)
def _MARKER(name: str) -> re.Pattern:
    return re.compile(f":{re.escape(name)}\\b")


def _render_literal(v) -> str:
    """Render one parameter value as a SQL literal for DML statement
    templates. Strings escape backslashes AND embedded quotes — Spark SQL
    processes C-style escapes in string literals, so a bare trailing ``\\``
    would swallow the closing quote (injection vector); everything else
    renders from a fixed type table — there is no raw passthrough."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    from decimal import Decimal

    if isinstance(v, Decimal):
        return str(v)  # exact decimal literal, never quoted
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"'{s}'"


class ProcedureRegistry:
    """Per-session procedure store (reference ProcedureManager,
    procedures.rs:397-460)."""

    def __init__(self, session):
        self._session = session
        self._sql_procs: dict[str, tuple[list[str], list[str]]] = {}
        self._py_procs: dict[str, tuple[list[str], Callable]] = {}

    # -- definition -----------------------------------------------------------

    def create(self, name: str, params: list[str], body) -> None:
        """``body`` is either a list of SQL statement strings (``:param``
        markers bind arguments) or a callable ``(session, **params)``
        (reference create_procedure, procedures.rs:457-500; replacement
        of an existing name follows CREATE OR REPLACE semantics)."""
        if callable(body):
            self._sql_procs.pop(name, None)
            self._py_procs[name] = (list(params), body)
        else:
            stmts = [s for s in (str(s).strip() for s in body) if s]
            if not stmts:
                raise ValueError(f"procedure {name} has an empty body")
            self._py_procs.pop(name, None)
            self._sql_procs[name] = (list(params), stmts)

    def drop(self, name: str) -> None:
        if self._sql_procs.pop(name, None) is None and self._py_procs.pop(
            name, None
        ) is None:
            raise KeyError(f"no such procedure: {name}")

    def names(self) -> list[str]:
        return sorted(set(self._sql_procs) | set(self._py_procs))

    # -- execution ------------------------------------------------------------

    def call(self, name: str, args: dict):
        """Execute a procedure; returns the last statement's result
        (reference execute_procedure, procedures.rs:533-620 — argument
        names are validated against the declared parameter list)."""
        if name in self._py_procs:
            params, fn = self._py_procs[name]
            self._check_args(name, params, args)
            return fn(self._session, **args)
        if name in self._sql_procs:
            params, stmts = self._sql_procs[name]
            self._check_args(name, params, args)
            result = None
            for stmt in stmts:
                bound = {k: v for k, v in args.items() if _MARKER(k).search(stmt)}
                if not bound:
                    result = self._session.sql(stmt)
                elif _QUERYLIKE.match(stmt):
                    # Query statements: Spark's native parameter binding —
                    # values never touch the SQL text.
                    result = self._session.sql(stmt, args=bound)
                else:
                    # DML routes through the event dispatcher, which hands
                    # fragments (VALUES tails, WHERE conditions) to
                    # separate parsers that can't see a binding map — so
                    # parameters become SQL literals via a typed renderer
                    # (quotes escaped by doubling), not raw concatenation.
                    for k, v in bound.items():
                        lit = _render_literal(v)
                        # lambda replacement: re.sub would otherwise
                        # re-process backslashes in the rendered literal.
                        stmt = _MARKER(k).sub(lambda _m: lit, stmt)
                    result = self._session.sql(stmt)
            return result
        raise KeyError(f"no such procedure: {name}")

    @staticmethod
    def _check_args(name: str, params: list[str], args: dict) -> None:
        missing = [p for p in params if p not in args]
        extra = [a for a in args if a not in params]
        if missing or extra:
            raise ValueError(
                f"procedure {name} expects parameters {params}; "
                f"missing={missing} unexpected={extra}"
            )

    # -- catalog persistence ---------------------------------------------------

    def to_catalog(self) -> dict:
        """SQL-bodied procedures only — Python bodies are session-scoped."""
        return {
            name: {"params": params, "body": stmts}
            for name, (params, stmts) in self._sql_procs.items()
        }

    def load_catalog(self, cat: dict) -> None:
        for name, meta in cat.items():
            self._sql_procs[name] = (list(meta["params"]), list(meta["body"]))
