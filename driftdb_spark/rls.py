"""Row-level security — the reference's RlsManager, Spark-first.

The reference evaluates per-table policies row-at-a-time inside its
executor (row_level_security.rs:25-130 policy model, :289-450
check_access): SELECT rows are filtered by the OR of applicable
*permissive* USING expressions AND every *restrictive* one, writes are
gated by WITH CHECK, superusers bypass, and RLS must be enabled per
table.

Here the same model compiles to *predicates on the table's state view*:
at query registration the session conjoins/disjoins the applicable
policy expressions into one Catalyst filter, so enforcement is a plan
node — pushed down, codegen'd, zero per-row Python — rather than an
interpreter check. That is also how Spark deployments actually do RLS
(view-based row filters; Unity Catalog row filters compile the same
way).

Semantics (PostgreSQL, which the reference mirrors):
- RLS enabled + no applicable permissive policy → default deny (empty).
- Policies name a ``roles`` list; a policy applies if the context shares
  a role (empty list = applies to everyone).
- The expression may reference the marker ``current_user``; it binds as
  a string literal of the context's username at enforcement time (the
  reference substitutes its SecurityContext variables the same way).
- A ``None`` security context is the embedded-engine owner: bypass —
  matching the reference's owner/superuser bypass (:289-310).

Enforcement points: SELECT via the session's registered state views;
INSERT via the WITH CHECK gate; UPDATE/DELETE by conjoining the USING
predicate into the statement's WHERE — rows you cannot see you cannot
touch. Enforcement lives at the session SQL surface (the reference
enforces in sql_bridge, not in storage); direct EventLog API access is
the storage layer and is not gated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class RlsDenied(PermissionError):
    """A write violated a WITH CHECK policy."""


@dataclass
class Policy:
    name: str
    table: str
    action: str = "all"  # select | insert | update | delete | all
    check: str = "permissive"  # permissive (OR) | restrictive (AND)
    roles: list[str] = field(default_factory=list)  # empty = everyone
    using_expr: str | None = None  # read filter
    check_expr: str | None = None  # write gate (defaults to using_expr)

    def applies_to(self, action: str, ctx: "SecurityContext") -> bool:
        if self.action not in ("all", action):
            return False
        if self.roles and not (set(self.roles) & set(ctx.roles) or ctx.username in self.roles):
            return False
        return True


@dataclass
class SecurityContext:
    username: str
    roles: list[str] = field(default_factory=list)
    is_superuser: bool = False


_USER_MARKER = re.compile(r"\bcurrent_user\b")


def _bind_user(expr: str, ctx: SecurityContext) -> str:
    # Backslashes escape too: Spark SQL string literals process C-style
    # escapes, so a username ending in "\" would otherwise swallow the
    # closing quote and corrupt the compiled predicate.
    escaped = ctx.username.replace("\\", "\\\\").replace("'", "''")
    literal = "'" + escaped + "'"
    return _USER_MARKER.sub(lambda _m: literal, expr)


class RlsManager:
    """Per-session policy store (reference RlsManager,
    row_level_security.rs:174-288)."""

    def __init__(self):
        self._policies: dict[str, dict[str, Policy]] = {}  # table -> name -> Policy
        self._enabled: set[str] = set()

    # -- DDL ------------------------------------------------------------------

    def enable(self, table: str) -> None:
        self._enabled.add(table)

    def disable(self, table: str) -> None:
        self._enabled.discard(table)

    def is_enabled(self, table: str) -> bool:
        return table in self._enabled

    def create_policy(self, policy: Policy) -> None:
        tbl = self._policies.setdefault(policy.table, {})
        if policy.name in tbl:
            raise ValueError(
                f"policy {policy.name} already exists on {policy.table}"
            )
        tbl[policy.name] = policy

    def drop_policy(self, table: str, name: str) -> None:
        if name not in self._policies.get(table, {}):
            raise KeyError(f"no such policy: {name} on {table}")
        del self._policies[table][name]

    def policies(self, table: str) -> list[Policy]:
        return list(self._policies.get(table, {}).values())

    # -- predicate compilation -------------------------------------------------

    def read_predicate(self, table: str, ctx: SecurityContext | None, action: str = "select") -> str | None:
        """The compiled filter for a read (or the USING half of a write):
        ``(OR of permissive USING) AND (each restrictive USING)``.
        ``None`` = unrestricted; ``"false"`` = default deny."""
        if ctx is None or ctx.is_superuser or not self.is_enabled(table):
            return None
        perm, restr = [], []
        for p in self.policies(table):
            if not p.applies_to(action, ctx) or p.using_expr is None:
                continue
            (perm if p.check == "permissive" else restr).append(
                "(" + _bind_user(p.using_expr, ctx) + ")"
            )
        if not perm:
            return "false"  # RLS on, nothing grants visibility: deny
        clauses = ["(" + " OR ".join(perm) + ")"] + restr
        return " AND ".join(clauses)

    def check_predicate(
        self, table: str, ctx: SecurityContext | None, action: str = "insert"
    ) -> str | None:
        """WITH CHECK gate for writes (INSERT, and the post-image of
        UPDATE — PostgreSQL applies WITH CHECK to the NEW row of both, as
        does the reference's check_access): same combination shape, using
        each policy's check_expr (falling back to its USING expr, as
        PostgreSQL does)."""
        if ctx is None or ctx.is_superuser or not self.is_enabled(table):
            return None
        perm, restr = [], []
        for p in self.policies(table):
            if not p.applies_to(action, ctx):
                continue
            expr = p.check_expr or p.using_expr
            if expr is None:
                continue
            (perm if p.check == "permissive" else restr).append(
                "(" + _bind_user(expr, ctx) + ")"
            )
        if not perm:
            return "false"
        clauses = ["(" + " OR ".join(perm) + ")"] + restr
        return " AND ".join(clauses)

    # -- catalog persistence ---------------------------------------------------

    def to_catalog(self) -> dict:
        return {
            "enabled": sorted(self._enabled),
            "policies": [
                {
                    "name": p.name,
                    "table": p.table,
                    "action": p.action,
                    "check": p.check,
                    "roles": p.roles,
                    "using_expr": p.using_expr,
                    "check_expr": p.check_expr,
                }
                for tbl in self._policies.values()
                for p in tbl.values()
            ],
        }

    def load_catalog(self, cat: dict) -> None:
        self._enabled = set(cat.get("enabled", []))
        for meta in cat.get("policies", []):
            self._policies.setdefault(meta["table"], {})[meta["name"]] = Policy(**meta)
