"""Table constraints — UNIQUE / CHECK / NOT NULL, Spark-first.

The reference has a full constraint model — ``Unique { columns }``,
``Check { expression, compiled_expr }``, ``NotNull { column }``
(crates/driftdb-core/src/constraints.rs:10-34) — and registers inline
``UNIQUE`` as an implicit unique index at CREATE TABLE
(sql_bridge.rs:5748-5751, :6150).

Here each constraint compiles to a *distributed validation plan* run
against the staged batch before anything publishes, instead of the
reference's row-at-a-time interpreter:

- **NOT NULL**: one ``isNull`` filter per declared column — a map-only
  plan, no shuffle.
- **CHECK**: the expression string goes straight to Catalyst as a filter
  (``expr IS FALSE`` is the violation — SQL semantics pass on TRUE *and*
  NULL, exactly PostgreSQL / the reference's tri-state evaluate).
- **UNIQUE**: a semi-join of the batch's key tuples against current state
  plus a within-batch ``groupBy().count()>1`` check — the same anti-join
  shape as the existing PK-uniqueness gate, generalized to declared
  column lists. SQL UNIQUE admits multiple NULLs (NULL ≠ NULL), which the
  plain equality join gives for free: a NULL key never matches.

All checks are batch-level DataFrame jobs: O(batch ⋈ state) with the
state side reduced to the key columns, so at 100 TB the join is on a
projected, shuffle-pruned key set — never a driver-side row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    """A staged batch violates a declared table constraint; nothing was
    published (reference returns its constraint error before applying
    events, constraints.rs validate paths)."""


@dataclass
class TableConstraints:
    """Declared constraints of one table (reference ConstraintType,
    constraints.rs:10-34; PK and FK live elsewhere in the session)."""

    uniques: list[list[str]] = field(default_factory=list)
    checks: list[tuple[str, str]] = field(default_factory=list)  # (name, expr)
    not_null: list[str] = field(default_factory=list)

    def is_empty(self) -> bool:
        return not (self.uniques or self.checks or self.not_null)

    def to_catalog(self) -> dict:
        return {
            "uniques": [list(u) for u in self.uniques],
            "checks": [list(c) for c in self.checks],
            "not_null": list(self.not_null),
        }

    @classmethod
    def from_catalog(cls, meta: dict) -> "TableConstraints":
        return cls(
            uniques=[list(u) for u in meta.get("uniques", [])],
            checks=[(c[0], c[1]) for c in meta.get("checks", [])],
            not_null=list(meta.get("not_null", [])),
        )


def check_not_null(table: str, cons: TableConstraints, rows: DataFrame) -> None:
    """Reject the batch if any declared NOT NULL column holds a NULL
    (reference constraints.rs NotNull validation)."""
    for col in cons.not_null:
        if col not in rows.columns:
            # An INSERT whose column list omits a NOT NULL column writes
            # NULL for it — same violation, caught before staging.
            if rows.isEmpty():
                continue
            raise ConstraintViolation(
                f'null value in column "{col}" of relation "{table}" '
                f"violates not-null constraint"
            )
        if not rows.filter(F.col(col).isNull()).isEmpty():
            raise ConstraintViolation(
                f'null value in column "{col}" of relation "{table}" '
                f"violates not-null constraint"
            )


def check_checks(table: str, cons: TableConstraints, rows: DataFrame) -> None:
    """Reject the batch if any CHECK expression evaluates to FALSE for a
    row. NULL passes (SQL / PostgreSQL / reference tri-state)."""
    for name, expr in cons.checks:
        if not rows.filter(~F.coalesce(F.expr(expr), F.lit(True))).isEmpty():
            raise ConstraintViolation(
                f'new row for relation "{table}" violates check '
                f'constraint "{name}"'
            )


def check_unique_insert(
    table: str,
    cons: TableConstraints,
    rows: DataFrame,
    state: DataFrame,
) -> None:
    """Reject the batch if a declared UNIQUE key tuple already exists in
    ``state`` or repeats within the batch. Equality join ⇒ NULL keys never
    collide (SQL UNIQUE semantics)."""
    for cols in cons.uniques:
        if any(c not in rows.columns for c in cols):
            continue
        batch_keys = rows.select(
            *[F.col(c).cast("string").alias(f"_u_{c}") for c in cols]
        )
        state_keys = state.select(
            *[F.col(c).cast("string").alias(f"_s_{c}") for c in cols]
        )
        cond = None
        for c in cols:
            eq = F.col(f"_u_{c}") == F.col(f"_s_{c}")
            cond = eq if cond is None else (cond & eq)
        clash = batch_keys.join(state_keys, cond, "left_semi")
        dup_within = (
            batch_keys.na.drop()
            .groupBy(*[f"_u_{c}" for c in cols])
            .count()
            .filter(F.col("count") > 1)
        )
        if not clash.isEmpty() or not dup_within.isEmpty():
            raise ConstraintViolation(
                f"duplicate key value violates unique constraint on "
                f'table "{table}": key ({", ".join(cols)})'
            )


def validate_insert(
    table: str,
    cons: TableConstraints,
    rows: DataFrame,
    state: DataFrame,
) -> None:
    """Full constraint gate for an INSERT batch, run before any event
    publishes (all-or-nothing, like the PK/FK gates)."""
    check_not_null(table, cons, rows)
    check_checks(table, cons, rows)
    check_unique_insert(table, cons, rows, state)


def validate_update(
    table: str,
    cons: TableConstraints,
    state: DataFrame,
    condition: str,
    assignments: dict[str, str],
    schema_cols: dict[str, str],
) -> None:
    """Constraint gate for UPDATE: evaluate the post-update rows (old row
    with assignments applied, exactly the engine's own Patch semantics)
    and validate NOT NULL / CHECK on them; UNIQUE keys that involve an
    assigned column are checked against the *survivors* (rows the
    condition does not touch) and within the updated set. Runs before the
    Patch events stage, so a violation leaves state untouched."""
    touched = set(assignments)
    narrowed = TableConstraints(
        # A UNIQUE/NOT NULL constraint can only break if an assigned
        # column participates; CHECK expressions are not column-parsed,
        # so they re-validate on every UPDATE of a checked table.
        uniques=[u for u in cons.uniques if touched & set(u)],
        checks=list(cons.checks),
        not_null=[c for c in cons.not_null if c in touched],
    )
    if narrowed.is_empty():
        return
    matching = state.filter(condition)
    updated = matching.select(
        *[
            F.expr(str(assignments[c])).alias(c) if c in assignments else F.col(c)
            for c in schema_cols
        ]
    )
    check_not_null(table, narrowed, updated)
    check_checks(table, narrowed, updated)
    if narrowed.uniques:
        survivors = state.filter(~F.coalesce(F.expr(condition), F.lit(False)))
        check_unique_insert(table, narrowed, updated, survivors)
