"""Schema migrations — the reference's MigrationManager, Spark-first.

The reference tracks semver-ordered migrations with checksums, an
applied-ledger, up/down scripts, dry-run, and migrate_all
(migration.rs:22-163 model, :245-283 ordering/pending, :285-498
apply/rollback/migrate_all, :724-746 status).

Here a migration's ``up``/``down`` are ordered lists of SQL statements
executed through :meth:`DriftSession.sql` — so they get the full
dispatcher (CREATE/ALTER TABLE, DML-as-events, policies, procedures) and
each DML statement lands as an atomic event batch. The applied ledger is
a JSON file under the storage dir (like the catalog); checksums pin the
statement text so silently edited history is detected, exactly the
reference's validate_checksum contract (migration.rs:148-153).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field


def _parse_version(v: str) -> tuple[int, ...]:
    try:
        return tuple(int(x) for x in v.split("."))
    except ValueError as exc:
        raise ValueError(f"bad version {v!r} (want e.g. '1.0.2')") from exc


@dataclass
class Migration:
    version: str
    description: str
    up: list[str]
    down: list[str] = field(default_factory=list)

    @property
    def checksum(self) -> str:
        h = hashlib.sha256()
        for s in self.up:
            h.update(s.strip().encode())
            h.update(b"\0")
        return h.hexdigest()


class MigrationManager:
    """Versioned migration runner over one DriftSession."""

    LEDGER = "_migrations.json"

    def __init__(self, session):
        self._session = session
        self._migrations: dict[str, Migration] = {}

    # -- registration ---------------------------------------------------------

    def add(self, migration: Migration) -> None:
        _parse_version(migration.version)
        existing = self._migrations.get(migration.version)
        if existing and existing.checksum != migration.checksum:
            raise ValueError(
                f"migration {migration.version} re-registered with different content"
            )
        applied = self._ledger().get(migration.version)
        if applied and applied["checksum"] != migration.checksum:
            raise ValueError(
                f"migration {migration.version} was applied with a different "
                "checksum; history has been edited"
            )
        self._migrations[migration.version] = migration

    # -- ledger ---------------------------------------------------------------

    def _ledger_path(self) -> str:
        return os.path.join(self._session.storage_dir, self.LEDGER)

    def _ledger(self) -> dict:
        if not os.path.exists(self._ledger_path()):
            return {}
        with open(self._ledger_path()) as fh:
            return json.load(fh)

    def _save_ledger(self, ledger: dict) -> None:
        os.makedirs(self._session.storage_dir, exist_ok=True)
        tmp = self._ledger_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ledger, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._ledger_path())

    # -- introspection --------------------------------------------------------

    def current_version(self) -> str | None:
        applied = self._ledger()
        if not applied:
            return None
        return max(applied, key=_parse_version)

    def pending(self) -> list[Migration]:
        applied = self._ledger()
        return sorted(
            (m for v, m in self._migrations.items() if v not in applied),
            key=lambda m: _parse_version(m.version),
        )

    def status(self) -> dict:
        return {
            "current_version": self.current_version(),
            "applied": sorted(self._ledger(), key=_parse_version),
            "pending": [m.version for m in self.pending()],
        }

    # -- apply / rollback ------------------------------------------------------

    def migrate_all(self, dry_run: bool = False) -> list[str]:
        """Apply every pending migration in version order (reference
        migrate_all, migration.rs:489-520). Dry run lists without
        executing. Returns applied versions."""
        done = []
        for m in self.pending():
            if not dry_run:
                for stmt in m.up:
                    self._session.sql(stmt)
                ledger = self._ledger()
                ledger[m.version] = {
                    "description": m.description,
                    "checksum": m.checksum,
                    "applied_unix": time.time(),
                }
                self._save_ledger(ledger)
            done.append(m.version)
        return done

    def rollback(self, version: str) -> None:
        """Run the migration's down script and drop it from the ledger.
        Only the topmost applied migration may roll back (the reference
        enforces the same ordering, migration.rs:465-487)."""
        if version != self.current_version():
            raise ValueError(
                f"only the topmost applied migration ({self.current_version()}) "
                "can be rolled back"
            )
        m = self._migrations.get(version)
        if m is None:
            raise KeyError(f"migration {version} not registered in this session")
        if not m.down:
            raise ValueError(f"migration {version} has no down script")
        for stmt in m.down:
            self._session.sql(stmt)
        ledger = self._ledger()
        del ledger[version]
        self._save_ledger(ledger)
