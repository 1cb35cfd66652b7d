"""Delta-commit-protocol meta store — the SCALE.md §6 collapse claim,
executable.

SCALE.md §6 claims the local sequence-clock machinery (flock'd
``meta.json`` seq_floor / generation / rewrite_id, plus the rewrite
flock) "collapses into the commit protocol" on a real cluster: the Delta
commit version IS the monotonic clock, rewrites are new commits rather
than directory swaps, and "did a rewrite happen since X" is a
version-range scan of the commit log. delta-spark is not in this
container, so this module proves the mapping with the same on-disk
protocol Delta itself uses (delta.io PROTOCOL.md, "Delta Log Entries"):

- ``_commit_log/00000000000000000001.json`` … — one immutable file per
  commit, named by zero-padded version, exactly Delta's ``_delta_log/``
  layout.
- A commit is claimed by PUT-IF-ABSENT on the next version: the commit
  body is written to scratch and published with ``os.link`` (fails with
  EEXIST if the version is taken — atomic claim-with-content, no torn
  commit file can ever be read). Two racing writers cannot both create
  version N+1; the loser re-reads the log and retries against the
  winner's state — Delta's optimistic-concurrency commit loop, and the
  same monotonic role as the reference's persisted per-table AtomicU64
  (driftdb-core/src/storage/table_storage.rs:212-261).
- ``read()`` FOLDS the commit log: ``seq_floor`` = max over commits,
  ``generation`` = count of rewrite-kind commits, ``rewrite_id`` = the
  last rewrite's id, ``version`` = latest version. The clock cannot
  regress BY CONSTRUCTION: commits are append-only, so a purge-to-empty
  ADDS a rewrite commit — it never removes history from the clock (the
  r10 fuzz-found replica divergence is unrepresentable here).
- ``rewrites_since(v)`` is the consumer-side mapping: replication ship,
  incremental backup, IMV refresh, and the result cache ask "did a
  rewrite land since the version I last saw" — against real Delta that
  is a version-range scan of the commit log; here it reads the same
  per-version files.

Interface-compatible with ``events.JsonFileMetaStore`` (``read()`` /
``bump()``), so ``EventLog(meta_store=CommitLogMetaStore(path))`` runs
the ENTIRE engine — append, purge, replication ship — on the
commit-protocol clock; tests/test_commitlog.py replays the r10
falsifying program on it.
"""

from __future__ import annotations

import json
import os
import uuid

__all__ = ["CommitLogMetaStore"]

_VERSION_WIDTH = 20  # Delta zero-pads commit versions to 20 digits


class CommitLogMetaStore:
    """Sequence-clock/rewrite-generation backend shaped like a Delta
    commit log. See module docstring; drop-in for
    ``events.JsonFileMetaStore``."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.log_dir = os.path.join(table_path, "_commit_log")

    # -- commit-log primitives ------------------------------------------

    def _commit_files(self) -> list[str]:
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            return []
        return sorted(n for n in names if n.endswith(".json"))

    def _read_commit(self, name: str) -> dict:
        with open(os.path.join(self.log_dir, name)) as fh:
            c = json.load(fh)
        c["version"] = int(name[: -len(".json")])
        return c

    def commits(self) -> list[dict]:
        """Every commit, version-ordered — the full commit log."""
        return [self._read_commit(n) for n in self._commit_files()]

    def version(self) -> int:
        """Latest committed version (0 = nothing ever committed) — the
        monotonic clock a Delta table exposes natively."""
        files = self._commit_files()
        return int(files[-1][: -len(".json")]) if files else 0

    def _try_commit(self, version: int, body: dict) -> bool:
        """Claim ``version`` with its content atomically (put-if-absent).
        The body lands in scratch first; ``os.link`` publishes it only if
        the version is unclaimed — a loser gets EEXIST and retries, and a
        crash before the link leaves only invisible scratch (Delta's
        uncommitted files), never a torn commit."""
        os.makedirs(self.log_dir, exist_ok=True)
        name = f"{version:0{_VERSION_WIDTH}d}.json"
        scratch = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex[:12]}")
        with open(scratch, "w") as fh:
            json.dump(body, fh, sort_keys=True)
        try:
            os.link(scratch, os.path.join(self.log_dir, name))
            return True
        except FileExistsError:
            return False  # lost the race; caller re-reads and retries
        finally:
            os.remove(scratch)

    # -- the JsonFileMetaStore interface --------------------------------

    def read(self) -> dict:
        """Fold the commit log into the meta dict consumers expect. Same
        keys as JsonFileMetaStore.read(), plus ``version``."""
        seq_floor, generation, rewrite_id, version = 0, 0, "", 0
        for c in self.commits():
            seq_floor = max(seq_floor, int(c.get("seq_floor", 0)))
            if c.get("kind") == "rewrite":
                generation += 1
                rewrite_id = c.get("rewrite_id", "")
            version = c["version"]
        return {
            "seq_floor": seq_floor,
            "generation": generation,
            "rewrite_id": rewrite_id,
            "version": version,
        }

    def bump(self, seq_floor: int, rewrite: bool = False) -> dict:
        """Advance the clock by APPENDING a commit — the optimistic-
        concurrency loop: read the log, claim version+1, retry on loss.
        No flock anywhere; mutual exclusion is the put-if-absent claim,
        which is exactly what Delta relies on (and why the local rewrite
        flock collapses into this protocol at cluster scale)."""
        while True:
            cur = self.read()
            body = {
                "kind": "rewrite" if rewrite else "append",
                # monotone by construction, but fold defensively anyway
                "seq_floor": max(int(seq_floor), cur["seq_floor"]),
            }
            if rewrite:
                body["rewrite_id"] = uuid.uuid4().hex[:12]
            if self._try_commit(cur["version"] + 1, body):
                return self.read()

    # -- consumer-side rewrite detection --------------------------------

    def rewrites_since(self, version: int) -> list[dict]:
        """Rewrite commits in ``(version, latest]`` — the version-range
        scan replication ship / incremental backup / IMV refresh / the
        result cache run instead of comparing generation integers."""
        return [
            c
            for c in self.commits()
            if c["version"] > version and c.get("kind") == "rewrite"
        ]
