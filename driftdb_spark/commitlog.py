"""Delta-commit-protocol meta store — the SCALE.md §6 collapse claim,
executable.

SCALE.md §6 claims the local sequence-clock machinery (flock'd
``meta.json`` seq_floor / generation / rewrite_id, plus the rewrite
flock) "collapses into the commit protocol" on a real cluster: the Delta
commit version IS the monotonic clock, rewrites are new commits rather
than directory swaps, and "did a rewrite happen since X" is a
version-range scan of the commit log. delta-spark is not in this
container, so this module proves the mapping with the same on-disk
protocol Delta itself uses (delta.io PROTOCOL.md, "Delta Log Entries" +
"Checkpoints"):

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
- A commit body may carry Delta-style FILE ACTIONS: ``adds`` (batch
  entries this commit published) and ``removes`` (entries a rewrite
  retired). ``entries_at(v)`` folds them, answering "what published
  entries existed at version V" from the log alone — Delta's
  add-file/remove-file reconstruction.
- Every ``CHECKPOINT_INTERVAL`` commits the winner also writes
  ``<version>.checkpoint.json`` — the folded state as of that version
  (clock AND entry set) — so ``read()`` opens at most one checkpoint
  plus the commits after it, exactly Delta's checkpoint mechanism
  (without it, per-read work grows with table lifetime: O(n) files per
  read, O(n²) over a table's life). Checkpoints are pure acceleration:
  losing one only means folding more commits.
- ``prune()`` is the retention lifecycle (Delta's metadata cleanup,
  ``delta.logRetentionDuration``; the reference's analogous lifecycle is
  segment rotation, table_storage.rs:212-261): commit files at-or-below
  the latest checkpoint are folded into it and can be removed, which
  keeps ``read()``'s directory listing bounded instead of growing one
  dirent per commit forever. Pruning never creates an UNCOVERED gap —
  with no checkpoint it removes nothing.
- ``read()`` folds checkpoint + tail: ``seq_floor`` = max over commits,
  ``generation`` = count of rewrite-kind commits, ``rewrite_id`` = the
  last rewrite's id, ``version`` = latest version, ``entries`` = the
  add/remove fold. The clock cannot regress BY CONSTRUCTION: commits are
  append-only, so a purge-to-empty ADDS a rewrite commit — it never
  removes history from the clock (the r10 fuzz-found replica divergence
  is unrepresentable here).
- ``rewrites_since(v)`` is the consumer-side mapping: replication ship,
  incremental backup, IMV refresh, and the result cache ask "did a
  rewrite land since the version I last saw" — against real Delta that
  is a version-range scan of the commit log; here it reads the same
  per-version files. History gaps (retention pruning, manual deletion)
  are answered CONSERVATIVELY, never silently.

Interface-compatible with ``events.JsonFileMetaStore`` (``read()`` /
``bump()`` / ``exists()``), so
``EventLog(meta_store=CommitLogMetaStore(path))`` runs the ENTIRE engine
— append, purge, replication ship — on the commit-protocol clock;
tests/test_commitlog.py replays the r10 falsifying program on it.
"""

from __future__ import annotations

import json
import os
import uuid

__all__ = ["CommitLogMetaStore"]

_VERSION_WIDTH = 20  # Delta zero-pads commit versions to 20 digits

#: write a checkpoint every N commits (Delta's default cadence is 10)
CHECKPOINT_INTERVAL = 10

_EMPTY = {"seq_floor": 0, "generation": 0, "rewrite_id": "", "version": 0}

#: how many times a fold re-lists the directory when a concurrent
#: prune() removes a listed file mid-read. Each retry only loses to
#: ANOTHER prune landing inside the retry window, so consecutive losses
#: are geometrically unlikely; the bound exists to guarantee termination.
_LIST_RETRIES = 6


class CommitLogMetaStore:
    """Sequence-clock/rewrite-generation backend shaped like a Delta
    commit log. See module docstring; drop-in for
    ``events.JsonFileMetaStore``."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.log_dir = os.path.join(table_path, "_commit_log")

    # -- commit-log primitives ------------------------------------------

    def _list(self) -> list[str]:
        try:
            return sorted(os.listdir(self.log_dir))
        except FileNotFoundError:
            return []

    def _commit_files(self, names: list[str] | None = None) -> list[str]:
        return [
            n
            for n in (self._list() if names is None else names)
            if n.endswith(".json") and not n.endswith(".checkpoint.json")
        ]

    def _checkpoint_files(self, names: list[str] | None = None) -> list[str]:
        return [
            n
            for n in (self._list() if names is None else names)
            if n.endswith(".checkpoint.json")
        ]

    def _read_commit(self, name: str) -> dict:
        with open(os.path.join(self.log_dir, name)) as fh:
            c = json.load(fh)
        c["version"] = int(name[: -len(".json")])
        return c

    def commits(self) -> list[dict]:
        """Every commit, version-ordered — the full commit log."""
        return [self._read_commit(n) for n in self._commit_files()]

    def exists(self) -> bool:
        """Whether any commit has ever landed — `admin verify`'s probe
        for 'is this table's clock checkable' (the JSON store's
        equivalent is meta.json existing). Checkpoint-aware: a log whose
        pre-checkpoint commits were pruned still HAS a checkable clock
        (the checkpoint holds the floor) and must not be skipped as a
        legacy log."""
        names = self._list()
        return bool(self._commit_files(names)) or bool(
            self._checkpoint_files(names)
        )

    def version(self) -> int:
        """Latest committed version (0 = nothing ever committed) — the
        monotonic clock a Delta table exposes natively. Checkpoint-aware
        so pruning pre-checkpoint commits can never regress it."""
        names = self._list()
        commits = self._commit_files(names)
        cps = self._checkpoint_files(names)
        return max(
            int(commits[-1][: -len(".json")]) if commits else 0,
            int(cps[-1][: -len(".checkpoint.json")]) if cps else 0,
        )

    def _try_commit(self, version: int, body: dict) -> bool:
        """Claim ``version`` with its content atomically (put-if-absent).
        The body lands in scratch first; ``os.link`` publishes it only if
        the version is unclaimed — a loser gets EEXIST and retries, and a
        crash before the link leaves only invisible scratch (Delta's
        uncommitted files), never a torn commit. Scratch is reclaimed on
        EVERY exit, including a failed body write (ENOSPC)."""
        os.makedirs(self.log_dir, exist_ok=True)
        name = f"{version:0{_VERSION_WIDTH}d}.json"
        scratch = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex[:12]}")
        try:
            with open(scratch, "w") as fh:
                json.dump(body, fh, sort_keys=True)
            os.link(scratch, os.path.join(self.log_dir, name))
            return True
        except FileExistsError:
            return False  # lost the race; caller re-reads and retries
        finally:
            try:
                os.remove(scratch)
            except FileNotFoundError:
                pass

    def _write_checkpoint(self, version: int, folded: dict) -> None:
        """Persist the folded state as of ``version``. Best-effort pure
        acceleration (same role as Delta checkpoint parquet): written via
        the same scratch+link so readers never see a torn checkpoint; a
        lost race or ANY OSError (ENOSPC) just means readers fold more
        commits — it must never propagate, because the caller's commit
        has already durably landed and a raise would make the caller
        retry an operation that succeeded (review-found)."""
        name = f"{version:0{_VERSION_WIDTH}d}.checkpoint.json"
        scratch = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex[:12]}")
        try:
            with open(scratch, "w") as fh:
                json.dump(folded, fh, sort_keys=True)
            os.link(scratch, os.path.join(self.log_dir, name))
        except OSError:
            pass  # includes FileExistsError (lost the checkpoint race)
        finally:
            try:
                os.remove(scratch)
            except OSError:
                pass

    # -- the JsonFileMetaStore interface --------------------------------

    def read(self, max_version: int | None = None) -> dict:
        """Fold the commit log into the meta dict consumers expect —
        latest checkpoint at-or-below the bound plus the commit tail
        after it, so per-read file opens are bounded by
        CHECKPOINT_INTERVAL instead of table lifetime. Same keys as
        JsonFileMetaStore.read(), plus ``version`` and ``entries`` (the
        add/remove-file fold). ``max_version`` caps the fold (used by
        bump() to report exactly the state as of ITS commit, not a
        rival's later one).

        Retries on FileNotFoundError: a concurrent ``prune()`` may
        remove a listed commit between our directory listing and the
        open; the fresh listing sees the checkpoint that covers whatever
        was pruned (prune only ever removes checkpoint-covered files).
        Bounded retry, not retry-once (review-found): under a busy
        writer + looping pruner, back-to-back prunes can each invalidate
        one listing, and a single retry re-raised a raw
        FileNotFoundError from a healthy log."""
        for attempt in range(_LIST_RETRIES):
            try:
                return self._fold(max_version)
            except FileNotFoundError:
                if attempt == _LIST_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def _fold(
        self, max_version: int | None = None, names: list[str] | None = None
    ) -> dict:
        base = dict(_EMPTY)
        entries: set[str] = set()
        start_after = 0
        # one directory listing serves both filters; entries_at passes
        # ITS listing in so its pruned-history guard and this fold see
        # the same snapshot of the log (guarding on one listing and
        # folding from a second lets a concurrent prune slip between
        # them and return a silently-wrong answer instead of the
        # explicit retention error — review-found)
        if names is None:
            names = self._list()
        cps = self._checkpoint_files(names)
        if max_version is not None:
            cps = [
                n
                for n in cps
                if int(n[: -len(".checkpoint.json")]) <= max_version
            ]
        if cps:
            with open(os.path.join(self.log_dir, cps[-1])) as fh:
                base.update(json.load(fh))
            entries = set(base.get("entries") or [])
            start_after = int(cps[-1][: -len(".checkpoint.json")])
            base["version"] = start_after
        actions_seen = bool(base.get("actions_seen"))
        for name in self._commit_files(names):
            v = int(name[: -len(".json")])
            if v <= start_after or (max_version is not None and v > max_version):
                continue
            c = self._read_commit(name)
            base["seq_floor"] = max(base["seq_floor"], int(c.get("seq_floor", 0)))
            if c.get("kind") == "rewrite":
                base["generation"] += 1
                base["rewrite_id"] = c.get("rewrite_id", "")
            if "adds" in c or "removes" in c:
                actions_seen = True
            # removes before adds WITHIN a commit: a rewrite may re-add
            # an entry under the SAME name it removes (compact keeps the
            # min sequence, so the rebuilt batch-<minseq> can alias the
            # first retired batch)
            for r in c.get("removes") or []:
                entries.discard(r)
            for a in c.get("adds") or []:
                entries.add(a)
            base["version"] = v
        base["entries"] = sorted(entries)
        # "has this log EVER recorded a file action" — persisted through
        # checkpoints (the checkpoint body IS a fold result), so it
        # survives retention pruning. admin verify's pre-manifest
        # carve-out keys off this, NOT off scanning surviving commit
        # files (review-found: after prune() removes the action-carrying
        # tail, a scan would misclassify a real manifest divergence as
        # 'pre-manifest' and verify would pass on a corrupted manifest).
        base["actions_seen"] = actions_seen
        if base["version"] == 0 and not self._commit_files(names):
            # empty commit log: fold a surviving legacy meta.json floor
            # in (review-found). A table migrated from JsonFileMetaStore
            # keeps its old floor on disk; without this, the first
            # append after migration restarts sequences at 1 and reuses
            # purged sequence numbers (the r10/r11 aliased-sequence
            # family) — last_sequence(), recover's manifest seeding, and
            # verify's floor check all route through this read. The
            # fallback applies only while the log is empty; commit 1
            # persists the folded floor and the legacy file is ignored
            # thereafter. Generation/rewrite_id watermarks deliberately
            # do NOT cross the migration: commit-store consumers are
            # version-watermarked and reseed from version 0.
            legacy = os.path.join(self.table_path, "meta.json")
            try:
                with open(legacy) as fh:
                    base["seq_floor"] = max(
                        base["seq_floor"], int(json.load(fh).get("seq_floor", 0))
                    )
            except (OSError, ValueError):
                pass  # no legacy store (the common case) or unreadable
        return base

    def bump(
        self,
        seq_floor: int,
        rewrite: bool = False,
        adds: list[str] | None = None,
        removes: list[str] | None = None,
    ) -> dict:
        """Advance the clock by APPENDING a commit — the optimistic-
        concurrency loop: read the log, claim version+1, retry on loss.
        No flock anywhere; mutual exclusion is the put-if-absent claim,
        which is exactly what Delta relies on (and why the local rewrite
        flock collapses into this protocol at cluster scale). Returns the
        folded state AS OF the commit this call won (a rival's later
        commit is not reported as ours — parity with JsonFileMetaStore,
        which returns exactly what it wrote under its lock).

        ``adds``/``removes`` are Delta-style file actions recorded in
        the commit body: an append records the batch entry it published,
        a rewrite records the pinned entry set it retired plus the
        rebuilt entry (events.py wires both)."""
        while True:
            cur = self.read()
            claim = cur["version"] + 1
            body = {
                "kind": "rewrite" if rewrite else "append",
                # monotone by construction, but fold defensively anyway
                "seq_floor": max(int(seq_floor), cur["seq_floor"]),
            }
            if rewrite:
                body["rewrite_id"] = uuid.uuid4().hex[:12]
            if adds:
                body["adds"] = sorted(adds)
            if removes:
                body["removes"] = sorted(removes)
            if self._try_commit(claim, body):
                mine = self.read(max_version=claim)
                if claim % CHECKPOINT_INTERVAL == 0:
                    self._write_checkpoint(claim, mine)
                return mine

    # -- file-action fold (Delta add/remove reconstruction) -------------

    def entries_at(self, version: int | None = None) -> list[str]:
        """The published log entries as of ``version`` (default: latest)
        — Delta's "which files make up the table at version V",
        reconstructed from add/remove actions alone, no directory
        listing of the events dir. Raises ValueError when the answer
        would need pruned commits (no checkpoint at-or-below ``version``
        covers them) — the same contract as Delta time travel beyond the
        log retention window, which fails rather than answering from
        partial history.

        The guard and the fold share ONE directory listing (and retry
        together on a concurrent prune), so the answer is always either
        exact or the explicit error — never a fold over files the guard
        didn't see. The retry is bounded, not single (review-found):
        back-to-back prunes can each invalidate one listing."""
        for attempt in range(_LIST_RETRIES):
            names = self._list()
            commits = self._commit_files(names)
            cps_all = self._checkpoint_files(names)
            if version is not None:
                head = max(
                    int(commits[-1][: -len(".json")]) if commits else 0,
                    int(cps_all[-1][: -len(".checkpoint.json")]) if cps_all else 0,
                )
                if version > head:
                    # Delta: time travel past the head is "version does
                    # not exist", not a retention problem
                    raise ValueError(
                        f"version {version} does not exist (latest is {head})"
                    )
                cps = [int(n[: -len(".checkpoint.json")]) for n in cps_all]
                cp_le = max((v for v in cps if v <= version), default=0)
                have = {int(n[: -len(".json")]) for n in commits}
                missing = [
                    v for v in range(cp_le + 1, version + 1) if v not in have
                ]
                if missing:
                    gap = ", ".join(str(v) for v in missing[:3])
                    more = "…" if len(missing) > 3 else ""
                    raise ValueError(
                        f"cannot reconstruct entries at version {version}: "
                        f"commit(s) {gap}{more} were pruned behind a newer "
                        "checkpoint (history beyond log retention)"
                    )
            try:
                return list(self._fold(version, names)["entries"])
            except FileNotFoundError:
                if attempt == _LIST_RETRIES - 1:
                    raise
                # concurrent prune removed a listed file: re-list, so the
                # guard re-checks coverage against the post-prune log
        raise AssertionError("unreachable")  # pragma: no cover

    # -- retention lifecycle ---------------------------------------------

    def prune(self, keep_commits: int = 0) -> dict:
        """Log-retention cleanup — Delta's metadata cleanup
        (``delta.logRetentionDuration``): remove commit files at-or-below
        the latest checkpoint (their fold is IN the checkpoint, so no
        reader at-or-after it ever opens them) plus superseded older
        checkpoints, keeping ``read()``'s directory listing bounded
        instead of growing one dirent per commit for the table's life.
        The reference's analogous lifecycle is segment rotation
        (table_storage.rs:212-261).

        ``keep_commits`` retains that many of the newest prunable commit
        files — headroom for consumers whose watermark trails the
        checkpoint by a few versions (they keep getting EXACT
        ``rewrites_since`` answers instead of the conservative reseed).

        Safety: with no checkpoint, prunes NOTHING — removal must never
        create an uncovered gap (an append-only log with no checkpoint
        would otherwise lose clock state entirely). Consumers whose
        watermark predates the surviving history get the conservative
        synthetic rewrite from ``rewrites_since`` (they reseed — safe);
        ``entries_at`` below the checkpoint refuses explicitly. A crash
        mid-prune leaves a partial (still checkpoint-covered) gap, which
        the same conservative path answers; re-running prune completes
        it. Concurrent ``read()``s retry against the fresh listing."""
        names = self._list()
        cps = self._checkpoint_files(names)
        report: dict = {
            "checkpoint_version": None,
            "pruned_commits": 0,
            "pruned_checkpoints": 0,
        }
        if not cps:
            return report  # nothing covers history: refuse to prune
        cp_v = int(cps[-1][: -len(".checkpoint.json")])
        report["checkpoint_version"] = cp_v
        prunable = [
            n for n in self._commit_files(names) if int(n[: -len(".json")]) <= cp_v
        ]
        if keep_commits > 0:
            prunable = prunable[:-keep_commits] if keep_commits < len(prunable) else []
        for n in prunable:
            try:
                os.remove(os.path.join(self.log_dir, n))
                report["pruned_commits"] += 1
            except FileNotFoundError:
                pass  # a concurrent pruner already removed it
        for n in cps[:-1]:
            try:
                os.remove(os.path.join(self.log_dir, n))
                report["pruned_checkpoints"] += 1
            except FileNotFoundError:
                pass
        return report

    # -- consumer-side rewrite detection --------------------------------

    def rewrites_since(self, version: int) -> list[dict]:
        """Rewrite commits in ``(version, latest]`` — the version-range
        scan replication ship / incremental backup / IMV refresh / the
        result cache run instead of comparing generation integers.

        History gaps are answered the way Delta answers queries beyond
        the log retention window — CONSERVATIVELY, never silently (the
        r10 divergence family was a silent drop):

        - a gap COVERED by a checkpoint (the normal ``prune()`` state)
          returns a synthetic ``kind='rewrite', conservative=True``
          entry iff the checkpoint has ever seen a rewrite — whether one
          landed inside the pruned range is unknowable, so consumers
          reseed; an append-only history stays exact (generation 0 in
          the checkpoint proves no rewrite could be hiding).
        - a gap NOT covered by any checkpoint (manual deletion,
          non-contiguous loss — states no in-engine operation produces)
          returns the conservative entry UNCONDITIONALLY, because
          without a checkpoint fold even "were there any rewrites at
          all" is unknowable (advisor-found: the contiguous-prefix
          assumption made this case silently return [])."""
        for attempt in range(_LIST_RETRIES):
            try:
                return self._rewrites_since(version)
            except FileNotFoundError:
                # concurrent prune removed a listed file; re-list
                # (bounded, not retry-once — review-found)
                if attempt == _LIST_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def _rewrites_since(self, version: int) -> list[dict]:
        names = self._list()
        commit_names = self._commit_files(names)
        versions = sorted(int(n[: -len(".json")]) for n in commit_names)
        tail = [
            self._read_commit(n)
            for n in commit_names
            if int(n[: -len(".json")]) > version
        ]
        hits = [c for c in tail if c.get("kind") == "rewrite"]
        cps = self._checkpoint_files(names)
        cp_v = int(cps[-1][: -len(".checkpoint.json")]) if cps else 0
        latest = max(versions[-1] if versions else 0, cp_v)
        if latest <= version:
            return hits  # nothing after the watermark; nothing to scan

        # Versions in (version, latest] must each be witnessed by a
        # surviving commit file or covered by the checkpoint. Commits are
        # claimed contiguously (put-if-absent on version+1), so coverage
        # reduces to two count checks — no range materialization.
        span_lo = max(version, cp_v)
        above = [v for v in versions if v > span_lo]
        uncovered_gap = bool(above) and (
            above[0] != span_lo + 1 or len(above) != above[-1] - above[0] + 1
        )
        in_cp_span = [v for v in versions if version < v <= cp_v]
        covered_gap = version < cp_v and len(in_cp_span) < cp_v - version

        conservative = None
        if uncovered_gap:
            # no checkpoint fold covers the hole: even the aggregate
            # rewrite count is unknowable — reseed unconditionally
            conservative = {
                "kind": "rewrite",
                "version": latest,
                "rewrite_id": "",
                "seq_floor": 0,
                "conservative": True,
                "uncovered": True,
            }
        elif covered_gap:
            with open(os.path.join(self.log_dir, cps[-1])) as fh:
                folded = json.load(fh)
            if int(folded.get("generation", 0)) > 0:
                conservative = {
                    "kind": "rewrite",
                    "version": cp_v,
                    "rewrite_id": folded.get("rewrite_id", ""),
                    "seq_floor": int(folded.get("seq_floor", 0)),
                    "conservative": True,
                }
        if conservative is not None:
            hits.insert(0, conservative)
        return hits
