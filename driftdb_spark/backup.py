"""Backup / restore / verify — the reference's BackupManager, Spark-first.

The reference backs up table segments with a JSON manifest carrying
per-table segment lists, sequence ranges, a parent pointer for
incrementals, and checksums (backup.rs:17-61), restores by walking the
manifest (backup.rs:250-291) and verifies checksums (backup.rs:292+).

The event-sourced parquet layout makes this nearly free and *incremental
by construction*: published log entries (``batch-*`` directories, or the
rewritten parquet files a compaction leaves) are immutable once visible,
so an incremental backup copies exactly the entries not already present
in the parent chain — backup cost is proportional to new data, the same
property Delta/iceberg snapshots exploit. Consistency per table comes
from pinning the published entry set up front (the same ``_log_entries``
pin snapshot/compact use), so a concurrently-committing batch is either
wholly in this backup or wholly in the next one.

Restore materializes the LEAF manifest's live-entry set, pulling each
entry's bytes from the nearest manifest in the chain that copied it —
entries dropped by a later compaction/purge are chain-resident but not
live, so they are not resurrected (a purge stays purged through
backup/restore, which is what a compliance purge requires).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

MANIFEST = "_backup_manifest.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _copy_entry(src: str, dest: str, checksums: dict, rel_prefix: str) -> None:
    """Copy one log entry (file or directory) recording per-file sha256."""
    if os.path.isdir(src):
        os.makedirs(dest, exist_ok=True)
        for root, _dirs, files in os.walk(src):
            rel_root = os.path.relpath(root, src)
            for f in files:
                if f.startswith((".", "_")):
                    continue  # hidden/marker files (.crc, _SUCCESS) regenerate
                s = os.path.join(root, f)
                rel = os.path.normpath(os.path.join(rel_prefix, rel_root, f))
                d = os.path.join(dest, rel_root, f)
                os.makedirs(os.path.dirname(d), exist_ok=True)
                shutil.copy2(s, d)
                checksums[rel] = _sha256(s)
    else:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy2(src, dest)
        checksums[os.path.normpath(rel_prefix)] = _sha256(src)


class BackupManager:
    """Backup surface over a :class:`DriftSession`'s storage dir."""

    def __init__(self, session):
        self._session = session

    # -- create ---------------------------------------------------------------

    def create_full_backup(self, dest: str) -> dict:
        return self._create(dest, parent=None)

    def create_incremental_backup(self, dest: str, parent: str) -> dict:
        """Copy only entries not already present anywhere in the parent
        chain (reference create_incremental_backup, backup.rs:156-249)."""
        return self._create(dest, parent=os.path.abspath(parent))

    def _create(self, dest: str, parent: str | None) -> dict:
        if os.path.exists(dest) and os.listdir(dest):
            raise ValueError(f"backup destination {dest} is not empty")
        os.makedirs(dest, exist_ok=True)
        chain_entries = self._chain_copied(parent) if parent else {}
        # entry names are immutable only WITHIN a rewrite generation: a
        # compact/purge rebuilds the log and may reuse an existing
        # batch-<minseq> name (and snapshot seq=N names) with different
        # content. An incremental that skipped those by name would restore
        # PRE-REWRITE bytes — resurrecting purged rows. Compare the
        # parent's persisted per-table meta; any generation change voids
        # the skip set for that table (same reseed rule as replication).
        parent_meta: dict[str, dict | None] = {}
        if parent:
            pm = self._load_manifest(parent)
            parent_meta = {
                n: t.get("meta") for n, t in pm["tables"].items()
            }
        manifest: dict = {
            "version": 1,
            "created_unix": time.time(),
            "type": "incremental" if parent else "full",
            "parent": parent,
            "tables": {},
            "checksums": {},
        }
        for name, (log, _cols) in sorted(self._session._tables.items()):
            # The per-table rewrite lock pins (entries, snapshots, meta,
            # bytes) as ONE consistent cut. Lock-free, two races corrupt
            # silently or crash: (a) a compact completing between the
            # entry pin and the meta read records the NEW generation over
            # OLD entry names/bytes — a child incremental then sees
            # generation-equal, trusts the name chain, skips the aliased
            # batch-<minseq> whose content changed, and restore serves
            # stale bytes; (b) a rewrite swapping the dir mid-copy makes
            # _copy_entry ENOENT. Appends stay concurrent (new batches
            # simply land after the pin, caught by the next incremental).
            with log._rewrite_lock("backup"):
                self._backup_table(name, log, dest, parent, chain_entries,
                                   parent_meta, manifest)
        cat = self._session._catalog_path()
        if os.path.exists(cat):
            _copy_entry(
                cat, os.path.join(dest, "_catalog.json"), manifest["checksums"], "_catalog.json"
            )
        with open(os.path.join(dest, MANIFEST), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        return manifest

    def _backup_table(
        self, name, log, dest, parent, chain_entries, parent_meta, manifest
    ) -> None:
        entries = log._log_entries()  # pinned published set
        snaps = [f"seq={s}" for s in log._snapshot_seqs()]
        cur_meta = log.read_meta()
        already = chain_entries.get(name, set())
        pmeta = parent_meta.get(name)
        if parent and (
            pmeta is None  # pre-meta parent backup: can't prove no rewrite
            or (int(pmeta.get("generation", 0)), pmeta.get("rewrite_id", ""))
            != (int(cur_meta.get("generation", 0)), cur_meta.get("rewrite_id", ""))
        ):
            already = set()  # rewrite since parent: re-copy wholesale
        copied_entries = [e for e in entries if ("events", e) not in already]
        copied_snaps = [s for s in snaps if ("snapshots", s) not in already]
        for e in copied_entries:
            _copy_entry(
                os.path.join(log._events_dir, e),
                os.path.join(dest, name, "events", e),
                manifest["checksums"],
                os.path.join(name, "events", e),
            )
        for s in copied_snaps:
            _copy_entry(
                os.path.join(log._snap_dir, s),
                os.path.join(dest, name, "snapshots", s),
                manifest["checksums"],
                os.path.join(name, "snapshots", s),
            )
        manifest["tables"][name] = {
            "pk": log.pk_col,
            "entries_live": entries,
            "snapshots_live": snaps,
            "entries_copied": copied_entries,
            "snapshots_copied": copied_snaps,
            "last_sequence": log.last_sequence(),
            # the persisted sequence floor / rewrite generation must
            # survive a restore: without it, a restored post-purge
            # store could hand out already-retired sequences
            "meta": cur_meta,
        }

    # -- chain walking --------------------------------------------------------

    @staticmethod
    def _load_manifest(backup_dir: str) -> dict:
        with open(os.path.join(backup_dir, MANIFEST)) as fh:
            return json.load(fh)

    @classmethod
    def _chain(cls, leaf_dir: str) -> list[str]:
        """Backup dirs leaf -> ... -> full root."""
        out, cur = [], os.path.abspath(leaf_dir)
        while cur is not None:
            out.append(cur)
            m = cls._load_manifest(cur)
            cur = m["parent"]
            if len(out) > 100:
                raise ValueError("backup parent chain too deep (cycle?)")
        return out

    @classmethod
    def _chain_copied(cls, leaf_dir: str) -> dict[str, set]:
        """Per table: the set of (kind, entry) pairs present in the chain."""
        copied: dict[str, set] = {}
        for d in cls._chain(leaf_dir):
            m = cls._load_manifest(d)
            for name, t in m["tables"].items():
                s = copied.setdefault(name, set())
                s.update(("events", e) for e in t["entries_copied"])
                s.update(("snapshots", x) for x in t["snapshots_copied"])
        return copied

    # -- verify / restore ------------------------------------------------------

    @classmethod
    def verify(cls, backup_dir: str) -> bool:
        """Recompute every copied file's sha256 against the manifest
        (reference verify_backup, backup.rs:292+)."""
        m = cls._load_manifest(backup_dir)
        for rel, want in m["checksums"].items():
            p = os.path.join(backup_dir, rel)
            if not os.path.exists(p) or _sha256(p) != want:
                return False
        return True

    @classmethod
    def restore(cls, leaf_dir: str, target_storage_dir: str) -> dict:
        """Materialize the leaf manifest's live state into a fresh storage
        dir. Each live entry's bytes come from the NEAREST chain member
        that copied it; entries in the chain but not live (dropped by a
        later compact/purge) are not resurrected."""
        if os.path.exists(target_storage_dir) and os.listdir(target_storage_dir):
            raise ValueError(f"restore target {target_storage_dir} is not empty")
        os.makedirs(target_storage_dir, exist_ok=True)
        chain = cls._chain(leaf_dir)  # leaf first
        leaf = cls._load_manifest(leaf_dir)

        def _find_source(name: str, kind: str, entry: str) -> str:
            for d in chain:
                m = cls._load_manifest(d)
                t = m["tables"].get(name)
                key = "entries_copied" if kind == "events" else "snapshots_copied"
                if t and entry in t[key]:
                    return os.path.join(d, name, kind, entry)
            raise FileNotFoundError(
                f"backup chain is missing {name}/{kind}/{entry}"
            )

        for name, t in leaf["tables"].items():
            for e in t["entries_live"]:
                src = _find_source(name, "events", e)
                dst = os.path.join(target_storage_dir, name, "events", e)
                _copy_tree_or_file(src, dst)
            for s in t["snapshots_live"]:
                src = _find_source(name, "snapshots", s)
                dst = os.path.join(target_storage_dir, name, "snapshots", s)
                _copy_tree_or_file(src, dst)
            # rehydrate the sequence floor so the restored log's clock
            # resumes above everything the backed-up store ever assigned
            # (pre-meta backups carry only last_sequence — use it as the
            # floor; it is the same monotonic quantity at backup time)
            meta = t.get("meta") or {
                "seq_floor": int(t.get("last_sequence", 0)),
                "generation": 0,
                "rewrite_id": "",
            }
            tdir = os.path.join(target_storage_dir, name)
            os.makedirs(tdir, exist_ok=True)
            with open(os.path.join(tdir, "meta.json"), "w") as fh:
                json.dump(meta, fh, sort_keys=True)
        # catalog: the leaf's copy wins (newest schema registration)
        for d in chain:
            cat = os.path.join(d, "_catalog.json")
            if os.path.exists(cat):
                shutil.copy2(cat, os.path.join(target_storage_dir, "_catalog.json"))
                break
        return leaf


def _copy_tree_or_file(src: str, dst: str) -> None:
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
