"""Log-shipping replication + failover — the reference's replication and
failover families, Spark-first.

The reference replicates by streaming WAL entries over TCP from a master
to slaves with heartbeats, acks, lag tracking and catch-up requests
(replication.rs:81-118 ReplicationMessage, :612-620 get_replication_lag),
and fails over via health-checked role transitions guarded by a
monotonically-increasing FencingToken that stale masters fail to validate
(failover.rs:25-44, :421-439 validate_fencing_token). Raft/consensus
(raft.rs, consensus.rs) remain out of scope here: on Spark, leader
election across many nodes is the cluster manager's job (SURVEY §7.6);
what this module keeps is everything a SINGLE replication stream needs —
shipping, catch-up, lag, read-only standbys, promote, and fencing.

The event-sourced storage makes shipping trivial and *naturally
idempotent*: published log entries (``batch-*`` directories, or the
parquet files a compaction leaves) are immutable once visible, so a
"WAL entry" here is a whole published log entry, shipped by name. The
stream is a plain directory (`ship_dir`) — on a cluster this is an
object-store prefix, and the same staged-copy-then-rename protocol the
EventLog uses for appends makes each shipped entry visible atomically.

Correctness pieces beyond naive copying:

* **Generations**: ``compact()``/``purge()`` REWRITE the log (and purge
  rewrites snapshot content under unchanged names), so shipping by name
  would serve stale bytes. ``ship()`` detects a rewrite — any
  previously-live entry no longer live — and bumps the table's
  *generation*: the table re-ships wholesale under ``gen-<G>/`` and
  replicas reseed. This is exactly how a compliance purge propagates to
  standbys (the purged rows disappear from replicas on the next apply).
* **Fencing epochs** (failover.rs FencingToken): the stream carries an
  ``_epoch.json``; ``promote()`` claims epoch N+1 via an exclusive-create
  claim file (two racing replicas: exactly one wins — the filesystem
  analog of the token CAS in failover.rs:421). A fenced old primary's
  ``ship()`` raises :class:`FencedPrimary`; and because *replicas ignore
  heartbeats whose epoch is older than the stream epoch*, even a
  heartbeat the zombie managed to write in the race window is inert.
* **Read-only standbys**: the replica's session refuses every mutating
  statement with SQLSTATE 25006 (events.ReadOnlyLog), at both the SQL
  dispatcher and the EventLog layer — reads (incl. AS OF time travel)
  work normally.

At 100 TB the design holds: shipping is a per-entry object copy
proportional to NEW data only (the incremental-backup property), apply
is rename-only metadata work, and replica reads are ordinary Spark scans
over the same immutable parquet — no row-level apply loop anywhere.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from driftdb_spark.events import ReadOnlyLog

EPOCH_FILE = "_epoch.json"
HEARTBEAT_FILE = "_heartbeat.json"
MANIFEST_FILE = "_manifest.json"
CATALOG_FILE = "_catalog.json"
REPLICA_STATE = "_replica_state.json"

__all__ = [
    "FencedPrimary",
    "PromoteRace",
    "ReadOnlyLog",
    "Replica",
    "ReplicationPrimary",
]


class FencedPrimary(RuntimeError):
    """A demoted primary tried to ship after a replica promoted — the
    reference's FencingToken validation failure (failover.rs:421-439:
    "Stale fencing token ... newer token exists")."""

    sqlstate = "55000"  # object_not_in_prerequisite_state


class PromoteRace(RuntimeError):
    """Two replicas raced a promote for the same epoch; this one lost.
    The winner holds the claim file (exactly-one-winner, like the
    append-rename protocol in events.py)."""

    sqlstate = "55P03"


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX


def _read_json(path: str, default=None):
    # open-first (no exists() pre-check): a racing primary's manifest GC
    # may delete the file between a listing and this read — that must
    # degrade to the default, not raise mid-apply/lag
    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return default


def _atomic_copy(src: str, dst: str) -> None:
    """Copy a log entry (file or directory) so it becomes visible at
    ``dst`` atomically: stage under a hidden sibling, then one rename.
    Hidden/marker files (.crc, _SUCCESS) regenerate and are skipped, same
    as backup.py. Idempotent: an entry already at ``dst`` is left alone
    (entries are immutable within a generation)."""
    if os.path.exists(dst):
        return
    parent = os.path.dirname(dst)
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f"_staging-{uuid.uuid4().hex[:8]}")
    try:
        if os.path.isdir(src):
            os.makedirs(staging, exist_ok=True)
            for root, _dirs, files in os.walk(src):
                rel = os.path.relpath(root, src)
                for f in files:
                    if f.startswith((".", "_")):
                        continue
                    d = os.path.join(staging, rel, f)
                    os.makedirs(os.path.dirname(d), exist_ok=True)
                    shutil.copy2(os.path.join(root, f), d)
        else:
            shutil.copy2(src, staging)
        try:
            os.rename(staging, dst)
        except OSError:
            # a concurrent shipper won the name: entries are immutable, so
            # the winner's bytes are equivalent — drop ours
            shutil.rmtree(staging, ignore_errors=True)
            if not os.path.exists(dst):
                raise
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        if os.path.isfile(staging):
            os.remove(staging)
        raise


def _stream_epoch(ship_dir: str) -> dict:
    return _read_json(
        os.path.join(ship_dir, EPOCH_FILE),
        {"epoch": 0, "holder": None, "changed_unix": 0.0},
    )


def _manifest_name(epoch: int) -> str:
    return f"_manifest-{epoch:012d}.json"


def _stream_manifest(ship_dir: str, default=None):
    """The authoritative manifest: each epoch writes its OWN file
    (``_manifest-<epoch>.json``) and readers take the newest, so a fenced
    zombie primary physically cannot clobber a newer primary's manifest —
    not for caught-up replicas, not for lagging or freshly-seeded ones
    (the hole an in-content epoch stamp alone leaves open: a late zombie
    write would replace the file and anyone below that epoch would trust
    it). Falls back to the legacy un-stamped ``_manifest.json`` for
    streams written before the stamping existed.

    GC race: a racing primary that ships two epochs between our listing
    and the read can delete the stamp we chose (GC keeps current +
    previous). A vanished stamp retries with a FRESH listing — the newer
    stamp is already on disk by construction — instead of surfacing an
    exception or a bogus empty manifest."""
    missing = object()
    for _ in range(5):
        try:
            names = os.listdir(ship_dir)
        except OSError:
            return default
        stamped = sorted(
            n for n in names if n.startswith("_manifest-") and n.endswith(".json")
        )
        target = stamped[-1] if stamped else MANIFEST_FILE
        got = _read_json(os.path.join(ship_dir, target), missing)
        if got is not missing:
            return got
        if not stamped:
            return default  # legacy file legitimately absent: empty stream
    # five FRESH listings each lost the list→read race: GC only deletes
    # stamps two epochs behind, so this means the stream dir is churning
    # faster than we can list it or something is deleting manifests out
    # of band — surface it rather than report a bogus empty manifest
    raise RuntimeError(
        f"manifest read lost the GC race 5 times in {ship_dir!r}; "
        "stamped manifests exist but every chosen one vanished before open"
    )


class ReplicationPrimary:
    """Ships a session's published log entries into a replication stream
    directory and maintains the stream heartbeat (reference
    ReplicationCoordinator in the Master role, replication.rs:120+)."""

    def __init__(
        self,
        session,
        ship_dir: str,
        node_id: str = "primary",
        _claim: int | None = None,
    ):
        self.session = session
        self.ship_dir = os.path.abspath(ship_dir)
        self.node_id = node_id
        # in-process guard: two ship() calls interleaving would lose
        # manifest updates (cross-process single-writer is the epoch's job)
        self._ship_lock = threading.Lock()
        os.makedirs(self.ship_dir, exist_ok=True)
        if _claim is not None:
            # promote() path: claim a specific epoch (exclusive-create)
            self._claim_epoch(_claim)
            self.epoch = _claim
            self.heartbeat()
            return
        cur = _stream_epoch(self.ship_dir)
        if cur["epoch"] == 0:
            # first primary on a fresh stream claims epoch 1
            self._claim_epoch(1)
            self.epoch = 1
        elif cur["holder"] == node_id:
            self.epoch = int(cur["epoch"])
        else:
            raise FencedPrimary(
                f"stream {self.ship_dir} is held by {cur['holder']!r} at "
                f"epoch {cur['epoch']}; this node ({node_id!r}) must not ship"
            )
        # Announce liveness immediately: a standby with auto-failover
        # enabled that starts between our epoch claim and our first ship()
        # would otherwise see NO heartbeat, treat the primary as dead, and
        # instantly claim the next epoch — permanently fencing a healthy
        # primary that never got to write anything.
        self.heartbeat()

    # -- fencing --------------------------------------------------------------

    def _claim_epoch(self, epoch: int) -> None:
        """Exclusive-create claim: exactly one node wins a given epoch
        (failover.rs FencingToken::next + validate; the claim file is the
        CAS)."""
        claim = os.path.join(self.ship_dir, f"_epoch-claim-{epoch:012d}")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise PromoteRace(
                f"epoch {epoch} on stream {self.ship_dir} was already "
                "claimed by another node"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump({"holder": self.node_id, "unix": time.time()}, fh)
        _write_json_atomic(
            os.path.join(self.ship_dir, EPOCH_FILE),
            {"epoch": epoch, "holder": self.node_id, "changed_unix": time.time()},
        )

    def _check_fence(self) -> None:
        cur = _stream_epoch(self.ship_dir)
        if cur["epoch"] > self.epoch or (
            cur["epoch"] == self.epoch and cur["holder"] != self.node_id
        ):
            raise FencedPrimary(
                f"fenced: stream epoch is {cur['epoch']} (holder "
                f"{cur['holder']!r}), this primary holds epoch {self.epoch} — "
                "a replica was promoted; stop writing"
            )

    # -- shipping ---------------------------------------------------------------

    def ship(self) -> dict:
        """Copy every published-but-unshipped log entry into the stream,
        then advance the heartbeat. Incremental by construction (entries
        are immutable); a log rewrite (compact/purge) bumps the table
        generation and re-ships it wholesale so replicas reseed.

        Returns ``{table: n_entries_shipped}``. Raises
        :class:`FencedPrimary` (and leaves the heartbeat untouched) if a
        replica promoted."""
        with self._ship_lock:
            return self._ship_locked()

    def _ship_locked(self) -> dict:
        self._check_fence()
        manifest = _stream_manifest(self.ship_dir, {"tables": {}})
        shipped: dict[str, int] = {}
        hb_tables: dict[str, dict] = {}
        for name, (log, _cols) in sorted(self.session._tables.items()):
            # The per-table cut (entries, snapshots, meta, last_sequence,
            # bytes) is taken under the table's rewrite lock: lock-free, a
            # compact/purge swapping the log mid-copy ENOENTs the entry
            # copy, and a torn (old entries, new meta) cut forces a
            # spurious reseed crash-retry cycle. Appends stay concurrent —
            # a batch landing after the pin ships next round.
            with log._rewrite_lock("ship"):
                entries = log._log_entries()  # pinned published set
                snaps = [f"seq={s}" for s in log._snapshot_seqs()]
                meta = log.read_meta()
                log_gen = (int(meta.get("generation", 0)), meta.get("rewrite_id", ""))
                prev = manifest["tables"].get(
                    name, {"generation": 0, "entries": [], "snapshots": []}
                )
                gen = int(prev["generation"])
                prev_log_gen = (
                    int(prev.get("log_generation", 0)),
                    prev.get("rewrite_id", ""),
                )
                # A rewrite (compact/purge) is detected by the log's PERSISTED
                # generation (events.py meta), not only by diffing entry-name
                # sets: a purge-to-empty used to reset the sequence clock, so
                # the next append could REUSE a shipped batch name with
                # different content and the name-set diff saw nothing — the
                # replica silently kept the old rows (fuzz-found, r10). The
                # name-set diff stays as a fallback for meta-less legacy logs.
                rewritten = (
                    bool(set(prev["entries"]) - set(entries))
                    or log_gen != prev_log_gen
                )
                if gen == 0 or rewritten:
                    gen += 1  # fresh table or a compact/purge rewrite: reseed
                    prev_shipped_e: set[str] = set()
                    prev_shipped_s: set[str] = set()
                else:
                    prev_shipped_e = set(prev["entries"])
                    prev_shipped_s = set(prev["snapshots"])
                gen_dir = os.path.join(self.ship_dir, name, f"gen-{gen:06d}")
                n = 0
                for e in entries:
                    if e not in prev_shipped_e:
                        _atomic_copy(
                            os.path.join(log._events_dir, e),
                            os.path.join(gen_dir, "events", e),
                        )
                        n += 1
                for s in snaps:
                    if s not in prev_shipped_s:
                        _atomic_copy(
                            os.path.join(log._snap_dir, s),
                            os.path.join(gen_dir, "snapshots", s),
                        )
                manifest["tables"][name] = {
                    "generation": gen,
                    "entries": entries,
                    "snapshots": snaps,
                    "pk": log.pk_col,
                    # shipped so replicas persist the same sequence floor /
                    # rewrite generation locally: a PROMOTED replica must not
                    # restart the clock below the primary's high-water mark
                    "log_generation": log_gen[0],
                    "rewrite_id": log_gen[1],
                    "seq_floor": int(meta.get("seq_floor", 0)),
                }
                hb_tables[name] = {"last_sequence": log.last_sequence()}
                shipped[name] = n
            # keep current + previous generation only: in-flight applies of
            # gen G-1 survive, older generations sweep (views.py pattern).
            # A table with no published entries yet (CREATE TABLE, no
            # writes — fuzz-found) has no stream dir to sweep.
            tbl_dir = os.path.join(self.ship_dir, name)
            if os.path.isdir(tbl_dir):
                for d in sorted(os.listdir(tbl_dir)):
                    if d.startswith("gen-") and int(d[4:]) < gen - 1:
                        shutil.rmtree(os.path.join(tbl_dir, d), ignore_errors=True)
        cat = self.session._catalog_path()
        if os.path.exists(cat):
            tmp = os.path.join(self.ship_dir, f"_cat-tmp-{uuid.uuid4().hex[:8]}")
            shutil.copy2(cat, tmp)
            os.replace(tmp, os.path.join(self.ship_dir, CATALOG_FILE))
        # re-check the fence before publishing progress: if a promote
        # landed mid-copy, the copied bytes are inert (the heartbeat/
        # manifest never advance, and replicas ignore stale-epoch
        # heartbeats regardless)
        self._check_fence()
        # The manifest is published under an EPOCH-STAMPED filename: a
        # promote landing in the window between the re-check above and
        # this write lets a fenced zombie publish its manifest anyway —
        # but only into its own epoch's file, which every reader ranks
        # below the new primary's. The legacy un-stamped file is also
        # maintained for external tooling; readers prefer stamped files,
        # so a zombie clobbering the legacy copy is inert.
        manifest["epoch"] = self.epoch
        _write_json_atomic(
            os.path.join(self.ship_dir, _manifest_name(self.epoch)), manifest
        )
        _write_json_atomic(os.path.join(self.ship_dir, MANIFEST_FILE), manifest)
        # GC stamped manifests older than the PREVIOUS epoch (r8 ADVICE:
        # one stale file per epoch otherwise accumulates forever, and
        # _stream_manifest lists/sorts the whole dir on every apply/lag
        # call). Keeping current + previous preserves the backlog-apply
        # window a fresh promote reads from; anything older is strictly
        # dominated — readers always take the newest stamp.
        for n in os.listdir(self.ship_dir):
            if n.startswith("_manifest-") and n.endswith(".json"):
                try:
                    stamp = int(n[len("_manifest-") : -len(".json")])
                except ValueError:
                    continue
                if stamp < self.epoch - 1:
                    try:
                        os.remove(os.path.join(self.ship_dir, n))
                    except OSError:
                        pass  # concurrent GC by a racing ship() is fine
        self.heartbeat(hb_tables)
        return shipped

    def heartbeat(self, tables: dict | None = None) -> None:
        """Liveness beacon (replication.rs Heartbeat message). Replicas
        treat a stale heartbeat as primary failure (failover.rs
        health checks)."""
        if tables is None:
            tables = {
                name: {"last_sequence": log.last_sequence()}
                for name, (log, _c) in self.session._tables.items()
            }
        _write_json_atomic(
            os.path.join(self.ship_dir, HEARTBEAT_FILE),
            {
                "epoch": self.epoch,
                "node": self.node_id,
                "ts_unix": time.time(),
                "tables": tables,
            },
        )


class Replica:
    """A read-only standby following a replication stream (reference
    NodeRole::Slave, replication.rs:66-71; serves reads, applies shipped
    entries, tracks lag, and can promote)."""

    def __init__(self, spark, storage_dir: str, ship_dir: str, node_id: str = "replica"):
        self.spark = spark
        self.storage_dir = os.path.abspath(storage_dir)
        self.ship_dir = os.path.abspath(ship_dir)
        self.node_id = node_id
        self.promoted = False
        self._started_unix = time.time()  # maybe_promote no-heartbeat grace
        # in-process guard: the follower loop and manual apply_pending()
        # must not interleave a reseed swap with an incremental copy
        self._apply_lock = threading.Lock()
        os.makedirs(self.storage_dir, exist_ok=True)
        self.session = None
        self._rebuild_session()

    def _state_path(self) -> str:
        return os.path.join(self.storage_dir, REPLICA_STATE)

    def _rebuild_session(self) -> None:
        from driftdb_spark.sql_frontend import DriftSession

        self.session = DriftSession(self.spark, self.storage_dir)
        # SHOW REPLICATION STATUS answers from this (zero-job) snapshot —
        # wire clients on a standby can introspect lag without JSON/HTTP
        self.session._replica_status_fn = self._wire_status
        if not self.promoted:
            self.session._read_only = True
            for _name, (log, _cols) in self.session._tables.items():
                log.read_only = True

    # -- applying ---------------------------------------------------------------

    def apply_pending(self) -> dict:
        """Catch up to the stream manifest (reference CatchupRequest/
        CatchupResponse, replication.rs:103-108): copy unseen entries in,
        reseed any table whose generation advanced (upstream compact/
        purge), adopt the shipped catalog, refresh the session.

        Pure metadata work — per-entry copy + rename, no row-level apply.
        Idempotent and crash-safe: a torn copy stays hidden in a
        ``_staging-*`` sibling and re-runs cleanly."""
        with self._apply_lock:
            return self._apply_locked()

    def _apply_locked(self) -> dict:
        if self.promoted:
            raise RuntimeError("promoted replica no longer follows the stream")
        manifest = _stream_manifest(self.ship_dir)
        if manifest is None:
            return {"applied": 0, "tables": {}}
        state = _read_json(self._state_path(), {"tables": {}})
        # Two layers of zombie protection, neither of which costs
        # liveness (the old primary's last manifest stays appliable
        # between a promote and the new primary's first ship — a
        # stream-epoch equality check here would deadlock exactly that
        # backlog):
        # 1. _stream_manifest ranks epoch-stamped FILES, so a fenced
        #    zombie's late write lands in its own epoch's file and is
        #    simply outranked for every reader — caught-up, lagging, and
        #    freshly-seeded replicas alike.
        # 2. Epoch MONOTONICITY per replica (below): even if stamped
        #    files are lost and the legacy file regresses, a replica
        #    never applies a manifest older than one it already applied.
        applied_epoch = int(state.get("manifest_epoch", 0))
        manifest_epoch = manifest.get("epoch")
        if manifest_epoch is not None and int(manifest_epoch) < applied_epoch:
            return {"applied": 0, "tables": {}, "stale_epoch": True}
        if manifest_epoch is not None:
            state["manifest_epoch"] = int(manifest_epoch)
        applied: dict[str, int] = {}
        total = 0
        for name, t in sorted(manifest["tables"].items()):
            gen = int(t["generation"])
            gen_dir = os.path.join(self.ship_dir, name, f"gen-{gen:06d}")
            local = state["tables"].get(
                name, {"generation": 0, "entries": [], "snapshots": []}
            )
            tbl_dir = os.path.join(self.storage_dir, name)

            def _adopt_meta(dest_dir: str) -> None:
                # Persist the primary's sequence floor / rewrite
                # generation into the local table meta (max-merged, so a
                # replayed older manifest can never lower the floor): a
                # later promote() makes this log writable, and its
                # sequence clock must resume ABOVE everything the primary
                # ever assigned — even if the shipped generation was
                # post-purge and carries no events at those sequences.
                if "seq_floor" not in t:
                    return  # pre-meta manifest (legacy primary)
                cur = _read_json(
                    os.path.join(dest_dir, "meta.json"),
                    {"seq_floor": 0, "generation": 0, "rewrite_id": ""},
                )
                _write_json_atomic(
                    os.path.join(dest_dir, "meta.json"),
                    {
                        "seq_floor": max(
                            int(cur.get("seq_floor", 0)), int(t["seq_floor"])
                        ),
                        "generation": max(
                            int(cur.get("generation", 0)),
                            int(t.get("log_generation", 0)),
                        ),
                        "rewrite_id": t.get("rewrite_id", ""),
                    },
                )

            n = 0
            if local["generation"] != gen:
                # reseed: build the new generation aside, then swap — a
                # reader mid-scan of the old tree finishes against moved-
                # aside files, same as the EventLog's swap protocol
                fresh = tbl_dir + f".reseed-{uuid.uuid4().hex[:8]}"
                os.makedirs(fresh, exist_ok=True)  # empty live set is valid
                for e in t["entries"]:
                    _atomic_copy(
                        os.path.join(gen_dir, "events", e),
                        os.path.join(fresh, "events", e),
                    )
                    n += 1
                for s in t["snapshots"]:
                    _atomic_copy(
                        os.path.join(gen_dir, "snapshots", s),
                        os.path.join(fresh, "snapshots", s),
                    )
                _adopt_meta(fresh)
                old = tbl_dir + f".old-{uuid.uuid4().hex[:8]}"
                if os.path.exists(tbl_dir):
                    os.rename(tbl_dir, old)
                    os.rename(fresh, tbl_dir)
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(fresh, tbl_dir)
            else:
                for e in t["entries"]:
                    if e not in set(local["entries"]):
                        _atomic_copy(
                            os.path.join(gen_dir, "events", e),
                            os.path.join(tbl_dir, "events", e),
                        )
                        n += 1
                for s in t["snapshots"]:
                    if s not in set(local["snapshots"]):
                        _atomic_copy(
                            os.path.join(gen_dir, "snapshots", s),
                            os.path.join(tbl_dir, "snapshots", s),
                        )
                _adopt_meta(tbl_dir)
            state["tables"][name] = {
                "generation": gen,
                "entries": t["entries"],
                "snapshots": t["snapshots"],
            }
            applied[name] = n
            total += n
        cat = os.path.join(self.ship_dir, CATALOG_FILE)
        if os.path.exists(cat):
            tmp = os.path.join(
                self.storage_dir, f"_cat-tmp-{uuid.uuid4().hex[:8]}"
            )
            shutil.copy2(cat, tmp)
            os.replace(tmp, os.path.join(self.storage_dir, CATALOG_FILE))
        _write_json_atomic(self._state_path(), state)
        self._rebuild_session()
        return {"applied": total, "tables": applied}

    # -- monitoring -------------------------------------------------------------

    def _heartbeat(self) -> dict | None:
        hb = _read_json(os.path.join(self.ship_dir, HEARTBEAT_FILE))
        if hb is None:
            return None
        # a heartbeat carrying a pre-promote epoch is a zombie's — inert
        # (failover.rs:421-439 stale-token rejection, replica side)
        if hb["epoch"] < _stream_epoch(self.ship_dir)["epoch"]:
            return None
        return hb

    def lag(self) -> dict:
        """Per-table sequence lag vs the primary heartbeat + heartbeat age
        (reference get_replication_lag, replication.rs:612-620)."""
        hb = self._heartbeat()
        tables = {}
        if hb is not None:
            for name, t in hb.get("tables", {}).items():
                have = 0
                if self.session is not None and name in self.session._tables:
                    have = self.session._tables[name][0].last_sequence()
                tables[name] = int(t["last_sequence"]) - have
        return {
            "heartbeat_age_sec": (
                None if hb is None else round(time.time() - hb["ts_unix"], 3)
            ),
            "stream_epoch": _stream_epoch(self.ship_dir)["epoch"],
            "tables": tables,
            "max_lag": max(tables.values(), default=0),
        }

    def lag_entries(self) -> dict:
        """Filesystem-metadata lag — shipped-but-unapplied LOG ENTRIES per
        table plus heartbeat age, with ZERO Spark jobs (pure manifest/state
        JSON reads), so a metrics scrape stays sub-ms while a long query
        holds the executors. The scrape-safe twin of :meth:`lag` (which
        compares sequences and runs a Spark aggregate per table).

        Reads the same epoch-ranked manifest the apply path uses
        (:func:`_stream_manifest`) — measuring lag against a manifest the
        apply path would refuse would leave ``max_lag_entries`` pinned
        above zero and wedge the follower loop's backlog-first guard."""
        manifest = _stream_manifest(self.ship_dir, {"tables": {}})
        state = _read_json(self._state_path(), {"tables": {}})
        tables = {}
        for name, t in manifest["tables"].items():
            local = state["tables"].get(
                name, {"generation": 0, "entries": []}
            )
            if local["generation"] != int(t["generation"]):
                tables[name] = len(t["entries"])  # reseed pending: all of it
            else:
                tables[name] = len(set(t["entries"]) - set(local["entries"]))
        hb = self._heartbeat()
        return {
            "heartbeat_age_sec": (
                None if hb is None else round(time.time() - hb["ts_unix"], 3)
            ),
            "tables": tables,
            "max_lag_entries": max(tables.values(), default=0),
        }

    def metric_providers(self) -> dict:
        """Gauges for the observability AlertManager (reference
        get_max_replication_lag, alerting.rs:561+ feeding the
        HighReplicationLag/CriticalReplicationLag defaults). A provider
        raising (e.g. no heartbeat yet) makes its metric absent for that
        scrape, so the matching rules skip — same contract as the pool
        family."""

        def _max_lag() -> float:
            return float(self.lag_entries()["max_lag_entries"])

        def _hb_age() -> float:
            age = self.lag_entries()["heartbeat_age_sec"]
            if age is None:
                raise RuntimeError("no heartbeat on the stream yet")
            return float(age)

        return {
            "replication_max_lag_entries": _max_lag,
            "replication_heartbeat_age_sec": _hb_age,
        }

    def _wire_status(self) -> dict:
        """The SHOW REPLICATION STATUS payload: role + entry-lag, all from
        manifest/state JSON (no Spark job — safe for wire scrapes)."""
        le = self.lag_entries()
        return {
            "role": "primary" if self.promoted else "replica",
            "read_only": not self.promoted,
            "stream_epoch": _stream_epoch(self.ship_dir)["epoch"],
            "heartbeat_age_sec": le["heartbeat_age_sec"],
            "max_lag_entries": le["max_lag_entries"],
            "tables": le["tables"],
        }

    def status(self) -> dict:
        lag = self.lag()
        return {
            "role": "primary" if self.promoted else "replica",
            "node": self.node_id,
            "read_only": not self.promoted,
            **lag,
        }

    # -- failover ---------------------------------------------------------------

    def promote(self) -> ReplicationPrimary:
        """Take over the stream: claim the next fencing epoch (exactly one
        claimant wins — failover.rs FencingToken::next), flip this node
        writable, and return a :class:`ReplicationPrimary` bound to the
        SAME stream so the old primary's ship() is refused and downstream
        replicas keep following without re-pointing.

        Applies the shipped backlog FIRST: promoting behind entries the
        stream already holds would silently discard acknowledged writes
        (the follower loop guards this; the manual path — including
        ``cli replicate promote`` — must too; the reference likewise
        elects the most-caught-up node, failover.rs:178+)."""
        self.apply_pending()
        cur = _stream_epoch(self.ship_dir)
        new_epoch = int(cur["epoch"]) + 1
        primary = ReplicationPrimary(
            self.session, self.ship_dir, node_id=self.node_id, _claim=new_epoch
        )
        self.promoted = True
        self.session._read_only = False
        for _name, (log, _cols) in self.session._tables.items():
            log.read_only = False
        return primary

    def maybe_promote(self, stale_after_sec: float) -> ReplicationPrimary | None:
        """Auto-failover: promote iff the primary heartbeat is missing or
        older than the threshold (reference failover_timeout_ms,
        replication.rs:44; health-check path failover.rs:178+). Returns
        the new primary handle, or None while the primary looks alive."""
        hb = self._heartbeat()
        if hb is not None and (time.time() - hb["ts_unix"]) < stale_after_sec:
            return None
        if hb is None:
            # No heartbeat at all. A primary writes one at construction,
            # so either no primary ever claimed this stream, or one
            # claimed and died/stalled, or the heartbeat file was lost.
            # The grace is measured from STREAM facts — the freshest of
            # the epoch claim time and the last manifest write (a live
            # primary touches the manifest on every ship, so a lost
            # heartbeat on an ACTIVE stream still holds failover off
            # until ships stop for a full window) — so a one-shot caller
            # (cli replicate promote --if-stale) gets the same answer as
            # a long-lived follower loop instead of resetting the clock
            # per invocation. A virgin stream anchors on replica start.
            cur = _stream_epoch(self.ship_dir)
            if cur["epoch"] > 0:
                anchor = float(cur.get("changed_unix", 0))
                try:
                    anchor = max(
                        anchor,
                        os.path.getmtime(
                            os.path.join(self.ship_dir, MANIFEST_FILE)
                        ),
                    )
                except OSError:
                    pass
            else:
                anchor = self._started_unix
            if (time.time() - anchor) < stale_after_sec:
                return None
        return self.promote()

    def follow(
        self,
        interval_sec: float = 1.0,
        failover_after_sec: float | None = None,
        on_promote=None,
    ) -> "FollowerLoop":
        """Run the standby loop in a daemon thread: apply pending entries
        every ``interval_sec`` (reference sync_interval_ms,
        replication.rs:42, the coordinator's background sync), and — when
        ``failover_after_sec`` is set — auto-promote once the primary
        heartbeat goes stale past it, BUT only after the backlog the
        stream already holds is applied (promoting behind known shipped
        data would discard acknowledged writes; the reference's failover
        likewise elects the most-caught-up node, failover.rs:178+).
        ``on_promote(new_primary)`` fires once after a promotion. Returns
        a handle with ``.stop()``; the loop also stops itself after a
        promotion (a primary does not follow)."""
        loop = FollowerLoop(self, interval_sec, failover_after_sec, on_promote)
        loop.start()
        return loop


class FollowerLoop:
    """Background apply/auto-failover loop for a :class:`Replica`."""

    def __init__(self, replica, interval_sec, failover_after_sec, on_promote):
        import threading

        self.replica = replica
        self.interval_sec = interval_sec
        self.failover_after_sec = failover_after_sec
        self.on_promote = on_promote
        self.promoted_to: ReplicationPrimary | None = None
        self.applies = 0
        self.errors: list[str] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                out = self.replica.apply_pending()
                if out["applied"]:
                    self.applies += 1
                if (
                    self.failover_after_sec is not None
                    and self.replica.lag_entries()["max_lag_entries"] == 0
                ):
                    new_primary = self.replica.maybe_promote(
                        self.failover_after_sec
                    )
                    if new_primary is not None:
                        self.promoted_to = new_primary
                        if self.on_promote is not None:
                            self.on_promote(new_primary)
                        return
            except Exception as exc:  # keep following through transient I/O
                self.errors.append(f"{type(exc).__name__}: {exc}")
            self._stop.wait(self.interval_sec)

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        self._thread.join(timeout)
