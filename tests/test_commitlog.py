"""The Delta-commit-protocol mapping for the sequence clock (SCALE.md §6),
executable: CommitLogMetaStore replaces the flock'd meta.json with a
``_delta_log``-shaped commit directory, and the WHOLE engine (append,
purge, replication ship) runs on it unchanged. Reference behavior being
matched: the persisted monotonic per-table counter,
driftdb-core/src/storage/table_storage.rs:212-261."""

from __future__ import annotations

import os
import threading

import pytest

from driftdb_spark.commitlog import CommitLogMetaStore
from driftdb_spark.events import EventLog, JsonFileMetaStore
from driftdb_spark.replication import Replica, ReplicationPrimary
from driftdb_spark.sql_frontend import DriftSession


def test_commit_claim_is_put_if_absent(tmp_path):
    """Two writers racing for the same version: exactly one wins; the
    loser re-reads and lands on the NEXT version (Delta's optimistic-
    concurrency commit loop, no flock anywhere)."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    assert store._try_commit(1, {"kind": "append", "seq_floor": 3})
    assert not store._try_commit(1, {"kind": "append", "seq_floor": 99})
    m = store.read()
    assert m["version"] == 1 and m["seq_floor"] == 3

    # 8 concurrent bumpers: versions come out contiguous, floor = max
    def bump(i):
        store.bump(seq_floor=10 + i)

    ts = [threading.Thread(target=bump, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    m = store.read()
    assert m["version"] == 9  # 1 seed + 8 bumps, no gaps, no double-claims
    assert m["seq_floor"] == 17
    assert [c["version"] for c in store.commits()] == list(range(1, 10))


def test_clock_is_monotone_by_construction(tmp_path):
    """Commits are append-only: a rewrite ADDS a commit, so no sequence
    of operations can lower seq_floor or un-count a rewrite — the r10
    purge-to-empty clock reset is unrepresentable in this protocol."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    store.bump(seq_floor=5)
    store.bump(seq_floor=0, rewrite=True)  # purge-to-empty shape
    m = store.read()
    assert m["seq_floor"] == 5 and m["generation"] == 1 and m["rewrite_id"]
    store.bump(seq_floor=2)  # late small floor can never regress the clock
    assert store.read()["seq_floor"] == 5
    # crash between scratch write and publish leaves only invisible
    # scratch (an uncommitted Delta file), never a torn commit
    open(os.path.join(store.log_dir, "_tmp-deadbeef"), "w").write("{garbage")
    assert store.read()["seq_floor"] == 5
    store.bump(seq_floor=6)
    assert store.read()["version"] == 4


def test_rewrites_since_is_a_version_range_scan(tmp_path):
    """Consumer-side mapping: ship/backup/IMV/cache ask 'did a rewrite
    land since the version I last saw' — a version-range scan, not a
    generation-integer compare."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    store.bump(seq_floor=1)
    v0 = store.version()
    assert store.rewrites_since(v0) == []
    store.bump(seq_floor=1, rewrite=True)   # compact
    store.bump(seq_floor=4)                 # append after it
    store.bump(seq_floor=4, rewrite=True)   # purge
    hits = store.rewrites_since(v0)
    assert [c["kind"] for c in hits] == ["rewrite", "rewrite"]
    assert all(c["version"] > v0 for c in hits)
    # and a consumer that caught up to the first rewrite sees only the second
    assert len(store.rewrites_since(hits[0]["version"])) == 1


def test_eventlog_runs_whole_engine_on_commit_protocol(spark, tmp_path):
    """The r10 falsifying program (del 1 / ins 5 / ship / ins 1 / purge 1
    / upd 1 / purge 5 / ins 1) replayed with the PRIMARY's sequence clock
    on the commit-log store: the engine's append/purge/ship paths consume
    the meta through the same two-method interface, so the clock stays
    monotone, batch names never alias, and the replica converges —
    proving read_meta/_bump_meta collapse into the commit protocol with
    no other engine change."""
    sess = DriftSession(spark, str(tmp_path / "primary"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    log, _cols = sess._tables["t"]
    assert isinstance(log.meta_store, JsonFileMetaStore)
    log.meta_store = CommitLogMetaStore(log.path)  # the one-line swap
    primary = ReplicationPrimary(sess, str(tmp_path / "stream"))
    replica = Replica(spark, str(tmp_path / "replica"), str(tmp_path / "stream"))

    sess.sql("DELETE FROM t WHERE id = 1")        # no-op: publishes nothing
    sess.sql("INSERT INTO t VALUES (5, 0)")        # seq 1 -> batch-…0001
    primary.ship()
    replica.apply_pending()
    sess.sql("INSERT INTO t VALUES (1, 0)")        # seq 2
    log.purge(spark.createDataFrame([(1,)], "id int"))
    sess.sql("UPDATE t SET v = 0 WHERE id = 1")    # purged pk: no-op
    log.purge(spark.createDataFrame([(5,)], "id int"))  # log now EMPTY
    assert log.last_sequence() >= 2                # commit-log clock held
    sess.sql("INSERT INTO t VALUES (1, 0)")        # must NOT reuse batch-…0001
    assert log._log_entries() == ["batch-00000000000000000003"]

    primary.ship()
    replica.apply_pending()
    want = sorted((r["id"], r["v"]) for r in sess.sql("SELECT id, v FROM t").collect())
    got = sorted(
        (r["id"], r["v"])
        for r in replica.session.sql("SELECT id, v FROM t").collect()
    )
    assert want == [(1, 0)] and got == want
    rlog, _c = replica.session._tables["t"]
    assert rlog.events().filter("pk = '5'").count() == 0

    # and the commit log itself tells the whole story: two rewrite
    # commits (the purges), every append bumped the version, floor ≥ 3
    m = log.meta_store.read()
    assert m["generation"] == 2 and m["seq_floor"] >= 3
    assert len(log.meta_store.rewrites_since(0)) == 2


def test_eventlog_append_compact_on_commit_protocol(spark, tmp_path):
    """Plain EventLog lifecycle (insert/patch/compact/time-travel) with
    the commit-log store injected at construction — the constructor-arg
    path, not the attribute swap."""
    path = str(tmp_path / "tbl")
    log = EventLog(
        spark, path, pk_col="id", meta_store=CommitLogMetaStore(path)
    )
    log.insert(spark.createDataFrame([(1, 10), (2, 20)], "id int, v int"))
    log.patch(spark.createDataFrame([(1, 11)], "id int, v int"))
    assert log.last_sequence() == 3
    v_before = log.meta_store.version()
    log.compact()
    assert log.meta_store.rewrites_since(v_before), "compact must commit a rewrite"
    assert log.last_sequence() == 3  # rewrite never lowers the clock
    state = {r["pk"]: r["row"]["v"] for r in log.state_at().collect()}
    assert state == {"1": "11", "2": "20"}


def test_checkpoints_bound_read_cost_and_fold_identically(tmp_path):
    """Every CHECKPOINT_INTERVAL commits the winner writes
    <version>.checkpoint.json (Delta's checkpoint mechanism); read()
    then opens the latest checkpoint plus the tail, so per-read file
    opens are bounded by the interval instead of growing with table
    lifetime (review-found O(n^2)). A checkpointed fold must equal the
    from-scratch fold."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    for i in range(1, 26):
        store.bump(seq_floor=i, rewrite=(i % 7 == 0))
    cps = store._checkpoint_files()
    assert len(cps) == 2  # versions 10 and 20
    fast = store.read()
    # from-scratch fold (checkpoints ignored) must agree exactly
    slow = {"seq_floor": 0, "generation": 0, "rewrite_id": "", "version": 0}
    for c in store.commits():
        slow["seq_floor"] = max(slow["seq_floor"], c["seq_floor"])
        if c.get("kind") == "rewrite":
            slow["generation"] += 1
            slow["rewrite_id"] = c["rewrite_id"]
        slow["version"] = c["version"]
    assert fast == slow
    assert fast["version"] == 25 and fast["generation"] == 3  # 7,14,21
    # and the read path provably uses the checkpoint: folding only the
    # tail after v20 with the checkpoint base is what read() returns even
    # if every pre-checkpoint commit file disappears
    for n in store._commit_files():
        if int(n[: -len(".json")]) <= 20:
            os.remove(os.path.join(store.log_dir, n))
    assert store.read() == fast


def test_bump_reports_its_own_commit_not_a_rivals(tmp_path):
    """bump() returns the folded state AS OF the commit it won: a rival
    landing a later rewrite between our claim and our read must not leak
    its rewrite_id/generation into our return value (parity with
    JsonFileMetaStore, which returns exactly what it wrote under its
    lock)."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    orig_try = store._try_commit
    rival = CommitLogMetaStore(str(tmp_path / "t"))

    def race_after_win(version, body):
        won = orig_try(version, body)
        if won and body["kind"] == "rewrite":
            rival.bump(seq_floor=99, rewrite=True)  # lands at version+1
        return won

    store._try_commit = race_after_win
    mine = store.bump(seq_floor=5, rewrite=True)
    assert mine["version"] == 1 and mine["generation"] == 1
    assert mine["seq_floor"] == 5  # not the rival's 99
    full = store.read()
    assert full["version"] == 2 and full["generation"] == 2
    assert full["rewrite_id"] != mine["rewrite_id"]


def test_scratch_reclaimed_even_when_body_write_fails(tmp_path, monkeypatch):
    """A failed body write (ENOSPC shape) must not strand _tmp-* scratch
    in _commit_log (review-found leak: the dump ran before the
    try/finally)."""
    import json as _json

    store = CommitLogMetaStore(str(tmp_path / "t"))
    store.bump(seq_floor=1)

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(_json, "dump", boom)
    with pytest.raises(OSError):
        store.bump(seq_floor=2)
    monkeypatch.undo()
    assert not [n for n in os.listdir(store.log_dir) if n.startswith("_tmp-")]
    assert store.bump(seq_floor=2)["seq_floor"] == 2  # store still healthy


def test_checkpoint_write_failure_never_propagates(tmp_path, monkeypatch):
    """A checkpoint is pure acceleration: if its write fails (ENOSPC
    shape) AFTER the commit durably landed, bump() must still return
    success — raising would make the caller retry an operation that
    succeeded, double-advancing the clock (review-found)."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    real_link = os.link

    def no_space_for_checkpoints(src, dst):
        if dst.endswith(".checkpoint.json"):
            raise OSError(28, "No space left on device")
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", no_space_for_checkpoints)
    for i in range(1, 12):  # crosses the version-10 checkpoint boundary
        assert store.bump(seq_floor=i)["seq_floor"] == i
    assert store.version() == 11
    assert store._checkpoint_files() == []  # checkpoint lost, commits fine
    assert store.read()["seq_floor"] == 11  # readers just fold more commits


def test_pruned_history_is_conservative_not_silent(tmp_path):
    """Pruning commits behind a checkpoint (Delta retention) must not
    make the clock invisible or silently drop rewrites (review-found):
    exists()/version() consult checkpoints, and rewrites_since() with a
    watermark inside the pruned gap returns a conservative synthetic
    rewrite (consumers reseed — safe) instead of [] (the r10 divergence
    family)."""
    store = CommitLogMetaStore(str(tmp_path / "t"))
    for i in range(1, 13):
        store.bump(seq_floor=i, rewrite=(i == 5))
    for n in store._commit_files():
        if int(n[: -len(".json")]) <= 10:
            os.remove(os.path.join(store.log_dir, n))
    assert store.exists()  # checkpoint alone keeps the clock checkable
    assert store.version() == 12
    assert store.read()["seq_floor"] == 12
    hits = store.rewrites_since(3)  # watermark inside the pruned gap
    assert hits and hits[0]["kind"] == "rewrite" and hits[0]["conservative"]
    assert store.rewrites_since(10) == []  # at the checkpoint: exact
    # appends-only history stays exact too: no false-positive reseed
    quiet = CommitLogMetaStore(str(tmp_path / "q"))
    for i in range(1, 13):
        quiet.bump(seq_floor=i)
    for n in quiet._commit_files():
        if int(n[: -len(".json")]) <= 10:
            os.remove(os.path.join(quiet.log_dir, n))
    assert quiet.rewrites_since(3) == []
