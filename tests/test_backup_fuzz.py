"""Property fuzz: restore(backup chain) ≡ primary, across rewrites.

Hypothesis generates random programs mixing DML (insert/update/delete),
log-REWRITING maintenance (snapshot/compact/purge — the ops that alias
entry names across generations), and incremental backups (each new
backup chains to the previous one). The program always ends with one
more incremental backup; restoring that leaf into a fresh directory
must reproduce the primary's visible state, keep purged keys' history
absent (a restore that resurrects purged rows has undone a compliance
erasure), resume the sequence clock at-or-above the primary's
high-water mark, and every chain member must pass checksum verify.

This is the replication fuzz's discipline pointed at the OTHER consumer
of entry-name immutability: backup.py's incremental skip chain trusts
names only within a rewrite generation (a compact/purge may reuse
batch-<minseq> with different bytes), so the chain walk + generation
voiding is exactly the machinery a random rewrite/backup interleaving
will break if it is wrong. The model is the primary itself, so any
divergence is a backup/restore bug by construction."""

from __future__ import annotations

import os

import pytest
from conftest import fuzz_examples
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from driftdb_spark.backup import BackupManager
from driftdb_spark.sql_frontend import DriftSession

_op = st.one_of(
    st.tuples(st.just("ins"), st.integers(1, 6), st.integers(0, 99)),
    st.tuples(st.just("upd"), st.integers(1, 6), st.integers(0, 99)),
    st.tuples(st.just("del"), st.integers(1, 6)),
    st.tuples(st.just("snapshot")),
    st.tuples(st.just("compact")),
    st.tuples(st.just("purge"), st.integers(1, 6)),
    st.tuples(st.just("backup")),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(4),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=st.lists(_op, min_size=3, max_size=8))
# fuzz-found at FUZZ_SCALE=10 (r13): purge, then RE-INSERT the same key,
# then soft-delete it — the key is absent from current state but its
# post-purge insert+delete events are NEW legitimate history (soft
# delete keeps history by design; the purge erased only PRIOR events).
# The model bug was "ever purged" ⇒ "no history forever"; temporal fuzz
# fixed the same model in r11 (purged.discard on re-insert), this suite
# and replication fuzz had kept the stale model.
@example(program=[("purge", 5), ("ins", 5, 0), ("del", 5)])
@pytest.mark.deepfuzz
def test_restored_chain_matches_primary(spark, tmp_path_factory, program):
    root = tmp_path_factory.mktemp("bkfuzz")
    sess = DriftSession(spark, str(root / "primary"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    mgr = BackupManager(sess)
    log, _cols = sess._tables["t"]
    backups: list[str] = []
    purged: set[int] = set()

    def take_backup() -> None:
        dest = str(root / f"b{len(backups)}")
        if backups:
            mgr.create_incremental_backup(dest, backups[-1])
        else:
            mgr.create_full_backup(dest)
        backups.append(dest)

    def current_ids():
        return {r["id"] for r in sess.sql("SELECT id FROM t").collect()}

    for op in program:
        kind = op[0]
        if kind == "ins":
            _k, pk, v = op
            if pk in current_ids():
                sess.sql(f"UPDATE t SET v = {v} WHERE id = {pk}")
            else:
                sess.sql(f"INSERT INTO t VALUES ({pk}, {v})")
            # a re-insert after a purge creates NEW legitimate history
            # (the purge erased only the prior events) — the key leaves
            # the erased set, mirroring test_temporal_fuzz's r11 model
            purged.discard(pk)
        elif kind == "upd":
            _k, pk, v = op
            sess.sql(f"UPDATE t SET v = {v} WHERE id = {pk}")
        elif kind == "del":
            sess.sql(f"DELETE FROM t WHERE id = {op[1]}")
        elif kind == "snapshot":
            log.snapshot()
        elif kind == "compact":
            log.compact()
        elif kind == "purge":
            log.purge(spark.createDataFrame([(op[1],)], "id int"))
            purged.add(op[1])
        elif kind == "backup":
            take_backup()

    take_backup()  # the leaf the restore materializes

    for b in backups:  # every chain member's bytes are intact
        assert BackupManager.verify(b)

    target = str(root / "restored")
    BackupManager.restore(backups[-1], target)
    rsess = DriftSession(spark, target)

    want = sorted(
        (r["id"], r["v"]) for r in sess.sql("SELECT id, v FROM t").collect()
    )
    got = sorted(
        (r["id"], r["v"]) for r in rsess.sql("SELECT id, v FROM t").collect()
    )
    assert got == want

    rlog, _c = rsess._tables["t"]
    # compliance: purged keys (still absent from current state) left no
    # replayable history in the restored store either
    live = {int(pk) for pk, _v in want}
    for pk in purged - live:
        assert rlog.events().filter(f"pk = '{pk}'").count() == 0
    # the restored clock resumes at-or-above the primary's high-water
    # mark: a restored post-purge store must never re-issue retired
    # sequences (AS OF identity, replication entry names)
    assert rlog.last_sequence() >= log.last_sequence()
