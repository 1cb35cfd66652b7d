"""Backup / restore / verify over the event-sourced storage layout.

Reference: backup.rs:17-61 (manifest model), :78-155 (full), :156-249
(incremental), :250-291 (restore), :292+ (checksum verify).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from driftdb_spark.backup import BackupManager
from driftdb_spark.sql_frontend import DriftSession

COLS = {"id": "int", "name": "string", "qty": "int"}


@pytest.fixture
def sess(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path / "store"))
    log = s.create_table("products", COLS)
    log.insert(
        spark.createDataFrame(
            [(1, "bolt", 5), (2, "nut", 9), (3, "gear", 2)],
            "id int, name string, qty int",
        )
    )
    return s


def _rows(s):
    return {
        (r.id, r.name, r.qty)
        for r in s.sql("SELECT id, name, qty FROM products").collect()
    }


def test_full_backup_restore_and_verify(sess, spark, tmp_path):
    mgr = BackupManager(sess)
    b1 = str(tmp_path / "b1")
    m = mgr.create_full_backup(b1)
    assert m["type"] == "full" and "products" in m["tables"]
    assert BackupManager.verify(b1)
    # restore into a fresh dir: same rows, time travel intact
    target = str(tmp_path / "restored")
    BackupManager.restore(b1, target)
    r = DriftSession(spark, target)
    assert _rows(r) == {(1, "bolt", 5), (2, "nut", 9), (3, "gear", 2)}
    assert (
        r.sql("SELECT COUNT(*) AS n FROM products FOR SYSTEM_TIME AS OF @SEQ:2").first()["n"]
        == 2
    )
    # corrupt one backed-up file -> verify fails
    files = [
        os.path.join(root, f)
        for root, _d, fs in os.walk(b1)
        for f in fs
        if f.endswith(".parquet")
    ]
    with open(files[0], "ab") as fh:
        fh.write(b"x")
    assert not BackupManager.verify(b1)


def test_incremental_copies_only_new_entries(sess, spark, tmp_path):
    mgr = BackupManager(sess)
    b1 = str(tmp_path / "b1")
    mgr.create_full_backup(b1)
    # new writes after the full backup
    sess.sql("INSERT INTO products VALUES (4, 'cam', 7)")
    sess.sql("UPDATE products SET qty = qty + 1 WHERE id = 1")
    b2 = str(tmp_path / "b2")
    m2 = mgr.create_incremental_backup(b2, parent=b1)
    t = m2["tables"]["products"]
    assert m2["type"] == "incremental"
    # only the two new batches were copied; the live set is the full log
    assert len(t["entries_copied"]) == 2
    assert len(t["entries_live"]) == len(t["entries_copied"]) + 1
    assert BackupManager.verify(b2)
    target = str(tmp_path / "restored")
    BackupManager.restore(b2, target)
    r = DriftSession(spark, target)
    assert _rows(r) == {(1, "bolt", 6), (2, "nut", 9), (3, "gear", 2), (4, "cam", 7)}


def test_restore_does_not_resurrect_purged_rows(sess, spark, tmp_path):
    mgr = BackupManager(sess)
    b1 = str(tmp_path / "b1")
    mgr.create_full_backup(b1)
    log = sess.table("products")
    log.purge(sess.spark.createDataFrame([(2,)], "id int"))
    b2 = str(tmp_path / "b2")
    mgr.create_incremental_backup(b2, parent=b1)
    target = str(tmp_path / "restored")
    BackupManager.restore(b2, target)
    r = DriftSession(spark, target)
    # purged key absent from state AND from history after restore
    assert _rows(r) == {(1, "bolt", 5), (3, "gear", 2)}
    hist = r.sql("SELECT * FROM products FOR SYSTEM_TIME ALL")
    assert hist.filter(F.col("pk") == "2").count() == 0
    # restoring the PRE-purge backup still has the row (point-in-time copy)
    target_old = str(tmp_path / "restored_old")
    BackupManager.restore(b1, target_old)
    r_old = DriftSession(spark, target_old)
    assert (2, "nut", 9) in _rows(r_old)


def test_incremental_after_compaction(sess, spark, tmp_path):
    mgr = BackupManager(sess)
    b1 = str(tmp_path / "b1")
    mgr.create_full_backup(b1)
    log = sess.table("products")
    sess.sql("UPDATE products SET qty = 100 WHERE id = 3")
    log.compact()  # rewrites the log: entry names change wholesale
    b2 = str(tmp_path / "b2")
    m2 = mgr.create_incremental_backup(b2, parent=b1)
    t = m2["tables"]["products"]
    # every live entry is new (the rewrite), so all were copied
    assert set(t["entries_copied"]) == set(t["entries_live"])
    target = str(tmp_path / "restored")
    BackupManager.restore(b2, target)
    r = DriftSession(spark, target)
    assert _rows(r) == {(1, "bolt", 5), (2, "nut", 9), (3, "gear", 100)}


def test_backup_refuses_nonempty_dest(sess, tmp_path):
    mgr = BackupManager(sess)
    dest = tmp_path / "b"
    dest.mkdir()
    (dest / "junk").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        mgr.create_full_backup(str(dest))
    with pytest.raises(ValueError, match="not empty"):
        BackupManager.restore(str(dest), str(dest))


def test_restore_rehydrates_sequence_floor(sess, spark, tmp_path):
    """A restored store's sequence clock must resume ABOVE everything the
    backed-up store ever assigned — even when the backup captured a
    post-purge log that no longer carries those sequences. Without the
    floor, the first insert into the restored store would recycle retired
    sequences (the r10 aliasing bug, resurfacing through restore)."""
    log = sess.table("products")
    log.purge(spark.createDataFrame([(1,), (2,), (3,)], "id int"))  # empty log
    hw = log.last_sequence()
    assert hw >= 3  # the clock survived the purge on the source...
    b = str(tmp_path / "b_floor")
    BackupManager(sess).create_full_backup(b)
    target = str(tmp_path / "restored_floor")
    BackupManager.restore(b, target)
    r = DriftSession(spark, target)
    rlog = r.table("products")
    assert rlog.last_sequence() == hw  # ...and survives the restore
    end = rlog.insert(spark.createDataFrame([(9, "x", 1)], "id int, name string, qty int"))
    assert end == hw + 1


def test_incremental_reseeds_after_rewrite_reuses_entry_name(sess, spark, tmp_path):
    """A purge rewrite may emit a batch under a previously-backed-up name
    (batch-<minseq> with the purged rows removed). The incremental must
    NOT skip it by name — entry immutability holds only within a rewrite
    generation. Pre-fix this restored the PRE-purge bytes."""
    mgr = BackupManager(sess)
    b1 = str(tmp_path / "b1")
    mgr.create_full_backup(b1)
    log = sess.table("products")
    log.purge(spark.createDataFrame([(2,)], "id int"))
    # rewrite output reclaims the same batch-…0001 name (min seq 1 kept)
    assert log._log_entries() == ["batch-00000000000000000001"]
    b2 = str(tmp_path / "b2")
    m2 = mgr.create_incremental_backup(b2, parent=b1)
    # the aliased name was re-copied, not skipped
    assert "batch-00000000000000000001" in m2["tables"]["products"]["entries_copied"]
    target = str(tmp_path / "restored_reseed")
    BackupManager.restore(b2, target)
    r = DriftSession(spark, target)
    assert _rows(r) == {(1, "bolt", 5), (3, "gear", 2)}
    assert r.table("products").events().filter("pk = '2'").count() == 0


def test_backup_waits_out_a_live_rewrite(sess, tmp_path):
    """Each table's backup cut (entries + snapshots + meta + bytes) is
    taken under the rewrite lock: lock-free, a compact completing
    between the entry pin and the meta read records the NEW generation
    over OLD entry names/bytes — a child incremental then trusts the
    name chain and skips an aliased batch whose content changed, and
    restore serves stale bytes (a rewrite mid-copy also ENOENTs)."""
    import fcntl
    import threading

    log, _cols = sess._tables["products"]
    lk = open(os.path.join(log.path, ".rewrite.lock"), "w")
    fcntl.flock(lk, fcntl.LOCK_EX)  # a rival rewrite holds the table
    mgr = BackupManager(sess)
    done = threading.Event()
    result: dict = {}

    def run_backup():
        result["manifest"] = mgr.create_full_backup(str(tmp_path / "bk"))
        done.set()

    t = threading.Thread(target=run_backup, daemon=True)
    t.start()
    assert not done.wait(1.0)  # blocked behind the rewrite
    fcntl.flock(lk, fcntl.LOCK_UN)
    lk.close()
    assert done.wait(30.0)
    t.join()
    m = result["manifest"]["tables"]["products"]
    assert m["entries_copied"] and m["meta"]["generation"] == 0
