"""Administrative inspection surface (reference driftdb-admin
main.rs:36-138: status | health | verify | indexes | config | migrate
status) — each command against a real persisted catalog, plus corruption
scenarios proving `verify` actually detects what it claims to."""

from __future__ import annotations

import json
import os
import shutil

from driftdb_spark import admin
from driftdb_spark.cli import main
from driftdb_spark.sql_frontend import DriftSession


def _mkdb(spark, tmp_path, name="admdata"):
    data = str(tmp_path / name)
    sess = DriftSession(spark, data)
    sess.sql("CREATE TABLE items (iid INT PRIMARY KEY, name STRING, qty INT)")
    sess.sql("INSERT INTO items VALUES (1, 'bolt', 5), (2, 'nut', 9), (3, 'bolt', 2)")
    sess.sql("UPDATE items SET qty = qty + 1 WHERE iid = 1")
    return data, sess


def _run(capsys, spark, *argv, expect_rc=0):
    rc = main(list(argv), spark=spark)
    assert rc == expect_rc
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines() if line.strip()]


def test_admin_status_and_counts(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path)
    st = admin.status(sess)
    assert st["total_tables"] == 1 and st["total_bytes"] > 0
    t = st["tables"]["items"]
    assert t["pk"] == "iid" and t["columns"] == 3
    assert t["batch_dirs"] == 2 and t["staging_orphans"] == 0
    assert "events" not in t  # cheap scrape runs no jobs
    st = admin.status(sess, counts=True)
    t = st["tables"]["items"]
    assert t["events"] == 4 and t["last_sequence"] == 4
    assert st["engine"]["statements_total"] >= 3


def test_admin_health(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path)
    rep = admin.health_check(sess, verbose=True)
    assert rep["ok"]
    assert rep["checks"]["catalog_parses"] == "ok"
    assert rep["checks"]["table:items"] == "ok"
    # orphaned staging dir (torn append leftover) -> surfaced as warn, not error
    log = sess.table("items")
    os.makedirs(os.path.join(log._events_dir, "_staging-deadbeef"))
    rep = admin.health_check(sess)
    assert rep["ok"] and rep["checks"]["staging_orphans"].startswith("warn")


def test_admin_verify_clean_and_checksums(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path)
    sess.table("items").snapshot()
    rep = admin.verify_integrity(sess, checksums=True)
    assert rep["ok"]
    r = rep["tables"]["items"]
    assert r["sequence_duplicates"] == 0 and r["batch_misaligned"] == 0
    assert r["pk_duplicates"] == 0 and r["snapshots"] == "ok"
    assert r["checksum_rows"] == 4 + 3  # 4 events + 3 snapshot rows


def test_admin_verify_detects_duplicated_batch(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path, "admdup")
    log = sess.table("items")
    batches = sorted(
        d for d in os.listdir(log._events_dir) if d.startswith("batch-")
    )
    # replay an existing batch under a wrong-sequence claim: duplicate
    # sequences AND a name/min-sequence mismatch
    shutil.copytree(
        os.path.join(log._events_dir, batches[0]),
        os.path.join(log._events_dir, "batch-" + "9".zfill(20)),
    )
    rep = admin.verify_integrity(sess)
    r = rep["tables"]["items"]
    assert not rep["ok"]
    assert r["sequence_duplicates"] > 0 and r["batch_misaligned"] > 0


def test_admin_verify_detects_constraint_violation(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path, "admcons")
    # declare uniqueness AFTER loading duplicate names by editing the
    # constraint store directly (the DDL path would reject existing dups)
    from driftdb_spark.constraints import TableConstraints

    cons = TableConstraints()
    cons.add_unique(["name"], "u_name")
    sess._constraints["items"] = cons
    rep = admin.verify_integrity(sess, table="items")
    assert not rep["ok"]
    assert str(rep["tables"]["items"]["constraints"]).startswith("violation")


def test_admin_verify_detects_bit_rot(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path, "admrot")
    log = sess.table("items")
    # flip a parquet file's tail (footer+page checksums) — only the
    # decompressing checksum pass should catch it
    victim = None
    for root, _dirs, files in os.walk(log._events_dir):
        for f in files:
            if f.endswith(".parquet"):
                victim = os.path.join(root, f)
                break
    assert victim
    with open(victim, "r+b") as fh:
        fh.seek(-16, os.SEEK_END)
        fh.write(b"\x00" * 16)
    rep = admin.verify_integrity(sess, checksums=True)
    assert not rep["ok"]
    assert str(rep["tables"]["items"]["checksum_rows"]).startswith("error")


def test_admin_index_stats(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path, "admidx")
    sess.sql("CREATE UNIQUE INDEX u_qty ON items (qty)")
    rows = admin.index_stats(sess)
    by_name = {r["index"]: r for r in rows}
    assert by_name["PRIMARY"]["unique"] and by_name["PRIMARY"]["columns"] == ["iid"]
    assert by_name["u_qty"]["rows"] == 3 and by_name["u_qty"]["unique"]


def test_admin_config_and_migrations(spark, tmp_path):
    _data, sess = _mkdb(spark, tmp_path, "admcfg")
    cfg = admin.config_dump(sess)
    assert cfg["storage"]["tables"] == ["items"]
    assert cfg["spark"]["spark.sql.ansi.enabled"] == "true"
    assert set(admin.config_dump(sess, section="spark")) == {"spark"}

    from driftdb_spark.migrations import Migration, MigrationManager

    mgr = MigrationManager(sess)
    mgr.add(
        Migration(
            version="001",
            description="widen",
            up=["ALTER TABLE items ADD COLUMN note STRING"],
            down=[],
        )
    )
    assert admin.migration_status(sess)["current_version"] is None
    mgr.migrate_all()
    st = admin.migration_status(sess)
    assert st["current_version"] == "001"
    assert st["applied"][0]["description"] == "widen"


def test_admin_cli_surface(spark, tmp_path, capsys):
    data, _sess = _mkdb(spark, tmp_path, "admcli")
    st = _run(capsys, spark, "--data", data, "admin", "status")[0]
    assert st["total_tables"] == 1
    rep = _run(capsys, spark, "--data", data, "admin", "health", "--verbose")[0]
    assert rep["ok"]
    rep = _run(capsys, spark, "--data", data, "admin", "verify", "--checksums")[0]
    assert rep["ok"]
    rows = _run(capsys, spark, "--data", data, "admin", "indexes")
    assert rows[0]["index"] == "PRIMARY"
    cfg = _run(capsys, spark, "--data", data, "admin", "config",
               "--section", "storage")[0]
    assert cfg["storage"]["tables"] == ["items"]
    st = _run(capsys, spark, "--data", data, "admin", "migrations")[0]
    assert st["applied"] == [] and st["current_version"] is None


def test_admin_cli_verify_exit_code(spark, tmp_path, capsys):
    data, sess = _mkdb(spark, tmp_path, "admrc")
    log = sess.table("items")
    batches = sorted(
        d for d in os.listdir(log._events_dir) if d.startswith("batch-")
    )
    shutil.copytree(
        os.path.join(log._events_dir, batches[0]),
        os.path.join(log._events_dir, "batch-" + "7".zfill(20)),
    )
    rep = _run(capsys, spark, "--data", data, "admin", "verify", expect_rc=1)[0]
    assert not rep["ok"]
