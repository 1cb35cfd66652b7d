"""CLI surface (reference driftdb-cli main.rs:146-449) driven in-process
against the persisted catalog — CREATE/INSERT/UPDATE via `sql -e`, then
select/drift/snapshot/compact/analyze/tables subcommands, each a fresh
DriftSession proving the catalog round-trips."""

from __future__ import annotations

import json

import pytest

from driftdb_spark.cli import main


def _run(capsys, spark, *argv):
    rc = main(list(argv), spark=spark)
    assert rc == 0
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines() if line.strip()]


def test_cli_end_to_end(spark, tmp_path, capsys):
    data = str(tmp_path / "clidata")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "CREATE TABLE items (iid INT PRIMARY KEY, name STRING, qty INT)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO items VALUES (1, 'bolt', 5), (2, 'nut', 9)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "UPDATE items SET qty = qty + 1 WHERE iid = 1")

    rows = _run(capsys, spark, "--data", data, "select", "items", "--where", "qty > 5")
    assert {r["iid"] for r in rows} == {1, 2}

    rows = _run(capsys, spark, "--data", data, "select", "items", "--as-of", "@seq:2")
    assert {(r["iid"], r["qty"]) for r in rows} == {(1, 5), (2, 9)}

    hist = _run(capsys, spark, "--data", data, "drift", "items", "--key", "1")
    assert [h["event_type"] for h in hist] == ["INSERT", "PATCH"]

    snap = _run(capsys, spark, "--data", data, "snapshot", "items")
    assert snap[0]["ok"] and snap[0]["snapshot_seq"] == 3
    _run(capsys, spark, "--data", data, "compact", "items")

    rows = _run(capsys, spark, "--data", data, "select", "items")
    assert {(r["iid"], r["qty"]) for r in rows} == {(1, 6), (2, 9)}

    tables = _run(capsys, spark, "--data", data, "tables")
    assert tables[0]["table"] == "items" and tables[0]["pk"] == "iid"

    stats = _run(capsys, spark, "--data", data, "analyze", "items")
    assert any(s.get("column") in ("iid", "qty", "name") or s for s in stats)


def test_cli_backup_restore_verify(spark, tmp_path, capsys):
    data = str(tmp_path / "clidata")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "CREATE TABLE items (iid INT PRIMARY KEY, qty INT)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO items VALUES (1, 5), (2, 9)")
    b1 = str(tmp_path / "b1")
    out = _run(capsys, spark, "--data", data, "backup", b1)
    assert out[0]["ok"] and out[0]["type"] == "full"
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO items VALUES (3, 7)")
    b2 = str(tmp_path / "b2")
    out = _run(capsys, spark, "--data", data, "backup", b2, "--parent", b1)
    assert out[0]["type"] == "incremental"
    assert _run(capsys, spark, "--data", data, "verify-backup", b2)[0]["ok"]
    restored = str(tmp_path / "restored")
    out = _run(capsys, spark, "--data", restored, "restore", b2)
    assert out[0]["ok"] and out[0]["tables"] == ["items"]
    rows = _run(capsys, spark, "--data", restored, "select", "items")
    assert {(r["iid"], r["qty"]) for r in rows} == {(1, 5), (2, 9), (3, 7)}


def test_cli_replicate_ship_apply_promote(spark, tmp_path, capsys):
    """replicate ship/apply/status/promote round-trip (reference
    replication.rs master/slave roles, failover.rs promote)."""
    data = str(tmp_path / "primary")
    stream = str(tmp_path / "stream")
    standby = str(tmp_path / "standby")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "CREATE TABLE kv (k INT PRIMARY KEY, v STRING)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO kv VALUES (1, 'x'), (2, 'y')")

    out = _run(capsys, spark, "--data", data, "replicate", "ship", "--to", stream)
    assert out[0]["ok"] and out[0]["epoch"] == 1 and out[0]["shipped"]["kv"] >= 1

    out = _run(capsys, spark, "--data", standby, "replicate", "apply", "--from", stream)
    assert out[0]["applied"] >= 1 and out[0]["lag"]["max_lag"] == 0

    rows = _run(capsys, spark, "--data", standby, "select", "kv")
    assert {r["k"] for r in rows} == {1, 2}

    st = _run(capsys, spark, "--data", standby, "replicate", "status", "--from", stream)
    assert st[0]["role"] == "replica" and st[0]["read_only"]

    # fresh heartbeat: the guarded promote refuses (exit 1)
    rc = main(["--data", standby, "replicate", "promote", "--from", stream,
               "--if-stale", "3600"], spark=spark)
    assert rc == 1
    capsys.readouterr()

    out = _run(capsys, spark, "--data", standby, "replicate", "promote", "--from", stream)
    assert out[0]["promoted"] and out[0]["epoch"] == 2

    # promoted standby accepts writes; the fenced old primary cannot ship
    _run(capsys, spark, "--data", standby, "sql", "-e",
         "INSERT INTO kv VALUES (3, 'z')")
    from driftdb_spark.replication import FencedPrimary

    with pytest.raises(FencedPrimary):
        main(["--data", data, "replicate", "ship", "--to", stream], spark=spark)
    capsys.readouterr()


def test_cli_replicate_follow_bounded(spark, tmp_path, capsys):
    """replicate follow with --max-seconds: applies the backlog then exits."""
    data = str(tmp_path / "p2")
    stream = str(tmp_path / "s2")
    standby = str(tmp_path / "r2")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "CREATE TABLE kv2 (k INT PRIMARY KEY, v STRING)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO kv2 VALUES (1, 'x')")
    _run(capsys, spark, "--data", data, "replicate", "ship", "--to", stream)
    out = _run(capsys, spark, "--data", standby, "replicate", "follow",
               "--from", stream, "--interval", "0.2", "--max-seconds", "4")
    assert out[0]["ok"] and out[0]["applies"] >= 1 and not out[0]["promoted"]
    rows = _run(capsys, spark, "--data", standby, "select", "kv2")
    assert [r["k"] for r in rows] == [1]


def test_cli_purge(spark, tmp_path, capsys):
    data = str(tmp_path / "clipurge")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "CREATE TABLE p (id INT PRIMARY KEY, v INT)")
    _run(capsys, spark, "--data", data, "sql", "-e",
         "INSERT INTO p VALUES (1, 10), (2, 20)")
    out = _run(capsys, spark, "--data", data, "purge", "p", "2")
    assert out[0]["ok"] and out[0]["events_removed"] == 1
    rows = _run(capsys, spark, "--data", data, "select", "p")
    assert [r["id"] for r in rows] == [1]
