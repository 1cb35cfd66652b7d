"""EventLog: DML-as-events, patch-merge reconstruction, time travel,
snapshots, compaction — the DriftDB identity (reference
storage/table_storage.rs:344-428, events.rs:5-20)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from driftdb_spark.events import EventLog
from driftdb_spark.temporal import AsOf

COLS = {"id": "int", "name": "string", "qty": "int"}


@pytest.fixture
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "tbl"), pk_col="id")


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_insert_and_reconstruct(spark, log):
    log.insert(_rows(spark, [(1, "a", 10), (2, "b", 20)], "id int, name string, qty int"))
    state = {r["pk"]: r["row"] for r in log.state_at().collect()}
    assert state["1"]["name"] == "a" and state["2"]["qty"] == "20"


def test_pk_uniqueness_gate(spark, log):
    log.insert(_rows(spark, [(1, "a", 10)], "id int, name string, qty int"))
    with pytest.raises(ValueError, match="duplicate primary key"):
        log.insert(_rows(spark, [(1, "dup", 99)], "id int, name string, qty int"))


def test_patch_merges_fields(spark, log):
    """Patch carries only some fields; others survive from the Insert
    (field-level merge — reference table_storage.rs:369-389)."""
    log.insert(_rows(spark, [(1, "a", 10)], "id int, name string, qty int"))
    log.patch(_rows(spark, [(1, 99)], "id int, qty int"))
    row = log.state_at().filter("pk = '1'").first()["row"]
    assert row["name"] == "a"  # untouched by patch
    assert row["qty"] == "99"  # patched
    typed = log.state_df(COLS).filter("pk = '1'").first()
    assert typed["name"] == "a" and typed["qty"] == 99


def test_soft_delete_and_revive(spark, log):
    log.insert(_rows(spark, [(1, "a", 10)], "id int, name string, qty int"))
    log.soft_delete(_rows(spark, [Row(id=1)], "id int"))
    assert log.state_at().count() == 0
    # re-insert after delete revives the PK (reference allows this)
    log.upsert(_rows(spark, [(1, "reborn", 1)], "id int, name string, qty int"))
    row = log.state_at().first()
    assert row["row"]["name"] == "reborn"


def test_patch_before_insert_is_ignored(spark, log):
    """A Patch for a non-existent PK merges into nothing (reference
    apply_event merges only into existing state)."""
    log.patch(_rows(spark, [(7, 5)], "id int, qty int"))
    assert log.state_at().count() == 0


def test_time_travel_sequence(spark, log):
    log.insert(_rows(spark, [(1, "v1", 1)], "id int, name string, qty int"))  # seq 1
    log.patch(_rows(spark, [(1, "v2")], "id int, name string"))  # seq 2
    log.soft_delete(_rows(spark, [Row(id=1)], "id int"))  # seq 3
    assert log.state_at(AsOf(sequence=1)).first()["row"]["name"] == "v1"
    assert log.state_at(AsOf(sequence=2)).first()["row"]["name"] == "v2"
    assert log.state_at(AsOf(sequence=3)).count() == 0
    # drift history: all 3 events in order (reference SHOW DRIFT)
    hist = log.drift_history(1).collect()
    assert [e["event_type"] for e in hist] == ["INSERT", "PATCH", "SOFT_DELETE"]


def test_snapshot_and_compaction_preserve_state(spark, log):
    log.insert(
        _rows(spark, [(i, f"n{i}", i * 10) for i in range(1, 6)], "id int, name string, qty int")
    )
    log.patch(_rows(spark, [(2, 999)], "id int, qty int"))
    log.soft_delete(_rows(spark, [Row(id=5)], "id int"))
    before = {
        r["pk"]: dict(r["row"]) for r in log.state_at().collect()
    }
    log.compact()
    after = {r["pk"]: dict(r["row"]) for r in log.state_at().collect()}
    assert before == after
    assert len(after) == 4 and after["2"]["qty"] == "999"
    # post-compaction writes still work and sequences keep increasing
    seq_before = log.last_sequence()
    log.upsert(_rows(spark, [(9, "late", 0)], "id int, name string, qty int"))
    assert log.last_sequence() > seq_before
    assert log.state_at().count() == 5


def test_snapshot_bounds_replay(spark, log):
    """AS OF after a snapshot must still honor snapshot + tail layering."""
    log.insert(_rows(spark, [(1, "v1", 1)], "id int, name string, qty int"))
    log.snapshot()
    log.patch(_rows(spark, [(1, "v2")], "id int, name string"))
    assert log.state_at().first()["row"]["name"] == "v2"
    assert log.state_at(AsOf(sequence=1)).first()["row"]["name"] == "v1"


def test_purge_removes_all_history(spark, log):
    """Hard delete: purged PKs vanish from current state, drift history,
    AND pre-existing snapshots; other keys' history and time travel are
    untouched."""
    from driftdb_spark.temporal import AsOf

    rows = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, v int"
    )
    seq_insert = log.insert(rows)
    log.snapshot()
    log.patch(spark.createDataFrame([(2, 99)], "id int, v int"))

    removed = log.purge(spark.createDataFrame([(2,)], "id int"))
    assert removed == 2  # the insert and the patch

    state = {r.pk: r for r in log.state_at().collect()}
    assert set(state) == {"1", "3"}
    assert log.drift_history(pk="2").count() == 0
    # time travel for surviving keys still answers at the old sequence
    old = {r.pk for r in log.state_at(AsOf(sequence=seq_insert)).collect()}
    assert old == {"1", "3"}
    # the snapshot file no longer holds the purged key either
    snap_seqs = log._snapshot_seqs()
    assert snap_seqs
    import os as _os

    snap = spark.read.parquet(
        _os.path.join(log._snap_dir, f"seq={snap_seqs[-1]}")
    )
    assert {r.pk for r in snap.select("pk").collect()} == {"1", "3"}
