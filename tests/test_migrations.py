"""Versioned schema migrations.

Reference: migration.rs:22-163 (Version/Migration/checksum model),
:245-283 (ordering, pending), :285-498 (apply/rollback/migrate_all),
:724-746 (status).
"""

from __future__ import annotations

import pytest

from driftdb_spark.migrations import Migration, MigrationManager
from driftdb_spark.sql_frontend import DriftSession


@pytest.fixture
def sess(spark, tmp_path):
    return DriftSession(spark, str(tmp_path))


def _mgr(sess):
    m = MigrationManager(sess)
    m.add(
        Migration(
            "1.0.0",
            "create products",
            up=[
                "CREATE TABLE products (id int PRIMARY KEY, name string)",
                "INSERT INTO products VALUES (1, 'bolt'), (2, 'nut')",
            ],
        )
    )
    m.add(
        Migration(
            "1.1.0",
            "add qty with default",
            up=["ALTER TABLE products ADD COLUMN qty int DEFAULT 0"],
            down=["UPDATE products SET qty = NULL"],
        )
    )
    return m


def test_migrate_all_in_order_and_idempotent(sess):
    m = _mgr(sess)
    assert m.status()["pending"] == ["1.0.0", "1.1.0"]
    assert m.migrate_all(dry_run=True) == ["1.0.0", "1.1.0"]
    assert m.current_version() is None  # dry run applied nothing
    assert m.migrate_all() == ["1.0.0", "1.1.0"]
    assert m.current_version() == "1.1.0"
    rows = {
        (r.id, r.name, r.qty)
        for r in sess.sql("SELECT id, name, qty FROM products").collect()
    }
    assert rows == {(1, "bolt", 0), (2, "nut", 0)}
    # second run: nothing pending
    assert m.migrate_all() == []


def test_ledger_persists_and_checksum_guards(sess, spark, tmp_path):
    _mgr(sess).migrate_all()
    fresh = DriftSession(spark, str(tmp_path))
    m2 = MigrationManager(fresh)
    # re-registering identical migrations: fine, nothing pending
    m2.add(Migration("1.0.0", "create products", up=[
        "CREATE TABLE products (id int PRIMARY KEY, name string)",
        "INSERT INTO products VALUES (1, 'bolt'), (2, 'nut')",
    ]))
    assert m2.status()["pending"] == []
    # same version, edited statements -> checksum mismatch
    with pytest.raises(ValueError, match="different checksum"):
        m2.add(Migration("1.1.0", "edited", up=["SELECT 1 AS x"]))


def test_rollback_topmost_only(sess):
    m = _mgr(sess)
    m.migrate_all()
    with pytest.raises(ValueError, match="topmost"):
        m.rollback("1.0.0")
    m.rollback("1.1.0")
    assert m.current_version() == "1.0.0"
    assert sess.sql("SELECT qty FROM products WHERE id = 1").first()["qty"] is None
    # rolled-back migration is pending again
    assert m.status()["pending"] == ["1.1.0"]
