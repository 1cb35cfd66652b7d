"""UNIQUE / CHECK / NOT NULL constraint enforcement.

Reference: crates/driftdb-core/src/constraints.rs:10-34 (Unique/Check/
NotNull model), sql_bridge.rs:5748-5751 (inline UNIQUE ⇒ implicit unique
index at CREATE TABLE). Every violation must fail BEFORE any event
publishes — inside and outside transactions.
"""

from __future__ import annotations

import pytest

from driftdb_spark.constraints import ConstraintViolation
from driftdb_spark.sql_frontend import DriftSession
from driftdb_spark.transactions import TransactionAborted

DDL = (
    "CREATE TABLE users ("
    " id INT PRIMARY KEY,"
    " email STRING UNIQUE,"
    " name STRING NOT NULL,"
    " age INT CHECK (age >= 0 AND age < 150),"
    " UNIQUE (name, age),"
    " CONSTRAINT sane_email CHECK (email IS NULL OR email LIKE '%@%')"
    ")"
)


@pytest.fixture
def sess(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql(DDL)
    s.sql("INSERT INTO users VALUES (1, 'a@x.io', 'ann', 30)")
    return s


def _count(sess):
    return sess.sql("SELECT count(*) AS n FROM users").first()["n"]


# -- DDL parsing -------------------------------------------------------------


def test_constraints_registered(sess):
    cons = sess._constraints["users"]
    assert ["email"] in cons.uniques
    assert ["name", "age"] in cons.uniques
    assert "name" in cons.not_null
    names = [n for n, _e in cons.checks]
    assert "sane_email" in names and any("age" in n for n in names)


def test_constraints_persist_in_catalog(sess, spark):
    fresh = DriftSession(spark, sess.storage_dir)
    with pytest.raises(ConstraintViolation):
        fresh.sql("INSERT INTO users VALUES (2, 'a@x.io', 'bob', 1)")


def test_unparseable_constraint_rejected_loudly(sess):
    with pytest.raises(ValueError, match="constraint"):
        sess.sql(
            "CREATE TABLE t2 (id INT PRIMARY KEY, "
            "CONSTRAINT weird EXCLUDE USING gist (id WITH =))"
        )


# -- INSERT ------------------------------------------------------------------


def test_duplicate_unique_insert_fails_before_publish(sess):
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("INSERT INTO users VALUES (2, 'a@x.io', 'bob', 40)")
    assert _count(sess) == 1  # nothing published


def test_unique_within_batch_fails(sess):
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql(
            "INSERT INTO users VALUES (2, 'b@x.io', 'bob', 40), "
            "(3, 'b@x.io', 'cal', 50)"
        )
    assert _count(sess) == 1


def test_unique_allows_multiple_nulls(sess):
    # SQL UNIQUE: NULL != NULL — two NULL emails coexist.
    sess.sql("INSERT INTO users VALUES (2, NULL, 'bob', 40)")
    sess.sql("INSERT INTO users VALUES (3, NULL, 'cal', 50)")
    assert _count(sess) == 3


def test_composite_unique_enforced(sess):
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'ann', 31)")  # (ann,31) ok
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("INSERT INTO users VALUES (3, 'c@x.io', 'ann', 30)")  # dup (ann,30)


def test_check_violating_insert_fails(sess):
    with pytest.raises(ConstraintViolation, match="check"):
        sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', -5)")
    with pytest.raises(ConstraintViolation, match="sane_email"):
        sess.sql("INSERT INTO users VALUES (2, 'not-an-email', 'bob', 20)")
    assert _count(sess) == 1


def test_check_null_passes(sess):
    # SQL CHECK passes on NULL (tri-state), like PostgreSQL.
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', NULL)")
    assert _count(sess) == 2


def test_not_null_insert_fails(sess):
    with pytest.raises(ConstraintViolation, match="not-null"):
        sess.sql("INSERT INTO users VALUES (2, 'b@x.io', NULL, 20)")
    # Omitting the column entirely is the same violation.
    with pytest.raises(ConstraintViolation, match="not-null"):
        sess.sql("INSERT INTO users (id, email) VALUES (3, 'c@x.io')")
    assert _count(sess) == 1


# -- UPDATE ------------------------------------------------------------------


def test_update_into_check_violation_fails(sess):
    with pytest.raises(ConstraintViolation, match="check"):
        sess.sql("UPDATE users SET age = -1 WHERE id = 1")
    assert sess.sql("SELECT age FROM users WHERE id = 1").first()["age"] == 30


def test_update_into_unique_collision_fails(sess):
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', 40)")
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("UPDATE users SET email = 'a@x.io' WHERE id = 2")
    assert (
        sess.sql("SELECT email FROM users WHERE id = 2").first()["email"] == "b@x.io"
    )


def test_update_to_null_not_null_fails(sess):
    with pytest.raises(ConstraintViolation, match="not-null"):
        sess.sql("UPDATE users SET name = NULL WHERE id = 1")


def test_update_keeping_own_unique_value_ok(sess):
    # A row may keep its own unique value through an update that matches it.
    sess.sql("UPDATE users SET age = 31 WHERE id = 1")
    assert sess.sql("SELECT age FROM users WHERE id = 1").first()["age"] == 31


# -- transactions ------------------------------------------------------------


def test_txn_unique_violation_aborts_and_publishes_nothing(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', 40)")
    with pytest.raises(ConstraintViolation):
        sess.sql("INSERT INTO users VALUES (3, 'a@x.io', 'cal', 50)")
    # Transaction is poisoned (PostgreSQL aborted-txn gate).
    with pytest.raises(TransactionAborted):
        sess.sql("SELECT 1")
    sess.sql("ROLLBACK")
    assert _count(sess) == 1


def test_txn_unique_sees_buffered_rows(sess):
    sess.sql("BEGIN")
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', 40)")
    # Duplicate of a row staged IN THIS txn (not yet committed).
    with pytest.raises(ConstraintViolation):
        sess.sql("INSERT INTO users VALUES (3, 'b@x.io', 'cal', 50)")
    sess.sql("ROLLBACK")


def test_txn_check_violation_in_update_aborts(sess):
    sess.sql("BEGIN")
    with pytest.raises(ConstraintViolation):
        sess.sql("UPDATE users SET age = 999 WHERE id = 1")
    sess.sql("ROLLBACK")
    assert sess.sql("SELECT age FROM users WHERE id = 1").first()["age"] == 30


# -- ON CONFLICT -------------------------------------------------------------


def test_on_conflict_do_update_respects_check(sess):
    with pytest.raises(ConstraintViolation, match="check"):
        sess.sql(
            "INSERT INTO users VALUES (1, 'a@x.io', 'ann', -9) "
            "ON CONFLICT DO UPDATE"
        )
    assert sess.sql("SELECT age FROM users WHERE id = 1").first()["age"] == 30


def test_on_conflict_do_update_same_row_unique_ok(sess):
    # Replacing row 1 with itself keeps email 'a@x.io' — its old slot is
    # vacated by the replacement, so no self-collision.
    sess.sql(
        "INSERT INTO users VALUES (1, 'a@x.io', 'ann', 33) ON CONFLICT DO UPDATE"
    )
    assert sess.sql("SELECT age FROM users WHERE id = 1").first()["age"] == 33


def test_on_conflict_do_nothing_skips_validation_of_dropped_rows(sess):
    # Row with id=1 is dropped (conflict) — its duplicate email must not
    # trip the gate; the genuinely-new row inserts.
    sess.sql(
        "INSERT INTO users VALUES (1, 'a@x.io', 'zzz', 99), "
        "(2, 'b@x.io', 'bob', 40) ON CONFLICT DO NOTHING"
    )
    assert _count(sess) == 2
    assert sess.sql("SELECT name FROM users WHERE id = 1").first()["name"] == "ann"


# -- DEFAULT values (reference Default constraint, constraints.rs:30-33) ------


def test_default_fills_omitted_columns(sess, spark):
    s = DriftSession(spark, sess.storage_dir)
    s.sql(
        "CREATE TABLE cfg (id INT PRIMARY KEY, kind STRING DEFAULT 'std', "
        "n INT DEFAULT 7, note STRING)"
    )
    s.sql("INSERT INTO cfg (id) VALUES (1)")
    s.sql("INSERT INTO cfg (id, kind) VALUES (2, 'custom')")
    rows = {
        (r.id, r.kind, r.n, r.note)
        for r in s.sql("SELECT id, kind, n, note FROM cfg").collect()
    }
    assert rows == {(1, "std", 7, None), (2, "custom", 7, None)}


def test_default_satisfies_not_null(sess, spark):
    s = DriftSession(spark, sess.storage_dir)
    s.sql(
        "CREATE TABLE jobs (id INT PRIMARY KEY, "
        "state STRING DEFAULT 'queued' NOT NULL)"
    )
    s.sql("INSERT INTO jobs (id) VALUES (1)")  # default fills NOT NULL
    assert s.sql("SELECT state FROM jobs").first()["state"] == "queued"
    with pytest.raises(ConstraintViolation):
        s.sql("INSERT INTO jobs VALUES (2, NULL)")  # explicit NULL still fails


def test_alter_add_column_default_applies_to_future_inserts(sess):
    sess.sql("ALTER TABLE users ADD COLUMN tier STRING DEFAULT 'free'")
    # backfill hit existing rows...
    assert sess.sql("SELECT tier FROM users WHERE id = 1").first()["tier"] == "free"
    # ...and a future insert omitting the column gets it too
    sess.sql("INSERT INTO users (id, email, name, age) VALUES (9, 'z@x.io', 'zed', 20)")
    assert sess.sql("SELECT tier FROM users WHERE id = 9").first()["tier"] == "free"


# -- ALTER TABLE ADD/DROP CONSTRAINT; CREATE UNIQUE INDEX ---------------------


def test_add_unique_constraint_validates_existing_rows(sess):
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'bob', 30)")
    # ages 30 and 30 duplicate -> ADD CONSTRAINT fails on existing data
    with pytest.raises(ConstraintViolation, match="existing rows"):
        sess.sql("ALTER TABLE users ADD CONSTRAINT age_u UNIQUE (age)")
    # a satisfiable one registers and then gates writes
    sess.sql("ALTER TABLE users ADD CONSTRAINT id_age_u UNIQUE (email, age)")
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("INSERT INTO users VALUES (3, 'a@x.io', 'cal', 30)")


def test_add_check_constraint_validates_existing_rows(sess):
    with pytest.raises(ConstraintViolation):
        sess.sql("ALTER TABLE users ADD CONSTRAINT young CHECK (age < 10)")
    sess.sql("ALTER TABLE users ADD CONSTRAINT adult CHECK (age >= 18)")
    with pytest.raises(ConstraintViolation, match="adult"):
        sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'kid', 12)")


def test_drop_constraint_by_name(sess):
    sess.sql("ALTER TABLE users ADD CONSTRAINT adult CHECK (age >= 18)")
    sess.sql("ALTER TABLE users DROP CONSTRAINT adult")
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'kid', 12)")  # now fine
    with pytest.raises(KeyError):
        sess.sql("ALTER TABLE users DROP CONSTRAINT no_such")
    # named table-level constraints from CREATE TABLE drop too
    sess.sql("ALTER TABLE users DROP CONSTRAINT sane_email")
    sess.sql("INSERT INTO users VALUES (3, 'not-an-email', 'cal', 20)")


def test_create_unique_index_registers_constraint(sess):
    sess.sql("CREATE UNIQUE INDEX name_idx ON users (name)")
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'ann', 40)")
    sess.sql("ALTER TABLE users DROP CONSTRAINT name_idx")
    sess.sql("INSERT INTO users VALUES (2, 'b@x.io', 'ann', 40)")


def test_set_and_drop_not_null(sess):
    sess.sql("INSERT INTO users VALUES (2, NULL, 'bob', 40)")
    # existing NULL email -> SET NOT NULL refused
    with pytest.raises(ConstraintViolation):
        sess.sql("ALTER TABLE users ALTER COLUMN email SET NOT NULL")
    sess.sql("DELETE FROM users WHERE id = 2")
    sess.sql("ALTER TABLE users ALTER COLUMN email SET NOT NULL")
    with pytest.raises(ConstraintViolation, match="not-null"):
        sess.sql("INSERT INTO users VALUES (3, NULL, 'cal', 50)")
    sess.sql("ALTER TABLE users ALTER COLUMN email DROP NOT NULL")
    sess.sql("INSERT INTO users VALUES (3, NULL, 'cal', 50)")


def test_drop_column_scrubs_its_constraints(sess):
    sess.sql("ALTER TABLE users DROP COLUMN age")
    # age CHECK + (name, age) UNIQUE are gone; email UNIQUE survives
    sess.sql("INSERT INTO users (id, email, name) VALUES (2, 'b@x.io', 'ann')")
    with pytest.raises(ConstraintViolation, match="unique"):
        sess.sql("INSERT INTO users (id, email, name) VALUES (3, 'a@x.io', 'z')")


def test_reserved_column_names_rejected(sess):
    """`pk` / `last_seq` are engine reconstruction columns; a user column
    with either name would be ambiguous in every DML plan (found by the
    constraint fuzz) — the DDL fails loudly instead."""
    with pytest.raises(ValueError, match="reserved"):
        sess.sql("CREATE TABLE bad (pk INT PRIMARY KEY, v STRING)")
    with pytest.raises(ValueError, match="reserved"):
        sess.sql("CREATE TABLE bad2 (id INT PRIMARY KEY, last_seq INT)")
