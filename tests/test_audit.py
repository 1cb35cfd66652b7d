"""Audit trail over the AFTER-commit hook.

Reference: audit.rs:14-118 (AuditEvent model), :247-292 (log_event),
:504-560 (query/export).
"""

from __future__ import annotations

import json
import os

import pytest

from driftdb_spark.audit import AuditTrail
from driftdb_spark.sql_frontend import DriftSession


@pytest.fixture
def sess(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE products (id int PRIMARY KEY, qty int)")
    return s


def test_audit_records_each_commit(sess):
    trail = AuditTrail(sess)
    sess.sql("INSERT INTO products VALUES (1, 5), (2, 9)")
    sess.sql("UPDATE products SET qty = qty + 1 WHERE id = 1")
    sess.sql("DELETE FROM products WHERE id = 2")
    rows = trail.for_table("products").collect()
    assert [(r.action, r.n_events) for r in rows] == [
        ("INSERT", 2),
        ("PATCH", 1),
        ("SOFT_DELETE", 1),
    ]
    assert rows[0].start_seq == 1 and rows[1].start_seq == 3
    assert rows[0].pks_sample == ["1", "2"]
    stats = {(r.table, r.action): r.n_events for r in trail.stats().collect()}
    assert stats[("products", "INSERT")] == 2


def test_audit_captures_actor_and_txn_commit(sess):
    trail = AuditTrail(sess)
    sess.sql("INSERT INTO products VALUES (1, 5)")
    sess.set_security_context("alice")
    # a transaction commit audits as ONE record (one atomic batch)
    sess.sql("BEGIN")
    sess.sql("INSERT INTO products VALUES (2, 7)")
    sess.sql("UPDATE products SET qty = 99 WHERE id = 2")
    sess.sql("COMMIT")
    sess.set_security_context(None)
    rows = trail.for_table("products").collect()
    assert [r.actor for r in rows] == [None, "alice"]
    assert rows[1].action == "TXN" and rows[1].n_events == 2


def test_audit_export_json(sess, tmp_path):
    trail = AuditTrail(sess)
    sess.sql("INSERT INTO products VALUES (1, 5)")
    out = str(tmp_path / "audit_export")
    assert trail.export_json(out) == 1
    lines = []
    for root, _d, files in os.walk(out):
        for f in files:
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    lines += [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == 1 and lines[0]["table"] == "products"


def test_audit_scrub_pks_companion_to_purge(sess, spark):
    """A compliance purge must be able to erase the subject from the
    audit trail too: pks can be identifiers (emails, account numbers),
    and purge rewrites the event log but the audit log keeps pk samples.
    scrub_pks removes exactly the given keys from pks_sample while
    commit metadata (counts, sequences, actors) stays intact."""
    trail = AuditTrail(sess)
    sess.sql("INSERT INTO products VALUES (1, 5), (2, 9)")
    sess.sql("UPDATE products SET qty = 10 WHERE id = 2")
    before = trail.events().orderBy("start_seq").collect()
    assert any("2" in (r.pks_sample or []) for r in before)

    log = sess.table("products")
    log.purge(spark.createDataFrame([(2,)], "id int"))
    n = trail.scrub_pks(["2"])
    assert n == 2  # the insert commit and the update commit

    after = trail.events().orderBy("start_seq").collect()
    assert not any("2" in (r.pks_sample or []) for r in after)
    # metadata preserved: same commits, same counts, same sequences
    assert [(r.start_seq, r.n_events, r.action) for r in after] == [
        (r.start_seq, r.n_events, r.action) for r in before
    ]
    # surviving pk still sampled
    assert any("1" in (r.pks_sample or []) for r in after)
    # idempotent
    assert trail.scrub_pks(["2"]) == 0
