"""Injection-pattern guard (reference driftdb-server
security/sql_validator.rs) — opt-in, restricted identities only, with
the documented UNION deviation (bare UNION is legitimate set algebra)."""

from __future__ import annotations

import pytest

from driftdb_spark import sqlguard
from driftdb_spark.sql_frontend import DriftSession


def test_inspect_detects_reference_categories():
    cases = {
        "SELECT * FROM users WHERE name = '' OR 1=1--'": {
            "comment_injection", "tautology"},
        "SELECT 1; DROP TABLE users": {"stacked_queries"},
        "SELECT * FROM t WHERE a = 'x' OR '1'='1'": {"tautology"},
        "SELECT load_file('/etc/passwd')": {"system_commands"},
        "SELECT sleep(10)": {"timing_attack"},
        "SELECT * FROM t WHERE id = '' UNION SELECT NULL, password": {
            "union_probe"},
        "SELECT 'x\x00y'": {"null_bytes"},
    }
    for sql, want in cases.items():
        assert want <= set(sqlguard.inspect(sql)), sql
    assert sqlguard.inspect("X" * (sqlguard.MAX_QUERY_LENGTH + 1)) == ["oversize"]


def test_legitimate_analytics_never_flagged():
    """The reference blocks any UNION [ALL] SELECT (sql_validator.rs:
    163-220) — that would reject this engine's own set-operation queries.
    The deviation: only quote-adjacent/NULL-probe UNION forms fire."""
    for sql in (
        "SELECT a FROM t1 UNION ALL SELECT a FROM t2",
        "SELECT a FROM t1 UNION SELECT a FROM t2",
        "WITH x AS (SELECT 1 AS a) SELECT a FROM x UNION ALL SELECT 2",
        "SELECT * FROM orders WHERE o_comment LIKE '%special%'",
        "BEGIN",
        "DELETE FROM t WHERE id = 5",
    ):
        assert sqlguard.inspect(sql) == [], sql


def test_guard_records_and_blocks_for_restricted_identities(spark, tmp_path):
    sess = DriftSession(spark, str(tmp_path))
    sess.sql("CREATE TABLE g (id INT PRIMARY KEY, v STRING)")
    sess.sql("INSERT INTO g VALUES (1, 'x')")

    evil = "SELECT * FROM g WHERE v = '' OR 1=1--'"

    # owner sessions are never second-guessed, even with the guard on
    sess.enable_sql_validation(block=True)
    assert sess.sql(evil).count() >= 0

    # restricted identity, monitor mode: recorded but not refused
    sess.enable_sql_validation(block=False)
    sess.set_security_context("app")
    try:
        sess.sql(evil).count()
        assert sess.security.counters().get("sql_injection_pattern", 0) == 1

        # blocking mode refuses with 42000 and records again
        sess.enable_sql_validation(block=True)
        with pytest.raises(sqlguard.SqlRejected) as ei:
            sess.sql(evil)
        assert ei.value.sqlstate == "42000"
        assert sess.security.counters()["sql_injection_pattern"] == 2

        # clean statements flow normally under the blocking guard
        assert sess.sql("SELECT COUNT(*) AS n FROM g").collect()[0]["n"] == 1
    finally:
        sess.set_security_context(None)


def test_guard_propagates_to_wire_connections(spark, tmp_path):
    """serve --sql-guard block: a restricted wire identity's injection
    probe answers 42000 and the event lands on the server-wide monitor;
    clean statements and superusers are untouched."""
    from driftdb_spark.client import DriftClient, WireError
    from driftdb_spark.server import PgWireServer

    sess = DriftSession(spark, str(tmp_path))
    sess.sql("CREATE TABLE gw (id INT PRIMARY KEY, v STRING)")
    sess.sql("INSERT INTO gw VALUES (1, 'x')")
    sess.enable_sql_validation(block=True)
    srv = PgWireServer(sess, users={"app": "pw", "root": "pw"},
                       superusers={"root"}).start()
    try:
        host, port = srv.address
        with DriftClient(host, port, user="app", password="pw") as c:
            with pytest.raises(WireError) as ei:
                c.query("SELECT * FROM gw WHERE v = '' OR 1=1--'")
            assert ei.value.sqlstate == "42000"
            assert c.query("SELECT COUNT(*) AS n FROM gw").scalar() == "1"
        with DriftClient(host, port, user="root", password="pw") as c:
            assert c.query("SELECT * FROM gw WHERE v = '' OR 1=1--'").tag.startswith("SELECT")
        assert sess.security.counters().get("sql_injection_pattern", 0) == 1
    finally:
        srv.stop()
