"""Statement-level RBAC (reference driftdb-server security/rbac.rs:
predefined superuser/admin/user/readonly roles, custom roles,
grant/revoke, default-deny require_permission; rbac_enforcement.rs wires
it into statement execution). Composes with RLS: RBAC gates the
statement kind, RLS scopes the rows."""

from __future__ import annotations

import pytest

from driftdb_spark.rbac import PermissionDenied, RbacManager, statement_permission
from driftdb_spark.sql_frontend import DriftSession


@pytest.fixture
def sess(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE acct (id INT PRIMARY KEY, owner STRING, amt INT)")
    s.sql("INSERT INTO acct VALUES (1, 'alice', 10), (2, 'bob', 20)")
    return s


def _as(sess, user):
    sess.set_security_context(user, roles=sess.rbac.roles_of(user))


def test_rbac_disabled_until_first_grant(sess):
    """No grants -> RBAC inert: a restricted identity is governed by RLS
    alone, exactly the pre-RBAC behavior."""
    assert not sess.rbac.enabled()
    _as(sess, "nobody")
    assert sess.sql("SELECT COUNT(*) AS n FROM acct").collect()[0]["n"] == 2
    sess.sql("INSERT INTO acct VALUES (3, 'carol', 30)")
    sess.set_security_context(None)


def test_readonly_role_gates_writes_and_allows_metrics(sess):
    sess.sql("GRANT ROLE readonly TO rita")
    _as(sess, "rita")
    try:
        assert sess.sql("SELECT COUNT(*) AS n FROM acct").collect()[0]["n"] == 2
        sess.sql("BEGIN")
        sess.sql("COMMIT")
        assert sess.sql("SHOW STATUS").count() > 0  # view_metrics
        for stmt in (
            "INSERT INTO acct VALUES (9, 'x', 1)",
            "UPDATE acct SET amt = 0",
            "DELETE FROM acct WHERE id = 1",
            "CREATE TABLE t2 (id INT PRIMARY KEY)",
            "DROP TABLE acct",
            "SNAPSHOT acct",
            "GRANT ROLE readonly TO eve",
        ):
            with pytest.raises(PermissionDenied):
                sess.sql(stmt)
        assert PermissionDenied.sqlstate == "42501"
    finally:
        sess.set_security_context(None)
    # every denial was recorded as a security event
    assert sess.security.counters().get("permission_denied", 0) >= 7


def test_user_role_matches_reference_shape(sess):
    """rbac.rs user(): read/write DML + CREATE TABLE/INDEX, but no DROP,
    no ALTER, no role management, no metrics."""
    sess.sql("GRANT ROLE user TO uma")
    _as(sess, "uma")
    try:
        sess.sql("CREATE TABLE notes (id INT PRIMARY KEY, t STRING)")
        sess.sql("INSERT INTO notes VALUES (1, 'hi')")
        sess.sql("UPDATE notes SET t = 'yo' WHERE id = 1")
        assert sess.sql("SELECT t FROM notes").collect()[0]["t"] == "yo"
        for stmt in ("DROP TABLE notes", "ALTER TABLE notes ADD COLUMN x INT",
                     "SHOW STATUS", "REVOKE ROLE user FROM uma"):
            with pytest.raises(PermissionDenied):
                sess.sql(stmt)
    finally:
        sess.set_security_context(None)


def test_admin_can_grant_but_not_revoke(sess):
    """rbac.rs admin() holds GrantRole but not RevokeRole."""
    sess.sql("GRANT ROLE admin TO ada")
    _as(sess, "ada")
    try:
        sess.sql("GRANT ROLE readonly TO intern")
        with pytest.raises(PermissionDenied):
            sess.sql("REVOKE ROLE readonly FROM intern")
    finally:
        sess.set_security_context(None)
    assert sess.rbac.roles_of("intern") == ["readonly"]


def test_default_deny_for_ungranted_user(sess):
    sess.sql("GRANT ROLE readonly TO rita")  # enables RBAC
    _as(sess, "stranger")
    try:
        with pytest.raises(PermissionDenied):
            sess.sql("SELECT 1 AS x")
    finally:
        sess.set_security_context(None)


def test_custom_roles_and_system_role_protection(sess):
    sess.sql("CREATE ROLE auditor WITH PERMISSIONS (select, view_audit_log, view_metrics)")
    sess.sql("GRANT ROLE auditor TO avery")
    _as(sess, "avery")
    try:
        assert sess.sql("SELECT COUNT(*) AS n FROM acct").collect()[0]["n"] == 2
        with pytest.raises(PermissionDenied):
            sess.sql("INSERT INTO acct VALUES (9, 'x', 1)")
    finally:
        sess.set_security_context(None)
    roles = {r["role"] for r in sess.sql("SHOW ROLES").collect()}
    assert {"superuser", "admin", "user", "readonly", "auditor"} <= roles
    with pytest.raises(ValueError):
        sess.sql("DROP ROLE readonly")  # system roles are undeletable
    with pytest.raises(ValueError):
        sess.sql("CREATE ROLE bad WITH PERMISSIONS (fly_to_moon)")
    sess.sql("DROP ROLE auditor")
    assert sess.rbac.roles_of("avery") == []


def test_grants_persist_and_flow_into_authenticated_sessions(spark, tmp_path):
    s1 = DriftSession(spark, str(tmp_path))
    s1.sql("CREATE TABLE acct (id INT PRIMARY KEY, owner STRING, amt INT)")
    s1.sql("INSERT INTO acct VALUES (1, 'alice', 10), (2, 'bob', 20)")
    s1.sql("GRANT ROLE readonly TO rita")
    s1.sql("ALTER TABLE acct ENABLE ROW LEVEL SECURITY")
    s1.sql("CREATE POLICY ro_rows ON acct FOR SELECT TO readonly USING (owner = 'alice')")

    # a fresh session reloads grants from the catalog; an authenticated
    # identity picks its RBAC roles up automatically, and the SAME role
    # name scopes the RLS policy — one consistent role set
    s2 = DriftSession(spark, str(tmp_path))
    assert s2.rbac.roles_of("rita") == ["readonly"]
    s2.enter_authenticated("rita")
    rows = s2.sql("SELECT owner FROM acct").collect()
    assert [r["owner"] for r in rows] == ["alice"]  # RLS via the rbac role
    with pytest.raises(PermissionDenied):
        s2.sql("DELETE FROM acct WHERE id = 1")  # RBAC on the same identity


def test_prepared_statement_cannot_launder_permissions(sess):
    """EXECUTE re-enters the dispatcher with the underlying statement, so
    a readonly user cannot smuggle an INSERT through PREPARE/EXECUTE —
    the same no-laundering property as the SET SESSION AUTHORIZATION
    gate."""
    sess.sql("PREPARE sneaky AS INSERT INTO acct VALUES (99, 'eve', 1)")
    sess.sql("GRANT ROLE readonly TO rita")
    _as(sess, "rita")
    try:
        with pytest.raises(PermissionDenied):
            sess.sql("EXECUTE sneaky")
    finally:
        sess.set_security_context(None)
    assert sess.sql("SELECT COUNT(*) AS n FROM acct WHERE id = 99").collect()[0]["n"] == 0


def test_statement_permission_mapping_table():
    cases = {
        "SELECT 1": "select",
        "WITH t AS (SELECT 1) SELECT * FROM t": "select",
        "EXPLAIN SELECT 1": "select",
        # PostgreSQL: EXPLAIN needs the explained statement's privilege
        "EXPLAIN INSERT INTO t VALUES (1)": "insert",
        "EXPLAIN ANALYZE UPDATE t SET x = 1": "update",
        "EXPLAIN MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE": "update",
        "EXPLAIN DELETE FROM t": "delete",
        "INSERT INTO t VALUES (1)": "insert",
        "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE": "update",
        "TRUNCATE t": "truncate_table",
        "CREATE UNIQUE INDEX i ON t (x)": "create_index",
        "CREATE MATERIALIZED VIEW v AS SELECT 1": "create_view",
        "CREATE POLICY p ON t FOR SELECT TO PUBLIC USING (1=1)": "modify_security_settings",
        "CREATE TABLE t (id INT)": "create_table",
        "DROP VIEW v": "drop_view",
        "ALTER TABLE t ENABLE ROW LEVEL SECURITY": "modify_security_settings",
        "ALTER TABLE t ADD COLUMN x INT": "alter_table",
        "SNAPSHOT t": "create_snapshot",
        "VACUUM t": "compact_database",
        "CALL p()": "execute_procedure",
        "SHOW REPLICATION STATUS": "view_replication_status",
        "SHOW STATUS": "view_metrics",
        "SHOW ROLES": "view_roles",
        "SHOW TABLES": "view_system_info",
        "SET x = 1": None,
        "PREPARE p AS SELECT 1": None,
    }
    for sql, want in cases.items():
        assert statement_permission(sql) == want, sql


def test_manager_unit_surface():
    m = RbacManager()
    assert not m.enabled()
    m.grant_role("u", "user")
    assert m.enabled() and m.has_permission("u", "insert")
    assert not m.has_permission("u", "drop_table")
    with pytest.raises(ValueError):
        m.grant_role("u", "no_such_role")
    m.create_custom_role("ops", ["select", "compact_database"])
    m.grant_role("u", "ops")
    assert m.has_permission("u", "compact_database")
    # deleting a custom role cascades out of grants
    m.delete_custom_role("ops")
    assert not m.has_permission("u", "compact_database")
    m.revoke_role("u", "user")
    assert not m.enabled()
    # round-trip through the catalog dict
    m.grant_role("a", "admin")
    m2 = RbacManager()
    m2.load_catalog(m.to_catalog())
    assert m2.roles_of("a") == ["admin"]


def test_rbac_enforced_over_the_wire(spark, tmp_path):
    """A wire-authenticated user carries RBAC roles: readonly rita can
    SELECT but her INSERT answers 42501 on the wire, and the connection
    stays usable (rbac_enforcement.rs wired through the server)."""
    from driftdb_spark.client import DriftClient, WireError
    from driftdb_spark.server import PgWireServer

    sess = DriftSession(spark, str(tmp_path))
    sess.sql("CREATE TABLE w (id INT PRIMARY KEY, v STRING)")
    sess.sql("INSERT INTO w VALUES (1, 'x')")
    sess.sql("GRANT ROLE readonly TO rita")
    srv = PgWireServer(sess, users={"rita": "pw", "root": "pw"},
                       superusers={"root"}).start()
    try:
        host, port = srv.address
        with DriftClient(host, port, user="rita", password="pw") as c:
            assert c.query("SELECT COUNT(*) AS n FROM w").scalar() == "1"
            with pytest.raises(WireError) as ei:
                c.query("INSERT INTO w VALUES (2, 'y')")
            assert ei.value.sqlstate == "42501"
            assert c.query("SELECT 1 AS ok").scalar() == "1"
        # the superuser is not gated
        with DriftClient(host, port, user="root", password="pw") as c:
            c.query("INSERT INTO w VALUES (3, 'z')")
            assert c.query("SELECT COUNT(*) AS n FROM w").scalar() == "2"
    finally:
        srv.stop()


def test_bootstrap_role_management_is_superuser_only(sess):
    """Before the first grant exists RBAC is inert for ordinary statements
    — but role management must NOT be: otherwise any restricted identity
    could issue the inaugural `GRANT ROLE superuser TO <self>` and seize
    RBAC control (reference rbac.rs gates GrantRole unconditionally)."""
    assert not sess.rbac.enabled()
    _as(sess, "mallory")
    try:
        for stmt in (
            "GRANT ROLE superuser TO mallory",
            "CREATE ROLE sneaky WITH PERMISSIONS (select)",
            "REVOKE ROLE superuser FROM mallory",
            "DROP ROLE sneaky",
        ):
            with pytest.raises(PermissionDenied):
                sess.sql(stmt)
        # ordinary statements remain governed by RLS alone (inert RBAC)
        assert sess.sql("SELECT COUNT(*) AS n FROM acct").collect()[0]["n"] == 2
    finally:
        sess.set_security_context(None)
    assert not sess.rbac.enabled()  # nothing was seized
    # the owner (and a superuser identity) can still bootstrap
    sess.set_security_context("root", superuser=True)
    try:
        sess.sql("GRANT ROLE readonly TO mallory")
    finally:
        sess.set_security_context(None)
    assert sess.rbac.enabled()


def test_cte_dml_matches_insert_select_permissions(spark, tmp_path):
    """The statement-level RBAC model demands ONE permission per
    statement (INSERT…SELECT needs 'insert', not also 'select'); the
    CTE-prefixed form must behave identically — an insert-only role runs
    WITH…INSERT iff it can run the equivalent INSERT…SELECT, and a role
    with no insert is denied both."""
    sess = DriftSession(spark, str(tmp_path))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    sess.sql("INSERT INTO t VALUES (1, 10)")
    sess.sql("CREATE ROLE insonly WITH PERMISSIONS (insert)")
    sess.sql("GRANT ROLE insonly TO eve")
    sess.set_security_context("eve", roles=sess.rbac.roles_of("eve"))
    try:
        sess.sql("INSERT INTO t SELECT id + 100, v FROM t")
        sess.sql(
            "WITH src AS (SELECT id + 200 AS id, v FROM t) "
            "INSERT INTO t SELECT * FROM src"
        )
    finally:
        sess.set_security_context(None)
    # 1 seed row + 1 from INSERT…SELECT + 2 from WITH…INSERT (the CTE
    # saw both prior rows)
    assert sess.sql("SELECT count(*) AS n FROM t").first()["n"] == 4
    # and a select-only role is denied the WITH-DML form
    sess.sql("CREATE ROLE reader WITH PERMISSIONS (select)")
    sess.sql("GRANT ROLE reader TO bob")
    sess.set_security_context("bob", roles=sess.rbac.roles_of("bob"))
    try:
        with pytest.raises(Exception, match="permission denied"):
            sess.sql(
                "WITH src AS (SELECT 999 AS id, 0 AS v) "
                "INSERT INTO t SELECT * FROM src"
            )
    finally:
        sess.set_security_context(None)
    assert sess.sql("SELECT count(*) AS n FROM t").first()["n"] == 4
