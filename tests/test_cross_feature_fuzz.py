"""Cross-feature chaos fuzz: replication × RBAC × result cache.

test_replication_fuzz covers DML/ship/apply convergence; this adds the
two features that interact with the stream in round 7+: statement-level
RBAC (denied writes must never reach the stream) and the version-vector
result cache (cached reads must never serve stale rows, including across
a mid-run promote). Hypothesis drives random programs of authorized
writes, denied writes, cached reads, ship/apply steps, and at most one
promote; invariants checked throughout and at the end:

* every read served through the cache equals a fresh recompute by a
  cache-less twin session over the same storage (no stale serve — the
  write-invalidation property under arbitrary interleavings);
* a denied write changes nothing locally and never ships: the denied
  identity's PK range is absent from every node at the end;
* after a promote, the old primary is fenced, writes continue on the
  new primary, and the pure follower converges to the FINAL primary's
  state (grants ride the catalog, so RBAC keeps denying there too).
"""

from __future__ import annotations

import pytest

from conftest import fuzz_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from driftdb_spark.rbac import PermissionDenied
from driftdb_spark.replication import FencedPrimary, Replica, ReplicationPrimary
from driftdb_spark.sql_frontend import DriftSession

_op = st.one_of(
    st.tuples(st.just("write"), st.integers(1, 6), st.integers(0, 99)),
    st.tuples(st.just("denied"), st.integers(100, 106), st.integers(0, 99)),
    st.tuples(st.just("read")),
    st.tuples(st.just("ship_apply")),
    st.tuples(st.just("promote")),
)


def _rows(sess):
    return sorted(
        (r["id"], r["v"]) for r in sess.sql("SELECT id, v FROM t").collect()
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=fuzz_examples(4),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=st.lists(_op, min_size=4, max_size=9))
@pytest.mark.deepfuzz
def test_replication_rbac_cache_chaos(spark, tmp_path_factory, program):
    root = tmp_path_factory.mktemp("xfuzz")
    sess = DriftSession(spark, str(root / "primary"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    sess.sql("INSERT INTO t VALUES (1, 0)")
    sess.sql("GRANT ROLE user TO walter")
    sess.sql("GRANT ROLE readonly TO rita")
    sess.enable_result_cache()

    primary = ReplicationPrimary(sess, str(root / "stream"), node_id="p1")
    replica1 = Replica(spark, str(root / "r1"), str(root / "stream"), node_id="r1")
    follower = Replica(spark, str(root / "r2"), str(root / "stream"), node_id="r2")
    primary.ship()
    replica1.apply_pending()
    follower.apply_pending()

    # cache-less twin over the CURRENT writer's storage — ground truth
    writer_sess, writer_primary = sess, primary
    twin = DriftSession(spark, str(root / "primary"))
    promoted = False

    def as_user(s, user):
        s.set_security_context(user, roles=s.rbac.roles_of(user))

    for op in program:
        kind = op[0]
        if kind == "write":
            _k, pk, v = op
            as_user(writer_sess, "walter")
            try:
                existing = {
                    r["id"]
                    for r in writer_sess.sql("SELECT id FROM t").collect()
                }
                if pk in existing:
                    writer_sess.sql(f"UPDATE t SET v = {v} WHERE id = {pk}")
                else:
                    writer_sess.sql(f"INSERT INTO t VALUES ({pk}, {v})")
            finally:
                writer_sess.set_security_context(None)
        elif kind == "denied":
            _k, pk, v = op
            before = _rows(twin)
            as_user(writer_sess, "rita")
            try:
                with pytest.raises(PermissionDenied):
                    writer_sess.sql(f"INSERT INTO t VALUES ({pk}, {v})")
            finally:
                writer_sess.set_security_context(None)
            assert _rows(twin) == before, "denied write mutated state"
        elif kind == "read":
            q = "SELECT id, v FROM t"
            got1 = sorted(tuple(r) for r in writer_sess.sql(q).collect())
            got2 = sorted(tuple(r) for r in writer_sess.sql(q).collect())
            want = _rows(twin)
            assert got1 == got2 == want, "cache served stale rows"
        elif kind == "ship_apply":
            try:
                writer_primary.ship()
            except FencedPrimary:
                pytest.fail("the acting primary was fenced unexpectedly")
            if not promoted:
                replica1.apply_pending()
            follower.apply_pending()
        elif kind == "promote" and not promoted:
            writer_primary.ship()
            new_primary = replica1.promote()
            # the old primary is fenced from the stream
            with pytest.raises(FencedPrimary):
                primary.ship()
            writer_sess, writer_primary = replica1.session, new_primary
            writer_sess.enable_result_cache()
            twin = DriftSession(spark, str(root / "r1"))
            promoted = True
            # grants rode the catalog: rita is still denied here
            as_user(writer_sess, "rita")
            try:
                with pytest.raises(PermissionDenied):
                    writer_sess.sql("INSERT INTO t VALUES (200, 1)")
            finally:
                writer_sess.set_security_context(None)

    # final convergence: the acting primary ships, the follower applies
    writer_primary.ship()
    follower.apply_pending()
    want = _rows(writer_sess)
    got = _rows(follower.session)
    assert got == want
    # no denied write ever shipped anywhere
    for node in (writer_sess, follower.session):
        denied_seen = [pk for pk, _v in _rows(node) if pk >= 100]
        assert not denied_seen, f"denied write leaked: {denied_seen}"
