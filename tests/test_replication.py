"""Log-shipping replication + failover (reference replication.rs:81-118
ReplicationMessage / :612-620 lag, failover.rs:25-44 FencingToken /
:421-439 stale-token rejection). Spark-first: entries ship by name
(immutable), generations propagate compact/purge, epochs fence zombies."""

from __future__ import annotations

import json
import os
import time

import pytest

from driftdb_spark.events import ReadOnlyLog
from driftdb_spark.replication import (
    FencedPrimary,
    PromoteRace,
    Replica,
    ReplicationPrimary,
)
from driftdb_spark.sql_frontend import DriftSession


@pytest.fixture
def rig(spark, tmp_path):
    """A primary session with one table, a ship stream, and a replica."""
    sess = DriftSession(spark, str(tmp_path / "primary"))
    sess.sql("CREATE TABLE users (id INT PRIMARY KEY, name STRING, qty INT)")
    sess.sql("INSERT INTO users VALUES (1, 'a', 10), (2, 'b', 20)")
    primary = ReplicationPrimary(sess, str(tmp_path / "stream"), node_id="p1")
    replica = Replica(
        spark, str(tmp_path / "replica"), str(tmp_path / "stream"), node_id="r1"
    )
    return sess, primary, replica


def _names(sess, table="users"):
    df = sess.sql(f"SELECT name FROM {table} ORDER BY name")
    return [r["name"] for r in df.collect()]


def test_ship_apply_catchup_and_lag(rig):
    sess, primary, replica = rig
    # before any ship: nothing to read, but the primary is ALIVE — the
    # construction heartbeat is already on the stream (anti-instant-failover)
    assert replica.lag()["heartbeat_age_sec"] is not None
    primary.ship()
    out = replica.apply_pending()
    assert out["applied"] >= 1
    assert _names(replica.session) == ["a", "b"]
    assert replica.lag()["max_lag"] == 0

    # new writes: lag becomes visible after the next ship, then catches up
    sess.sql("INSERT INTO users VALUES (3, 'c', 30)")
    sess.sql("UPDATE users SET qty = 99 WHERE id = 1")
    primary.ship()
    assert replica.lag()["tables"]["users"] > 0
    replica.apply_pending()
    assert replica.lag()["max_lag"] == 0
    assert _names(replica.session) == ["a", "b", "c"]
    got = replica.session.sql("SELECT qty FROM users WHERE id = 1").collect()
    assert got[0]["qty"] == 99


def test_apply_is_idempotent_and_incremental(rig):
    sess, primary, replica = rig
    primary.ship()
    first = replica.apply_pending()
    again = replica.apply_pending()
    assert first["applied"] >= 1 and again["applied"] == 0
    # an unchanged primary re-ship copies nothing
    assert primary.ship() == {"users": 0}


def test_replica_refuses_writes_with_25006(rig):
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    for stmt in (
        "INSERT INTO users VALUES (9, 'z', 1)",
        "UPDATE users SET qty = 0",
        "DELETE FROM users WHERE id = 1",
        "CREATE TABLE other (id INT PRIMARY KEY)",
        "DROP TABLE users",
        "SNAPSHOT users",
    ):
        with pytest.raises(ReadOnlyLog):
            replica.session.sql(stmt)
    assert ReadOnlyLog.sqlstate == "25006"
    # the EventLog layer refuses too (indirect paths can't slip through)
    log, _cols = replica.session._tables["users"]
    with pytest.raises(ReadOnlyLog):
        log.insert(replica.session.spark.createDataFrame([(9, "z", 1)], "id int, name string, qty int"))
    # reads (incl. time travel surface) still work
    assert len(_names(replica.session)) == 2


def test_snapshots_ship_and_replay_on_replica(rig):
    sess, primary, replica = rig
    log, _cols = sess._tables["users"]
    log.snapshot()
    sess.sql("INSERT INTO users VALUES (4, 'd', 40)")
    primary.ship()
    replica.apply_pending()
    rlog, _c = replica.session._tables["users"]
    assert rlog._snapshot_seqs(), "snapshot did not ship"
    assert _names(replica.session) == ["a", "b", "d"]


def test_compact_bumps_generation_and_replica_reseeds(rig):
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    sess.sql("UPDATE users SET qty = 5 WHERE id = 2")
    log, _cols = sess._tables["users"]
    log.compact()  # rewrites the log -> live entry set changes
    primary.ship()
    replica.apply_pending()
    state = json.load(open(os.path.join(replica.storage_dir, "_replica_state.json")))
    assert state["tables"]["users"]["generation"] == 2
    assert _names(replica.session) == ["a", "b"]
    got = replica.session.sql("SELECT qty FROM users WHERE id = 2").collect()
    assert got[0]["qty"] == 5


def test_purge_propagates_to_replica(rig):
    """A compliance purge must disappear from standbys too — the
    generation reseed carries it (reference has no hard-delete; this is
    the rebuild's right-to-be-forgotten path crossed with replication)."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    log, _cols = sess._tables["users"]
    log.purge(sess.spark.createDataFrame([(1,)], "id int"))
    primary.ship()
    replica.apply_pending()
    assert _names(replica.session) == ["b"]
    # purged key is gone from the replica's whole history, not just state
    ev = replica.session._tables["users"][0].events()
    assert ev.filter("pk = '1'").count() == 0


def test_failover_promote_fences_old_primary(rig):
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    new_primary = replica.promote()
    # the promoted node accepts writes
    replica.session.sql("INSERT INTO users VALUES (7, 'g', 70)")
    assert "g" in _names(replica.session)
    # ... and ships onward on the SAME stream for downstream replicas
    assert new_primary.ship()["users"] >= 1
    # the zombie is fenced and its heartbeat never advances
    with pytest.raises(FencedPrimary):
        primary.ship()
    # a second promote attempt for the same epoch loses the claim race
    with pytest.raises(PromoteRace):
        ReplicationPrimary(sess, primary.ship_dir, node_id="p1", _claim=2)


def test_stale_epoch_heartbeat_is_ignored(rig):
    """Even a heartbeat a zombie wrote in the promote race window is inert:
    replicas reject heartbeats older than the stream epoch
    (failover.rs:421-439, replica side)."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    replica2 = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "replica2"),
        primary.ship_dir,
        node_id="r2",
    )
    replica.promote()
    # zombie force-writes a heartbeat bypassing ship()'s fence check
    primary.heartbeat()
    assert replica2._heartbeat() is None
    assert replica2.lag()["heartbeat_age_sec"] is None


def test_maybe_promote_on_stale_heartbeat(rig):
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    # fresh heartbeat: no failover
    assert replica.maybe_promote(stale_after_sec=3600) is None
    # stale heartbeat: auto-promote fires
    hb_path = os.path.join(primary.ship_dir, "_heartbeat.json")
    hb = json.load(open(hb_path))
    hb["ts_unix"] = time.time() - 999
    json.dump(hb, open(hb_path, "w"))
    new_primary = replica.maybe_promote(stale_after_sec=30)
    assert new_primary is not None and new_primary.epoch == 2
    assert replica.status()["role"] == "primary"


def test_torn_ship_is_invisible_to_replica(rig):
    """A crashed mid-copy ship leaves only hidden _staging-* litter; the
    manifest/heartbeat never advanced, so the replica applies nothing and
    a re-ship completes cleanly (same staged-rename crash model as the
    EventLog append)."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    sess.sql("INSERT INTO users VALUES (5, 'e', 50)")
    # simulate the torn ship: stage bytes without manifest/heartbeat
    gen_events = os.path.join(primary.ship_dir, "users", "gen-000001", "events")
    os.makedirs(os.path.join(gen_events, "_staging-dead"), exist_ok=True)
    open(os.path.join(gen_events, "_staging-dead", "part-x.parquet"), "wb").close()
    assert replica.apply_pending()["applied"] == 0
    assert _names(replica.session) == ["a", "b"]
    # recovery: a clean ship supersedes the litter
    primary.ship()
    replica.apply_pending()
    assert _names(replica.session) == ["a", "b", "e"]


def test_catalog_and_new_tables_follow_the_stream(rig):
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    sess.sql("CREATE TABLE tags (id INT PRIMARY KEY, tag STRING)")
    sess.sql("INSERT INTO tags VALUES (1, 'x')")
    primary.ship()
    replica.apply_pending()
    assert [r["tag"] for r in replica.session.sql("SELECT tag FROM tags").collect()] == ["x"]
    # the new table's log is read-only on the replica as well
    with pytest.raises(ReadOnlyLog):
        replica.session.sql("INSERT INTO tags VALUES (2, 'y')")


def test_replication_metrics_and_lag_alerts(rig):
    """Zero-job lag gauges feed /metrics and the replication alert family
    (reference alerting.rs:246-266 HighReplicationLag/Critical; metric
    absent -> rules skip, like the pool family)."""
    import json as _json
    import urllib.request

    from driftdb_spark.observability import HealthServer

    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    srv = HealthServer(replica.session, replica=replica).start()
    try:
        host, port = srv.address
        with urllib.request.urlopen(f"http://{host}:{port}/metrics") as r:
            m = _json.loads(r.read())
        assert m["replication"]["role"] == "replica"
        assert m["replication"]["max_lag_entries"] == 0
        assert m["replication"]["heartbeat_age_sec"] is not None

        with urllib.request.urlopen(
            f"http://{host}:{port}/metrics?format=prometheus"
        ) as r:
            text = r.read().decode()
        assert "driftdb_replication_max_lag_entries 0" in text
        assert 'driftdb_replication_lag_entries{table="users"} 0' in text

        # fall behind: ship 3 more batches without applying
        for i in range(10, 13):
            sess.sql(f"INSERT INTO users VALUES ({i}, 'u{i}', {i})")
            primary.ship()
        assert replica.lag_entries()["max_lag_entries"] == 3

        # the default rules are registered and see the gauge; drop the
        # warning threshold so 3 entries breach it, then walk the
        # pending->firing lifecycle with the injectable clock
        from driftdb_spark.observability import AlertManager, AlertRule

        now = [1000.0]
        mgr = AlertManager(replica.session, clock=lambda: now[0])
        assert {"HighReplicationLag", "CriticalReplicationLag",
                "ReplicationHeartbeatStale"} <= {r["name"] for r in mgr.rules()}
        mgr.metric_providers.update(replica.metric_providers())
        mgr.add_rule(AlertRule(
            "HighReplicationLag", "replication_max_lag_entries",
            "warning", 2.0, ">", for_duration_sec=120.0,
        ))
        mgr.evaluate()  # establish the rate baseline
        now[0] += 1.0
        states = {a["name"]: a["state"] for a in mgr.evaluate()}
        assert states.get("HighReplicationLag") == "pending"
        now[0] += 121.0
        states = {a["name"]: a["state"] for a in mgr.evaluate()}
        assert states.get("HighReplicationLag") == "firing"

        # catch up -> resolved
        replica.apply_pending()
        now[0] += 1.0
        active = {a["name"] for a in mgr.evaluate()}
        assert "HighReplicationLag" not in active
    finally:
        srv.stop()


@pytest.mark.deepfuzz
def test_ship_races_concurrent_appends_without_loss(rig):
    """Chaos: a writer thread appends batches while ship()/apply() loop
    concurrently. The pinned-entry-set protocol means every ship is a
    consistent prefix; once the writer stops, one final ship+apply makes
    the replica byte-equal to the primary — nothing lost, nothing torn."""
    import threading

    sess, primary, replica = rig
    errors = []

    def writer():
        try:
            for i in range(20, 40):
                sess.sql(f"INSERT INTO users VALUES ({i}, 'w{i}', {i})")
        except Exception as exc:  # pragma: no cover - failure surface
            errors.append(exc)

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(6):
            primary.ship()
            replica.apply_pending()
    finally:
        t.join()
    assert not errors
    primary.ship()
    replica.apply_pending()
    want = sorted(r["id"] for r in sess.sql("SELECT id FROM users").collect())
    got = sorted(r["id"] for r in replica.session.sql("SELECT id FROM users").collect())
    assert got == want and len(want) == 22
    assert replica.lag()["max_lag"] == 0


def test_follower_loop_applies_and_auto_promotes(rig):
    """The standby daemon (reference sync_interval_ms background sync +
    failover health check): continuous apply keeps the replica caught up;
    once the heartbeat goes stale, it promotes itself — but only after
    the shipped backlog is applied — and the loop exits (a primary does
    not follow)."""
    sess, primary, replica = rig
    primary.ship()
    promoted = []
    loop = replica.follow(
        interval_sec=0.2,
        failover_after_sec=3600,  # fresh heartbeat: no failover yet
        on_promote=promoted.append,
    )
    try:
        deadline = time.time() + 30
        while replica.lag_entries()["max_lag_entries"] != 0 and time.time() < deadline:
            time.sleep(0.2)
        assert replica.lag_entries()["max_lag_entries"] == 0
        assert _names(replica.session) == ["a", "b"]

        # new data flows through without manual applies
        sess.sql("INSERT INTO users VALUES (5, 'e', 50)")
        primary.ship()
        deadline = time.time() + 30
        while "e" not in _names(replica.session) and time.time() < deadline:
            time.sleep(0.2)
        assert "e" in _names(replica.session)
        assert not promoted and loop.promoted_to is None

        # age the heartbeat -> the loop promotes and stops
        hb_path = os.path.join(primary.ship_dir, "_heartbeat.json")
        hb = json.load(open(hb_path))
        hb["ts_unix"] = time.time() - 7200
        json.dump(hb, open(hb_path, "w"))
        loop.failover_after_sec = 60
        deadline = time.time() + 30
        while not promoted and time.time() < deadline:
            time.sleep(0.2)
        assert promoted and promoted[0].epoch == 2
        assert replica.status()["role"] == "primary"
        assert not loop.errors
    finally:
        loop.stop()


def test_show_replication_status_sql(rig):
    """SHOW REPLICATION STATUS is wire-reachable standby introspection:
    a replica session reports role/epoch/lag from manifest JSON (zero
    Spark jobs on the lag path), a plain session answers role=primary."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    rows = {r["name"]: r["value"]
            for r in replica.session.sql("SHOW REPLICATION STATUS").collect()}
    assert rows["role"] == "replica" and rows["read_only"] == "true"
    assert rows["stream_epoch"] == "1"
    assert rows["max_lag_entries"] == "0" and rows["lag_entries_users"] == "0"

    sess.sql("INSERT INTO users VALUES (8, 'h', 80)")
    primary.ship()
    rows = {r["name"]: r["value"]
            for r in replica.session.sql("SHOW REPLICATION STATUS").collect()}
    assert rows["max_lag_entries"] == "1"

    # a plain (primary) session answers too
    rows = {r["name"]: r["value"]
            for r in sess.sql("SHOW REPLICATION STATUS").collect()}
    assert rows["role"] == "primary" and rows["read_only"] == "false"

    # promoted replica flips role
    replica.apply_pending()
    replica.promote()
    rows = {r["name"]: r["value"]
            for r in replica.session.sql("SHOW REPLICATION STATUS").collect()}
    assert rows["role"] == "primary" and rows["read_only"] == "false"


def test_views_and_rls_propagate_through_the_catalog(rig):
    """The shipped catalog carries views and RLS policies: a replica
    serves the view and enforces the policy for a restricted identity —
    standbys answer exactly like the primary, including row security."""
    sess, primary, replica = rig
    sess.sql("CREATE VIEW big_users AS SELECT name, qty FROM users WHERE qty >= 20")
    sess.sql("ALTER TABLE users ENABLE ROW LEVEL SECURITY")
    sess.sql(
        "CREATE POLICY own_rows ON users FOR SELECT TO PUBLIC USING (name = 'a')"
    )
    primary.ship()
    replica.apply_pending()

    got = replica.session.sql("SELECT name FROM big_users").collect()
    assert [r["name"] for r in got] == ["b"]

    # a restricted identity on the REPLICA sees only its policy rows
    replica.session.set_security_context("alice", roles=["PUBLIC"])
    try:
        rows = replica.session.sql("SELECT name FROM users").collect()
        assert [r["name"] for r in rows] == ["a"]
    finally:
        replica.session.set_security_context(None)
    assert len(_names(replica.session)) == 2  # owner bypass intact


def test_streaming_materializer_follows_replica_log(rig, tmp_path):
    """Composition: the Structured Streaming state materializer folds the
    REPLICA's applied log into a continuously-maintained state table —
    a standby serving a hot materialized view of replicated data. The
    streamed state equals the primary's reconstruction (shared
    fold_events semantics), including across a second ship/apply round."""
    from driftdb_spark.streaming.ingest import start_state_materializer

    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    rlog, _cols = replica.session._tables["users"]
    state = str(tmp_path / "replica_state")
    ckpt = str(tmp_path / "ckpt")

    q = start_state_materializer(
        replica.spark, rlog._events_dir, state, ckpt, available_now=True
    )
    q.awaitTermination(120)
    got = {
        (r["pk"],) for r in replica.spark.read.parquet(state).collect()
    }
    assert got == {("1",), ("2",)}

    # second round: new writes flow primary -> ship -> apply -> stream
    sess.sql("INSERT INTO users VALUES (6, 'f', 60)")
    sess.sql("DELETE FROM users WHERE id = 2")
    primary.ship()
    replica.apply_pending()
    q = start_state_materializer(
        replica.spark, rlog._events_dir, state, ckpt, available_now=True
    )
    q.awaitTermination(120)
    pks = {r["pk"] for r in replica.spark.read.parquet(state).collect()}
    want = {str(r["id"]) for r in sess.sql("SELECT id FROM users").collect()}
    assert pks == want == {"1", "6"}


def test_primary_announces_heartbeat_at_construction(rig, tmp_path):
    """A primary that claimed the epoch but has not shipped yet must still
    look alive: ReplicationPrimary.__init__ writes the initial heartbeat,
    so a standby that starts before the first ship() does NOT instantly
    claim the next epoch and fence a healthy primary."""
    sess, primary, replica = rig
    # rig's primary never shipped — the construction heartbeat is all
    # there is, and it must hold off auto-failover
    assert os.path.exists(os.path.join(primary.ship_dir, "_heartbeat.json"))
    assert replica.maybe_promote(stale_after_sec=30) is None
    primary.ship()  # the primary was never fenced


def test_maybe_promote_grace_period_without_any_heartbeat(spark, tmp_path):
    """On a stream with NO heartbeat at all (no primary ever constructed),
    a fresh replica waits out one staleness window from its own start
    before concluding the primary is dead."""
    replica = Replica(
        spark, str(tmp_path / "rep"), str(tmp_path / "stream"), node_id="r1"
    )
    assert replica.maybe_promote(stale_after_sec=3600) is None
    # simulate the window elapsing: still no heartbeat -> now it promotes
    replica._started_unix -= 999
    new_primary = replica.maybe_promote(stale_after_sec=30)
    assert new_primary is not None and new_primary.epoch == 1


def test_maybe_promote_grace_anchors_on_epoch_claim_for_one_shot_callers(
    rig, tmp_path
):
    """On a CLAIMED stream whose heartbeat vanished, the no-heartbeat
    grace is measured from the epoch claim time — a stream fact — so a
    one-shot caller (cli replicate promote --if-stale builds a FRESH
    Replica per invocation) can still promote once the claim is old,
    instead of resetting the clock on every run and never firing."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    os.remove(os.path.join(primary.ship_dir, "_heartbeat.json"))
    # fresh claim: a brand-new replica object holds off
    oneshot = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "oneshot"),
        primary.ship_dir,
        node_id="os1",
    )
    assert oneshot.maybe_promote(stale_after_sec=3600) is None
    # age the claim AND the last ship (manifest mtime) past the window —
    # both are liveness anchors; a SECOND fresh object now promotes
    ep_path = os.path.join(primary.ship_dir, "_epoch.json")
    ep = json.load(open(ep_path))
    ep["changed_unix"] = time.time() - 999
    json.dump(ep, open(ep_path, "w"))
    mf_path = os.path.join(primary.ship_dir, "_manifest.json")
    os.utime(mf_path, (time.time() - 999, time.time() - 999))
    oneshot2 = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "oneshot2"),
        primary.ship_dir,
        node_id="os2",
    )
    new_primary = oneshot2.maybe_promote(stale_after_sec=30)
    assert new_primary is not None and new_primary.epoch == 2
    assert _names(oneshot2.session) == ["a", "b"]  # backlog applied first


def test_zombie_manifest_cannot_regress_an_applied_epoch(rig):
    """A fenced zombie that wins the race window between ship()'s fence
    re-check and the manifest write cannot take a replica BACKWARDS: the
    manifest carries the shipping epoch and a replica refuses any
    manifest older than the one it last applied (the heartbeat rule,
    applied monotonically — NOT against the stream epoch, which would
    deadlock followers between a promote and the new primary's first
    ship; see the liveness test below)."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    replica2 = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "replica2b"),
        primary.ship_dir,
        node_id="r2b",
    )
    new_primary = replica.promote()
    replica.session.sql("INSERT INTO users VALUES (8, 'h', 80)")
    new_primary.ship()  # manifest now carries epoch 2
    replica2.apply_pending()
    assert _names(replica2.session) == ["a", "b", "h"]
    # zombie force-writes its stale epoch-1 manifest (race-window write,
    # bypassing the fence re-check) WITHOUT the new primary's entries —
    # into its own stamped file AND over the legacy copy, exactly what a
    # zombie _ship_locked would do
    mf = json.load(open(os.path.join(primary.ship_dir, "_manifest.json")))
    mf["epoch"] = 1
    for fname in ("_manifest.json", "_manifest-000000000001.json"):
        json.dump(mf, open(os.path.join(primary.ship_dir, fname), "w"))
    out = replica2.apply_pending()
    assert out["applied"] == 0 and not out.get("stale_epoch")
    assert _names(replica2.session) == ["a", "b", "h"]  # no regression
    # a LAGGING replica that never applied anything must ALSO be immune:
    # the epoch-ranked manifest files outrank the zombie for everyone,
    # not just replicas that already applied the newer epoch
    lagger = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "lag-zombie"),
        primary.ship_dir,
        node_id="lz1",
    )
    lagger.apply_pending()
    assert _names(lagger.session) == ["a", "b", "h"]


def test_backlog_applies_between_promote_and_first_ship(rig):
    """Liveness counterpart of the zombie gate: after a promote, the OLD
    primary's last manifest (acknowledged shipped data) must remain
    appliable by lagging followers even though its epoch is behind the
    stream epoch — otherwise a new primary dying before its first ship()
    would leave the backlog stranded and lag never drains."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    lagger = Replica(
        replica.spark,
        os.path.join(os.path.dirname(replica.storage_dir), "lagger"),
        primary.ship_dir,
        node_id="lag1",
    )
    replica.promote()  # stream epoch is now 2; manifest still epoch 1
    out = lagger.apply_pending()
    assert out["applied"] >= 1 and not out.get("stale_epoch")
    assert _names(lagger.session) == ["a", "b"]


def test_manual_promote_applies_backlog_first(rig):
    """promote() must not discard acknowledged shipped-but-unapplied
    writes: the backlog on the stream is applied before the epoch claim
    (the follower loop guarded this; the manual path must too)."""
    sess, primary, replica = rig
    sess.sql("INSERT INTO users VALUES (5, 'e', 50)")
    primary.ship()
    # replica never ran apply_pending() — promote must pick up the backlog
    replica.promote()
    assert _names(replica.session) == ["a", "b", "e"]


def test_replica_refuses_role_management(rig):
    """GRANT/REVOKE mutate the catalog; on a read-only standby they must
    raise 25006 like every other write instead of silently diverging the
    local catalog until the next apply overwrites it."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    for stmt in (
        "GRANT ROLE readonly TO bob",
        "REVOKE ROLE readonly FROM bob",
    ):
        with pytest.raises(ReadOnlyLog):
            replica.session.sql(stmt)


def test_stamped_manifests_are_garbage_collected(rig, spark, tmp_path):
    """r8 ADVICE: epoch-stamped manifest files must not accumulate one
    per epoch forever. ship() keeps the current and previous epoch's
    stamps (the backlog-apply window a fresh promote reads from) and
    deletes anything older; a fresh lagging replica still catches up
    from the surviving stamps."""
    sess, primary, replica = rig
    primary.ship()
    replica.apply_pending()
    cur = primary
    cur_replica = replica
    for i in range(3):  # epochs 2, 3, 4
        nxt = Replica(
            spark,
            str(tmp_path / f"gc-replica-{i}"),
            primary.ship_dir,
            node_id=f"gc{i}",
        )
        nxt.apply_pending()
        cur = cur_replica.promote()
        cur.session.sql(f"INSERT INTO users VALUES ({10 + i}, 'gc{i}', {i})")
        cur.ship()
        cur_replica = nxt
    stamps = sorted(
        n
        for n in os.listdir(primary.ship_dir)
        if n.startswith("_manifest-") and n.endswith(".json")
    )
    # epoch 4 just shipped: only 3 and 4 survive
    assert stamps == ["_manifest-000000000003.json", "_manifest-000000000004.json"]
    lagger = Replica(
        spark, str(tmp_path / "gc-lagger"), primary.ship_dir, node_id="gclag"
    )
    lagger.apply_pending()
    assert _names(lagger.session) == ["a", "b", "gc0", "gc1", "gc2"]


def test_stream_manifest_survives_gc_race(tmp_path, monkeypatch):
    """Manifest GC deletes stamps older than current-1; a reader that
    listed the dir just before a racing primary shipped two epochs can
    pick a stamp that no longer exists. _read_json must degrade to the
    default instead of raising (open-first, no exists() pre-check), and
    _stream_manifest must retry with a FRESH listing and land on the
    newer stamp instead of reporting a bogus empty manifest."""
    import os as _os

    from driftdb_spark import replication as repl

    ship = tmp_path / "ship"
    ship.mkdir()

    # _read_json: missing file -> default, no exception
    assert repl._read_json(str(ship / "nope.json"), {"d": 1}) == {"d": 1}

    # current state on disk: epochs 5 (old stamp 3 already GC'd)
    repl._write_json_atomic(
        str(ship / repl._manifest_name(5)), {"epoch": 5, "tables": {"t": 1}}
    )

    # a stale listing that still shows the deleted epoch-3 stamp, once
    real_listdir = _os.listdir
    state = {"first": True}

    def stale_once(path):
        names = real_listdir(path)
        if state["first"]:
            state["first"] = False
            return [repl._manifest_name(3)] + [
                n for n in names if n != repl._manifest_name(5)
            ]
        return names

    monkeypatch.setattr(repl.os, "listdir", stale_once)
    got = repl._stream_manifest(str(ship), {"tables": {}})
    assert got["epoch"] == 5  # retried with a fresh listing

    # empty stream (no stamps, no legacy file) still yields the default
    empty = tmp_path / "empty"
    empty.mkdir()
    monkeypatch.setattr(repl.os, "listdir", real_listdir)
    assert repl._stream_manifest(str(empty), {"tables": {}}) == {"tables": {}}


def test_purge_to_empty_cannot_alias_batches(spark, tmp_path):
    """Deterministic pin of the r10 fuzz-found falsifying program
    (hypothesis shrank it to: del 1 / ins 5 / ship / ins 1 / purge 1 /
    upd 1 / purge 5 / ins 1). Pre-fix: the second purge emptied the log,
    last_sequence() regressed to 0, the final insert re-claimed
    ``batch-…0001`` with DIFFERENT content, ship()'s entry-name diff saw
    nothing to reship, and the replica silently kept the OLD batch's rows
    (primary [(1,0)] vs replica [(5,0)], generation never bumped). The
    persisted seq_floor + rewrite generation (events.py meta.json,
    replication.py ship) close both halves; pinned per VERDICT r10 so the
    counterexample replays without hypothesis seed luck."""
    sess = DriftSession(spark, str(tmp_path / "primary"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    primary = ReplicationPrimary(sess, str(tmp_path / "stream"))
    replica = Replica(spark, str(tmp_path / "replica"), str(tmp_path / "stream"))
    log, _cols = sess._tables["t"]

    sess.sql("DELETE FROM t WHERE id = 1")       # no-op: publishes nothing
    sess.sql("INSERT INTO t VALUES (5, 0)")       # seq 1 -> batch-…0001
    primary.ship()
    replica.apply_pending()
    sess.sql("INSERT INTO t VALUES (1, 0)")       # seq 2
    log.purge(spark.createDataFrame([(1,)], "id int"))
    sess.sql("UPDATE t SET v = 0 WHERE id = 1")   # purged pk: no-op
    log.purge(spark.createDataFrame([(5,)], "id int"))  # log now EMPTY
    assert log.last_sequence() >= 2               # the clock never regressed
    sess.sql("INSERT INTO t VALUES (1, 0)")       # must NOT reuse batch-…0001
    assert log._log_entries() == ["batch-00000000000000000003"]

    primary.ship()
    replica.apply_pending()
    want = sorted((r["id"], r["v"]) for r in sess.sql("SELECT id, v FROM t").collect())
    got = sorted(
        (r["id"], r["v"]) for r in replica.session.sql("SELECT id, v FROM t").collect()
    )
    assert want == [(1, 0)] and got == want
    # compliance propagated: the purged key left no history on the replica
    rlog, _c = replica.session._tables["t"]
    assert rlog.events().filter("pk = '5'").count() == 0


def test_promoted_replica_resumes_above_primary_high_water(spark, tmp_path):
    """The shipped seq_floor must survive onto the replica: a PROMOTED
    replica's first append has to land ABOVE every sequence the old
    primary ever assigned, even when the shipped generation was
    post-purge and carries none of those sequences."""
    sess = DriftSession(spark, str(tmp_path / "primary"))
    sess.sql("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    primary = ReplicationPrimary(sess, str(tmp_path / "stream"))
    replica = Replica(spark, str(tmp_path / "replica"), str(tmp_path / "stream"))
    log, _cols = sess._tables["t"]
    sess.sql("INSERT INTO t VALUES (1, 0), (2, 0), (3, 0)")  # seqs 1..3
    log.purge(spark.createDataFrame([(1,), (2,), (3,)], "id int"))  # empty log
    primary.ship()
    replica.apply_pending()
    replica.promote()
    rlog, _c = replica.session._tables["t"]
    assert rlog.last_sequence() >= 3  # floor adopted from the stream
    end = replica.session._tables["t"][0].insert(
        spark.createDataFrame([(9, 9)], "id int, v int")
    )
    assert end >= 4  # never recycles the old primary's sequences
