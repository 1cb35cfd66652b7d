"""Column-level encryption at rest + the session query log.

Reference: encryption.rs (storage encryption; here sensitive COLUMNS
encrypt via Spark's built-in AES-GCM expressions so the rest of the file
stays queryable) and driftdb-server/src/slow_query_log.rs:45-244
(SlowQueryLogger: entries, thresholds, statistics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from driftdb_spark.sources.connectors import read_encrypted, write_encrypted
from driftdb_spark.sql_frontend import DriftSession

KEY = "0123456789abcdef"  # 16-byte AES key


def test_encrypted_columns_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alice", 50000), (2, "bob", None)], "id int, name string, salary int"
    )
    path = str(tmp_path / "enc")
    write_encrypted(df, path, KEY, ["name", "salary"])
    # at rest: encrypted columns are opaque binary, plain column intact
    raw = spark.read.parquet(path)
    assert dict(raw.dtypes) == {"id": "int", "name": "binary", "salary": "binary"}
    assert raw.filter(F.col("id") == 1).first()["name"] != b"alice"
    back = read_encrypted(spark, path, KEY, {"name": "string", "salary": "int"})
    rows = {(r.id, r.name, r.salary) for r in back.collect()}
    assert rows == {(1, "alice", 50000), (2, "bob", None)}


def test_wrong_key_fails_authenticated(spark, tmp_path):
    df = spark.createDataFrame([(1, "secret")], "id int, name string")
    path = str(tmp_path / "enc")
    write_encrypted(df, path, KEY, ["name"])
    bad = read_encrypted(spark, path, "fedcba9876543210", {"name": "string"})
    with pytest.raises(Exception, match="AES|CRYPTO|Tag"):
        bad.collect()  # GCM tag mismatch: garbage is rejected, not returned


def test_query_log_records_statements_and_errors(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE t (id int PRIMARY KEY)")
    s.sql("INSERT INTO t VALUES (1), (2)")
    s.set_security_context("alice")
    s.sql("SELECT COUNT(*) AS n FROM t")
    s.set_security_context(None)
    with pytest.raises(Exception):
        s.sql("SELECT broken FROM nowhere")
    log = s.query_log().collect()
    assert [r.statement.split()[0] for r in log] == [
        "CREATE",
        "INSERT",
        "SELECT",
        "SELECT",
    ]
    assert log[2].actor == "alice" and log[0].actor is None
    assert log[3].error is not None and all(r.error is None for r in log[:3])
    assert all(r.wall_ms > 0 for r in log)
    # eager DML is the slow entry; threshold query surfaces it
    slow = s.slow_queries(min_ms=0.0).first()
    assert slow.wall_ms == max(r.wall_ms for r in log)
    s.clear_query_log()
    assert s.query_log().count() == 0


def test_query_log_skips_nested_statements(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE t (id int PRIMARY KEY)")
    s.sql(
        "CREATE PROCEDURE fill() AS $$ INSERT INTO t VALUES (1); "
        "INSERT INTO t VALUES (2) $$"
    )
    s.clear_query_log()
    s.sql("CALL fill()")
    stmts = [r.statement for r in s.query_log().collect()]
    assert stmts == ["CALL fill()"]  # inner statements don't double-log


def test_statement_stats_per_verb(spark, tmp_path):
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE t (id int PRIMARY KEY)")
    s.sql("INSERT INTO t VALUES (1)")
    s.sql("INSERT INTO t VALUES (2)")
    s.sql("SELECT COUNT(*) AS n FROM t")
    with pytest.raises(Exception):
        s.sql("SELECT nope FROM nothing")
    stats = {r.verb: r for r in s.statement_stats().collect()}
    assert stats["INSERT"].n == 2 and stats["INSERT"].n_errors == 0
    assert stats["SELECT"].n == 2 and stats["SELECT"].n_errors == 1
    assert stats["CREATE"].p95_ms >= stats["CREATE"].p50_ms > 0


def test_rate_limit_token_bucket(spark, tmp_path):
    """Token-bucket throttling with an injected clock: burst drains, refill
    restores, nested statements (procedures) don't double-charge."""
    from driftdb_spark.sql_frontend import RateLimitExceeded

    now = [0.0]
    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE t (id int PRIMARY KEY)")
    s.sql(
        "CREATE PROCEDURE two() AS $$ SELECT 1 AS a; SELECT 2 AS b $$"
    )
    s.set_rate_limit(1.0, burst=3, clock=lambda: now[0])
    for _ in range(3):  # burst
        s.sql("SELECT 1 AS x")
    with pytest.raises(RateLimitExceeded):
        s.sql("SELECT 1 AS x")
    now[0] += 2.0  # refill 2 tokens
    s.sql("SELECT 1 AS x")
    # a CALL costs ONE token even though it runs two inner statements
    s.sql("CALL two()")
    with pytest.raises(RateLimitExceeded):
        s.sql("SELECT 1 AS x")
    s.set_rate_limit(0)  # disable
    s.sql("SELECT 1 AS x")
