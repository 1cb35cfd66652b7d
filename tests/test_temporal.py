"""FOR SYSTEM_TIME clause peeling + AS OF resolution (reference
sql/parser.rs:29-203, query/executor.rs:194-205)."""

from __future__ import annotations

from pyspark.sql import functions as F

from driftdb_spark.temporal import AsOf, apply_asof, parse_system_time, resolve_sequence_at


def test_parse_seq():
    clean, asof = parse_system_time("SELECT * FROM t FOR SYSTEM_TIME AS OF @SEQ:42 WHERE x=1")
    assert asof.sequence == 42
    assert "FOR SYSTEM_TIME" not in clean and "WHERE x=1" in clean


def test_parse_timestamp():
    _, asof = parse_system_time("SELECT * FROM t FOR SYSTEM_TIME AS OF '2024-01-15 00:00:00'")
    assert asof.timestamp == "2024-01-15 00:00:00"


def test_parse_all_and_between_and_now():
    _, a = parse_system_time("SELECT * FROM t FOR SYSTEM_TIME ALL")
    assert a.all_history
    _, b = parse_system_time("SELECT * FROM t FOR SYSTEM_TIME BETWEEN @SEQ:5 AND @SEQ:9")
    assert b.between[0].sequence == 5 and b.between[1].sequence == 9
    _, c = parse_system_time("SELECT * FROM t FOR SYSTEM_TIME AS OF CURRENT_TIMESTAMP")
    assert c.sequence is None and c.timestamp is None and not c.all_history
    clean, d = parse_system_time("SELECT * FROM t WHERE x = 1")
    assert clean == "SELECT * FROM t WHERE x = 1" and d.sequence is None


def _events(spark):
    return spark.createDataFrame(
        [(i, f"2024-01-0{i} 00:00:00") for i in range(1, 6)], "sequence long, ts_s string"
    ).select("sequence", F.col("ts_s").cast("timestamp").alias("ts"))


def test_resolve_sequence_at(spark):
    ev = _events(spark)
    assert resolve_sequence_at(ev, "2024-01-03 12:00:00") == 3
    assert resolve_sequence_at(ev, "2023-12-31 00:00:00") is None


def test_apply_asof(spark):
    ev = _events(spark)
    assert apply_asof(ev, AsOf(sequence=2)).count() == 2
    assert apply_asof(ev, AsOf(timestamp="2024-01-04 00:00:00")).count() == 4
    assert apply_asof(ev, AsOf.now()).count() == 5
    assert apply_asof(ev, AsOf(all_history=True)).count() == 5
    assert apply_asof(ev, AsOf(between=(AsOf(sequence=2), AsOf(sequence=4)))).count() == 3
    # timestamp before all events → empty state, not full scan
    assert apply_asof(ev, AsOf(timestamp="2020-01-01 00:00:00")).count() == 0


def test_parse_from_to_half_open():
    """FOR SYSTEM_TIME FROM a TO b — parsed by the reference but errored
    (sql/parser.rs:147-203); executed here as the half-open [a, b) twin
    of BETWEEN (SQL:2011 semantics)."""
    clean, d = parse_system_time(
        "SELECT * FROM t FOR SYSTEM_TIME FROM @SEQ:5 TO @SEQ:9"
    )
    assert clean == "SELECT * FROM t"
    assert d.half_open and d.between[0].sequence == 5
    assert d.between[1].sequence == 9


def test_apply_asof_from_to(spark):
    ev = _events(spark)
    # sequence bounds: [2, 4) = {2, 3}
    fr = AsOf(between=(AsOf(sequence=2), AsOf(sequence=4)), half_open=True)
    assert apply_asof(ev, fr).count() == 2
    # timestamp upper bound strict: ts < 2024-01-04 excludes seq 4
    fr_ts = AsOf(
        between=(AsOf(sequence=2), AsOf(timestamp="2024-01-04 00:00:00")),
        half_open=True,
    )
    assert {r.sequence for r in apply_asof(ev, fr_ts).collect()} == {2, 3}
    # BETWEEN stays closed: [2, 4] = {2, 3, 4}
    closed = AsOf(between=(AsOf(sequence=2), AsOf(sequence=4)))
    assert apply_asof(ev, closed).count() == 3


def test_sql_from_to_surface(spark, tmp_path):
    """The SQL surface executes FROM…TO end-to-end over an event table."""
    from driftdb_spark.sql_frontend import DriftSession

    s = DriftSession(spark, str(tmp_path))
    s.sql("CREATE TABLE ft (id INT PRIMARY KEY, v INT)")
    for i in range(1, 6):
        s.sql(f"INSERT INTO ft VALUES ({i}, {i * 10})")  # seq i = insert i
    closed = s.sql(
        "SELECT COUNT(*) AS n FROM ft FOR SYSTEM_TIME BETWEEN @SEQ:2 AND @SEQ:4"
    ).first()["n"]
    half = s.sql(
        "SELECT COUNT(*) AS n FROM ft FOR SYSTEM_TIME FROM @SEQ:2 TO @SEQ:4"
    ).first()["n"]
    assert closed == 3 and half == 2
