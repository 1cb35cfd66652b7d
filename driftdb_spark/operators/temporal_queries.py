"""Temporal operator inventory (SURVEY §2.9) on the testdata ``events`` table.

The driver's events stream ``(event_id, ts, user_id, event_type, value,
props)`` plays the reference's event log: we map ``signup`` → Insert,
``click``/``view``/``purchase`` → Patch, ``error`` → SoftDelete, with
``user_id`` as the primary key and ``event_id`` as the global sequence. Every
payload carries the full ``(value, props)`` field set, so the field-level
patch merge (reference table_storage.rs:369-389) reduces to last-writer-wins
per PK — the genuinely partial-payload fold lives in ``events.EventLog`` and
is exercised by the pytest suite.

Reconstruction shape (reference storage/table_storage.rs:344-428):
last Insert per PK → drop PKs whose last SoftDelete ≥ that Insert → take the
newest surviving event at-or-after the Insert. One shuffle on PK; the AS OF
cap is a pushed-down scan filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from driftdb_spark.catalog import load_tables
from driftdb_spark.registry import register

_RECONSTRUCT_ORACLE = """
    WITH e AS (
        SELECT event_id AS seq, user_id AS pk, event_type, value, props
        FROM events {cap_filter}
    ),
    ins AS (SELECT pk, MAX(seq) AS ins_seq FROM e WHERE event_type = 'signup' GROUP BY pk),
    dels AS (SELECT pk, MAX(seq) AS del_seq FROM e WHERE event_type = 'error' GROUP BY pk),
    live AS (
        SELECT ins.pk, ins.ins_seq
        FROM ins LEFT JOIN dels ON dels.pk = ins.pk
        WHERE dels.del_seq IS NULL OR dels.del_seq < ins.ins_seq
    ),
    tail AS (
        SELECT e.*, ROW_NUMBER() OVER (PARTITION BY e.pk ORDER BY e.seq DESC) AS rn
        FROM e JOIN live ON e.pk = live.pk
        WHERE e.seq >= live.ins_seq AND e.event_type <> 'error'
    )
    SELECT pk AS user_id, seq AS last_seq, event_type AS last_type,
           value AS value, props AS props
    FROM tail WHERE rn = 1
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("pk"),
        "event_type",
        "value",
        "props",
        "ts",
    )


def _reconstruct(e: DataFrame) -> DataFrame:
    """Last-writer-wins state reconstruction (see module docstring).

    Plan shape: ONE hash-partitioning on pk. The last-Insert / last-Delete
    sequences are unordered analytic maxes over the pk window, the survivor
    pick is a row_number over the same partitioning (Spark reuses the
    exchange and only adds a sort) — vs. the naive 2-groupBy + join
    formulation, which shuffles three times. At 100 TB the exchange is the
    whole cost of this operator.
    """
    w = W.partitionBy("pk")
    annotated = e.select(
        "pk",
        "seq",
        "event_type",
        "value",
        "props",
        F.max(F.when(F.col("event_type") == "signup", F.col("seq"))).over(w).alias("ins_seq"),
        F.max(F.when(F.col("event_type") == "error", F.col("seq"))).over(w).alias("del_seq"),
    )
    tail = annotated.filter(
        F.col("ins_seq").isNotNull()
        & (F.col("del_seq").isNull() | (F.col("del_seq") < F.col("ins_seq")))
        & (F.col("seq") >= F.col("ins_seq"))
        & (F.col("event_type") != "error")
    )
    w_desc = W.partitionBy("pk").orderBy(F.col("seq").desc())
    return (
        tail.withColumn("rn", F.row_number().over(w_desc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("pk").alias("user_id"),
            F.col("seq").alias("last_seq"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("value"),
            F.col("props").alias("props"),
        )
    )


def _capped(e: DataFrame, cap: Column) -> DataFrame:
    """Filter events to ``seq <= cap`` where cap is a scalar aggregate —
    joined as a broadcast single-row frame (no driver collect)."""
    cap_df = e.agg(cap.alias("_cap"))
    return e.crossJoin(F.broadcast(cap_df)).filter(F.col("seq") <= F.col("_cap")).drop("_cap")


@register(
    "events_reconstruct_current",
    oracle=_RECONSTRUCT_ORACLE.format(cap_filter=""),
    tags=("temporal",),
)
def events_reconstruct_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state reconstruction — the reference's every-scan core
    (storage/table_storage.rs:344-428)."""
    return _reconstruct(_events(spark, sf_dir))


@register(
    "events_asof_sequence",
    oracle=_RECONSTRUCT_ORACLE.format(
        cap_filter="WHERE event_id <= (SELECT CAST(FLOOR(MAX(event_id) * 0.6) AS BIGINT) FROM events)"
    ),
    tags=("temporal",),
)
def events_asof_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FOR SYSTEM_TIME AS OF @SEQ:N`` — state at 60% of the log
    (reference sql_bridge.rs:304-320; AsOf::Sequence query/mod.rs:55-59).
    The cap is an SF-relative scalar so the query is meaningful at every
    scale factor."""
    e = _events(spark, sf_dir)
    return _reconstruct(
        _capped(e, F.floor(F.max("seq") * 0.6).cast("long"))
    )


@register(
    "events_asof_timestamp",
    oracle=_RECONSTRUCT_ORACLE.format(
        cap_filter="WHERE event_id <= (SELECT MAX(event_id) FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')"
    ),
    tags=("temporal",),
)
def events_asof_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FOR SYSTEM_TIME AS OF <timestamp>`` — resolved to the max sequence
    at-or-before the timestamp (reference query/executor.rs:194-205), then
    reconstructed at that sequence."""
    e = _events(spark, sf_dir)
    cap = F.max(
        F.when(F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"), F.col("seq"))
    )
    return _reconstruct(_capped(e, cap))


@register(
    "events_drift_history",
    oracle="""
    SELECT event_id AS seq, event_type, value,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, props
    FROM events WHERE user_id = 7
    """,
    tags=("temporal",),
)
def events_drift_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW DRIFT / FOR SYSTEM_TIME ALL for one PK: the raw event history
    (reference query/executor.rs:327-354, sql_bridge.rs:6494-6556).
    Timestamps surface as epoch millis so Spark (µs) and DuckDB (ns) hash
    identically."""
    e = _events(spark, sf_dir)
    return e.filter(F.col("pk") == 7).select(
        "seq",
        "event_type",
        "value",
        F.unix_millis("ts").alias("ts_ms"),
        "props",
    )


@register(
    "events_system_time_between",
    oracle="""
    SELECT event_id AS seq, user_id, event_type, value
    FROM events
    WHERE event_id BETWEEN (SELECT CAST(FLOOR(MAX(event_id) * 0.3) AS BIGINT) FROM events)
                       AND (SELECT CAST(FLOOR(MAX(event_id) * 0.5) AS BIGINT) FROM events)
    """,
    tags=("temporal",),
)
def events_system_time_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FOR SYSTEM_TIME BETWEEN a AND b`` — the reference parses this but
    returns an error (sql/parser.rs:147-203); it's a trivial sequence-range
    scan here, so we implement it."""
    e = _events(spark, sf_dir)
    bounds = e.agg(
        F.floor(F.max("seq") * 0.3).cast("long").alias("_lo"),
        F.floor(F.max("seq") * 0.5).cast("long").alias("_hi"),
    )
    return (
        e.crossJoin(F.broadcast(bounds))
        .filter(F.col("seq").between(F.col("_lo"), F.col("_hi")))
        .select("seq", F.col("pk").alias("user_id"), "event_type", "value")
    )


@register(
    "events_system_time_fromto",
    oracle="""
    SELECT event_id AS seq, user_id, event_type, value
    FROM events
    WHERE event_id >= (SELECT CAST(FLOOR(MAX(event_id) * 0.3) AS BIGINT) FROM events)
      AND event_id <  (SELECT CAST(FLOOR(MAX(event_id) * 0.5) AS BIGINT) FROM events)
    """,
    tags=("temporal",),
)
def events_system_time_fromto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FOR SYSTEM_TIME FROM a TO b`` — the half-open [a, b) twin of
    BETWEEN (SQL:2011). The reference parses FROM…TO alongside BETWEEN
    and errors on both (sql/parser.rs:147-203); executed here as a
    sequence-range scan with an exclusive upper bound
    (temporal.apply_asof half_open arm)."""
    e = _events(spark, sf_dir)
    bounds = e.agg(
        F.floor(F.max("seq") * 0.3).cast("long").alias("_lo"),
        F.floor(F.max("seq") * 0.5).cast("long").alias("_hi"),
    )
    return (
        e.crossJoin(F.broadcast(bounds))
        .filter((F.col("seq") >= F.col("_lo")) & (F.col("seq") < F.col("_hi")))
        .select("seq", F.col("pk").alias("user_id"), "event_type", "value")
    )


@register(
    "events_type_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(event_id) AS first_seq, MAX(event_id) AS last_seq
    FROM events GROUP BY event_type
    """,
    tags=("temporal", "agg"),
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain analytics over the raw event stream (the reference can only do
    this via FOR SYSTEM_TIME ALL + client-side work; here it's one
    aggregation)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        F.countDistinct("pk").alias("n_users"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )


_CAP60 = (
    "WHERE event_id <= "
    "(SELECT CAST(FLOOR(MAX(event_id) * 0.6) AS BIGINT) FROM events)"
)


@register(
    "events_state_diff",
    oracle=f"""
    WITH s_old AS ({_RECONSTRUCT_ORACLE.format(cap_filter=_CAP60)}),
         s_new AS ({_RECONSTRUCT_ORACLE.format(cap_filter="")})
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           o.last_seq AS old_seq,
           n.last_seq AS new_seq,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM s_old o FULL OUTER JOIN s_new n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.last_seq <> n.last_seq
    """,
    tags=("temporal", "join"),
)
def events_state_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal state diff: which PKs were added / removed / changed between
    AS OF @SEQ:60% and now — the audit query the reference's time-travel
    exists to answer but never ships as an operator (its drift surface is
    per-PK history only, sql_bridge.rs:6494-6556; diffing two states needs
    two client-side queries there). Both reconstructions partition on pk
    and the FULL OUTER diff joins on the same key, so no third exchange is
    introduced; the two scans are genuinely different AS OF slices and
    cannot share (at cluster scale the old slice reads strictly less via
    the pushed sequence cap)."""
    e = _events(spark, sf_dir)
    s_old = _reconstruct(_capped(e, F.floor(F.max("seq") * 0.6).cast("long"))).select(
        F.col("user_id").alias("o_user"), F.col("last_seq").alias("old_seq")
    )
    s_new = _reconstruct(e).select(
        F.col("user_id").alias("n_user"), F.col("last_seq").alias("new_seq")
    )
    return (
        s_old.join(s_new, F.col("o_user") == F.col("n_user"), "full")
        .where(
            F.col("o_user").isNull()
            | F.col("n_user").isNull()
            | (F.col("old_seq") != F.col("new_seq"))
        )
        .select(
            F.coalesce("o_user", "n_user").alias("user_id"),
            "old_seq",
            "new_seq",
            F.when(F.col("o_user").isNull(), "added")
            .when(F.col("n_user").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
        )
    )


@register(
    "events_change_feed",
    oracle="""
    WITH e AS (
      SELECT event_id AS seq, user_id AS pk, event_type,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS new_value
      FROM events
    )
    SELECT seq, pk,
           CASE event_type WHEN 'signup' THEN 'insert'
                           WHEN 'error' THEN 'delete'
                           ELSE 'update' END AS change_type,
           LAG(new_value) OVER (PARTITION BY pk ORDER BY seq) AS old_value,
           new_value,
           ROUND(new_value - LAG(new_value) OVER (PARTITION BY pk ORDER BY seq), 6)
             AS delta
    FROM e
    """,
    tags=("temporal", "cdc"),
)
def events_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the event log: every event emitted as a
    typed change record with before/after images — Delta Lake's CDF /
    Debezium envelope, derived from the reference's drift history
    (SHOW DRIFT gives the raw events, query/executor.rs:327-354; this
    adds the old-image join downstream consumers actually need).

    Plan shape: ONE pk-keyed exchange carrying a single LAG window —
    the old image comes from the previous event in the same partition,
    never from a self-join. At 100 TB this is the cheapest possible CDC
    materialization: the feed is a map over the sorted partition, and a
    consumer resuming from sequence N pushes `seq > N` into the scan."""
    e = _events(spark, sf_dir).select(
        "seq",
        "pk",
        "event_type",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("new_value"),
    )
    w = W.partitionBy("pk").orderBy("seq")
    return e.select(
        "seq",
        "pk",
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        F.lag("new_value").over(w).alias("old_value"),
        "new_value",
        F.round(F.col("new_value") - F.lag("new_value").over(w), 6).alias("delta"),
    )
