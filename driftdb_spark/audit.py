"""Audit trail — the reference's AuditSystem, Spark-first.

The reference logs every data-changing operation as a structured
AuditEvent with actor/action/table metadata and serves filtered queries
and exports over the log (audit.rs:14-118 model, :247-292 log_event,
:504-560 query/export).

Here the audit trail is itself an append-only parquet log fed by the
event log's AFTER-commit hook (``post_commit_fn``, events.py) — the
write path's durability point is the audit point, so a record exists iff
the batch became visible, and auditing adds one tiny parquet append per
commit, never a per-row hook. Audit queries are ordinary DataFrame
programs over that log.
"""

from __future__ import annotations

import datetime
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("audit_ts", T.TimestampType(), False),
        T.StructField("actor", T.StringType(), True),
        T.StructField("table", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("start_seq", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("pks_sample", T.ArrayType(T.StringType()), True),
    ]
)


class AuditTrail:
    """Session-wide audit log. ``attach(session)`` hooks every registered
    table's post-commit point; new tables attach on next call."""

    def __init__(self, session, audit_dir: str | None = None):
        self._session = session
        self._dir = audit_dir or os.path.join(session.storage_dir, "_audit")
        # let the session's PURGE statement find the trail so a SQL-level
        # compliance erasure scrubs audit pk samples in the same statement
        session._audit_trail = self
        self.attach()

    def attach(self) -> None:
        for name, (log, _cols) in self._session._tables.items():
            log.post_commit_fn = self._hook(name)

    def _hook(self, table: str):
        def fn(events: DataFrame, event_type: str, start_seq: int) -> None:
            ctx = self._session._security
            summary = events.agg(
                F.count(F.lit(1)).alias("n"),
                F.slice(F.sort_array(F.collect_set("pk")), 1, 8).alias("pks"),
            ).first()
            row = [
                (
                    # driver timestamp: the audit record is metadata about
                    # the commit, not part of the data path
                    datetime.datetime.now(),
                    ctx.username if ctx is not None else None,
                    table,
                    event_type,
                    start_seq,
                    int(summary["n"]),
                    list(summary["pks"]),
                )
            ]
            out = self._session.spark.createDataFrame(row, AUDIT_SCHEMA)
            target = os.path.join(
                self._dir, f"commit-{start_seq:020d}-{uuid.uuid4().hex[:8]}"
            )
            out.coalesce(1).write.mode("overwrite").parquet(target)

        return fn

    # -- queries (reference query_logs/export, audit.rs:504-560) ---------------

    def events(self) -> DataFrame:
        if not os.path.exists(self._dir):
            return self._session.spark.createDataFrame([], AUDIT_SCHEMA)
        return (
            self._session.spark.read.schema(AUDIT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self._dir)
        )

    def for_table(self, table: str) -> DataFrame:
        return self.events().filter(F.col("table") == table).orderBy("start_seq")

    def stats(self) -> DataFrame:
        return (
            self.events()
            .groupBy("table", "action")
            .agg(
                F.count(F.lit(1)).alias("n_commits"),
                F.sum("n_events").alias("n_events"),
            )
        )

    def export_json(self, out_path: str) -> int:
        """Export the audit log as JSON lines (reference export_logs,
        audit.rs:553-560). Returns the record count."""
        df = self.events()
        n = df.count()
        df.coalesce(1).write.mode("overwrite").json(out_path)
        return n

    def scrub_pks(self, keys) -> int:
        """Compliance companion to ``EventLog.purge``: remove the given
        primary-key strings from every record's ``pks_sample`` (a pk can
        itself be an identifier — an email, an account number — so a
        purge that leaves it in the audit trail has not fully erased the
        subject). Commit metadata (counts, sequences, actor, timing)
        stays intact: the trail still proves WHAT happened, just not to
        WHOM. Returns the number of audit records rewritten.

        Same swap discipline as the event-log rewrite: build aside, two
        renames, no reader ever sees a partial trail. The reference has
        neither purge nor audit scrubbing; PostgreSQL-world equivalents
        are log-retention scrubbers."""
        pk_set = {str(k) for k in keys}
        df = self.events()
        lit_arr = F.array(*[F.lit(k) for k in sorted(pk_set)])
        touched = df.filter(
            F.arrays_overlap(F.col("pks_sample"), lit_arr)
        ).count()
        if touched == 0:
            return 0
        scrubbed = df.withColumn(
            "pks_sample",
            F.array_except(F.col("pks_sample"), lit_arr),
        )
        tmp = self._dir + f".scrub-{uuid.uuid4().hex[:8]}"
        scrubbed.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self._dir + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(self._dir, old)
        os.rename(tmp, self._dir)
        import shutil

        shutil.rmtree(old)
        return touched
