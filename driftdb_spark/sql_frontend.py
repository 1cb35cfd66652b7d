"""SQL front-end: the reference's dispatcher, Spark-first.

The reference peels ``FOR SYSTEM_TIME`` off the SQL text, stashes it
thread-locally, and applies it at every table fetch (reference
sql_bridge.rs:274-757). Here ``DriftSession.sql`` peels the clause the same
way, resolves it against each *event-backed* table, registers the
reconstructed state as the table's view, and hands the remaining ANSI SQL to
Catalyst — which supplies the parser, analyzer, optimizer, and every operator
the reference interprets by hand.

DML statements route to the EventLog (INSERT/UPDATE/DELETE as events);
everything else is ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from driftdb_spark.events import EventLog
from driftdb_spark.temporal import AsOf, parse_system_time


class DriftSession:
    """Query surface over event-sourced tables + any registered views."""

    def __init__(self, spark: SparkSession, storage_dir: str):
        self.spark = spark
        self.storage_dir = storage_dir
        self._tables: dict[str, tuple[EventLog, dict[str, str]]] = {}

    # -- DDL -----------------------------------------------------------------

    def create_table(
        self, name: str, schema_cols: dict[str, str], pk: str | None = None
    ) -> EventLog:
        """CREATE TABLE → an EventLog + schema registration (reference
        execute_create_table sql_bridge.rs:5724-5926; PK defaults to the
        first column as the reference does :5872-5886)."""
        pk = pk or next(iter(schema_cols))
        log = EventLog(self.spark, f"{self.storage_dir}/{name}", pk_col=pk)
        self._tables[name] = (log, dict(schema_cols))
        return log

    def table(self, name: str) -> EventLog:
        return self._tables[name][0]

    def drop_table(self, name: str) -> None:
        self._tables.pop(name, None)

    # -- query ---------------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Execute SQL with optional FOR SYSTEM_TIME clause. The temporal
        target applies to every event-backed table in the query — exactly
        the reference's semantics (joins included, sql_bridge.rs:1316-1321).
        """
        clean, asof = parse_system_time(query)
        self._register_states(asof)
        return self.spark.sql(clean)

    def drift(self, table: str, pk=None) -> DataFrame:
        """SHOW DRIFT — event history (reference query/executor.rs:327-354)."""
        return self.table(table).drift_history(pk)

    def _register_states(self, asof: AsOf) -> None:
        for name, (log, schema_cols) in self._tables.items():
            if asof.all_history:
                log.events().createOrReplaceTempView(name)
            else:
                log.state_df(schema_cols, asof).drop("pk", "last_seq").createOrReplaceTempView(
                    name
                )
