"""Views — named SQL definitions, including materialized views with refresh
(reference crates/driftdb-core/src/views.rs:30-119, refresh :541; executed by
re-running the view SQL inline, sql_bridge.rs:1203-1259).

Plain views are Spark temp views (Catalyst inlines the definition — identical
to the reference's inline re-execution, minus the re-parse). Materialized
views persist the result to parquet and re-register the scan; ``refresh``
recomputes. On a cluster the parquet write becomes a Delta table and refresh
can be incremental; the API is unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ViewRegistry:
    spark: SparkSession
    storage_dir: str
    _defs: dict[str, str] = field(default_factory=dict)
    _materialized: set[str] = field(default_factory=set)

    def create_view(self, name: str, sql: str) -> None:
        """CREATE VIEW name AS <sql> — logical, inlined at query time."""
        self.spark.sql(sql).createOrReplaceTempView(name)
        self._defs[name] = sql

    def create_materialized_view(self, name: str, sql: str) -> None:
        """CREATE MATERIALIZED VIEW — computed now, persisted, scan-backed."""
        self._defs[name] = sql
        self._materialized.add(name)
        self.refresh(name)

    def refresh(self, name: str) -> None:
        """Recompute a materialized view from its definition (reference
        refresh policies views.rs:541 — here: on demand)."""
        if name not in self._materialized:
            raise ValueError(f"{name} is not a materialized view")
        path = os.path.join(self.storage_dir, f"mv_{name}.parquet")
        self.spark.sql(self._defs[name]).write.mode("overwrite").parquet(path)
        self.spark.read.parquet(path).createOrReplaceTempView(name)

    def drop_view(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._defs.pop(name, None)
        self._materialized.discard(name)

    def definition(self, name: str) -> str | None:
        return self._defs.get(name)

    def query(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)


@dataclass
class IncrementalView:
    """Bookkeeping for one incrementally-maintained materialized view."""

    sql: str
    source_view: str
    group_cols: list[str]
    last_seq: int
    last_refresh_groups: int = 0


class IncrementalViewRegistry:
    """Incrementally-maintained materialized views over an event-backed
    table — the Delta Live Tables / Materialize keyed-aggregate shape.

    Contract: the view SQL is a GROUP BY over ``group_cols`` of ONE
    event-backed table (each output row is determined solely by its
    group's input rows). Under that contract refresh is proportional to
    the CHANGE, not the table:

    1. changed pks = distinct pks with events above the last refresh
       sequence — a scan with the sequence bound pushed down;
    2. affected groups = group keys of those pks in the OLD state
       (``AS OF`` the last refresh sequence — a row may have LEFT a
       group) ∪ the NEW state (it may have ENTERED one);
    3. the view SQL re-runs over the new state SEMI-JOINED to the
       affected group keys (the restriction lands below the aggregation
       because it keys on the group columns), producing fresh rows for
       exactly those groups;
    4. merged MV = old MV anti-join affected groups + fresh rows.

    At 100 TB: steps 1-2 read only the event tail + two key-projected
    reconstructions; step 3 aggregates only the affected groups' rows;
    step 4 is an anti-join on group keys against the (aggregate-sized)
    MV. The reference refreshes views by full re-execution
    (views.rs:541); this is the scale path it gestures at."""

    def __init__(self, spark: SparkSession, storage_dir: str):
        self.spark = spark
        self.storage_dir = storage_dir
        self._views: dict[str, IncrementalView] = {}
        self._logs: dict[str, object] = {}
        self._schemas: dict[str, dict] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self.storage_dir, f"imv_{name}.parquet")

    def create(
        self,
        name: str,
        log,
        schema_cols: dict,
        sql: str,
        group_cols: list[str],
        source_view: str,
    ) -> None:
        """Full initial computation; subsequent ``refresh`` calls are
        incremental. ``sql`` must read the base table via ``source_view``
        and GROUP BY ``group_cols``."""
        self._logs[name] = log
        self._schemas[name] = dict(schema_cols)
        seq = log.last_sequence()
        log.state_df(schema_cols).drop("pk", "last_seq").createOrReplaceTempView(
            source_view
        )
        out = self.spark.sql(sql)
        missing = [c for c in group_cols if c not in out.columns]
        if missing:
            raise ValueError(
                f"group column(s) {missing} must appear in the view output"
            )
        out.write.mode("overwrite").parquet(self._path(name))
        self.spark.read.parquet(self._path(name)).createOrReplaceTempView(name)
        self._views[name] = IncrementalView(sql, source_view, list(group_cols), seq)

    def refresh(self, name: str) -> int:
        """Incremental refresh; returns the number of groups recomputed."""
        from pyspark.sql import functions as F

        from driftdb_spark.temporal import AsOf

        iv = self._views[name]
        log, schema_cols = self._logs[name], self._schemas[name]
        new_seq = log.last_sequence()
        if new_seq == iv.last_seq:
            iv.last_refresh_groups = 0
            return 0
        changed = (
            log.events()
            .filter(F.col("sequence") > iv.last_seq)
            .select("pk")
            .distinct()
        )
        old_state = log.state_df(schema_cols, AsOf(sequence=iv.last_seq))
        new_state = log.state_df(schema_cols)
        affected = (
            old_state.join(changed, "pk", "left_semi")
            .select(*iv.group_cols)
            .unionByName(
                new_state.join(changed, "pk", "left_semi").select(*iv.group_cols)
            )
            .distinct()
        )
        affected = affected.persist()
        n_groups = affected.count()
        try:
            # restrict the view's INPUT to the affected groups: the semi-
            # join keys on the group columns, so it lands below the
            # aggregation and only those groups' rows re-aggregate
            restricted = new_state.drop("pk", "last_seq").join(
                F.broadcast(affected), iv.group_cols, "left_semi"
            )
            restricted.createOrReplaceTempView(iv.source_view)
            fresh = self.spark.sql(iv.sql)
            old_mv = self.spark.read.parquet(self._path(name))
            merged = old_mv.join(
                F.broadcast(affected), iv.group_cols, "left_anti"
            ).unionByName(fresh)
            tmp = self._path(name) + ".next"
            merged.write.mode("overwrite").parquet(tmp)
            final = self.spark.read.parquet(tmp)
            final.write.mode("overwrite").parquet(self._path(name))
            import shutil

            shutil.rmtree(tmp)
            self.spark.read.parquet(self._path(name)).createOrReplaceTempView(name)
            iv.last_seq = new_seq
            iv.last_refresh_groups = n_groups
            return n_groups
        finally:
            affected.unpersist()
