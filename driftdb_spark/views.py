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
