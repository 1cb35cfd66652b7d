"""driftdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DavidLiedle/DriftDB.

The reference (read-only at /root/reference) is a PostgreSQL-wire-compatible,
append-only, time-travel database written in Rust: immutable Insert / Patch /
SoftDelete events, state reconstruction by replay, and a broad single-node SQL
layer interpreted row-at-a-time over JSON (reference README.md:1-107,
crates/driftdb-core/src/events.rs:5-20).

This package re-expresses that capability surface Spark-first:

- ``session``    — tuned SparkSession bootstrap (AQE, Arrow, shuffle sizing).
- ``catalog``    — testdata star-schema loader / temp-view registry.
- ``events``     — the event log: append-only Insert/Patch/SoftDelete,
                   last-writer-wins state reconstruction, snapshots,
                   compaction (reference storage/table_storage.rs:344-428).
- ``temporal``   — ``FOR SYSTEM_TIME AS OF @SEQ:N | <ts> | ALL`` resolution
                   (reference query/mod.rs:55-59, sql/parser.rs:29-144).
- ``operators``  — the relational operator inventory from SURVEY.md §2 as
                   named DataFrame programs with DuckDB oracle SQL.
- ``functions``  — training-data pipeline operators: dedup (exact / MinHash-LSH
                   / SimHash / n-gram Jaccard), similarity search, text
                   analysis, multimodal column plumbing.
- ``streaming``  — Structured Streaming ingest of the event log.

Everything here is built on public Apache Spark APIs only; execution is
delegated to Catalyst/Tungsten (declare the plan, let the optimizer pick the
physical strategy).
"""

from driftdb_spark.session import get_spark
from driftdb_spark.catalog import TABLES, load_tables
from driftdb_spark.events import ConcurrentAppendError, EventLog, fold_events
from driftdb_spark.registry import QUERIES, oracle_map, query_map
from driftdb_spark.temporal import AsOf

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "EventLog",
    "ConcurrentAppendError",
    "fold_events",
    "AsOf",
    "QUERIES",
    "oracle_map",
    "query_map",
]

__version__ = "0.1.0"
