"""Testdata catalog: load the star-schema parquet tables and register views.

The reference reconstructs table state from an event log on every scan
(reference crates/driftdb-core/src/query/executor.rs:109-235); our base
tables are already-materialized parquet, so a scan is just
``spark.read.parquet`` — predicate pushdown, column pruning, and partition
pruning come free from Catalyst + the parquet DataSource.

Scale notes (100 TB discipline):
- ``region``/``nation`` are bounded dimensions → always broadcast-join
  candidates; we mark them with a broadcast hint at join sites, not here.
- No ``.cache()`` by default: caching 100 TB is a mistake. ``load_tables``
  takes ``cache=True`` only for the bench harness at small SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register: bool = True,
    cache: bool = False,
) -> dict[str, DataFrame]:
    """Read every testdata table under ``sf_dir`` and (optionally) register
    each as a temp view under its bare name.

    Reading is lazy — no job runs until an action; registering a view is
    metadata-only, so calling this per-query is cheap.
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong it
        # arrives as long nanos — convert to TimestampType (µs, floor),
        # matching DuckDB's CAST(ts_ns AS TIMESTAMP) truncation.
        for field in df.schema.fields:
            if field.name == "ts" and field.dataType.simpleString() == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if cache:
            df = df.cache()
        if register:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
