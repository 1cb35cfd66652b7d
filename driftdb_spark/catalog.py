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

# DataFrame handles memoized per (session, sf_dir): ``spark.read.parquet``
# does driver-side file listing + footer schema reads, which every query
# function would otherwise repeat for all 10 tables. DataFrames are
# immutable, so reuse is safe; views are (re-)registered on every call
# because a different sf_dir may have claimed the bare names in between.
_MEMO: dict[tuple[int, str], dict[str, DataFrame]] = {}
_CACHED: set[tuple[int, str]] = set()


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register: bool = True,
    cache: bool = False,
) -> dict[str, DataFrame]:
    """Read every testdata table under ``sf_dir`` and (optionally) register
    each as a temp view under its bare name.

    Reading is lazy — no job runs until an action; repeat calls return the
    memoized handles, so per-query catalog overhead is a dict lookup.
    """
    key = (id(spark), sf_dir)
    dfs = _MEMO.get(key)
    if dfs is None:
        dfs = {}
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
            dfs[name] = df
        _MEMO[key] = dfs
    if cache and key not in _CACHED:
        for df in dfs.values():
            df.cache()
        _CACHED.add(key)
    if register:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
