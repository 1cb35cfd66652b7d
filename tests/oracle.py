"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet tables
and compares row count, column-name set, and an order-insensitive multiset of
normalized rows (columns sorted by name — the driver's documented compare).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
import os

import duckdb

from driftdb_spark.catalog import TABLES

DEFAULT_TEST_SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def duck_connection(sf_dir: str = DEFAULT_TEST_SF) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, _dec.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return repr(v)


def normalize(rows, columns) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str = DEFAULT_TEST_SF) -> None:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns

    con = duck_connection(sf_dir)
    rel = con.sql(oracle_sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duck={len(d_rows)}"

    s_norm = normalize([tuple(r) for r in s_rows], [c.lower() for c in s_cols])
    d_norm = normalize(d_rows, [c.lower() for c in d_cols])
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
