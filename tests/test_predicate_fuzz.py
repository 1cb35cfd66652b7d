"""Property-based cross-engine predicate fuzz (the Spark analog of the
reference's proptest suite over predicate evaluation —
crates/driftdb-core/src/query/predicate.rs tests + tests/fuzz_test.rs).

Hypothesis generates random WHERE clauses (comparisons, IN, LIKE, IS NULL,
AND/OR/NOT nesting); the SAME SQL text runs on Spark (temp views) and DuckDB
over the same parquet, and COUNT(*) + SUM(pk) must agree. This checks
3-valued logic, NULL collapse, LIKE semantics, and operator precedence
without enumerating cases by hand.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from driftdb_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["R", "A", "N", "O", "F", ""]
DATE_VALS = ["1993-01-01", "1994-06-15", "1996-12-31"]


def _num_leaf(draw):
    col = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
    val = draw(st.sampled_from([0, 1, 3, 10, 25, 49, 1000, 0.04, 30.5]))
    return f"{col} {op} {val}"


def _str_leaf(draw):
    col = draw(st.sampled_from(STR_COLS))
    kind = draw(st.sampled_from(["eq", "in", "like", "null"]))
    if kind == "eq":
        return f"{col} = '{draw(st.sampled_from(STR_VALS))}'"
    if kind == "in":
        vals = draw(st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({quoted})"
    if kind == "like":
        pat = draw(st.sampled_from(["%A%", "R%", "_", "N_", "%F"]))
        return f"{col} LIKE '{pat}'"
    return f"{col} IS {'NOT ' if draw(st.booleans()) else ''}NULL"


def _date_leaf(draw):
    op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
    return f"l_shipdate {op} TIMESTAMP '{draw(st.sampled_from(DATE_VALS))} 00:00:00'"


@st.composite
def predicate(draw, depth: int = 2):
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        kind = draw(st.integers(0, 2))
        if kind == 0:
            return _num_leaf(draw)
        if kind == 1:
            return _str_leaf(draw)
        return _date_leaf(draw)
    op = draw(st.sampled_from(["AND", "OR"]))
    left = draw(predicate(depth=depth - 1))
    right = draw(predicate(depth=depth - 1))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}(({left}) {op} ({right}))"


@pytest.fixture(scope="module")
def engines(spark):
    load_tables(spark, SF)  # registers lineitem view
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return spark, con


@given(pred=predicate())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicates_agree(engines, pred):
    spark, con = engines
    sql = f"SELECT COUNT(*) AS n, SUM(l_orderkey) AS s FROM lineitem WHERE {pred}"
    got = spark.sql(sql).first()
    want = con.sql(sql).fetchone()
    assert (got.n, got.s) == (want[0], want[1]), pred
