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

from conftest import fuzz_examples
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
    max_examples=fuzz_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicates_agree(engines, pred):
    spark, con = engines
    sql = f"SELECT COUNT(*) AS n, SUM(l_orderkey) AS s FROM lineitem WHERE {pred}"
    got = spark.sql(sql).first()
    want = con.sql(sql).fetchone()
    assert (got.n, got.s) == (want[0], want[1]), pred


# ---------------------------------------------------------------------------
# Join fuzz: random join type × ON/WHERE predicate placement × quantifier
# forms, same SQL text on both engines (the reference's proptest has no join
# coverage at all — sql_bridge join tests are hand-enumerated).

C_NUM = ["c_acctbal", "c_nationkey", "c_custkey"]
O_NUM = ["o_totalprice", "o_orderkey"]


def _cust_leaf(draw):
    kind = draw(st.integers(0, 2))
    if kind == 0:
        col = draw(st.sampled_from(C_NUM))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
        val = draw(st.sampled_from([0, 3, 12, 500.0, 4999.5, 100000]))
        return f"{col} {op} {val}"
    if kind == 1:
        seg = draw(st.sampled_from(["BUILDING", "AUTOMOBILE", "MACHINERY", ""]))
        return f"c_mktsegment = '{seg}'"
    return "c_name LIKE '%1%'"


def _ord_leaf(draw):
    kind = draw(st.integers(0, 2))
    if kind == 0:
        col = draw(st.sampled_from(O_NUM))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
        val = draw(st.sampled_from([0, 100, 5000.5, 200000.0]))
        return f"{col} {op} {val}"
    if kind == 1:
        pri = draw(st.sampled_from(["1-URGENT", "5-LOW", ""]))
        return f"o_orderpriority = '{pri}'"
    return draw(st.sampled_from(["o_orderstatus IN ('F', 'P')", "o_orderstatus = 'O'"]))


@st.composite
def join_query(draw):
    cpred = _cust_leaf(draw)
    opred = _ord_leaf(draw)
    form = draw(st.integers(0, 2))
    if form == 0:  # plain join, orders predicate randomly in ON or WHERE
        jt = draw(st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]))
        in_on = draw(st.booleans())
        on = f"c_custkey = o_custkey{f' AND ({opred})' if in_on else ''}"
        where = f"({cpred})" + ("" if in_on else f" AND ({opred})")
        return (
            "SELECT COUNT(*) AS n, SUM(c_custkey) AS s1, SUM(o_orderkey) AS s2 "
            f"FROM customer {jt} orders ON {on} WHERE {where}"
        )
    neg = "NOT " if form == 2 else ""
    return (
        "SELECT COUNT(*) AS n, SUM(c_custkey) AS s1, NULL AS s2 "
        f"FROM customer WHERE ({cpred}) AND {neg}EXISTS "
        f"(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND ({opred}))"
    )


@pytest.fixture(scope="module")
def join_engines(spark):
    load_tables(spark, SF)  # registers customer/orders views
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return spark, con


@given(q=join_query())
@settings(
    max_examples=fuzz_examples(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_joins_agree(join_engines, q):
    spark, con = join_engines
    got = spark.sql(q).first()
    want = con.sql(q).fetchone()
    assert (got.n, got.s1, got.s2) == (want[0], want[1], want[2]), q
