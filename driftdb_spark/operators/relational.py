"""Relational operator inventory (SURVEY.md §2.2-2.8) as named queries.

Each query is an idiomatic Spark DataFrame program paired (in the registry)
with the ANSI-SQL oracle DuckDB runs on the same parquet tables. The
reference implements these as a row-at-a-time JSON interpreter
(reference crates/driftdb-core/src/sql_bridge.rs); here the logical plan is
declared and Catalyst/Tungsten pick the physical strategy — predicate
pushdown, column pruning, join selection (broadcast vs sort-merge), AQE.

Determinism rules (cross-engine hash matching):
- Float SUM/AVG go through exact DECIMAL(12,2) casts: IEEE float addition is
  order-dependent and Spark/DuckDB aggregate in different orders, so raw
  ``SUM(double)`` is not reproducible. Decimal sums are exact, then a final
  cast to DOUBLE is deterministic (nearest-even on identical values).
- MIN/MAX/plain column outputs involve no arithmetic → safe as-is.
- Double division of identical operands is IEEE-deterministic → AVG is
  ``CAST(SUM(decimal) AS DOUBLE) / COUNT``.
- LIMIT queries order by a unique key suffix so the cut is well-defined.

Where the reference deviates from standard SQL (INTERSECT/EXCEPT compare
only the first column — reference sql_bridge.rs:1087-1157) we implement
standard full-row semantics per SURVEY §5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from driftdb_spark.catalog import load_tables
from driftdb_spark.registry import register

DEC = "decimal(12,2)"


def _dec(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def _dsum(c, alias: str) -> F.Column:
    """Exact decimal sum surfaced as double (see module docstring)."""
    return F.sum(_dec(c)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2))
               * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter + groupBy + 8 aggregates.

    Flagship: exercises pushdown (shipdate filter reaches the parquet scan),
    partial aggregation (map-side combine), and exact decimal arithmetic.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    disc = _dec(F.lit(1) - F.col("l_discount"))
    tax = _dec(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(_dec("l_extendedprice") * disc * tax).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "filter_eq_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag <> 'A'
      AND l_discount < 0.05
    """,
    tags=("filter",),
)
def filter_eq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality/range/inequality predicates (reference query/predicate.rs:38-96).

    All four predicates are Catalyst-pushable to the parquet scan.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_returnflag") != "A")
        & (F.col("l_discount") < 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@register(
    "filter_like_in",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_name LIKE '%re%' AND p_name LIKE '_ed%'
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#17')
      AND p_size NOT IN (1, 2, 3)
    """,
    tags=("filter",),
)
def filter_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with % and _ wildcards + IN / NOT IN lists
    (reference query/predicate.rs:62-96: LIKE via metachar-escaped regex)."""
    part = load_tables(spark, sf_dir)["part"]
    return part.filter(
        F.col("p_name").like("%re%")
        & F.col("p_name").like("_ed%")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#17")
        & ~F.col("p_size").isin(1, 2, 3)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_np,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
      AND o_orderkey < 500
    """,
    tags=("filter", "null"),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL three-valued logic via NULLIF/COALESCE (the testdata has
    no physical NULLs, so they are manufactured; reference
    query/predicate.rs:90-96 collapses NULL to false for ordered ops —
    standard SQL does the same for WHERE)."""
    o = load_tables(spark, sf_dir)["orders"]
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.filter(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNotNull() & (F.col("o_orderkey") < 500))
        .select(
            "o_orderkey",
            status_np.alias("status_np"),
            F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
        )
    )


@register(
    "proj_case_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 30 THEN 'mid'
           ELSE 'high' END AS qty_band,
      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l_discount AS DECIMAL(12,2)) AS DOUBLE) AS net_price,
      l_linenumber % 3 AS line_mod,
      (l_orderkey + l_linenumber) * 2 AS keyed
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    tags=("projection",),
)
def proj_case_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with CASE WHEN (simple+searched, reference
    sql_bridge.rs:4906-4939) and binary arithmetic incl. % (reference
    evaluate_binary_op sql_bridge.rs:4941-4989)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("net_price"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) * 2).alias("keyed"),
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row DISTINCT (reference apply_distinct sql_bridge.rs:5343-5360).
    In Spark this is a hash aggregate with map-side partials — no
    JSON-string identity tricks needed."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# §2.4 aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS n_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    """,
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no GROUP BY) COUNT(*)/COUNT(col)/SUM/AVG/MIN/MAX
    (reference evaluate_aggregate_function sql_bridge.rs:4060-4170)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        _dsum("o_totalprice", "sum_price"),
        (F.sum(_dec("o_totalprice")).cast("double") / F.count("o_totalprice")).alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "agg_group_having",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           MIN(o_orderkey) AS min_key
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    HAVING COUNT(*) > 20 AND SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 1000
    """,
    tags=("agg",),
)
def agg_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY multiple keys + HAVING over aggregate results (reference
    execute_group_by_aggregation sql_bridge.rs:3806-4002,
    filter_aggregated_rows :4190-4201)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice", "total"),
            F.min("o_orderkey").alias("min_key"),
            F.sum(_dec("o_totalprice")).alias("_sum_dec"),
        )
        .filter((F.col("n_orders") > 20) & (F.col("_sum_dec") > 1000))
        .drop("_sum_dec")
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — claimed in the reference README (README.md:56) but
    not actually implemented there (sql_bridge.rs:4017-4176); implemented
    here as a README-level capability (SURVEY §2.4)."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "extension"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS/ROLLUP — not supported by the reference (SURVEY §2.4);
    added as a Spark-native extension."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _dsum("o_totalprice", "total")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "extension"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE extension (see agg_rollup)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "extension"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (conditional aggregation) — Spark-native extension; the oracle
    expresses it as portable CASE-filtered counts."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "orderby_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 5
    """,
    tags=("sort",),
)
def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT/OFFSET (reference apply_order_by
    sql_bridge.rs:5389-5449, parse_limit/offset :5451-5472). The unique
    o_orderkey tie-breaker makes the cut deterministic. Spark plans this as
    TakeOrderedAndProject — no full sort at scale."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .offset(5)
        .limit(20)
    )


@register(
    "orderby_nulls_last",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY status_np ASC NULLS LAST, o_orderkey
    LIMIT 50
    """,
    tags=("sort", "null"),
)
def orderby_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS LAST ordering — the reference comparator sorts NULLs last
    (query/predicate.rs:105-124); Spark's ASC default is nulls-first, so we
    set asc_nulls_last explicitly (SURVEY §7.5 risk register)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"))
        .orderBy(F.col("status_np").asc_nulls_last(), F.col("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 50000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER equi-join (reference perform_inner_join sql_bridge.rs:1738-1761
    is O(n*m) nested-loop; hash variant :3258-3318). Catalyst picks
    broadcast-hash here since customer is small relative to orders."""
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    return (
        o.filter(F.col("o_totalprice") > 50000)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_left_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "agg"),
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers without orders, then aggregate
    (reference perform_left_join sql_bridge.rs:1900-1937 NULL-pads
    unmatched)."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("spend"),
        )
    )


@register(
    "join_right",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 200
    """,
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (the reference rewrites RIGHT as swapped LEFT —
    sql_bridge.rs:1676-1683; Spark supports it natively)."""
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", "c_name", "o_orderkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey, cn.n_cust AS n_cust, sn.n_supp AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join", "cte"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with genuine unmatched rows on both sides (supplier
    covers few nations). Reference perform_full_outer_join
    sql_bridge.rs:1938-1998."""
    t = load_tables(spark, sf_dir)
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("nk2")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.nk == sn.nk2, "full").select(
        F.coalesce(F.col("nk"), F.col("nk2")).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey < 2
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (reference perform_cross_join sql_bridge.rs:3327-3340).
    Bounded dims only — a Cartesian product of fact tables would never
    survive 100 TB."""
    t = load_tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_regionkey") < 2)
    return r.crossJoin(t["nation"]).select("r_name", "n_name")


@register(
    "join_semi",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    tags=("join", "subquery"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: the reference only reaches this via EXISTS/IN subqueries
    (sql_bridge.rs:4208-4253); Spark has a first-class left_semi join that
    never duplicates or widens rows."""
    t = load_tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    big = li.filter(F.col("l_quantity") >= 49)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "subquery"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) as left_anti."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_multi_chain",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("join", "agg"),
)
def join_multi_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join chain. The reference greedily reorders
    INNER segments by ANALYZE row counts (sql_bridge.rs:2188-2545); here
    the join tree is shaped by hand the way a CBO with stats would:
    orders⋈customer FIRST (the two smaller SF-scaled tables; Catalyst
    picks the physical strategy — broadcast while customer fits, shuffle
    when it doesn't), THEN lineitem joins that result on orderkey. The
    old shape ((lineitem⋈orders)⋈customer) shuffled the widest fact
    TWICE — on orderkey then again on custkey; this one shuffles lineitem
    exactly once, which is also the dominant term at 100 TB. The outer
    join is hinted shuffle_hash (build side = the orders⋈customer
    result): same partitioning as sort-merge minus both sorts — A/B at
    sf0.1: 0.45 s vs 0.64 s for the old tree. Bounded dims (supplier,
    nation, region) are explicitly broadcast."""
    t = load_tables(spark, sf_dir)
    oc = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return (
        t["lineitem"]
        .join(oc.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_self",
    oracle="""
    SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    tags=("join",),
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with a non-equi component in the ON clause (the reference
    supports only single-column equi-joins — extract_join_columns
    sql_bridge.rs:3341-3371; Spark handles composite conditions natively)."""
    n = load_tables(spark, sf_dir)["nation"]
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("nk_a"),
        F.col("b.n_nationkey").alias("nk_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


# ---------------------------------------------------------------------------
# §2.7 set operations (standard full-row semantics, not the reference's
# first-column-only deviation — SURVEY §5)
# ---------------------------------------------------------------------------


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("nationkey"))
    return a, b


_SETOP_A = "SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SETOP_B = "SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000"


@register("setop_union", oracle=f"{_SETOP_A} UNION {_SETOP_B}", tags=("setop",))
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — reference perform_union sql_bridge.rs:1074-1085."""
    a, b = _setop_sides(spark, sf_dir)
    return a.union(b).distinct()


@register("setop_union_all", oracle=f"{_SETOP_A} UNION ALL {_SETOP_B}", tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_sides(spark, sf_dir)
    return a.union(b)


@register("setop_intersect", oracle=f"{_SETOP_A} INTERSECT {_SETOP_B}", tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard full-row INTERSECT (the reference compares only the first
    column — sql_bridge.rs:1087-1124; that is a bug, not a feature)."""
    a, b = _setop_sides(spark, sf_dir)
    return a.intersect(b)


@register("setop_except", oracle=f"{_SETOP_A} EXCEPT {_SETOP_B}", tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard EXCEPT (distinct) — see setop_intersect note."""
    a, b = _setop_sides(spark, sf_dir)
    return a.subtract(b)


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "window_ranks",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
      ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      NTILE(4) OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey) AS tile,
      RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
      DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk,
      PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS prnk,
      CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS cdist
    FROM orders
    WHERE o_orderkey <= 600
    """,
    tags=("window",),
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (reference window.rs:42-49, :550-575).
    row_number/ntile run over a unique ordering (tie-broken by key) so the
    result is deterministic; rank/dense_rank/percent_rank/cume_dist run over
    the tied ordering to genuinely exercise tie handling."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 600)
    w_unique = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_ties = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        # cast to long: Spark's rank family yields INT, DuckDB's BIGINT
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.ntile(4).over(w_unique).cast("long").alias("tile"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.percent_rank().over(w_ties).alias("prnk"),
        F.cume_dist().over(w_ties).alias("cdist"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
      LAG(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS prev_price,
      LEAD(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS next2_price
    FROM orders
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with offset + default (reference window.rs:55-56,
    sql_bridge.rs:6298-6343)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice", 1, -1.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 2, -1.0).over(w).alias("next2_price"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
      FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS first_price,
      LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_price,
      NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING) AS second_price
    FROM orders
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE with explicit frames (reference
    window.rs:52-54; NthValue exists there but is not SQL-reachable —
    exposed here). LAST_VALUE needs the full-partition frame, otherwise the
    default frame makes it the current row."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    )


@register(
    "window_agg_frames",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_spend,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
    tags=("window",),
)
def window_agg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over explicit ROWS frames (reference window.rs:59-63,
    :576-718 — note the reference parses SQL frame specs but always applies
    the default frame, sql_bridge.rs:6448-6452; we implement real frames)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(-2, W.currentRow))
        .cast("double")
        .alias("window3_spend"),
        F.count(F.lit(1))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_n"),
    )


# ---------------------------------------------------------------------------
# §2.8 subqueries & CTEs (via spark.sql — Catalyst decorrelates these
# correctly, unlike the reference's alias heuristics sql_bridge.rs:4656-4671)
# ---------------------------------------------------------------------------


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (reference sql_bridge.rs:4264-4305)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM orders)
        """
    )


@register(
    "subquery_scalar_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
    FROM orders o
    WHERE o.o_orderkey < 500
    """,
    tags=("subquery",),
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in SELECT (reference
    process_scalar_subqueries sql_bridge.rs:5104-5163 runs it per-row;
    Catalyst decorrelates it into an aggregate + left outer join)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice,
               (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        FROM orders o
        WHERE o.o_orderkey < 500
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) membership (reference sql_bridge.rs:4208-4219)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 90000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
    """,
    tags=("subquery",),
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate (reference resolves
    outer references with fragile alias guessing — sql_bridge.rs:4656-4671;
    Catalyst decorrelation is exact)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 90000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
        """
    )


@register(
    "cte_basic",
    oracle="""
    WITH repeat_customers AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    )
    SELECT c.c_custkey, c.c_name, r.n_orders, r.spend
    FROM customer c JOIN repeat_customers r ON c.c_custkey = r.o_custkey
    """,
    tags=("cte",),
)
def cte_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-recursive WITH (reference materializes each CTE then re-enters
    the planner — sql_bridge.rs:759-783; Catalyst inlines)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH repeat_customers AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
        )
        SELECT c.c_custkey, c.c_name, r.n_orders, r.spend
        FROM customer c JOIN repeat_customers r ON c.c_custkey = r.o_custkey
        """
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "extension"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond ROLLUP/CUBE) — Spark-native extension;
    the reference has none of the grouping-set family (SURVEY §2.4). One
    shuffle: Spark expands the sets map-side, partial-aggregates, then does
    a single exchange on the expanded grouping key."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"), _dsum("o_totalprice", "total"))


@register(
    "topk_per_group",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, rk FROM (
        SELECT n.n_name, c.c_custkey, c.c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_name
                   ORDER BY c.c_acctbal DESC, c.c_custkey
               ) AS rk
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rk <= 3
    """,
    tags=("window", "join"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (top-3 customers by balance per nation): broadcast
    dim join + rank-filter. At scale Spark pushes the k-filter into the
    window sort (WindowGroupLimit) so each partition keeps only k rows
    before the final sort — no full materialization of ranks."""
    t = load_tables(spark, sf_dir)
    joined = t["customer"].join(
        F.broadcast(t["nation"]),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        joined.select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "arith_div_zero_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity / NULLIF(l_linenumber - 1, 0) AS qty_ratio,
           CAST(l_quantity AS BIGINT) % NULLIF(l_linenumber - 1, 0) AS qty_mod
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
    tags=("projection", "semantics"),
)
def arith_div_zero_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division/modulo by zero yields NULL — the reference's semantics
    (evaluate_binary_op, reference sql_bridge.rs:4941-4989). Spark 4 runs
    ANSI mode (div-by-zero errors), so the NULL-on-zero contract is written
    explicitly with ``try_divide``/``try_mod`` rather than by disabling ANSI
    session-wide; the oracle spells it NULLIF. Single IEEE division of
    identical operands is bit-deterministic, so no rounding is needed."""
    li = load_tables(spark, sf_dir)["lineitem"]
    denom = F.col("l_linenumber") - F.lit(1)
    return li.filter(F.col("l_orderkey") < 2000).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), denom).alias("qty_ratio"),
        F.try_mod(F.col("l_quantity").cast("bigint"), denom).alias("qty_mod"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on all three tables pushed to the
    scans, customer reduced then broadcast, top-10 via
    TakeOrderedAndProject (no full sort). Unique tie-breaker (l_orderkey)
    makes the LIMIT cut deterministic for the oracle hash."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < "1995-03-15")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY o.o_orderkey, o.o_custkey
    """,
    tags=("join", "agg", "subquery"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated subquery → semi-join against
    the pre-aggregated key set. The HAVING filter runs before the semi-join,
    so only qualifying keys shuffle — at 100 TB the candidate set is tiny
    relative to lineitem and Spark broadcasts it into the probe."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    li = t["lineitem"].join(big.withColumnRenamed("l_orderkey", "bk"),
                            F.col("l_orderkey") == F.col("bk"), "left_semi")
    return (
        li.join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(_dsum("l_quantity", "total_qty"))
    )


@register(
    "left_join_filter_semantics",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           COUNT(s.s_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM nation n
    LEFT JOIN supplier s
      ON n.n_nationkey = s.s_nationkey AND s.s_acctbal > 5000
    GROUP BY n.n_nationkey, n.n_name
    """,
    tags=("join", "semantics"),
)
def left_join_filter_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join predicate-placement semantics: a condition on the
    null-producing side belongs in ON (pre-join filter of the right side,
    preserved rows survive), not WHERE (which would silently convert the
    join to inner). COUNT(col) vs COUNT(*) shows the NULL padding. The
    reference pushes predicates only into the preserving side for LEFT
    joins (sql_bridge.rs:2072-2108) — same rule Catalyst applies."""
    t = load_tables(spark, sf_dir)
    n = t["nation"]
    s = t["supplier"].filter(F.col("s_acctbal") > 5000)
    joined = n.join(s, F.col("n_nationkey") == F.col("s_nationkey"), "left")
    return joined.groupBy("n_nationkey", "n_name").agg(
        F.count("s_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item report): 4-table join where the date
    window prunes orders and the returnflag filter prunes lineitem at the
    scan. lineitem⋈orders is the fact-fact edge (merge-hinted — at 100 TB
    both sides are large and pre-bucketing on orderkey makes this
    exchange-free); the customer/nation dims broadcast. Top-20 via
    TakeOrderedAndProject with c_custkey as the unique tie-breaker. The
    reference executes joins as nested loops over reconstructed state
    (sql_bridge.rs:2000-2200); here Catalyst picks the physical strategy."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l.l_discount AS DECIMAL(12,2)) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "semantics"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the same dim
    table (nation) joins twice under different roles, and the disjunctive
    nation-pair predicate can only be applied AFTER both joins — a shape the
    reference's single-pass join loop cannot express (sql_bridge.rs joins
    bind each table once). The nation filter is pre-applied to each
    broadcast copy (only 2 of 25 nations survive → supplier/customer
    shrink before the fact joins), then the pair disjunction filters the
    joined result. At scale the two fact-fact edges (lineitem⋈orders)
    dominate; the merge hint keeps them sort-merge on the orderkey bucket
    layout."""
    t = load_tables(spark, sf_dir)
    pair = ["NATION_1", "NATION_2"]
    n1 = t["nation"].filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c = t["customer"].join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    li = t["lineitem"].filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    return (
        li.join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l.l_discount AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue ratio): conditional aggregation over a
    date-pruned fact⋈dim join. The month filter pushes to the lineitem
    scan; part broadcasts. Both sums are exact decimals; the single ratio
    division happens once in double (IEEE-deterministic both engines) —
    dividing decimals directly would tie the result to each engine's
    decimal-division scale rules."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    rev = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "predicates"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-column predicates spanning both
    join sides. Catalyst extracts the common l_quantity range (1..30) and
    the p_brand IN-set as single-side conjuncts it CAN push to the scans,
    while the cross-side OR evaluates post-join — the optimization the
    reference's per-row interpreter can't do (predicates evaluate row at a
    time, sql_bridge.rs:2600+)."""
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    rev = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH threshold AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    tags=("join", "agg", "subquery"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-aggregate threshold + anti-join. The average
    balance is computed as exact-decimal sum, cast double, ONE division —
    float AVG is summation-order-dependent and would flap between engines.
    The 1-row threshold cross-joins (broadcast) onto customer; customers
    with no orders are a LeftAnti against the orders fact (at scale the
    anti-join shuffles on custkey; customer is the smaller side)."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1)))
            .alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
